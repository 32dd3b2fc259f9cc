"""Second embedded real-data set (VERDICT r4 #8).

``data/patches.py`` is REAL image data — 2,080 16x16 RGB patches from the
two real photographs scikit-learn bundles offline — on the 3-channel
raw-0-255 shape class of the reference's CIFAR/ImageNet32 configs. These
tests (a) validate the fixture has real-photograph statistics, and
(b) train the registry model for ~45 optimizer steps and assert the
real-data loss/BPD improves.
"""

import numpy as np
import pytest

from inverse_flow_tpu.data import patches


def test_embedded_patches_parse_and_look_real():
    train, val, test = patches.load_arrays()
    assert train.shape == (1664, 3, 16, 16)
    assert val.shape == test.shape == (208, 3, 16, 16)
    x = np.concatenate([train, val, test])
    # raw uint8 range, integral values
    assert x.min() >= 0 and x.max() <= 255
    assert np.all(x == np.floor(x))
    # real photographs: full dynamic range, strong per-patch structure,
    # and channel correlation (natural images are strongly correlated
    # across RGB) — synthetic noise doesn't have this signature
    assert x.max() > 240 and x.min() < 10
    assert x.std() > 40.0
    flat = x.reshape(len(x), 3, -1)
    rg = [np.corrcoef(p[0], p[1])[0, 1] for p in flat[:200]
          if p[0].std() > 1 and p[1].std() > 1]
    assert np.nanmean(rg) > 0.5, "RGB channels uncorrelated — not photos"


def test_patches_loader_batches():
    tr, va, te = patches.load_data(batch_size=104)
    x = next(iter(tr))
    assert x.shape == (104, 3, 16, 16)
    assert sum(b.shape[0] for b in va) == 208


@pytest.mark.slow
def test_fifty_steps_on_real_patches_improves_bpd(tmp_path):
    from inverse_flow_tpu.experiments import get_experiment
    from inverse_flow_tpu.train.experiment import Experiment

    spec = get_experiment("real_patches_glow")
    cfg = spec.config.replace(
        epochs=3, log_timing=False, save_images=False,
        plot_recon=False, sample_epochs=1000, eval_epochs=1000,
        checkpoint_path=str(tmp_path / "c.pkl"),
        metrics_path=str(tmp_path / "m.jsonl"))
    exp = Experiment(spec.build_model(), *spec.load_data(cfg.batch_size),
                     cfg)
    l1 = exp.train_epoch(1)          # 16 batches/epoch at bs=104
    for e in range(2, 4):
        l2 = exp.train_epoch(e)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1, f"real-data loss did not decrease: {l1} -> {l2}"
    val = exp.eval_epoch(exp.val_loader)
    bpd = exp.to_bpd(val)
    assert np.isfinite(bpd)
    # untrained ~8 bpd; ~45 real-data steps must land clearly below
    assert 0.0 < bpd < 7.5, f"real-data BPD out of band: {bpd}"

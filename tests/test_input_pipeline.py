"""Input-pipeline units: uint8 upload gate, prefetch ordering, fused
batch tiling — the readback/traffic machinery added in round 2."""

import jax
import jax.numpy as jnp
import numpy as np

from inverse_flow_tpu.data import synthetic
from inverse_flow_tpu.models.glow import build_glow
from inverse_flow_tpu.ops.fused_chain import _batch_tile
from inverse_flow_tpu.train.config import ExperimentConfig
from inverse_flow_tpu.train.experiment import Experiment


def _exp(tmp_path):
    flow = build_glow((1, 8, 8), step_kind="conv1x1", num_blocks=1,
                      block_size=1, coupling_width=8, actnorm=False,
                      split_prior=False, activation=None)
    loaders = synthetic.load_data((1, 8, 8), n_train=32, n_val=16,
                                  n_test=16, batch_size=8)
    cfg = ExperimentConfig(name="pipe", epochs=1, batch_size=8,
                           log_timing=False, save_images=False,
                           plot_recon=False,
                           checkpoint_path=str(tmp_path / "c.pkl"),
                           metrics_path=str(tmp_path / "m.jsonl"))
    return Experiment(flow, *loaders, cfg)


def test_u8_gate_integral_then_fractional(tmp_path):
    exp = _exp(tmp_path)
    ints = np.arange(64, dtype=np.float32).reshape(1, 1, 8, 8)
    xb = exp._prep_batch(ints)
    assert exp._u8_upload is True
    np.testing.assert_allclose(np.asarray(xb), ints)
    # a later non-integral batch must NOT be truncated through uint8
    frac = ints + 0.5
    xb2 = exp._prep_batch(frac)
    assert exp._u8_upload is False
    np.testing.assert_allclose(np.asarray(xb2), frac)
    # and stays off for subsequent integral batches (cheap fast path)
    xb3 = exp._prep_batch(ints)
    np.testing.assert_allclose(np.asarray(xb3), ints)


def test_u8_gate_rejects_out_of_range(tmp_path):
    exp = _exp(tmp_path)
    neg = np.array([[-1.0, 3.0]], np.float32).reshape(1, 1, 1, 2)
    xb = exp._prep_batch(neg)
    assert exp._u8_upload is False
    np.testing.assert_allclose(np.asarray(xb), np.asarray(neg))


def test_prefetch_preserves_order_and_count(tmp_path):
    exp = _exp(tmp_path)
    batches = [np.full((2, 1, 8, 8), float(i), np.float32)
               for i in range(5)]
    out = list(exp._prefetch_batches(batches))
    assert len(out) == 5
    for i, (x, xb) in enumerate(out):
        assert float(x[0, 0, 0, 0]) == float(i)
        assert float(np.asarray(xb)[0, 0, 0, 0]) == float(i)


def test_batch_tile_even_split():
    # whole batch fits -> use it exactly (no multiple-of-8 truncation)
    assert _batch_tile(100, 4, 2, 392, 112) == 100
    # batch exceeds cap -> even split rounded to sublane multiple,
    # never exceeding the cap, and pad waste stays < one tile
    n, nb, rcw, kcw = 4, 2, 392, 112
    bt = _batch_tile(1000, n, nb, rcw, kcw)
    assert bt is not None and bt % 8 == 0
    budget = 10 * 1024 * 1024 // 4 - n * rcw * (rcw + kcw)
    cap = budget // (2 * nb * rcw * (1 + n) + kcw)
    assert bt <= cap
    steps = -(-1000 // bt)
    assert steps * bt - 1000 < bt            # pad < one tile
    # impossible budgets refuse
    assert _batch_tile(100, 4, 64, 4096, 2048) is None


def test_batch_tile_cap_keeps_sublane_multiple():
    """Regression (found compiled on TPU, imagenet32 batch 256): when the
    even-split tile exceeds the VMEM cap, the capped tile must still be a
    multiple of 8 — the Pallas sublane rule applies to every non-full
    block, and interpret mode never enforces it."""
    n, nb, rcw, kcw = 4, 8, 384, 768     # imagenet32 L1 4-order numbers
    bt = _batch_tile(256, n, nb, rcw, kcw)
    assert bt is not None and (bt % 8 == 0 or bt == 256)
    for b in (100, 128, 256, 512, 1000, 1024):
        for nb_ in (2, 4, 8):
            bt = _batch_tile(b, 4, nb_, 384, 768)
            if bt is None:
                continue
            steps = -(-b // bt)
            assert bt % 8 == 0 or steps == 1, (b, nb_, bt)


def test_loader_small_dataset_never_prefetches():
    """n < batch_size used to hand the native prefetcher an order[]
    shorter than one batch (OOB read -> SIGSEGV) or silently yield zero
    batches; now the prefetcher is skipped and the python fallback's
    single clamped short batch is produced."""
    from inverse_flow_tpu.data.loader import ArrayLoader

    data = np.arange(64 * 4, dtype=np.uint8).reshape(64, 1, 2, 2)
    loader = ArrayLoader(data, batch_size=128, shuffle=True)
    assert loader._prefetcher is None
    batches = list(loader)
    assert len(batches) == len(loader) == 1
    assert batches[0].shape[0] == 64
    import pytest
    with pytest.raises(ValueError, match="full batch"):
        ArrayLoader(data, batch_size=128, shuffle=True,
                    native_prefetch=True)


def test_loader_fractional_floats_never_prefetch():
    """The lossless-uint8 gate must inspect the WHOLE array: fractional
    values past the first two samples used to slip through and truncate
    (7.5 -> 7); forcing the prefetcher on non-integral data must raise
    rather than wrap/truncate silently."""
    import pytest

    from inverse_flow_tpu.data.loader import ArrayLoader

    data = np.zeros((8, 1, 2, 2), np.float32)
    data[5] = 7.5                       # first two samples stay integral
    loader = ArrayLoader(data, batch_size=4, shuffle=True, seed=0)
    assert loader._prefetcher is None
    vals = np.concatenate([b.ravel() for b in loader])
    assert 7.5 in vals                  # nothing truncated
    with pytest.raises(ValueError, match="uint8"):
        ArrayLoader(np.random.RandomState(0).randn(16, 1, 2, 2)
                    .astype(np.float32),
                    batch_size=4, shuffle=True, native_prefetch=True)


def test_eval_loaders_cover_all_samples():
    """drop_last must be off for val/test: the 180-sample digit splits at
    batch_size=100 used to evaluate only the first 100 samples."""
    from inverse_flow_tpu.data import digits

    _, val, test = digits.load_data(batch_size=100)
    for loader in (val, test):
        n = sum(b.shape[0] for b in loader)
        assert n == loader.data.shape[0] == 180


def test_eval_epoch_counts_partial_batches():
    """The trainer's eval loop must include the final short batch (and,
    under a mesh, route a non-divisible one through the unsharded
    fallback without error)."""
    flow = build_glow((1, 8, 8), step_kind="inv_conv_no_pad", num_blocks=1,
                      block_size=1, coupling_width=8, activation="None")
    loaders = synthetic.load_data((1, 8, 8), n_train=32, n_val=24,
                                  n_test=24, batch_size=16)
    cfg = ExperimentConfig(name="partial-eval", epochs=1, batch_size=16,
                           save_images=False, log_timing=False,
                           metrics_path="/tmp/pe_m.jsonl",
                           checkpoint_path="/tmp/pe_c.pkl",
                           data_parallel=True)
    exp = Experiment(flow, *loaders, cfg)
    x = next(iter(exp.val_loader))
    exp.maybe_data_init(x)

    # 24 = 16 + 8 (8 divides the mesh); the 19-sample loader below forces
    # a 3-sample remainder through the non-divisible unsharded fallback
    val = exp.eval_epoch(exp.val_loader)
    assert np.isfinite(val)
    total = sum(b.shape[0] for b in exp.val_loader)
    assert total == 24

    from inverse_flow_tpu.data.loader import ArrayLoader
    odd = ArrayLoader(exp.val_loader.data[:19], batch_size=16,
                      drop_last=False)
    assert [b.shape[0] for b in odd] == [16, 3]
    val_odd = exp.eval_epoch(odd)
    assert np.isfinite(val_odd)

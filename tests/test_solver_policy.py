"""Shape-aware ``solver='auto'`` policy (ops/solver_policy.py).

Two claims under test:
  1. the routing table itself — exact on squares / production shapes,
     Jacobi only inside the measured tall-thin win window
     (BASELINE.md "Timescaling" table);
  2. semantic safety of the routing — at production weight scales the
     Jacobi path the policy selects matches the exact solve on values
     AND gradients to f32 round-off, so 'auto' never silently changes
     results (reference parity: ``inf/experiments/if_timescaling.py``
     runs the same model on the tall axis).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverse_flow_tpu.layers.inv_flow import InvFlow, InvFlowNoPad, InvFlowUnit
from inverse_flow_tpu.ops.solver_policy import resolve_auto


# ---------------------------------------------------------------------------
# 1. routing table
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,expected", [
    # squares: exact at every measured size (Jacobi lost all four)
    ((128, 1, 16, 16), "exact"),
    ((128, 1, 32, 32), "exact"),
    ((128, 1, 64, 64), "exact"),
    ((128, 1, 128, 128), "exact"),
    # production configs: exact (imagenet32 whole-unit A/B: exact 4/4)
    ((100, 12, 16, 16), "exact"),
    ((100, 4, 14, 14), "exact"),
    # the paper's tall axis: jacobi inside the measured [64, 512] window
    ((128, 1, 64, 1), "jacobi"),
    ((128, 1, 128, 1), "jacobi"),
    ((128, 1, 512, 1), "jacobi"),
    # wide is NOT the transpose of tall for the exact solver (its scan
    # runs over rows — H=1 is a single log-depth block solve) and was
    # never measured: exact
    ((128, 1, 1, 128), "exact"),
    # outside the window: exact retakes at H=2048 (measured), and short
    # chains never amortize the 12x conv-FLOP multiplier
    ((128, 1, 2048, 1), "exact"),
    ((128, 1, 1024, 1), "exact"),
    ((128, 1, 32, 1), "exact"),
    # thin but many channels: the exact solve is FLOP-efficient again
    ((128, 8, 128, 1), "exact"),
])
def test_resolve_auto_table(shape, expected):
    assert resolve_auto(shape, (2, 2)) == expected


def test_resolve_auto_groups_use_per_group_channels():
    # 8 channels in 4 groups = 2 per group: thin gate sees cg=2 > is
    # still above short*cg <= 2 with short=1? short*cg = 2 -> jacobi
    assert resolve_auto((4, 8, 128, 1), (2, 2), groups=4) == "jacobi"
    assert resolve_auto((4, 8, 128, 1), (2, 2), groups=1) == "exact"


def test_resolve_auto_kernel_gate():
    # every crossover row was measured at kernel 2x2; larger kernels
    # change both arms' costs and stay on the exact default
    assert resolve_auto((128, 1, 128, 1), (3, 3)) == "exact"
    assert resolve_auto((128, 1, 128, 1), (2, 2)) == "jacobi"
    assert resolve_auto((128, 1, 128, 1), (1, 2)) == "jacobi"


# ---------------------------------------------------------------------------
# 2. semantic safety: auto == exact to f32 round-off where it routes
#    to jacobi (production weight scale = the 0.01-gain init)
# ---------------------------------------------------------------------------

def _tall_layer_pair(cls, h=128, **kw):
    rng = jax.random.PRNGKey(0)
    shape = (1, h, 1)
    auto = cls(1, (2, 2), solver="auto", **kw)
    exact = cls(1, (2, 2), solver="exact", **kw)
    params, _ = auto.init(rng, shape)
    x = jax.random.normal(jax.random.PRNGKey(1), (4,) + shape, jnp.float32)
    return auto, exact, params, x


def test_auto_routes_jacobi_and_matches_exact_values():
    auto, exact, params, x = _tall_layer_pair(InvFlowNoPad)
    assert auto._eff_solver(x.shape) == "jacobi"
    y_auto, ldj_a = auto.forward(params, x)
    y_exact, ldj_e = exact.forward(params, x)
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_exact),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ldj_a), np.asarray(ldj_e))


def test_auto_matches_exact_gradients():
    auto, exact, params, x = _tall_layer_pair(InvFlowNoPad)

    def loss(layer):
        def f(p):
            y, _ = layer.forward(p, x)
            return jnp.sum(y ** 2)
        return jax.grad(f)(params)

    g_auto, g_exact = loss(auto), loss(exact)
    np.testing.assert_allclose(np.asarray(g_auto["w"]),
                               np.asarray(g_exact["w"]),
                               rtol=1e-4, atol=1e-6)


def test_auto_square_shape_is_exact_path():
    layer = InvFlowNoPad(1, (2, 2), solver="auto")
    assert layer._eff_solver((4, 1, 16, 16)) == "exact"
    # bitwise-identical to an explicit exact layer on squares
    rng = jax.random.PRNGKey(0)
    params, _ = layer.init(rng, (1, 16, 16))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16))
    y_auto, _ = layer.forward(params, x)
    y_exact, _ = InvFlowNoPad(1, (2, 2), solver="exact").forward(params, x)
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_exact))


def test_unit_auto_routes_and_matches_exact():
    rng = jax.random.PRNGKey(0)
    shape = (1, 128, 1)
    auto = InvFlowUnit(1, (2, 2), solver="auto")
    exact = InvFlowUnit(1, (2, 2), solver="exact")
    params, _ = auto.init(rng, shape)
    x = jax.random.normal(jax.random.PRNGKey(1), (4,) + shape, jnp.float32)
    assert auto._eff_solver(x.shape) == "jacobi"
    y_auto, _ = auto.forward(params, x)
    y_exact, _ = exact.forward(params, x)
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_exact),
                               rtol=1e-5, atol=1e-6)


def test_unit_auto_prepare_skips_jacobi_shapes():
    unit = InvFlowUnit(1, (2, 2), solver="auto")
    params, _ = unit.init(jax.random.PRNGKey(0), (1, 128, 1))
    assert unit.prepare(params, (1, 128, 1)) is None


def _large_weight_setup(h=128):
    # |w| = 0.7 on every masked tap: far outside the small-init /
    # weight_clamp=0.01 regime. A bare 12-term Neumann truncation errs
    # by ~0.7^12 ~ 1e-2 here — the regime the residual guard exists for.
    shape = (1, h, 1)
    params = {"w": jnp.full((1, 1, 2, 2), 0.7, jnp.float32)}
    x = jax.random.normal(jax.random.PRNGKey(1), (4,) + shape, jnp.float32)
    return shape, params, x


def test_auto_guard_exact_at_large_weights():
    """Policy-routed Jacobi must keep exact semantics OUTSIDE the
    small-init regime: 'auto' runs residual-guarded with the nilpotency
    iteration cap (ops/solver_policy.auto_jacobi_params), so growing
    trained weights can never silently corrupt forward()."""
    _, params, x = _large_weight_setup()
    auto = InvFlowNoPad(1, (2, 2), solver="auto")
    exact = InvFlowNoPad(1, (2, 2), solver="exact")
    bare = InvFlowNoPad(1, (2, 2), solver="jacobi", jacobi_iters=12)
    assert auto._eff_solver(x.shape) == "jacobi"
    y_auto, _ = auto.forward(params, x)
    y_exact, _ = exact.forward(params, x)
    y_bare, _ = bare.forward(params, x)
    # the bare truncation is materially wrong here — otherwise this
    # test would not discriminate the guard from the old fixed-12 route
    assert float(jnp.max(jnp.abs(y_bare - y_exact))) > 1e-4
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_exact),
                               rtol=1e-5, atol=1e-6)


def test_auto_guard_gradients_at_large_weights():
    _, params, x = _large_weight_setup()
    auto = InvFlowNoPad(1, (2, 2), solver="auto")
    exact = InvFlowNoPad(1, (2, 2), solver="exact")

    def loss(layer):
        def f(p):
            y, _ = layer.forward(p, x)
            return jnp.sum(y ** 2)
        return jax.grad(f)(params)

    g_auto, g_exact = loss(auto), loss(exact)
    np.testing.assert_allclose(np.asarray(g_auto["w"]),
                               np.asarray(g_exact["w"]),
                               rtol=1e-4, atol=1e-5)


def test_auto_jacobi_params_tol_clamp():
    """Policy tol rules: user tols at/above JACOBI_TOL_MIN are honored
    verbatim (they sit above the conv noise floor and can fire); tols
    below it — which would make the guard's cond unfireable and the
    nilpotency-cap branch run every step (measured 8x regression) —
    are replaced by JACOBI_AUTO_TOL."""
    from inverse_flow_tpu.ops.solver_policy import (JACOBI_AUTO_TOL,
                                                    JACOBI_TOL_MIN,
                                                    auto_jacobi_params)
    shape = (4, 1, 128, 1)
    fast, cap, tol = auto_jacobi_params(shape)
    assert (fast, cap, tol) == (12, 128, JACOBI_AUTO_TOL)
    assert auto_jacobi_params(shape, requested_tol=5e-4)[2] == 5e-4
    assert auto_jacobi_params(shape, requested_tol=JACOBI_TOL_MIN)[2] \
        == JACOBI_TOL_MIN
    assert auto_jacobi_params(shape, requested_tol=1e-6)[2] \
        == JACOBI_AUTO_TOL
    # grouped: cap uses per-group channel count
    assert auto_jacobi_params((4, 8, 128, 1), groups=4)[1] == 2 * 128


def test_auto_guard_roundtrip_at_large_weights():
    _, params, x = _large_weight_setup()
    auto = InvFlowNoPad(1, (2, 2), solver="auto")
    y, _ = auto.forward(params, x)
    x_rec = auto.inverse(params, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_auto_roundtrip_through_inverse():
    # sampling direction is the masked conv — solver-independent; the
    # train->sample round trip must reconstruct through the jacobi route
    auto, _, params, x = _tall_layer_pair(InvFlowNoPad)
    y, _ = auto.forward(params, x)
    x_rec = auto.inverse(params, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               rtol=1e-5, atol=1e-5)

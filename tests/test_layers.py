"""Layer property tests: invertibility + log-det vs brute-force Jacobian.

Port of the reference's gold-standard checks (``tests/inf/test_layers.py``):
``check_inverse`` (:19-36, round-trip atol 1e-3) and ``check_logdet``
(:67-98, claimed ldj vs jacobian+slogdet, atol 1e-4) — here via
``jax.jacfwd`` + ``jnp.linalg.slogdet`` on CPU (no CUDA-only constraint).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverse_flow_tpu.distributions import GaussianPrior, UniformDistribution
from inverse_flow_tpu.layers import (ActNorm, ActNormFC, Conv1x1,
                                     Conv1x1Householder, Coupling,
                                     Dequantization, Identity,
                                     LearnableLeakyRelu, LeakyRelu,
                                     LogitTransform, Normalization,
                                     SigmoidTransform, SmoothLeakyRelu,
                                     SmoothTanh, SplineActivation, SplitPrior,
                                     Squeeze, UnSqueeze)

KEY = jax.random.PRNGKey(0)
IMG_SHAPE = (4, 8, 8)   # (C, H, W)
FC_SHAPE = (16,)
BATCH = 3


def _make(layer, shape=IMG_SHAPE, seed=0, scale=1.0, positive=False):
    rng = jax.random.PRNGKey(seed)
    k_init, k_data, k_fwd = jax.random.split(rng, 3)
    params, out_shape = layer.init(k_init, shape)
    x = jax.random.normal(k_data, (BATCH,) + shape, jnp.float32) * scale
    if positive:
        x = jax.nn.sigmoid(x) * 0.98 + 0.01
    return layer, params, x, k_fwd


def check_inverse(layer, params, x, rng=None, atol=1e-3):
    z, _ = layer.forward(params, x, rng=rng)
    x_rec = layer.inverse(params, z, rng=rng)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), atol=atol)


def check_logdet(layer, params, x, rng=None, atol=1e-4, rtol=1e-4):
    """Claimed ldj vs slogdet of the brute-force per-sample Jacobian."""
    _, ldj = layer.forward(params, x, rng=rng)

    def flat_fwd(x_flat, shape):
        z, _ = layer.forward(params, x_flat.reshape((1,) + shape), rng=rng)
        return z.reshape(-1)

    for i in range(min(2, x.shape[0])):
        xi = x[i].reshape(-1)
        # jacrev (not jacfwd): layers with custom_vjp support reverse mode
        jac = jax.jacrev(lambda v: flat_fwd(v, x.shape[1:]))(xi)
        _, ld_true = jnp.linalg.slogdet(jac)
        np.testing.assert_allclose(float(ldj[i]), float(ld_true),
                                   atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------
ELEMENTWISE = [
    SmoothLeakyRelu(alpha=0.3),
    LeakyRelu(alpha=0.1),
    LearnableLeakyRelu(),
    SmoothTanh(alpha=1.0, beta=0.1),
    Identity(),
]


@pytest.mark.parametrize("layer", ELEMENTWISE, ids=lambda l: type(l).__name__)
def test_activation_inverse_and_logdet(layer):
    layer, params, x, _ = _make(layer)
    check_inverse(layer, params, x)
    check_logdet(layer, params, x)


@pytest.mark.slow
def test_spline_activation():
    layer = SplineActivation(IMG_SHAPE, n_bins=5, tail_bound=10.0,
                             individual_weights=True)
    layer, params, x, _ = _make(layer, scale=3.0)
    check_inverse(layer, params, x)
    check_logdet(layer, params, x, atol=2e-4)


def test_spline_activation_global_weights():
    layer = SplineActivation(IMG_SHAPE, n_bins=5, tail_bound=10.0,
                             individual_weights=False)
    layer, params, x, _ = _make(layer, scale=3.0)
    check_inverse(layer, params, x)
    check_logdet(layer, params, x, atol=2e-4)


def test_actnorm():
    layer, params, x, _ = _make(ActNorm(IMG_SHAPE[0]))
    params = layer.data_init(params, x)
    check_inverse(layer, params, x)
    check_logdet(layer, params, x)


@pytest.mark.slow
def test_actnorm_fc():
    layer, params, x, _ = _make(ActNormFC(FC_SHAPE[0]), shape=FC_SHAPE)
    params = layer.data_init(params, x)
    check_inverse(layer, params, x)
    check_logdet(layer, params, x)


def test_conv1x1():
    layer, params, x, _ = _make(Conv1x1(IMG_SHAPE[0]))
    check_inverse(layer, params, x)
    check_logdet(layer, params, x, atol=1e-3, rtol=1e-3)


def test_conv1x1_householder():
    layer, params, x, _ = _make(
        Conv1x1Householder(IMG_SHAPE[0], n_reflections=3))
    check_inverse(layer, params, x)
    check_logdet(layer, params, x, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_coupling():
    layer, params, x, _ = _make(Coupling(IMG_SHAPE, width=32))
    # nonzero coupling net output: perturb zero-init final conv
    params["w3"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), params["w3"].shape)
    check_inverse(layer, params, x)
    check_logdet(layer, params, x, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_coupling_remat_net_identical():
    """remat_net only changes WHEN the net's activations are computed
    (backward recompute vs forward stash) — values and gradients must be
    bit-identical on CPU."""
    layer, params, x, _ = _make(Coupling(IMG_SHAPE, width=32))
    params["w3"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), params["w3"].shape)
    rl = Coupling(IMG_SHAPE, width=32, remat_net=True)

    def loss(lyr, p):
        z, ldj = lyr.forward(p, x)
        return jnp.sum(jnp.sin(z)) + jnp.sum(ldj)

    v1, g1 = jax.value_and_grad(lambda p: loss(layer, p))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(rl, p))(params)
    assert float(v1) == float(v2)
    for k in g1:
        np.testing.assert_array_equal(np.asarray(g1[k]), np.asarray(g2[k]))


def test_squeeze_roundtrip_and_order():
    layer, params, x, _ = _make(Squeeze())
    check_inverse(layer, params, x)
    z, ldj = layer.forward(params, x)
    assert z.shape == (BATCH, 16, 4, 4)
    assert np.allclose(np.asarray(ldj), 0.0)
    # UnSqueeze is the exact inverse
    un = UnSqueeze()
    x2, _ = un.forward({}, z)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=0)


def test_normalization():
    layer, params, x, _ = _make(Normalization(translation=0.0, scale=256.0),
                                positive=True)
    x = x * 255.0
    check_inverse(layer, params, x)
    check_logdet(layer, params, x, atol=1e-3, rtol=1e-3)


def test_logit_sigmoid():
    layer, params, x, _ = _make(LogitTransform(), positive=True)
    check_inverse(layer, params, x, atol=2e-3)
    check_logdet(layer, params, x, atol=1e-3, rtol=1e-3)

    layer2, params2, x2, _ = _make(SigmoidTransform())
    check_inverse(layer2, params2, x2, atol=2e-3)
    check_logdet(layer2, params2, x2, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_dequantization():
    dist = UniformDistribution(IMG_SHAPE)
    layer = Dequantization(dist)
    params, _ = layer.init(KEY, IMG_SHAPE)
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (BATCH,) + IMG_SHAPE), jnp.float32)
    z, ldj = layer.forward(params, x, rng=KEY)
    assert z.shape == x.shape
    assert np.allclose(np.asarray(ldj), 0.0)  # uniform noise: log q = 0
    x_rec = layer.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), atol=0)


@pytest.mark.slow
def test_splitprior():
    layer = SplitPrior(IMG_SHAPE, width=16)
    params, out_shape = layer.init(KEY, IMG_SHAPE)
    assert out_shape == (2, 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(3), (BATCH,) + IMG_SHAPE)
    z, ldj = layer.forward(params, x)
    assert z.shape == (BATCH, 2, 8, 8)
    assert ldj.shape == (BATCH,)
    x_rec = layer.inverse(params, z, rng=KEY)
    assert x_rec.shape == x.shape
    # The un-factored half must round-trip exactly through the coupling.
    z2, _ = layer.forward(params, x_rec)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-4)


# --- invertible convolutions (the paper's layers) --------------------------
from inverse_flow_tpu.layers import (InvFlow, InvFlowNoPad, InvFlowUnit,
                                     PaddedConv2d, FincFlowUnit)


@pytest.mark.parametrize("order", [
    "TL",
    pytest.param("TR", marks=pytest.mark.slow),
    pytest.param("BL", marks=pytest.mark.slow),
    pytest.param("BR", marks=pytest.mark.slow),
])
def test_inv_flow_orders(order):
    layer, params, x, _ = _make(InvFlow(IMG_SHAPE[0], (3, 3), order=order),
                                seed=11)
    # bump weights so the transform is nontrivial
    params = {"w": params["w"] + 0.1 * jax.random.normal(
        jax.random.PRNGKey(12), params["w"].shape)}
    check_inverse(layer, params, x, atol=2e-3)
    check_logdet(layer, params, x, atol=1e-3)  # must be exactly 0


@pytest.mark.slow
def test_inv_flow_no_pad_and_unit():
    layer, params, x, _ = _make(InvFlowNoPad(IMG_SHAPE[0], (2, 2)), seed=13)
    check_inverse(layer, params, x, atol=2e-3)
    check_logdet(layer, params, x, atol=1e-3)

    unit, uparams, x, _ = _make(InvFlowUnit(IMG_SHAPE[0], (2, 2)), seed=14)
    check_inverse(unit, uparams, x, atol=2e-3)
    check_logdet(unit, uparams, x, atol=1e-3)


@pytest.mark.parametrize("order", ["TL", "BR"])
def test_padded_conv(order):
    layer, params, x, _ = _make(PaddedConv2d(IMG_SHAPE[0], (3, 3),
                                             order=order), seed=15)
    check_inverse(layer, params, x, atol=2e-3)
    check_logdet(layer, params, x, atol=1e-3)


@pytest.mark.slow
def test_fincflow_unit():
    layer, params, x, _ = _make(FincFlowUnit(IMG_SHAPE[0], (3, 3)), seed=16)
    check_inverse(layer, params, x, atol=2e-3)
    check_logdet(layer, params, x, atol=1e-3)


@pytest.mark.slow
def test_bspline_activation():
    from inverse_flow_tpu.layers import BSplineActivation
    layer = BSplineActivation(n_bins=8, tail_bound=4.0)
    params, _ = layer.init(jax.random.PRNGKey(11), (3, 6, 6))
    x = jax.random.normal(jax.random.PRNGKey(12), (4, 3, 6, 6))
    check_inverse(layer, params, x, atol=2e-3)
    check_logdet(layer, params, x)


def test_bspline_monotone_and_endpoint_fixed():
    from inverse_flow_tpu.layers.splines import monotone_cubic_b_spline
    c = jax.random.normal(jax.random.PRNGKey(13), (11,))
    xs = jnp.linspace(0.0, 1.0, 101)
    ys, ld = monotone_cubic_b_spline(xs, c)
    assert np.all(np.diff(np.asarray(ys)) > 0)
    np.testing.assert_allclose(float(ys[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(ys[-1]), 1.0, atol=1e-6)
    # logdet integrates the derivative: finite-diff agreement
    fd = np.gradient(np.asarray(ys), np.asarray(xs))
    np.testing.assert_allclose(np.exp(np.asarray(ld[1:-1])), fd[1:-1],
                               rtol=5e-2)


@pytest.mark.slow
def test_gaussianize_roundtrip_and_logdet():
    from inverse_flow_tpu.layers import Gaussianize
    layer = Gaussianize(2)
    params, _ = layer.init(jax.random.PRNGKey(20), (4, 6, 6))
    # non-trivial conv params (zero-init is the identity)
    params = jax.tree_util.tree_map(
        lambda p: 0.1 * jax.random.normal(jax.random.PRNGKey(21), p.shape),
        params)
    x = jax.random.normal(jax.random.PRNGKey(22), (3, 4, 6, 6))
    check_inverse(layer, params, x)
    check_logdet(layer, params, x)


@pytest.mark.slow
def test_gaussianize_split_and_fastflow():
    from inverse_flow_tpu.layers import GaussianizeSplit
    layer = GaussianizeSplit((4, 6, 6))
    params, out_shape = layer.init(jax.random.PRNGKey(23), (4, 6, 6))
    assert out_shape == (2, 6, 6)
    x = jax.random.normal(jax.random.PRNGKey(24), (3, 4, 6, 6))
    x1, ldj = layer.forward(params, x)
    assert x1.shape == (3, 2, 6, 6) and ldj.shape == (3,)
    # zero-init => z2 = x2 exactly, ldj = log N(0,1)(x2)
    from inverse_flow_tpu.distributions import GaussianPrior
    np.testing.assert_allclose(
        np.asarray(ldj), np.asarray(GaussianPrior((2, 6, 6)).log_prob(x[:, 2:])),
        rtol=1e-5)
    rec = layer.inverse(params, x1, rng=jax.random.PRNGKey(25))
    assert rec.shape == x.shape

    from inverse_flow_tpu.models.fastflow import build_fastflow
    flow = build_fastflow((3, 16, 16), n_blocks=2, block_size=2,
                          coupling_width=16, actnorm=True)
    fparams, final = flow.init(jax.random.PRNGKey(26), (3, 16, 16))
    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (2, 3, 16, 16)), jnp.float32)
    z, logpx = flow.forward(fparams, x, rng=jax.random.PRNGKey(27))
    assert z.shape[0] == 2 and np.all(np.isfinite(np.asarray(logpx)))
    s = flow.sample(fparams, jax.random.PRNGKey(28), 2)
    assert s.shape == (2, 3, 16, 16)


@pytest.mark.slow
def test_inv_flow_jacobi_solver():
    from inverse_flow_tpu.layers.inv_flow import InvFlow
    layer = InvFlow(3, (3, 3), order="TR", solver="jacobi", jacobi_iters=16)
    params, _ = layer.init(jax.random.PRNGKey(30), (3, 8, 8))
    # shrink weights into the convergent training regime
    params = jax.tree_util.tree_map(lambda p: 0.1 * p, params)
    x = jax.random.normal(jax.random.PRNGKey(31), (2, 3, 8, 8))
    check_inverse(layer, params, x)
    # gradients flow through the iterations
    g = jax.grad(lambda p: jnp.sum(layer.forward(p, x)[0] ** 2))(params)
    assert np.isfinite(np.asarray(g["w"]).sum())


@pytest.mark.slow
def test_inv_flow_unit_jacobi_solver():
    """InvFlowUnit(solver='jacobi'): all four orders by Neumann
    iterations — must agree with the exact unit to iteration tolerance
    and round-trip (reference counterpart: the wavefront inverse used by
    ``inf/layers/inv_flow.py:28-53``; here it is the MXU-parallel arm)."""
    from inverse_flow_tpu.layers.inv_flow import InvFlowUnit
    exact = InvFlowUnit(3, (3, 3), solver="exact")
    jac = InvFlowUnit(3, (3, 3), solver="jacobi", jacobi_iters=24)
    params, _ = exact.init(jax.random.PRNGKey(40), (3, 8, 8))
    params = jax.tree_util.tree_map(lambda p: 0.1 * p, params)
    x = jax.random.normal(jax.random.PRNGKey(41), (2, 3, 8, 8))
    ye, _ = exact.forward(params, x)
    yj, ldj = jac.forward(params, x)
    np.testing.assert_allclose(np.asarray(yj), np.asarray(ye),
                               atol=1e-4, rtol=1e-4)
    assert np.allclose(np.asarray(ldj), 0.0)
    check_inverse(jac, params, x)
    g = jax.grad(lambda p: jnp.sum(jac.forward(p, x)[0] ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_logit_sigmoid_extreme_inputs_finite_grads():
    """The naive 1/(1+exp(-x)) overflows below x~-88 in f32 and its VJP
    then yields 0*inf = NaN; the stable jax.nn forms must keep gradients
    finite at any pre-activation magnitude."""
    from inverse_flow_tpu.layers import LogitTransform, SigmoidTransform
    x = jnp.array([[-120.0, -1.0, 0.0, 1.0, 120.0]], jnp.float32)
    sig = SigmoidTransform()

    def loss(v):
        z, ldj = sig.forward({}, v)
        return jnp.sum(z) + jnp.sum(ldj)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    lg = jax.grad(lambda v: jnp.sum(LogitTransform().inverse({}, v)))(x)
    assert np.isfinite(np.asarray(lg)).all()

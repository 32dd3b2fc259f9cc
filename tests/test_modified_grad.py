"""SelfNorm modified-gradient algebra oracle + emerging/convexp layer tests.

The self-normalizing gradient is intentionally NOT the true gradient, so
autodiff checks don't apply (SURVEY §7 hard parts); instead the custom VJP
is checked against a direct einsum transcription of the reference algebra
(``inf/layers/selfnorm.py:52-90``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverse_flow_tpu.layers import (ConvExp, Emerging, SelfNormConv,
                                     SelfNormFC, SquareAutoRegressiveConv2d)
from inverse_flow_tpu.layers.selfnorm import flip_kernel, selfnorm_conv2d

from test_layers import _make, check_inverse, check_logdet


def _patches(x, kh, kw, padding):
    """im2col: (B, Cin, KH, KW, OH, OW)."""
    x = np.pad(np.asarray(x), ((0, 0), (0, 0), (padding, padding),
                               (padding, padding)))
    b, c, h, w = x.shape
    oh, ow = h - kh + 1, w - kw + 1
    out = np.zeros((b, c, kh, kw, oh, ow), np.float32)
    for i in range(kh):
        for j in range(kw):
            out[:, :, i, j] = x[:, :, i:i + oh, j:j + ow]
    return out


def _wgrad_oracle(g, x, kh, kw, padding):
    p = _patches(x, kh, kw, padding)
    return np.einsum("bohw,bcijhw->ocij", np.asarray(g), p)


@pytest.mark.slow
def test_selfnorm_custom_vjp_matches_reference_algebra():
    b, cin, cout, k, pad = 4, 3, 3, 3, 1
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(keys[0], (b, cin, 8, 8), jnp.float32)
    w = 0.3 * jax.random.normal(keys[1], (cout, cin, k, k), jnp.float32)
    r = 0.3 * jax.random.normal(keys[2], (cin, cout, k, k), jnp.float32)
    bw = 0.1 * jax.random.normal(keys[3], (cout,), jnp.float32)
    g = jax.random.normal(keys[4], (b, cout, 8, 8), jnp.float32)

    def f(x, w, bw, r):
        return jnp.sum(selfnorm_conv2d(x, w, bw, r, 1, pad) * g)

    gx, gw, gb, gr = jax.grad(f, argnums=(0, 1, 2, 3))(x, w, bw, r)

    # oracle (selfnorm.py:52-90)
    z = np.asarray(selfnorm_conv2d(x, w, bw, r, 1, pad))
    multiple = _wgrad_oracle(np.ones_like(z), np.ones_like(np.asarray(x)),
                             k, k, pad) / b
    delta_z_xt = _wgrad_oracle(g, x, k, k, pad)
    gw_ref = (delta_z_xt - np.asarray(flip_kernel(jnp.asarray(r)))
              * multiple) / 2.0
    np.testing.assert_allclose(np.asarray(gw), gw_ref, atol=1e-3, rtol=1e-3)

    # input grad is the TRUE conv input grad: compare with autodiff of conv
    from inverse_flow_tpu.ops.convs import conv2d
    gx_ref = jax.grad(
        lambda x: jnp.sum(conv2d(x, w, padding=pad) * g))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-3, rtol=1e-3)

    wx = z - np.asarray(bw).reshape(1, -1, 1, 1)
    neg = _wgrad_oracle(-np.asarray(gx_ref), wx, k, k, pad)
    gr_ref = (neg + np.asarray(flip_kernel(jnp.asarray(w)))
              * np.asarray(flip_kernel(jnp.asarray(multiple)))) / 2.0
    np.testing.assert_allclose(np.asarray(gr), gr_ref, atol=1e-3, rtol=1e-3)

    gb_ref = np.asarray(g).sum((0, 2, 3))
    np.testing.assert_allclose(np.asarray(gb), gb_ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_selfnorm_conv_inverse_paths():
    layer = SelfNormConv(4, 4, (1, 1), bias=True)
    layer, params, x, _ = _make(layer, seed=21)
    # approximate inverse (R ~= W^-1 near identity init; first-order only)
    check_inverse(layer, params, x, atol=1.5e-1)
    # exact inverse must be tight
    z, _ = layer.forward(params, x)
    x_rec = layer.exact_inverse(params, z)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), atol=1e-3)
    # exact logdet vs brute force through the exact forward
    _, ldj = layer.exact_forward(params, x)
    jac = jax.jacrev(lambda v: layer.exact_forward(
        params, v.reshape((1,) + x.shape[1:]))[0].reshape(-1))(
            x[0].reshape(-1))
    _, ld_true = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(float(ldj[0]), float(ld_true), atol=1e-3,
                               rtol=1e-3)


@pytest.mark.slow
def test_selfnorm_conv3x3_exact_logdet():
    layer = SelfNormConv(2, 2, (3, 3), bias=False, padding=1)
    layer, params, x, _ = _make(layer, shape=(2, 6, 6), seed=22)
    _, ldj = layer.exact_forward(params, x)
    jac = jax.jacrev(lambda v: layer.exact_forward(
        params, v.reshape((1, 2, 6, 6)))[0].reshape(-1))(x[0].reshape(-1))
    _, ld_true = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(float(ldj[0]), float(ld_true), atol=1e-3,
                               rtol=1e-3)
    # recon loss is ~0 at near-identity init, positive after perturbation
    r0 = layer.recon_loss(params, x)
    params2 = dict(params, r=params["r"] + 0.3)
    r1 = layer.recon_loss(params2, x)
    assert float(r1.mean()) > float(r0.mean())


def test_selfnorm_fc():
    layer = SelfNormFC(16, 16, bias=True)
    layer, params, x, _ = _make(layer, shape=(16,), seed=23)
    check_inverse(layer, params, x, atol=5e-2)
    z, _ = layer.forward(params, x)
    x_rec = layer.exact_inverse(params, z)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), atol=1e-3)


@pytest.mark.slow
def test_emerging_ar_conv():
    layer, params, x, _ = _make(SquareAutoRegressiveConv2d(4), seed=24)
    check_inverse(layer, params, x, atol=2e-3)
    check_logdet(layer, params, x, atol=1e-3, rtol=1e-3)


def test_emerging_full():
    layer, params, x, _ = _make(Emerging(4), seed=25)
    check_inverse(layer, params, x, atol=2e-3)
    check_logdet(layer, params, x, atol=1e-3, rtol=1e-3)


def test_convexp():
    layer, params, x, _ = _make(ConvExp((4, 8, 8)), seed=26)
    params = layer.data_init(params, x)
    check_inverse(layer, params, x, atol=5e-3)
    # logdet of exp(M) = tr(M) exactly; the series is truncated so compare
    # against the brute-force jacobian of the truncated forward with a
    # looser tolerance.
    check_logdet(layer, params, x, atol=5e-2, rtol=5e-2)


def test_convexp_sigma_tracks_drifting_kernel():
    """Round-1 VERDICT item 8: the power-iteration u must persist so the
    sigma estimate tracks the kernel as it drifts over training. Carried
    u + repeated update_carry must converge sigma to the true operator
    norm of a NEW (drifted) kernel."""
    from inverse_flow_tpu.ops.toeplitz import dense_conv_operator

    layer = ConvExp((4, 8, 8))
    params, _ = layer.init(jax.random.PRNGKey(0), (4, 8, 8))
    # drift the kernel far from where u was initialized
    drift = 0.15 * jax.random.normal(jax.random.PRNGKey(9),
                                     params["kernel"].shape)
    params = dict(params, kernel=params["kernel"] + drift)

    u0 = np.asarray(params["u"])
    for _ in range(40):
        params = layer.update_carry(params)
    assert not np.allclose(np.asarray(params["u"]), u0)
    assert abs(float(jnp.linalg.norm(params["u"])) - 1.0) < 1e-4

    sigma = float(layer.sigma_estimate(params))
    t = np.asarray(dense_conv_operator(params["kernel"], (4, 8, 8),
                                       padding=1))
    sigma_true = float(np.linalg.svd(t, compute_uv=False)[0])
    assert abs(sigma - sigma_true) / sigma_true < 0.02, (sigma, sigma_true)


@pytest.mark.slow
def test_convexp_carry_threaded_through_train_step():
    """u changes across trainer steps, is never weight-clamped, and gets
    zero optimizer updates (carry_mask)."""
    from inverse_flow_tpu.data import synthetic
    from inverse_flow_tpu.layers import Flow
    from inverse_flow_tpu.distributions import GaussianPrior
    from inverse_flow_tpu.models.glow import build_preprocess
    from inverse_flow_tpu.train.config import ExperimentConfig
    from inverse_flow_tpu.train.experiment import Experiment

    layers = build_preprocess((1, 8, 8)) + [ConvExp((1, 8, 8))]
    flow = Flow(GaussianPrior((1, 8, 8)), layers)
    assert flow.has_carry
    loaders = synthetic.load_data((1, 8, 8), n_train=32, n_val=16,
                                  n_test=16, batch_size=16)
    cfg = ExperimentConfig(name="convexp-carry", epochs=1, lr=1e-3,
                           batch_size=16, weight_clamp=0.01,
                           add_recon_grad=False, plot_recon=False,
                           save_images=False, log_timing=False,
                           sample_epochs=1000,
                           metrics_path="/tmp/cec_m.jsonl",
                           checkpoint_path="/tmp/cec_c.pkl")
    exp = Experiment(flow, *loaders, cfg)
    x = next(iter(exp.train_loader))
    exp.maybe_data_init(x)
    u_before = np.asarray(exp.state.params[4]["u"])
    for i in range(3):
        exp.state, _, _ = exp._train_step(exp.state, exp._prep_batch(x),
                                          jax.random.PRNGKey(i))
    u_after = np.asarray(exp.state.params[4]["u"])
    assert not np.allclose(u_after, u_before)
    # weight_clamp=0.01 would crush ||u||=1 (entries ~0.125); the carry
    # mask must have protected it
    assert abs(float(np.linalg.norm(u_after)) - 1.0) < 1e-4


def test_repeated_recon_detach_matches_unrolled():
    """RepeatedBlock.recon_loss must detach per LAYER (the reference's
    ``x = self.input.detach()``, selfnorm.py:189), not per scanned step:
    recon gradients must not leak into preceding sublayers (ActNorm)
    within a step, and the scanned grads must equal the unrolled build's
    on identical params."""
    from inverse_flow_tpu.layers import ActNorm, RepeatedBlock

    shape = (1, 6, 6)
    block = RepeatedBlock(
        (ActNorm(1), SelfNormConv(1, 1, (1, 1), bias=True)), 2)
    params, _ = block.init(jax.random.PRNGKey(0), shape)
    x = jax.random.normal(jax.random.PRNGKey(1), (3,) + shape)

    def scanned(p):
        return jnp.sum(block.recon_loss(p, x, sym=True))

    def unrolled(p):
        h, total = x, 0.0
        for k in range(2):
            sp = jax.tree_util.tree_map(lambda s: s[k], p["steps"])
            for layer, lp in zip(block.step_layers, sp):
                h = jax.lax.stop_gradient(h)
                if layer.has_recon_loss:
                    total = total + jnp.sum(
                        layer.recon_loss(lp, h, sym=True))
                h, _ = layer.forward(lp, h)
        return total

    g_scan = jax.grad(scanned)(params)
    g_unr = jax.grad(unrolled)(params)
    # ActNorm (sublayer 0) must receive exactly zero recon gradient
    for leaf in jax.tree_util.tree_leaves(g_scan["steps"][0]):
        assert float(jnp.max(jnp.abs(leaf))) == 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_scan),
                    jax.tree_util.tree_leaves(g_unr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# round-5 layer-library review regressions
# ---------------------------------------------------------------------------

def test_selfnorm_1x1_init_is_orthogonal():
    """Reference ``selfnorm.py:139-143``: 1x1 kernels init to a random
    orthogonal matrix (the Glow channel-mixing role), not ~identity."""
    layer = SelfNormConv(8, 8, (1, 1), bias=False)
    params, _ = layer.init(jax.random.PRNGKey(0), (8, 4, 4))
    w = np.asarray(params["w"])[:, :, 0, 0]
    np.testing.assert_allclose(w.T @ w, np.eye(8), atol=1e-5)
    assert np.abs(w - np.eye(8)).max() > 0.1   # a real rotation, not dirac
    # the twin R = flip_kernel(W) = W^T is then the EXACT inverse at init
    r = np.asarray(params["r"])[:, :, 0, 0]
    np.testing.assert_allclose(r, w.T, atol=0)


def test_selfnorm_3x3_init_stays_dirac_noise():
    layer = SelfNormConv(4, 4, (3, 3), bias=False, padding=1)
    params, _ = layer.init(jax.random.PRNGKey(0), (4, 6, 6))
    center = np.asarray(params["w"])[:, :, 1, 1]
    np.testing.assert_allclose(center, np.eye(4), atol=0.05)


def test_selfnorm_fc_init_embeds_exact_identity():
    """Reference FC init (``selfnorm.py:289-296``) SETs the square channel
    block to the exact identity inside xavier noise (no QR, no noise on
    the embedded block)."""
    layer = SelfNormFC(6, 8, bias=False)
    params, _ = layer.init(jax.random.PRNGKey(0), (6,))
    w = np.asarray(params["w"])[:, :, 0, 0]
    np.testing.assert_allclose(w[:6, :6], np.eye(6), atol=0)
    assert np.abs(w[6:, :]).max() > 0          # noise outside the block


def test_selfnorm_exact_inverse_stride_guard():
    layer = SelfNormConv(2, 2, (3, 3), bias=False, padding=1, stride=2)
    params, _ = layer.init(jax.random.PRNGKey(0), (2, 6, 6))
    z = jnp.zeros((1, 2, 3, 3), jnp.float32)
    with pytest.raises(NotImplementedError):
        layer.exact_inverse(params, z)


def test_convexp_exact_forward_is_eval_series():
    """``exact_forward`` runs the 13-term eval series (the reference
    switches on ``self.training``, ``convexp_module.py:46-47``); the ldj
    (trace formula) is term-count independent and the 13/13 round trip is
    far tighter than 6-term forward / 13-term inverse."""
    layer, params, x, _ = _make(ConvExp((4, 8, 8)), seed=27)
    # push the kernel up to the spectral constraint so the series tails
    # are well above f32 round-off
    params = dict(params, kernel=params["kernel"] * 50.0)
    params = layer.data_init(params, x)
    z6, ldj6 = layer.forward(params, x)
    z13, ldj13 = layer.exact_forward(params, x)
    np.testing.assert_allclose(np.asarray(ldj6), np.asarray(ldj13),
                               rtol=1e-6)
    assert np.abs(np.asarray(z6 - z13)).max() > 1e-6
    err6 = np.abs(np.asarray(layer.inverse(params, z6) - x)).max()
    err13 = np.abs(np.asarray(layer.inverse(params, z13) - x)).max()
    # err13 bottoms out at the f32 round-off floor (~5e-7), so assert a
    # clear improvement rather than the analytic tail ratio
    assert err13 < err6 / 2
    # dispatch gate: exact path without a modified gradient
    assert layer.has_exact_path and not layer.has_modified_grad

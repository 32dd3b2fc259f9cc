"""Full-model golden likelihood parity vs an independent torch replica.

Round-1 VERDICT item 3: the reference's whole point is reproducing paper
bits/dim tables (``/root/reference/README.md:43-68``); with no real data in
CI, the strongest available evidence is an END-TO-END ``log_prob`` check
against a from-scratch torch transcription of the reference layer math
(``inf/layers/{normalize,transforms,squeeze,actnorm,conv1x1,coupling}.py``,
``inf/train/losses.py:21-49``), with *fixed injected dequantization noise*
so the pipeline is fully deterministic (uniform noise contributes 0 ldj,
``dequantize.py:12-32``).

The flow under test: Normalization x2 -> Logit -> Squeeze ->
ActNorm -> Conv1x1 -> InvFlowNoPad -> Coupling -> Gaussian prior, i.e. one
exact-path Glow step covering every deterministic layer family. Params are
perturbed away from init so every ldj term is non-trivial (coupling is
exactly identity at zero init).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from inverse_flow_tpu.distributions import GaussianPrior
from inverse_flow_tpu.layers import (ActNorm, Conv1x1, Coupling, Flow,
                                     InvFlowNoPad, LogitTransform,
                                     Normalization, Squeeze)

ALPHA = 1e-6
SIZE = (1, 8, 8)          # -> (4, 4, 4) after squeeze
CSZ = (4, 4, 4)
D = 64


def _build_flow():
    layers = [
        Normalization(translation=0.0, scale=256.0),
        Normalization(translation=-ALPHA, scale=1.0 / (1.0 - 2.0 * ALPHA)),
        LogitTransform(),
        Squeeze(),
        ActNorm(4),
        Conv1x1(4),
        InvFlowNoPad(4, (2, 2)),
        Coupling(CSZ, width=16),
    ]
    return Flow(GaussianPrior(CSZ), layers)


def _perturbed_params(flow):
    params, _ = flow.init(jax.random.PRNGKey(0), SIZE)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(11), len(leaves))
    # scale keeps conv1x1 well-conditioned and actnorm scales sane while
    # making every ldj term non-trivial (coupling is identity at zero init)
    return jax.tree_util.tree_unflatten(treedef, [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])


# ---------------------------------------------------------------------------
# torch replica (float64): each function returns (z, ldj_per_sample)

def _t_normalize(x, translation, scale):
    d = x[0].numel()
    z = (x - translation) / scale
    ldj = torch.full((x.shape[0],), -d * math.log(scale), dtype=x.dtype)
    return z, ldj


def _t_logit(x):
    z = torch.log(x) - torch.log1p(-x)
    ldj = (-torch.log(x) - torch.log1p(-x)).reshape(x.shape[0], -1).sum(-1)
    return z, ldj


def _t_squeeze(x):
    b, c, h, w = x.shape
    x = x.view(b, c, h // 2, 2, w // 2, 2).permute(0, 1, 3, 5, 2, 4)
    return x.reshape(b, c * 4, h // 2, w // 2), torch.zeros(b, dtype=x.dtype)


def _t_actnorm(x, translation, log_scale):
    z = (x - translation.view(1, -1, 1, 1)) * torch.exp(
        -log_scale.view(1, -1, 1, 1))
    ldj = torch.full((x.shape[0],),
                     float(-log_scale.sum() * x.shape[2] * x.shape[3]),
                     dtype=x.dtype)
    return z, ldj


def _t_conv1x1(x, w):
    z = torch.einsum("oc,bchw->bohw", w, x)
    ldj = x.shape[2] * x.shape[3] * torch.linalg.slogdet(w)[1]
    return z, ldj.expand(x.shape[0]).clone()


def _t_inv_conv(x, w_eff):
    """Training direction: y = T^{-1} x, T = TL-padded masked conv operator
    (dense construction via basis vectors — same oracle as
    tests/test_torch_golden.py::test_inv_conv_solve_matches_torch_dense_solve).
    Unit-triangular T => ldj = 0 exactly."""
    c, _, kh, kw = w_eff.shape
    _, _, h, wd = x.shape
    n = c * h * wd
    eye = torch.eye(n, dtype=x.dtype).reshape(n, c, h, wd)
    cols = F.conv2d(F.pad(eye, (kw - 1, 0, kh - 1, 0)), w_eff)
    t = cols.reshape(n, n).T
    y = torch.linalg.solve(t, x.reshape(x.shape[0], -1).T).T.reshape(x.shape)
    return y, torch.zeros(x.shape[0], dtype=x.dtype)


def _t_coupling(x, p):
    half = x.shape[1] // 2
    x1, x2 = x[:, :half], x[:, half:]
    h = F.conv2d(x1, p["w1"], padding=1).relu()
    h = F.conv2d(h, p["w2"]).relu()
    h = F.conv2d(h, p["w3"], padding=1) + p["b3"].view(1, -1, 1, 1)
    h = h * torch.exp(p["logs3"] * 3.0).view(1, -1, 1, 1)
    h_s, t = h[:, ::2], h[:, 1::2]
    log_s = 2.0 * torch.tanh(h_s / 2.0)
    z2 = x2 * torch.exp(log_s) + t
    z = torch.cat([x1, z2], dim=1)
    return z, log_s.reshape(x.shape[0], -1).sum(-1)


def _t_prior_logprob(z):
    zf = z.reshape(z.shape[0], -1)
    return -0.5 * (zf * zf + math.log(2.0 * math.pi)).sum(-1)


def test_full_model_golden_likelihood_vs_torch():
    flow = _build_flow()
    params = _perturbed_params(flow)

    # fixed dequantization noise injected on the host: x = ints + u
    rs = np.random.RandomState(0)
    x_np = (rs.randint(0, 256, (8,) + SIZE)
            + rs.uniform(0.0, 1.0, (8,) + SIZE)).astype(np.float32)

    # ours (f32, rng-free — no Dequantization layer in the stack)
    log_px = np.asarray(
        jax.jit(lambda p, x: flow.forward(p, x)[1])(params, jnp.asarray(x_np)))

    # torch replica (f64) with copied params
    def t64(a):
        return torch.from_numpy(np.asarray(a, np.float64))

    inv_layer = flow.layers[6]
    w_eff = t64(inv_layer._w_eff(params[6]))
    cp = {k: t64(v) for k, v in params[7].items()}

    x = t64(x_np)
    total = torch.zeros(x.shape[0], dtype=torch.float64)
    x, l = _t_normalize(x, 0.0, 256.0); total += l
    x, l = _t_normalize(x, -ALPHA, 1.0 / (1.0 - 2.0 * ALPHA)); total += l
    x, l = _t_logit(x); total += l
    x, l = _t_squeeze(x); total += l
    x, l = _t_actnorm(x, t64(params[4]["translation"]),
                      t64(params[4]["log_scale"])); total += l
    x, l = _t_conv1x1(x, t64(params[5]["W"])); total += l
    x, l = _t_inv_conv(x, w_eff); total += l
    x, l = _t_coupling(x, cp); total += l
    log_px_ref = (_t_prior_logprob(x) + total).numpy()

    # parity in bits/dim (VERDICT item 3: <= 1e-4 bpd)
    bpd = -log_px / (D * math.log(2.0))
    bpd_ref = -log_px_ref / (D * math.log(2.0))
    max_diff = float(np.max(np.abs(bpd - bpd_ref)))
    assert max_diff <= 1e-4, f"bits/dim diverge: {max_diff}"


def test_full_model_golden_gradients_vs_torch():
    """The same stack's parameter gradients agree with torch autograd
    (InvFlowNoPad's custom-VJP parallel backprop included, checked through
    the full model rather than op-level as in test_inv_conv.py)."""
    flow = _build_flow()
    params = _perturbed_params(flow)
    rs = np.random.RandomState(1)
    x_np = (rs.randint(0, 256, (4,) + SIZE)
            + rs.uniform(0.0, 1.0, (4,) + SIZE)).astype(np.float32)

    loss_grad = jax.jit(jax.grad(
        lambda p, x: -jnp.mean(flow.forward(p, x)[1])))
    g = loss_grad(params, jnp.asarray(x_np))

    # torch: same loss via the replica, autograd end-to-end (the solve is
    # differentiable through torch.linalg.solve)
    def t64(a, grad=False):
        t = torch.from_numpy(np.asarray(a, np.float64))
        return t.requires_grad_(grad) if grad else t

    p_act_t = t64(params[4]["translation"], True)
    p_act_s = t64(params[4]["log_scale"], True)
    p_w1x1 = t64(params[5]["W"], True)
    p_winv = t64(params[6]["w"], True)
    cp = {k: t64(v, True) for k, v in params[7].items()}

    # mask replica: center tap fixed to 1, raster-future taps zeroed —
    # recreate w_eff from the raw param THROUGH torch so grads flow
    from inverse_flow_tpu.ops.inv_conv import apply_mask
    base = np.asarray(apply_mask(jnp.zeros_like(params[6]["w"])))
    mask01 = np.asarray(apply_mask(jnp.ones_like(params[6]["w"]))) - base
    # apply_mask(w) = mask01*w + base  (affine in w); verify then reuse
    probe = np.asarray(apply_mask(params[6]["w"]))
    np.testing.assert_allclose(
        probe, mask01 * np.asarray(params[6]["w"]) + base, atol=1e-6)
    w_eff_t = t64(mask01) * p_winv + t64(base)

    x = t64(x_np)
    total = torch.zeros(x.shape[0], dtype=torch.float64)
    x, l = _t_normalize(x, 0.0, 256.0); total = total + l
    x, l = _t_normalize(x, -ALPHA, 1.0 / (1.0 - 2.0 * ALPHA)); total = total + l
    x, l = _t_logit(x); total = total + l
    x, l = _t_squeeze(x); total = total + l
    z = (x - p_act_t.view(1, -1, 1, 1)) * torch.exp(
        -p_act_s.view(1, -1, 1, 1))
    total = total - p_act_s.sum() * x.shape[2] * x.shape[3]
    x = z
    x = torch.einsum("oc,bchw->bohw", p_w1x1, x)
    total = total + x.shape[2] * x.shape[3] * torch.linalg.slogdet(p_w1x1)[1]
    x, l = _t_inv_conv(x, w_eff_t); total = total + l
    x, l = _t_coupling(x, cp); total = total + l
    loss = -(_t_prior_logprob(x) + total).mean()
    loss.backward()

    pairs = [
        ("actnorm.t", g[4]["translation"], p_act_t.grad),
        ("actnorm.s", g[4]["log_scale"], p_act_s.grad),
        ("conv1x1.W", g[5]["W"], p_w1x1.grad),
        ("invconv.w", g[6]["w"], p_winv.grad),
        ("coupling.w1", g[7]["w1"], cp["w1"].grad),
        ("coupling.w3", g[7]["w3"], cp["w3"].grad),
        ("coupling.logs3", g[7]["logs3"], cp["logs3"].grad),
    ]
    for name, ours, ref in pairs:
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), atol=2e-4, rtol=2e-3,
            err_msg=f"gradient mismatch: {name}")

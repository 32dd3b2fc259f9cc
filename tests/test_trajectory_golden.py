"""N-step training-trajectory golden parity vs torch (round-2 VERDICT
item 3).

Single-step golden tests (test_golden_model.py) can't see a transcription
slip in how the modified gradient, GECO EMA, weight clamp and warmup LR
interact OVER STEPS (``inf/train/experiment.py:197-311``,
``selfnorm.py:219-227``) — a wrong EMA constant or clamp order silently
changes convergence. These tests run ~20 optimizer steps of the REAL
jitted harness step (``Experiment._train_step``) against from-scratch
torch/f64 replicas of the update rule and assert the loss trajectories
(and GECO weight trajectory) agree to float32 tolerance.

Two configs, per the VERDICT prescription:
  (a) exact inv-conv stack (the golden-model flow) under SGD + warmup;
  (b) a SelfNormConv flow with modified gradient + recon loss + GECO EMA
      + weight clamp + warmup.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from inverse_flow_tpu.data.loader import ArrayLoader
from inverse_flow_tpu.distributions import GaussianPrior
from inverse_flow_tpu.layers import Flow, SelfNormConv
from inverse_flow_tpu.train.config import ExperimentConfig
from inverse_flow_tpu.train.experiment import Experiment

from test_golden_model import (ALPHA, SIZE, _build_flow, _perturbed_params,
                               _t_conv1x1, _t_coupling, _t_inv_conv,
                               _t_logit, _t_normalize, _t_prior_logprob,
                               _t_squeeze)


def t64(a, grad=False):
    t = torch.from_numpy(np.asarray(a, np.float64))
    return t.requires_grad_(grad) if grad else t


def _make_experiment(flow, data, cfg_kw, tmp_path):
    n, batch = data.shape[0], cfg_kw.pop("batch_size")
    loaders = tuple(ArrayLoader(data, batch, shuffle=False)
                    for _ in range(3))
    cfg = ExperimentConfig(
        name="traj", batch_size=batch, optimizer_name="SGD",
        sgd_momentum=0.0, sgd_weight_decay=0.0, warmup_epochs=1,
        scheduler_name="None", log_timing=False, save_images=False,
        plot_recon=False, checkpoint_path=str(tmp_path / "c.pkl"),
        metrics_path=str(tmp_path / "m.jsonl"), **cfg_kw)
    return Experiment(flow, *loaders, cfg)


# ---------------------------------------------------------------------------
# (a) exact inv-conv stack: SGD + per-batch warmup over 20 steps
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_trajectory_exact_invconv_sgd(tmp_path):
    flow = _build_flow()

    rs = np.random.RandomState(3)
    n, batch, steps_per_epoch = 40, 8, 5
    data = (rs.randint(0, 256, (n,) + SIZE)
            + rs.uniform(0.0, 1.0, (n,) + SIZE)).astype(np.float32)

    exp = _make_experiment(flow, data, dict(batch_size=batch, lr=1e-3,
                                            modified_grad=True,
                                            add_recon_grad=False),
                           tmp_path)
    # replace init params with the perturbed golden set on BOTH sides;
    # snapshot to host FIRST — the jitted step donates its state buffers
    params_dev = _perturbed_params(flow)
    params0 = jax.device_get(params_dev)
    exp.state = exp.state._replace(params=params_dev,
                                   opt_state=exp.tx.init(params_dev))
    exp._data_initialized = True         # skip ActNorm data-init

    # ---- 20 steps of the real jitted harness step --------------------
    losses_jax = []
    state = exp.state
    for epoch in range(4):               # 4 epochs x 5 batches = 20 steps
        for b in range(steps_per_epoch):
            x = jnp.asarray(data[b * batch:(b + 1) * batch])
            state, loss, _ = exp._train_step(state, x,
                                             jax.random.PRNGKey(0))
            losses_jax.append(float(loss))

    # ---- torch/f64 replica of the same update rule -------------------
    from inverse_flow_tpu.ops.inv_conv import apply_mask
    base = np.asarray(apply_mask(jnp.zeros_like(params0[6]["w"])))
    mask01 = np.asarray(apply_mask(jnp.ones_like(params0[6]["w"]))) - base

    tp = {
        "act_t": t64(params0[4]["translation"], True),
        "act_s": t64(params0[4]["log_scale"], True),
        "w1x1": t64(params0[5]["W"], True),
        "winv": t64(params0[6]["w"], True),
    }
    tp.update({f"cp_{k}": t64(v, True) for k, v in params0[7].items()})

    def t_loss(x_np):
        x = t64(x_np)
        total = torch.zeros(x.shape[0], dtype=torch.float64)
        x, l = _t_normalize(x, 0.0, 256.0); total = total + l
        x, l = _t_normalize(x, -ALPHA, 1.0 / (1.0 - 2.0 * ALPHA))
        total = total + l
        x, l = _t_logit(x); total = total + l
        x, l = _t_squeeze(x); total = total + l
        z = (x - tp["act_t"].view(1, -1, 1, 1)) * torch.exp(
            -tp["act_s"].view(1, -1, 1, 1))
        total = total - tp["act_s"].sum() * x.shape[2] * x.shape[3]
        x = torch.einsum("oc,bchw->bohw", tp["w1x1"], z)
        total = total + x.shape[2] * x.shape[3] * torch.linalg.slogdet(
            tp["w1x1"])[1]
        w_eff = t64(mask01) * tp["winv"] + t64(base)
        x, l = _t_inv_conv(x, w_eff); total = total + l
        cp = {k[3:]: v for k, v in tp.items() if k.startswith("cp_")}
        x, l = _t_coupling(x, cp); total = total + l
        return -(_t_prior_logprob(x) + total).mean()

    warmup_steps = steps_per_epoch          # warmup_epochs=1
    losses_t = []
    step = 0
    for epoch in range(4):
        for b in range(steps_per_epoch):
            loss = t_loss(data[b * batch:(b + 1) * batch])
            losses_t.append(float(loss.detach()))
            for v in tp.values():
                if v.grad is not None:
                    v.grad = None
            loss.backward()
            lr_t = 1e-3 * min((step + 1.0) / warmup_steps, 1.0)
            with torch.no_grad():
                for v in tp.values():
                    v -= lr_t * v.grad
            step += 1

    losses_jax = np.asarray(losses_jax)
    losses_t = np.asarray(losses_t)
    rel = np.abs(losses_jax - losses_t) / np.abs(losses_t)
    assert rel.max() < 2e-3, (
        f"trajectories diverge at step {int(rel.argmax())}: "
        f"{losses_jax[rel.argmax()]:.4f} vs {losses_t[rel.argmax()]:.4f}")
    # and the trajectory actually moved (the test isn't vacuous)
    assert losses_t[-1] < losses_t[0]


# ---------------------------------------------------------------------------
# (c) reduced Glow with FincFlow + Emerging + ConvExp in ONE stack, 50 steps
# ---------------------------------------------------------------------------
#
# VERDICT r3 item 8: extend trajectory parity beyond the inv-conv and
# selfnorm stacks to the remaining invertible-conv families —
# Finc_FlowUnit (``inf/layers/fincflow.py:32-51``), Emerging
# (``emerging_module.py:89-116``) and ConvExp with spectral-norm power
# iteration carried across steps (``convexp_module.py:9-81``,
# ``spectral.py:208-244``) — so a transcription slip in any of their
# update-rule interactions (carried u refresh order, AR-diagonal ldj,
# masked-chunk flips) shows up as trajectory divergence.

def _t_tl_conv(x, w_eff):
    """Masked conv with TL zero padding (masked_conv_apply geometry)."""
    kh, kw = w_eff.shape[2], w_eff.shape[3]
    return F.conv2d(F.pad(x, (kw - 1, 0, kh - 1, 0)), w_eff)


def _t_fincflow(x, ws_eff):
    """4 channel chunks through TL/TR/BL/BR pad orders; ldj = 0
    (``fincflow.py:32-51``)."""
    flips = ((), (3,), (2,), (2, 3))
    outs = []
    for chunk, w, ax in zip(torch.chunk(x, 4, dim=1), ws_eff, flips):
        c = torch.flip(chunk, ax) if ax else chunk
        z = _t_tl_conv(c, w)
        outs.append(torch.flip(z, ax) if ax else z)
    return torch.cat(outs, dim=1), torch.zeros(x.shape[0],
                                               dtype=torch.float64)


def _t_square_ar(x, w_eff, b, diag):
    z = _t_tl_conv(x, w_eff) + b.view(1, -1, 1, 1)
    ld = torch.log(torch.abs(diag)).sum() * x.shape[2] * x.shape[3]
    return z, ld.expand(x.shape[0])


def _t_spectral(kernel, u, c, h, w, coeff=0.9):
    """Power-iteration spectral constraint (convexp.spectral_normalize):
    v/u' from the detached kernel, sigma = <u', conv(v; LIVE kernel)>."""
    ksg = kernel.detach()
    v = torch.nn.grad.conv2d_input((1, c, h, w), ksg, u.view(1, c, h, w),
                                   padding=1).flatten()
    v = v / (v.norm() + 1e-12)
    u2 = F.conv2d(v.view(1, c, h, w), ksg, padding=1).flatten()
    u2 = u2 / (u2.norm() + 1e-12)
    wv = F.conv2d(v.view(1, c, h, w), kernel, padding=1).flatten()
    sigma = u2 @ wv
    factor = torch.clamp(sigma / coeff, min=1.0)
    return kernel / (factor + 1e-5), u2.detach(), sigma


def _t_conv_exp(x, kernel, terms):
    result, product = x, x
    for i in range(1, terms + 1):
        product = F.conv2d(product, kernel, padding=1) / i
        result = result + product
    return result


@pytest.mark.slow
def test_trajectory_fincflow_emerging_convexp(tmp_path):
    from inverse_flow_tpu.layers import (ConvExp, Emerging, FincFlowUnit,
                                         Normalization, Squeeze)
    from inverse_flow_tpu.layers.emerging import square_ar_mask
    from inverse_flow_tpu.ops.inv_conv import apply_mask

    C, HS = 4, 4                         # post-squeeze: (4, 4, 4)
    size = (1, 8, 8)
    flow = Flow(GaussianPrior((C, HS, HS)), [
        Normalization(0.0, 256.0),
        Squeeze(),
        FincFlowUnit(C, (2, 2)),
        Emerging(C),
        ConvExp((C, HS, HS)),
    ])

    rs = np.random.RandomState(11)
    n, batch, steps_per_epoch = 30, 6, 5
    data = (rs.randint(0, 256, (n,) + size)
            + rs.uniform(0.0, 1.0, (n,) + size)).astype(np.float32)

    LR = 2e-3
    exp = _make_experiment(flow, data, dict(batch_size=batch, lr=LR,
                                            modified_grad=True,
                                            add_recon_grad=False),
                           tmp_path)
    params0 = jax.device_get(exp.state.params)
    exp._data_initialized = True         # keep the init u on both sides

    losses_jax = []
    state = exp.state
    for epoch in range(10):              # 10 x 5 = 50 steps
        for b in range(steps_per_epoch):
            x = jnp.asarray(data[b * batch:(b + 1) * batch])
            state, loss, _ = exp._train_step(state, x,
                                             jax.random.PRNGKey(0))
            losses_jax.append(float(loss))

    # ---- torch/f64 replica -------------------------------------------
    finc_ws = [t64(w, True) for w in params0[2]["ws"]]
    em = params0[3]["t"]
    em_1x1 = t64(em[0]["W"], True)
    ar1_w, ar1_b = t64(em[1]["w"], True), t64(em[1]["b"], True)
    ar2_w, ar2_b = t64(em[3]["w"], True), t64(em[3]["b"], True)
    ce = params0[4]
    ce_k = t64(ce["kernel"], True)
    ce_pre, ce_post = t64(ce["pre_bias"], True), t64(ce["post_bias"], True)
    ce_1x1 = t64(ce["conv1x1"]["W"], True)
    ce_u = t64(ce["u"])                  # carried, not learnable

    learnable = (finc_ws + [em_1x1, ar1_w, ar1_b, ar2_w, ar2_b,
                            ce_k, ce_pre, ce_post, ce_1x1])
    m_finc = t64(np.asarray(apply_mask(jnp.ones_like(params0[2]["ws"][0]))
                            - apply_mask(jnp.zeros_like(
                                params0[2]["ws"][0]))))
    base_finc = t64(np.asarray(apply_mask(
        jnp.zeros_like(params0[2]["ws"][0]))))
    m_ar = t64(np.asarray(square_ar_mask(C)))
    idx = torch.arange(C)

    def t_loss(x_np, u):
        x = t64(x_np)
        total = torch.zeros(x.shape[0], dtype=torch.float64)
        x, l = _t_normalize(x, 0.0, 256.0); total = total + l
        x, l = _t_squeeze(x); total = total + l
        x, l = _t_fincflow(x, [m_finc * w + base_finc for w in finc_ws])
        total = total + l
        # Emerging: 1x1, AR, flip, AR, flip
        x, l = _t_conv1x1(x, em_1x1); total = total + l
        x, l = _t_square_ar(x, m_ar * ar1_w, ar1_b,
                            ar1_w[idx, idx, -1, -1]); total = total + l
        x = torch.flip(x, (2, 3))
        x, l = _t_square_ar(x, m_ar * ar2_w, ar2_b,
                            ar2_w[idx, idx, -1, -1]); total = total + l
        x = torch.flip(x, (2, 3))
        # ConvExp: pre-bias, 1x1, series, trace ldj, post-bias
        k_n, u2, _ = _t_spectral(ce_k, u, C, HS, HS)
        x = x + ce_pre
        x, l = _t_conv1x1(x, ce_1x1); total = total + l
        x = _t_conv_exp(x, k_n, 6)
        total = total + k_n[idx, idx, 1, 1].sum() * HS * HS
        x = x + ce_post
        return -(_t_prior_logprob(x) + total).mean(), u2

    warmup_steps = steps_per_epoch
    losses_t = []
    step = 0
    for epoch in range(10):
        for b in range(steps_per_epoch):
            loss, _ = t_loss(data[b * batch:(b + 1) * batch], ce_u)
            losses_t.append(float(loss.detach()))
            for v in learnable:
                v.grad = None
            loss.backward()
            lr_t = LR * min((step + 1.0) / warmup_steps, 1.0)
            with torch.no_grad():
                for v in learnable:
                    v -= lr_t * v.grad
            # carry refresh AGAINST THE NEW KERNEL, after the update
            # (apply_grads: update -> clamp -> update_carry)
            _, ce_u, _ = _t_spectral(ce_k.detach(), ce_u, C, HS, HS)
            step += 1

    losses_jax = np.asarray(losses_jax)
    losses_t = np.asarray(losses_t)
    rel = np.abs(losses_jax - losses_t) / np.abs(losses_t)
    assert rel.max() < 2e-3, (
        f"trajectories diverge at step {int(rel.argmax())}: "
        f"{losses_jax[rel.argmax()]:.4f} vs {losses_t[rel.argmax()]:.4f}")
    assert losses_t[-1] < losses_t[0]


# ---------------------------------------------------------------------------
# (b) selfnorm: modified grad + recon + GECO EMA + weight clamp + warmup
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_trajectory_selfnorm_geco_clamp(tmp_path):
    C, H = 2, 6
    size = (C, H, H)
    flow = Flow(GaussianPrior(size),
                [SelfNormConv(C, C, (3, 3), bias=True, padding=1)])

    rs = np.random.RandomState(7)
    n, batch, steps_per_epoch = 24, 6, 4
    data = rs.normal(0.0, 1.0, (n,) + size).astype(np.float32)

    CLAMP, GECO_LR, ALPHA_EMA, LR = 0.5, 1e-3, 0.9, 5e-3
    exp = _make_experiment(
        flow, data,
        dict(batch_size=batch, lr=LR, modified_grad=True,
             add_recon_grad=True, recon_loss_weight=1.0,
             recon_loss_lr=GECO_LR, recon_alpha=ALPHA_EMA,
             weight_clamp=CLAMP),
        tmp_path)
    params0 = jax.device_get(exp.state.params)

    losses_jax, recons_jax, rw_jax = [], [], []
    state = exp.state
    for epoch in range(5):               # 5 x 4 = 20 steps
        for b in range(steps_per_epoch):
            x = jnp.asarray(data[b * batch:(b + 1) * batch])
            state, loss, recon = exp._train_step(state, x,
                                                 jax.random.PRNGKey(0))
            losses_jax.append(float(loss))
            recons_jax.append(float(recon))
            rw_jax.append(float(state.recon_weight))

    # ---- torch/f64 replica -------------------------------------------
    W = t64(params0[0]["w"])
    R = t64(params0[0]["r"])
    bb = t64(params0[0]["b"])
    D = C * H * H

    def flip_k(w):
        return torch.flip(w, (2, 3)).transpose(0, 1)

    losses_t, recons_t, rw_t = [], [], []
    rw, ema = 1.0, 0.0
    warmup_steps = steps_per_epoch
    step = 0
    for epoch in range(5):
        for b in range(steps_per_epoch):
            x = t64(data[b * batch:(b + 1) * batch])
            bsz = x.shape[0]

            # nll part (cheap path, ldj = 0): manual modified gradient
            z = F.conv2d(x, W, padding=1) + bb.view(1, -1, 1, 1)
            nll = 0.5 * (z * z).sum() / bsz + 0.5 * D * math.log(2 * math.pi)
            g = z / bsz                                  # dL/dz
            ones_z, ones_x = torch.ones_like(z), torch.ones_like(x)
            multiple = torch.nn.grad.conv2d_weight(
                ones_x, W.shape, ones_z, padding=1) / bsz
            dzxt = torch.nn.grad.conv2d_weight(x, W.shape, g, padding=1)
            gw_nll = (dzxt - flip_k(R) * multiple) / 2.0
            gx = torch.nn.grad.conv2d_input(x.shape, W, g, padding=1)
            wx = z - bb.view(1, -1, 1, 1)
            negdxwxt = torch.nn.grad.conv2d_weight(
                wx, R.shape, -gx, padding=1)
            gr_nll = (negdxwxt + flip_k(W) * flip_k(multiple)) / 2.0
            gb_nll = g.sum((0, 2, 3))

            # recon part: TRUE gradient (torch autograd), x detached
            Wl = W.clone().requires_grad_(True)
            Rl = R.clone().requires_grad_(True)
            zz = F.conv2d(x, Wl, padding=1)
            x_hat = F.conv2d(zz, Rl, padding=1)
            recon = ((x - x_hat) ** 2).reshape(bsz, -1).sum(-1).mean()
            recon.backward()

            losses_t.append(float(nll))
            recons_t.append(float(recon))

            gw = gw_nll + rw * Wl.grad
            gr = gr_nll + rw * Rl.grad
            gb = gb_nll

            lr_t = LR * min((step + 1.0) / warmup_steps, 1.0)
            with torch.no_grad():
                W -= lr_t * gw
                R -= lr_t * gr
                bb -= lr_t * gb
                W.clamp_(-CLAMP, CLAMP)
                R.clamp_(-CLAMP, CLAMP)
                bb.clamp_(-CLAMP, CLAMP)

            # GECO EMA + weight update (selfnorm.py:219-227 semantics as
            # implemented by the harness: first step seeds the EMA)
            ema = float(recon) if step == 0 else (
                ALPHA_EMA * ema + (1 - ALPHA_EMA) * float(recon))
            rw = rw * math.exp(GECO_LR * ema)
            rw_t.append(rw)
            step += 1

    for name, ours, ref, tol in (
            ("nll", losses_jax, losses_t, 2e-3),
            ("recon", recons_jax, recons_t, 5e-3),
            ("geco weight", rw_jax, rw_t, 5e-3)):
        ours, ref = np.asarray(ours), np.asarray(ref)
        rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-8)
        assert rel.max() < tol, (
            f"{name} trajectory diverges at step {int(rel.argmax())}: "
            f"{ours[rel.argmax()]:.5f} vs {ref[rel.argmax()]:.5f}")
    # GECO actually moved the weight and the clamp actually bit
    assert abs(rw_t[-1] - 1.0) > 1e-4
    assert float(t64(jax.device_get(state.params)[0]["w"]).abs().max()) \
        <= CLAMP + 1e-6


# ---------------------------------------------------------------------------
# (d) FLAGSHIP topology (VERDICT r4 #3): the full if_glow_mnist layer mix —
# ActNorm + inv-conv + one-hot RQ-spline activations + Coupling inside
# RepeatedBlocks, SplitPrior between blocks — trained for 10 steps with the
# flagship update rule (Adam + per-batch warmup + ExponentialLR + weight
# clamp, ``inf/experiments/if_glow_mnist.py:150-196`` +
# ``inf/train/experiment.py:197-311``) against a from-scratch torch/f64
# replica. Reduced width/depth per the VERDICT's allowance (width 16, K=3,
# 8x8 inputs) but the FULL layer mix and the real jitted harness step.
# ---------------------------------------------------------------------------

def _t_rq_spline(x, uw, uh, ud, tail_bound, n_bins):
    """torch/f64 replica of unconstrained_rational_quadratic_spline
    (layers/splines.py:27-158; Durkan et al. algebra) for GLOBAL knots:
    uw/uh are (n_bins,), ud is (n_bins-1,). Returns (out, elementwise ldj)."""
    minw = minh = mind = 1e-6
    constant = math.log(math.expm1(1.0 - mind))
    d_un = torch.cat([torch.zeros(1, dtype=x.dtype), ud,
                      torch.zeros(1, dtype=x.dtype)]) + constant

    inside = (x >= -tail_bound) & (x <= tail_bound)
    xc = torch.clamp(x, -tail_bound, tail_bound)

    widths = torch.softmax(uw, -1)
    widths = minw + (1 - minw * n_bins) * widths
    cumw = torch.cat([torch.zeros(1, dtype=x.dtype), torch.cumsum(widths, -1)])
    cumw = (2 * tail_bound) * cumw - tail_bound
    cumw = torch.cat([torch.full((1,), -tail_bound, dtype=x.dtype),
                      cumw[1:-1],
                      torch.full((1,), tail_bound, dtype=x.dtype)])
    widths = cumw[1:] - cumw[:-1]

    derivs = mind + F.softplus(d_un)

    heights = torch.softmax(uh, -1)
    heights = minh + (1 - minh * n_bins) * heights
    cumh = torch.cat([torch.zeros(1, dtype=x.dtype),
                      torch.cumsum(heights, -1)])
    cumh = (2 * tail_bound) * cumh - tail_bound
    cumh = torch.cat([torch.full((1,), -tail_bound, dtype=x.dtype),
                      cumh[1:-1],
                      torch.full((1,), tail_bound, dtype=x.dtype)])
    heights = cumh[1:] - cumh[:-1]

    # _searchsorted: add eps to the LAST bin location, idx = sum(x>=loc)-1
    locs = cumw.detach().clone()
    locs[-1] = locs[-1] + 1e-6
    idx = torch.clamp((xc[..., None] >= locs).sum(-1) - 1, 0, n_bins - 1)

    in_cw = cumw[:-1][idx]
    in_w = widths[idx]
    in_ch = cumh[:-1][idx]
    delta = heights / widths
    in_delta = delta[idx]
    in_d = derivs[:-1][idx]
    in_dp1 = derivs[1:][idx]
    in_h = heights[idx]

    theta = (xc - in_cw) / in_w
    th1m = theta * (1 - theta)
    d_sum = in_d + in_dp1 - 2 * in_delta
    numerator = in_h * (in_delta * theta ** 2 + in_d * th1m)
    denominator = in_delta + d_sum * th1m
    out_in = in_ch + numerator / denominator
    deriv_num = in_delta ** 2 * (in_dp1 * theta ** 2 + 2 * in_delta * th1m
                                 + in_d * (1 - theta) ** 2)
    ldj_in = torch.log(deriv_num) - 2 * torch.log(denominator)

    out = torch.where(inside, out_in, x)
    ldj = torch.where(inside, ldj_in, torch.zeros_like(x))
    return out, ldj


def _t_adam_step(params_t, lr_t, adam_m, adam_v, t, clamp,
                 b1=0.9, b2=0.999, eps=1e-8):
    """optax.adam + weight clamp replica (experiment.py apply_grads)."""
    with torch.no_grad():
        for i, v in enumerate(params_t):
            g = v.grad
            adam_m[i] = b1 * adam_m[i] + (1 - b1) * g
            adam_v[i] = b2 * adam_v[i] + (1 - b2) * g * g
            m_hat = adam_m[i] / (1 - b1 ** t)
            v_hat = adam_v[i] / (1 - b2 ** t)
            v -= lr_t * m_hat / (torch.sqrt(v_hat) + eps)
            if clamp:
                v.clamp_(-clamp, clamp)


@pytest.mark.slow
def test_trajectory_flagship_topology(tmp_path):
    from inverse_flow_tpu.layers import (ActNorm, Normalization,
                                         LogitTransform, Squeeze,
                                         InvFlowNoPad, Coupling,
                                         RepeatedBlock, SplineActivation,
                                         SplitPrior)
    from inverse_flow_tpu.ops.inv_conv import apply_mask

    ALPHA_N = 1e-7                       # flagship alpha (registry)
    N_BINS, TB = 5, 20.0                 # flagship spline knobs
    K, WIDTH = 3, 16                     # reduced depth/width per VERDICT
    size = (1, 8, 8)
    s1, s2 = (4, 4, 4), (8, 2, 2)        # after squeeze / split+squeeze

    def step_layers(sz):
        return (ActNorm(sz[0]), InvFlowNoPad(sz[0], (3, 3)),
                SplineActivation(sz, n_bins=N_BINS, tail_bound=TB),
                Coupling(sz, width=WIDTH))

    flow = Flow(GaussianPrior(s2), [
        Normalization(0.0, 256.0),
        Normalization(-ALPHA_N, 1.0 / (1.0 - 2.0 * ALPHA_N)),
        LogitTransform(),
        Squeeze(),
        RepeatedBlock(step_layers(s1), K),
        SplitPrior(s1, width=WIDTH),
        Squeeze(),
        RepeatedBlock(step_layers(s2), K),
    ])

    rs = np.random.RandomState(5)
    n, batch, steps_per_epoch = 40, 8, 5
    data = (rs.randint(0, 256, (n,) + size)
            + rs.uniform(0.0, 1.0, (n,) + size)).astype(np.float32)

    LR, GAMMA, CLAMP = 2e-4, 0.96170, 0.01   # flagship gamma/clamp
    exp = _make_experiment(flow, data, dict(batch_size=batch, lr=LR,
                                            modified_grad=True,
                                            add_recon_grad=True,
                                            sym_recon_grad=True,
                                            weight_clamp=CLAMP),
                           tmp_path)
    # flagship optimizer/scheduler (SGD defaults come from _make_experiment;
    # override to the registry's Adam + ExponentialLR)
    object.__setattr__(exp.cfg, "optimizer_name", "Adam")
    object.__setattr__(exp.cfg, "scheduler_name", "ExponentialLR")
    object.__setattr__(exp.cfg, "gamma", GAMMA)
    from inverse_flow_tpu.train.optim import make_optimizer
    exp.tx, exp.lr_schedule = make_optimizer(exp.cfg, steps_per_epoch)
    exp._build_steps()

    params_dev = _perturbed_params_of(flow, size, scale=0.05, seed=13)
    params0 = jax.device_get(params_dev)
    exp.state = exp.state._replace(params=params_dev,
                                   opt_state=exp.tx.init(params_dev))
    exp._data_initialized = True

    losses_jax = []
    state = exp.state
    for epoch in range(2):               # 2 epochs x 5 batches = 10 steps
        for b in range(steps_per_epoch):
            x = jnp.asarray(data[b * batch:(b + 1) * batch])
            state, loss, _ = exp._train_step(state, x,
                                             jax.random.PRNGKey(0))
            losses_jax.append(float(loss))

    # ---- torch/f64 replica -------------------------------------------
    leaves, treedef = jax.tree_util.tree_flatten(params0)
    params_t = [t64(l, True) for l in leaves]
    tp = jax.tree_util.tree_unflatten(treedef, params_t)

    def mask_consts(c):
        w0 = jnp.zeros((c, c, 3, 3), jnp.float32)
        base = np.asarray(apply_mask(w0))
        m01 = np.asarray(apply_mask(jnp.ones_like(w0))) - base
        return t64(m01), t64(base)

    masks = {4: mask_consts(s1[0]), 7: mask_consts(s2[0])}

    def t_step_stack(x, total, stacked, mask01, base, hw):
        for k in range(K):
            p_act, p_inv, p_spl, p_cpl = [
                jax.tree_util.tree_map(lambda t: t[k], sp)
                for sp in stacked]
            # ActNorm
            x = (x - p_act["translation"].view(1, -1, 1, 1)) * torch.exp(
                -p_act["log_scale"].view(1, -1, 1, 1))
            total = total - p_act["log_scale"].sum() * hw
            # inv-conv (training direction = dense solve; ldj = 0)
            w_eff = mask01 * p_inv["w"] + base
            x, _ = _t_inv_conv(x, w_eff)
            # RQ-spline activation (global knots)
            x, ld = _t_rq_spline(x, p_spl["widths"], p_spl["heights"],
                                 p_spl["derivs"], TB, N_BINS)
            total = total + ld.reshape(x.shape[0], -1).sum(-1)
            # coupling
            x, ld = _t_coupling(x, p_cpl)
            total = total + ld
        return x, total

    def t_loss(x_np):
        x = t64(x_np)
        total = torch.zeros(x.shape[0], dtype=torch.float64)
        x, l = _t_normalize(x, 0.0, 256.0); total = total + l
        x, l = _t_normalize(x, -ALPHA_N, 1.0 / (1.0 - 2.0 * ALPHA_N))
        total = total + l
        x, l = _t_logit(x); total = total + l
        x, l = _t_squeeze(x); total = total + l
        x, total = t_step_stack(x, total, tp[4]["steps"], *masks[4],
                                s1[1] * s1[2])
        # SplitPrior: coupling, then factor out the second half
        x, l = _t_coupling(x, tp[5]); total = total + l
        half = s1[0] // 2
        x, x2 = x[:, :half], x[:, half:]
        total = total + _t_prior_logprob(x2)
        x, l = _t_squeeze(x); total = total + l
        x, total = t_step_stack(x, total, tp[7]["steps"], *masks[7],
                                s2[1] * s2[2])
        return -(_t_prior_logprob(x) + total).mean()

    warmup_steps = steps_per_epoch          # warmup_epochs=1
    adam_m = [torch.zeros_like(v) for v in params_t]
    adam_v = [torch.zeros_like(v) for v in params_t]
    losses_t = []
    step = 0
    for epoch in range(2):
        for b in range(steps_per_epoch):
            loss = t_loss(data[b * batch:(b + 1) * batch])
            losses_t.append(float(loss.detach()))
            for v in params_t:
                v.grad = None
            loss.backward()
            lr_t = (LR * min((step + 1.0) / warmup_steps, 1.0)
                    * GAMMA ** (step // steps_per_epoch))
            _t_adam_step(params_t, lr_t, adam_m, adam_v, step + 1, CLAMP)
            step += 1

    losses_jax = np.asarray(losses_jax)
    losses_t = np.asarray(losses_t)
    rel = np.abs(losses_jax - losses_t) / np.abs(losses_t)
    assert rel.max() < 2e-3, (
        f"flagship trajectories diverge at step {int(rel.argmax())}: "
        f"{losses_jax[rel.argmax()]:.4f} vs {losses_t[rel.argmax()]:.4f}")
    # trajectory moved, and the flagship weight clamp actually held
    assert np.std(losses_t) > 0
    w_max = max(float(np.max(np.abs(l)))
                for l in jax.tree_util.tree_leaves(
                    jax.device_get(state.params)))
    assert w_max <= CLAMP + 1e-6


def _perturbed_params_of(flow, size, scale=0.05, seed=13):
    params, _ = flow.init(jax.random.PRNGKey(0), size)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(treedef, [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])

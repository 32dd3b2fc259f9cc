"""Affine coupling layer with the Glow-style zero-initialized conv net.

Reference parity: ``inf/layers/coupling.py:9-103`` — net is
conv3x3 -> ReLU -> conv1x1 -> ReLU -> Conv2dZero (zero-init with ReZero
log-scale); ``log_s = 2*tanh(h/2)``; even/odd channel split of net output.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.convs import conv2d
from .base import FlowLayer, sum_except_batch


def _kaiming_uniform(rng, shape):
    """PyTorch nn.Conv2d default weight init (kaiming_uniform, a=sqrt(5))."""
    fan_in = shape[1] * shape[2] * shape[3]
    bound = 1.0 / jnp.sqrt(jnp.float32(fan_in))
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


@dataclass(frozen=True)
class Coupling(FlowLayer):
    """Affine coupling on channel halves.

    ``input_size`` is (C, H, W); the first C//2 channels condition the
    affine transform of the rest.
    """

    input_size: Tuple[int, int, int]
    width: int = 512
    logscale_factor: float = 3.0
    # 'float32' (default) or 'bfloat16': the mixed-precision policy for
    # the coupling NET only (where nearly all model FLOPs live). bf16
    # stores the net's activations/weights at half width — halving the
    # HBM traffic of the wide convs. The convs request bf16 outputs
    # (preferred_dtype=dt); on the TPU MXU the partial products still
    # accumulate in f32 as a hardware property, but that is NOT an XLA
    # guarantee on other backends (CPU tests / interpret mode may
    # accumulate in bf16). The affine transform itself (log_s, t, exp,
    # ldj sum) stays f32, so invertibility and the likelihood accounting
    # are full precision regardless.
    compute_dtype: str = "float32"
    # Rematerialize the coupling net in the backward pass instead of
    # stashing its conv activations through the scan-over-depth carry.
    # The 2026-08-18 imagenet32_exact profile prices the stash's
    # dynamic-update-slice writes at ~5 ms/step (repeated.py:109 DUS
    # fusions) vs ~1.5 ms of extra forward-conv recompute — the same
    # recompute-beats-streaming economics every PREPARED_SOLVE A/B
    # showed. Slope A/B verdicts (results/true_step_time.jsonl,
    # in-process interleaved, 2026-08-18/19): WINS 1.032x at
    # imagenet32_exact b100 (4/4) and 1.074x at the flagship (3/4) —
    # build_glow defaults it ON (values/gradients are bit-identical,
    # test_coupling_remat_net_identical). Layer default stays False so
    # a bare Coupling() matches the reference's memory behavior.
    remat_net: bool = False

    @property
    def half_channels(self):
        return self.input_size[0] // 2

    @property
    def _dt(self):
        return (jnp.bfloat16 if self.compute_dtype in ("bf16", "bfloat16")
                else jnp.float32)

    def init(self, rng, shape):
        c = self.input_size[0]
        k1, k2 = jax.random.split(rng)
        params = {
            "w1": _kaiming_uniform(k1, (self.width, self.half_channels, 3, 3)),
            "w2": _kaiming_uniform(k2, (c, self.width, 1, 1)),
            # Conv2dZero: zero weight, zero bias, zero ReZero log-scale
            # (coupling.py:25-36)
            "w3": jnp.zeros((c, c, 3, 3), jnp.float32),
            "b3": jnp.zeros((c,), jnp.float32),
            "logs3": jnp.zeros((c,), jnp.float32),
        }
        return params, shape

    def _net(self, params, x1):
        # bf16 policy: the net's tensors (weights, activations, conv
        # outputs and their cotangents) are stored in dt end-to-end — the
        # MXU still accumulates each conv in its f32 accumulators — and
        # the result is cast back to f32 before the affine math. Keeping
        # the conv output dtype homogeneous with its operands also keeps
        # the conv VJP single-dtype (a mixed f32-cotangent/bf16-weight
        # transpose conv is rejected by lax).
        dt = self._dt
        h = conv2d(x1.astype(dt), params["w1"].astype(dt), padding=1,
                   preferred_dtype=dt)
        h = jax.nn.relu(h)
        h = conv2d(h, params["w2"].astype(dt), padding=0, preferred_dtype=dt)
        h = jax.nn.relu(h)
        h = conv2d(h, params["w3"].astype(dt), padding=1,
                   preferred_dtype=dt).astype(jnp.float32)
        h = h + params["b3"].reshape(1, -1, 1, 1)
        h = h * jnp.exp(params["logs3"] * self.logscale_factor).reshape(1, -1, 1, 1)
        return h

    def _get_xs_logs_t(self, params, x):
        x1 = x[:, : self.half_channels]
        x2 = x[:, self.half_channels:]
        if self.remat_net:
            h = jax.checkpoint(lambda p, a: self._net(p, a))(params, x1)
        else:
            h = self._net(params, x1)
        h_s, t = h[:, ::2], h[:, 1::2]
        logs_range = 2.0
        log_s = logs_range * jnp.tanh(h_s / logs_range)
        return x1, x2, log_s, t

    def forward(self, params, x, rng=None):
        x1, x2, log_s, t = self._get_xs_logs_t(params, x)
        z2 = x2 * jnp.exp(log_s) + t
        z = jnp.concatenate([x1, z2], axis=1)
        return z, sum_except_batch(log_s)

    def inverse(self, params, z, rng=None):
        x1, z2, log_s, t = self._get_xs_logs_t(params, z)
        x2 = (z2 - t) * jnp.exp(-log_s)
        return jnp.concatenate([x1, x2], axis=1)


@dataclass(frozen=True)
class BSplineCoupling(FlowLayer):
    """Coupling whose transform is a per-pixel conditional monotone cubic
    B-spline (the *conditional* use of the reference's
    ``ConditionalBSplineTransformer``, ``inf/layers/splines/bspline.py:
    20-190``, which the reference wires only as an unconditional
    activation). The first C//2 channels drive a Glow-style zero-init conv
    net producing ``(n_bins + 3)`` spline coefficients per transformed
    element; zero init makes the spline the identity, so the layer starts
    as a no-op exactly like the affine coupling.

    Outside ``[-tail_bound, tail_bound]`` the map is the identity (linear
    tails, the convention of our RQ-spline); the affine rescale into the
    spline's [0, 1] domain cancels in the Jacobian.
    """

    input_size: Tuple[int, int, int]
    width: int = 512
    n_bins: int = 8
    tail_bound: float = 10.0
    logscale_factor: float = 3.0

    @property
    def half_channels(self):
        return self.input_size[0] // 2

    @property
    def _n_out(self):
        c2 = self.input_size[0] - self.half_channels
        return c2 * (self.n_bins + 3)

    def init(self, rng, shape):
        k1, k2 = jax.random.split(rng)
        params = {
            "w1": _kaiming_uniform(k1, (self.width, self.half_channels, 3, 3)),
            "w2": _kaiming_uniform(k2, (self.width, self.width, 1, 1)),
            "w3": jnp.zeros((self._n_out, self.width, 3, 3), jnp.float32),
            "b3": jnp.zeros((self._n_out,), jnp.float32),
            "logs3": jnp.zeros((self._n_out,), jnp.float32),
        }
        return params, shape

    def _net_out(self, params, x1):
        h = conv2d(x1, params["w1"], padding=1)
        h = jax.nn.relu(h)
        h = conv2d(h, params["w2"], padding=0)
        h = jax.nn.relu(h)
        h = conv2d(h, params["w3"], padding=1) \
            + params["b3"].reshape(1, -1, 1, 1)
        h = h * jnp.exp(params["logs3"] * self.logscale_factor
                        ).reshape(1, -1, 1, 1)
        # (B, c2*(K+3), H, W) -> (B, c2, H, W, K+3)
        b, _, hh, ww = h.shape
        c2 = self.input_size[0] - self.half_channels
        return jnp.transpose(
            h.reshape(b, c2, self.n_bins + 3, hh, ww), (0, 1, 3, 4, 2))

    def _transform(self, params, x, inverse):
        from .splines import monotone_cubic_b_spline
        x1 = x[:, : self.half_channels]
        x2 = x[:, self.half_channels:]
        coeffs = self._net_out(params, x1)
        tb = self.tail_bound
        inside = jnp.logical_and(x2 > -tb, x2 < tb)
        u = jnp.clip((x2 + tb) / (2 * tb), 0.0, 1.0)
        out, ld = monotone_cubic_b_spline(u, coeffs, inverse=inverse)
        z2 = jnp.where(inside, out * 2 * tb - tb, x2)
        ld = jnp.where(inside, ld, 0.0)
        z = jnp.concatenate([x1, z2], axis=1)
        return z, sum_except_batch(ld)

    def forward(self, params, x, rng=None):
        return self._transform(params, x, inverse=False)

    def inverse(self, params, z, rng=None):
        return self._transform(params, z, inverse=True)[0]

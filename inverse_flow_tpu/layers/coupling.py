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

    @property
    def half_channels(self):
        return self.input_size[0] // 2

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
        h = conv2d(x1, params["w1"], padding=1)
        h = jax.nn.relu(h)
        h = conv2d(h, params["w2"], padding=0)
        h = jax.nn.relu(h)
        h = conv2d(h, params["w3"], padding=1) + params["b3"].reshape(1, -1, 1, 1)
        h = h * jnp.exp(params["logs3"] * self.logscale_factor).reshape(1, -1, 1, 1)
        return h

    def _get_xs_logs_t(self, params, x):
        x1 = x[:, : self.half_channels]
        x2 = x[:, self.half_channels:]
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

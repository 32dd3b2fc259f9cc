"""Preprocessing layers: dequantization, normalization, logit/sigmoid.

Reference parity: ``inf/layers/dequantize.py``, ``inf/layers/normalize.py``,
``inf/layers/transforms.py``. The Normalization device-move branch that
returns ``None`` on first call (``normalize.py:20-27``) is not reproduced —
pure functions have no device state.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..distributions import UniformDistribution
from .base import FlowLayer, sum_except_batch, zeros_ldj


@dataclass(frozen=True)
class Dequantization(FlowLayer):
    """Uniform dequantization ``x + u`` with ``ldj = -log q(u)``.

    Mirrors ``dequantize.py:12-32``; for the uniform noise distribution the
    sample log-prob is 0, so the contribution is 0. ``inverse`` floors.
    Requires an rng in ``forward``.
    """

    distribution: UniformDistribution
    is_preprocessing = True

    def forward(self, params, x, rng=None):
        if rng is None:
            raise ValueError("Dequantization.forward requires an rng key")
        noise, log_qnoise = self.distribution.sample(rng, x.shape[0])
        return x + noise, -log_qnoise

    def inverse(self, params, z, rng=None):
        return jnp.floor(z)


@dataclass(frozen=True)
class Normalization(FlowLayer):
    """Affine ``(x - translation) / scale`` with ``ldj = -D*log(scale)``.

    Mirrors ``normalize.py:18-35`` (non-learnable path).
    """

    translation: float
    scale: float
    is_preprocessing = True

    def forward(self, params, x, rng=None):
        z = (x - self.translation) / self.scale
        d = 1
        for s in x.shape[1:]:
            d *= s
        ldj = jnp.full((x.shape[0],), -d * jnp.log(jnp.float32(self.scale)),
                       dtype=jnp.float32)
        return z, ldj

    def inverse(self, params, z, rng=None):
        return z * self.scale + self.translation


@dataclass(frozen=True)
class LogitTransform(FlowLayer):
    """``z = logit(x)`` with ``ldj = sum(-log x - log(1-x))``.

    Mirrors ``transforms.py:6-19``.
    """

    is_preprocessing = True

    def forward(self, params, x, rng=None):
        z = jnp.log(x) - jnp.log1p(-x)
        ldj = sum_except_batch(-jnp.log(x) - jnp.log1p(-x))
        return z, ldj

    def inverse(self, params, z, rng=None):
        return jax_sigmoid(z)


@dataclass(frozen=True)
class SigmoidTransform(FlowLayer):
    """``z = sigmoid(x)``; mirrors ``transforms.py:22-34``."""

    is_preprocessing = True

    def forward(self, params, x, rng=None):
        z = jax_sigmoid(x)
        ldj = sum_except_batch(log_sigmoid(x) + log_sigmoid(-x))
        return z, ldj

    def inverse(self, params, z, rng=None):
        return jnp.log(z) - jnp.log1p(-z)


# jax.nn.sigmoid is the numerically stable form: the naive
# 1/(1+exp(-x)) overflows for x < ~-88 in float32, and although the
# primal clamps to 0 the VJP then computes 0 * inf = NaN, poisoning the
# whole training step through an unbounded pre-activation.
jax_sigmoid = jax.nn.sigmoid
log_sigmoid = jax.nn.log_sigmoid

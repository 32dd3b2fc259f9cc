"""Gaussianize split: conditionally-Gaussian factor-out (RealNVP §3.6).

Reference parity: ``inf/if_imagenet_multi_gpu.py:152-187`` (``Gaussianize``:
zero-init 3x3 conv C -> 2C computing (mu, logs) of the factored half, with a
learned per-channel log-scale factor) and ``:96-150`` (``Split``): the
factored half is gaussianized conditioned on the kept half and its standard
-normal log-prob folded into the ldj — the multi-scale split used by the
``FastFlow`` ImageNet model (``:292-326``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..distributions import GaussianPrior
from ..ops.convs import conv2d
from .base import FlowLayer, sum_except_batch


@dataclass(frozen=True)
class Gaussianize(FlowLayer):
    """x2 -> z2 = (x2 - mu(x1)) * exp(-logs(x1)); ldj = -sum logs.

    The conv is zero-initialized so the layer starts as the identity
    (``if_imagenet_multi_gpu.py:163-167``).
    """

    n_channels: int

    def init(self, rng, shape):
        c = self.n_channels
        params = {
            "w": jnp.zeros((2 * c, c, 3, 3), jnp.float32),
            "b": jnp.zeros((2 * c,), jnp.float32),
            "log_scale_factor": jnp.zeros((2 * c, 1, 1), jnp.float32),
        }
        return params, shape

    def _mu_logs(self, params, x1):
        h = conv2d(x1, params["w"], padding=1) + params["b"].reshape(1, -1, 1, 1)
        h = h * jnp.exp(params["log_scale_factor"])[None]
        return h[:, 0::2], h[:, 1::2]

    def forward_split(self, params, x1, x2):
        mu, logs = self._mu_logs(params, x1)
        z2 = (x2 - mu) * jnp.exp(-logs)
        return z2, -sum_except_batch(logs)

    def inverse_split(self, params, x1, z2):
        mu, logs = self._mu_logs(params, x1)
        return mu + z2 * jnp.exp(logs)

    # as a standalone FlowLayer it gaussianizes the second channel half
    # conditioned on the first (``Gaussianize.forward`` with x2=None,
    # ``if_imagenet_multi_gpu.py:169-172``).
    def forward(self, params, x, rng=None):
        c = self.n_channels
        x1, x2 = x[:, :c], x[:, c:]
        z2, ldj = self.forward_split(params, x1, x2)
        return jnp.concatenate([x1, z2], axis=1), ldj

    def inverse(self, params, z, rng=None):
        c = self.n_channels
        x1, z2 = z[:, :c], z[:, c:]
        x2 = self.inverse_split(params, x1, z2)
        return jnp.concatenate([x1, x2], axis=1)


@dataclass(frozen=True)
class GaussianizeSplit(FlowLayer):
    """Channel split with a Gaussianize head: keeps x1, factors out x2 with
    log N(0,1)(z2) + ldj folded into the running log-det; the inverse draws
    z2 from the standard normal (``if_imagenet_multi_gpu.py:96-150``).

    Drop-in alternative to :class:`SplitPrior` (which uses a coupling +
    unconditional prior instead, ``inf/layers/splitprior.py:8-41``).
    """

    input_size: Tuple[int, int, int]

    @property
    def gaussianize(self):
        return Gaussianize(self.input_size[0] // 2)

    @property
    def base(self):
        c, h, w = self.input_size
        return GaussianPrior((c // 2, h, w))

    def init(self, rng, shape):
        c, h, w = shape
        params, _ = self.gaussianize.init(rng, shape)
        return params, (c // 2, h, w)

    def forward(self, params, x, rng=None):
        c_half = self.input_size[0] // 2
        x1, x2 = x[:, :c_half], x[:, c_half:]
        z2, ldj = self.gaussianize.forward_split(params, x1, x2)
        return x1, ldj + self.base.log_prob(z2)

    def inverse(self, params, z, rng=None):
        if rng is None:
            raise ValueError("GaussianizeSplit.inverse requires an rng key")
        z2, _ = self.base.sample(rng, z.shape[0])
        x2 = self.gaussianize.inverse_split(params, z, z2)
        return jnp.concatenate([z, x2], axis=1)

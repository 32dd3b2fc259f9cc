"""ActNorm: per-channel affine with data-dependent initialization.

Reference parity: ``inf/layers/actnorm.py:5-93``. The in-place first-batch
init (``actnorm.py:21-27``) becomes an explicit, functional ``data_init``
pass the trainer runs once before the first step — this also makes sharded
(data-parallel) init correct, since ``jnp.mean``/``std`` over a sharded batch
reduce globally under jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .base import FlowLayer


@dataclass(frozen=True)
class ActNorm(FlowLayer):
    """``out = (x - t) * exp(-log_s)``; ldj ``-sum(log_s) * H * W``.

    Works on (B, C, H, W) with per-channel params or (B, D) with per-dim
    params, mirroring the reference's dual 4-D/2-D handling
    (``actnorm.py:29-41``).
    """

    n_dims: int

    def init(self, rng, shape):
        k1, k2 = jax.random.split(rng)
        params = {
            "translation": jax.random.normal(k1, (self.n_dims,), jnp.float32),
            "log_scale": jax.random.normal(k2, (self.n_dims,), jnp.float32),
        }
        return params, shape

    def data_init(self, params, x):
        reduce_dims = tuple(i for i in range(x.ndim) if i != 1)
        mean = jnp.mean(x, axis=reduce_dims)
        std = jnp.std(x, axis=reduce_dims)
        return {
            "translation": mean,
            "log_scale": jnp.log(std + 1e-8),
        }

    def _broadcast(self, params, x):
        if x.ndim == 4:
            t = params["translation"].reshape(1, -1, 1, 1)
            s = params["log_scale"].reshape(1, -1, 1, 1)
        else:
            t = params["translation"].reshape(1, -1)
            s = params["log_scale"].reshape(1, -1)
        return t, s

    def forward(self, params, x, rng=None):
        t, log_s = self._broadcast(params, x)
        out = (x - t) * jnp.exp(-log_s)
        return out, self.logdet(params, x)

    def inverse(self, params, z, rng=None):
        t, log_s = self._broadcast(params, z)
        return z * jnp.exp(log_s) + t

    def logdet(self, params, x):
        b = x.shape[0]
        ldj = -jnp.sum(params["log_scale"])
        if x.ndim == 4:
            ldj = ldj * x.shape[2] * x.shape[3]
        return jnp.full((b,), ldj, dtype=jnp.float32)


@dataclass(frozen=True)
class ActNormFC(ActNorm):
    """Reshape wrapper for flat inputs (``actnorm.py:77-93``)."""

    def forward(self, params, x, rng=None):
        out, ldj = super().forward(params, x.reshape(-1, self.n_dims, 1, 1),
                                   rng=rng)
        return out.reshape(-1, self.n_dims), ldj

    def inverse(self, params, z, rng=None):
        out = super().inverse(params, z.reshape(-1, self.n_dims, 1, 1),
                              rng=rng)
        return out.reshape(-1, self.n_dims)


class ActNormPlainLayer(ActNorm):
    """ActNorm used as a plain (non-flow) module: forward returns only the
    activation, dropping the ldj (``inf/layers/actnorm.py:71-74``) — used
    inside conditioning networks where no log-det is tracked."""

    def apply(self, params, x):
        return super().forward(params, x)[0]

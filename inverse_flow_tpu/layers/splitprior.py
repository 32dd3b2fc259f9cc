"""SplitPrior: coupling + channel split with factored-out half.

Reference parity: ``inf/layers/splitprior.py:8-63``. The factored half's
base log-prob is folded into the layer's ldj (``splitprior.py:18-27``); the
inverse samples the factored half from the base (needs an rng —
``splitprior.py:29-36``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..distributions import GaussianPrior
from .base import FlowLayer
from .coupling import Coupling


@dataclass(frozen=True)
class SplitPrior(FlowLayer):
    input_size: Tuple[int, int, int]
    width: int = 512
    compute_dtype: str = "float32"      # coupling-net precision policy
    remat_net: bool = False             # see Coupling.remat_net

    @property
    def transform(self):
        return Coupling(self.input_size, width=self.width,
                        compute_dtype=self.compute_dtype,
                        remat_net=self.remat_net)

    @property
    def base(self):
        c, h, w = self.input_size
        return GaussianPrior((c // 2, h, w))

    def init(self, rng, shape):
        c, h, w = shape
        params, _ = self.transform.init(rng, shape)
        return params, (c // 2, h, w)

    def forward(self, params, x, rng=None):
        z, ldj = self.transform.forward(params, x)
        c_half = self.input_size[0] // 2
        x1 = z[:, :c_half]
        x2 = z[:, c_half:]
        log_pz2 = self.base.log_prob(x2)
        return x1, log_pz2 + ldj

    def inverse(self, params, z, rng=None):
        if rng is None:
            raise ValueError("SplitPrior.inverse requires an rng key")
        x2, _ = self.base.sample(rng, z.shape[0])
        x = jnp.concatenate([z, x2], axis=1)
        return self.transform.inverse(params, x)


@dataclass(frozen=True)
class SplitPriorFC(SplitPrior):
    """Flat-input wrapper (``splitprior.py:43-63``)."""

    def init(self, rng, shape):
        (d,) = shape
        params, _ = self.transform.init(rng, self.input_size)
        return params, (d // 2,)

    def forward(self, params, x, rng=None):
        n = self.input_size[0]
        out, ldj = super().forward(params, x.reshape(-1, n, 1, 1), rng=rng)
        return out.reshape(-1, n // 2), ldj

    def inverse(self, params, z, rng=None):
        n = self.input_size[0]
        out = super().inverse(params, z.reshape(-1, n // 2, 1, 1), rng=rng)
        return out.reshape(-1, n)

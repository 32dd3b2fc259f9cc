"""Emerging convolutions (Hoogeboom et al.).

Reference parity: ``inf/layers/emerging/emerging_module.py:10-116``,
``masks.py:4-43``, ``inverse_triang_conv.py:12-28``. The square
autoregressive 2x2 conv has exactly the raster-order triangular structure
of the framework's core solver — with a *learnable diagonal* instead of a
unit one — so its inverse runs on-device through :func:`inv_conv_solve`
(the reference round-trips through a CPU float64 Cython raster scan per
sampling call).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.inv_conv import inv_conv_solve, masked_conv_apply
from .base import FlowLayer, zeros_ldj
from .conv1x1 import Conv1x1


def square_ar_mask(c: int, kh: int = 2, kw: int = 2):
    """All taps free except the center tap, which is lower-triangular
    INCLUDING the diagonal (``masks.py:4-43``, zerodiagonal=False)."""
    mask = jnp.ones((c, c, kh, kw), jnp.float32)
    co = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    tri = (ci <= co).astype(jnp.float32)   # keep diag + lower
    return mask.at[:, :, -1, -1].set(tri)


@dataclass(frozen=True)
class SquareAutoRegressiveConv2d(FlowLayer):
    """2x2 AR conv; ldj = H*W * sum log|diag| (``emerging_module.py:10-60``)."""

    n_channels: int

    def init(self, rng, shape):
        c = self.n_channels
        k = (c, c, 2, 2)
        w = jax.random.normal(rng, k, jnp.float32) / jnp.sqrt(
            jnp.float32(c * c * 4))
        w = w.at[jnp.arange(c), jnp.arange(c), -1, -1].add(1.0)
        return {"w": w, "b": jnp.zeros((c,), jnp.float32)}, shape

    def _w_eff(self, params):
        return params["w"] * square_ar_mask(self.n_channels)

    def _ldj(self, params, x):
        c = self.n_channels
        diag = params["w"][jnp.arange(c), jnp.arange(c), -1, -1]
        ld = jnp.sum(jnp.log(jnp.abs(diag))) * x.shape[2] * x.shape[3]
        return jnp.broadcast_to(ld, (x.shape[0],)).astype(jnp.float32)

    def forward(self, params, x, rng=None):
        # conv pad=1 then slicing off the last row/col == TL zero padding
        # (emerging_module.py:36-40), which is masked_conv_apply's geometry.
        z = masked_conv_apply(x, self._w_eff(params))
        z = z + params["b"].reshape(1, -1, 1, 1)
        return z, self._ldj(params, x)

    def inverse(self, params, z, rng=None):
        z = z - params["b"].reshape(1, -1, 1, 1)
        # On-device triangular solve (replaces the CPU float64 Cython scan,
        # inverse_triang_conv.py:12-28).
        return inv_conv_solve(z, self._w_eff(params))


@dataclass(frozen=True)
class Flip2d(FlowLayer):
    """Spatial 180-degree flip (``emerging_module.py:63-86``)."""

    def forward(self, params, x, rng=None):
        return jnp.flip(x, (2, 3)), zeros_ldj(x)

    def inverse(self, params, z, rng=None):
        return jnp.flip(z, (2, 3))


@dataclass(frozen=True)
class Emerging(FlowLayer):
    """1x1 then two AR convs with flips (``emerging_module.py:89-116``)."""

    n_channels: int

    @property
    def transforms(self):
        return (Conv1x1(self.n_channels),
                SquareAutoRegressiveConv2d(self.n_channels),
                Flip2d(),
                SquareAutoRegressiveConv2d(self.n_channels),
                Flip2d())

    def init(self, rng, shape):
        params = []
        for t in self.transforms:
            rng, sub = jax.random.split(rng)
            p, shape = t.init(sub, shape)
            params.append(p)
        return {"t": params}, shape

    def forward(self, params, x, rng=None):
        ldj = zeros_ldj(x)
        for t, p in zip(self.transforms, params["t"]):
            x, l = t.forward(p, x)
            ldj = ldj + l
        return x, ldj

    def inverse(self, params, z, rng=None):
        for t, p in zip(reversed(self.transforms), reversed(params["t"])):
            z = t.inverse(p, z)
        return z

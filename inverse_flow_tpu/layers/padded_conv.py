"""PaddedConv2d and the FincFlow unit (CInC-style invertible convs).

Reference parity: ``inf/layers/conv.py:22-222`` (PaddedConv2d — masked conv
forward, wavefront inverse) and ``inf/layers/fincflow.py:15-101``
(Finc_FlowUnit — 4 channel-chunks through 4 pad orders in parallel
branches; level-2 inverse solves all 4 orders in one kernel).

Direction convention (note it is the MIRROR of InvFlow): the training
forward is the masked convolution; sampling inverts it. The reference's
inverse path is a CPU float64 Cython solve (``conv.py:114-164``, a
device->host->device round trip per layer!) or the ``cinc_cuda_level1/2``
wavefront kernels; here both directions stay on-device and the level-2
"all 4 orders in one launch" trick is simply ``groups=4`` in the batched
triangular-solve op — in BOTH directions, not just sampling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.inv_conv import apply_mask, inv_conv_solve, masked_conv_apply
from .base import FlowLayer, zeros_ldj
from .inv_flow import ORDERS, _flip_axes


@dataclass(frozen=True)
class PaddedConv2d(FlowLayer):
    """Masked conv with TL/TR/BL/BR pad order; unit-diagonal center tap.

    ``conv.py:22-108``: weight init normal(0, 0.05); center tap forced to
    unit-lower-triangular (``:69-71``) — here enforced by in-op masking.
    """

    channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    order: str = "TL"

    def __post_init__(self):
        assert self.order in ORDERS, f"unknown order: {self.order}"

    def init(self, rng, shape):
        kh, kw = self.kernel_size
        w = 0.05 * jax.random.normal(
            rng, (self.channels, self.channels, kh, kw), jnp.float32)
        return {"w": w}, shape

    def forward(self, params, x, rng=None):
        ax = _flip_axes(self.order)
        x = jnp.flip(x, ax) if ax else x
        z = masked_conv_apply(x, apply_mask(params["w"]))
        z = jnp.flip(z, ax) if ax else z
        return z, zeros_ldj(z)

    def inverse(self, params, z, rng=None):
        ax = _flip_axes(self.order)
        z = jnp.flip(z, ax) if ax else z
        x = inv_conv_solve(z, apply_mask(params["w"]))
        x = jnp.flip(x, ax) if ax else x
        return x


@dataclass(frozen=True)
class FincFlowUnit(FlowLayer):
    """Four pad orders over four channel chunks, in parallel branches.

    ``fincflow.py:15-101``. The reference runs 4 separate convs forward and
    merges kernels/flips for a single ``cinc_cuda_level2.inverse`` call when
    sampling (``:79-101``). Here both directions are ONE grouped op
    (``groups=4``): flip each chunk into canonical TL orientation, run the
    grouped masked conv / grouped solve, flip back.
    """

    channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    # sampling-direction solver: 'exact' (default — grouped blocked XLA
    # solve) or 'fused'/'auto' (grouped fused Pallas solve via dense
    # block-diagonal expansion — the TPU twin of the level-2 all-orders-
    # one-launch CUDA kernel, cinc_cuda_kernel_level2.cu:97-99).
    solver: str = "exact"

    def __post_init__(self):
        assert self.channels % 4 == 0, "channels must be a multiple of 4"
        assert self.solver in ("exact", "fused", "auto"), self.solver

    @property
    def chunk(self):
        return self.channels // 4

    def init(self, rng, shape):
        kh, kw = self.kernel_size
        keys = jax.random.split(rng, 4)
        ws = [0.05 * jax.random.normal(k, (self.chunk, self.chunk, kh, kw),
                                       jnp.float32) for k in keys]
        return {"ws": ws}, shape

    def _canonical(self, x):
        """Split into 4 chunks and flip each into TL orientation."""
        chunks = jnp.split(x, 4, axis=1)
        out = []
        for chunk, order in zip(chunks, ORDERS):
            ax = _flip_axes(order)
            out.append(jnp.flip(chunk, ax) if ax else chunk)
        return jnp.concatenate(out, axis=1)

    # the four flips are involutions, so canonicalization is its own inverse
    _uncanonical = _canonical

    def _w_eff(self, params):
        return jnp.concatenate([apply_mask(w) for w in params["ws"]], axis=0)

    def forward(self, params, x, rng=None):
        xc = self._canonical(x)
        zc = masked_conv_apply(xc, self._w_eff(params), groups=4)
        return self._uncanonical(zc), zeros_ldj(x)

    def inverse(self, params, z, rng=None):
        zc = self._canonical(z)
        from ..ops.fused_chain import select_fused
        if select_fused(self.solver, zc.shape, self.kernel_size, ("TL",),
                        groups=4):
            from ..ops.fused_chain import (expand_grouped_kernel,
                                           fused_chain_solve)
            xc = fused_chain_solve(
                zc, (expand_grouped_kernel(self._w_eff(params), 4),),
                ("TL",))
        else:
            xc = inv_conv_solve(zc, self._w_eff(params), 4)
        return self._uncanonical(xc)

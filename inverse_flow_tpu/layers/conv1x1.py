"""Invertible 1x1 convolutions (Glow) and the Householder variant.

Reference parity: ``inf/layers/conv1x1.py:8-96``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from .base import FlowLayer

# Channel-mixing matmuls are numerics-sensitive (their slogdet is the ldj):
# force full f32 MXU passes instead of the default bf16.
_HI = lax.Precision.HIGHEST


def _orthogonal_init(rng, n):
    w = jax.random.normal(rng, (n, n), jnp.float32)
    # QR on accelerator defaults to low-precision matmuls; do it in numpy.
    import numpy as np
    q = jnp.asarray(np.linalg.qr(np.asarray(w))[0], jnp.float32)
    return q


@dataclass(frozen=True)
class Conv1x1(FlowLayer):
    """QR-orthogonal-initialized 1x1 conv; ldj = H*W*slogdet(W).

    Mirrors ``conv1x1.py:8-44``. The 1x1 conv is a channel matmul — on TPU we
    express it as an einsum so XLA maps it straight onto the MXU.
    """

    n_channels: int

    def init(self, rng, shape):
        return {"W": _orthogonal_init(rng, self.n_channels)}, shape

    def forward(self, params, x, rng=None):
        w = params["W"]
        h, wd = x.shape[2], x.shape[3]
        ldj = h * wd * jnp.linalg.slogdet(w)[1]
        z = jnp.einsum("oc,bchw->bohw", w, x, precision=_HI,
                       preferred_element_type=jnp.float32)
        return z, jnp.broadcast_to(ldj, (x.shape[0],)).astype(jnp.float32)

    def inverse(self, params, z, rng=None):
        w_inv = jnp.linalg.inv(params["W"])
        return jnp.einsum("oc,bchw->bohw", w_inv, z, precision=_HI,
                          preferred_element_type=jnp.float32)


@dataclass(frozen=True)
class Conv1x1Householder(FlowLayer):
    """Orthogonal 1x1 conv built from Householder reflections, ldj = 0.

    Mirrors ``conv1x1.py:47-96``.
    """

    n_channels: int
    n_reflections: int

    def init(self, rng, shape):
        v = jax.random.normal(rng, (self.n_reflections, self.n_channels),
                              jnp.float32)
        return {"V": v}, shape

    def _construct_q(self, params):
        v = params["V"]

        def body(q, vi):
            vi = vi.reshape(-1, 1)
            refl = (jnp.eye(self.n_channels, dtype=jnp.float32)
                    - 2.0 * (vi @ vi.T) / (vi.T @ vi))
            return lax.dot(q, refl, precision=_HI), None

        q0 = jnp.eye(self.n_channels, dtype=jnp.float32)
        q, _ = jax.lax.scan(body, q0, v)
        return q

    def forward(self, params, x, rng=None):
        q = self._construct_q(params)
        z = jnp.einsum("oc,bchw->bohw", q, x, precision=_HI,
                       preferred_element_type=jnp.float32)
        return z, jnp.zeros((x.shape[0],), jnp.float32)

    def inverse(self, params, z, rng=None):
        q = self._construct_q(params)
        return jnp.einsum("co,bchw->bohw", q, z, precision=_HI,
                          preferred_element_type=jnp.float32)

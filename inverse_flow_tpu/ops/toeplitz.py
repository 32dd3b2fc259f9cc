"""Dense conv-as-matrix operators for exact log-dets / exact inverses.

Reference parity: ``inf/utils/toeplitz.py:9-44`` (``get_toeplitz_idxs`` /
``get_sparse_toeplitz``) used by SelfNorm / inv-flow expensive paths
(``selfnorm.py:231-246``). Building the matrix by pushing a basis through
``lax.conv`` is simpler and provably consistent with the conv op itself;
it is only used on eval paths for modest shapes, where the O((CHW)^2)
materialization is acceptable (the reference densifies too before
``slogdet``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .convs import conv2d


def dense_conv_operator(w, in_shape, stride=1, padding=0):
    """T with z.flatten() = T @ x.flatten() for z = conv2d(x, w).

    in_shape: (C, H, W) without batch. Returns (out_dim, in_dim).
    """
    c, h, width = in_shape
    dim = c * h * width
    basis = jnp.eye(dim, dtype=jnp.float32).reshape(dim, c, h, width)
    cols = conv2d(basis, w, stride=stride, padding=padding)
    out_dim = cols.shape[1] * cols.shape[2] * cols.shape[3]
    return cols.reshape(dim, out_dim).T


def conv_logdet(w, in_shape, stride=1, padding=0):
    """slogdet of the conv operator (exact path, ``selfnorm.py:240-246``)."""
    t = dense_conv_operator(w, in_shape, stride, padding)
    return jnp.linalg.slogdet(t)[1]


def conv_exact_inverse(z, w, in_shape, stride=1, padding=0):
    """x = T^{-1} z via dense solve (``selfnorm.py:175-180``)."""
    t = dense_conv_operator(w, in_shape, stride, padding)
    b = z.shape[0]
    x = jnp.linalg.solve(t, z.reshape(b, -1).T).T
    return x.reshape((b,) + tuple(in_shape))

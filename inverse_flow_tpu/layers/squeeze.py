"""Squeeze / UnSqueeze (2x2 space-to-depth), volume preserving.

Reference parity: ``inf/layers/squeeze.py:5-52``. The exact element order of
the reference's view/permute is reproduced so checkpoints and bit-level
parity tests line up.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .base import FlowLayer, zeros_ldj


def space_to_depth(x):
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(b, c * 4, h // 2, w // 2)


def depth_to_space(x):
    b, c, h, w = x.shape
    x = x.reshape(b, c // 4, 2, 2, h, w)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, c // 4, h * 2, w * 2)


@dataclass(frozen=True)
class Squeeze(FlowLayer):
    def init(self, rng, shape):
        c, h, w = shape
        return {}, (c * 4, h // 2, w // 2)

    def forward(self, params, x, rng=None):
        return space_to_depth(x), zeros_ldj(x)

    def inverse(self, params, z, rng=None):
        return depth_to_space(z)


@dataclass(frozen=True)
class UnSqueeze(FlowLayer):
    def init(self, rng, shape):
        c, h, w = shape
        return {}, (c // 4, h * 2, w * 2)

    def forward(self, params, x, rng=None):
        return depth_to_space(x), zeros_ldj(x)

    def inverse(self, params, z, rng=None):
        return space_to_depth(z)

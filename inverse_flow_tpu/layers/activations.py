"""Elementwise invertible activations.

Reference parity: ``inf/layers/activations.py:9-231`` — FlowActivationLayer
(ldj = sum log|f'|), SmoothLeakyRelu (Newton-Raphson inverse, 100 iters),
LeakyRelu, LearnableLeakyRelu, SmoothTanh, SplineActivation (elementwise RQ
spline with learned global or per-pixel knots), Identity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from .base import FlowLayer, sum_except_batch
from .splines import (monotone_cubic_b_spline,
                      unconstrained_rational_quadratic_spline)


class FlowActivationLayer(FlowLayer):
    """Elementwise activation; ldj = sum log|act'(x)|
    (``activations.py:9-23``)."""

    def activation(self, params, x):
        raise NotImplementedError

    def act_prime(self, params, x):
        raise NotImplementedError

    def forward(self, params, x, rng=None):
        return self.activation(params, x), self.logdet(params, x)

    def logdet(self, params, x):
        return sum_except_batch(jnp.log(jnp.abs(self.act_prime(params, x))))

    def _newton_raphson_inverse(self, params, y, n_iter=100):
        """Fixed-iteration Newton-Raphson (``activations.py:26-33``) as a
        fori_loop — static trip count, jit-friendly."""

        def body(_, x):
            fprime = jnp.maximum(self.act_prime(params, x), 1e-2)
            return x - (self.activation(params, x) - y) / fprime

        return jax.lax.fori_loop(0, n_iter, body, y)


@dataclass(frozen=True)
class SmoothLeakyRelu(FlowActivationLayer):
    """``alpha*x + (1-alpha)*softplus(x)`` (``activations.py:36-54``)."""

    alpha: float = 0.3

    def activation(self, params, x):
        return self.alpha * x + (1 - self.alpha) * jax.nn.softplus(x)

    def act_prime(self, params, x):
        return self.alpha + (1 - self.alpha) * jax.nn.sigmoid(x)

    def inverse(self, params, z, rng=None):
        return self._newton_raphson_inverse(params, z)


@dataclass(frozen=True)
class LeakyRelu(FlowActivationLayer):
    """Piecewise-linear leaky ReLU (``activations.py:57-78``)."""

    alpha: float = 0.1

    def activation(self, params, x):
        return jnp.where(x < 0, self.alpha * x, x)

    def act_prime(self, params, x):
        return jnp.where(x < 0, self.alpha, 1.0)

    def inverse(self, params, z, rng=None):
        return jnp.where(z < 0, z / self.alpha, z)


@dataclass(frozen=True)
class LearnableLeakyRelu(FlowActivationLayer):
    """Leaky ReLU with learnable slope ``sigmoid(a)+0.5``
    (``activations.py:81-103``)."""

    def init(self, rng, shape):
        return {"alpha_logit": jnp.zeros((1,), jnp.float32)}, shape

    def _alpha(self, params):
        return jax.nn.sigmoid(params["alpha_logit"]) + 0.5

    def activation(self, params, x):
        a = self._alpha(params)
        return jnp.where(x < 0, a * x, x)

    def act_prime(self, params, x):
        a = self._alpha(params)
        return jnp.where(x < 0, a, jnp.ones_like(a))

    def inverse(self, params, z, rng=None):
        a = self._alpha(params)
        return jnp.where(z < 0, z / a, z)


@dataclass(frozen=True)
class SmoothTanh(FlowActivationLayer):
    """``tanh(alpha*x) + beta*x`` (``activations.py:106-121``)."""

    alpha: float = 1.0
    beta: float = 0.1

    def activation(self, params, x):
        return jnp.tanh(self.alpha * x) + self.beta * x

    def act_prime(self, params, x):
        return self.beta + self.alpha / jnp.cosh(self.alpha * x) ** 2

    def inverse(self, params, z, rng=None):
        return self._newton_raphson_inverse(params, z)


@dataclass(frozen=True)
class SplineActivation(FlowLayer):
    """Elementwise RQ-spline activation with learned knots.

    Mirrors ``activations.py:126-217``: ``individual_weights=True`` learns a
    knot set per tensor position (broadcast over batch); otherwise a single
    global knot set shared across all positions.
    """

    input_size: Tuple[int, ...]
    n_bins: int = 5
    tail_bound: float = 10.0
    individual_weights: bool = False
    # Explicitly materialize knot params at the batched shape before the
    # spline math (True), vs passing them batch-1 and letting XLA
    # broadcast (False). Numerically identical; which is faster is a
    # compiler question (tile: knot softmax/cumsum recomputed per batch
    # row; broadcast: the params' VJP gains a batch reduction). A
    # cross-session slope comparison once suggested 35% for tile, but
    # the sessions drifted by that much on their own — adjudicate with
    # the in-process A/B (scan_slope_bench.py --ab).
    tile_params: bool = True

    def init(self, rng, shape):
        k1, k2, k3 = jax.random.split(rng, 3)
        if self.individual_weights:
            wshape = (1,) + tuple(self.input_size) + (self.n_bins,)
            dshape = (1,) + tuple(self.input_size) + (self.n_bins - 1,)
        else:
            wshape = (self.n_bins,)
            dshape = (self.n_bins - 1,)
        params = {
            "widths": 0.01 * jax.random.normal(k1, wshape, jnp.float32),
            "heights": 0.01 * jax.random.normal(k2, wshape, jnp.float32),
            "derivs": 0.01 * jax.random.normal(k3, dshape, jnp.float32),
        }
        return params, shape

    def _spline_params(self, params, x):
        if self.individual_weights:
            if not self.tile_params:
                return (params["widths"], params["heights"],
                        params["derivs"])
            reps = (x.shape[0],) + (1,) * (params["widths"].ndim - 1)
            return (jnp.tile(params["widths"], reps),
                    jnp.tile(params["heights"], reps),
                    jnp.tile(params["derivs"], reps))
        ones = (1,) * x.ndim
        if not self.tile_params:
            return (params["widths"].reshape(ones + (-1,)),
                    params["heights"].reshape(ones + (-1,)),
                    params["derivs"].reshape(ones + (-1,)))
        w = jnp.broadcast_to(params["widths"].reshape(ones + (-1,)),
                             x.shape + (self.n_bins,))
        h = jnp.broadcast_to(params["heights"].reshape(ones + (-1,)),
                             x.shape + (self.n_bins,))
        d = jnp.broadcast_to(params["derivs"].reshape(ones + (-1,)),
                             x.shape + (self.n_bins - 1,))
        return w, h, d

    def forward(self, params, x, rng=None):
        w, h, d = self._spline_params(params, x)
        out, ld = unconstrained_rational_quadratic_spline(
            x, w, h, d, inverse=False, tail_bound=self.tail_bound)
        return out, sum_except_batch(ld)

    def inverse(self, params, z, rng=None):
        w, h, d = self._spline_params(params, z)
        out, _ = unconstrained_rational_quadratic_spline(
            z, w, h, d, inverse=True, tail_bound=self.tail_bound)
        return out


@dataclass(frozen=True)
class BSplineActivation(FlowLayer):
    """Elementwise monotone cubic B-spline activation (the reference's
    ``BSpline`` option: ``ConditionalBSplineTransformer`` used as an
    activation, ``experiments/if_glow_mnist.py:25,44`` /
    ``splines/bspline.py:20-190``; linear-interp variant
    ``BSplineActivation.py:6-57``).

    [-tail_bound, tail_bound] is affinely mapped to [0, 1], transformed by
    a learned monotone cubic B-spline bijection (endpoints fixed, so the
    map is continuous at the boundary), and mapped back; identity with
    ldj 0 outside. The affine rescale factors cancel in the Jacobian."""

    n_bins: int = 8
    tail_bound: float = 10.0

    def init(self, rng, shape):
        c = 0.01 * jax.random.normal(rng, (self.n_bins + 3,), jnp.float32)
        return {"coeffs": c}, shape

    def _transform(self, params, x, inverse):
        b = self.tail_bound
        inside = jnp.logical_and(x > -b, x < b)
        u = jnp.clip((x + b) / (2 * b), 0.0, 1.0)
        out, ld = monotone_cubic_b_spline(u, params["coeffs"],
                                          inverse=inverse)
        y = jnp.where(inside, out * 2 * b - b, x)
        ld = jnp.where(inside, ld, 0.0)
        return y, sum_except_batch(ld)

    def forward(self, params, x, rng=None):
        return self._transform(params, x, inverse=False)

    def inverse(self, params, z, rng=None):
        return self._transform(params, z, inverse=True)[0]

    def logdet(self, params, x):
        return self._transform(params, x, inverse=False)[1]


# The reference experiments construct ``ConditionalBSplineTransformer(size)``
# as an elementwise activation (``if_glow_mnist.py:44`` — note that call
# passes an int where a module is required and cannot actually run);
# :class:`BSplineActivation` covers that use. The real *conditional*
# transformer lives in ``layers/splines.py`` (and ``BSplineCoupling``
# wires it as a coupling transform).


@dataclass(frozen=True)
class Identity(FlowActivationLayer):
    def activation(self, params, x):
        return x

    def act_prime(self, params, x):
        return jnp.ones_like(x)

    def inverse(self, params, z, rng=None):
        return z

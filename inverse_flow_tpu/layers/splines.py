"""Unconstrained rational-quadratic splines (Durkan et al.) in JAX.

Reference parity: ``inf/layers/splines/rational_quadratic.py:21-175``. The
reference's boolean-mask scatter (``:48-63``) and its data-dependent clamping
guard (``:77-88``) become branch-free ``jnp.where`` masking, which is what
XLA wants: everything static-shaped, inside/outside handled by select, inputs
clamped into the interval with a small tolerance before evaluation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-6
DEFAULT_MIN_BIN_HEIGHT = 1e-6
DEFAULT_MIN_DERIVATIVE = 1e-6


def _searchsorted(bin_locations, inputs, eps=1e-6):
    bin_locations = bin_locations.at[..., -1].add(eps)
    return jnp.sum(inputs[..., None] >= bin_locations, axis=-1) - 1


def unconstrained_rational_quadratic_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=False, tail_bound=1.0,
        min_bin_width=DEFAULT_MIN_BIN_WIDTH,
        min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
        min_derivative=DEFAULT_MIN_DERIVATIVE):
    """Linear tails outside [-tail_bound, tail_bound]; RQ spline inside."""
    inside = jnp.logical_and(inputs >= -tail_bound, inputs <= tail_bound)

    # Pad boundary derivatives so the spline is C1 with slope-1 tails
    # (rational_quadratic.py:38-46 — derivative init constant makes
    # softplus(c)+min_derivative == 1).
    constant = math.log(math.expm1(1.0 - min_derivative))
    pad = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(unnormalized_derivatives, pad)
    unnormalized_derivatives = unnormalized_derivatives + constant

    # Clamp into the interval (tolerance guard, :82-88) so the in-spline math
    # is well-defined everywhere; outside values are overwritten below.
    clamped = jnp.clip(inputs, -tail_bound, tail_bound)

    out_in, ldj_in = rational_quadratic_spline(
        clamped, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=inverse,
        left=-tail_bound, right=tail_bound,
        bottom=-tail_bound, top=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative)

    outputs = jnp.where(inside, out_in, inputs)
    logabsdet = jnp.where(inside, ldj_in, 0.0)
    return outputs, logabsdet


def rational_quadratic_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=False,
        left=0.0, right=1.0, bottom=0.0, top=1.0,
        min_bin_width=DEFAULT_MIN_BIN_WIDTH,
        min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
        min_derivative=DEFAULT_MIN_DERIVATIVE):
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths,
                        [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights,
                         [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    if inverse:
        bin_idx = _searchsorted(cumheights, inputs)
    else:
        bin_idx = _searchsorted(cumwidths, inputs)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)

    # Bin-parameter selection as a one-hot contraction over the (tiny) bin
    # axis instead of take_along_axis: a per-element gather along the lane
    # dimension lowers to an XLA "custom fusion" gather whose VJP is a
    # scatter-add — measured 93% of the whole Glow-MNIST train step on TPU
    # v5e (results/step_profile.md: 7 forward gathers + 7 backward scatters
    # = 169.7 of 182.5 ms). The one-hot form is exact (one unit weight per
    # row; x*1+0 terms), elementwise, and fuses into the surrounding math.
    onehot = jax.nn.one_hot(bin_idx, num_bins, dtype=inputs.dtype)

    def gather(t):
        return jnp.sum(t * onehot, axis=-1)

    input_cumwidths = gather(cumwidths[..., :-1])
    input_bin_widths = gather(widths)
    input_cumheights = gather(cumheights[..., :-1])
    delta = heights / widths
    input_delta = gather(delta)
    input_derivatives = gather(derivatives[..., :-1])
    input_derivatives_plus_one = gather(derivatives[..., 1:])
    input_heights = gather(heights)

    if inverse:
        d_sum = input_derivatives + input_derivatives_plus_one - 2 * input_delta
        a = ((inputs - input_cumheights) * d_sum
             + input_heights * (input_delta - input_derivatives))
        b = (input_heights * input_derivatives
             - (inputs - input_cumheights) * d_sum)
        c = -input_delta * (inputs - input_cumheights)

        discriminant = b * b - 4 * a * c
        discriminant = jnp.maximum(discriminant, 0.0)

        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * input_bin_widths + input_cumwidths

        theta_one_minus_theta = root * (1 - root)
        denominator = input_delta + d_sum * theta_one_minus_theta
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_plus_one * root ** 2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - root) ** 2)
        logabsdet = (jnp.log(derivative_numerator)
                     - 2 * jnp.log(denominator))
        return outputs, -logabsdet
    else:
        theta = (inputs - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1 - theta)
        d_sum = input_derivatives + input_derivatives_plus_one - 2 * input_delta

        numerator = input_heights * (input_delta * theta ** 2
                                     + input_derivatives * theta_one_minus_theta)
        denominator = input_delta + d_sum * theta_one_minus_theta
        outputs = input_cumheights + numerator / denominator

        derivative_numerator = input_delta ** 2 * (
            input_derivatives_plus_one * theta ** 2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2)
        logabsdet = (jnp.log(derivative_numerator)
                     - 2 * jnp.log(denominator))
        return outputs, logabsdet


# ---------------------------------------------------------------------------
# Monotone cubic B-spline on [0, 1]
# ---------------------------------------------------------------------------
#
# TPU-native equivalent of the reference cubic B-spline transformer
# (``inf/layers/splines/bspline.py:210-588`` ``cubic_B_spline`` and the
# linear-interp ``BSplineActivationFunc``, ``BSplineActivation.py:6-57``):
# a C^2 monotone bijection of [0, 1] built from uniform cubic B-spline
# segments with increasing control points (softmax-cumsum parametrization).
# The reference inverts with analytic Cardano roots in float64; here the
# inverse is a fixed-count bisection + Newton polish — branch-free, static
# shapes, float32-stable, vectorized over the VPU.

def monotone_cubic_b_spline(x, unnormalized_coeffs, inverse=False,
                            min_step=1e-4):
    """Evaluate (or invert) a monotone cubic B-spline bijection of [0, 1].

    Args:
      x: inputs in [0, 1], any shape.
      unnormalized_coeffs: (..., K+3) raw control-point increments,
        broadcastable to ``x.shape + (K+3,)``; K = number of bins.
      inverse: invert the map.
    Returns:
      (outputs, logabsdet) elementwise; for ``inverse=True`` the logdet of
      the inverse map (i.e. minus the forward logdet at the pre-image).
    """
    kp3 = unnormalized_coeffs.shape[-1]
    k = kp3 - 3
    coeffs = jnp.broadcast_to(unnormalized_coeffs, x.shape + (kp3,))

    # increasing control points c_0 < ... < c_{K+2}
    step = jax.nn.softmax(coeffs, axis=-1)
    step = min_step + (1.0 - kp3 * min_step) * step
    c = jnp.cumsum(step, axis=-1)

    # knot values v_j = (c_j + 4 c_{j+1} + c_{j+2}) / 6, j = 0..K
    v = (c[..., 0:k + 1] + 4.0 * c[..., 1:k + 2] + c[..., 2:k + 3]) / 6.0
    v0, vk = v[..., 0], v[..., -1]
    scale = vk - v0

    def eval_bin(i, t):
        """Spline value and d/dx at local parameter t of bin i (both in
        NORMALIZED output coordinates)."""
        # One-hot contraction instead of take_along_axis — per-element lane
        # gathers (and their scatter-add VJPs) are pathologically slow on
        # TPU; see the note in rational_quadratic_spline.
        oh = jax.nn.one_hot(i, k, dtype=c.dtype)
        c0 = jnp.sum(c[..., 0:k] * oh, axis=-1)
        c1 = jnp.sum(c[..., 1:k + 1] * oh, axis=-1)
        c2 = jnp.sum(c[..., 2:k + 2] * oh, axis=-1)
        c3 = jnp.sum(c[..., 3:k + 3] * oh, axis=-1)
        omt = 1.0 - t
        f = (c0 * omt ** 3 + c1 * (3 * t ** 3 - 6 * t ** 2 + 4)
             + c2 * (-3 * t ** 3 + 3 * t ** 2 + 3 * t + 1) + c3 * t ** 3) / 6.0
        # d f / d t = quadratic B-spline in the increments (>= 0 => monotone)
        dfdt = ((c1 - c0) * omt ** 2 + (c2 - c1) * (-2 * t ** 2 + 2 * t + 1)
                + (c3 - c2) * t ** 2) / 2.0
        return (f - v0) / scale, k * dfdt / scale

    if not inverse:
        u = jnp.clip(x, 0.0, 1.0) * k
        i = jnp.clip(jnp.floor(u), 0, k - 1).astype(jnp.int32)
        t = u - i
        y, dydx = eval_bin(i, t)
        return y, jnp.log(jnp.maximum(dydx, 1e-12))

    # inverse: locate bin by the (normalized, increasing) knot values,
    # then fixed-count bisection + Newton polish on the local cubic.
    y = jnp.clip(x, 0.0, 1.0)
    vn = (v - v0[..., None]) / scale[..., None]
    i = jnp.clip(jnp.sum((y[..., None] >= vn).astype(jnp.int32), axis=-1) - 1,
                 0, k - 1)

    def bisect_body(_, tt):
        lo, hi = tt
        mid = 0.5 * (lo + hi)
        f, _ = eval_bin(i, mid)
        below = f < y
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, 20, bisect_body, (jnp.zeros_like(y), jnp.ones_like(y)))
    t = 0.5 * (lo + hi)

    def newton_step(_, t):
        # dy/dt (local) = dy/dx / k
        f, dydx = eval_bin(i, t)
        return jnp.clip(t - (f - y) * k / jnp.maximum(dydx, 1e-9), 0.0, 1.0)

    t = jax.lax.fori_loop(0, 5, newton_step, t)
    out = (i + t) / k
    _, dydx = eval_bin(i, t)
    return out, -jnp.log(jnp.maximum(dydx, 1e-12))


# ---------------------------------------------------------------------------
# Conditional B-spline transformer
# ---------------------------------------------------------------------------

class ConditionalBSplineTransformer:
    """Per-input-conditioned monotone cubic B-spline bijection.

    Real equivalent of the reference's ``ConditionalBSplineTransformer``
    (``inf/layers/splines/bspline.py:20-190``): a conditioner network maps
    the context to spline parameters that transform ``y`` elementwise,
    ``[left, right) -> [bottom, top)``. Functional-style: the caller owns
    the network and passes its OUTPUT (`net_out`, last dim
    ``y_dim * (n_bins + 3)``) — the analogue of the reference's
    ``params_net`` module attribute (``bspline.py:69, 120-127``). The
    reference's circular-boundary option is out of scope (never used by
    any experiment; its only in-experiment construction,
    ``if_glow_mnist.py:44``, passes an int where a module is required and
    cannot run).
    """

    def __init__(self, y_dim, n_bins=8, left=0.0, right=1.0,
                 bottom=0.0, top=1.0):
        self.y_dim = y_dim
        self.n_bins = n_bins
        self.left, self.right = left, right
        self.bottom, self.top = bottom, top

    @property
    def params_per_dim(self):
        return self.n_bins + 3

    def _coeffs(self, net_out):
        shape = net_out.shape[:-1] + (self.y_dim, self.params_per_dim)
        return net_out.reshape(shape)

    def _apply(self, net_out, y, inverse):
        lo, hi = (self.bottom, self.top) if inverse else (self.left,
                                                          self.right)
        out_lo, out_hi = (self.left, self.right) if inverse else (
            self.bottom, self.top)
        u = (y - lo) / (hi - lo)
        out, ld = monotone_cubic_b_spline(u, self._coeffs(net_out),
                                          inverse=inverse)
        z = out * (out_hi - out_lo) + out_lo
        ld = ld + math.log((out_hi - out_lo) / (hi - lo))
        return z, ld

    def forward(self, net_out, y):
        """(z, elementwise ldj) — ``bspline.py:129-143`` semantics."""
        return self._apply(net_out, y, inverse=False)

    def inverse(self, net_out, z):
        """Inverse transform; returns (y, elementwise ldj of the inverse)."""
        return self._apply(net_out, z, inverse=True)

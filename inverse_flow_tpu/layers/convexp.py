"""Convolution exponential: z = exp(M) x via truncated series.

Reference parity: ``inf/layers/convexp/convexp_module.py:9-81`` (ConvExp:
1x1 mix then matrix-exponential of a spectrally-normalized conv; 6 series
terms in training, 13 in eval), ``functional.py:41-84`` (series + trace
logdet), ``spectral.py:5-163`` (power-iteration spectral normalization,
implemented in the reference as a mutating forward-pre-hook with persistent
u/v buffers).

TPU-native: spectral normalization is an explicit, stateless parameter
transform — a fixed number of power iterations from the persistent ``u``
vector carried in the params pytree (updated functionally each forward,
under ``stop_gradient`` exactly like the reference's ``torch.no_grad``).
The series itself is a chain of convs, fully fused by XLA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.convs import conv2d, conv2d_input_grad
from .base import FlowLayer, zeros_ldj
from .conv1x1 import Conv1x1, Conv1x1Householder


def conv_exp(x, kernel, terms):
    """exp(conv) series: result = sum_k conv^k(x) / k!
    (``functional.py:41-66``)."""
    pad = ((kernel.shape[2] - 1) // 2, (kernel.shape[3] - 1) // 2)
    result = x
    product = x
    for i in range(1, terms + 1):
        product = conv2d(product, kernel, padding=pad) / i
        result = result + product
    return result


def conv_exp_logdet(kernel, h, w):
    """tr(M) * 1 for the exponential: ldj = H*W*sum(diag center)
    (``functional.py:73-84``)."""
    c = kernel.shape[0]
    m1 = (kernel.shape[2] - 1) // 2
    m2 = (kernel.shape[3] - 1) // 2
    diag = kernel[jnp.arange(c), jnp.arange(c), m1, m2]
    return jnp.sum(diag) * h * w


def spectral_normalize(kernel, u, input_dim, coeff, n_iter=1, eps=1e-12):
    """One (or more) power iterations; returns
    (kernel/max(1,sigma/coeff), u', sigma).

    Mirrors ``spectral.py:68-105``: v = normalize(conv_T(u)),
    u = normalize(conv(v)), sigma = <u, conv(v)>; rescale only when above
    the coefficient (constraint, not strict normalization).
    """
    c, h, w = input_dim
    pad = ((kernel.shape[2] - 1) // 2, (kernel.shape[3] - 1) // 2)

    def norm(v):
        return v / (jnp.linalg.norm(v) + eps)

    k_sg = jax.lax.stop_gradient(kernel)
    v = None
    for _ in range(n_iter):
        v_s = conv2d_input_grad(u.reshape(1, c, h, w), k_sg,
                                (1, c, h, w), padding=pad)
        v = norm(v_s.reshape(-1))
        u_s = conv2d(v.reshape(1, c, h, w), k_sg, padding=pad)
        u = norm(u_s.reshape(-1))
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    wv = conv2d(v.reshape(1, c, h, w), kernel, padding=pad).reshape(-1)
    sigma = jnp.dot(u, wv)
    factor = jnp.maximum(1.0, sigma / coeff)
    return kernel / (factor + 1e-5), u, sigma


@dataclass(frozen=True)
class ConvExp(FlowLayer):
    input_size: Tuple[int, int, int]
    coeff: float = 0.9
    n_terms_train: int = 6

    @property
    def n_terms_eval(self):
        return self.n_terms_train * 2 + 1

    @property
    def conv1x1(self):
        c = self.input_size[0]
        return (Conv1x1(c) if c <= 64 else Conv1x1Householder(c, 64))

    def init(self, rng, shape):
        c = self.input_size[0]
        k1, k2, k3 = jax.random.split(rng, 3)
        kernel = jax.random.normal(k1, (c, c, 3, 3), jnp.float32) / (c * 9)
        p1x1, _ = self.conv1x1.init(k2, shape)
        dim = int(jnp.prod(jnp.asarray(self.input_size)))
        u = jax.random.normal(k3, (dim,), jnp.float32)
        u = u / jnp.linalg.norm(u)
        params = {
            "kernel": kernel,
            "pre_bias": jnp.zeros((1,) + tuple(self.input_size), jnp.float32),
            "post_bias": jnp.zeros((1,) + tuple(self.input_size), jnp.float32),
            "conv1x1": p1x1,
            "u": u,
        }
        return params, shape

    def _kernel(self, params):
        return spectral_normalize(params["kernel"], params["u"],
                                  self.input_size, self.coeff)[0]

    def sigma_estimate(self, params):
        """Current spectral-norm estimate from the carried u (one
        refinement iteration, like the reference's ``compute_weight``)."""
        return spectral_normalize(params["kernel"], params["u"],
                                  self.input_size, self.coeff)[2]

    def _series_forward(self, params, x, terms):
        h, w = x.shape[2], x.shape[3]
        kernel = self._kernel(params)
        x = x + params["pre_bias"]
        x, ldj = self.conv1x1.forward(params["conv1x1"], x)
        z = conv_exp(x, kernel, terms)
        ldj = ldj + conv_exp_logdet(kernel, h, w)
        z = z + params["post_bias"]
        return z, ldj

    def forward(self, params, x, rng=None):
        return self._series_forward(params, x, self.n_terms_train)

    def exact_forward(self, params, x):
        """Eval-mode series: 13 terms instead of 6 (the reference switches
        on ``self.training``, ``convexp_module.py:46-47``). The ldj (trace
        formula) is identical; only the value tail differs, bounded by
        coeff^(t+1)/(t+1)! ~ 1e-4 at coeff=0.9 — so the amortized
        cheap-pass eval stays a valid approximation while explicit
        ``exact=True`` flows get the reference's eval-mode values."""
        return self._series_forward(params, x, self.n_terms_eval)

    def inverse(self, params, z, rng=None):
        kernel = self._kernel(params)
        z = z - params["post_bias"]
        x = conv_exp(z, -kernel, self.n_terms_eval)
        x = self.conv1x1.inverse(params["conv1x1"], x)
        return x - params["pre_bias"]

    def data_init(self, params, x):
        """Refresh the power-iteration vector u from real activations'
        shapes (functional replacement for the buffer warm-up)."""
        _, u, _ = spectral_normalize(params["kernel"], params["u"],
                                     self.input_size, self.coeff,
                                     n_iter=10)
        out = dict(params)
        out["u"] = u
        return out

    # -- persistent power-iteration state (spectral.py:208-244: the
    # reference carries u across steps via a forward-pre-hook buffer) -----
    has_carry = True

    def update_carry(self, params):
        """One power iteration from the carried u against the CURRENT
        kernel, so sigma tracks the weights as they drift over training."""
        _, u, _ = spectral_normalize(params["kernel"], params["u"],
                                     self.input_size, self.coeff)
        out = dict(params)
        out["u"] = u
        return out

    def carry_mask(self, params):
        mask = jax.tree_util.tree_map(lambda _: False, params)
        mask["u"] = True
        return mask

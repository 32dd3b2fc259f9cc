"""Base distributions for the flow (priors and dequantization noise).

Reference parity: ``inf/train/losses.py:21-49`` (NegativeGaussianLoss — a
standard MVN with identity covariance, used as the base distribution
everywhere) and ``inf/layers/distributions/{gaussian,uniform}.py``. The
reference hardcodes ``device='cuda'`` (``gaussian.py:15-16``); here
distributions are device-free pure functions.

A standard multivariate normal with identity covariance factorizes, so
``log N(x; 0, I) = -0.5 * (x^2 + log 2pi)`` summed over dims — identical to
the reference's ``MultivariateNormal(zeros, eye)`` but O(D) instead of O(D^2).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


@dataclass(frozen=True)
class GaussianPrior:
    """Standard normal prior over tensors of shape ``size`` (no batch dim).

    Mirrors ``NegativeGaussianLoss`` (``losses.py:21-49``): ``log_prob``
    returns per-sample log density of shape (B,); ``sample`` draws
    ``n`` samples and their log-probs.
    """

    size: Tuple[int, ...]

    @property
    def dim(self) -> int:
        d = 1
        for s in self.size:
            d *= int(s)
        return d

    def log_prob(self, x):
        x = x.reshape(x.shape[0], -1)
        return -0.5 * jnp.sum(x * x + _LOG_2PI, axis=-1)

    def sample(self, rng, n):
        x = jax.random.normal(rng, (n,) + tuple(self.size), dtype=jnp.float32)
        return x, self.log_prob(x)

    def nll(self, x):
        """Negative log-likelihood summed over the batch (loss form)."""
        return -jnp.sum(self.log_prob(x))


@dataclass(frozen=True)
class UniformDistribution:
    """Uniform on [0,1]^d with -1e30 log-density outside the support.

    Mirrors ``inf/layers/distributions/uniform.py:19-37``. Used as the
    dequantization-noise distribution: density is 1 on the support, so the
    sample log-prob is 0.
    """

    size: Tuple[int, ...]

    def log_prob(self, x):
        inside = jnp.logical_and(x >= 0.0, x <= 1.0)
        log_px = jnp.where(inside, 0.0, -1e30)
        return jnp.sum(log_px.reshape(x.shape[0], -1), axis=-1)

    def sample(self, rng, n):
        x = jax.random.uniform(rng, (n,) + tuple(self.size), dtype=jnp.float32)
        return x, jnp.zeros((n,), dtype=jnp.float32)


@dataclass(frozen=True)
class LaplacePrior:
    """Centered Laplace with std=1, constant terms ignored.

    Mirrors ``NegativeLogLaplaceLoss`` (``losses.py:7-13``):
    ``-log p = sqrt(2)*|x|`` up to constants.
    """

    size: Tuple[int, ...]

    def log_prob(self, x):
        x = x.reshape(x.shape[0], -1)
        return -math.sqrt(2.0) * jnp.sum(jnp.abs(x), axis=-1)

    def sample(self, rng, n):
        x = jax.random.laplace(rng, (n,) + tuple(self.size), dtype=jnp.float32)
        x = x / math.sqrt(2.0)
        return x, self.log_prob(x)


class DiagonalGaussianPrior:
    """Diagonal Gaussian with (mean, log_std) vectors.

    Covers the reference's ``DiagonalGaussian`` (``inf/train/losses.py:
    126-145``) and ``NegativeGaussianLoss_test`` (``:51-120``), including
    the latter's defensive input handling: NaN/inf scrub then clip to
    [-10, 10] before evaluating the log-density. ``LogGaussian``
    (``losses.py:121-125``) is the positive-sign view — use ``log_prob``;
    ``nll`` is the negative one.
    """

    def __init__(self, size, mean=None, log_std=None, clean_inputs=True,
                 clip=10.0):
        self.size = tuple(size) if hasattr(size, "__len__") else (int(size),)
        self.dim = int(math.prod(self.size))
        self.mean = jnp.zeros(self.dim) if mean is None else jnp.ravel(mean)
        self.log_std = (jnp.zeros(self.dim) if log_std is None
                        else jnp.ravel(log_std))
        self.clean_inputs = clean_inputs
        self.clip = clip

    def _flat(self, x):
        x = x.reshape(x.shape[0], self.dim)
        if self.clean_inputs:
            x = jnp.nan_to_num(x, nan=0.0, posinf=1e10, neginf=-1e10)
            x = jnp.clip(x, -self.clip, self.clip)
        return x

    def log_prob(self, x):
        z = (self._flat(x) - self.mean) * jnp.exp(-self.log_std)
        per = -0.5 * z ** 2 - self.log_std - 0.5 * _LOG_2PI
        return jnp.sum(per, axis=-1)

    def nll(self, x):
        """Negative log-likelihood summed over the batch (loss form) —
        the same convention as :class:`GaussianPrior`, so the two priors
        are drop-in interchangeable in loss code."""
        return -jnp.sum(self.log_prob(x))

    def sample(self, rng, n):
        eps = jax.random.normal(rng, (n, self.dim))
        x = (self.mean + eps * jnp.exp(self.log_std)).reshape(
            (n,) + self.size)
        # log-prob of the RETURNED sample, computed from eps directly:
        # routing through log_prob would clean/clip x first and report a
        # density for a different point whenever mass sits beyond `clip`
        per = -0.5 * eps ** 2 - self.log_std - 0.5 * _LOG_2PI
        return x, jnp.sum(per, axis=-1)

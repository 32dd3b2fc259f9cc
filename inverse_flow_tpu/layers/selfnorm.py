"""Self-normalizing convolutions with the modified gradient.

Reference parity: ``inf/layers/selfnorm.py:39-334``. The layer keeps twin
kernels (forward ``W``, approximate-inverse ``R``); the cheap-path backward
substitutes the *self-normalizing gradient* (``SelfNormConvFunc.backward``,
``selfnorm.py:52-90``):

    grad_W = (dz*x^T - flip(R) * multiple) / 2
    grad_R = (-dx*(Wx)^T + flip(W) * flip(multiple)) / 2

where ``flip`` is spatial-flip + in/out channel transpose and ``multiple``
is the per-tap contribution count (wgrad of ones / batch,
``selfnorm.py:24-32``). The reference binds cuDNN's backward-weight/input
through a C++ extension (``conv2d_backward.cpp``); on TPU both are plain
``lax.conv_general_dilated`` calls (see ``ops/convs.py``), so the whole
modified gradient is a ``jax.custom_vjp`` with no native code.

The expensive path computes the exact logdet via the dense conv operator
(``selfnorm.py:231-246``) and the exact inverse via dense solve
(``:175-180``). The layer-local reconstruction loss ``||x - RWx||^2``
(+ symmetric variant, ``:187-229``) feeds the trainer's recon-grad pass.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.convs import conv2d, conv2d_input_grad, conv2d_weight_grad
from ..ops.toeplitz import conv_exact_inverse, conv_logdet
from .base import FlowLayer, sum_except_batch, zeros_ldj


def flip_kernel(w):
    """Spatial flip + channel transpose (``selfnorm.py:35-36``)."""
    return jnp.transpose(jnp.flip(w, (2, 3)), (1, 0, 2, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def selfnorm_conv2d(x, w, bw, r, stride, padding):
    """Forward conv whose backward is the self-normalizing gradient."""
    z = conv2d(x, w, stride=stride, padding=padding)
    if bw is not None:
        z = z + bw.reshape(1, -1, 1, 1)
    return z


def _sn_fwd(x, w, bw, r, stride, padding):
    z = selfnorm_conv2d(x, w, bw, r, stride, padding)
    return z, (x, w, bw, r, z)


def _sn_bwd(stride, padding, res, g):
    x, w, bw, r, z = res
    b = x.shape[0]

    # per-tap contribution count / batch (selfnorm.py:24-32)
    multiple = conv2d_weight_grad(jnp.ones_like(z), jnp.ones_like(x),
                                  w.shape, stride, padding) / b

    # Grad_W logP(x) (selfnorm.py:67-70)
    delta_z_xt = conv2d_weight_grad(g, x, w.shape, stride, padding)
    grad_w = (delta_z_xt - flip_kernel(r) * multiple) / 2.0

    # standard input grad (selfnorm.py:73-76)
    grad_x = conv2d_input_grad(g, w, x.shape, stride, padding)

    # Grad_R logP(x) (selfnorm.py:77-82)
    wx = z - bw.reshape(1, -1, 1, 1) if bw is not None else z
    neg_dx_wxt = conv2d_weight_grad(-grad_x, wx, r.shape, stride, padding)
    grad_r = (neg_dx_wxt + flip_kernel(w) * flip_kernel(multiple)) / 2.0

    grad_b = jnp.sum(g, axis=(0, 2, 3)) if bw is not None else None
    return grad_x, grad_w, grad_b, grad_r


selfnorm_conv2d.defvjp(_sn_fwd, _sn_bwd)


def _xavier_std(w_shape, gain=0.01):
    c_out, c_in, kh, kw = w_shape
    fan_in = c_in * kh * kw
    fan_out = c_out * kh * kw
    return gain * (2.0 / (fan_in + fan_out)) ** 0.5


def _dirac_noise_init(rng, w_shape, gain=0.01):
    """dirac + xavier noise for spatial kernels (``selfnorm.py:135-145``,
    else-branch): identity added at the spatial center of the square
    channel block."""
    c_out, c_in, kh, kw = w_shape
    w = _xavier_std(w_shape, gain) * jax.random.normal(
        rng, w_shape, jnp.float32)
    sq = min(c_out, c_in)
    eye = jnp.eye(sq, dtype=jnp.float32)
    return w.at[:sq, :sq, kh // 2, kw // 2].add(eye)


def _orthogonal_1x1_init(rng, w_shape):
    """Random-orthogonal init for 1x1 kernels (``selfnorm.py:139-143``):
    Q from the reduced QR of a Gaussian (c_out, c_in) matrix, so the SNF
    layer playing Glow's invertible-1x1 role starts as a random rotation
    rather than ~identity. Requires c_out >= c_in (reduced Q is
    (c_out, c_out) otherwise — the reference's ``.view`` would fail the
    same way)."""
    c_out, c_in = w_shape[:2]
    a = jax.random.normal(rng, (c_out, c_in), jnp.float32)
    q = jnp.linalg.qr(a)[0]
    return q.reshape(w_shape).astype(jnp.float32)


@dataclass(frozen=True)
class SelfNormConv(FlowLayer):
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)
    bias: bool = True
    stride: int = 1
    padding: int = 0

    has_modified_grad = True
    has_recon_loss = True

    def init(self, rng, shape):
        k1, k2 = jax.random.split(rng)
        w_shape = (self.out_channels, self.in_channels, *self.kernel_size)
        if (self.kernel_size == (1, 1)
                and self.out_channels >= self.in_channels):
            # 1x1 branch: random orthogonal (selfnorm.py:139-143)
            w = _orthogonal_1x1_init(k1, w_shape)
        else:
            w = _dirac_noise_init(k1, w_shape)
        params = {"w": w, "r": flip_kernel(w)}
        if self.bias:
            params["b"] = _xavier_std(w_shape) * jax.random.normal(
                k2, (self.out_channels,), jnp.float32)
        if len(shape) == 3:
            c, h, w_ = shape
            oh = (h + 2 * self.padding - self.kernel_size[0]) // self.stride + 1
            ow = (w_ + 2 * self.padding - self.kernel_size[1]) // self.stride + 1
            out_shape = (self.out_channels, oh, ow)
        else:
            out_shape = shape
        return params, out_shape

    # -- cheap path: modified gradient, ldj contribution 0 (selfnorm.py:168)
    def forward(self, params, x, rng=None):
        z = selfnorm_conv2d(x, params["w"], params.get("b"), params["r"],
                            self.stride, self.padding)
        return z, zeros_ldj(x)

    def inverse(self, params, z, rng=None):
        if "b" in params:
            z = z - params["b"].reshape(1, -1, 1, 1)
        return conv2d(z, params["r"], stride=self.stride,
                      padding=self.padding)

    # -- exact paths (selfnorm.py:160-163, 175-180, 240-246)
    def exact_forward(self, params, x):
        z = conv2d(x, params["w"], stride=self.stride, padding=self.padding)
        if "b" in params:
            z = z + params["b"].reshape(1, -1, 1, 1)
        ld = conv_logdet(params["w"], x.shape[1:], self.stride, self.padding)
        return z, jnp.broadcast_to(ld, (x.shape[0],)).astype(jnp.float32)

    def exact_inverse(self, params, z):
        if self.stride != 1:
            raise NotImplementedError(
                "SelfNormConv.exact_inverse supports stride=1 only: a "
                "strided conv's dense operator is not square, so the "
                "dense solve (selfnorm.py:175-180) has no inverse to "
                "compute. Use the approximate inverse() instead.")
        if "b" in params:
            z = z - params["b"].reshape(1, -1, 1, 1)
        kh, kw = self.kernel_size
        # stride-1 output->input spatial map: h = oh + kh - 1 - 2*pad
        # (covers same-shape 3x3/pad1, valid 3x3/pad0, and 1x1/pad0)
        in_shape = (self.in_channels,
                    z.shape[2] + kh - 1 - 2 * self.padding,
                    z.shape[3] + kw - 1 - 2 * self.padding)
        return conv_exact_inverse(z, params["w"], in_shape, 1,
                                  self.padding)

    def exact_ldj_correction(self, params, in_shape):
        """Cheap-path ldj is 0, so the correction IS the exact logdet."""
        return conv_logdet(params["w"], tuple(in_shape), self.stride,
                           self.padding).astype(jnp.float32)

    # -- layer-local reconstruction loss (selfnorm.py:187-206)
    def recon_loss(self, params, x, sym=False, only_R=False):
        w, r = params["w"], params["r"]
        z = conv2d(x, w, stride=self.stride, padding=self.padding)
        if only_R:
            z = jax.lax.stop_gradient(z)
        x_hat = conv2d(z, r, stride=self.stride, padding=self.padding)
        loss = sum_except_batch((x - x_hat) ** 2)
        if sym:
            zsym = jax.lax.stop_gradient(z)
            xsym = conv2d(z, r, stride=self.stride, padding=self.padding)
            z_hat = conv2d(xsym, w, stride=self.stride, padding=self.padding)
            loss = (loss + sum_except_batch((zsym - z_hat) ** 2)) / 2.0
        return loss


@dataclass(frozen=True)
class SelfNormFC(SelfNormConv):
    """1x1-conv view over flat inputs (``selfnorm.py:280-334``)."""

    kernel_size: Tuple[int, int] = (1, 1)

    def init(self, rng, shape):
        """FC init (``selfnorm.py:285-302``) differs from the conv 1x1
        branch: the square channel block is SET to the exact identity
        inside xavier noise (no QR, no noise added on the diagonal)."""
        k1, k2 = jax.random.split(rng)
        w_shape = (self.out_channels, self.in_channels, 1, 1)
        w = _xavier_std(w_shape) * jax.random.normal(
            k1, w_shape, jnp.float32)
        sq = min(self.out_channels, self.in_channels)
        w = w.at[:sq, :sq, 0, 0].set(jnp.eye(sq, dtype=jnp.float32))
        params = {"w": w, "r": flip_kernel(w)}
        if self.bias:
            params["b"] = _xavier_std(w_shape) * jax.random.normal(
                k2, (self.out_channels,), jnp.float32)
        return params, (self.out_channels,)

    def _to4d(self, x, c):
        return x.reshape(-1, c, 1, 1)

    def forward(self, params, x, rng=None):
        z, ldj = super().forward(params, self._to4d(x, self.in_channels),
                                 rng=rng)
        return z.reshape(-1, self.out_channels), ldj

    def inverse(self, params, z, rng=None):
        x = super().inverse(params, self._to4d(z, self.out_channels), rng=rng)
        return x.reshape(-1, self.in_channels)

    def exact_forward(self, params, x):
        x4 = self._to4d(x, self.in_channels)
        z = conv2d(x4, params["w"])
        if "b" in params:
            z = z + params["b"].reshape(1, -1, 1, 1)
        if self.in_channels == self.out_channels:
            ld = jnp.linalg.slogdet(params["w"][:, :, 0, 0])[1]
        else:
            ld = jnp.zeros(())
        return (z.reshape(-1, self.out_channels),
                jnp.broadcast_to(ld, (x.shape[0],)).astype(jnp.float32))

    def exact_inverse(self, params, z):
        z4 = self._to4d(z, self.out_channels)
        if "b" in params:
            z4 = z4 - params["b"].reshape(1, -1, 1, 1)
        w_inv = jnp.linalg.inv(params["w"][:, :, 0, 0])
        x = jnp.einsum("oc,bchw->bohw", w_inv, z4,
                       precision=jax.lax.Precision.HIGHEST)
        return x.reshape(-1, self.in_channels)

    def recon_loss(self, params, x, sym=False, only_R=False):
        return super().recon_loss(params, self._to4d(x, self.in_channels),
                                  sym=sym, only_R=only_R)

    def exact_ldj_correction(self, params, in_shape):
        del in_shape
        if self.in_channels == self.out_channels:
            return jnp.linalg.slogdet(
                params["w"][:, :, 0, 0])[1].astype(jnp.float32)
        return jnp.zeros((), jnp.float32)

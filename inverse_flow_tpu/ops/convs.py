"""Convolution primitives in NCHW/OIHW layout on top of XLA.

These are the TPU-native replacements for the reference's cuDNN calls
(``F.conv2d`` throughout ``inf/layers/``) and for the
``conv2d_backward.backward_weight/backward_input`` C++ extension
(``inf/utils/convbackward/conv2d_backward.cpp:7-54``): on TPU both the
forward conv and its weight/input gradients are single
``lax.conv_general_dilated`` calls that XLA lowers onto the MXU — no native
extension is needed.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

_DN = ("NCHW", "OIHW", "NCHW")


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v), int(v))


def conv2d(x, w, stride=1, padding=0, dilation=1, groups=1,
           preferred_dtype=jnp.float32):
    """``F.conv2d`` equivalent: x (B,Cin,H,W), w (Cout,Cin/groups,KH,KW)."""
    stride = _pair(stride)
    dilation = _pair(dilation)
    if isinstance(padding, str):
        pad = padding
    else:
        ph, pw = _pair(padding)
        pad = ((ph, ph), (pw, pw))
    return lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=preferred_dtype,
    )


def conv2d_pad_lrtb(x, w, pad_lrtb: Tuple[int, int, int, int], groups=1):
    """Conv with explicit asymmetric (left, right, top, bottom) padding.

    Matches the reference's ``F.pad(x, (l, r, t, b))`` + valid conv pattern
    (``inf/layers/conv.py:103-106``).
    """
    left, right, top, bottom = pad_lrtb
    return lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((top, bottom), (left, right)),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def conv2d_input_grad(g, w, x_shape, stride=1, padding=0, dilation=1,
                      groups=1):
    """Gradient of conv2d w.r.t. its input (cf. ``backward_input``,
    ``conv2d_backward.cpp:33-54``): a transposed convolution."""
    stride = _pair(stride)
    padding = _pair(padding)
    dilation = _pair(dilation)
    kh, kw = w.shape[2], w.shape[3]
    # Effective kernel extent with dilation.
    ekh = (kh - 1) * dilation[0] + 1
    ekw = (kw - 1) * dilation[1] + 1
    pad_h = ekh - 1 - padding[0]
    pad_w = ekw - 1 - padding[1]
    # Remainders so output size matches x_shape exactly.
    out_h = (x_shape[2] + 2 * padding[0] - ekh) // stride[0] + 1
    out_w = (x_shape[3] + 2 * padding[1] - ekw) // stride[1] + 1
    rem_h = x_shape[2] + 2 * padding[0] - ekh - (out_h - 1) * stride[0]
    rem_w = x_shape[3] + 2 * padding[1] - ekw - (out_w - 1) * stride[1]
    # flip spatial, swap in/out channels (respecting groups)
    wt = jnp.flip(w, axis=(2, 3))
    cout, cin_g = w.shape[0], w.shape[1]
    wt = wt.reshape(groups, cout // groups, cin_g, kh, kw)
    wt = jnp.transpose(wt, (0, 2, 1, 3, 4)).reshape(groups * cin_g,
                                                    cout // groups, kh, kw)
    return lax.conv_general_dilated(
        g, wt,
        window_strides=(1, 1),
        padding=((pad_h, pad_h + rem_h), (pad_w, pad_w + rem_w)),
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def conv2d_weight_grad(g, x, w_shape, stride=1, padding=0, dilation=1,
                       groups=1):
    """Gradient of conv2d w.r.t. its weight (cf. ``backward_weight``,
    ``conv2d_backward.cpp:7-31``): a correlation of input with cotangent.

    g: (B, Cout, OH, OW); x: (B, Cin, H, W); returns (Cout, Cin/g, KH, KW).
    """
    stride = _pair(stride)
    padding = _pair(padding)
    dilation = _pair(dilation)
    if groups != 1:
        # Split into per-group standard weight grads.
        gs = jnp.split(g, groups, axis=1)
        xs = jnp.split(x, groups, axis=1)
        parts = [
            conv2d_weight_grad(gi, xi, (w_shape[0] // groups,) + w_shape[1:],
                               stride, padding, dilation, 1)
            for gi, xi in zip(gs, xs)
        ]
        return jnp.concatenate(parts, axis=0)

    # Treat batch as contraction: lhs = x (Cin as batch), rhs = g.
    # x: (B, Cin, H, W) -> (Cin, B, H, W); g: (B, Cout, OH, OW) used as kernel
    # (Cout, B, OH, OW) is wrong ordering for OIHW; use dim numbers directly.
    out = lax.conv_general_dilated(
        jnp.transpose(x, (1, 0, 2, 3)),           # (Cin, B, H, W)
        jnp.transpose(g, (1, 0, 2, 3)),           # (Cout, B, OH, OW)
        window_strides=dilation,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        rhs_dilation=stride,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )  # (Cin, Cout, KH', KW')
    kh, kw = w_shape[2], w_shape[3]
    out = out[:, :, :kh, :kw]
    return jnp.transpose(out, (1, 0, 2, 3))

"""Inverse of a masked convolution — the paper's core op, TPU-native.

This replaces the reference CUDA wavefront kernels
(``inf/utils/inv_conv_cuda/inv_conv_with_bp_kernel_general.cu``):

  * ``inverse`` (:12-129)  -> :func:`inv_conv_solve` (training forward)
  * ``forward`` (:141-264) -> :func:`masked_conv_apply` (sampling/reverse)
  * ``dy``      (:272-483) -> transposed solve inside the custom VJP
  * ``dw``      (:496-735) -> one conv weight-gradient inside the custom VJP

Design (TPU-first, not a translation)
-------------------------------------
The reference marches anti-diagonals with one kernel launch +
``cudaDeviceSynchronize`` per (diagonal, channel-group) — ~(H+W)*C/4 launches
per op. Anti-diagonals are hostile to the TPU's (8,128) tiling. Instead we
note that in raster order the conv operator ``T`` is block-banded lower
triangular, and solve it **row-blocked**:

  1. Build from the kernel, once per call, dense per-row matrices:
     ``M0``  (CW x CW): within-row dependence (kernel row KH-1),
     ``B_r`` (CW x CW): dependence on row h-r (kernel row KH-1-r).
  2. Invert the R-row block operator structurally (block-Toeplitz
     recurrence from ``M0^{-1}``, itself an exact Newton-Schulz iteration —
     everything is MXU matmuls, no LU anywhere) and fold it in:
     ``c = x @ T_blk^{-T}`` for ALL blocks in one large MXU matmul.
  3. Scan over ceil(H/R) row-blocks: ``y_b = c_b - tail_{b-1} @ G^T`` —
     each step ONE dense (B, (KH-1)*CW) @ ((KH-1)*CW, R*CW) matmul.

Sequential depth is ceil(H/R) (vs (H+W-1)*C/4 host-synced launches), every step
is MXU-dense. The same machinery solves the transposed system for the input
gradient, so the backward pass needs no impulse-response correlation
(``dy`` kernel2's O(H^2 W^2) loop) and no 6-D sensitivity tensor (``dw``
kernel1, reference ``inv_conv.py:70`` — 9x activation memory for 3x3).

Math of the VJP (y = T(W)^{-1} x):
  dL/dx = T^{-T} g   — solve on the spatially-flipped cotangent with the
                        channel-transposed kernel (upper-tri becomes
                        lower-tri in flipped coordinates).
  dL/dW = -wgrad(y, dL/dx) — since dy = -T^{-1} dT y, the weight cotangent
                        is minus the standard conv weight-gradient evaluated
                        at (input=y, cotangent=dL/dx).

Masking convention (canonical TL orientation) follows ``PaddedConv2d``
(``inf/layers/conv.py:64-97``): center tap ``W[c, c, -1, -1] = 1`` and
``W[c, c'>c, -1, -1] = 0`` — the Jacobian is unit lower triangular, so the
layer is exactly volume preserving (ldj = 0). The reference's
init-vs-mask disagreement (``inv_conv.py:170`` vs ``:233-248``) is resolved
by applying the mask *inside* the op, which also makes gradient masking
automatic (no ``reset_gradients`` / ``clear_grad`` hack,
``experiment.py:15-21``).

The 4 pad orders TL/TR/BL/BR are handled by spatial flips exactly as the
reference does (``inv_conv.py:198-220``); ``groups`` generalizes the CUDA
kernels' hard-coded 4-way channel grouping (``order_stride = C/4``,
``inv_conv_with_bp_kernel_general.cu:96``) to any divisor of C.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST

# MXU pass count for the SOLVE path (operator construction + block
# solves): 'highest' = bf16x6 f32 emulation, 'high' = bf16x3 (~f32
# accuracy: max elementwise product error ~2^-24, indistinguishable
# from native f32 FMA at these operator sizes), 'default' = one bf16
# pass (NOT safe for invertibility round-trips). The fresh
# imagenet32_exact profile (results/step_profile_imagenet32_exact_
# detail.md, post-wgrad-fix) shows 65% of the step inside the solve's
# einsums and Newton-Schulz operator builds, all previously pinned at
# HIGHEST; the c_all block einsum alone measures ~94% of the bf16x6
# ceiling, so pass count is the binding constraint. Slope A/B verdict
# (results/true_step_time.jsonl, imagenet32_exact b100, in-process
# interleaved): highest 70.11 -> high 56.58 ms/step (1.239x, 4/4
# pairs), so 'high' is the default; 'highest' remains for oracle runs.
SOLVE_PRECISION = "high"


def _sp():
    return {"highest": lax.Precision.HIGHEST,
            "high": lax.Precision.HIGH,
            "default": lax.Precision.DEFAULT}[SOLVE_PRECISION]

# Implementation note (round-1 -> round-2 history): a per-layer Pallas
# kernel for the block scan alone was measured LOSING to the XLA scan at
# every shape (full Glow-MNIST train step 184 ms vs 0.73 ms; 3.34 vs
# 1.77 ms standalone at nb=171) — per-call overhead swamped the tiny
# per-layer recurrence, so it was retired. The surviving Pallas path is
# ``ops/fused_chain.py``: a whole multi-order chain (e.g. an InvFlowUnit)
# in ONE kernel with the ``c = x @ T^{-T}`` projection fused in, which
# amortizes the call and wins on-chip (see BASELINE.md "Fused chain vs
# XLA" table). This module is the XLA solve + VJP that both paths share.


# ---------------------------------------------------------------------------
# Masking
# ---------------------------------------------------------------------------

def center_mask(c_out: int, c_in: int, kh: int, kw: int):
    """Mask that zeroes the center tap's diagonal + upper triangle.

    Canonical TL orientation (``conv.py:82-97`` without order flips).
    Returns (mask, center_eye): ``w_eff = w * mask + center_eye`` has
    ``w_eff[c, c, -1, -1] = 1`` and ``w_eff[c, c' > c, -1, -1] = 0``.
    """
    mask = jnp.ones((c_out, c_in, kh, kw), jnp.float32)
    co = lax.broadcasted_iota(jnp.int32, (c_out, c_in), 0)
    ci = lax.broadcasted_iota(jnp.int32, (c_out, c_in), 1)
    tri = (ci >= co).astype(jnp.float32)          # diag + upper
    mask = mask.at[:, :, -1, -1].add(-tri)
    eye = jnp.zeros((c_out, c_in, kh, kw), jnp.float32)
    eye = eye.at[:, :, -1, -1].set(jnp.eye(c_out, c_in, dtype=jnp.float32))
    return mask, eye


def apply_mask(w):
    """``w_eff = w*mask + I_center`` — unit-lower-triangular center tap.

    Requires a SQUARE (per-group) kernel: on a rectangular full grouped
    kernel the center eye/triangle would land only on the first group's
    channels, producing a silently singular operator — mask each
    ``(cg, cg, kh, kw)`` group separately (as ``InvFlow._w_eff`` does)."""
    if w.shape[0] != w.shape[1]:    # not assert: must survive python -O
        raise ValueError(
            f"apply_mask expects a square per-group kernel, got {w.shape}")
    mask, eye = center_mask(*w.shape)
    return w * mask + eye


# ---------------------------------------------------------------------------
# The masked convolution itself (sampling direction / flow reverse)
# ---------------------------------------------------------------------------

def masked_conv_apply(y, w_eff, groups: int = 1):
    """``z = T y``: conv with implicit TL zero padding (KH-1 top, KW-1 left).

    Equivalent of the CUDA ``forward`` op (border truncation in the
    recurrence == TL zero padding).
    """
    kh, kw = w_eff.shape[2], w_eff.shape[3]
    return lax.conv_general_dilated(
        y, w_eff,
        window_strides=(1, 1),
        padding=((kh - 1, 0), (kw - 1, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        # same pass-count policy as the solve: the conv is the solve's
        # inverse direction, so round-trip error is bounded by the
        # looser of the two (scripts/check_solve_precision.py validates
        # the pair on-chip against a float64 oracle)
        precision=_sp(),
    )


# ---------------------------------------------------------------------------
# Row-matrix construction
# ---------------------------------------------------------------------------

# How the banded operators are ASSEMBLED from kernel taps / D-blocks:
# 'einsum' contracts against a constant one-hot selection tensor (a few
# MFLOP of MXU/VPU work); 'gather' is the index-gather + where + transpose
# formulation. The 2026-08-18 profile attributes ~10 of 51 ms/step of the
# exact ImageNet32 step to the gather formulation's data-formatting ops
# (XLA "custom fusion" gathers at 2.7 ms + select_n layout copies at
# 4.6 ms + assembly reshapes) — pure shuffling that the one-hot
# contraction avoids. Slope A/B: imagenet32_exact_asmein vs _asmgather.
OPERATOR_ASSEMBLY = "einsum"

# Row-matrix builder variant: the 'einsum' assembly above still emits a
# 6-D (KH, W, C, W, C) intermediate whose final `.reshape(kh, CW, CW)`
# is a physical retiling copy on TPU (the (…, C) trailing dim tiles
# (8,128) at C=12 -> ~10x padding; the 2026-08-18 profile prices the
# pair of reshapes at 1.15 ms/step and the producing einsums at ~4 ms).
# 'flat' builds the (KH, CW, CW) stack DIRECTLY with one-hot operators
# on pre-flattened indices — every intermediate keeps (…, WC) trailing
# dims, so there is no rank-changing reshape on the hot path. Values are
# bit-identical (each contraction selects exactly one element).
# Slope A/B verdict (results/true_step_time.jsonl, imagenet32_exact
# b100, in-process interleaved, 2026-08-18): flat WINS 1.089x end-to-end
# (48.4 -> 44.4 ms/step, 4/4 pairs) — adopted as the default.
ROW_MATS_FLAT = True


def _row_matrices_flat(w_eff, width: int):
    """(KH, CW, CW) row-dependence stack, built pre-flattened.

    Same contract as :func:`_row_matrices` (entry[r, (wi,c), (wj,c')] =
    w_eff[c, c', KH-1-r, KW-1-(wi-wj)] for 0 <= wi-wj <= KW-1), but the
    (w, c) flattening happens inside the one-hot operators instead of a
    trailing 6-D reshape:

      bmat[r, t, i, j] = k_rows[c(i), c(j), r, t]   (Pc contractions)
      mats[r, i, j]    = sum_t bmat[r, t, i, j] * Sw[t, i, j]

    with Sw one-hot in t = KW-1-(w(i)-w(j)). Exactly one term survives
    per output element, so the result is an exact selection.
    """
    c_out, c_in, kh, kw = w_eff.shape
    k_rows = w_eff[:, :, ::-1, :]                             # (C, C, KH, KW)
    wc_o, wc_i = width * c_out, width * c_in

    co = lax.broadcasted_iota(jnp.int32, (c_out, wc_o), 0)
    io = lax.broadcasted_iota(jnp.int32, (c_out, wc_o), 1)
    pc_o = (io % c_out == co).astype(w_eff.dtype)             # (C, WC)
    ci = lax.broadcasted_iota(jnp.int32, (c_in, wc_i), 0)
    ii = lax.broadcasted_iota(jnp.int32, (c_in, wc_i), 1)
    pc_i = (ii % c_in == ci).astype(w_eff.dtype)              # (C', WC')

    wi = lax.broadcasted_iota(jnp.int32, (kw, wc_o, wc_i), 1) // c_out
    wj = lax.broadcasted_iota(jnp.int32, (kw, wc_o, wc_i), 2) // c_in
    tt = lax.broadcasted_iota(jnp.int32, (kw, wc_o, wc_i), 0)
    sw = (wi - wj == (kw - 1) - tt).astype(w_eff.dtype)       # (KW, WC, WC')

    a = jnp.einsum("cdrt,ci->drti", k_rows, pc_o, precision=_sp())
    bmat = jnp.einsum("drti,dj->rtij", a, pc_i, precision=_sp())
    return jnp.einsum("rtij,tij->rij", bmat, sw, precision=_sp())


def _row_matrices(w_eff, width: int):
    """Build the (KH, CW, CW) stack of per-row dependence matrices.

    Index r=0 is the within-row matrix M0; r>=1 maps row h-r into row h.
    Row vectors are flattened as (w, c) -> w*C + c so that M0 is elementwise
    lower triangular (blocks below the diagonal are full, diagonal blocks
    are the unit-lower-triangular center tap).

    entry[r, (wi, c), (wj, c')] = w_eff[c, c', KH-1-r, KW-1-(wi-wj)]
                                  for 0 <= wi-wj <= KW-1.
    """
    if ROW_MATS_FLAT:
        return _row_matrices_flat(w_eff, width)
    c_out, c_in, kh, kw = w_eff.shape
    wi = lax.broadcasted_iota(jnp.int32, (width, width), 0)
    wj = lax.broadcasted_iota(jnp.int32, (width, width), 1)
    diff = wi - wj
    k_rows = w_eff[:, :, ::-1, :]                             # (C, C, KH, KW)
    if OPERATOR_ASSEMBLY == "einsum":
        # one-hot selection: sel[t, wi, wj] = 1 iff wi - wj == KW-1-t.
        # Exactly one term per output element, so the contraction is a
        # pure (exact) selection — but it lowers to a small dense
        # einsum instead of gather + where + transpose layout copies.
        t_idx = lax.broadcasted_iota(jnp.int32, (kw, width, width), 0)
        sel = (diff[None] == (kw - 1 - t_idx)).astype(w_eff.dtype)
        mats = jnp.einsum("cdrt,twv->rwcvd", k_rows, sel,
                          precision=_sp())
        return mats.reshape(kh, width * c_out, width * c_in)
    valid = jnp.logical_and(diff >= 0, diff <= kw - 1)
    tap = kw - 1 - jnp.clip(diff, 0, kw - 1)                  # (W, W)
    gathered = k_rows[:, :, :, tap]                           # (C, C, KH, W, W)
    gathered = jnp.where(valid[None, None, None], gathered, 0.0)
    # (KH, W, C, W, C) -> (KH, WC, WC)
    mats = jnp.transpose(gathered, (2, 3, 0, 4, 1))
    return mats.reshape(kh, width * c_out, width * c_in)


# ---------------------------------------------------------------------------
# Block-row matrices: R rows of the banded operator at a time
# ---------------------------------------------------------------------------

# Rows-per-block override for the slope A/B (scan_slope_bench
# imagenet32_exact_r4/_r8 vs the default heuristic): None = the
# _choose_block_rows heuristic below. Larger R halves the sequential
# scan length per doubling (fewer in-scan steps) at O((R*CW)^3)
# operator-build and bigger-matmul cost — where the optimum sits is a
# hardware question, so it is measured, not assumed. Values are
# identical for any R (same math, different blocking) —
# tests/test_inv_conv.py::test_row_block_override_matches_default.
R_ROWS_OVERRIDE = None


def _choose_block_rows(h: int, cw: int, kh: int) -> int:
    """Rows per block: targets ~384-wide MXU operands, caps the O((R*CW)^3)
    per-call triangular inversion, and keeps R >= KH-1 so inter-block
    dependence reaches back exactly one block."""
    if R_ROWS_OVERRIDE:
        return max(max(kh - 1, 1), min(int(R_ROWS_OVERRIDE), h))
    r = max(kh - 1, 1, min(h, -(-384 // cw)))
    while r > max(kh - 1, 1) and r * cw > 1024:
        r -= 1
    return min(r, h)


def _tri_block(mats, r_rows: int):
    """Dense (R*CW, R*CW) unit-lower-triangular within-block operator:
    block (i, j) = mats[i - j] for 0 <= i - j <= KH-1. (Test oracle; the
    solve inverts it structurally via :func:`_block_toeplitz_inverse`.)"""
    kh, cw = mats.shape[0], mats.shape[1]
    ii = lax.broadcasted_iota(jnp.int32, (r_rows, r_rows), 0)
    jj = lax.broadcasted_iota(jnp.int32, (r_rows, r_rows), 1)
    q = ii - jj
    valid = jnp.logical_and(q >= 0, q <= kh - 1)
    gathered = mats[jnp.clip(q, 0, kh - 1)]                   # (R, R, CW, CW)
    gathered = jnp.where(valid[:, :, None, None], gathered, 0.0)
    t = jnp.transpose(gathered, (0, 2, 1, 3))
    return t.reshape(r_rows * cw, r_rows * cw)


# Use the pixel-block factorization in _tri_inverse when the row width
# is known: M0 = (I_W (x) A0)(I + N) with A0 the (C,C) diagonal pixel
# block and N strictly pixel-block-triangular, so N's nilpotency index
# is W (pixels), not C*W (elements) — Newton-Schulz needs
# ceil(log2(W)) iterations instead of ceil(log2(C*W)): 17 -> 11 big
# matmuls at W=32 and 17 -> 7 at W=8, a pure-FLOP reduction with no
# memory-streaming tradeoff. Flag for the slope A/B
# (imagenet32_exact_m0fac vs _m0gen).
M0_FACTORED = True

# How the per-block projection c = x @ T_blk^{-T} is applied: 'blocks'
# uses the Toeplitz D-block structure (r(r+1)/2 block matmuls — 25%
# fewer FLOPs at r=2), 'dense' the assembled t_inv. Slope A/B:
# imagenet32_exact_applyblk vs _applydense.
SOLVE_APPLY = "blocks"


def _tri_inverse(m0, width: int = 1):
    """Exact inverse of an elementwise-triangular matrix by Newton-Schulz
    — no LU. Factor M0 = D (I + L') with D = diag(M0) and L' strictly
    triangular (hence nilpotent of index <= n); then iterate
    X <- X (2I - M X) on M = I + L': after k steps X = sum_{j<2^k} (-L')^j
    EXACTLY, so ceil(log2(nilpotency index)) iterations of two (n x n)
    matmuls finish. jnp.linalg.inv's LU lowers to an O(n)-iteration
    sequential loop that the TPU backend compiles for minutes; this is
    pure MXU matmuls and compiles in seconds. Handles unit-LOWER
    (canonical masked kernel), unit-UPPER (transposed kernel in the
    VJP), and non-unit diagonals (emerging AR convs) alike.

    ``width`` > 1 declares pixel-block Toeplitz structure (n = width*C
    with identical (C,C) diagonal blocks A0 and all coupling strictly
    between pixel blocks) and activates the reduced-iteration
    factorization above.
    """
    n = m0.shape[-1]
    if M0_FACTORED and width > 1 and n % width == 0:
        c = n // width
        a0_inv = _tri_inverse(m0[:c, :c])        # (C,C), generic path
        # m_unit = (I (x) A0^{-1}) M0 = I + N, N strictly pixel-block-tri
        m_unit = jnp.einsum(
            "ij,wjk->wik", a0_inv, m0.reshape(width, c, n),
            precision=_sp()).reshape(n, n)
        eye2 = 2.0 * jnp.eye(n, dtype=m0.dtype)
        x = eye2 - m_unit
        steps = max(1, (width - 1).bit_length() - 1)   # 2^(steps+1) >= W
        for _ in range(steps):
            x = jnp.matmul(x, eye2 - jnp.matmul(m_unit, x,
                                                precision=_sp()),
                           precision=_sp())
        # (I+N)^{-1} (I (x) A0^{-1}): block-diagonal right-multiply via
        # reshape — an (n*W, C)@(C, C) einsum, not a dense (n,n) matmul
        return jnp.einsum("vwj,jk->vwk", x.reshape(n, width, c), a0_inv,
                          precision=_sp()).reshape(n, n)
    d = jnp.diagonal(m0)
    m_unit = m0 / d[:, None]                     # I + L', unit diagonal
    eye2 = 2.0 * jnp.eye(n, dtype=m0.dtype)
    x = eye2 - m_unit                            # captures order-1 terms
    steps = max(1, (n - 1).bit_length() - 1)     # 2^(steps+1) >= n
    for _ in range(steps):
        x = jnp.matmul(x, eye2 - jnp.matmul(m_unit, x, precision=_sp()),
                       precision=_sp())
    return x / d[None, :]                        # (I+L')^{-1} D^{-1}


def _toeplitz_d_blocks(mats, r_rows: int, width: int = 1):
    """The (R, CW, CW) stack of T_blk^{-1}'s Toeplitz inverse blocks
    D[d] (block (i, j) of the inverse is D[i-j], zero above the
    diagonal): D[0] = M0^{-1}, D[d] = -M0^{-1} sum_r mats[r] D[d-r]."""
    kh = mats.shape[0]
    m0_inv = _tri_inverse(mats[0], width=width)               # (CW, CW)
    d_blocks = [m0_inv]
    for d in range(1, r_rows):
        acc = None
        for r in range(1, min(kh - 1, d) + 1):
            term = jnp.matmul(mats[r], d_blocks[d - r], precision=_sp())
            acc = term if acc is None else acc + term
        d_blocks.append(
            -jnp.matmul(m0_inv, acc, precision=_sp()) if acc is not None
            else jnp.zeros_like(m0_inv))
    return jnp.stack(d_blocks)


def _block_toeplitz_inverse(mats, r_rows: int, width: int = 1,
                            return_blocks: bool = False):
    """T_blk^{-1} without any large LU: T_blk is block-Toeplitz banded, so
    its inverse blocks depend only on the row offset d = i - j:

      D[0] = M0^{-1},  D[d] = -M0^{-1} sum_{r=1..min(KH-1,d)} mats[r] D[d-r]

    R-1 unrolled steps of (CW x CW) matmuls — loop-free and MXU-dense,
    where a generic LU of the (R*CW)^2 operator lowers to a long
    sequential factorization loop on TPU. Returns the dense (R*CW, R*CW)
    inverse assembled from the D blocks (plus the (R, CW, CW) block
    stack itself when ``return_blocks``; ``width`` activates the
    reduced-iteration M0 factorization, see :func:`_tri_inverse`)."""
    kh, cw = mats.shape[0], mats.shape[1]
    stack = _toeplitz_d_blocks(mats, r_rows, width)           # (R, CW, CW)

    ii = lax.broadcasted_iota(jnp.int32, (r_rows, r_rows), 0)
    jj = lax.broadcasted_iota(jnp.int32, (r_rows, r_rows), 1)
    q = ii - jj
    if OPERATOR_ASSEMBLY == "einsum":
        # sel[d, i, j] = 1 iff i - j == d: one-hot block placement —
        # replaces the gather + where + (0,2,1,3) transpose layout copies
        # (the 4.6 ms/step select_n line of the 2026-08-18 profile)
        d_idx = lax.broadcasted_iota(jnp.int32, (r_rows, r_rows, r_rows),
                                     0)
        sel = (q[None] == d_idx).astype(stack.dtype)
        t = jnp.einsum("dab,dij->iajb", stack, sel, precision=_sp())
        t = t.reshape(r_rows * cw, r_rows * cw)
        return (t, stack) if return_blocks else t
    gathered = stack[jnp.clip(q, 0, r_rows - 1)]
    gathered = jnp.where((q >= 0)[:, :, None, None], gathered, 0.0)
    t = jnp.transpose(gathered, (0, 2, 1, 3))
    t = t.reshape(r_rows * cw, r_rows * cw)
    return (t, stack) if return_blocks else t


def _prev_block(mats, r_rows: int):
    """(R*CW, (KH-1)*CW) map from the previous block's last KH-1 rows
    (tail[t] = y at block row R-(KH-1)+t) into this block's rows:
    entry (i, t) = mats[i + KH-1 - t] when 1 <= i+KH-1-t <= KH-1."""
    kh, cw = mats.shape[0], mats.shape[1]
    ii = lax.broadcasted_iota(jnp.int32, (r_rows, kh - 1), 0)
    tt = lax.broadcasted_iota(jnp.int32, (r_rows, kh - 1), 1)
    q = ii + (kh - 1) - tt
    if OPERATOR_ASSEMBLY == "einsum":
        # sel[r, i, t] = 1 iff i + KH-1 - t == r with 1 <= r <= KH-1
        r_idx = lax.broadcasted_iota(jnp.int32, (kh, r_rows, kh - 1), 0)
        sel = jnp.logical_and(q[None] == r_idx, r_idx >= 1)
        p = jnp.einsum("rab,rit->iatb", mats, sel.astype(mats.dtype),
                       precision=_sp())
        return p.reshape(r_rows * cw, (kh - 1) * cw)
    valid = jnp.logical_and(q >= 1, q <= kh - 1)
    gathered = mats[jnp.clip(q, 0, kh - 1)]                   # (R, KH-1, CW, CW)
    gathered = jnp.where(valid[:, :, None, None], gathered, 0.0)
    p = jnp.transpose(gathered, (0, 2, 1, 3))
    return p.reshape(r_rows * cw, (kh - 1) * cw)


# ---------------------------------------------------------------------------
# The solve (training direction): y = T^{-1} x
# ---------------------------------------------------------------------------
#
# Row-blocked: partition the H rows into blocks of R. Within a block the
# operator is the dense unit-lower-triangular T_blk; dependence on earlier
# rows reaches back exactly the previous block's last KH-1 rows (R >= KH-1):
#
#   T_blk y_b = x_b - P tail_{b-1}
#   y_b = c_b - G tail_{b-1},   c = x @ T_blk^{-T}  (ALL blocks, one matmul)
#                               G = T_blk^{-1} P    (folded once per call)
#
# Sequential depth drops from H (reference: (H+W-1)*C/4 synced launches) to
# ceil(H/R); every step is ONE (B, (KH-1)CW) @ ((KH-1)CW, RCW) MXU matmul.
# The remaining scan runs either as an unrolled XLA loop or fused in a
# single Pallas kernel with the running tail held in VMEM (_scan_blocks_*).

def _solve_ungrouped(x, w_eff, r_rows=None):
    b, c, h, width = x.shape
    kh = w_eff.shape[2]
    cw = c * width

    mats = _row_matrices(w_eff, width)                        # (KH, CW, CW)
    # rows flattened (w, c): (B, H, W, C) -> (B, H, CW)
    x_rows = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, h, cw)

    # NOTE: M0 is LOWER-triangular elementwise for canonically masked
    # kernels but UPPER for the channel-transposed kernel used by the
    # VJP's dx solve; _tri_inverse handles both (and non-unit diagonals).
    if kh == 1:
        # no inter-row dependence: one inverse applied to all rows at once.
        m0_inv = _tri_inverse(mats[0], width=width)
        y_rows = jnp.einsum("bhi,ji->bhj", x_rows, m0_inv, precision=_sp())
    else:
        r = int(r_rows) if r_rows else _choose_block_rows(h, cw, kh)
        nb = -(-h // r)
        rcw, kcw = r * cw, (kh - 1) * cw

        t_inv, d_stack = _block_toeplitz_inverse(mats, r, width=width,
                                                 return_blocks=True)
        g = t_inv @ _prev_block(mats, r) if nb > 1 else None

        xp = jnp.pad(x_rows, ((0, 0), (0, nb * r - h), (0, 0)))
        xb = xp.reshape(b, nb, rcw)
        if SOLVE_APPLY == "blocks" and r > 1 and cw >= 256:
            # triangular D-block projection (25% fewer FLOPs at r=2
            # than the dense einsum, same result). Gated on cw >= 256:
            # below that the (cw,cw) block products are MXU-starved and
            # one dense (rcw,rcw) matmul is better (flagship cw=56
            # keeps the dense path).
            xs = xb.reshape(b, nb, r, cw)
            c_all = _blocks_project(xs, d_stack).reshape(b, nb, rcw)
        else:
            c_all = jnp.einsum("bni,ji->bnj", xb, t_inv, precision=_sp())

        if nb == 1:
            y_blocks = c_all
        else:
            y_blocks = _scan_blocks_xla(c_all, g, kcw)

        y_rows = y_blocks.reshape(b, nb * r, cw)[:, :h]

    y = y_rows.reshape(b, h, width, c)
    return jnp.transpose(y, (0, 3, 1, 2))


def _blocks_project(xs, d_stack):
    """``c = x @ T_blk^{-T}`` via the Toeplitz D-blocks: block (i, j) of
    t_inv is D[i-j] (zero above the diagonal), so only r(r+1)/2 of the
    r^2 block products exist. ``xs`` is (b, nb, r, cw); returns the same
    shape. Shared by the SOLVE_APPLY='blocks' path of the solve and the
    BUILT_APPLY='blocks' operator application (:func:`_apply_blocks`)."""
    r = d_stack.shape[0]
    c_sub = []
    for i in range(r):
        acc = None
        for j in range(i + 1):
            term = jnp.einsum("bnw,vw->bnv", xs[:, :, j], d_stack[i - j],
                              precision=_sp())
            acc = term if acc is None else acc + term
        c_sub.append(acc)
    return jnp.stack(c_sub, axis=2)


def _scan_blocks_xla(c_all, g, kcw: int):
    """y_n = c_n - tail @ G^T, tail = last KH-1 rows of y_n. Unrolled only
    for very short chains: the TPU backend's compile time grows
    super-linearly in the unrolled step count (observed: minutes at ~10
    unrolled steps vs seconds as a scan), while runtime is equal."""
    b, nb, rcw = c_all.shape

    def step(tail, c_n):
        y_n = c_n - jnp.einsum("bk,jk->bj", tail, g, precision=_sp())
        return y_n[:, rcw - kcw:], y_n

    tail0 = jnp.zeros((b, kcw), c_all.dtype)
    if nb <= 4:
        ys, tail = [], tail0
        for n in range(nb):
            tail, y_n = step(tail, c_all[:, n])
            ys.append(y_n)
        return jnp.stack(ys, axis=1)
    _, y = lax.scan(step, tail0, jnp.transpose(c_all, (1, 0, 2)))
    return jnp.transpose(y, (1, 0, 2))


def _solve(x, w_eff, groups: int = 1):
    if groups == 1:
        return _solve_ungrouped(x, w_eff)
    b, c, h, width = x.shape
    cg = c // groups
    xg = x.reshape(b, groups, cg, h, width)
    wg = w_eff.reshape(groups, cg, cg, *w_eff.shape[2:])
    yg = jax.vmap(_solve_ungrouped, in_axes=(1, 0), out_axes=1)(xg, wg)
    return yg.reshape(b, c, h, width)


# ---------------------------------------------------------------------------
# Prepared-operator solve: build the operator once, apply it many times
# ---------------------------------------------------------------------------
#
# The blocked solve above rebuilds its operator pieces (Newton-Schulz
# M0^{-1}, block-Toeplitz t_inv, coupling G) from the kernel on EVERY
# call — ~1.9 GFLOP of (CW)^3 matmuls per call vs ~0.24 GFLOP for the
# solve itself at production shapes. Under scan-over-depth that build
# runs per scan iteration, per order, in forward AND backward: the
# post-wgrad-fix profile attributes 65% of the exact ImageNet32 step to
# this line of work (results/step_profile_imagenet32_exact_detail.md).
# The prepared path splits the op:
#
#   solve_prepare(w_eff, h, w) -> {t_inv, g}   (hoistable: RepeatedBlock
#       vmaps it over the K stacked steps OUTSIDE the scan)
#   inv_conv_solve_prepared(x, w_eff, t_inv, g)  (custom_vjp)
#
# and its VJP REUSES t_inv for dx by solving the transposed system with
# a reverse block scan — no second operator build, and no spatial flips:
#
#   T^T z = g_ct :  z_n = (g_n - pad_last(z_{n+1} @ P)) @ t_inv
#
# (row-vector forms; forward applies t_inv^T, transpose applies t_inv —
# same array, opposite contraction side. P is the matmul-free gather
# ``_prev_block``.) dW = -wgrad(y, dx) is the total analytic weight
# gradient of y = T(w)^{-1}x (implicit-function result), so the
# cotangents for t_inv/g are declared zero — they are exact functions
# of w and their contribution is already inside dW. Do NOT differentiate
# w.r.t. t_inv/g directly.

# Gate for the prepared-operator path in InvFlow/InvFlowUnit (slope
# A/B: scan_slope_bench.py imagenet32_exact_prep vs _noprep). Verdict
# (results/true_step_time.jsonl, two noprep-vs-prep rows): the prepared
# path LOSES 16% at imagenet32_exact b100 (65.4 vs 56.1 ms, 0/4) even
# after stop_gradient on the aux (without it, autodiff's transpose of
# the hoisted build cost +43%). Streaming ~3.4 MB of t_inv/G per conv
# per scan iteration from HBM (forward xs read + backward xs re-read)
# costs more than rebuilding the operator on the MXU in-scan at
# SOLVE_PRECISION='high' — recompute beats memory on this hardware.
# Default OFF; kept as measured infrastructure with parity tests
# (test_prepared_solve_matches_unprepared, test_prepared_block_parity*).
PREPARED_SOLVE = False


def solve_prepare(w_eff, h: int, width: int):
    """Precompute {t_inv, g} for :func:`inv_conv_solve_prepared`.

    Returns None when the prepared path does not apply (kh < 2 — the
    1x1-row case has no inter-row scan and a single cheap build).
    Shapes: t_inv (R*CW, R*CW), g (R*CW, (KH-1)*CW) with R chosen by
    :func:`_choose_block_rows` (deterministic in the static shape).
    """
    c = w_eff.shape[0]
    kh = w_eff.shape[2]
    if kh < 2:
        return None
    cw = c * width
    r = _choose_block_rows(h, cw, kh)
    mats = _row_matrices(w_eff, width)
    t_inv = _block_toeplitz_inverse(mats, r, width=width)
    g = jnp.matmul(t_inv, _prev_block(mats, r), precision=_sp())
    return {"t_inv": t_inv, "g": g}


def _apply_built(x, t_inv, g, kh: int):
    """Apply a prebuilt block operator: solve ``T y = x`` given
    ``t_inv`` (R*CW, R*CW) and the coupling ``g`` (may be None when the
    image fits one block)."""
    b, c, h, width = x.shape
    cw = c * width
    rcw = t_inv.shape[0]
    r = rcw // cw
    nb = -(-h // r)

    x_rows = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, h, cw)
    xp = jnp.pad(x_rows, ((0, 0), (0, nb * r - h), (0, 0)))
    xb = xp.reshape(b, nb, rcw)
    c_all = jnp.einsum("bni,ji->bnj", xb, t_inv, precision=_sp())
    if nb == 1:
        y_blocks = c_all
    else:
        y_blocks = _scan_blocks_xla(c_all, g, (kh - 1) * cw)
    y_rows = y_blocks.reshape(b, nb * r, cw)[:, :h]
    y = y_rows.reshape(b, h, width, c)
    return jnp.transpose(y, (0, 3, 1, 2))


def _apply_prepared(x, w_eff, t_inv, g):
    return _apply_built(x, t_inv, g, w_eff.shape[2])


def _apply_built_t(g_ct, t_inv, p, kh: int):
    """``z = T^{-T} g_ct`` by a reverse block scan reusing the forward's
    ``t_inv`` (operator transposition = contracting t_inv on the other
    side; the padded system's transpose truncates exactly because
    Pad^T = Trunc). ``p`` is the prebuilt previous-block map (may be
    None when the image fits one block)."""
    b, c, h, width = g_ct.shape
    cw = c * width
    rcw = t_inv.shape[0]
    r = rcw // cw
    nb = -(-h // r)
    kcw = (kh - 1) * cw

    g_rows = jnp.transpose(g_ct, (0, 2, 3, 1)).reshape(b, h, cw)
    gp = jnp.pad(g_rows, ((0, 0), (0, nb * r - h), (0, 0)))
    gb = gp.reshape(b, nb, rcw)

    if nb == 1:
        z = jnp.einsum("bni,ij->bnj", gb, t_inv, precision=_sp())
        z_rows = z.reshape(b, nb * r, cw)[:, :h]
        return jnp.transpose(z_rows.reshape(b, h, width, c),
                             (0, 3, 1, 2))

    def step(v, g_n):
        m = g_n.at[:, rcw - kcw:].add(-v)
        z_n = jnp.einsum("bi,ij->bj", m, t_inv, precision=_sp())
        return jnp.einsum("bj,jk->bk", z_n, p, precision=_sp()), z_n

    v0 = jnp.zeros((b, kcw), gb.dtype)
    if nb <= 4:
        zs, v = [None] * nb, v0
        for n in range(nb - 1, -1, -1):
            v, z_n = step(v, gb[:, n])
            zs[n] = z_n
        z = jnp.stack(zs, axis=1)
    else:
        _, z = lax.scan(step, v0, jnp.transpose(gb, (1, 0, 2)),
                        reverse=True)
        z = jnp.transpose(z, (1, 0, 2))
    z_rows = z.reshape(b, nb * r, cw)[:, :h]
    return jnp.transpose(z_rows.reshape(b, h, width, c), (0, 3, 1, 2))


def _apply_prepared_t(g_ct, w_eff, t_inv):
    """Transposed solve reusing the forward ``t_inv`` (see
    :func:`_apply_built_t`); rebuilds only the matmul-free previous-block
    gather from the kernel."""
    cw = g_ct.shape[1] * g_ct.shape[3]
    r = t_inv.shape[0] // cw
    kh = w_eff.shape[2]
    nb = -(-g_ct.shape[2] // r)
    p = (_prev_block(_row_matrices(w_eff, g_ct.shape[3]), r)
         if nb > 1 else None)
    return _apply_built_t(g_ct, t_inv, p, kh)


@jax.custom_vjp
def inv_conv_solve_prepared(x, w_eff, t_inv, g):
    """Solve ``T(w_eff) y = x`` with a precomputed operator (see module
    note above). Value-identical to :func:`inv_conv_solve`; the VJP
    reuses ``t_inv`` for the transposed solve instead of rebuilding."""
    return _apply_prepared(x, w_eff, t_inv, g)


def _prep_fwd(x, w_eff, t_inv, g):
    y = _apply_prepared(x, w_eff, t_inv, g)
    return y, (y, w_eff, t_inv, g)


def _prep_bwd(res, g_ct):
    y, w_eff, t_inv, g = res
    kh, kw = w_eff.shape[2], w_eff.shape[3]
    dx = _apply_prepared_t(g_ct, w_eff, t_inv)
    dw = _solve_wgrad(y, dx, kh, kw, 1)
    return dx, dw, jnp.zeros_like(t_inv), jnp.zeros_like(g)


inv_conv_solve_prepared.defvjp(_prep_fwd, _prep_bwd)


# ---------------------------------------------------------------------------
# Jacobi / Neumann-series solve: fully parallel iterations
# ---------------------------------------------------------------------------

def inv_conv_solve_jacobi(x, w_eff, groups: int = 1, iters: int = 12,
                          tol: float = 0.0):
    """Approximate ``T^{-1} x`` by fixed-point iteration
    ``y_{k+1} = x - (T - I) y_k`` (Neumann series of the strictly
    lower-triangular part).

    Every iteration is ONE masked conv — MXU-dense with no sequential
    scan at all, so wall-clock is independent of image height. Converges
    geometrically in ||T - I|| (exact after C*H*W iterations by
    nilpotency); with the reference's small-magnitude masked weights
    (weight_clamp=0.01 configs) a dozen iterations reach float32
    round-off. Cf. selective Jacobi decoding for AR flows
    (arXiv:2505.24791) — the spatial analogue of their token-parallel
    decode. Use for long-chain shapes (timescaling, large images) or
    sampling; the exact blocked solve stays the training default.

    ``tol > 0`` stops early (lax.while_loop) when max|residual| < tol.
    """
    def step(y):
        return x - (masked_conv_apply(y, w_eff, groups) - y)

    if tol > 0.0:
        def cond(state):
            k, y, done = state
            return jnp.logical_and(k < iters, jnp.logical_not(done))

        def body(state):
            k, y, _ = state
            y_next = step(y)
            done = jnp.max(jnp.abs(y_next - y)) < tol
            return k + 1, y_next, done

        _, y, _ = lax.while_loop(cond, body, (0, x, jnp.bool_(False)))
        return y

    def body(_, y):
        return step(y)

    return lax.fori_loop(0, iters, body, x)


def inv_conv_solve_jacobi_guarded(x, w_eff, groups: int = 1,
                                  fast_iters: int = 12,
                                  cap_iters: int = 128,
                                  tol: float = 1e-3):
    """Residual-guarded Neumann solve with a FORI fast path.

    The tol-driven ``lax.while_loop`` in :func:`inv_conv_solve_jacobi`
    is semantically right but measured ~15x slower than the plain
    ``fori_loop`` at the tall-thin shapes the 'auto' policy routes here
    (TPU control flow cannot pipeline across while iterations, and each
    iteration pays a max-reduction + condition at tensor sizes where
    the conv itself is ~microseconds). This variant keeps the fast path
    branch-free: ``fast_iters`` fixed iterations, ONE extra iteration
    whose step difference is the convergence residual, then a
    ``lax.cond`` that — only when the residual exceeds ``tol`` —
    continues with fixed iterations up to ``cap_iters`` total. With
    ``cap_iters`` >= the strict-triangular nilpotency index (cg*H*W)
    the fallback branch is as exact as the conv precision allows for
    any weight magnitude, and in the production small-weight regime it
    never executes, so the guarded solve costs the unguarded one plus
    a single masked conv.

    The residual is the TRUE linear-system residual, not a mere
    iteration heuristic: with ``step(y) = x - (T y - y)`` the step
    difference ``y_next - y`` equals ``x - T y`` exactly, so acceptance
    certifies a backward-error bound — the accepted iterate solves the
    system for an input perturbed by at most ``tol*(1+max|x|)`` (and
    the returned value is one further contraction step past the
    certified one). The FORWARD error is that times ``||T^{-1}||``,
    which is O(1) in the routed regimes (and when weights grow enough
    to make ``||T^{-1}||`` explode, the iteration diverges, the
    residual grows, and the fallback fires).

    ``tol`` is RELATIVE to the input scale (``resid < tol*(1+max|x|)``)
    and must sit ABOVE the conv's numeric noise floor: at the adopted
    ``SOLVE_PRECISION='high'`` the step difference plateaus at ~8e-5
    relative on TPU (measured; 'highest' plateaus at ~2e-7), so a
    tighter tol makes the cond unfireable and the cap branch run every
    step — measured 8x end-to-end regression. The default 1e-3 sits
    10x above the floor and 10x below the truncation error the guard
    exists to catch (grown weights err at >= 1e-2)."""
    def step(y):
        return x - (masked_conv_apply(y, w_eff, groups) - y)

    def body(_, y):
        return step(y)

    y = lax.fori_loop(0, fast_iters, body, x)
    y_next = step(y)                       # iteration fast_iters + 1
    resid = jnp.max(jnp.abs(y_next - y))
    remaining = max(cap_iters - fast_iters - 1, 0)
    return lax.cond(resid < tol * (1.0 + jnp.max(jnp.abs(x))),
                    lambda v: v,
                    lambda v: lax.fori_loop(0, remaining, body, v),
                    y_next)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def inv_conv_solve_jacobi_guarded_implicit(x, w_eff, groups: int = 1,
                                           fast_iters: int = 12,
                                           cap_iters: int = 128,
                                           tol: float = 1e-3):
    """:func:`inv_conv_solve_jacobi_guarded` with the same implicit-
    function-theorem VJP as :func:`inv_conv_solve_jacobi_implicit` —
    the cotangent system is solved by the guarded iteration too, so
    gradients inherit the same exactness guarantee. This is the op the
    ``solver='auto'`` policy routes to (ops/solver_policy.py)."""
    return inv_conv_solve_jacobi_guarded(x, w_eff, groups,
                                         fast_iters=fast_iters,
                                         cap_iters=cap_iters, tol=tol)


def _jacobi_guarded_fwd(x, w_eff, groups, fast_iters, cap_iters, tol):
    y = inv_conv_solve_jacobi_guarded(x, w_eff, groups,
                                      fast_iters=fast_iters,
                                      cap_iters=cap_iters, tol=tol)
    return y, (y, w_eff)


def _jacobi_guarded_bwd(groups, fast_iters, cap_iters, tol, res, g):
    y, w_eff = res
    kh, kw = w_eff.shape[2], w_eff.shape[3]
    g_f = jnp.flip(g, (2, 3))
    w_t = _transpose_kernel(w_eff, groups)
    dx = jnp.flip(
        inv_conv_solve_jacobi_guarded(g_f, w_t, groups,
                                      fast_iters=fast_iters,
                                      cap_iters=cap_iters, tol=tol),
        (2, 3))
    return dx, _solve_wgrad(y, dx, kh, kw, groups)


inv_conv_solve_jacobi_guarded_implicit.defvjp(_jacobi_guarded_fwd,
                                              _jacobi_guarded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def inv_conv_solve_jacobi_implicit(x, w_eff, groups: int = 1,
                                   iters: int = 12, tol: float = 0.0):
    """:func:`inv_conv_solve_jacobi` with an implicit-function-theorem VJP:
    O(1) memory in ``iters`` (no unrolled residuals) and the same cotangent
    formulas as the exact solve — dx solves the transposed system (by
    Jacobi again), dW = -wgrad(y, dx). ``tol > 0`` enables the early-exit
    while_loop in both the forward and the cotangent solves (``iters``
    becomes an upper bound); exposed as ``InvFlow(jacobi_tol=...)``."""
    return inv_conv_solve_jacobi(x, w_eff, groups, iters=iters, tol=tol)


def _jacobi_fwd(x, w_eff, groups, iters, tol):
    y = inv_conv_solve_jacobi(x, w_eff, groups, iters=iters, tol=tol)
    return y, (y, w_eff)


def _jacobi_bwd(groups, iters, tol, res, g):
    y, w_eff = res
    kh, kw = w_eff.shape[2], w_eff.shape[3]
    g_f = jnp.flip(g, (2, 3))
    w_t = _transpose_kernel(w_eff, groups)
    dx = jnp.flip(inv_conv_solve_jacobi(g_f, w_t, groups, iters=iters,
                                        tol=tol),
                  (2, 3))
    return dx, _solve_wgrad(y, dx, kh, kw, groups)


inv_conv_solve_jacobi_implicit.defvjp(_jacobi_fwd, _jacobi_bwd)


# ---------------------------------------------------------------------------
# custom_vjp: parallel backprop without materializing sensitivities
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def inv_conv_solve(x, w_eff, groups: int = 1):
    """Solve ``T(w_eff) y = x``; y is the flow's training-direction output.

    ``w_eff`` must already satisfy the center-tap mask (``apply_mask``) —
    or, for emerging-style AR convs, have any invertible triangular
    structure in raster order.
    """
    return _solve(x, w_eff, groups)


def _inv_conv_fwd(x, w_eff, groups):
    y = _solve(x, w_eff, groups)
    return y, (y, w_eff)


def _transpose_kernel(w_eff, groups):
    """Channel-transpose respecting group block structure."""
    if groups == 1:
        return jnp.transpose(w_eff, (1, 0, 2, 3))
    c = w_eff.shape[0]
    cg = c // groups
    wg = w_eff.reshape(groups, cg, cg, *w_eff.shape[2:])
    wg = jnp.transpose(wg, (0, 2, 1, 3, 4))
    return wg.reshape(c, cg, *w_eff.shape[2:])


def _inv_conv_bwd(groups, res, g):
    y, w_eff = res
    kh, kw = w_eff.shape[2], w_eff.shape[3]

    # dx = T^{-T} g : lower-triangular again in flipped coordinates.
    g_f = jnp.flip(g, (2, 3))
    w_t = _transpose_kernel(w_eff, groups)
    dx = jnp.flip(_solve(g_f, w_t, groups), (2, 3))

    # dW = -wgrad(y, dx) over TL-padded y; pure conv, no 6-D tensor.
    return dx, _solve_wgrad(y, dx, kh, kw, groups)


# Weight-gradient implementation switch. 'conv' (default) is the
# batch-as-contraction convolution; 'patch' extracts the KH*KW shifted
# views of x_pad and contracts them against g in one dot_general.
# Slope-A/B verdict (results/true_step_time.jsonl, imagenet32_exact
# wgpatch-vs-wgconv, in-process interleaved): conv wins 4/4 pairs,
# patch is 4.8% SLOWER end-to-end and compiles 50x slower (419 s vs
# 8 s) — the patch einsum's (c,d,k) output keeps the minor dim at
# KH*KW=9 lanes and the 9-slice stack adds HBM traffic, so it never
# recovers the conv emitter's overhead. The wgrad convs are still the
# top profile entry (66% of the exact ImageNet32 step,
# results/step_profile_imagenet32_exact_detail.md); the measured lever
# is WGRAD_PRECISION below, not the contraction shape.
WGRAD_IMPL = "conv"

# MXU pass count for the weight-gradient contraction only. The SOLVE
# runs at SOLVE_PRECISION (default 'high', bf16x3 — see that policy's
# comment above; on-chip f64-oracle validation:
# scripts/check_solve_precision.py) — but dW is a *gradient*,
# and every other gradient in the framework (coupling convs, ops/convs.py)
# already runs at DEFAULT (one bf16 pass, f32 accumulation). Slope A/B
# verdicts at imagenet32_exact b100 (results/true_step_time.jsonl,
# in-process interleaved, 4/4 pairs each): highest 80.25 ms -> high
# 73.87 ms -> default 70.26 ms per step (1.142x end-to-end for
# default). 'default' is therefore the default; per-element bf16 input
# rounding (~4e-3 relative) on a gradient is the normal mixed-precision
# training regime.
WGRAD_PRECISION = "default"

_WGRAD_PREC = {"highest": lax.Precision.HIGHEST,
               "high": lax.Precision.HIGH,
               "default": lax.Precision.DEFAULT}


def _wgrad_conv(g, x_pad, kh, kw):
    """dK via conv_general_dilated (batch as contraction)."""
    out = lax.conv_general_dilated(
        jnp.transpose(x_pad, (1, 0, 2, 3)),
        jnp.transpose(g, (1, 0, 2, 3)),
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=_WGRAD_PREC[WGRAD_PRECISION],
    )  # (Cin, Cout, KH, KW)
    return jnp.transpose(out[:, :, :kh, :kw], (1, 0, 2, 3))


def _wgrad_patch(g, x_pad, kh, kw):
    """dK via shifted-slice stack + one dot_general (slope-measured
    loser vs ``_wgrad_conv`` — kept for the A/B case only)."""
    b, c, h, w = g.shape
    cp = x_pad.shape[1]
    slices = [lax.slice(x_pad, (0, 0, a, s), (b, cp, a + h, s + w))
              for a in range(kh) for s in range(kw)]
    xp = jnp.stack(slices)                     # (KH*KW, B, C', H, W)
    dk = jnp.einsum("nchw,kndhw->cdk", g, xp,
                    precision=_WGRAD_PREC[WGRAD_PRECISION])
    return dk.reshape(c, cp, kh, kw)


def _wgrad(g, x_pad, kh, kw):
    """dK[c,c',a,b] = sum_{n,h,w} g[n,c,h,w] * x_pad[n,c',h+a,w+b]."""
    impl = _wgrad_patch if WGRAD_IMPL == "patch" else _wgrad_conv
    return impl(g, x_pad, kh, kw)


def _solve_wgrad(y, dx, kh, kw, groups):
    """``dW = -wgrad(y, dx)`` over TL-padded ``y`` — the shared weight
    cotangent of every solve VJP (exact, Jacobi, guarded Jacobi);
    grouped kernels reduce per group block."""
    y_pad = jnp.pad(y, ((0, 0), (0, 0), (kh - 1, 0), (kw - 1, 0)))
    if groups == 1:
        return -_wgrad(dx, y_pad, kh, kw)
    dxs = jnp.split(dx, groups, axis=1)
    ys = jnp.split(y_pad, groups, axis=1)
    return -jnp.concatenate(
        [_wgrad(d, yp, kh, kw) for d, yp in zip(dxs, ys)], axis=0)


inv_conv_solve.defvjp(_inv_conv_fwd, _inv_conv_bwd)


# ---------------------------------------------------------------------------
# Whole-unit chain solve: one custom_vjp across the 4 pad orders
# ---------------------------------------------------------------------------

# Same convention as layers.inv_flow._flip_axes (kept local: ops must not
# import layers).
_CHAIN_FLIPS = {"TL": (), "TR": (3,), "BL": (2,), "BR": (2, 3)}

# Whether InvFlowUnit's exact path routes through the chain VJP (one
# order-batched weight-gradient conv per unit instead of four per-layer
# ones). Slope A/B verdict (results/true_step_time.jsonl,
# nochain-vs-chain at imagenet32_exact b100, in-process interleaved):
# the chain LOSES 1.5% (79.56 vs 80.75 ms, 0/4 pairs) — the wgrad cost
# is NOT op-count-bound (the batched conv does the same total work at
# the same tiny-channel lane utilization, plus stack/unstack copies).
# Combined with the precision A/B (bf16x6 -> bf16x1 on the same convs
# recovered only 10 of the 53 ms attributed to them), the dominant
# residual is the transpose+DUS into the scan's stacked-gradient
# accumulator, not the contraction. Default False; kept as measured
# infrastructure (test: test_chain_vjp_matches_per_layer_composition).
UNIT_CHAIN_VJP = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def inv_conv_chain_solve(x, ws, orders):
    """Chain of ``len(ws)`` oriented inverse-conv solves (the exact
    InvFlowUnit composition: TL -> TR -> BL -> BR), with a custom VJP
    that computes all weight gradients in ONE order-batched conv.

    Semantically identical to composing ``flip . inv_conv_solve . flip``
    per order (``layers/inv_flow.py: InvFlow.forward``); the value path
    is the same blocked solve. Replaces what the reference computes as
    four sequential CUDA ``inverse`` calls each with its own ``dw``
    kernel launch (``inf/layers/inv_flow.py:28-53``,
    ``inv_conv_with_bp_kernel_general.cu:496-629``).

    ``ws`` are effective (masked) kernels, groups == 1, all the same
    kernel size.
    """
    y = x
    for w, o in zip(ws, orders):
        ax = _CHAIN_FLIPS[o]
        yf = _solve(jnp.flip(y, ax) if ax else y, w, 1)
        y = jnp.flip(yf, ax) if ax else yf
    return y


def _chain_fwd(x, ws, orders):
    ys = []                               # solve outputs, each in its
    y = x                                 # own order frame
    for w, o in zip(ws, orders):
        ax = _CHAIN_FLIPS[o]
        yf = _solve(jnp.flip(y, ax) if ax else y, w, 1)
        ys.append(yf)
        y = jnp.flip(yf, ax) if ax else yf
    return y, (tuple(ys), ws)


def _chain_bwd(orders, res, g):
    ys, ws = res
    kh, kw = ws[0].shape[2], ws[0].shape[3]
    dxs, ypads = [], []                   # per order, in order frame
    for i in reversed(range(len(ws))):
        ax = _CHAIN_FLIPS[orders[i]]
        g_s = jnp.flip(g, ax) if ax else g
        w_t = _transpose_kernel(ws[i], 1)
        dx_s = jnp.flip(_solve(jnp.flip(g_s, (2, 3)), w_t, 1), (2, 3))
        dxs.append(dx_s)
        ypads.append(jnp.pad(ys[i], ((0, 0), (0, 0), (kh - 1, 0),
                                     (kw - 1, 0))))
        g = jnp.flip(dx_s, ax) if ax else dx_s
    # One batched wgrad over the order axis (vmap of the conv lowers to
    # a single batch_group_count convolution) instead of len(ws) tiny
    # per-order convs.
    dk = jax.vmap(_wgrad, in_axes=(0, 0, None, None))(
        jnp.stack(dxs), jnp.stack(ypads), kh, kw)
    dws = tuple(-dk[len(ws) - 1 - i] for i in range(len(ws)))
    return g, dws


inv_conv_chain_solve.defvjp(_chain_fwd, _chain_bwd)


# ---------------------------------------------------------------------------
# Batched-build chain: ONE vmapped operator build for all unit orders
# ---------------------------------------------------------------------------
#
# The post-wgrad-fix profile attributes 65% of the exact ImageNet32 step
# to the solve's per-order operator rebuilds (Newton-Schulz + block-
# Toeplitz matmuls at (CW, CW) = (192, 192) — far below MXU-saturating
# size, so the line item is dispatch/utilization-bound, not FLOP-bound).
# Key structure: within an InvFlowUnit only the APPLIES are sequential
# (order i+1 consumes order i's output); the four operator builds depend
# only on the weights. This path therefore:
#
#   fwd: one vmapped build over the 4 stacked canonical kernels
#        ((4, CW, CW) batched matmuls instead of 4 sequential singles),
#        then 4 sequential prebuilt applies (flip . _apply_built . flip).
#   bwd: REBUILDS the batched operators from the (tiny) kernel residuals
#        — deliberately not saved forward residuals, so nothing large
#        streams through the scan-over-depth stash (the hoisted
#        PREPARED_SOLVE path lost 16% exactly to that streaming) — and
#        reuses each order's FORWARD-frame t_inv for the transposed
#        solve (``_apply_built_t``), eliminating the 4 transposed
#        rebuilds entirely: 2 batched builds per unit step instead of 8
#        sequential ones.
#
# Weight gradients stay per-order convs (the order-batched wgrad was
# slope-measured 1.5% WORSE — UNIT_CHAIN_VJP note above). Values and
# gradients are identical to the per-layer composition up to f32
# accumulation order (test_chain_batched_matches_per_layer).

# Whether InvFlowUnit's exact path routes through the batched-build
# chain. Slope A/B (imagenet32_exact b100, in-process interleaved,
# results/true_step_time.jsonl 2026-08-18): 52.70 -> 51.42 ms/step,
# 1.025x, 4/4 pairs — adopted as the default.
UNIT_CHAIN_BATCHED = True


# How the batched chain's prebuilt operators are REPRESENTED: 'dense'
# assembles t_inv (RCW, RCW), p and g = t_inv @ p as dense matrices —
# each assembly is a one-hot einsum + a rank-changing reshape that the
# TPU backend lowers to retiling copies (the 2026-08-18 profile prices
# the _prev_block assemblies alone at ~2 ms/step). 'blocks' keeps
# everything in Toeplitz D-block form — (R, CW, CW) stacks applied by
# statically-unrolled block matmuls, zero assembly ops — the same
# representation SOLVE_APPLY='blocks' uses inside _solve_ungrouped (its
# 4/4 slope win predates the chain-batched default, which had silently
# reverted the apply to dense). 'auto' gates blocks on the MXU-width
# condition cw >= 256 exactly like SOLVE_APPLY; 'blocks' forces it at
# any shape (tests). Slope A/B: imagenet32_exact_builtblk vs _builtdense.
BUILT_APPLY = "dense"


def _use_built_blocks(cw: int, r: int) -> bool:
    if BUILT_APPLY == "dense" or r <= 1:
        return False
    if BUILT_APPLY == "blocks":
        return True
    return cw >= 256                                          # 'auto'


def _toeplitz_g_blocks(d_stack, mats, r_rows: int):
    """The coupling G = T_blk^{-1} P in block form.

    gb[i, t] = sum_j D[i-j] P[j, t] with P[j, t] = mats[j + KH-1 - t]
    when 1 <= j+KH-1-t <= KH-1 (the :func:`_prev_block` structure) —
    at R=2, KH=3 that is 5 (CW, CW) MXU matmuls where the dense route
    pays a full (RCW, RCW) x (RCW, KCW) product plus two assemblies.
    Returns (R, KH-1, CW, CW)."""
    kh = mats.shape[0]
    rows = []
    for i in range(r_rows):
        row = []
        for t in range(kh - 1):
            acc = None
            for j in range(i + 1):                            # D[i-j], j <= i
                q = j + (kh - 1) - t
                if 1 <= q <= kh - 1:
                    term = jnp.matmul(d_stack[i - j], mats[q],
                                      precision=_sp())
                    acc = term if acc is None else acc + term
            row.append(acc if acc is not None
                       else jnp.zeros_like(d_stack[0]))
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def _apply_blocks(x, d_stack, gb, kh: int):
    """Blocks-form :func:`_apply_built`: solve ``T y = x`` from the
    (R, CW, CW) D-block stack and (R, KH-1, CW, CW) coupling blocks
    (``gb`` may be None when the image fits one block)."""
    b, c, h, width = x.shape
    cw = c * width
    r = d_stack.shape[0]
    nb = -(-h // r)

    x_rows = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, h, cw)
    xp = jnp.pad(x_rows, ((0, 0), (0, nb * r - h), (0, 0)))
    xs = xp.reshape(b, nb, r, cw)
    c_all = _blocks_project(xs, d_stack)                      # (b, nb, r, cw)

    if nb == 1:
        y_blocks = c_all
    else:
        def step(tail, c_n):                 # tail (b, kh-1, cw)
            subs = []
            for i in range(r):
                acc = c_n[:, i]
                for t in range(kh - 1):
                    acc = acc - jnp.einsum("bw,vw->bv", tail[:, t],
                                           gb[i, t], precision=_sp())
                subs.append(acc)
            y_n = jnp.stack(subs, axis=1)                     # (b, r, cw)
            return y_n[:, r - (kh - 1):], y_n

        tail0 = jnp.zeros((b, kh - 1, cw), c_all.dtype)
        if nb <= 4:
            ys, tail = [], tail0
            for n in range(nb):
                tail, y_n = step(tail, c_all[:, n])
                ys.append(y_n)
            y_blocks = jnp.stack(ys, axis=1)
        else:
            _, y = lax.scan(step, tail0, jnp.transpose(c_all, (1, 0, 2, 3)))
            y_blocks = jnp.transpose(y, (1, 0, 2, 3))

    y_rows = y_blocks.reshape(b, nb * r, cw)[:, :h]
    y = y_rows.reshape(b, h, width, c)
    return jnp.transpose(y, (0, 3, 1, 2))


def _apply_blocks_t(g_ct, d_stack, mats, kh: int):
    """Blocks-form :func:`_apply_built_t`: ``z = T^{-T} g_ct`` by the
    reverse block scan, contracting the D blocks on the other side and
    reading P's blocks straight out of ``mats`` (static indices — no
    assembled ``p``)."""
    b, c, h, width = g_ct.shape
    cw = c * width
    r = d_stack.shape[0]
    nb = -(-h // r)

    g_rows = jnp.transpose(g_ct, (0, 2, 3, 1)).reshape(b, h, cw)
    gp = jnp.pad(g_rows, ((0, 0), (0, nb * r - h), (0, 0)))
    gs = gp.reshape(b, nb, r, cw)

    def solve_t(m_sub):                      # z_i = sum_{j>=i} m_j D[j-i]
        subs = []
        for i in range(r):
            acc = None
            for j in range(i, r):
                term = jnp.einsum("bw,wv->bv", m_sub[j],
                                  d_stack[j - i], precision=_sp())
                acc = term if acc is None else acc + term
            subs.append(acc)
        return jnp.stack(subs, axis=1)                        # (b, r, cw)

    if nb == 1:
        z = solve_t([gs[:, 0, j] for j in range(r)])
        z_rows = z.reshape(b, nb * r, cw)[:, :h]
        return jnp.transpose(z_rows.reshape(b, h, width, c), (0, 3, 1, 2))

    def step(v, g_n):                        # v (b, kh-1, cw)
        m_sub = [g_n[:, j] for j in range(r)]
        for t in range(kh - 1):
            j = r - (kh - 1) + t
            m_sub[j] = m_sub[j] - v[:, t]
        z_n = solve_t(m_sub)
        vs = []                              # v'_t = sum_j z_j P[j, t]
        for t in range(kh - 1):
            acc = None
            for j in range(r):
                q = j + (kh - 1) - t
                if 1 <= q <= kh - 1:
                    term = jnp.einsum("bw,wv->bv", z_n[:, j], mats[q],
                                      precision=_sp())
                    acc = term if acc is None else acc + term
            vs.append(acc if acc is not None
                      else jnp.zeros((b, cw), z_n.dtype))
        return jnp.stack(vs, axis=1), z_n

    v0 = jnp.zeros((b, kh - 1, cw), gs.dtype)
    if nb <= 4:
        zs, v = [None] * nb, v0
        for n in range(nb - 1, -1, -1):
            v, z_n = step(v, gs[:, n])
            zs[n] = z_n
        z = jnp.stack(zs, axis=1)
    else:
        _, z = lax.scan(step, v0, jnp.transpose(gs, (1, 0, 2, 3)),
                        reverse=True)
        z = jnp.transpose(z, (1, 0, 2, 3))
    z_rows = z.reshape(b, nb * r, cw)[:, :h]
    return jnp.transpose(z_rows.reshape(b, h, width, c), (0, 3, 1, 2))


def _chain_build_blocks(wstack, h: int, width: int):
    """Blocks-form :func:`_chain_build`: one vmapped build returning
    (d_stack (n, R, CW, CW), mats (n, KH, CW, CW),
    gb (n, R, KH-1, CW, CW) | None)."""
    c, kh = wstack.shape[1], wstack.shape[3]
    cw = c * width
    r = _choose_block_rows(h, cw, kh)
    nb = -(-h // r)

    def one(w):
        mats = _row_matrices(w, width)
        d_stack = _toeplitz_d_blocks(mats, r, width=width)
        gb = _toeplitz_g_blocks(d_stack, mats, r) if nb > 1 else None
        return d_stack, mats, gb

    return jax.vmap(one)(wstack)


def _chain_build(wstack, h: int, width: int):
    """Vmapped operator build for ``n`` same-shape canonical kernels.

    Returns (t_inv (n, RCW, RCW), g (n, RCW, KCW) | None,
    p (n, RCW, KCW) | None); g/p are None when the image fits one block.
    """
    c, kh = wstack.shape[1], wstack.shape[3]
    cw = c * width
    r = _choose_block_rows(h, cw, kh)
    nb = -(-h // r)
    mats = jax.vmap(lambda w: _row_matrices(w, width))(wstack)
    t_inv = jax.vmap(
        lambda m: _block_toeplitz_inverse(m, r, width=width))(mats)
    if nb == 1:
        return t_inv, None, None
    p = jax.vmap(lambda m: _prev_block(m, r))(mats)
    g = jnp.einsum("nij,njk->nik", t_inv, p, precision=_sp())
    return t_inv, g, p


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def inv_conv_chain_solve_batched(x, ws, orders):
    """Chain of oriented inverse-conv solves with ONE batched operator
    build (see module note above). Semantically identical to
    :func:`inv_conv_chain_solve` / the per-layer composition. ``ws`` are
    effective (masked) kernels in canonical TL orientation, groups == 1,
    all the same shape, kh >= 2."""
    return _chainb_forward(x, ws, orders)[0]


def _chainb_forward(x, ws, orders):
    kh = ws[0].shape[2]
    cw = x.shape[1] * x.shape[3]
    r = _choose_block_rows(x.shape[2], cw, kh)
    if _use_built_blocks(cw, r):
        d_stack, _, gb = _chain_build_blocks(jnp.stack(ws), x.shape[2],
                                             x.shape[3])
        ys = []
        y = x
        for i, o in enumerate(orders):
            ax = _CHAIN_FLIPS[o]
            yf = _apply_blocks(jnp.flip(y, ax) if ax else y, d_stack[i],
                               None if gb is None else gb[i], kh)
            ys.append(yf)
            y = jnp.flip(yf, ax) if ax else yf
        return y, tuple(ys)
    t_inv, g, _ = _chain_build(jnp.stack(ws), x.shape[2], x.shape[3])
    ys = []
    y = x
    for i, o in enumerate(orders):
        ax = _CHAIN_FLIPS[o]
        yf = _apply_built(jnp.flip(y, ax) if ax else y, t_inv[i],
                          None if g is None else g[i], kh)
        ys.append(yf)
        y = jnp.flip(yf, ax) if ax else yf
    return y, tuple(ys)


def _chainb_fwd(x, ws, orders):
    y, ys = _chainb_forward(x, ws, orders)
    return y, (ys, ws)


def _chainb_bwd(orders, res, g_ct):
    ys, ws = res
    kh, kw = ws[0].shape[2], ws[0].shape[3]
    cw = ys[0].shape[1] * ys[0].shape[3]
    r = _choose_block_rows(ys[0].shape[2], cw, kh)
    # rebuild (batched) rather than stream forward-saved operators
    if _use_built_blocks(cw, r):
        d_stack, mats, _ = _chain_build_blocks(jnp.stack(ws),
                                               ys[0].shape[2],
                                               ys[0].shape[3])
        def apply_t(g_o, i):
            return _apply_blocks_t(g_o, d_stack[i], mats[i], kh)
    else:
        t_inv, _, p = _chain_build(jnp.stack(ws), ys[0].shape[2],
                                   ys[0].shape[3])
        def apply_t(g_o, i):
            return _apply_built_t(g_o, t_inv[i],
                                  None if p is None else p[i], kh)
    dws = [None] * len(ws)
    g = g_ct
    for i in reversed(range(len(ws))):
        ax = _CHAIN_FLIPS[orders[i]]
        g_o = jnp.flip(g, ax) if ax else g
        dx_o = apply_t(g_o, i)
        y_pad = jnp.pad(ys[i], ((0, 0), (0, 0), (kh - 1, 0),
                                (kw - 1, 0)))
        dws[i] = -_wgrad(dx_o, y_pad, kh, kw)
        g = jnp.flip(dx_o, ax) if ax else dx_o
    return g, tuple(dws)


inv_conv_chain_solve_batched.defvjp(_chainb_fwd, _chainb_bwd)


# ---------------------------------------------------------------------------
# Dense oracle (tests / exact paths) — the sparse-Toeplitz equivalent
# ---------------------------------------------------------------------------

def dense_operator(w_eff, c, h, width, groups: int = 1):
    """Materialize T as a dense (CHW, CHW) matrix (flattened NCHW order).

    Equivalent of ``get_sparse_toeplitz`` (``inf/utils/toeplitz.py:9-44``)
    for the TL-padded masked conv; used by exact logdet / exact inverse
    paths and as the test oracle.
    """
    eye = jnp.eye(c * h * width, dtype=jnp.float32)
    basis = eye.reshape(c * h * width, c, h, width)
    cols = masked_conv_apply(basis, w_eff, groups)
    return cols.reshape(c * h * width, c * h * width).T

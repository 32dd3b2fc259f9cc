"""Fused multi-order inverse-conv chain — one Pallas kernel per InvFlowUnit.

Round-1 measurement showed a *per-layer* Pallas solve losing to the XLA
block scan everywhere (fixed custom-call/layout cost ~3 ms inside a large
program vs sub-ms of actual work). This module amortizes that cost over a
whole TL->TR->BL->BR ``InvFlowUnit`` (reference ``inf/layers/inv_flow.py:
28-53``): ONE ``pallas_call`` runs all four chained solves with the
activation tile resident in VMEM throughout, and fuses the per-block
``c = x @ T^{-T}`` projection into the sequential scan.

Key identity (why no data flips are needed inside the kernel)
-------------------------------------------------------------
Each order solves ``y = F_o^{-1} solve_TL(F_o x, w_o)`` where ``F_o`` flips
H and/or W (reference ``inf/layers/inv_conv.py:198-220``). All flips are
involutive permutations that respect the row-blocked layout, so they can be
absorbed into the solve matrices instead of the data:

  * W-flip: conjugate ``T_blk^{-1}`` and ``G`` by the within-row
    permutation ``P_w`` (reverse the W-major chunks of each CW row vector).
  * H-flip: additionally conjugate by within-block row reversal, run the
    block scan top-down instead of bottom-up, and take the carry from the
    FIRST ``KH-1`` rows of each solved block instead of the last.

With ``y_b`` the b-th row block and ``carry`` the neighbouring ``KH-1``
rows of the previously solved block, every order reduces to the same
recurrence on unflipped data:

    y_b = x_b @ T_eff^T - carry @ G_eff^T

The backward pass is *again* a 4-order chain: the cotangent recurrence
``g_{o-1} = (flip2 . F_o) solve_TL((flip2 . F_o) g_o, w_o^T)`` (flip2 =
flip both axes) walks the orders in reverse with complementary
orientations and channel-transposed kernels — so the same kernel runs the
backward solves, and the weight gradients are four ordinary conv
weight-grads on the phase outputs (all phases are written out by the
forward kernel as VJP residuals).

This replaces the reference backward kernels' impulse-response correlation
and 6-D sensitivity tensor (``inv_conv_with_bp_kernel_general.cu:272-629``)
with two fused kernel calls + 4 convs per unit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .inv_conv import (_block_toeplitz_inverse, _prev_block, _row_matrices,
                       _transpose_kernel, _wgrad)

_HI = lax.Precision.HIGHEST

# (flip_h, flip_w) per pad order — same convention as layers.inv_flow.
ORDER_FLAGS = {
    "TL": (False, False),
    "TR": (False, True),
    "BL": (True, False),
    "BR": (True, True),
}

# flip2 . F_o : the complementary orientation used by the backward chain.
_COMPLEMENT = {"TL": "BR", "TR": "BL", "BL": "TR", "BR": "TL"}


# ---------------------------------------------------------------------------
# Shape policy
# ---------------------------------------------------------------------------

def choose_block_rows_fused(h: int, cw: int, kh: int):
    """(rows per block, zero-padded tail rows) for the fused kernel.

    H need not be an exact multiple of R: the tail of the last block is
    zero-padded to the block boundary and masked back to zero in-kernel
    after every phase, which keeps the padded system exactly equivalent to
    the unpadded one in BOTH scan directions (top-down orders never read
    the pad; bottom-up orders read it as the zeros it must be). Exact
    divisors are still preferred (no mask op); R must reach back at most
    one block (R >= KH-1) and keep the dense per-block operator MXU-sized.
    Returns None when no usable block size exists (then nb would be 1 and
    the plain XLA einsum path owns the shape anyway)."""
    cands = list(range(max(kh - 1, 1), h))      # r < h  =>  nb >= 2
    if not cands:
        return None
    fitting = [r for r in cands if r * cw <= 1024]
    pool = fitting or [min(cands)]
    divisors = [r for r in pool if h % r == 0]
    r = min(divisors or pool,
            key=lambda r: (abs(r * cw - 512), (-h) % r))
    return r, (-h) % r


def _batch_tile(b, n, nb, rcw, kcw):
    """Batch tile fitting the VMEM budget (double-buffered input and
    output blocks + the per-order matrices + the carry). When the whole
    batch fits, use it; otherwise split the batch EVENLY over the minimal
    number of grid steps (rounded up to the f32 sublane multiple) so the
    padded tail stays small — a greedy max tile at e.g. b=100/cap=96
    would run a second grid step that is 92% padding."""
    budget = 10 * 1024 * 1024 // 4                       # floats
    budget -= n * rcw * (rcw + kcw)                      # T_eff + G_eff
    per_b = 2 * nb * rcw * (1 + n) + kcw                 # x, y dbl-buffered
    cap = budget // max(1, per_b)
    if cap < 8:
        return None
    if b <= cap:
        return b          # one tile == the whole (padded) batch dim: the
                          # Pallas sublane rule allows full-dim blocks
    steps = -(-b // cap)
    bt = -(-(-(-b // steps)) // 8) * 8                   # even split, ^8
    bt = min(bt, cap)
    # Multi-tile blocks MUST keep the sublane (second-to-last) dim a
    # multiple of 8 — min() with the cap can break that (found compiled
    # on TPU at imagenet32 batch 256: cap=55 -> bt=55 rejected by the
    # Pallas lowering; interpret mode never enforces it).
    return bt - bt % 8


def fused_viable(x_shape, kernel_size, orders, groups: int = 1):
    """True iff the fused kernel supports this (shape, kernel, orders).

    Grouped kernels are handled by dense block-diagonal expansion
    (:func:`expand_grouped_kernel`) — the level-2 all-orders-one-launch
    class (``cinc_cuda_kernel_level2.cu:97-99``) — so ``groups`` only
    needs to divide the channel count."""
    b, c, h, w = x_shape
    kh, kw = kernel_size
    if kh < 2 or c % max(groups, 1) != 0:
        return False
    if any(o not in ORDER_FLAGS for o in orders):
        return False
    cw = c * w
    rp = choose_block_rows_fused(h, cw, kh)
    if rp is None or rp[0] * cw > 2048:
        return False
    r, pad = rp
    nb = -(-h // r)
    return _batch_tile(b, len(orders), nb, r * cw, (kh - 1) * cw) is not None


# ---------------------------------------------------------------------------
# Permutation-conjugated solve matrices
# ---------------------------------------------------------------------------

def _cw_perm(width, c, fw):
    i = jnp.arange(width * c)
    if not fw:
        return i
    w, ch = i // c, i % c
    return (width - 1 - w) * c + ch


def _rcw_perm(r, width, c, fh, fw):
    cw = width * c
    i = jnp.arange(r * cw)
    rr, ii = i // cw, i % cw
    rn = (r - 1 - rr) if fh else rr
    return rn * cw + _cw_perm(width, c, fw)[ii]


def _kcw_perm(kt, width, c, fh, fw):
    cw = width * c
    i = jnp.arange(kt * cw)
    t, ii = i // cw, i % cw
    tn = (kt - 1 - t) if fh else t
    return tn * cw + _cw_perm(width, c, fw)[ii]


def _phase_matrices(w_eff, order, width, r):
    """(T_eff, G_eff) for one order: the blocked solve matrices conjugated
    by the order's flip permutations, so the kernel runs on unflipped data."""
    c = w_eff.shape[0]
    kh = w_eff.shape[2]
    fh, fw = ORDER_FLAGS[order]
    mats = _row_matrices(w_eff, width)
    t_inv = _block_toeplitz_inverse(mats, r)
    g = jnp.matmul(t_inv, _prev_block(mats, r), precision=_HI)
    q = _rcw_perm(r, width, c, fh, fw)
    s = _kcw_perm(kh - 1, width, c, fh, fw)
    return t_inv[q][:, q], g[q][:, s]


# ---------------------------------------------------------------------------
# Layout helpers
# ---------------------------------------------------------------------------

def _to_blocks(x, r):
    """NCHW -> (NB, B, R*CW); rows flattened (w, c) as in the XLA solve."""
    b, c, h, width = x.shape
    rows = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, h, width * c)
    xb = rows.reshape(b, h // r, r * width * c)
    return jnp.transpose(xb, (1, 0, 2))


def _from_blocks(yb, c, h, width):
    """(NB, B, R*CW) -> NCHW."""
    nb, b, rcw = yb.shape
    rows = jnp.transpose(yb, (1, 0, 2)).reshape(b, h, width * c)
    y = rows.reshape(b, h, width, c)
    return jnp.transpose(y, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _chain_kernel(dirs, nb, bt, rcw, kcw, pad_cw=0):
    """Static-unrolled over orders; each order is a fori_loop over row
    blocks with the KH-1-row carry in registers. Phase o reads phase o-1's
    output in place (VMEM), so the whole chain never touches HBM between
    orders — the opposite of the reference's per-diagonal launch+sync
    (``inv_conv_with_bp_kernel_general.cu:97-126``).

    ``pad_cw > 0``: the last ``pad_cw`` columns of the LAST block are
    zero-padded tail rows (non-divisor heights). They are re-zeroed after
    every phase so the next bottom-up phase reads the exact zeros the
    padded system requires; top-down phases never read them."""
    n = len(dirs)

    def kernel(x_ref, t_ref, g_ref, y_ref):
        keep = (lax.broadcasted_iota(jnp.int32, (1, rcw), 1)
                < rcw - pad_cw) if pad_cw else None
        for o in range(n):
            fh = dirs[o]

            def body(i, carry, o=o, fh=fh):
                m = (nb - 1 - i) if fh else i
                xm = x_ref[m] if o == 0 else y_ref[o - 1, m]
                v = lax.dot_general(
                    xm, t_ref[o],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_HI)
                v = v - lax.dot_general(
                    carry, g_ref[o],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_HI)
                if pad_cw:
                    v = jnp.where(jnp.logical_or(m != nb - 1, keep), v, 0.0)
                y_ref[o, m] = v
                return v[:, :kcw] if fh else v[:, rcw - kcw:]

            lax.fori_loop(0, nb, body, jnp.zeros((bt, kcw), jnp.float32))

    return kernel


def _fused_phases_raw(xb, t_all, g_all, dirs, kcw, pad_cw=0,
                      interpret=False):
    """Run the chain; returns stacked per-order outputs (N, NB, B, RCW)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, b, rcw = xb.shape
    n = t_all.shape[0]
    bt = _batch_tile(b, n, nb, rcw, kcw)
    assert bt, "caller must gate on fused_viable"
    b_pad = -(-b // bt) * bt
    if b_pad != b:
        xb = jnp.pad(xb, ((0, 0), (0, b_pad - b), (0, 0)))

    y = pl.pallas_call(
        _chain_kernel(dirs, nb, bt, rcw, kcw, pad_cw=pad_cw),
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((nb, bt, rcw), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, rcw, rcw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, rcw, kcw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, nb, bt, rcw), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nb, b_pad, rcw), jnp.float32),
        interpret=interpret,
    )(xb, t_all, g_all)
    return y[:, :, :b]


def _fused_forward(x, w_effs, orders, interpret=False):
    """All phase outputs of the chain, stacked raw (N, NB, B, RCW); row
    blocks cover the zero-padded height ceil(H/R)*R."""
    b, c, h, width = x.shape
    kh = w_effs[0].shape[2]
    r, pad = choose_block_rows_fused(h, c * width, kh)
    kcw = (kh - 1) * c * width
    phases = [_phase_matrices(w, o, width, r)
              for w, o in zip(w_effs, orders)]
    t_all = jnp.stack([p[0] for p in phases])
    g_all = jnp.stack([p[1] for p in phases])
    dirs = tuple(ORDER_FLAGS[o][0] for o in orders)
    x = x.astype(jnp.float32)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    xb = _to_blocks(x, r)
    return _fused_phases_raw(xb, t_all, g_all, dirs, kcw,
                             pad_cw=pad * c * width, interpret=interpret)


def _from_blocks_trim(yb, c, h, width):
    """(NB, B, RCW) -> NCHW, dropping zero-padded tail rows beyond H."""
    nb, b, rcw = yb.shape
    h_pad = nb * (rcw // (width * c))
    y = _from_blocks(yb, c, h_pad, width)
    return y[:, :, :h] if h_pad != h else y


def expand_grouped_kernel(w_eff, groups: int):
    """Dense (C, C, KH, KW) equivalent of a grouped kernel: the group
    blocks sit on the channel block-diagonal, zeros elsewhere. Lets the
    fused chain treat grouped solves (FincFlow level-2's all-orders-in-
    one-launch, ``cinc_cuda_kernel_level2.cu:97-99``) with the ungrouped
    machinery; the off-block zeros ride MXU matmuls the blocked solve
    performs dense anyway. Differentiable: autodiff through the scatter
    routes the dense weight cotangent back to the group blocks."""
    if groups == 1:
        return w_eff
    c = w_eff.shape[0]
    cg = c // groups
    wg = w_eff.reshape(groups, cg, cg, *w_eff.shape[2:])
    out = jnp.zeros((c, c) + tuple(w_eff.shape[2:]), w_eff.dtype)
    for g in range(groups):
        out = out.at[g * cg:(g + 1) * cg, g * cg:(g + 1) * cg].set(wg[g])
    return out


# ---------------------------------------------------------------------------
# Public op with parallel-backprop VJP
# ---------------------------------------------------------------------------

_INTERPRET = False  # force-flipped by tests

def _interpret() -> bool:
    # Compiled Pallas requires a TPU backend; everywhere else (CPU mesh
    # tests, debugging) the kernel runs in interpret mode — same
    # semantics, ordinary XLA ops under the hood.
    return _INTERPRET or jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_chain_solve(x, w_effs, orders):
    """Chained multi-order inverse-conv solve, one Pallas kernel.

    ``y = (solve_{o_n} . ... . solve_{o_1})(x)`` where each ``solve_o`` is
    the orientation-``o`` inverse of the masked convolution with (already
    masked) kernel ``w_effs[i]``. Semantically identical to chaining
    ``InvFlow`` layers; ldj of the chain is 0 (each factor is unit
    triangular). Caller must gate on :func:`fused_viable`.
    """
    phases = _fused_forward(x, w_effs, orders, interpret=_interpret())
    b, c, h, width = x.shape
    return _from_blocks_trim(phases[-1], c, h, width)


def _fused_fwd(x, w_effs, orders):
    phases = _fused_forward(x, w_effs, orders, interpret=_interpret())
    b, c, h, width = x.shape
    y = _from_blocks_trim(phases[-1], c, h, width)
    return y, (phases, tuple(w_effs), x.shape)


def _flip_axes(order):
    fh, fw = ORDER_FLAGS[order]
    return tuple(a for a, f in ((2, fh), (3, fw)) if f)


def _fused_bwd(orders, res, gy):
    phases, w_effs, x_shape = res
    b, c, h, width = x_shape
    n = len(orders)
    kh, kw = w_effs[0].shape[2], w_effs[0].shape[3]

    # Backward chain: complementary orientations, transposed kernels,
    # reverse order. Phase j of this call emits the cotangent on the input
    # of original layer l = n-1-j.
    back_orders = tuple(_COMPLEMENT[o] for o in reversed(orders))
    back_weffs = tuple(_transpose_kernel(w, 1) for w in reversed(w_effs))
    gphases = _fused_forward(gy, back_weffs, back_orders,
                             interpret=_interpret())

    dws = []
    for l, order in enumerate(orders):
        ax = _flip_axes(order)
        # canonical-frame cotangent on layer l's input / its solve output
        c_l = _from_blocks_trim(gphases[n - 1 - l], c, h, width)
        y_l = _from_blocks_trim(phases[l], c, h, width)
        dx_in = jnp.flip(c_l, ax) if ax else c_l
        y_in = jnp.flip(y_l, ax) if ax else y_l
        y_pad = jnp.pad(y_in, ((0, 0), (0, 0), (kh - 1, 0), (kw - 1, 0)))
        dws.append(-_wgrad(dx_in, y_pad, kh, kw))

    dx = _from_blocks_trim(gphases[-1], c, h, width)
    return dx, tuple(dws)


fused_chain_solve.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# XLA reference composition (oracle for tests / fallback)
# ---------------------------------------------------------------------------

def chain_solve_reference(x, w_effs, orders):
    """Same chain via the per-layer XLA solve (ops.inv_conv)."""
    from .inv_conv import inv_conv_solve
    for w, order in zip(w_effs, orders):
        ax = _flip_axes(order)
        x = jnp.flip(x, ax) if ax else x
        x = inv_conv_solve(x, w, 1)
        x = jnp.flip(x, ax) if ax else x
    return x


def _manual_or_single_device() -> bool:
    """True when a pallas_call cannot be split by XLA's automatic
    partitioner: either only one device exists, or the surrounding trace
    is fully manual SPMD (inside a shard_map over every mesh axis — each
    shard runs its own whole kernel). jit+NamedSharding automatic
    partitioning of a pallas_call is the unvalidated case this guards."""
    if len(jax.devices()) == 1:
        return True
    am = jax.sharding.get_abstract_mesh()
    if am.empty:
        return False
    manual = getattr(jax.sharding.AxisType, "Manual", None)
    return all(t == manual for t in am.axis_types)


def select_fused(solver, x_shape, kernel_size, orders, groups=1):
    """Shared FUSION-selection policy for InvFlow / InvFlowUnit:
    'exact'/'jacobi' never fuse; 'fused' fuses whenever the shape is
    viable (silently falling back to the exact XLA solve otherwise — the
    gate is a shape property, not an error); 'auto' NEVER fuses — it
    resolves to exact or jacobi per shape (ops/solver_policy.py).

    The 'auto'-never-fuses policy is measurement-driven (slope method,
    results/true_step_time.jsonl, 2026-08-17): every earlier verdict
    that favored the fused Pallas chain kernel was synced with
    ``block_until_ready``, which on this backend acks at enqueue — it
    measured dispatch rate, not device time. Under the truthful slope
    A/B the exact composition beats the fused kernel end-to-end in
    training at every measured shape class: imagenet32 unit b100
    80.1 vs 97.3 ms/step (1.21x), b1024+remat 410.5 vs 514.1 (1.25x),
    glow-mnist unit b100 14.3 vs 19.3 (1.35x). The forward/sampling
    direction was re-adjudicated 2026-08-18 (eval-direction slope
    cases): exact wins there too, ~2.1x at both shape classes, so the
    kernel has NO measured niche. Explicit ``solver='fused'`` remains
    available (and value-verified compiled on TPU) as measured
    infrastructure for future shapes/backends."""
    if solver in ("exact", "jacobi", "auto"):
        return False
    if not fused_viable(x_shape, kernel_size, orders, groups=groups):
        return False
    return True                                     # 'fused'

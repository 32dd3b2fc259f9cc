"""Inverse-Flow convolution layers (the paper's contribution).

Reference parity: ``inf/layers/inv_conv.py:94-513`` (``inv_flow_with_pad`` /
``inv_flow_no_pad``) and ``inf/layers/inv_flow.py:14-53`` (``Inv_FlowUnit``,
the TL->TR->BL->BR chain). The training-direction transform is the INVERSE
of a masked convolution (computed by :func:`inv_conv_solve`, an MXU
row-blocked triangular solve with parallel backprop via custom VJP); the
sampling direction is the masked convolution itself.

Deviations from the reference, by design (SURVEY §7):
  * The center-tap mask is applied INSIDE the op (``apply_mask``), so
    protected taps carry exact zero gradient — no ``reset_gradients`` /
    ``clear_grad`` pass (``inv_conv.py:223-231``, ``experiment.py:15-21``).
  * The init/mask disagreement (``inv_conv.py:170`` forces tap
    ``[c, -1, -1, -1] = 1`` while the mask protects ``[c, c, -1, -1]``,
    ``:233-248``) is resolved to the ``PaddedConv2d`` convention
    (``conv.py:69-71``): the identity lives on the masked center tap, raw
    params are initialized to small noise, so T starts near identity.
  * ldj is EXACTLY 0 in both cheap and exact modes: T is unit lower
    triangular in raster order by construction, so ``slogdet(T) = 0``
    identically (the reference burns an O((CHW)^3) dense slogdet to compute
    this zero on the expensive path, ``inv_conv.py:322-332``).
  * Orientation flips act on data only; weights are stored in canonical TL
    orientation (reference flips the stored weights in-place,
    ``inv_conv.py:198-220``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.inv_conv import (apply_mask, inv_conv_solve,
                            inv_conv_solve_jacobi_implicit,
                            masked_conv_apply)
from .base import FlowLayer, zeros_ldj

ORDERS = ("TL", "TR", "BL", "BR")


def _flip_axes(order: str):
    return {"TL": (), "TR": (3,), "BL": (2,), "BR": (2, 3)}[order]


def _xavier_noise(rng, shape, gain=0.01):
    fan_in = shape[1] * shape[2] * shape[3]
    fan_out = shape[0] * shape[2] * shape[3]
    std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(rng, shape, jnp.float32)


@dataclass(frozen=True)
class InvFlow(FlowLayer):
    """``inv_flow_with_pad`` equivalent (``inv_conv.py:94-364``).

    forward  (training): y = T^{-1} x   — inverse of the masked conv
    inverse  (sampling): x = T y        — the masked conv itself
    ldj = 0 exactly (unit-triangular T).
    """

    channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    order: str = "TL"
    groups: int = 1
    # 'exact'  = blocked triangular solve (custom-VJP parallel backprop) —
    #            the DEFAULT: the slope method
    #            (results/true_step_time.jsonl) shows the exact
    #            composition beating the fused Pallas kernel end-to-end
    #            in training at every measured shape class (1.2-1.35x);
    # 'auto'   = shape-aware: resolves per activation shape via
    #            ops/solver_policy.resolve_auto — exact everywhere
    #            except the measured tall-thin window (long axis in
    #            [64, 512], short*channels <= 2), where the
    #            height-independent Jacobi solve wins up to 6.7x
    #            (BASELINE.md "Timescaling" table);
    # 'fused'  = single-order fused Pallas kernel (ops/fused_chain.py),
    #            explicit opt-in;
    # 'jacobi' = height-independent Neumann iterations (implicit-VJP,
    # O(1) memory) — for tall images / fast sampling. ``jacobi_tol > 0``
    # stops early once max|residual| < tol (``jacobi_iters`` becomes an
    # upper bound). When 'auto' routes here the solve ignores the bare
    # ``jacobi_iters`` truncation and runs residual-guarded with the
    # nilpotency iteration cap instead (exact at any weight magnitude;
    # see ``_jacobi_params``).
    solver: str = "exact"
    jacobi_iters: int = 12
    jacobi_tol: float = 0.0

    def __post_init__(self):
        assert self.order in ORDERS, f"unknown order: {self.order}"
        assert self.solver in ("auto", "exact", "fused", "jacobi"), \
            self.solver
        assert self.channels % self.groups == 0

    def init(self, rng, shape):
        kh, kw = self.kernel_size
        w = _xavier_noise(
            rng, (self.channels, self.channels // self.groups, kh, kw))
        return {"w": w}, shape

    def _w_eff(self, params):
        w = params["w"]
        if self.groups == 1:
            return apply_mask(w)
        cg = self.channels // self.groups
        wg = w.reshape(self.groups, cg, cg, *self.kernel_size)
        wg = jax.vmap(apply_mask)(wg)
        return wg.reshape(self.channels, cg, *self.kernel_size)

    def _use_fused(self, x_shape):
        # NOTE: 'fused' at a non-viable shape silently falls back to the
        # exact XLA solve (same semantics) — the gate is a shape
        # property, not an error; check fused_viable() to know which
        # path a given shape takes.
        from ..ops.fused_chain import select_fused
        return select_fused(self.solver, x_shape, self.kernel_size,
                            (self.order,), groups=self.groups)

    def _eff_solver(self, x_shape):
        """'auto' resolves per shape (ops/solver_policy.py — the single
        home of the measured exact/Jacobi crossover table)."""
        if self.solver != "auto":
            return self.solver
        from ..ops.solver_policy import resolve_auto
        return resolve_auto(x_shape, self.kernel_size, self.groups)

    def _jacobi_solve(self, x, w_eff):
        """The Jacobi solve at this shape. Explicit ``solver='jacobi'``
        honors the user's (``jacobi_iters``, ``jacobi_tol``) verbatim;
        a POLICY-routed solve (``solver='auto'``) runs residual-guarded
        with the nilpotency iteration cap, so 'auto' keeps exact
        semantics at ANY weight magnitude (ops/solver_policy.py:
        ``auto_jacobi_params``)."""
        if self.solver != "auto":
            return inv_conv_solve_jacobi_implicit(
                x, w_eff, self.groups, self.jacobi_iters, self.jacobi_tol)
        from ..ops.inv_conv import inv_conv_solve_jacobi_guarded_implicit
        from ..ops.solver_policy import auto_jacobi_params
        fast, cap, tol = auto_jacobi_params(
            x.shape, self.groups, self.jacobi_iters, self.jacobi_tol)
        return inv_conv_solve_jacobi_guarded_implicit(
            x, w_eff, self.groups, fast, cap, tol)

    def prepare(self, params, shape):
        # Prepared-operator path (ops/inv_conv.py module note): exact
        # solver, ungrouped, kh >= 2. The operator is built from the
        # CANONICAL kernel — order flips act on the data, so one aux
        # serves any order at the same activation shape.
        from ..ops.inv_conv import PREPARED_SOLVE, solve_prepare
        if (not PREPARED_SOLVE or self.solver not in ("auto", "exact")
                or self.groups != 1):
            return None
        if self._eff_solver((1,) + tuple(shape)) != "exact":
            return None
        if self._use_fused((1,) + tuple(shape)):
            return None
        _, h, w = shape
        # stop_gradient is REQUIRED, not cosmetic: the custom VJP of
        # inv_conv_solve_prepared carries the total weight gradient in
        # dw and declares the t_inv/g cotangents zero — but without
        # stopping, autodiff still (a) accumulates those explicit zeros
        # into stacked scan-input gradients and (b) runs the full
        # transpose of the vmapped Newton-Schulz build on them. Slope-
        # measured: that machinery cost +43% end-to-end (first
        # noprep-vs-prep A/B row in results/true_step_time.jsonl).
        return jax.lax.stop_gradient(solve_prepare(self._w_eff(params),
                                                   h, w))

    def forward_prepared(self, params, aux, x, rng=None):
        if aux is None:
            return self.forward(params, x, rng=rng)
        from ..ops.inv_conv import inv_conv_solve_prepared
        ax = _flip_axes(self.order)
        xf = jnp.flip(x, ax) if ax else x
        y = inv_conv_solve_prepared(xf, self._w_eff(params),
                                    aux["t_inv"], aux["g"])
        y = jnp.flip(y, ax) if ax else y
        return y, zeros_ldj(y)

    def forward(self, params, x, rng=None):
        if self._use_fused(x.shape):
            # single-order fused kernel: the orientation flip is absorbed
            # into the conjugated solve matrices, no data flips at all;
            # grouped kernels run via dense block-diagonal expansion
            from ..ops.fused_chain import (expand_grouped_kernel,
                                           fused_chain_solve)
            w = expand_grouped_kernel(self._w_eff(params), self.groups)
            y = fused_chain_solve(x, (w,), (self.order,))
            return y, zeros_ldj(y)
        from ..ops import inv_conv as _ic
        if _ic.PREPARED_SOLVE:
            aux = self.prepare(params, x.shape[1:])
            if aux is not None:
                # self-prepared: even un-hoisted this halves the operator
                # builds (the VJP reuses t_inv for the transposed solve)
                return self.forward_prepared(params, aux, x, rng=rng)
        ax = _flip_axes(self.order)
        x = jnp.flip(x, ax) if ax else x
        if self._eff_solver(x.shape) == "jacobi":
            y = self._jacobi_solve(x, self._w_eff(params))
        else:
            y = inv_conv_solve(x, self._w_eff(params), self.groups)
        y = jnp.flip(y, ax) if ax else y
        return y, zeros_ldj(y)

    def inverse(self, params, z, rng=None):
        ax = _flip_axes(self.order)
        z = jnp.flip(z, ax) if ax else z
        x = masked_conv_apply(z, self._w_eff(params), self.groups)
        x = jnp.flip(x, ax) if ax else x
        return x


# The reference's no-pad variant calls the same CUDA kernel (whose border
# truncation equals TL zero padding), so it is the TL layer without flips
# (``inv_conv.py:365-481``).
@dataclass(frozen=True)
class InvFlowNoPad(InvFlow):
    order: str = "TL"


@dataclass(frozen=True)
class InvFlowUnit(FlowLayer):
    """Four chained InvFlow convs, TL -> TR -> BL -> BR
    (``inf/layers/inv_flow.py:28-53``).

    ``solver='fused'`` runs all four solves in ONE Pallas kernel
    (``ops/fused_chain.py``: flips absorbed into permutation-conjugated
    solve matrices, activations VMEM-resident across orders), falling back
    to the per-layer XLA path when the shape is unsupported. ``'auto'``
    (default) resolves per activation shape via
    ``ops/solver_policy.resolve_auto``: the per-layer blocked XLA exact
    solve everywhere except the measured tall-thin window (long axis in
    [64, 512], short axis x channels <= 2), where the
    height-independent Jacobi iteration wins up to 6.7x. Both verdicts
    are slope-measured (BASELINE.md "Measurement methodology"): every
    earlier number favoring the fused kernel was synced with an
    enqueue-ack barrier; under truthful same-session slope A/Bs the
    exact composition wins end-to-end training at every measured
    square/production shape class (imagenet32 unit 1.21-1.25x,
    glow-mnist unit 1.35x, results/true_step_time.jsonl). ``'fused'``
    remains an explicit opt-in (value-verified compiled on TPU) for the
    forward/sampling direction and future shape classes.
    """

    channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    # 'jacobi': every order solved by height-independent Neumann
    # iterations (masked convs — fully MXU-parallel, implicit-function
    # VJP, O(1) memory). Explicit 'jacobi' truncates at ``jacobi_iters``
    # Neumann terms (f32 round-off at production weight scales — parity
    # asserted in tests/test_solver_policy.py); 'auto' routes to it only
    # inside the measured tall-thin win window (ops/solver_policy.py)
    # and runs residual-guarded with the nilpotency iteration cap so the
    # routed solve stays exact at any weight magnitude.
    solver: str = "auto"
    jacobi_iters: int = 12
    jacobi_tol: float = 0.0

    def __post_init__(self):
        assert self.solver in ("auto", "exact", "fused", "jacobi"), \
            self.solver

    def _convs(self, per_layer):
        return tuple(InvFlow(self.channels, self.kernel_size, order=o,
                             solver=per_layer,
                             jacobi_iters=self.jacobi_iters,
                             jacobi_tol=self.jacobi_tol)
                     for o in ORDERS)

    @property
    def convs(self):
        # fallback composition is the exact XLA solve (measured
        # end-to-end, SINGLE-order fused solves lose to XLA — only the
        # whole-unit fusion wins) unless jacobi was requested explicitly
        return self._convs("jacobi" if self.solver == "jacobi"
                           else "exact")

    def _eff_solver(self, x_shape):
        """'auto' resolves per shape (ops/solver_policy.py)."""
        if self.solver != "auto":
            return self.solver
        from ..ops.solver_policy import resolve_auto
        return resolve_auto(x_shape, self.kernel_size)

    def init(self, rng, shape):
        params = []
        for conv in self.convs:
            rng, sub = jax.random.split(rng)
            p, shape = conv.init(sub, shape)
            params.append(p)
        return {"convs": params}, shape

    def _use_fused(self, x_shape):
        from ..ops.fused_chain import select_fused
        return select_fused(self.solver, x_shape, self.kernel_size, ORDERS)

    def prepare(self, params, shape):
        if self.solver == "fused" or self._use_fused((1,) + tuple(shape)):
            return None
        if self._eff_solver((1,) + tuple(shape)) == "jacobi":
            return None
        auxes = [conv.prepare(p, shape)
                 for conv, p in zip(self.convs, params["convs"])]
        return auxes if any(a is not None for a in auxes) else None

    def forward_prepared(self, params, aux, x, rng=None):
        if aux is None or self._use_fused(x.shape):
            return self.forward(params, x, rng=rng)
        ldj = zeros_ldj(x)
        for conv, p, a in zip(self.convs, params["convs"], aux):
            x, l = conv.forward_prepared(p, a, x)
            ldj = ldj + l
        return x, ldj

    def forward(self, params, x, rng=None):
        if self._use_fused(x.shape):
            from ..ops.fused_chain import fused_chain_solve
            w_effs = tuple(apply_mask(p["w"]) for p in params["convs"])
            y = fused_chain_solve(x, w_effs, ORDERS)
            return y, zeros_ldj(y)
        from ..ops import inv_conv as _ic
        if self._eff_solver(x.shape) == "jacobi":
            # per-layer Neumann solves (requested explicitly, or routed
            # by the 'auto' tall-thin policy); the chain restructures
            # below are exact-path only. Policy-routed convs stay 'auto'
            # so each solve picks up the residual guard + nilpotency cap
            # (InvFlow._jacobi_params) instead of a bare fixed-12 solve.
            ldj = zeros_ldj(x)
            per_layer = "jacobi" if self.solver == "jacobi" else "auto"
            for conv, p in zip(self._convs(per_layer), params["convs"]):
                x, l = conv.forward(p, x)
                ldj = ldj + l
            return x, ldj
        if _ic.UNIT_CHAIN_BATCHED and self.kernel_size[0] >= 2:
            # Exact path with ONE vmapped operator build across the 4
            # orders + backward t_inv reuse (2 batched builds per step
            # instead of 8 sequential ones — the 65%-of-step profile
            # line, ops/inv_conv.py UNIT_CHAIN_BATCHED note). Values and
            # gradients match the per-layer composition.
            w_effs = tuple(apply_mask(p["w"]) for p in params["convs"])
            y = _ic.inv_conv_chain_solve_batched(x, w_effs, ORDERS)
            return y, zeros_ldj(y)
        if _ic.UNIT_CHAIN_VJP:
            # Exact path through the whole-unit chain VJP: identical
            # values/gradients to the per-layer composition, but the 4
            # weight gradients land in ONE order-batched conv
            # (op-count-bound on TPU — see ops/inv_conv.py UNIT_CHAIN_VJP).
            w_effs = tuple(apply_mask(p["w"]) for p in params["convs"])
            y = _ic.inv_conv_chain_solve(x, w_effs, ORDERS)
            return y, zeros_ldj(y)
        ldj = zeros_ldj(x)
        for conv, p in zip(self.convs, params["convs"]):
            x, l = conv.forward(p, x)
            ldj = ldj + l
        return x, ldj

    def inverse(self, params, z, rng=None):
        for conv, p in zip(reversed(self.convs), reversed(params["convs"])):
            z = conv.inverse(p, z)
        return z

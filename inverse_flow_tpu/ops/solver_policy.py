"""Shape-aware resolution of ``solver='auto'`` — the ONE place the
measured exact/Jacobi crossover lives.

Reference context: the paper's headline scaling axis is time-vs-input-
size on tall images (``inf/experiments/if_timescaling.py:99-151``, sizes
``(1, 32k, 1)``), where the sequential depth of any triangular solve
grows with the long spatial axis. The rebuild has two exact-semantics
training-direction solvers:

* ``'exact'`` — row-blocked triangular solve (``ops/inv_conv.py``).
  Sequential depth ~ ceil(long_axis / row_block); per-step work is an
  MXU matmul that AMORTIZES as the image grows (measured per-pixel cost
  on squares FALLS 0.16 -> 0.046 us/px from s16 to s128).
* ``'jacobi'`` — Neumann fixed-point iteration
  (``inv_conv_solve_jacobi_implicit``). Each iteration is one masked
  conv, so wall-clock is INDEPENDENT of image height, at a ~iters-x
  conv-FLOP multiplier. With production-scale masked weights (the
  reference's ``weight_clamp=0.01`` regime; this repo's 0.01-gain
  Xavier init) 12 iterations reach f32 round-off — parity is asserted
  by ``tests/test_solver_policy.py`` on values AND gradients.

Measured crossover (slope method, TPU v5e, batch 128, 2 layers,
kernel 2x2, C=1 — ``results/timescale_slope.jsonl``; BASELINE.md
"Timescaling" table):

    shape          exact ms   jacobi ms   winner
    16x16           0.042      0.100      exact
    32x32           0.079      0.384      exact
    64x64           0.205      1.412      exact
    128x128         0.754      5.779      exact
    tall (1,128,1)  0.116      0.017      jacobi  (6.7x)
    tall (1,512,1)  0.428      0.186      jacobi  (2.3x)
    tall (1,2048,1) 0.519      0.753      exact

Squares always lose (Jacobi's conv-FLOP multiplier dominates); on the
paper's literal tall axis Jacobi's height-independence wins in a middle
window, with exact retaking at H=2048 where its per-row matmuls have
amortized. Production configs (imagenet32 whole-unit A/B: exact wins
4/4, ratio 0.67) stay exact.

The policy below routes to Jacobi only INSIDE the measured win region —
TALL thin images (H the long axis, W x per-group channels <= 2, i.e.
the exact solve is sequential-depth-bound, not FLOP-bound) with H in
the measured [64, 512] window at kernels within the measured 2x2
footprint — and to the exact solve everywhere else, including every
unmeasured regime. Wide (W-long) shapes are NOT the transpose of the
tall case for the exact solver — its scan runs over ROWS, so an H=1
image is a single log-depth block solve — and were never measured, so
they stay exact. A policy-routed Jacobi solve additionally runs
residual-guarded with the nilpotency iteration cap
(:func:`auto_jacobi_params`), so routing never changes semantics even
when trained weights leave the small-init regime the 12-term
truncation relies on.
"""

from __future__ import annotations

# Measured-window bounds (see table above). Endpoints are the measured
# win region: 128 and 512 won outright; 64 is included per the exact
# solver's sequential-depth model (depth halves from 128 while Jacobi's
# cost is constant, and the 128 margin is 6.7x); 2048 lost, so the
# window closes at the last measured win.
JACOBI_LONG_MIN = 64
JACOBI_LONG_MAX = 512
# Thinness gate: the short spatial axis times per-group channels bounds
# the exact solver's per-row-block matmul width. Measured at
# short*cg = 1 (the paper's axis); 2 keeps the same depth-bound regime.
# Larger widths make the exact solve's matmuls efficient enough that
# squares-style verdicts apply -> exact.
JACOBI_THIN_MAX = 2
# Every crossover row was measured at kernel 2x2 (the timescaling
# config); larger kernels change BOTH arms' per-step cost, so they stay
# on the exact default until measured.
JACOBI_KERNEL_MAX = 2
# Residual guard for policy-routed Jacobi (see auto_jacobi_params):
# the guarded solve's lax.cond fallback fires when the post-fast-path
# step difference exceeds tol * (1 + max|x|). Must sit ABOVE the conv's
# numeric noise floor — measured ~8e-5 relative at the adopted
# SOLVE_PRECISION='high' on TPU (~2e-7 at 'highest'); a tighter tol
# makes the cond unfireable, the cap branch run every step, and auto
# LOSE 8x end-to-end (measured). 1e-3 is 10x above the floor and 10x
# below the >= 1e-2 truncation error the guard exists to catch.
JACOBI_AUTO_TOL = 1e-3
# Smallest user jacobi_tol honored verbatim by the policy route (2.5x
# above the measured ~8e-5 floor — can actually fire); anything smaller
# is replaced by JACOBI_AUTO_TOL.
JACOBI_TOL_MIN = 2e-4


def resolve_auto(x_shape, kernel_size=(3, 3), groups: int = 1) -> str:
    """Resolve ``solver='auto'`` for one activation shape.

    ``x_shape`` is ``(B, C, H, W)`` (or ``(C, H, W)``); returns
    ``'jacobi'`` inside the measured tall-thin win window, ``'exact'``
    everywhere else. Shapes are static under jit, so this is ordinary
    Python executed at trace time.

    The window is deliberately the MEASURED region only: H must be the
    long axis (every crossover row is a tall ``(1, H, 1)`` image — and
    the exact solver's sequential depth is ``ceil(H / row_block)``, so a
    wide ``(1, 1, W)`` image is a SINGLE log-depth block solve for it,
    not the transpose of the tall case), and the kernel must be within
    the measured 2x2 footprint.
    """
    c, h, w = (int(x_shape[-3]), int(x_shape[-2]), int(x_shape[-1]))
    cg = c // max(groups, 1)
    if (h >= w
            and w * cg <= JACOBI_THIN_MAX
            and JACOBI_LONG_MIN <= h <= JACOBI_LONG_MAX
            and max(kernel_size) <= JACOBI_KERNEL_MAX):
        return "jacobi"
    return "exact"


def auto_jacobi_params(x_shape, groups: int = 1,
                       requested_iters: int = 12,
                       requested_tol: float = 0.0):
    """Iteration budget for a POLICY-routed Jacobi solve:
    ``(fast_iters, cap_iters, tol)`` for
    :func:`~inverse_flow_tpu.ops.inv_conv.inv_conv_solve_jacobi_guarded_implicit`.

    A fixed 12-term Neumann truncation is only f32-exact while the
    masked weights stay near the small-init / ``weight_clamp=0.01``
    regime; trained weights can grow past it, and a silently wrong
    forward would also silently break ``forward∘inverse = id`` while
    still reporting ldj = 0. So when ``'auto'`` (rather than an explicit
    ``solver='jacobi'`` with user-chosen ``jacobi_iters``) selects the
    Jacobi path, the solve runs residual-guarded:

    * ``fast_iters`` = the layer's ``jacobi_iters`` (default 12) —
      branch-free fori_loop, the measured-fast program;
    * ``cap_iters`` = ``cg*H*W`` — the strict-triangular nilpotency
      index bound, at which the Neumann series is EXACT for any weight
      magnitude (inside the routed window this is <= 2*512 = 1024);
      the continuation to the cap sits behind a ``lax.cond`` and only
      executes when the post-fast-path residual exceeds ``tol``;
    * ``tol``   = the layer's ``jacobi_tol`` when it is at least
      ``JACOBI_TOL_MIN`` (honored verbatim — such thresholds sit above
      the conv's noise floor and CAN fire), else ``JACOBI_AUTO_TOL``.
      The guard's threshold is a routing-safety parameter, not the
      user's absolute convergence tol: the guarded solve compares the
      true residual RELATIVE to input scale, and any threshold below
      the conv's ~8e-5 noise floor can never fire — the cap branch
      would run every step, silently reintroducing the measured 8x
      regression. A user who wants exact absolute tol semantics should
      pick ``solver='jacobi'`` explicitly.

    (A tol-driven ``while_loop`` would be semantically equivalent but
    was measured ~15x slower end-to-end at the routed tall shapes —
    TPU control flow cannot pipeline across while iterations — hence
    the fori fast path + single guarded fallback.)
    """
    c, h, w = (int(x_shape[-3]), int(x_shape[-2]), int(x_shape[-1]))
    cg = c // max(groups, 1)
    nilpotency_cap = max(cg * h * w, requested_iters)
    tol = (requested_tol if requested_tol >= JACOBI_TOL_MIN
           else JACOBI_AUTO_TOL)
    return requested_iters, nilpotency_cap, tol

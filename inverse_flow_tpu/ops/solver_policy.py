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
thin images (short spatial axis and per-group channel count both tiny,
i.e. the exact solve is sequential-depth-bound, not FLOP-bound) with the
long axis in the measured [64, 512] window — and to the exact solve
everywhere else, including every unmeasured regime.
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


def resolve_auto(x_shape, kernel_size=(3, 3), groups: int = 1) -> str:
    """Resolve ``solver='auto'`` for one activation shape.

    ``x_shape`` is ``(B, C, H, W)`` (or ``(C, H, W)``); returns
    ``'jacobi'`` inside the measured tall-thin win window, ``'exact'``
    everywhere else. Shapes are static under jit, so this is ordinary
    Python executed at trace time.
    """
    c, h, w = (int(x_shape[-3]), int(x_shape[-2]), int(x_shape[-1]))
    long_ax, short_ax = max(h, w), min(h, w)
    cg = c // max(groups, 1)
    if (short_ax * cg <= JACOBI_THIN_MAX
            and JACOBI_LONG_MIN <= long_ax <= JACOBI_LONG_MAX):
        return "jacobi"
    return "exact"

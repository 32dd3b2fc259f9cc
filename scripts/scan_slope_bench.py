"""True device-time measurement on the tunneled backend (slope method).

Round-3 discovery (2026-08-17): ``jax.block_until_ready`` on this
backend returns at enqueue-ack, NOT device completion — a chained
4096^3 bf16 matmul scan "measured" 308 PFLOP/s, ~1500x the v5e peak
(/tmp/sol_probe.log). Every window timing that used block_until_ready
as its barrier therefore measured the tunnel's dispatch rate, not the
device. The only true completion barrier is a device->host VALUE read,
which costs an unknown session-dependent constant and degrades later
dispatch latency.

This harness cancels every per-dispatch constant instead of trying to
avoid it:

  1. build TWO programs that run the train step K times INSIDE one
     executable (``lax.scan`` over the step body) for K = K1 (small)
     and K = K2 (large);
  2. sync every trial with a single scalar ``float()`` read;
  3. interleave A/B trials in one session and take per-pair slopes
     ``(T_K2 - T_K1) / (K2 - K1)``.

Per-step device time falls out; dispatch ack, tunnel RTT, read cost and
their session-to-session drift cancel pair-wise. A known-FLOPs matmul
chain (``matmul_bf16`` / ``matmul_f32`` cases) validates the method:
its slope must land at-or-below the hardware peak, at a plausible MFU.

Usage:
  python scripts/scan_slope_bench.py matmul_bf16 --k1 8 --k2 40
  python scripts/scan_slope_bench.py glow_mnist --k1 4 --k2 36
Writes one JSON row (incrementally) to results/true_step_time.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


# ---------------------------------------------------------------------------
# Cases. Each builder returns (make_program, meta) where
# make_program(K) -> callable(seed) dispatching ONE executable that runs
# K chained steps and returns a scalar, and meta carries batch /
# flops_per_step when known.
# ---------------------------------------------------------------------------

def _train_case(build_flow, size, batch):
    def builder():
        import jax
        import jax.numpy as jnp
        import optax

        from inverse_flow_tpu.data import synthetic

        flow = build_flow()
        rng = jax.random.PRNGKey(0)
        x = jnp.asarray(synthetic.smooth_images(batch, size), jnp.float32)
        params, _ = flow.init(rng, size)
        params = flow.data_init(params, x, rng=rng)
        tx = optax.adam(1e-5)
        opt_state = tx.init(params)

        def one_step(p, o, r):
            def loss_fn(pp):
                return -jnp.mean(flow.forward(pp, x, rng=r)[1])
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o2 = tx.update(grads, o, p)
            p2 = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
            return p2, o2, loss

        def make_program(K):
            @jax.jit
            def run_K(p, o, r):
                def body(carry, i):
                    pp, oo = carry
                    pp, oo, loss = one_step(pp, oo, jax.random.fold_in(r, i))
                    return (pp, oo), loss
                (_, _), losses = jax.lax.scan(
                    body, (p, o), jnp.arange(K))
                return losses[-1]

            def dispatch(seed):
                return run_K(params, opt_state, jax.random.PRNGKey(seed))
            return dispatch

        return make_program, {"batch": batch}
    return builder


def _glow_mnist_flow(**kw):
    from inverse_flow_tpu.models.glow import build_glow
    args = dict(step_kind="inv_conv_no_pad", num_blocks=2, block_size=16,
                coupling_width=512, actnorm=True, split_prior=True,
                activation="Spline", n_bins=5, tail_bound=20.0)
    args.update(kw)
    return build_glow((1, 28, 28), **args)


def _imagenet32_flow(**kw):
    from inverse_flow_tpu.models.glow import build_glow
    args = dict(step_kind="inv_flow_unit", num_blocks=3, block_size=48,
                coupling_width=128, actnorm=True, split_prior=True,
                activation="SLR")
    args.update(kw)
    return build_glow((3, 32, 32), **args)


def _eval_case(build_flow, size, batch):
    """Forward-direction only (the model's training-direction transform
    with NO gradient): adjudicates forward/sampling-direction claims —
    for inv-flow units this is the solve chain exactly as sampling uses
    it in FincFlow/CInC (reference ``cinc_cuda_level2``'s sampling-only
    role, ``inf/layers/fincflow.py:79-101``)."""
    def builder():
        import jax
        import jax.numpy as jnp

        from inverse_flow_tpu.data import synthetic

        flow = build_flow()
        rng = jax.random.PRNGKey(0)
        x = jnp.asarray(synthetic.smooth_images(batch, size), jnp.float32)
        params, _ = flow.init(rng, size)
        params = flow.data_init(params, x, rng=rng)

        def make_program(K):
            @jax.jit
            def run_K(p, x0, r):
                # The flow's output latent does NOT have the input's
                # shape (squeeze/split-prior), so it cannot be the scan
                # carry. Carry a scalar accumulator instead and fold it
                # into the next input at 1e-20 scale: value-irrelevant,
                # but it serializes the iterations (no cross-iteration
                # dead code) exactly like the train-step cases.
                def body(acc, rr):
                    xin = x0 * (1.0 + acc * 1e-20)
                    y, ldj = flow.forward(p, xin, rng=rr)
                    return (acc + jnp.mean(y.astype(jnp.float32))
                            + jnp.mean(ldj)), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                      jax.random.split(r, K))
                return acc

            def dispatch(seed):
                return run_K(params, x * (1.0 + seed * 1e-6),
                             jax.random.PRNGKey(seed + 17))
            return dispatch

        return make_program, {"batch": batch}
    return builder


def _matmul_case(dtype_name, n=4096):
    def builder():
        import jax
        import jax.numpy as jnp

        dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), dt)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n), dt)

        def make_program(K):
            @jax.jit
            def run_K(a, b):
                def body(x, _):
                    y = jnp.dot(x, b, preferred_element_type=dt) * (1.0 / n)
                    return y, None
                y, _ = jax.lax.scan(body, a, None, length=K)
                return jnp.sum(y.astype(jnp.float32))

            def dispatch(seed):
                return run_K(a * (1.0 + seed * 1e-6), b)
            return dispatch

        return make_program, {"flops_per_step": 2.0 * n * n * n}
    return builder


# Import-time defaults of every op-level flag any wrapped case touches.
# Populated lazily (first touch records the pristine value); restored by
# _reset_op_flags() before EVERY program build so an override cannot
# leak into the other arm's trace — a leaked flag silently turns an A/B
# into A vs A (run_ab compiles both B programs AFTER both A programs).
_OP_FLAG_DEFAULTS = {}


def _reset_op_flags():
    import inverse_flow_tpu.ops.inv_conv as ic
    for k, v in _OP_FLAG_DEFAULTS.items():
        setattr(ic, k, v)


def _with_op_flags(case_builder, **flags):
    """Wrap a case so each make_program(K) sets module globals on
    ops.inv_conv right before tracing — lets one in-process A/B compile
    both implementations of an op-level switch (e.g. WGRAD_IMPL).
    Callers build programs via run_ab/main, which reset the flags to
    their recorded defaults before every build."""
    def builder():
        make, meta = case_builder()

        def make2(K):
            import inverse_flow_tpu.ops.inv_conv as ic
            for k, v in flags.items():
                _OP_FLAG_DEFAULTS.setdefault(k, getattr(ic, k))
                setattr(ic, k, v)
            return make(K)
        return make2, meta
    return builder


CASES = {
    # validation: known FLOPs, fast compile
    "matmul_bf16": _matmul_case("bfloat16"),
    "matmul_f32": _matmul_case("float32"),
    # flagship
    "glow_mnist": _train_case(_glow_mnist_flow, (1, 28, 28), 100),
    "glow_mnist_bf16": _train_case(
        lambda: _glow_mnist_flow(coupling_dtype="bfloat16"), (1, 28, 28),
        100),
    # production scale
    "imagenet32": _train_case(_imagenet32_flow, (3, 32, 32), 100),
    "imagenet32_b1024_remat": _train_case(
        lambda: _imagenet32_flow(remat=True), (3, 32, 32), 1024),
    "imagenet32_b1024": _train_case(
        lambda: _imagenet32_flow(), (3, 32, 32), 1024),
    "imagenet32_b1024_remat_bf16": _train_case(
        lambda: _imagenet32_flow(remat=True, coupling_dtype="bfloat16"),
        (3, 32, 32), 1024),
    "imagenet32_b2048_remat": _train_case(
        lambda: _imagenet32_flow(remat=True), (3, 32, 32), 2048),
    # no-remat arms: b1024 fits in HBM once coupling_remat (round-4
    # default) removed the coupling-net activation stash, and no-remat
    # won its slope A/B 1.081x (4/4). b2048 without whole-body remat is
    # the case that demonstrated the no-remat OOM boundary above b1024
    # (20.52 G > 15.75 G HBM — see STATUS.md); its case stays defined so
    # the boundary is re-checkable.
    "imagenet32_b2048": _train_case(
        lambda: _imagenet32_flow(), (3, 32, 32), 2048),
    "imagenet32_b1024_bf16": _train_case(
        lambda: _imagenet32_flow(coupling_dtype="bfloat16"),
        (3, 32, 32), 1024),
    "imagenet32_b4096_remat": _train_case(
        lambda: _imagenet32_flow(remat=True), (3, 32, 32), 4096),
    # bf16 couplings at b4096: the b1024 adjudication showed the
    # coupling convs go bandwidth-bound at production batch (1.029x
    # adopted); test whether the win persists under whole-body remat
    "imagenet32_b4096_remat_bf16": _train_case(
        lambda: _imagenet32_flow(remat=True, coupling_dtype="bfloat16"),
        (3, 32, 32), 4096),
    "imagenet32_b256": _train_case(
        lambda: _imagenet32_flow(), (3, 32, 32), 256),
    # solver A/B at both scales (true device-time verdicts).
    # NOTE post-adjudication: solver='auto' now resolves to exact, so the
    # fused arm must be requested explicitly (*_fused cases); the
    # historical 'imagenet32' / 'glow_mnist_units' rows in the jsonl
    # measured the fused kernel under the old auto policy.
    "imagenet32_exact": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact"),
        (3, 32, 32), 100),
    "imagenet32_fused": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_fused"),
        (3, 32, 32), 100),
    # Jacobi units at production scale: trades the exact solve's
    # sequential block recurrence + operator builds for 12 masked-conv
    # Neumann iterations per order — all MXU-parallel, batch-scaling
    "imagenet32_jacobi": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_jacobi"),
        (3, 32, 32), 100),
    "imagenet32_exact_bf16": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact",
                                 coupling_dtype="bfloat16"),
        (3, 32, 32), 100),
    "imagenet32_b1024_remat_exact": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact",
                                 remat=True), (3, 32, 32), 1024),
    # remat at SMALL batch: trades the scan's residual-stash DUS writes
    # + backward re-reads for one recompute forward — the same
    # recompute-beats-memory axis the prepared-operator A/B exposed
    "imagenet32_exact_remat": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact",
                                 remat=True), (3, 32, 32), 100),
    "imagenet32_b1024_remat_exact_bf16": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact",
                                 remat=True, coupling_dtype="bfloat16"),
        (3, 32, 32), 1024),
    # weight-gradient implementation A/B (ops/inv_conv.py WGRAD_IMPL):
    # 'patch' = shifted-slice stack + one dot_general (default);
    # 'conv' = batch-as-contraction convolution (the round-2 path that
    # profiled at 66% of the exact ImageNet32 step)
    # rows-per-block sweep (R_ROWS_OVERRIDE): the heuristic picks r=2 at
    # production CW=192-384; larger r halves the sequential scan length
    # per doubling at bigger operator-build cost — measured, not assumed
    "imagenet32_exact_r4": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        R_ROWS_OVERRIDE=4),
    "imagenet32_exact_r8": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        R_ROWS_OVERRIDE=8),
    "imagenet32_exact_rdefault": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        R_ROWS_OVERRIDE=None),
    "imagenet32_exact_wgpatch": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        WGRAD_IMPL="patch"),
    "imagenet32_exact_wgconv": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        WGRAD_IMPL="conv"),
    "glow_mnist_wgpatch": _with_op_flags(
        _train_case(_glow_mnist_flow, (1, 28, 28), 100),
        WGRAD_IMPL="patch"),
    "glow_mnist_wgconv": _with_op_flags(
        _train_case(_glow_mnist_flow, (1, 28, 28), 100),
        WGRAD_IMPL="conv"),
    "imagenet32_b1024_remat_exact_wgpatch": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        WGRAD_IMPL="patch"),
    "imagenet32_b1024_remat_exact_wgconv": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        WGRAD_IMPL="conv"),
    # weight-gradient PRECISION A/B (ops/inv_conv.py WGRAD_PRECISION):
    # the solve stays bf16x6, only the dW contraction's MXU pass count
    # changes. 'highest'=bf16x6, 'high'=bf16x3, 'default'=1 bf16 pass.
    "imagenet32_exact_wghi": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        WGRAD_IMPL="conv", WGRAD_PRECISION="highest"),
    "imagenet32_exact_wghigh": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        WGRAD_IMPL="conv", WGRAD_PRECISION="high"),
    "imagenet32_exact_wgdef": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        WGRAD_IMPL="conv", WGRAD_PRECISION="default"),
    "imagenet32_b1024_remat_exact_wghi": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        WGRAD_IMPL="conv", WGRAD_PRECISION="highest"),
    "imagenet32_b1024_remat_exact_wgdef": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        WGRAD_IMPL="conv", WGRAD_PRECISION="default"),
    "glow_mnist_wghi": _with_op_flags(
        _train_case(_glow_mnist_flow, (1, 28, 28), 100),
        WGRAD_IMPL="conv", WGRAD_PRECISION="highest"),
    "glow_mnist_wgdef": _with_op_flags(
        _train_case(_glow_mnist_flow, (1, 28, 28), 100),
        WGRAD_IMPL="conv", WGRAD_PRECISION="default"),
    # SOLVE precision A/B (ops/inv_conv.py SOLVE_PRECISION): pass count
    # of the Newton-Schulz operator builds + block-solve einsums (the
    # 65%-of-step entry in the post-wgrad-fix profile). 'high' (bf16x3)
    # is ~f32-accurate; 'default' is a ceiling probe only (1 bf16 pass
    # is not invertibility-safe).
    "imagenet32_exact_sphi": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        SOLVE_PRECISION="highest", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "imagenet32_exact_sphigh": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "imagenet32_exact_spdef": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        SOLVE_PRECISION="default", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    # FLOP-structure A/Bs (ops/inv_conv.py): M0_FACTORED = pixel-block
    # factorization cuts Newton-Schulz iterations from ceil(log2(C*W))
    # to ceil(log2(W)); SOLVE_APPLY='blocks' applies c = x @ T^{-T} via
    # the Toeplitz D-blocks (r(r+1)/2 of r^2 block products). Both are
    # pure-FLOP reductions, A/B'd against the same adopted precision
    # defaults.
    "imagenet32_exact_struct": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        M0_FACTORED=True, SOLVE_APPLY="blocks", PREPARED_SOLVE=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "imagenet32_exact_nostruct": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        M0_FACTORED=False, SOLVE_APPLY="dense", PREPARED_SOLVE=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "imagenet32_exact_m0only": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        M0_FACTORED=True, SOLVE_APPLY="dense", PREPARED_SOLVE=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "imagenet32_b1024_remat_exact_struct": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        M0_FACTORED=True, SOLVE_APPLY="blocks", PREPARED_SOLVE=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "imagenet32_b1024_remat_exact_nostruct": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        M0_FACTORED=False, SOLVE_APPLY="dense", PREPARED_SOLVE=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    # PREPARED-operator A/B (ops/inv_conv.py PREPARED_SOLVE): operator
    # build hoisted out of the depth scan (vmapped over K) + backward
    # t_inv reuse via the transposed block scan, vs the per-call
    # build-in-scan path. Solve/wgrad knobs pinned to the adopted
    # defaults so the A/B isolates the restructure.
    "imagenet32_exact_prep": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        PREPARED_SOLVE=True, SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "imagenet32_exact_noprep": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        PREPARED_SOLVE=False, SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "imagenet32_b1024_remat_exact_prep": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        PREPARED_SOLVE=True, SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "imagenet32_b1024_remat_exact_noprep": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        PREPARED_SOLVE=False, SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "glow_mnist_prep": _with_op_flags(
        _train_case(_glow_mnist_flow, (1, 28, 28), 100),
        PREPARED_SOLVE=True, SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    "glow_mnist_noprep": _with_op_flags(
        _train_case(_glow_mnist_flow, (1, 28, 28), 100),
        PREPARED_SOLVE=False, SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", UNIT_CHAIN_VJP=False),
    # whole-unit chain VJP A/B (ops/inv_conv.py UNIT_CHAIN_VJP): 'chain'
    # = one order-batched wgrad conv per unit; 'nochain' = per-layer
    # composition (4 separate wgrad convs per unit). Wgrad knobs pinned
    # so the A/B isolates the chain restructure.
    "imagenet32_exact_chain": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        UNIT_CHAIN_VJP=True, WGRAD_IMPL="conv", WGRAD_PRECISION="highest"),
    "imagenet32_exact_nochain": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        UNIT_CHAIN_VJP=False, WGRAD_IMPL="conv", WGRAD_PRECISION="highest"),
    "imagenet32_exact_chain_wgdef": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        UNIT_CHAIN_VJP=True, WGRAD_IMPL="conv", WGRAD_PRECISION="default"),
    "imagenet32_b1024_remat_exact_chain_wgdef": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        UNIT_CHAIN_VJP=True, WGRAD_IMPL="conv", WGRAD_PRECISION="default"),
    "imagenet32_b1024_remat_exact_nochain": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        UNIT_CHAIN_VJP=False, WGRAD_IMPL="conv", WGRAD_PRECISION="highest"),
    # BATCHED-BUILD chain A/B (ops/inv_conv.py UNIT_CHAIN_BATCHED): one
    # vmapped operator build across the unit's 4 orders + backward
    # t_inv reuse (2 batched builds/step vs 8 sequential), targeting the
    # 65%-of-step operator-rebuild profile line. Knobs pinned to adopted
    # defaults so the A/B isolates the restructure.
    "imagenet32_exact_chainbatch": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        UNIT_CHAIN_BATCHED=True, UNIT_CHAIN_VJP=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", PREPARED_SOLVE=False),
    "imagenet32_exact_nochainbatch": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        UNIT_CHAIN_BATCHED=False, UNIT_CHAIN_VJP=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", PREPARED_SOLVE=False),
    "imagenet32_b1024_remat_exact_chainbatch": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        UNIT_CHAIN_BATCHED=True, UNIT_CHAIN_VJP=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", PREPARED_SOLVE=False),
    "imagenet32_b1024_remat_exact_nochainbatch": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        UNIT_CHAIN_BATCHED=False, UNIT_CHAIN_VJP=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", PREPARED_SOLVE=False),
    # OPERATOR-ASSEMBLY A/B (ops/inv_conv.py OPERATOR_ASSEMBLY): one-hot
    # selection einsums vs gather+where+transpose — targets the ~10 of
    # 51 ms/step of data-formatting ops in the 2026-08-18 profile.
    # COUPLING-NET REMAT (layers/coupling.py remat_net): recompute the
    # net's convs in backward instead of stashing activations through
    # the scan carry (the ~5 ms/step repeated.py:109 DUS line).
    "imagenet32_exact_cplremat": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact",
                                 coupling_remat=True), (3, 32, 32), 100),
    "imagenet32_exact_cplstash": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact",
                                 coupling_remat=False), (3, 32, 32), 100),
    "glow_mnist_cplremat": _train_case(
        lambda: _glow_mnist_flow(coupling_remat=True), (1, 28, 28), 100),
    "glow_mnist_cplstash": _train_case(
        lambda: _glow_mnist_flow(coupling_remat=False), (1, 28, 28), 100),
    # BLOCK-FORM BUILT OPERATORS (ops/inv_conv.py BUILT_APPLY): keep the
    # chain's prebuilt operators as Toeplitz D-block stacks (zero dense
    # assemblies / retiling reshapes) vs the dense t_inv/p/g route.
    "imagenet32_exact_builtblk": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        BUILT_APPLY="auto"),
    "imagenet32_exact_builtdense": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        BUILT_APPLY="dense"),
    "imagenet32_b1024_remat_exact_builtblk": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        BUILT_APPLY="auto"),
    "imagenet32_b1024_remat_exact_builtdense": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        BUILT_APPLY="dense"),
    # FLAT ROW-MATRIX BUILD (ops/inv_conv.py ROW_MATS_FLAT): build the
    # (KH, CW, CW) stack pre-flattened (no 6-D intermediate + retiling
    # reshape) vs the 'einsum' assembly.
    "imagenet32_exact_rowflat": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        ROW_MATS_FLAT=True),
    "imagenet32_exact_rowein": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        ROW_MATS_FLAT=False),
    "glow_mnist_rowflat": _with_op_flags(
        _train_case(_glow_mnist_flow, (1, 28, 28), 100),
        ROW_MATS_FLAT=True),
    "glow_mnist_rowein": _with_op_flags(
        _train_case(_glow_mnist_flow, (1, 28, 28), 100),
        ROW_MATS_FLAT=False),
    "imagenet32_exact_asmein": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        OPERATOR_ASSEMBLY="einsum"),
    "imagenet32_exact_asmgather": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        OPERATOR_ASSEMBLY="gather"),
    "imagenet32_b1024_remat_exact_asmein": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        OPERATOR_ASSEMBLY="einsum"),
    "imagenet32_b1024_remat_exact_asmgather": _with_op_flags(
        _train_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact", remat=True),
            (3, 32, 32), 1024),
        OPERATOR_ASSEMBLY="gather"),
    "glow_mnist_units_chainbatch": _with_op_flags(
        _train_case(lambda: _glow_mnist_flow(
            step_kind="inv_flow_unit_exact"), (1, 28, 28), 100),
        UNIT_CHAIN_BATCHED=True, UNIT_CHAIN_VJP=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", PREPARED_SOLVE=False),
    "glow_mnist_units_nochainbatch": _with_op_flags(
        _train_case(lambda: _glow_mnist_flow(
            step_kind="inv_flow_unit_exact"), (1, 28, 28), 100),
        UNIT_CHAIN_BATCHED=False, UNIT_CHAIN_VJP=False,
        SOLVE_PRECISION="high", WGRAD_IMPL="conv",
        WGRAD_PRECISION="default", PREPARED_SOLVE=False),
    # forward/sampling-direction adjudication (VERDICT r3 #5): the fused
    # Pallas chain kernel's remaining claimed niche is the solve-only
    # direction; eval cases run the forward transform with NO gradient.
    "imagenet32_eval_exact": _eval_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact"),
        (3, 32, 32), 100),
    "imagenet32_eval_fused": _eval_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_fused"),
        (3, 32, 32), 100),
    "glow_mnist_units_eval_exact": _eval_case(
        lambda: _glow_mnist_flow(step_kind="inv_flow_unit_exact"),
        (1, 28, 28), 100),
    "glow_mnist_units_eval_fused": _eval_case(
        lambda: _glow_mnist_flow(step_kind="inv_flow_unit_fused"),
        (1, 28, 28), 100),
    "imagenet32_eval_exact_chainbatch": _with_op_flags(
        _eval_case(lambda: _imagenet32_flow(
            step_kind="inv_flow_unit_exact"), (3, 32, 32), 100),
        UNIT_CHAIN_BATCHED=True),
    # scan-over-depth DUS overhead: unroll factor A/B (same stacked
    # params, body replicated N times per loop iteration)
    "imagenet32_exact_unroll8": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact",
                                 scan_unroll=8), (3, 32, 32), 100),
    "imagenet32_b1024_remat_exact_unroll8": _train_case(
        lambda: _imagenet32_flow(step_kind="inv_flow_unit_exact",
                                 remat=True, scan_unroll=8),
        (3, 32, 32), 1024),
    "glow_mnist_units": _train_case(
        lambda: _glow_mnist_flow(step_kind="inv_flow_unit"), (1, 28, 28),
        100),
    "glow_mnist_units_fused": _train_case(
        lambda: _glow_mnist_flow(step_kind="inv_flow_unit_fused"),
        (1, 28, 28), 100),
    "glow_mnist_units_exact": _train_case(
        lambda: _glow_mnist_flow(step_kind="inv_flow_unit_exact"),
        (1, 28, 28), 100),
    # timescaling (paper Fig. 4 convention: 2 inv-conv layers, batch 128)
    **{f"timescale_s{s}": _train_case(
        (lambda s=s: __import__(
            "inverse_flow_tpu.models.glow", fromlist=["build_cnn_flow"]
        ).build_cnn_flow((1, s, s), step_kind="inv_conv_no_pad",
                         num_blocks=1, block_size=2, activation="None",
                         kernel=(2, 2))), (1, s, s), 128)
       for s in (16, 32, 64, 128)},
    **{f"timescale_tall_h{h}": _train_case(
        (lambda h=h: __import__(
            "inverse_flow_tpu.models.glow", fromlist=["build_cnn_flow"]
        ).build_cnn_flow((1, h, 1), step_kind="inv_conv_no_pad",
                         num_blocks=1, block_size=2, activation="None",
                         kernel=(2, 2))), (1, h, 1), 128)
       for h in (128, 512, 2048)},
    # Jacobi (height-independent Neumann) arms of the same Fig.-4 sweep
    # (``if_timescaling.py:99-151`` parallel-inversion convention):
    # training-direction solve is 12 masked-conv iterations regardless
    # of H, so the curve should stay flat where exact grows ~ceil(H/R)
    **{f"timescale_jac_s{s}": _train_case(
        (lambda s=s: __import__(
            "inverse_flow_tpu.models.glow", fromlist=["build_cnn_flow"]
        ).build_cnn_flow((1, s, s), step_kind="inv_conv_jacobi",
                         num_blocks=1, block_size=2, activation="None",
                         kernel=(2, 2))), (1, s, s), 128)
       for s in (16, 32, 64, 128)},
    **{f"timescale_jac_tall_h{h}": _train_case(
        (lambda h=h: __import__(
            "inverse_flow_tpu.models.glow", fromlist=["build_cnn_flow"]
        ).build_cnn_flow((1, h, 1), step_kind="inv_conv_jacobi",
                         num_blocks=1, block_size=2, activation="None",
                         kernel=(2, 2))), (1, h, 1), 128)
       for h in (128, 512, 2048)},
    # solver='auto' policy arms (ops/solver_policy.py): end-to-end the
    # policy must (a) match exact on squares (routes to exact — any
    # delta is noise) and (b) engage the measured Jacobi win on the
    # tall axis inside [64, 512]
    **{f"timescale_auto_s{s}": _train_case(
        (lambda s=s: __import__(
            "inverse_flow_tpu.models.glow", fromlist=["build_cnn_flow"]
        ).build_cnn_flow((1, s, s), step_kind="inv_conv_auto",
                         num_blocks=1, block_size=2, activation="None",
                         kernel=(2, 2))), (1, s, s), 128)
       for s in (32, 128)},
    **{f"timescale_auto_tall_h{h}": _train_case(
        (lambda h=h: __import__(
            "inverse_flow_tpu.models.glow", fromlist=["build_cnn_flow"]
        ).build_cnn_flow((1, h, 1), step_kind="inv_conv_auto",
                         num_blocks=1, block_size=2, activation="None",
                         kernel=(2, 2))), (1, h, 1), 128)
       for h in (128, 512, 2048)},
    # wide (1, 1, W) axis: resolve_auto routes these EXACT (the exact
    # solver's scan runs over rows — H=1 is a single log-depth block
    # solve, nothing like the tall case). These two arms measure that
    # claim: exact vs explicit jacobi at the transpose of the tall-128
    # shape.
    **{f"timescale_wide_w{w}": _train_case(
        (lambda w=w: __import__(
            "inverse_flow_tpu.models.glow", fromlist=["build_cnn_flow"]
        ).build_cnn_flow((1, 1, w), step_kind="inv_conv_no_pad",
                         num_blocks=1, block_size=2, activation="None",
                         kernel=(2, 2))), (1, 1, w), 128)
       for w in (128,)},
    **{f"timescale_jac_wide_w{w}": _train_case(
        (lambda w=w: __import__(
            "inverse_flow_tpu.models.glow", fromlist=["build_cnn_flow"]
        ).build_cnn_flow((1, 1, w), step_kind="inv_conv_jacobi",
                         num_blocks=1, block_size=2, activation="None",
                         kernel=(2, 2))), (1, 1, w), 128)
       for w in (128,)},
    # component attribution variants (flagship)
    "glow_mnist_splinenat": _train_case(
        lambda: _glow_mnist_flow(activation="SplineNat"), (1, 28, 28),
        100),
    "glow_mnist_noact": _train_case(
        lambda: _glow_mnist_flow(activation="None"), (1, 28, 28), 100),
    "glow_mnist_slr": _train_case(
        lambda: _glow_mnist_flow(activation="SLR"), (1, 28, 28), 100),
    "glow_mnist_conv1x1": _train_case(
        lambda: _glow_mnist_flow(step_kind="conv1x1"), (1, 28, 28), 100),
}


# Session-variance calibration (VERDICT r3 #6): the same program's slope
# drifts ±35% across sessions (BASELINE.md "Session variance"), so raw
# ms from different sessions don't compare. Every run co-measures the
# known-FLOPs matmul_bf16 chain and reports ms normalized to the
# reference session rate below (the session that produced the round-3
# adopted-defaults headline): ms_norm = ms_raw * calib_tflops / REF.
#
# PLAUSIBILITY GATE (2026-08-18): one session measured the co-run at
# 318.5 TFLOP/s — 161% of the v5e nominal bf16 peak (197) — while the
# imagenet32_exact model program reproduced the prior session's slope
# to 0.1% (52.70 vs 52.76 ms). Beyond-peak readings mean the matmul
# co-run is not tracking model-rate drift in that session; norm fields
# are then suppressed and the row carries calib_implausible=true.
CALIB_REF_TFLOPS = 190.71
CALIB_PEAK_TFLOPS = 197.0


def _calib_ok(calib):
    # Two-sided: one session's co-run slope came out NEGATIVE (-1601
    # TFLOP/s — the small-K arm ran slower than the large-K arm under
    # host contention) and the original <=1.1*peak check let it through,
    # which would have produced negative "normalized" ms. Anything
    # outside [0.5x ref, 1.1x peak] means the co-run is not tracking
    # device rate and cannot normalize that session.
    return (calib is not None
            and 0.5 * CALIB_REF_TFLOPS <= calib <= 1.1 * CALIB_PEAK_TFLOPS)


def measure_calib(k1=8, k2=40, trials=3):
    """Slope-measure the 4096^3 bf16 matmul chain; returns TFLOP/s."""
    make, meta = CASES["matmul_bf16"]()
    pa, pb = make(k1), make(k2)
    float(pa(0))
    float(pb(0))
    slopes = []
    for t in range(trials):
        t0 = time.perf_counter()
        float(pa(t + 1))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(pb(t + 1))
        tb = time.perf_counter() - t0
        slopes.append((tb - ta) / (k2 - k1))
    med = float(np.median(slopes))
    tflops = meta["flops_per_step"] / med / 1e12
    print(f"# calibration: matmul_bf16 {med * 1e3:.4f} ms/step = "
          f"{tflops:.1f} TFLOP/s ({tflops / CALIB_REF_TFLOPS:.3f}x ref)",
          flush=True)
    return round(tflops, 2)


def run_ab(case_a, case_b, k1, k2, trials, out, calib=None):
    """IN-PROCESS A/B: all four programs (A/B x K1/K2) live in one
    process and trials interleave A-pair/B-pair, so the adjudication is
    immune to the ~35% session-to-session device-rate drift that
    invalidates consecutive-process comparisons (the same flagship
    program slope-measured 9.54 ms in one session and 12.92 in the
    next). Reports per-trial slope pairs, their ratio, and a sign
    count."""
    make_a, meta_a = CASES[case_a]()
    make_b, meta_b = CASES[case_b]()
    progs = {}
    compile_s = {}
    for (tag, mk) in (("a", make_a), ("b", make_b)):
        for k in (k1, k2):
            _reset_op_flags()   # no cross-arm flag leakage (A vs A bug)
            t0 = time.time()
            p = mk(k)
            v = float(p(0))
            compile_s[f"{tag}{k}"] = round(time.time() - t0, 1)
            progs[f"{tag}{k}"] = p
            print(f"# compiled {tag} K={k} in {compile_s[f'{tag}{k}']}s "
                  f"(v={v:.4g})", flush=True)

    rows = []
    for t in range(trials):
        trial = {}
        for tag in ("a", "b"):
            t0 = time.perf_counter()
            float(progs[f"{tag}{k1}"](t + 1))
            t_small = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(progs[f"{tag}{k2}"](t + 1))
            t_big = time.perf_counter() - t0
            trial[tag] = (t_big - t_small) / (k2 - k1) * 1e3
        trial["ratio_a_over_b"] = round(trial["a"] / trial["b"], 4)
        trial = {k: round(v, 4) for k, v in trial.items()}
        rows.append(trial)
        print(json.dumps(trial), flush=True)

    med_a = float(np.median([r["a"] for r in rows]))
    med_b = float(np.median([r["b"] for r in rows]))
    b_wins = sum(1 for r in rows if r["b"] < r["a"])
    row = {"ab": [case_a, case_b], "k1": k1, "k2": k2, "trials": trials,
           "ms_per_step_a_median": round(med_a, 4),
           "ms_per_step_b_median": round(med_b, 4),
           "ratio_a_over_b_median": round(med_a / med_b, 4),
           "b_wins_of": [b_wins, trials],
           "pairs": rows, "compile_s": compile_s,
           "batch": meta_a.get("batch")}
    if calib:
        row["calib_tflops"] = calib
        if _calib_ok(calib):
            row["ms_norm_a"] = round(med_a * calib / CALIB_REF_TFLOPS, 4)
            row["ms_norm_b"] = round(med_b * calib / CALIB_REF_TFLOPS, 4)
        else:
            row["calib_implausible"] = True
    print(json.dumps(row), flush=True)
    with open(out, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("case", choices=sorted(CASES))
    ap.add_argument("--ab", choices=sorted(CASES), default=None,
                    help="second case: run an in-process interleaved A/B "
                         "(CASE vs AB) and write one verdict row")
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=36)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--out", default="results/true_step_time.jsonl")
    ap.add_argument("--no-calibrate", action="store_true",
                    help="skip the known-FLOPs matmul co-run (raw ms "
                         "only, not session-comparable)")
    args = ap.parse_args()

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax
    print(f"# device: {jax.devices()[0]}", flush=True)

    calib = None if args.no_calibrate else measure_calib()

    if args.ab is not None:
        run_ab(args.case, args.ab, args.k1, args.k2, args.trials,
               args.out, calib=calib)
        return

    make_program, meta = CASES[args.case]()

    _reset_op_flags()
    t0 = time.time()
    prog_a = make_program(args.k1)
    va = float(prog_a(0))              # compile + run + drain-read
    compile_a = round(time.time() - t0, 1)
    t0 = time.time()
    prog_b = make_program(args.k2)
    vb = float(prog_b(0))
    compile_b = round(time.time() - t0, 1)
    print(f"# compiled K={args.k1} in {compile_a}s (v={va:.4g}), "
          f"K={args.k2} in {compile_b}s (v={vb:.4g})", flush=True)

    slopes, pairs = [], []
    for t in range(args.trials):
        t0 = time.perf_counter()
        float(prog_a(t + 1))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(prog_b(t + 1))
        tb = time.perf_counter() - t0
        slope_ms = (tb - ta) / (args.k2 - args.k1) * 1e3
        slopes.append(slope_ms)
        pairs.append({"t_k1_s": round(ta, 4), "t_k2_s": round(tb, 4),
                      "slope_ms": round(slope_ms, 4)})
        print(json.dumps(pairs[-1]), flush=True)

    med = float(np.median(slopes))
    row = {"case": args.case, "k1": args.k1, "k2": args.k2,
           "trials": args.trials,
           "ms_per_step_median": round(med, 4),
           "ms_per_step_all": [round(s, 4) for s in slopes],
           "compile_s": [compile_a, compile_b],
           "pairs": pairs, **meta}
    if "flops_per_step" in meta and med > 0:
        row["tflops"] = round(meta["flops_per_step"] / (med * 1e-3) / 1e12,
                              2)
    if "batch" in meta and med > 0:
        row["images_per_sec"] = round(meta["batch"] / (med * 1e-3), 1)
    if calib:
        row["calib_tflops"] = calib
        if _calib_ok(calib):
            row["ms_per_step_norm"] = round(med * calib / CALIB_REF_TFLOPS,
                                            4)
        else:
            row["calib_implausible"] = True
    print(json.dumps(row), flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()

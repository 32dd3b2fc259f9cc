"""Fused Pallas chain vs per-layer XLA composition — the round-1 VERDICT's
win-or-retire measurement for the Pallas solve kernel.

Shape classes (VERDICT next-round item 5): Glow-MNIST, ImageNet32, and
timescaling. For each, times forward-only and forward+grad of a 4-order
InvFlowUnit chain (or single-order for timescaling shapes) under both
implementations, chained-dependency methodology (outputs feed inputs so
the device executes sequentially; best of steady-state trials).

Writes one JSON line per (shape, impl, mode) to
results/fused_chain_bench.jsonl and a summary to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_case(name, shape, ksize, orders, n_chain=1):
    import jax
    import jax.numpy as jnp

    from inverse_flow_tpu.ops import fused_chain as fc
    from inverse_flow_tpu.ops.inv_conv import apply_mask

    b, c, h, w = shape
    kh, kw = ksize
    viable = fc.fused_viable(shape, ksize, orders)
    keys = jax.random.split(jax.random.PRNGKey(0), len(orders) * n_chain)
    w_raws = tuple(0.01 * jax.random.normal(k, (c, c, kh, kw))
                   for k in keys)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)

    def chain(fn, x, ws):
        for i in range(n_chain):
            group = tuple(apply_mask(wr) for wr in
                          ws[i * len(orders):(i + 1) * len(orders)])
            x = fn(x, group, orders)
        return x

    results = []
    impls = [("xla", fc.chain_solve_reference)]
    if viable:
        impls.append(("fused", fc.fused_chain_solve))
    for impl, fn in impls:
        fwd = jax.jit(lambda x, ws: chain(fn, x, ws))

        def loss(x, ws):
            return jnp.sum(jnp.abs(chain(fn, x, ws)))
        grad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

        for mode, run in (("fwd", None), ("fwd+bwd", None)):
            if mode == "fwd":
                y = fwd(x, w_raws)
                jax.block_until_ready(y)
                trials = []
                for _ in range(4):
                    n = 30
                    t0 = time.perf_counter()
                    xx = x
                    for _ in range(n):
                        xx = fwd(xx, w_raws)     # chained: y feeds x
                    jax.block_until_ready(xx)
                    trials.append((time.perf_counter() - t0) / n * 1e3)
            else:
                l, (gx, gw) = grad(x, w_raws)
                jax.block_until_ready(l)
                trials = []
                for _ in range(4):
                    n = 30
                    t0 = time.perf_counter()
                    for _ in range(n):
                        l, (gx, gw) = grad(x + 0.0 * l, w_raws)
                    jax.block_until_ready(l)
                    trials.append((time.perf_counter() - t0) / n * 1e3)
            rec = {"case": name, "impl": impl, "mode": mode,
                   "shape": list(shape), "ksize": list(ksize),
                   "n_orders": len(orders), "n_chain": n_chain,
                   "ms_best": round(min(trials), 4),
                   "ms_mean": round(float(np.mean(trials)), 4)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    if not viable:
        print(json.dumps({"case": name, "impl": "fused",
                          "note": "not viable (gate)"}), flush=True)
    return results


def check_compiled_values(cases):
    """COMPILED-kernel value parity on the live backend (ADVICE r2: the
    interpret-mode tests can't see a compiled-only divergence — layout,
    fori_loop carry, out-ref read order). Runs AFTER all timing: the
    host value readbacks this performs degrade subsequent dispatch
    latency on tunneled backends, so it must not precede measurement."""
    import jax
    import jax.numpy as jnp

    from inverse_flow_tpu.ops import fused_chain as fc
    from inverse_flow_tpu.ops.inv_conv import apply_mask

    # Thresholds (measured 2026-08-17, /tmp/valcheck.log): compiled vs
    # INTERPRET of the same kernel agree to ~4e-7 (that comparison isolates
    # compiled-only divergence and gets the tight bound), while either vs
    # the sequential XLA reference differs by ~1-2e-4 of pure f32
    # accumulation-order noise (precomputed T^{-1} matmuls vs sequential
    # solves) — identical in both modes, so it gets the loose bound.
    worst_i, worst_r = 0.0, 0.0
    for name, shape, ksize, orders, _ in cases:
        if not fc.fused_viable(shape, ksize, orders):
            continue
        b, c, h, w = shape
        kh, kw = ksize
        keys = jax.random.split(jax.random.PRNGKey(2), len(orders))
        w_effs = tuple(apply_mask(0.01 * jax.random.normal(
            k, (c, c, kh, kw))) for k in keys)
        x = jax.random.normal(jax.random.PRNGKey(3),
                              (min(b, 16),) + shape[1:], jnp.float32)
        y = np.asarray(jax.jit(
            lambda x: fc.fused_chain_solve(x, w_effs, orders))(x))
        saved = fc._INTERPRET
        fc._INTERPRET = True
        y_int = np.asarray(jax.jit(
            lambda x: fc.fused_chain_solve(x, w_effs, orders))(x))
        fc._INTERPRET = saved
        y_ref = np.asarray(jax.jit(
            lambda x: fc.chain_solve_reference(x, w_effs, orders))(x))
        scale = float(np.max(np.abs(y_ref))) or 1.0
        rel_i = float(np.max(np.abs(y - y_int))) / scale
        rel_r = float(np.max(np.abs(y - y_ref))) / scale
        worst_i, worst_r = max(worst_i, rel_i), max(worst_r, rel_r)
        ok = rel_i < 1e-5 and rel_r < 1e-3
        print(f"# value check {name}: vs-interpret {rel_i:.3e} "
              f"vs-reference {rel_r:.3e} {'OK' if ok else 'FAIL'}",
              flush=True)
        assert ok, f"compiled fused kernel diverges on {name}"
    print(f"# compiled value parity: worst vs-interpret {worst_i:.3e}, "
          f"worst vs-reference {worst_r:.3e}", flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=None,
                    help="comma-separated case-name filter")
    ap.add_argument("--out", default="results/fused_chain_bench.jsonl")
    ap.add_argument("--no-check", action="store_true")
    args = ap.parse_args()

    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    print(f"# device: {jax.devices()[0]}", flush=True)

    O4 = ("TL", "TR", "BL", "BR")
    cases = [
        # Glow-MNIST level-1 (post-squeeze), one unit and the full K=16 stack
        ("glow_mnist_L1_unit", (100, 4, 14, 14), (3, 3), O4, 1),
        ("glow_mnist_L1_K16", (100, 4, 14, 14), (3, 3), O4, 16),
        # ImageNet32 level-1
        ("imagenet32_L1_unit", (100, 12, 16, 16), (3, 3), O4, 1),
        ("imagenet32_L1_K8", (100, 12, 16, 16), (3, 3), O4, 8),
        # timescaling convention (2 layers of single-order 2x2, batch 128)
        ("timescale_s32", (128, 1, 32, 32), (2, 2), ("TL",), 2),
        ("timescale_s128", (128, 1, 128, 128), (2, 2), ("TL",), 2),
        # PRIME-height Glow-MNIST level-2 (newly fused in round 3 via the
        # zero-padded final block): one unit and the full K=16 stack
        ("glow_mnist_L2_unit", (100, 16, 7, 7), (3, 3), O4, 1),
        ("glow_mnist_L2_K16", (100, 16, 7, 7), (3, 3), O4, 16),
        # ImageNet32 level-2 (8x8 at 48 channels, divisor shape)
        ("imagenet32_L2_unit", (100, 48, 8, 8), (3, 3), O4, 1),
    ]
    if args.cases:
        keep = set(args.cases.split(","))
        cases = [c for c in cases if c[0] in keep]
    all_recs = []
    for case in cases:
        recs = bench_case(*case)
        all_recs += recs
        with open(args.out, "a") as f:      # incremental: survive timeouts
            for r in recs:
                f.write(json.dumps(r) + "\n")

    # summary: fused speedup per (case, mode)
    by = {(r["case"], r["mode"]): r for r in all_recs if r["impl"] == "xla"}
    print("\n# case/mode: xla_ms fused_ms speedup")
    for r in all_recs:
        if r["impl"] != "fused":
            continue
        xr = by.get((r["case"], r["mode"]))
        if xr:
            print(f"{r['case']}/{r['mode']}: {xr['ms_best']:.3f} "
                  f"{r['ms_best']:.3f} {xr['ms_best'] / r['ms_best']:.2f}x")

    # value parity LAST (its readbacks degrade tunnel dispatch latency)
    if not args.no_check:
        check_compiled_values(cases)


if __name__ == "__main__":
    main()

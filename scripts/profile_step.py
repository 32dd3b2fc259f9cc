"""Profile the flagship train step and publish the per-op breakdown.

Round-2 VERDICT missing-5: the claim "couplings dominate, the solve is
<5% of a Glow step" (BASELINE.md) was asserted, never profiled. This
captures an XLA profiler trace of chained flagship train steps on the
live backend, converts it with xprof's trace-processing tools, and writes
the top ops by self-time share to ``results/step_profile.md`` — the
target list for any MFU push.

Usage:  python scripts/profile_step.py [--config glow_mnist] [--steps 30]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(config: str, steps: int, trace_dir: str):
    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    import bench

    build = bench.CONFIGS[config]
    import jax.numpy as jnp
    import optax
    from inverse_flow_tpu.data import synthetic

    flow, size, batch = build()
    rng = jax.random.PRNGKey(0)
    params, _ = flow.init(rng, size)
    x = jnp.asarray(synthetic.smooth_images(batch, size), jnp.float32)
    params = flow.data_init(params, x, rng=rng)
    tx = optax.adam(1e-5)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, rng):
        def loss_fn(p):
            return -jnp.mean(flow.forward(p, x, rng=rng)[1])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params2, opt_state2, loss

    params, opt_state, loss = train_step(params, opt_state, x, rng)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            params, opt_state, loss = train_step(
                params, opt_state, x, jax.random.fold_in(rng, i))
        jax.block_until_ready(loss)
    wall_ms = (time.perf_counter() - t0) * 1e3 / steps
    print(f"# captured {steps} steps, {wall_ms:.3f} ms/step wall")
    return wall_ms


def summarize(trace_dir: str, out_md: str, config: str, steps: int,
              wall_ms: float):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)

    # hlo_stats is a gviz-style table: locate the columns we need
    cols = [c.get("label", c.get("id", "")) for c in obj[0]["cols"]] \
        if isinstance(obj, list) else \
        [c.get("label", c.get("id", "")) for c in obj["cols"]]
    table = obj[0] if isinstance(obj, list) else obj

    def col(*names):
        for n in names:
            for i, c in enumerate(cols):
                if n.lower() in str(c).lower():
                    return i
        return None

    i_cat = col("category")
    i_expr = col("HLO op expression", "expression", "hlo op name")
    i_time = col("total self time (us)", "self time")
    i_pct = col("total self time (%)", "%")
    rows = []
    for r in table["rows"]:
        c = r["c"]
        rows.append({
            "category": c[i_cat]["v"] if i_cat is not None else "",
            "op": str(c[i_expr]["v"])[:110] if i_expr is not None else "",
            "self_us": float(c[i_time]["v"] or 0.0)
            if i_time is not None else 0.0,
            "pct": float(c[i_pct]["v"] or 0.0) if i_pct is not None else 0.0,
        })
    rows.sort(key=lambda r: -r["self_us"])
    total_us = sum(r["self_us"] for r in rows)

    # aggregate by category too
    by_cat = {}
    for r in rows:
        by_cat[r["category"]] = by_cat.get(r["category"], 0.0) + r["self_us"]
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])

    with open(out_md, "w") as f:
        f.write(f"# Flagship step profile — `{config}`\n\n")
        f.write(f"Captured {steps} chained train steps on the live "
                f"backend; wall {wall_ms:.3f} ms/step. Total device self "
                f"time {total_us / steps / 1e3:.3f} ms/step.\n\n")
        f.write(
            "Methodology note: on the tunneled backend, trace capture "
            "serializes dispatch so the WALL number is meaningless, but "
            "the per-op DEVICE SELF TIME is accurate — the pre-fix "
            "flagship profile's 182.3 ms/step total matched the "
            "independently slope-measured 182.5 ms/step "
            "(results/true_step_time.jsonl) to 0.1%.\n\n")
        f.write("## By op category\n\n")
        f.write("| category | ms/step | share |\n|---|---|---|\n")
        for cat, us in cats:
            f.write(f"| {cat} | {us / steps / 1e3:.4f} | "
                    f"{100 * us / total_us:.1f}% |\n")
        f.write("\n## Top 40 HLO ops by self time\n\n")
        f.write("| share | ms/step | category | op |\n|---|---|---|---|\n")
        for r in rows[:40]:
            f.write(f"| {100 * r['self_us'] / total_us:.1f}% | "
                    f"{r['self_us'] / steps / 1e3:.4f} | {r['category']} | "
                    f"`{r['op']}` |\n")
        f.write("\nGenerated by `scripts/profile_step.py`.\n")
    # machine-readable full table alongside the digest
    with open(out_md.replace(".md", "_ops.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps({**r, "ms_per_step": r["self_us"] / steps
                                / 1e3}) + "\n")
    print(f"# wrote {out_md}")
    for cat, us in cats[:8]:
        print(f"#   {cat}: {100 * us / total_us:.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="glow_mnist")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default="results/step_profile.md")
    args = ap.parse_args()
    with tempfile.TemporaryDirectory() as td:
        wall = capture(args.config, args.steps, td)
        summarize(td, args.out, args.config, args.steps, wall)


if __name__ == "__main__":
    main()

"""Annotate a step profile's opaque fusion names with source attribution.

``profile_step.py`` writes per-op device self time, but XLA names most
ops ``fusion.5033`` — useless for deciding WHAT to optimize. This tool
recompiles the same jitted train step (cheap: persistent compilation
cache), and for each top profile op pulls from the optimized HLO text:

- the op's own ``metadata`` (op_name path + ``source_file:line`` — the
  model code that produced it),
- its output shape/layout,
- for fusions, the compute instructions inside the called computation
  (convolutions / dots / scatters) with THEIR source attribution.

Usage:
  python scripts/annotate_profile.py --config imagenet32_exact \
      --ops results/step_profile_imagenet32_exact_ops.jsonl \
      --out results/step_profile_imagenet32_exact_detail.md
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_INSTR = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s+=\s+(\S+?)\s+"
                    r"([\w\-]+)\(")
_META = re.compile(r'metadata=\{op_name="([^"]*)"'
                   r'(?:\s+source_file="([^"]*)"\s+source_line=(\d+))?')
_CALLS = re.compile(r"calls=%([\w.\-]+)")
_COMPUTE_OPS = {"convolution", "dot", "scatter", "gather", "reduce",
                "transpose", "dynamic-update-slice", "reverse", "copy",
                "cumsum", "reduce-window", "triangular-solve"}


def compiled_hlo_text(config: str) -> str:
    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import optax

    import bench
    from inverse_flow_tpu.data import synthetic

    flow, size, batch = bench.CONFIGS[config]()
    rng = jax.random.PRNGKey(0)
    params, _ = flow.init(rng, size)
    x = jnp.asarray(synthetic.smooth_images(batch, size), jnp.float32)
    params = flow.data_init(params, x, rng=rng)
    tx = optax.adam(1e-5)
    opt_state = tx.init(params)

    def train_step(params, opt_state, x, rng):
        def loss_fn(p):
            return -jnp.mean(flow.forward(p, x, rng=rng)[1])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = jax.tree_util.tree_map(lambda a, b: a + b, params,
                                         updates)
        return params2, opt_state2, loss

    lowered = jax.jit(train_step).lower(params, opt_state, x, rng)
    return lowered.compile().as_text()


def parse_hlo(hlo: str):
    """-> (instr index: name -> dict, computations: name -> [instr dict])"""
    instrs, comps = {}, {}
    cur = None
    for line in hlo.splitlines():
        if line.startswith("ENTRY") or (line.rstrip().endswith("{")
                                        and line.lstrip().startswith("%")):
            hm = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)", line)
            cur = hm.group(1) if hm else None
            if cur:
                comps[cur] = []
            continue
        if line.strip() == "}":
            cur = None
            continue
        im = _INSTR.match(line)
        if not im:
            continue
        name, out_type, opcode = im.groups()
        mm = _META.search(line)
        cm = _CALLS.search(line)
        d = {"name": name, "type": out_type, "opcode": opcode,
             "op_name": mm.group(1) if mm else "",
             "src": (f"{os.path.basename(mm.group(2))}:{mm.group(3)}"
                     if mm and mm.group(2) else ""),
             "calls": cm.group(1) if cm else None}
        instrs[name] = d
        if cur:
            comps[cur].append(d)
    return instrs, comps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ops", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(args.ops)]
    rows.sort(key=lambda r: -r["self_us"])
    hlo = compiled_hlo_text(args.config)
    instrs, comps = parse_hlo(hlo)

    # aggregate profile time by the source line of each op (coarse map
    # of where the step's device time lives in the MODEL code)
    by_src = {}
    unmatched = 0.0
    for r in rows:
        name = r["op"].split(" ")[0].lstrip("%")
        d = instrs.get(name)
        if d is None:
            unmatched += r["ms_per_step"]
            continue
        src = d["src"] or d["op_name"] or "?"
        by_src[src] = by_src.get(src, 0.0) + r["ms_per_step"]
    total = sum(r["ms_per_step"] for r in rows)

    with open(args.out, "w") as f:
        f.write(f"# Source attribution for `{args.config}` profile\n\n"
                f"Recompiled the profiled program (cache-warm) and "
                f"matched profile op names to optimized-HLO metadata "
                f"(`source_file:line`). Names are only stable for an "
                f"identical program + compiler version; "
                f"{unmatched:.2f} ms/step of ops did not match.\n\n")
        f.write("## Device time by model source line\n\n")
        f.write("| ms/step | share | source |\n|---|---|---|\n")
        for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
            f.write(f"| {ms:.3f} | {100 * ms / total:.1f}% | `{src}` |\n")
        f.write("\n## Top profile ops, annotated\n\n")
        for r in rows[:args.top]:
            name = r["op"].split(" ")[0].lstrip("%")
            d = instrs.get(name)
            f.write(f"### {r['ms_per_step']:.3f} ms/step — "
                    f"{r['pct']:.1f}% — `{name}` ({r['category']})\n\n")
            if d is None:
                f.write("- (not found in recompiled HLO)\n\n")
                continue
            f.write(f"- out `{d['type']}` — `{d['src']}` — "
                    f"`{d['op_name'][:120]}`\n")
            if d["calls"] and d["calls"] in comps:
                for b in comps[d["calls"]]:
                    if b["opcode"] in _COMPUTE_OPS:
                        f.write(f"  - {b['opcode']} `{b['type']}` "
                                f"`{b['src']}`\n")
            f.write("\n")
    print(f"wrote {args.out}; unmatched {unmatched:.2f} ms/step")


if __name__ == "__main__":
    main()

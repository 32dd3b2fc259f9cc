"""Annotate a step profile's opaque fusion names with their HLO bodies.

``profile_step.py`` writes per-op device self time, but XLA names most
ops ``fusion.4911`` / ``closed_call.164`` — useless for deciding WHAT
to optimize. This tool recompiles the same jitted train step (the
persistent compilation cache makes that cheap after the profiled run),
walks the optimized HLO text, and for each of the top-N profile ops
emits the instructions inside that fusion's computation — convolution
shapes, dot dims, transposes — so a profile line can be traced back to
a model component.

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

# instruction lines worth surfacing from a fusion body, most telling
# first: real compute, then data movement
_INTERESTING = re.compile(
    r"= \S+ (convolution|dot|custom-call|transpose|reduce|scatter|gather|"
    r"dynamic-update-slice|dynamic-slice|reverse|exponential|log|divide|"
    r"power|tanh|rsqrt|concatenate|pad|copy|bitcast)\b")


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


def index_computations(hlo: str):
    """fusion/computation name -> list of instruction lines.

    In optimized HLO text a fusion instruction references its body as
    ``calls=%fused_computation.N`` (or ``%region_...``); map both the
    instruction name (profile's label) and computation name to bodies.
    """
    comps = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{\s*$", line)
        if line.startswith("ENTRY") or (m and "{" in line):
            cur = m.group(1) if m else "ENTRY"
            comps[cur] = []
            continue
        if cur is not None:
            if line.strip() == "}":
                cur = None
            else:
                comps[cur].append(line.rstrip())
    # map instruction name -> computation it calls
    inst_to_comp = {}
    for lines in list(comps.values()):
        for line in lines:
            im = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = .*?"
                          r"(?:calls|to_apply)=%?([\w.\-]+)", line)
            if im:
                inst_to_comp[im.group(1)] = im.group(2)
    return comps, inst_to_comp


def summarize_body(lines, limit=14):
    picked = [l.strip() for l in lines if _INTERESTING.search(l)]
    # compress: drop SSA operand lists to keep rows readable
    out = []
    for l in picked[:limit]:
        l = re.sub(r"%[\w.\-]+(, )?", "", l[l.index("= ") + 2:]) \
            if "= " in l else l
        out.append(l[:160])
    if len(picked) > limit:
        out.append(f"... (+{len(picked) - limit} more)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ops", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(args.ops)]
    rows.sort(key=lambda r: -r["self_us"])
    hlo = compiled_hlo_text(args.config)
    comps, inst_to_comp = index_computations(hlo)

    with open(args.out, "w") as f:
        f.write(f"# Fusion bodies for `{args.config}` top profile ops\n\n"
                f"Recompiled the profiled program (cache-warm) and "
                f"matched profile op names to optimized-HLO fusion "
                f"bodies. Caveat: names are only stable for an "
                f"identical program + compiler version.\n\n")
        for r in rows[:args.top]:
            name = r["op"].split(" ")[0].lstrip("%")
            body = None
            comp = inst_to_comp.get(name)
            if comp and comp in comps:
                body = summarize_body(comps[comp])
            elif name in comps:
                body = summarize_body(comps[name])
            f.write(f"## {r['ms_per_step']:.3f} ms/step — "
                    f"{r['pct']:.1f}% — `{name}` ({r['category']})\n\n")
            if body:
                for b in body:
                    f.write(f"- `{b}`\n")
            else:
                f.write("- (no matching fusion body found in "
                        "recompiled HLO)\n")
            f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()



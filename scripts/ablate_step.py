"""Component-level step-time breakdown by ablation (tunnel-robust).

The xprof trace capture distorts execution on the tunneled backend
(~200x slowdown under tracing, per-op times dominated by forced syncs —
see the header of results/step_profile.md), so the per-op shares it
reports don't reflect steady-state execution. This script instead
attributes step time by ABLATION with the same chained-window
methodology as bench.py: measure the full flagship train step, then
variants with one component family replaced by Identity, and report
`share(component) ~= (full - ablated) / full`. Fusion overlap makes the
shares approximate (they need not sum to 1) but each delta is a real,
steady-state measurement of what removing that compute saves.

Writes results/step_ablation.jsonl.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _replace_layers(layers, pred, make):
    from inverse_flow_tpu.layers.repeated import RepeatedBlock
    out = []
    for l in layers:
        if isinstance(l, RepeatedBlock):
            l = dataclasses.replace(
                l, step_layers=tuple(_replace_layers(l.step_layers, pred,
                                                     make)))
        elif pred(l):
            l = make(l)
        out.append(l)
    return out


def _flagship(ablate=None):
    from inverse_flow_tpu.layers import (ActNorm, Coupling, Identity,
                                         InvFlowNoPad, SplineActivation)
    from inverse_flow_tpu.models.glow import build_glow

    flow = build_glow((1, 28, 28), step_kind="inv_conv_no_pad",
                      num_blocks=2, block_size=16, coupling_width=512,
                      actnorm=True, split_prior=True, activation="Spline",
                      n_bins=5, tail_bound=20.0)
    preds = {
        "couplings": lambda l: isinstance(l, Coupling),
        "inv_conv": lambda l: isinstance(l, InvFlowNoPad),
        "spline_act": lambda l: isinstance(l, SplineActivation),
        "actnorm": lambda l: isinstance(l, ActNorm),
    }
    if ablate:
        flow.layers = tuple(_replace_layers(flow.layers, preds[ablate],
                                            lambda l: Identity()))
    return flow


def _measure(flow, fwd_only=False):
    import jax
    import jax.numpy as jnp
    import optax

    from inverse_flow_tpu.data import synthetic

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(synthetic.smooth_images(100, (1, 28, 28)), jnp.float32)
    params, _ = flow.init(rng, (1, 28, 28))
    params = flow.data_init(params, x, rng=rng)
    tx = optax.adam(1e-5)
    opt_state = tx.init(params)

    if fwd_only:
        @jax.jit
        def step(params, opt_state, x, rng):
            return params, opt_state, -jnp.mean(
                flow.forward(params, x, rng=rng)[1])
    else:
        @jax.jit
        def step(params, opt_state, x, rng):
            def loss_fn(p):
                return -jnp.mean(flow.forward(p, x, rng=rng)[1])
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            params2 = jax.tree_util.tree_map(lambda a, b: a + b,
                                             params, updates)
            return params2, opt_state2, loss

    params, opt_state, loss = step(params, opt_state, x, rng)
    import jax as _j
    _j.block_until_ready(loss)
    trials = []
    for _ in range(3):
        n = 60
        t0 = time.perf_counter()
        for i in range(n):
            params, opt_state, loss = step(params, opt_state, x,
                                           _j.random.fold_in(rng, i))
        _j.block_until_ready(loss)
        trials.append((time.perf_counter() - t0) / n * 1e3)
    return min(trials)


def main():
    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    print(f"# device: {jax.devices()[0]}", flush=True)

    rows = []
    full = _measure(_flagship())
    rows.append({"variant": "full", "ms": round(full, 4)})
    print(json.dumps(rows[-1]), flush=True)
    fwd = _measure(_flagship(), fwd_only=True)
    rows.append({"variant": "forward_only", "ms": round(fwd, 4),
                 "share_bwd_opt": round(1 - fwd / full, 4)})
    print(json.dumps(rows[-1]), flush=True)
    for ab in ("couplings", "inv_conv", "spline_act", "actnorm"):
        ms = _measure(_flagship(ablate=ab))
        rows.append({"variant": f"no_{ab}", "ms": round(ms, 4),
                     "share": round((full - ms) / full, 4)})
        print(json.dumps(rows[-1]), flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/step_ablation.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()

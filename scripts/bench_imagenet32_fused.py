"""ImageNet32 production config (L=3 x K=48, w=256, 12M params):
PAIRED same-session A/B of exact-XLA vs fused-where-viable single-order
solves.

Round-2 found the across-session comparison variance-bound (the same
exact program measured 0.843 and 1.497 ms in two sessions,
BASELINE.md); round-2 VERDICT weak-1 prescribes the fix implemented
here: compile BOTH programs once, then alternate A/B measurement windows
within one process and report per-pair deltas plus a sign test — session
drift cancels in the pairing.

Writes per-pair rows + a verdict summary to
results/imagenet32_paired_ab.jsonl.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _with_solver(layers, solver):
    from inverse_flow_tpu.layers.inv_flow import InvFlow
    from inverse_flow_tpu.layers.repeated import RepeatedBlock
    out = []
    for l in layers:
        if isinstance(l, RepeatedBlock):
            l = dataclasses.replace(
                l, step_layers=tuple(_with_solver(l.step_layers, solver)))
        elif isinstance(l, InvFlow):
            l = dataclasses.replace(l, solver=solver)
        out.append(l)
    return out


def _make_arm(solver):
    import jax
    import jax.numpy as jnp
    import optax

    from inverse_flow_tpu.data import synthetic
    from inverse_flow_tpu.models.glow import build_glow

    flow = build_glow((3, 32, 32), step_kind="inv_conv_no_pad",
                      num_blocks=3, block_size=48, coupling_width=256,
                      actnorm=True, split_prior=True, activation="Spline")
    flow.layers = tuple(_with_solver(flow.layers, solver))

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(synthetic.smooth_images(100, (3, 32, 32)), jnp.float32)
    params, _ = flow.init(rng, (3, 32, 32))
    params = flow.data_init(params, x, rng=rng)
    tx = optax.adam(1e-5)

    @jax.jit
    def train_step(params, opt_state, x, rng):
        def loss_fn(p):
            return -jnp.mean(flow.forward(p, x, rng=rng)[1])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = jax.tree_util.tree_map(lambda a, b: a + b,
                                         params, updates)
        return params2, opt_state2, loss

    return {"step": train_step, "state": [params, tx.init(params)],
            "x": x, "rng": rng}


def _window(arm, n_iter):
    import jax
    params, opt_state = arm["state"]
    t0 = time.perf_counter()
    for i in range(n_iter):
        params, opt_state, loss = arm["step"](
            params, opt_state, arm["x"],
            jax.random.fold_in(arm["rng"], i))
    jax.block_until_ready(loss)
    arm["state"] = [params, opt_state]
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    print(f"# device: {jax.devices()[0]}", flush=True)

    arms = {"exact": _make_arm("exact"), "auto_fused": _make_arm("auto")}
    # compile + warm both BEFORE any measurement
    for name, arm in arms.items():
        t0 = time.time()
        _window(arm, 1)
        print(f"# compiled {name} in {time.time() - t0:.1f}s", flush=True)
        _window(arm, 10)

    n_pairs, n_iter = 12, 40
    pairs = []
    rows = []
    for p in range(n_pairs):
        ms = {}
        # alternate order within the pair (ABBA) so slow drift cancels
        order = (("exact", "auto_fused") if p % 2 == 0
                 else ("auto_fused", "exact"))
        for name in order:
            ms[name] = _window(arms[name], n_iter)
        pairs.append(ms)
        row = {"pair": p, "exact_ms": round(ms["exact"], 4),
               "fused_ms": round(ms["auto_fused"], 4),
               "delta_ms": round(ms["exact"] - ms["auto_fused"], 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    deltas = np.array([r["delta_ms"] for r in rows])
    wins = int((deltas > 0).sum())
    exact_med = float(np.median([r["exact_ms"] for r in rows]))
    fused_med = float(np.median([r["fused_ms"] for r in rows]))
    # two-sided sign-test p-value (binomial, p=0.5)
    from math import comb
    p_sign = sum(comb(n_pairs, k) for k in
                 range(min(wins, n_pairs - wins) + 1)) / 2 ** (n_pairs - 1)
    summary = {
        "case": "imagenet32_paired_ab", "n_pairs": n_pairs,
        "n_iter_per_window": n_iter,
        "exact_ms_median": round(exact_med, 4),
        "fused_ms_median": round(fused_med, 4),
        "delta_ms_median": round(float(np.median(deltas)), 4),
        "fused_wins": wins, "sign_test_p": round(min(p_sign, 1.0), 4),
        "speedup_median": round(exact_med / fused_med, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(summary), flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/imagenet32_paired_ab.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()

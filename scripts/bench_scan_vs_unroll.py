"""Paired A/B: RepeatedBlock lax.scan-over-depth vs unrolled blocks.

The ablation study (results/step_ablation.jsonl) showed the flagship
step is latency-bound — no single component's compute dominates — so the
remaining lever is per-step sequencing overhead. The scan build trades
runtime for O(1) compile; this measures what that trade costs at the
flagship config. ABBA windows + sign test, like the other paired
benches. Writes results/scan_vs_unroll_ab.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _make_arm(scan_blocks):
    import jax
    import jax.numpy as jnp
    import optax

    from inverse_flow_tpu.data import synthetic
    from inverse_flow_tpu.models.glow import build_glow

    flow = build_glow((1, 28, 28), step_kind="inv_conv_no_pad",
                      num_blocks=2, block_size=16, coupling_width=512,
                      actnorm=True, split_prior=True, activation="Spline",
                      n_bins=5, tail_bound=20.0, scan_blocks=scan_blocks)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(synthetic.smooth_images(100, (1, 28, 28)), jnp.float32)
    params, _ = flow.init(rng, (1, 28, 28))
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

    arms = {}
    for name, scan in (("scan", True), ("unroll", False)):
        t0 = time.time()
        arms[name] = _make_arm(scan)
        _window(arms[name], 1)
        print(f"# compiled {name} in {time.time() - t0:.1f}s", flush=True)
        _window(arms[name], 10)

    n_pairs, n_iter = 10, 40
    rows = []
    for p in range(n_pairs):
        ms = {}
        order = ("scan", "unroll") if p % 2 == 0 else ("unroll", "scan")
        for name in order:
            ms[name] = _window(arms[name], n_iter)
        row = {"pair": p, "scan_ms": round(ms["scan"], 4),
               "unroll_ms": round(ms["unroll"], 4),
               "delta_ms": round(ms["scan"] - ms["unroll"], 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    deltas = np.array([r["delta_ms"] for r in rows])
    wins = int((deltas > 0).sum())
    scan_med = float(np.median([r["scan_ms"] for r in rows]))
    unroll_med = float(np.median([r["unroll_ms"] for r in rows]))
    summary = {"case": "glow_mnist_scan_vs_unroll",
               "n_pairs": n_pairs,
               "scan_ms_median": round(scan_med, 4),
               "unroll_ms_median": round(unroll_med, 4),
               "unroll_wins": wins,
               "speedup_unroll": round(scan_med / unroll_med, 4),
               "device": str(jax.devices()[0])}
    print(json.dumps(summary), flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/scan_vs_unroll_ab.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()

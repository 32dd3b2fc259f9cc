"""Paired same-session A/B: f32 vs bf16-couplings on the flagship config.

The sweep (results/bench_sweep.jsonl) measured the two policies in
separate (non-interleaved) phases of one process, where session drift can
masquerade as a policy effect. This interleaves ABBA windows exactly like
scripts/bench_imagenet32_fused.py and reports per-pair deltas + sign
test. Writes results/precision_paired_ab.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _make_arm(coupling_dtype):
    import jax
    import jax.numpy as jnp
    import optax

    from inverse_flow_tpu.data import synthetic
    from inverse_flow_tpu.models.glow import build_glow

    flow = build_glow((1, 28, 28), step_kind="inv_conv_no_pad",
                      num_blocks=2, block_size=16, coupling_width=512,
                      actnorm=True, split_prior=True, activation="Spline",
                      n_bins=5, tail_bound=20.0,
                      coupling_dtype=coupling_dtype)
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

    arms = {"f32": _make_arm("float32"), "bf16": _make_arm("bfloat16")}
    for name, arm in arms.items():
        t0 = time.time()
        _window(arm, 1)
        print(f"# compiled {name} in {time.time() - t0:.1f}s", flush=True)
        _window(arm, 10)

    n_pairs, n_iter = 12, 40
    rows = []
    for p in range(n_pairs):
        ms = {}
        order = ("f32", "bf16") if p % 2 == 0 else ("bf16", "f32")
        for name in order:
            ms[name] = _window(arms[name], n_iter)
        row = {"pair": p, "f32_ms": round(ms["f32"], 4),
               "bf16_ms": round(ms["bf16"], 4),
               "delta_ms": round(ms["f32"] - ms["bf16"], 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    deltas = np.array([r["delta_ms"] for r in rows])
    wins = int((deltas > 0).sum())
    from math import comb
    p_sign = sum(comb(n_pairs, k) for k in
                 range(min(wins, n_pairs - wins) + 1)) / 2 ** (n_pairs - 1)
    f32_med = float(np.median([r["f32_ms"] for r in rows]))
    bf16_med = float(np.median([r["bf16_ms"] for r in rows]))
    summary = {"case": "glow_mnist_precision_paired_ab",
               "n_pairs": n_pairs, "n_iter_per_window": n_iter,
               "f32_ms_median": round(f32_med, 4),
               "bf16_ms_median": round(bf16_med, 4),
               "delta_ms_median": round(float(np.median(deltas)), 4),
               "bf16_wins": wins, "sign_test_p": round(min(p_sign, 1.0), 4),
               "speedup_median": round(f32_med / bf16_med, 4),
               "device": str(jax.devices()[0])}
    print(json.dumps(summary), flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/precision_paired_ab.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()

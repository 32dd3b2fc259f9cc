"""Shared scaffolding for the end-to-end train-step benchmarks: one
methodology (jitted adam step, chained-dependency trials, best-of) for
every row appended to results/fused_chain_bench.jsonl."""

import json
import time

import numpy as np


def measure_train_step(flow, data_size, batch, case, impl,
                       n_iter=40, n_trials=3):
    import jax
    import jax.numpy as jnp
    import optax

    from inverse_flow_tpu.data import synthetic

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(synthetic.smooth_images(batch, data_size), jnp.float32)
    params, _ = flow.init(rng, data_size)
    params = flow.data_init(params, x, rng=rng)
    tx = optax.adam(1e-5)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, rng):
        def loss_fn(p):
            return -jnp.mean(flow.forward(p, x, rng=rng)[1])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = jax.tree_util.tree_map(lambda a, b: a + b,
                                         params, updates)
        return params2, opt_state2, loss

    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state, x, rng)
    jax.block_until_ready(loss)
    compile_s = round(time.time() - t0, 1)

    trials = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for i in range(n_iter):
            params, opt_state, loss = train_step(
                params, opt_state, x, jax.random.fold_in(rng, i))
        jax.block_until_ready(loss)
        trials.append((time.perf_counter() - t0) / n_iter * 1e3)

    rec = {"case": case, "impl": impl, "mode": "train", "batch": batch,
           "ms_best": round(min(trials), 4),
           "ms_mean": round(float(np.mean(trials)), 4),
           "images_per_sec": round(batch / (min(trials) * 1e-3), 1),
           "compile_s": compile_s}
    print(json.dumps(rec), flush=True)
    with open("results/fused_chain_bench.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def make_train_arm(flow, data_size, batch):
    """(jitted step + chained state) for paired A/B windows."""
    import jax
    import jax.numpy as jnp
    import optax

    from inverse_flow_tpu.data import synthetic

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(synthetic.smooth_images(batch, data_size), jnp.float32)
    params, _ = flow.init(rng, data_size)
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


def run_window(arm, n_iter):
    import jax
    params, opt_state = arm["state"]
    t0 = time.perf_counter()
    for i in range(n_iter):
        params, opt_state, loss = arm["step"](
            params, opt_state, arm["x"], jax.random.fold_in(arm["rng"], i))
    jax.block_until_ready(loss)
    arm["state"] = [params, opt_state]
    return (time.perf_counter() - t0) / n_iter * 1e3


def paired_ab(arms, case, out_path, n_pairs=12, n_iter=40):
    """ABBA paired windows over two named arms; per-pair deltas + sign
    test; writes rows + summary to out_path. Returns the summary."""
    import json as _json
    from math import comb

    names = list(arms)
    assert len(names) == 2
    a, b = names
    for name in names:
        t0 = time.time()
        run_window(arms[name], 1)
        print(f"# compiled {name} in {time.time() - t0:.1f}s", flush=True)
        run_window(arms[name], 10)

    rows = []
    for p in range(n_pairs):
        ms = {}
        order = (a, b) if p % 2 == 0 else (b, a)
        for name in order:
            ms[name] = run_window(arms[name], n_iter)
        row = {"pair": p, f"{a}_ms": round(ms[a], 4),
               f"{b}_ms": round(ms[b], 4),
               "delta_ms": round(ms[a] - ms[b], 4)}
        rows.append(row)
        print(_json.dumps(row), flush=True)

    deltas = np.array([r["delta_ms"] for r in rows])
    wins_b = int((deltas > 0).sum())
    p_sign = sum(comb(n_pairs, k) for k in
                 range(min(wins_b, n_pairs - wins_b) + 1)) \
        / 2 ** (n_pairs - 1)
    med_a = float(np.median([r[f"{a}_ms"] for r in rows]))
    med_b = float(np.median([r[f"{b}_ms"] for r in rows]))
    summary = {"case": case, "n_pairs": n_pairs,
               f"{a}_ms_median": round(med_a, 4),
               f"{b}_ms_median": round(med_b, 4),
               f"{b}_wins": wins_b,
               "sign_test_p": round(min(p_sign, 1.0), 4),
               f"speedup_{b}": round(med_a / med_b, 4)}
    print(_json.dumps(summary), flush=True)
    with open(out_path, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
        f.write(_json.dumps(summary) + "\n")
    return summary

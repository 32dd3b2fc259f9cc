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

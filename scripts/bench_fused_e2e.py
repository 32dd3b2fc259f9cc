"""End-to-end train step: InvFlowUnit exact (XLA) vs fused (Pallas chain),
inside the full Glow-MNIST model (L=2 x K=16, width 512, batch 100).

Level-1 (4,14,14) units run fused; level-2 (16,7,7) auto-falls back to XLA
(prime height -> one block). Appends a JSON line per impl to
results/fused_chain_bench.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    from inverse_flow_tpu.data import synthetic
    from inverse_flow_tpu.models.glow import build_glow

    print(f"# device: {jax.devices()[0]}", flush=True)
    batch = 100
    x = jnp.asarray(synthetic.smooth_images(batch, (1, 28, 28)), jnp.float32)
    rng = jax.random.PRNGKey(0)

    for kind in ("inv_flow_unit", "inv_flow_unit_fused"):
        flow = build_glow((1, 28, 28), step_kind=kind, num_blocks=2,
                          block_size=16, coupling_width=512, actnorm=True,
                          split_prior=True, activation="Spline",
                          n_bins=5, tail_bound=20.0)
        params, _ = flow.init(rng, (1, 28, 28))
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
        for _ in range(3):
            n = 60
            t0 = time.perf_counter()
            for i in range(n):
                params, opt_state, loss = train_step(
                    params, opt_state, x, jax.random.fold_in(rng, i))
            jax.block_until_ready(loss)
            trials.append((time.perf_counter() - t0) / n * 1e3)
        rec = {"case": "glow_mnist_full_train_step", "impl": kind,
               "mode": "train", "batch": batch,
               "ms_best": round(min(trials), 4),
               "ms_mean": round(float(np.mean(trials)), 4),
               "compile_s": compile_s}
        print(json.dumps(rec), flush=True)
        with open("results/fused_chain_bench.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()

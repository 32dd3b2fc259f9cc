"""ImageNet32 production config (L=3 x K=48, w=256, 12M params): train
step with solver='auto' (single-order fused Pallas solves where viable)
vs all-exact XLA solves. Appends JSON lines to
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
    from inverse_flow_tpu.train.experiment import _exact_solver_layers

    print(f"# device: {jax.devices()[0]}", flush=True)
    batch = 100
    x = jnp.asarray(synthetic.smooth_images(batch, (3, 32, 32)), jnp.float32)
    rng = jax.random.PRNGKey(0)

    for impl in ("exact", "auto_fused"):
        flow = build_glow((3, 32, 32), step_kind="inv_conv_no_pad",
                          num_blocks=3, block_size=48, coupling_width=256,
                          actnorm=True, split_prior=True,
                          activation="Spline")
        if impl == "exact":
            flow.layers = tuple(_exact_solver_layers(flow.layers))
        params, _ = flow.init(rng, (3, 32, 32))
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
            n = 40
            t0 = time.perf_counter()
            for i in range(n):
                params, opt_state, loss = train_step(
                    params, opt_state, x, jax.random.fold_in(rng, i))
            jax.block_until_ready(loss)
            trials.append((time.perf_counter() - t0) / n * 1e3)
        rec = {"case": "imagenet32_full_train_step", "impl": impl,
               "mode": "train", "batch": batch,
               "ms_best": round(min(trials), 4),
               "ms_mean": round(float(np.mean(trials)), 4),
               "images_per_sec": round(batch / (min(trials) * 1e-3), 1),
               "compile_s": compile_s}
        print(json.dumps(rec), flush=True)
        with open("results/fused_chain_bench.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()

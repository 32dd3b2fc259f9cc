"""Production-scale benchmark: if_glow_imagenet32 (L=3 x K=48, width 256)
train-step throughput, synthetic data. Writes results/imagenet32_bench.json.
Run from the repo root:
    python scripts/imagenet32_bench.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import json, time
import jax, jax.numpy as jnp, numpy as np, optax
from inverse_flow_tpu.models.glow import build_glow
from inverse_flow_tpu.data import synthetic

batch = 100
flow = build_glow((3, 32, 32), step_kind="inv_conv_no_pad", num_blocks=3,
                  block_size=48, coupling_width=256, actnorm=True,
                  split_prior=True, activation="Spline")
rng = jax.random.PRNGKey(0)
params, _ = flow.init(rng, (3, 32, 32))
n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
x = jnp.asarray(synthetic.smooth_images(batch, (3, 32, 32)), jnp.float32)
params = flow.data_init(params, x, rng=rng)
tx = optax.adam(1e-5)
opt_state = tx.init(params)

@jax.jit
def train_step(params, opt_state, x, rng):
    def loss_fn(p):
        return -jnp.mean(flow.forward(p, x, rng=rng)[1])
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
    return params, opt_state, loss

t0 = time.perf_counter()
p, o, l = train_step(params, opt_state, x, rng); jax.block_until_ready(l)
compile_s = time.perf_counter() - t0
trials = []
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(40):
        p, o, l = train_step(p, o, x, jax.random.fold_in(rng, i))
    jax.block_until_ready(l)
    trials.append((time.perf_counter() - t0) / 40 * 1e3)

rec = {"model": "if_glow_imagenet32 (L=3,K=48,w=256)", "params": n_params,
       "batch": batch, "compile_s": round(compile_s, 1),
       "train_ms_per_batch": round(min(trials), 3),
       "imgs_per_sec": round(batch / (min(trials) / 1e3)),
       "loss": float(l), "device": str(jax.devices()[0])}
print(json.dumps(rec), flush=True)
with open("results/imagenet32_bench.json", "w") as f:
    json.dump(rec, f)

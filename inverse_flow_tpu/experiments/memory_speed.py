"""Memory/speed benchmark: Glow on random in-memory data.

Reference parity: ``inf/test_memory_speed.py`` — builds a Glow stack
(selectable step kind), trains on a ``RandomImageDataset``
(``test_memory_speed.py:20-36``), and reports wall-clock epoch time plus
device memory (``:66-70,113-146`` — ``torch.cuda.memory_allocated``; here
PJRT ``memory_stats`` via :class:`~..train.memory.MemoryTracker`).

Run: ``python -m inverse_flow_tpu.cli --name memory_speed [--smoke]``.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_memory_speed(step_kind="inv_conv_no_pad", data_size=(3, 32, 32),
                     batch_size=100, num_blocks=2, block_size=16,
                     coupling_width=256, n_batches=20, smoke=False):
    import optax

    from ..models.glow import build_glow
    from ..train.memory import MemoryTracker

    if smoke:
        data_size, batch_size = (1, 8, 8), 8
        num_blocks, block_size, coupling_width, n_batches = 1, 2, 16, 3

    flow = build_glow(data_size, step_kind=step_kind, num_blocks=num_blocks,
                      block_size=block_size, coupling_width=coupling_width,
                      actnorm=True, split_prior=True, activation="SLR")
    rng = jax.random.PRNGKey(0)
    params, _ = flow.init(rng, data_size)
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch_size,) + tuple(data_size)), jnp.float32)
    params = flow.data_init(params, x, rng=rng)

    tx = optax.adam(1e-5)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, rng):
        def loss_fn(p):
            return -jnp.mean(flow.forward(p, x, rng=rng)[1])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    tracker = MemoryTracker()
    t0 = time.perf_counter()
    params, opt_state, loss = train_step(params, opt_state, x, rng)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0

    # chained steps: honest throughput even on async/tunneled backends
    t0 = time.perf_counter()
    for i in range(n_batches):
        params, opt_state, loss = train_step(
            params, opt_state, x, jax.random.fold_in(rng, i))
    jax.block_until_ready(loss)
    ms_per_batch = (time.perf_counter() - t0) / n_batches * 1e3

    mem = tracker.snapshot() if tracker.available else {}
    rec = {
        "step_kind": step_kind,
        "data_size": list(data_size),
        "batch_size": batch_size,
        "compile_s": round(compile_s, 2),
        "train_ms_per_batch": round(ms_per_batch, 3),
        "epoch_s_per_50k": round(ms_per_batch * (50_000 / batch_size) / 1e3,
                                 2),
        "loss": float(loss),
        **{f"memory_{k}": round(v, 1) for k, v in mem.items()},
    }
    print(json.dumps(rec))
    with open("./memory_speed.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    return 0

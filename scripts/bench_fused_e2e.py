"""End-to-end train step: InvFlowUnit exact (XLA) vs fused (Pallas chain),
inside the full Glow-MNIST model (L=2 x K=16, width 512, batch 100).

Level-1 (4,14,14) units run fused; level-2 (16,7,7) auto-falls back to XLA
(prime height -> one block). Appends a JSON line per impl to
results/fused_chain_bench.jsonl.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    from inverse_flow_tpu.models.glow import build_glow

    from _bench_common import measure_train_step

    from inverse_flow_tpu.train.experiment import _exact_solver_layers

    print(f"# device: {jax.devices()[0]}", flush=True)
    for kind in ("inv_flow_unit", "inv_flow_unit_fused"):
        flow = build_glow((1, 28, 28), step_kind=kind, num_blocks=2,
                          block_size=16, coupling_width=512, actnorm=True,
                          split_prior=True, activation="Spline",
                          n_bins=5, tail_bound=20.0)
        if kind == "inv_flow_unit":
            # InvFlowUnit defaults to solver='auto' (fused on TPU); the
            # baseline arm must be the all-exact XLA composition
            flow.layers = tuple(_exact_solver_layers(flow.layers))
        measure_train_step(flow, (1, 28, 28), 100,
                           "glow_mnist_full_train_step", kind, n_iter=60)


if __name__ == "__main__":
    main()

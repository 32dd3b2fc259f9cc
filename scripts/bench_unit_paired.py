"""Paired A/B: InvFlowUnit solver='exact' vs 'auto' (fused) at the
ImageNet32 4-order-unit config — the non-paired sweep rows disagreed
with round-2's fused-unit wins (0.894 vs 0.821 ms), so the pairing
settles whether 'auto' is the right InvFlowUnit default at production
scale. Writes results/imagenet32_unit_paired_ab.jsonl."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _with_unit_solver(layers, solver):
    from inverse_flow_tpu.layers.inv_flow import InvFlowUnit
    from inverse_flow_tpu.layers.repeated import RepeatedBlock
    out = []
    for l in layers:
        if isinstance(l, RepeatedBlock):
            l = dataclasses.replace(
                l, step_layers=tuple(_with_unit_solver(l.step_layers,
                                                       solver)))
        elif isinstance(l, InvFlowUnit):
            l = dataclasses.replace(l, solver=solver)
        out.append(l)
    return out


def main():
    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    from inverse_flow_tpu.models.glow import build_glow

    from _bench_common import make_train_arm, paired_ab

    print(f"# device: {jax.devices()[0]}", flush=True)
    arms = {}
    for name, solver in (("exact", "exact"), ("fused", "auto")):
        flow = build_glow((3, 32, 32), step_kind="inv_flow_unit",
                          num_blocks=3, block_size=48, coupling_width=128,
                          actnorm=True, split_prior=True, activation="SLR")
        flow.layers = tuple(_with_unit_solver(flow.layers, solver))
        arms[name] = make_train_arm(flow, (3, 32, 32), 100)
    os.makedirs("results", exist_ok=True)
    paired_ab(arms, "imagenet32_unit_solver_paired_ab",
              "results/imagenet32_unit_paired_ab.jsonl")


if __name__ == "__main__":
    main()

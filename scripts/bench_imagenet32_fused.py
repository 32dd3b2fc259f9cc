"""ImageNet32 production config (L=3 x K=48, w=256, 12M params): train
step with explicitly fused-where-viable single-order solves vs all-exact
XLA solves. (InvFlow defaults to 'exact' — this measurement is WHY: the
fused arm measured 0.950 vs exact 0.843 ms/batch; the script rewrites
solvers explicitly so the comparison stays reproducible.)
Appends JSON lines to results/fused_chain_bench.jsonl.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _with_solver(layers, solver):
    from inverse_flow_tpu.layers.inv_flow import InvFlow
    from inverse_flow_tpu.layers.repeated import RepeatedBlock
    out = []
    for l in layers:
        if isinstance(l, RepeatedBlock):
            l = dataclasses.replace(
                l, step_layers=tuple(_with_solver(l.step_layers, solver)))
        elif isinstance(l, InvFlow):
            l = dataclasses.replace(l, solver=solver)
        out.append(l)
    return out


def main():
    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    from inverse_flow_tpu.models.glow import build_glow

    from _bench_common import measure_train_step

    print(f"# device: {jax.devices()[0]}", flush=True)
    for impl, solver in (("exact", "exact"), ("auto_fused", "auto")):
        flow = build_glow((3, 32, 32), step_kind="inv_conv_no_pad",
                          num_blocks=3, block_size=48, coupling_width=256,
                          actnorm=True, split_prior=True,
                          activation="Spline")
        flow.layers = tuple(_with_solver(flow.layers, solver))
        measure_train_step(flow, (3, 32, 32), 100,
                           "imagenet32_full_train_step", impl)


if __name__ == "__main__":
    main()

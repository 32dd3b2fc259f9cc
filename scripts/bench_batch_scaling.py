"""ImageNet32 production config: throughput vs batch size.

The reference trains this config with nn.DataParallel at global batch
100-250; BASELINE names train samples/sec/chip as a target metric. This
measures the single-chip throughput ceiling as batch grows (the MXU is
underfed at batch 100 — step_ablation showed latency-bound behavior at
small scale). Writes results/batch_scaling.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    from inverse_flow_tpu.models.glow import build_glow

    from _bench_common import make_train_arm, run_window

    print(f"# device: {jax.devices()[0]}", flush=True)
    os.makedirs("results", exist_ok=True)
    rows = []
    for batch, remat in ((100, False), (256, False), (512, False),
                         (1024, True)):
        flow = build_glow((3, 32, 32), step_kind="inv_flow_unit",
                          num_blocks=3, block_size=48, coupling_width=128,
                          actnorm=True, split_prior=True, activation="SLR",
                          remat=remat)
        try:
            t0 = time.time()
            arm = make_train_arm(flow, (3, 32, 32), batch)
            run_window(arm, 1)
            compile_s = round(time.time() - t0, 1)
            run_window(arm, 5)
            trials = [run_window(arm, 20) for _ in range(3)]
            ms = min(trials)
        except Exception as e:           # OOM etc: record and continue
            rows.append({"batch": batch, "remat": remat,
                         "error": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        rows.append({"batch": batch, "remat": remat,
                     "ms_per_step": round(ms, 4),
                     "images_per_sec": round(batch / (ms * 1e-3), 1),
                     "compile_s": compile_s})
        print(json.dumps(rows[-1]), flush=True)

    with open("results/batch_scaling.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()

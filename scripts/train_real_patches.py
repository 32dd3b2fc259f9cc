"""Train on the second embedded REAL dataset and record bits/dim.

VERDICT r4 #8: broaden in-container real-data evidence beyond the 8x8
digits. Trains the ``real_patches_glow`` registry entry — real 16x16 RGB
patches from scikit-learn's bundled photographs (``data/patches.py``),
the 3-channel raw-0-255 shape class of the reference's CIFAR/ImageNet32
configs — on the live backend and writes the per-epoch trajectory to
``results/real_patches_bpd.jsonl``.

Usage: python scripts/train_real_patches.py [--epochs 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    args = ap.parse_args()

    import jax

    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()

    from inverse_flow_tpu.experiments import get_experiment
    from inverse_flow_tpu.train.experiment import Experiment

    os.makedirs("results", exist_ok=True)
    spec = get_experiment("real_patches_glow")
    cfg = spec.config.replace(
        epochs=args.epochs, eval_epochs=1, sample_epochs=10_000,
        log_timing=False, save_images=False, plot_recon=False,
        metrics_path="results/real_patches_glow_metrics.jsonl",
        checkpoint_path="results/real_patches_glow_checkpoint.pkl")
    flow = spec.build_model()
    loaders = spec.load_data(cfg.batch_size)
    exp = Experiment(flow, *loaders, cfg)

    print(f"# device: {jax.devices()[0]}", flush=True)
    rows = []
    for e in range(1, args.epochs + 1):
        loss = exp.train_epoch(e)
        val = exp.eval_epoch(exp.val_loader)
        row = {"epoch": e, "train_loss": round(float(loss), 3),
               "val_bpd": round(float(exp.to_bpd(val)), 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    test = exp.eval_epoch(exp.test_loader)
    final = {"dataset": "real_patches (16x16 RGB from sklearn's bundled "
                        "photographs, 1664 train)",
             "epochs": args.epochs,
             "test_bpd": round(float(exp.to_bpd(test)), 4),
             "best_val_bpd": round(min(r["val_bpd"] for r in rows), 4),
             "first_val_bpd": rows[0]["val_bpd"],
             "device": str(jax.devices()[0])}
    print(json.dumps(final), flush=True)
    with open("results/real_patches_bpd.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps(final) + "\n")
    exp.save()


if __name__ == "__main__":
    main()

"""Full-size if_glow_mnist training demo: synthetic data, 2 epochs,
through the complete Experiment harness (train/eval/BPD/sample/checkpoint).
Writes metrics to results/tpu_train_demo.jsonl. Run from the repo root:
    python scripts/train_demo.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import json, os, time
import jax
from inverse_flow_tpu.experiments import get_experiment
from inverse_flow_tpu.data import synthetic
from inverse_flow_tpu.train.experiment import Experiment

spec = get_experiment("if_glow_mnist")
flow = spec.build_model()
loaders = synthetic.load_data((1, 28, 28), n_train=3200, n_val=320,
                              n_test=320, batch_size=100)
cfg = spec.config.replace(epochs=2, eval_epochs=1, sample_epochs=1,
                          n_samples=16, log_interval=8, save_images=False,
                          metrics_path="results/tpu_train_demo.jsonl",
                          checkpoint_path="results/tpu_train_demo.ckpt")
os.makedirs("results", exist_ok=True)
t0 = time.time()
exp = Experiment(flow, *loaders, cfg)
summary = exp.run()
summary["wall_s"] = round(time.time() - t0, 1)
summary["device"] = str(jax.devices()[0])
print(json.dumps({k: (float(v) if isinstance(v, (int, float)) else str(v))
                  for k, v in summary.items()}))

"""Command-line entry point: ``python -m inverse_flow_tpu.cli --name <exp>``.

Reference parity: ``inf/cli.py:15-22`` (``inf --name <experiment>``)
plus quality-of-life flags the reference lacks: ``--smoke`` (tiny model +
synthetic data + 2 epochs for CI), ``--epochs/--batch-size`` overrides,
``--list``, and ``--timescale`` which runs the timescaling sweeps
(``inf/experiments/if_timescaling.py:98-151``).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser("inverse_flow_tpu")
    parser.add_argument("--name", type=str, required=False,
                        help="experiment name (see --list)")
    parser.add_argument("--list", action="store_true")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny config + synthetic data, 2 epochs")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture an XLA profiler trace of epoch 1")
    parser.add_argument("--resume", nargs="?", const="", default=None,
                        metavar="CKPT",
                        help="resume from a checkpoint (default: the "
                             "experiment's own checkpoint path)")
    args = parser.parse_args(argv)

    # --cpu must be applied BEFORE anything initializes a backend:
    # enable_compilation_cache probes the default backend (to skip the
    # persistent cache on CPU, where cross-host AOT artifacts can
    # SIGILL), and that probe would otherwise dial the accelerator.
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from . import enable_compilation_cache
    enable_compilation_cache()

    from .experiments import EXPERIMENTS, get_experiment

    if args.list or not args.name:
        print("available experiments:")
        for name in sorted(set(EXPERIMENTS) | {"memory_speed"}):
            print(f"  {name}")
        return 0

    def _warn_ignored(kind):
        ignored = [f for f, v in (("--epochs", args.epochs),
                                  ("--batch-size", args.batch_size),
                                  ("--profile-dir", args.profile_dir),
                                  ("--resume", args.resume)) if v is not None]
        if ignored:
            print(f"warning: {kind} runs its own sweep config; "
                  f"ignoring {', '.join(ignored)}", file=sys.stderr)

    if args.name == "memory_speed":
        from .experiments.memory_speed import run_memory_speed
        _warn_ignored("memory_speed")
        return run_memory_speed(smoke=args.smoke)

    spec = get_experiment(args.name)
    cfg = spec.config

    if args.name.endswith("timescaling"):
        from .experiments.timescaling import run_timescaling
        _warn_ignored("timescaling")
        return run_timescaling(args.name, smoke=args.smoke)

    overrides = {}
    if args.profile_dir:
        overrides["profile_dir"] = args.profile_dir

    if args.smoke:
        overrides.update(epochs=2, batch_size=16, n_samples=4,
                         log_interval=5, sample_epochs=1, eval_epochs=1,
                         save_images=False)
    # explicit flags beat smoke defaults
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size

    if args.smoke:
        flow = _smoke_model(spec)
        from .data import synthetic
        data_size = _smoke_data_size(spec)
        loaders = synthetic.load_data(data_size, n_train=64, n_val=32,
                                      n_test=32,
                                      batch_size=overrides["batch_size"])
    else:
        flow = spec.build_model()
        loaders = spec.load_data(batch_size=overrides.get(
            "batch_size", cfg.batch_size))

    cfg = cfg.replace(**overrides)
    from .train.experiment import Experiment
    exp = Experiment(flow, *loaders, cfg)
    if args.resume is not None:
        exp.load(args.resume or None)
    summary = exp.run()
    print(json.dumps({k: _j(v) for k, v in summary.items()}))
    return 0


def _smoke_data_size(spec):
    return (3, 8, 8) if "cifar" in spec.name or "imagenet" in spec.name \
        else (1, 8, 8)


def _smoke_model(spec):
    """A miniature model of the same family as the experiment."""
    from .models.glow import build_cnn_flow, build_fc_flow, build_glow
    name = spec.name
    size = _smoke_data_size(spec)
    if "multi_gpu" in name or "fastflow" in name:
        from .models.fastflow import build_fastflow
        return build_fastflow(size, n_blocks=2, block_size=2,
                              coupling_width=16)
    kind_map = {
        "snf": "snf", "selfnorm": "snf", "conv1x1": "conv1x1",
        "ff": "ff", "emerging": "emerging", "exponential": "convexp",
    }
    kind = "inv_conv_no_pad"
    for key, k in kind_map.items():
        if name.startswith(key) or f"_{key}_" in name:
            kind = k
            break
    if "fc" in name.split("_"):
        return build_fc_flow(size, num_layers=2,
                             kind="snf_fc" if kind == "snf" else kind)
    if "cnn" in name.split("_"):
        if kind == "snf":
            kind = "snf_cnn"
        return build_cnn_flow(size, step_kind=kind, num_blocks=2,
                              block_size=2)
    return build_glow(size, step_kind=kind, num_blocks=2, block_size=2,
                      coupling_width=16)


def _j(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


if __name__ == "__main__":
    sys.exit(main())

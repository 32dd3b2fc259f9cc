"""inverse_flow_tpu — a TPU-native normalizing-flow framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
girish-lab/Inverse-Flow (AISTATS 2025, arXiv:2410.14634): invertible
convolutions whose training-direction transform is the inverse of a masked
convolution, a Glow-style model zoo, and a training/eval/sampling harness —
re-designed TPU-first (MXU-dense triangular-solve kernels, pjit data
parallelism over an ICI mesh, functional transforms).
"""

__version__ = "0.1.0"


def enable_compilation_cache(path=None):
    """Turn on JAX's persistent compilation cache for accelerator
    backends (verified to cut repeat compiles from seconds-to-minutes to
    milliseconds, including on tunneled/remote-compile backends). Called
    by the CLI, bench.py, and the scripts; library users opt in
    explicitly.

    Skipped when the active platform is CPU: XLA:CPU caches AOT machine
    code keyed without the host's CPU feature set, so an artifact cached
    by one machine can SIGILL on another (observed: '+prefer-no-scatter
    ... not supported on the host machine' loader errors when a cache
    directory moved hosts). CPU compiles here are seconds, not minutes —
    the cache buys little and risks a crash.
    """
    import os

    import jax

    try:
        if jax.default_backend() == "cpu":
            return None
    except Exception:
        pass
    path = path or os.environ.get(
        "IFT_JAX_CACHE_DIR",
        os.path.expanduser("~/.cache/inverse_flow_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path

"""Profiling helpers: jax.profiler traces + step timing.

Reference parity: the reference instruments every training batch with CUDA
events (``inf/train/experiment.py:221-224,259-262``) and aggregates with a
trimmed ``StatsRecorder``; the TPU-native equivalents are (a) the same
trimmed wall-clock stats (``train/stats.py``) and (b) XLA profiler traces
viewable in TensorBoard/Perfetto, exposed here as a context manager and a
config-driven hook (``profile_dir`` on the CLI / Experiment).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """Capture an XLA profiler trace into ``profile_dir`` (no-op if None)."""
    if not profile_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer for jitted steps: ``with timer: run()`` appends
    milliseconds; pair with StatsRecorder trimming for the reference's
    ``Batch Time Mean/Std`` convention."""

    def __init__(self):
        self.durations_ms = []
        self._t0 = None

    def __enter__(self):
        # NOTE: the `with` form stamps whatever the body leaves behind —
        # on an async backend that is DISPATCH time unless the body itself
        # blocks. Use :meth:`timed` for completion-time measurements.
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations_ms.append((time.perf_counter() - self._t0) * 1e3)
        return False

    def timed(self, fn, *args, **kwargs):
        """Run ``fn`` and record wall time INCLUDING device completion
        (``block_until_ready`` on the output)."""
        import jax
        self._t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.durations_ms.append((time.perf_counter() - self._t0) * 1e3)
        return out

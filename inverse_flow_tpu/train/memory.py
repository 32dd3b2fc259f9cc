"""Device-memory tracking.

Reference parity: ``inf/if_imagenet_multi_gpu.py:31-51`` (``MemoryTracker``
— per-epoch ``torch.cuda.memory_allocated/reserved`` deltas, logged by the
Experiment loop at ``inf/train/experiment.py:148-149``). The TPU-native
equivalent reads PJRT ``memory_stats`` (bytes_in_use / peak_bytes_in_use)
from each addressable device; on backends that expose no stats (CPU) every
reading is zero and logging is skipped.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Raw PJRT memory stats for one device, or None if unavailable."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    return stats or None


class MemoryTracker:
    """Tracks allocated / peak device memory across epochs (MB deltas)."""

    def __init__(self, device=None):
        self.device = device
        self.epoch_stats = []
        base = device_memory_stats(device)
        self.available = base is not None
        self._base = (base or {}).get("bytes_in_use", 0)

    def snapshot(self) -> Dict[str, float]:
        stats = device_memory_stats(self.device) or {}
        mb = 1.0 / (1024 * 1024)
        snap = {
            "allocated_mb": stats.get("bytes_in_use", 0) * mb,
            "peak_mb": stats.get("peak_bytes_in_use", 0) * mb,
            "delta_mb": (stats.get("bytes_in_use", 0) - self._base) * mb,
        }
        if "bytes_limit" in stats:
            snap["limit_mb"] = stats["bytes_limit"] * mb
        self.epoch_stats.append(snap)
        return snap

    def log_to(self, logger, prefix: str = "Memory"):
        if not self.available:
            return
        snap = self.snapshot()
        for key, val in snap.items():
            logger.log(f"{prefix} {key}", val)

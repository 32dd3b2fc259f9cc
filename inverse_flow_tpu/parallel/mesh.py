"""Device mesh + sharding helpers for data-parallel training over ICI.

Replaces the reference's single-process ``torch.nn.DataParallel`` path
(``inf/if_multiGPU_imagenet32.py``, ``if_imagenet_multi_gpu.py:497-498``:
replicate module, scatter batch, gather outputs on device0). TPU-native
equivalent: a 1-D ``Mesh`` over all chips, batches sharded along ``data``,
params replicated; XLA inserts the gradient all-reduce inside the jitted
train step — no NCCL-style code, no device-0 bottleneck.

The mesh axis layout is chosen so collectives ride ICI; for multi-pod
(DCN) training the same annotations extend to a 2-D ('replica', 'data')
mesh, which parity does not require (reference has no multi-node path,
SURVEY §2.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) dim over the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data"):
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))

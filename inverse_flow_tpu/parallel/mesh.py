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
        if n_devices > len(devices):
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} are available — a silently smaller mesh "
                f"would change the DP degree behind the caller's back")
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


def make_mesh_2d(n_data: int, n_model: int,
                 axes=("data", "model")) -> Mesh:
    """2-D (data, model) mesh. Parity needs only DP (SURVEY §2.3), but the
    coupling nets — where nearly all parameters live — shard cleanly over
    a 'model' axis (Megatron-style column/row split of the two wide
    convs), so the framework supports mixed dp x tp out of the box."""
    available = jax.devices()
    if n_data * n_model > len(available):
        raise ValueError(
            f"make_mesh_2d: requested {n_data}x{n_model}="
            f"{n_data * n_model} devices but only {len(available)} are "
            f"available")
    devices = np.asarray(available[: n_data * n_model])
    return Mesh(devices.reshape(n_data, n_model), axes)


def coupling_tp_shardings(params_tree, mesh: Mesh, axis: str = "model"):
    """A NamedSharding pytree for params: the coupling net's hidden width
    is sharded over ``axis`` (w1: output channels = column-parallel;
    w2: input channels = row-parallel — XLA inserts the psum), everything
    else replicated. Works for plain and RepeatedBlock-stacked params
    (leading K dim)."""
    if axis not in mesh.axis_names:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params_tree)
    n_shard = mesh.shape[axis]

    def spec_for(path, leaf):
        key = None
        for p in reversed(path):
            if hasattr(p, "key"):
                key = p.key
                break
        dim = None
        if key == "w1" and leaf.ndim >= 4:
            dim = leaf.ndim - 4          # (.., width, cin, kh, kw)
        elif key == "w2" and leaf.ndim >= 4:
            dim = leaf.ndim - 3          # (.., cout, width, 1, 1)
        if dim is None or leaf.shape[dim] % n_shard != 0:
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        spec[dim] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(spec_for, params_tree)

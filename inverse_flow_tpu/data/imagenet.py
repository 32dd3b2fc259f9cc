"""ImageNet 32x32 / 64x64 loaders.

Reference parity: ``inf/datasets/imagenet.py:13-108`` — tar extraction +
ImageFolder + random 20k validation split. Here we read the standard
downsampled-ImageNet npz/npy shards from ``$IFT_DATA_DIR/imagenet{32,64}``
(files matching ``train_data_batch_*.npz``/``.npy`` and ``val_data*``),
with the usual (N, 3072) -> (3, 32, 32) layout; synthetic fallback
otherwise (no network egress in this container).
"""

from __future__ import annotations

import glob
import os
import warnings

import numpy as np

from .loader import ArrayLoader


def _load_shards(pattern, size):
    files = sorted(glob.glob(pattern))
    parts = []
    for f in files:
        if f.endswith(".npz"):
            with np.load(f) as z:
                key = "data" if "data" in z else list(z.keys())[0]
                parts.append(z[key])
        else:
            parts.append(np.load(f))
    if not parts:
        return None
    data = np.concatenate(parts)
    if data.ndim == 2:
        data = data.reshape(-1, 3, size, size)
    # keep the source dtype (uint8 for the standard shards): a float32
    # conversion here would 4x the ~4 GB train array before the split
    # copies, and the loader converts per batch anyway
    return data


def load_data(size=32, batch_size=100, seed=0, val_split=20_000,
              synthetic_ok=True, **kwargs):
    base = os.path.join(os.environ.get("IFT_DATA_DIR", "./data"),
                        f"imagenet{size}")
    train = _load_shards(os.path.join(base, "train_data*"), size)
    test = _load_shards(os.path.join(base, "val_data*"), size)
    if train is None or test is None:
        if not synthetic_ok:
            raise FileNotFoundError(f"ImageNet{size} shards not found in {base}")
        warnings.warn(f"ImageNet{size} not found; using synthetic images")
        from .synthetic import load_data as synth
        return synth((3, size, size), n_train=2000, n_val=500, n_test=500,
                     batch_size=batch_size, seed=seed)

    # random 20k val split from train (imagenet.py:78-84), on the raw
    # (uint8) array; drop the unsplit copy before building loaders so
    # host peak stays ~2x the dataset, not ~8x
    rng = np.random.RandomState(seed)
    idx = rng.permutation(train.shape[0])
    val = train[idx[:val_split]]
    tr = train[idx[val_split:]]
    del train
    return (ArrayLoader(tr, batch_size, shuffle=True, seed=seed),
            ArrayLoader(val, batch_size, drop_last=False),
            ArrayLoader(test, batch_size, drop_last=False))

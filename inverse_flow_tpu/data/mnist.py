"""MNIST loader: 50k train / 10k val / 10k test.

Reference parity: ``inf/datasets/mnist.py:6-29`` (split at 50k; optional
reflect-pad + random-crop augmentation; raw 0-255 values via
ToTensorNoNorm).

Offline-first: reads the standard IDX files from ``$IFT_DATA_DIR/mnist`` or
``./data/mnist`` (train-images-idx3-ubyte[.gz] etc.). If absent, falls back
to deterministic synthetic images of the same shape with a warning (this
container has no network egress).
"""

from __future__ import annotations

import gzip
import os
import warnings

import numpy as np

from .loader import ArrayLoader

SHAPE = (1, 28, 28)

_FILES = {
    "train_images": "train-images-idx3-ubyte",
    "train_labels": "train-labels-idx1-ubyte",
    "test_images": "t10k-images-idx3-ubyte",
    "test_labels": "t10k-labels-idx1-ubyte",
}


def _data_dir():
    return os.path.join(os.environ.get("IFT_DATA_DIR", "./data"), "mnist")


def _read_idx(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    magic = int.from_bytes(data[0:4], "big")
    ndim = magic & 0xFF
    dims = [int.from_bytes(data[4 + 4 * i: 8 + 4 * i], "big")
            for i in range(ndim)]
    arr = np.frombuffer(data, np.uint8, offset=4 + 4 * ndim)
    return arr.reshape(dims)


def _find(name):
    d = _data_dir()
    for suffix in ("", ".gz"):
        p = os.path.join(d, name + suffix)
        if os.path.exists(p):
            return p
    return None


def load_arrays():
    """Returns (train_60k, test_10k) as (N, 1, 28, 28) float32 in [0,255]."""
    tr = _find(_FILES["train_images"])
    te = _find(_FILES["test_images"])
    if tr is None or te is None:
        return None
    train = _read_idx(tr).astype(np.float32)[:, None]
    test = _read_idx(te).astype(np.float32)[:, None]
    return train, test


def load_data(data_aug=False, batch_size=100, seed=0, synthetic_ok=True,
              train_split=50_000, **kwargs):
    arrays = load_arrays()
    if arrays is None:
        if not synthetic_ok:
            raise FileNotFoundError(
                f"MNIST idx files not found under {_data_dir()}")
        warnings.warn(
            "MNIST files not found; using deterministic synthetic images "
            f"(place idx files under {_data_dir()} for the real dataset)")
        from .synthetic import load_data as synth
        return synth(SHAPE, n_train=2000, n_val=500, n_test=500,
                     batch_size=batch_size, seed=seed)

    train_all, test = arrays
    augment = None
    if data_aug:
        from .loader import pad_translate_crop
        # Pad(1, 'reflect') + RandomCrop(28) (mnist.py:10-11)
        augment = pad_translate_crop(1, mode="reflect")
    return (ArrayLoader(train_all[:train_split], batch_size, shuffle=True,
                        seed=seed, augment=augment),
            ArrayLoader(train_all[train_split:], batch_size,
                        drop_last=False),
            ArrayLoader(test, batch_size, drop_last=False))

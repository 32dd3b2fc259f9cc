"""CIFAR-10 loader: 40k train / 10k val / 10k test with augmentation.

Reference parity: ``inf/datasets/cifar10.py:10-52`` — train split 40k/10k,
train transform = RandomHorizontalFlip -> edge-Pad(2) -> RandomAffine
integer translate -> CenterCrop(32) -> RandomHorizontalFlip (replicated
exactly, incl. the rounded-uniform shift distribution and the second
flip), raw 0-255 values.

Reads the python-pickle batches from ``$IFT_DATA_DIR/cifar-10-batches-py``
or ``./data/cifar-10-batches-py``; synthetic fallback otherwise.
"""

from __future__ import annotations

import os
import pickle
import warnings

import numpy as np

from .loader import (ArrayLoader, affine_translate_crop, compose,
                     random_flip_lr)

SHAPE = (3, 32, 32)


def _data_dir():
    base = os.environ.get("IFT_DATA_DIR", "./data")
    for cand in (os.path.join(base, "cifar-10-batches-py"),
                 os.path.join(base, "cifar10", "cifar-10-batches-py")):
        if os.path.isdir(cand):
            return cand
    return None


def load_arrays():
    d = _data_dir()
    if d is None:
        return None
    train_parts = []
    for i in range(1, 6):
        with open(os.path.join(d, f"data_batch_{i}"), "rb") as f:
            batch = pickle.load(f, encoding="bytes")
        train_parts.append(batch[b"data"])
    train = np.concatenate(train_parts).reshape(-1, 3, 32, 32)
    with open(os.path.join(d, "test_batch"), "rb") as f:
        batch = pickle.load(f, encoding="bytes")
    test = batch[b"data"].reshape(-1, 3, 32, 32)
    return train.astype(np.float32), test.astype(np.float32)


def load_data(data_aug=True, batch_size=100, seed=0, synthetic_ok=True,
              train_split=40_000, **kwargs):
    arrays = load_arrays()
    if arrays is None:
        if not synthetic_ok:
            raise FileNotFoundError("CIFAR-10 batches not found")
        warnings.warn("CIFAR-10 not found; using synthetic images")
        from .synthetic import load_data as synth
        return synth(SHAPE, n_train=2000, n_val=500, n_test=500,
                     batch_size=batch_size, seed=seed)

    train_all, test = arrays
    augment = None
    if data_aug:
        # flip -> pad(ceil(32*0.04)=2) affine-translate center-crop -> flip
        # (cifar10.py:12-19; second flip kept for literal parity)
        augment = compose(random_flip_lr, affine_translate_crop(2),
                          random_flip_lr)
    return (ArrayLoader(train_all[:train_split], batch_size, shuffle=True,
                        seed=seed, augment=augment),
            ArrayLoader(train_all[train_split:], batch_size,
                        drop_last=False),
            ArrayLoader(test, batch_size, drop_last=False))

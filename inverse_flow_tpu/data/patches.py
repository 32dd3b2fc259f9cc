"""Real RGB image patches — the second embedded real-data set.

2,080 REAL 16x16 RGB patches cut from the two real photographs
scikit-learn bundles offline (china.jpg / flower.jpg, 427x640 uint8),
checked into the package as ``data/embedded/patches16.npz`` (written by
``scripts/make_patches_fixture.py``). Patch density estimation over real
photographs is the classic natural-image-statistics benchmark; next to
the 8x8 grayscale digits (``data/digits.py``) this covers the 3-CHANNEL
raw-0-255 data path — the shape class of the reference's CIFAR/ImageNet32
configs (``inf/datasets/cifar10.py:10``, ``imagenet.py:55``) — with real
pixels in the egress-free build container.

Values are raw uint8 (ToTensorNoNorm semantics): uniform dequantization
and the /256 normalization apply exactly as for CIFAR.
"""

from __future__ import annotations

import os

import numpy as np

from .loader import ArrayLoader

SHAPE = (3, 16, 16)

_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "embedded", "patches16.npz")


def load_arrays():
    """(train, val, test) as (N, 3, 16, 16) float32 raw 0-255 values."""
    with np.load(_PATH) as z:
        return (z["train"].astype(np.float32),
                z["val"].astype(np.float32),
                z["test"].astype(np.float32))


def load_data(batch_size=100, seed=0, **kwargs):
    train, val, test = load_arrays()
    return (ArrayLoader(train, batch_size, shuffle=True, seed=seed),
            ArrayLoader(val, batch_size, shuffle=False, drop_last=False),
            ArrayLoader(test, batch_size, shuffle=False, drop_last=False))

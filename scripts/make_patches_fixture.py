"""Build the embedded real RGB-patch fixture (data/embedded/patches16.npz).

Second embedded REAL dataset (VERDICT r4 #8): 16x16 RGB patches cut on a
non-overlapping grid from the two real photographs scikit-learn bundles
offline (``sklearn.datasets.load_sample_images`` — china.jpg and
flower.jpg, 427x640 uint8 RGB). Patch-based density estimation over real
photographs is the classic natural-image-statistics benchmark setup, and
unlike the 8x8 grayscale digits this exercises the 3-CHANNEL data path
(the shape class of the reference's CIFAR/ImageNet32 headline configs,
``inf/datasets/cifar10.py:10``).

2,080 patches, shuffled with a fixed seed, split 1664/208/208
(80/10/10). Stored uint8 CHW in one ~1.6 MB npz checked into the
package. Deterministic: re-running reproduces the same bytes.

Usage: python scripts/make_patches_fixture.py
"""

from __future__ import annotations

import os

import numpy as np


def build_patches(patch=16):
    from sklearn.datasets import load_sample_images
    images = load_sample_images().images          # 2 x (427, 640, 3) uint8
    patches = []
    for im in images:
        h, w, _ = im.shape
        for i in range(0, h - patch + 1, patch):
            for j in range(0, w - patch + 1, patch):
                patches.append(im[i:i + patch, j:j + patch])
    x = np.stack(patches).transpose(0, 3, 1, 2)   # (N, 3, 16, 16) uint8
    rs = np.random.RandomState(0)
    x = x[rs.permutation(len(x))]
    n = len(x)
    n_val = n_test = n // 10
    n_train = n - n_val - n_test
    return (x[:n_train], x[n_train:n_train + n_val],
            x[n_train + n_val:])


def main():
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "inverse_flow_tpu", "data", "embedded",
                       "patches16.npz")
    tr, va, te = build_patches()
    np.savez_compressed(out, train=tr, val=va, test=te)
    print(f"wrote {os.path.normpath(out)}: train={tr.shape} val={va.shape} "
          f"test={te.shape} ({os.path.getsize(out) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()

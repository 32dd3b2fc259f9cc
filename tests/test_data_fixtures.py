"""Fixture-level tests of the real-data parsers.

Round-1 VERDICT weak-5: the IDX / CIFAR-pickle / ImageNet-npz parsing paths
had never executed on real bytes in CI. These tests write tiny fixtures in
the on-disk formats (IDX magic + big-endian dims; torchvision-compatible
pickle batches; downsampled-ImageNet npz shards) and run them through
``load_data``, asserting shapes / dtype / value round-trips.

Reference formats: ``inf/datasets/mnist.py:6-29``, ``cifar10.py:25-45``,
``imagenet.py:13-52``.
"""

import gzip
import os
import pickle

import numpy as np
import pytest


def _patch_data_dir(monkeypatch, tmp_path):
    monkeypatch.setenv("IFT_DATA_DIR", str(tmp_path))


def _write_idx(path, arr, gz=False):
    """Standard IDX: magic 0x0000 08 <ndim>, big-endian uint32 dims, raw
    uint8 payload."""
    header = (0x00000800 | arr.ndim).to_bytes(4, "big")
    for d in arr.shape:
        header += int(d).to_bytes(4, "big")
    payload = header + arr.astype(np.uint8).tobytes()
    if gz:
        with gzip.open(path + ".gz", "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


@pytest.mark.parametrize("gz", [False, True])
def test_mnist_idx_parser_roundtrip(tmp_path, monkeypatch, gz):
    from inverse_flow_tpu.data import mnist

    _patch_data_dir(monkeypatch, tmp_path)
    d = tmp_path / "mnist"
    d.mkdir()
    rs = np.random.RandomState(0)
    train = rs.randint(0, 256, (6, 28, 28)).astype(np.uint8)
    test = rs.randint(0, 256, (3, 28, 28)).astype(np.uint8)
    _write_idx(str(d / "train-images-idx3-ubyte"), train, gz=gz)
    _write_idx(str(d / "t10k-images-idx3-ubyte"), test, gz=gz)

    tr, va, te = mnist.load_data(batch_size=2, synthetic_ok=False,
                                 train_split=4)
    assert tr.data.shape == (4, 1, 28, 28)
    assert va.data.shape == (2, 1, 28, 28)
    assert te.data.shape == (3, 1, 28, 28)
    # exact byte-for-byte round-trip through the IDX parser
    np.testing.assert_array_equal(tr.data[:, 0].astype(np.uint8), train[:4])
    np.testing.assert_array_equal(te.data[:, 0].astype(np.uint8), test)
    batch = next(iter(te))
    assert batch.shape == (2, 1, 28, 28) and batch.dtype == np.float32
    assert batch.min() >= 0 and batch.max() <= 255


def test_mnist_augmentation_reflect_crop(tmp_path, monkeypatch):
    from inverse_flow_tpu.data import mnist

    _patch_data_dir(monkeypatch, tmp_path)
    d = tmp_path / "mnist"
    d.mkdir()
    imgs = np.arange(6 * 28 * 28, dtype=np.uint64).reshape(6, 28, 28)
    imgs = (imgs % 251).astype(np.uint8)
    _write_idx(str(d / "train-images-idx3-ubyte"), imgs)
    _write_idx(str(d / "t10k-images-idx3-ubyte"), imgs[:2])
    tr, _, _ = mnist.load_data(batch_size=4, synthetic_ok=False,
                               train_split=4, data_aug=True)
    batch = next(iter(tr))
    assert batch.shape == (4, 1, 28, 28)
    # every augmented image is a crop of the reflect-padded original:
    # its interior must appear in some original at an offset in {-1,0,1}
    padded = np.pad(imgs.astype(np.float32), ((0, 0), (1, 1), (1, 1)),
                    mode="reflect")
    for img in batch[:, 0]:
        found = any(
            np.array_equal(img, padded[i, oy:oy + 28, ox:ox + 28])
            for i in range(4) for oy in range(3) for ox in range(3))
        assert found


def test_cifar_pickle_parser_roundtrip(tmp_path, monkeypatch):
    from inverse_flow_tpu.data import cifar10

    _patch_data_dir(monkeypatch, tmp_path)
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rs = np.random.RandomState(1)
    per_batch = 4
    rows = []
    for i in range(1, 6):
        data = rs.randint(0, 256, (per_batch, 3072)).astype(np.uint8)
        rows.append(data)
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": [0] * per_batch}, f)
    test_rows = rs.randint(0, 256, (3, 3072)).astype(np.uint8)
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": test_rows, b"labels": [0] * 3}, f)

    tr, va, te = cifar10.load_data(batch_size=2, synthetic_ok=False,
                                   train_split=16, data_aug=False)
    assert tr.data.shape == (16, 3, 32, 32)
    assert va.data.shape == (4, 3, 32, 32)
    assert te.data.shape == (3, 3, 32, 32)
    all_rows = np.concatenate(rows).reshape(-1, 3, 32, 32)
    np.testing.assert_array_equal(tr.data.astype(np.uint8), all_rows[:16])
    np.testing.assert_array_equal(te.data.astype(np.uint8),
                                  test_rows.reshape(-1, 3, 32, 32))


def test_cifar_affine_translate_distribution():
    """The exact reference pipeline: shifts come from rounding a uniform
    on +/- 0.04*36 = +/- 1.44, so only {-1, 0, 1} occur and the affine
    zero-fill never enters the center crop."""
    from inverse_flow_tpu.data.loader import affine_translate_crop

    rng = np.random.RandomState(0)
    fn = affine_translate_crop(2)
    base = np.arange(36 * 36, dtype=np.float32).reshape(1, 1, 36, 36)
    base = base[:, :, 2:34, 2:34].copy()          # 32x32 distinct values
    batch = np.repeat(base, 512, axis=0)
    out = fn(batch.copy(), rng)
    padded = np.pad(base[0], ((0, 0), (2, 2), (2, 2)), mode="edge")
    seen = set()
    for img in out[:, 0]:
        hit = None
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                oy, ox = 2 - dy, 2 - dx
                if np.array_equal(img, padded[0, oy:oy + 32, ox:ox + 32]):
                    hit = (dy, dx)
        assert hit is not None, "augmented image is not a pure translate"
        seen.add(hit)
    assert all(abs(dy) <= 1 and abs(dx) <= 1 for dy, dx in seen)
    # all 9 combinations occur over 512 draws w.h.p.
    assert len(seen) == 9


def test_imagenet_npz_parser_roundtrip(tmp_path, monkeypatch):
    from inverse_flow_tpu.data import imagenet

    _patch_data_dir(monkeypatch, tmp_path)
    d = tmp_path / "imagenet32"
    d.mkdir()
    rs = np.random.RandomState(2)
    tr1 = rs.randint(0, 256, (6, 3072)).astype(np.uint8)
    tr2 = rs.randint(0, 256, (6, 3072)).astype(np.uint8)
    va = rs.randint(0, 256, (4, 3072)).astype(np.uint8)
    np.savez(d / "train_data_batch_1.npz", data=tr1)
    np.savez(d / "train_data_batch_2.npz", data=tr2)
    np.savez(d / "val_data.npz", data=va)

    tr, val, te = imagenet.load_data(size=32, batch_size=2,
                                     synthetic_ok=False, val_split=4)
    assert tr.data.shape == (8, 3, 32, 32)
    assert val.data.shape == (4, 3, 32, 32)
    assert te.data.shape == (4, 3, 32, 32)
    np.testing.assert_array_equal(te.data.astype(np.uint8),
                                  va.reshape(-1, 3, 32, 32))
    # the shuffled train/val split partitions the shard rows exactly
    combined = np.concatenate([tr1, tr2]).reshape(-1, 3, 32, 32)
    got = np.concatenate([val.data, tr.data]).astype(np.uint8)
    assert got.shape[0] == combined.shape[0]
    got_sorted = got.reshape(12, -1)[np.lexsort(got.reshape(12, -1).T)]
    ref_sorted = combined.reshape(12, -1)[
        np.lexsort(combined.reshape(12, -1).T)]
    np.testing.assert_array_equal(got_sorted, ref_sorted)


def test_imagenet_npy_shard(tmp_path, monkeypatch):
    from inverse_flow_tpu.data import imagenet

    _patch_data_dir(monkeypatch, tmp_path)
    d = tmp_path / "imagenet64"
    d.mkdir()
    rs = np.random.RandomState(3)
    tr = rs.randint(0, 256, (5, 3, 64, 64)).astype(np.uint8)
    va = rs.randint(0, 256, (2, 3, 64, 64)).astype(np.uint8)
    np.save(d / "train_data_batch_1.npy", tr)
    np.save(d / "val_data.npy", va)
    trl, vl, tl = imagenet.load_data(size=64, batch_size=2,
                                     synthetic_ok=False, val_split=2)
    assert trl.data.shape == (3, 3, 64, 64)
    assert tl.data.shape == (2, 3, 64, 64)
    np.testing.assert_array_equal(tl.data.astype(np.uint8), va)

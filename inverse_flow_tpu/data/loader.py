"""In-memory batch loader with per-epoch shuffling.

The torch ``DataLoader`` equivalent for this framework's datasets: all the
reference datasets fit in host memory (MNIST/CIFAR/ImageNet32 uint8), so the
loader is an ndarray + shuffle + static-shape batches (drop_last) — static
shapes keep every train step hitting the same XLA executable.

Optional data augmentation hooks mirror the reference transforms
(``inf/datasets/cifar10.py:12-19``: random flip, edge-pad + random
translate + center crop). ``ToTensorNoNorm`` semantics are preserved: raw
0-255 values, HWC -> CHW (``inf/train/datatransforms.py:5-11``).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


class ArrayLoader:
    def __init__(self, data: np.ndarray, batch_size: int, shuffle=False,
                 seed: int = 0, drop_last=True,
                 augment: Optional[Callable] = None,
                 native_prefetch: Optional[bool] = None):
        """``native_prefetch``: gather + shuffle batches on a background
        C++ thread (``native/prefetch.cpp``, the threaded-DataLoader
        equivalent). None = auto: enabled for shuffled uint8-valued data
        when the native library is available."""
        assert data.ndim >= 2
        self.data = data
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.augment = augment
        self._rng = np.random.RandomState(seed)
        self._seed = seed
        self.data_shape = tuple(data.shape[1:])
        self._prefetcher = None
        if native_prefetch or native_prefetch is None:
            self._maybe_init_prefetch(forced=bool(native_prefetch))

    def _maybe_init_prefetch(self, forced: bool):
        from .. import native
        d = self.data
        # Lossless-uint8 check over the FULL array (a sampled integrality
        # probe once let fractional float data through and the uint8 cast
        # silently truncated it): every value must be integral in [0, 255].
        is_u8 = (d.dtype == np.uint8
                 or (np.issubdtype(d.dtype, np.floating)
                     and d.size and float(d.min()) >= 0
                     and float(d.max()) <= 255
                     and np.array_equal(d, np.floor(d))))
        if forced and not is_u8:
            raise ValueError(
                "native_prefetch=True requires losslessly uint8-"
                "convertible data (integral values in [0, 255]); the "
                "uint8 cast would truncate/wrap this array")
        # the C++ worker assembles full batches only; n < batch_size would
        # index past the shuffle order (and the python fallback's clamped
        # single short batch could never be reproduced)
        if d.shape[0] < self.batch_size:
            if forced:
                raise ValueError(
                    f"native_prefetch=True needs at least one full batch "
                    f"({d.shape[0]} samples < batch_size="
                    f"{self.batch_size})")
            return
        if forced and not self.drop_last and d.shape[0] % self.batch_size:
            raise ValueError(
                "native_prefetch=True drops the final partial batch, "
                "contradicting drop_last=False for this data size")
        if not ((self.shuffle and self.drop_last and is_u8) or forced):
            return
        if not native.available():
            if forced:
                raise RuntimeError("native prefetcher unavailable")
            return
        self._prefetcher = native.NativePrefetcher(
            d.astype(np.uint8, copy=False), self.batch_size,
            shuffle=self.shuffle, seed=self._seed)

    def __len__(self):
        n = self.data.shape[0] // self.batch_size
        if not self.drop_last and self.data.shape[0] % self.batch_size:
            n += 1
        return max(1, n)

    def __iter__(self):
        if self._prefetcher is not None:
            for _ in range(self._prefetcher.batches_per_epoch):
                batch = self._prefetcher.next().astype(np.float32)
                if self.augment is not None:
                    batch = self.augment(batch, self._rng)
                yield batch
            return
        idx = np.arange(self.data.shape[0])
        if self.shuffle:
            self._rng.shuffle(idx)
        stop = (len(idx) - self.batch_size + 1 if self.drop_last
                else len(idx))
        if stop <= 0:
            stop = 1
        for start in range(0, max(1, stop), self.batch_size):
            batch = self.data[idx[start:start + self.batch_size]]
            batch = batch.astype(np.float32)
            if self.augment is not None:
                batch = self.augment(batch, self._rng)
            yield batch


def random_flip_lr(batch, rng):
    flip = rng.rand(batch.shape[0]) < 0.5
    batch[flip] = batch[flip][..., ::-1]
    return batch


def pad_translate_crop(pad: int, mode: str = "edge"):
    """Pad then uniform random crop back to the original size.

    ``mode='reflect'`` with ``pad=1`` is exactly the reference MNIST
    augmentation (``transforms.Pad(1, 'reflect')`` + ``RandomCrop(28)``,
    ``inf/datasets/mnist.py:10-11``): integer offsets uniform on
    ``{0..2*pad}`` per axis.
    """

    def fn(batch, rng):
        b, c, h, w = batch.shape
        padded = np.pad(batch, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                        mode=mode)
        out = np.empty_like(batch)
        offs = rng.randint(0, 2 * pad + 1, size=(b, 2))
        for i in range(b):
            oy, ox = offs[i]
            out[i] = padded[i, :, oy:oy + h, ox:ox + w]
        return out

    return fn


def affine_translate_crop(pad: int, translate_frac: float = 0.04):
    """Edge-pad + integer RandomAffine translate + center crop — the exact
    reference CIFAR pipeline (``inf/datasets/cifar10.py:12-19``).

    torchvision's ``RandomAffine(degrees=0, translate=(f, f))`` on the
    padded (H+2p, W+2p) image draws a uniform shift in
    ``[-f*(W+2p), f*(W+2p)]`` and ROUNDS it to an integer pixel shift, so
    for f=0.04, p=2 the shifts are in {-1, 0, 1} with P(0) ~ 0.347 — NOT
    uniform over the padded window. ``CenterCrop`` then leaves a >= 1 px
    margin, so the affine zero-fill never enters the crop.
    """

    def fn(batch, rng):
        b, c, h, w = batch.shape
        padded = np.pad(batch, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                        mode="edge")
        hp, wp = h + 2 * pad, w + 2 * pad
        dx = np.round(rng.uniform(-translate_frac * wp, translate_frac * wp,
                                  size=b)).astype(int)
        dy = np.round(rng.uniform(-translate_frac * hp, translate_frac * hp,
                                  size=b)).astype(int)
        np.clip(dx, -pad, pad, out=dx)
        np.clip(dy, -pad, pad, out=dy)
        out = np.empty_like(batch)
        for i in range(b):
            oy, ox = pad - dy[i], pad - dx[i]
            out[i] = padded[i, :, oy:oy + h, ox:ox + w]
        return out

    return fn


def compose(*fns):
    def fn(batch, rng):
        for f in fns:
            batch = f(batch, rng)
        return batch

    return fn

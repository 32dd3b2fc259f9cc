"""Native C++ oracle / prefetcher tests (skipped if the .so can't build)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverse_flow_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_native_solver_matches_xla():
    from inverse_flow_tpu.ops.inv_conv import (apply_mask, inv_conv_solve,
                                               masked_conv_apply)
    w = np.asarray(apply_mask(
        0.3 * jax.random.normal(jax.random.PRNGKey(0), (3, 3, 3, 3))))
    x = np.random.RandomState(1).randn(2, 3, 6, 6).astype(np.float32)
    y_native = native.inv_conv_solve(x, w)
    y_xla = np.asarray(inv_conv_solve(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(y_native, y_xla, atol=1e-4, rtol=1e-4)
    # f64 round trip through the native conv is near machine precision
    z = native.masked_conv(y_native, w)
    np.testing.assert_allclose(z, x, atol=1e-10)


def test_native_solver_grouped():
    from inverse_flow_tpu.ops.inv_conv import apply_mask, inv_conv_solve
    g, cg = 2, 2
    wg = np.stack([np.asarray(apply_mask(0.3 * jax.random.normal(
        jax.random.PRNGKey(i), (cg, cg, 2, 2)))) for i in range(g)])
    w = wg.reshape(g * cg, cg, 2, 2)
    x = np.random.RandomState(2).randn(2, g * cg, 5, 5).astype(np.float32)
    y_native = native.inv_conv_solve(x, w, groups=g)
    y_xla = np.asarray(inv_conv_solve(jnp.asarray(x), jnp.asarray(w), g))
    np.testing.assert_allclose(y_native, y_xla, atol=1e-4, rtol=1e-4)


def test_prefetcher_covers_epoch():
    data = np.arange(32 * 4, dtype=np.uint8).reshape(32, 4)
    p = native.NativePrefetcher(data, 8, shuffle=True, seed=1)
    seen = set()
    for _ in range(p.batches_per_epoch):
        batch = p.next()
        assert batch.shape == (8, 4)
        seen.update(batch[:, 0].tolist())
    p.close()
    assert len(seen) == 32  # every item appears once per epoch


def test_arrayloader_native_prefetch_path():
    from inverse_flow_tpu import native
    from inverse_flow_tpu.data.loader import ArrayLoader

    if not native.available():
        pytest.skip("native library unavailable")
    data = np.random.RandomState(0).randint(
        0, 256, (40, 1, 4, 4)).astype(np.float32)
    loader = ArrayLoader(data, 8, shuffle=True, seed=1)
    assert loader._prefetcher is not None   # auto-enabled
    batches = list(loader)
    assert len(batches) == 5
    assert batches[0].shape == (8, 1, 4, 4)
    assert batches[0].dtype == np.float32
    # every item still comes from the dataset
    flat = {arr.tobytes() for arr in data.astype(np.uint8)}
    for b in batches:
        for item in b.astype(np.uint8):
            assert item.tobytes() in flat
    # plain path still default for unshuffled loaders
    assert ArrayLoader(data, 8)._prefetcher is None


def test_prefetch_next_returns_error_on_dead_worker():
    """A consumer parked in ift_prefetch_next must NOT hang forever when
    the worker exits without producing (bad geometry reachable through the
    raw C API): next() returns -1 promptly instead of re-sleeping on a
    dead producer."""
    import ctypes
    import threading

    lib = native._load()
    data = np.zeros((4, 8), np.uint8)
    # batch_size > n: the worker's run loop exits immediately
    handle = lib.ift_prefetch_create(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        4, 8, 16, 0, 0, 2)
    out = np.empty((16, 8), np.uint8)
    rc = []

    def consume():
        rc.append(lib.ift_prefetch_next(
            handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))))

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=10.0)
    assert not t.is_alive(), "ift_prefetch_next hung on a dead worker"
    assert rc == [-1]
    lib.ift_prefetch_destroy(handle)


def test_filter_heatmap_grid_has_gray_levels():
    """Regression: a double *255 quantization used to saturate every tile
    to pure white; per-kernel-normalized heatmaps must keep intermediate
    gray levels."""
    from inverse_flow_tpu.utils.imaging import filter_heatmap_grid
    w = np.random.RandomState(0).randn(4, 3, 3, 3).astype(np.float32)
    grid = filter_heatmap_grid(w)
    assert grid.dtype == np.uint8
    interior = grid[grid != 255]
    # normalized tiles span [0,255]; mid-range values must survive
    assert ((interior > 20) & (interior < 235)).sum() > 10

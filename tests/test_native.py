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

"""Pallas block-scan kernel vs the XLA reference scan (interpret mode on
CPU; the compiled kernel runs on real TPU via IFT_INV_CONV_IMPL=pallas).

The kernel under test fuses the sequential inter-block recurrence of the
row-blocked triangular solve into one VMEM-resident kernel — the TPU
re-design of the reference's per-diagonal launch+sync wavefront
(``inf/utils/inv_conv_cuda/inv_conv_with_bp_kernel_general.cu:97-126``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverse_flow_tpu.ops import inv_conv as ic


@pytest.mark.parametrize("b,nb,rcw,kcw", [
    (4, 3, 64, 32),
    (16, 7, 448, 224),
    (100, 2, 56, 56),
])
def test_pallas_scan_matches_xla(b, nb, rcw, kcw):
    key = jax.random.PRNGKey(0)
    c_all = jax.random.normal(key, (b, nb, rcw), jnp.float32)
    g = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (rcw, kcw),
                                jnp.float32)
    y_xla = ic._scan_blocks_xla(c_all, g, kcw)
    y_pl = ic._scan_blocks_pallas(c_all, g, kcw, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               atol=1e-5, rtol=1e-5)


def test_pallas_solve_matches_dense_oracle(monkeypatch):
    orig = ic._scan_blocks_pallas
    monkeypatch.setattr(ic, "_scan_blocks_pallas",
                        lambda c, g, k: orig(c, g, k, interpret=True))
    ic.set_impl("pallas")
    try:
        c, h, w = 4, 12, 8
        w_eff = ic.apply_mask(
            0.3 * jax.random.normal(jax.random.PRNGKey(2), (c, c, 3, 3)))
        x = jax.random.normal(jax.random.PRNGKey(3), (9, c, h, w))
        y = ic.inv_conv_solve(x, w_eff)
        t = ic.dense_operator(w_eff, c, h, w)
        y_ref = jnp.linalg.solve(t, x.reshape(9, -1).T).T.reshape(x.shape)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-3, rtol=2e-3)
    finally:
        ic.set_impl("auto")


def test_pallas_batch_tile_budget():
    # the B=400 glow shape that must tile, not OOM
    bt = ic._pallas_batch_tile(400, 7, 448, 224)
    assert bt is not None and bt % 8 == 0
    assert 4 * 7 * bt * 448 + 448 * 224 <= 10 * 1024 * 1024 // 4
    # tiny batches fall back to the full batch
    assert ic._pallas_batch_tile(5, 3, 64, 32) == 5
    # absurdly large per-block rows refuse (caller falls back to XLA)
    assert ic._pallas_batch_tile(100, 4000, 4096, 2048) is None

"""Mixed-precision coupling policy (round-2 VERDICT item 5).

The bf16 policy touches ONLY the coupling net's internal compute; the
affine transform, ldj accounting, and every other layer stay f32. These
tests pin the invariants that make the policy safe:
  * exact invertibility is UNAFFECTED (forward and inverse evaluate the
    same net, so the roundtrip cancels exactly whatever the net dtype);
  * at zero-init (the training start) the policies are bit-identical;
  * the likelihood delta at realistic coupling scales stays small (the
    trained-model delta is measured on real data by
    scripts/train_real_digits.py and recorded in results/).
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from inverse_flow_tpu.layers import Coupling


def _params(rng, layer, scale):
    p, _ = layer.init(rng, layer.input_size)
    leaves, td = jax.tree_util.tree_flatten(p)
    ks = jax.random.split(jax.random.fold_in(rng, 1), len(leaves))
    return jax.tree_util.tree_unflatten(td, [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, ks)])


@pytest.mark.slow
def test_bf16_coupling_roundtrip_exact():
    size = (4, 8, 8)
    layer = Coupling(size, width=32, compute_dtype="bfloat16")
    params = _params(jax.random.PRNGKey(0), layer, 0.05)
    x = jax.random.normal(jax.random.PRNGKey(2), (8,) + size, jnp.float32)
    z, ldj = layer.forward(params, x)
    x_rt = layer.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x),
                               atol=1e-5, rtol=1e-5)
    assert z.dtype == jnp.float32 and ldj.dtype == jnp.float32


def test_policies_identical_at_zero_init():
    size = (4, 8, 8)
    f32 = Coupling(size, width=32)
    bf = Coupling(size, width=32, compute_dtype="bfloat16")
    params, _ = f32.init(jax.random.PRNGKey(0), size)   # w3/b3/logs3 zero
    x = jax.random.normal(jax.random.PRNGKey(1), (4,) + size, jnp.float32)
    z32, l32 = f32.forward(params, x)
    zbf, lbf = bf.forward(params, x)
    np.testing.assert_array_equal(np.asarray(z32), np.asarray(zbf))
    np.testing.assert_array_equal(np.asarray(l32), np.asarray(lbf))


def test_bf16_ldj_delta_small_at_realistic_scale():
    size = (4, 8, 8)
    f32 = Coupling(size, width=32)
    bf = Coupling(size, width=32, compute_dtype="bfloat16")
    params = _params(jax.random.PRNGKey(3), f32, 0.01)
    x = jax.random.normal(jax.random.PRNGKey(4), (8,) + size, jnp.float32)
    _, l32 = f32.forward(params, x)
    _, lbf = bf.forward(params, x)
    # per-layer ldj delta, in bpd units of this layer's input
    d = float(np.max(np.abs(np.asarray(l32) - np.asarray(lbf))))
    bpd = d / (np.log(2.0) * np.prod(size))
    assert bpd < 2e-3, f"per-layer bf16 ldj delta too large: {bpd} bpd"
"""Conditional B-spline transformer + BSplineCoupling.

Reference parity: ``inf/layers/splines/bspline.py:20-190`` (the conditional
transformer the reference defines but never successfully constructs — its
only experiment use, ``if_glow_mnist.py:44``, passes an int as the params
net). Checks: exact invertibility, logdet vs autodiff Jacobian, and that
the conditioning input genuinely changes the transform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverse_flow_tpu.layers import BSplineCoupling
from inverse_flow_tpu.layers.splines import ConditionalBSplineTransformer

from test_layers import check_inverse, check_logdet

IMG = (4, 6, 6)


def _net_out(key, batch, y_dim, n_bins):
    return 0.5 * jax.random.normal(key, (batch, y_dim * (n_bins + 3)))


@pytest.mark.slow
def test_transformer_roundtrip_and_logdet():
    t = ConditionalBSplineTransformer(y_dim=5, n_bins=6,
                                      left=0.0, right=1.0,
                                      bottom=-2.0, top=3.0)
    key = jax.random.PRNGKey(0)
    net_out = _net_out(key, 7, 5, 6)
    y = jax.random.uniform(jax.random.PRNGKey(1), (7, 5))
    z, ld = t.forward(net_out, y)
    assert z.min() >= -2.0 and z.max() <= 3.0
    y_rt, ld_inv = t.inverse(net_out, z)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)

    # elementwise logdet == log d z/d y from autodiff (map is elementwise
    # in y, so the Jacobian is diagonal)
    jac = jax.jacfwd(lambda yy: t.forward(net_out[:1], yy[None])[0][0])(y[0])
    np.testing.assert_allclose(
        np.asarray(ld[0]), np.asarray(jnp.log(jnp.diag(jac))),
        atol=1e-3, rtol=1e-3)


def test_transformer_is_actually_conditional():
    t = ConditionalBSplineTransformer(y_dim=3, n_bins=4)
    y = jnp.full((2, 3), 0.37)
    z1, _ = t.forward(_net_out(jax.random.PRNGKey(2), 2, 3, 4), y)
    z2, _ = t.forward(_net_out(jax.random.PRNGKey(3), 2, 3, 4), y)
    assert float(jnp.max(jnp.abs(z1 - z2))) > 1e-3


@pytest.mark.slow
def test_bspline_coupling_layer():
    layer = BSplineCoupling(IMG, width=16, n_bins=4, tail_bound=3.0)
    rng = jax.random.PRNGKey(0)
    params, _ = layer.init(rng, IMG)
    x = jax.random.normal(jax.random.PRNGKey(1), (3,) + IMG)

    # zero-init => identity
    z0, ldj0 = layer.forward(params, x)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj0), 0.0, atol=1e-5)

    # perturbed params: invertible with correct logdet (logs3 feeds
    # exp(3*logs3), so keep the perturbation at trained-scale magnitudes)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(7),
                                              p.shape), params)
    check_inverse(layer, params, x, atol=1e-3)
    check_logdet(layer, params, x, atol=1e-3, rtol=1e-3)

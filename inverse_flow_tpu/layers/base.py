"""Invertible-layer contract for the TPU-native Inverse-Flow framework.

Reference parity: mirrors the capability surface of the PyTorch ABCs in
``inf/layers/flowlayer.py:7-51`` (FlowLayer / ModifiedGradFlowLayer /
PreprocessingFlowLayer), re-designed as *pure functions over pytrees* so the
whole flow composes inside a single ``jax.jit``:

  * ``init(rng, shape) -> (params, out_shape)``  -- parameter creation; shape
    excludes the batch dimension.
  * ``forward(params, x, rng=None) -> (z, ldj)`` -- training-direction
    transform; ``ldj`` is ALWAYS a ``(B,)`` float32 array (this fixes the
    reference's float/tensor double-add bug at ``flowsequential.py:30-35``).
  * ``inverse(params, z, rng=None) -> x``        -- sampling direction.
  * ``exact_forward(params, x) -> (z, ldj)``     -- the reference's
    ``compute_expensive=True`` path (exact log-determinants); defaults to
    ``forward``.
  * ``exact_inverse(params, z) -> x``            -- exact inverse (dense
    Toeplitz solve in the reference); defaults to ``inverse``.
  * ``data_init(params, x) -> params``           -- optional data-dependent
    initialization (ActNorm first-batch statistics).
  * ``recon_loss(params, x) -> (B,)``            -- optional layer-local
    reconstruction loss used by self-normalizing layers
    (``selfnorm.py:187-229``).

Layer *objects* hold only static hyper-parameters (hashable config) and are
closed over during tracing; all learnable state lives in the params pytree.
No mutable ``self.input``/``self.output`` caching (reference does this at
``selfnorm.py:158,165``).
"""

from __future__ import annotations

import jax.numpy as jnp


def sum_except_batch(x):
    """Sum all axes except the leading batch axis. Returns shape (B,)."""
    return jnp.sum(x.reshape(x.shape[0], -1), axis=-1)


def zeros_ldj(x):
    """A (B,) zero log-det contribution matching x's batch size."""
    return jnp.zeros((x.shape[0],), dtype=jnp.float32)


class FlowLayer:
    """Base invertible layer. Subclasses are static-config dataclasses."""

    #: marks layers that belong to the preprocessing group
    #: (``flowlayer.py:45`` PreprocessingFlowLayer)
    is_preprocessing: bool = False

    #: marks layers whose cheap-path gradient is intentionally modified and
    #: whose exact path differs (``flowlayer.py:26`` ModifiedGradFlowLayer)
    has_modified_grad: bool = False

    def init(self, rng, shape):
        """Create parameters. Returns ``(params, out_shape)``."""
        del rng
        return {}, shape

    def forward(self, params, x, rng=None):
        raise NotImplementedError

    def inverse(self, params, z, rng=None):
        raise NotImplementedError

    def exact_forward(self, params, x):
        """Exact-logdet path (reference ``compute_expensive=True``)."""
        return self.forward(params, x)

    def exact_ldj_correction(self, params, in_shape):
        """Params-only ``exact ldj - cheap ldj`` for one sample.

        For every modified-grad layer in this framework the *data values*
        of ``exact_forward`` and ``forward`` coincide (same conv); only the
        log-det accounting differs, and that difference depends on params
        alone. Exposing it separately lets eval amortize the expensive
        dense slogdets once per epoch instead of once per batch (the
        reference's dirty-flag cache, ``selfnorm.py:241-246``).
        ``in_shape`` is the layer's input shape without the batch dim.
        """
        del params, in_shape
        return jnp.zeros((), jnp.float32)

    def exact_inverse(self, params, z):
        """Exact-inverse path (reference dense Toeplitz inverse)."""
        return self.inverse(params, z)

    @property
    def has_exact_path(self):
        """Dispatch gate for ``exact=True`` flows: True when the layer's
        exact_forward/exact_inverse differ from the cheap pair. Covers
        modified-grad layers AND mode-dependent layers whose eval path
        merely refines the cheap one (ConvExp's 13-term eval series,
        ``convexp_module.py:46-47``) without any gradient modification."""
        cls = type(self)
        return (self.has_modified_grad
                or cls.exact_forward is not FlowLayer.exact_forward
                or cls.exact_inverse is not FlowLayer.exact_inverse)

    # --- optional hooks -------------------------------------------------
    def prepare(self, params, shape):
        """Optional params-only per-step precomputation (e.g. the
        inverse-conv solve operator). Returns an aux pytree consumed by
        :meth:`forward_prepared`, or None when nothing applies.
        ``shape`` is the layer's input shape without the batch dim.
        ``RepeatedBlock`` vmaps this over its K stacked steps OUTSIDE
        the depth scan, so the work batches over K and leaves the
        sequential loop body."""
        del params, shape
        return None

    def forward_prepared(self, params, aux, x, rng=None):
        """``forward`` with a precomputed :meth:`prepare` aux. Default
        ignores the aux."""
        del aux
        return self.forward(params, x, rng=rng)

    @property
    def has_prepare(self):
        return type(self).prepare is not FlowLayer.prepare

    def data_init(self, params, x):
        """Data-dependent init; default is a no-op."""
        del x
        return params

    #: set True on layers that carry non-learnable state in their params
    #: (e.g. ConvExp's power-iteration vector u)
    has_carry: bool = False

    def update_carry(self, params):
        """Refresh carried non-learnable state after an optimizer step
        (the reference updates such buffers in forward-pre-hooks under
        ``torch.no_grad``, ``spectral.py:208-244``). Default no-op."""
        return params

    def carry_mask(self, params):
        """Pytree of Python bools marking carried (non-learnable) leaves;
        the trainer zeroes optimizer updates and skips weight clamping on
        them."""
        import jax
        return jax.tree_util.tree_map(lambda _: False, params)

    def recon_loss(self, params, x, sym=False, only_R=False):
        """Layer-local reconstruction loss; default contributes nothing."""
        del params, sym, only_R
        return jnp.zeros((x.shape[0],), dtype=jnp.float32)

    #: set True on layers that define a meaningful recon_loss
    has_recon_loss: bool = False

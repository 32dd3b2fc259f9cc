"""Flow composition: the TPU-native FlowSequential.

Reference parity: ``inf/layers/flowsequential.py:8-142``. Differences by
design:

  * log-det accumulated exactly ONCE per layer (the reference adds
    ``layer_logdet`` twice — ``flowsequential.py:30-35`` — and prints per
    layer in the hot loop at ``:36``; neither is reproduced).
  * everything is a pure function of ``(params, x, rng)`` so the full
    forward/log_prob/sample/reconstruct close under one ``jax.jit``.
  * rngs are split per layer index, giving deterministic dequantization /
    split-prior sampling given a seed.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .base import FlowLayer


class Flow:
    """A sequence of invertible layers with a base distribution.

    Params are a list (one pytree per layer), making the whole model a
    single pytree suitable for optax / checkpointing / sharding.
    """

    def __init__(self, base_distribution, layers: Sequence[FlowLayer]):
        self.base_distribution = base_distribution
        self.layers = tuple(layers)

    # ------------------------------------------------------------------
    def init(self, rng, input_shape):
        """Create all layer params. Returns (params, final_shape)."""
        params = []
        shape = tuple(input_shape)
        for layer in self.layers:
            rng, sub = jax.random.split(rng)
            p, shape = layer.init(sub, shape)
            params.append(p)
        return params, shape

    def _layer_rngs(self, rng, salt=0):
        if rng is None:
            return [None] * len(self.layers)
        return list(jax.random.split(jax.random.fold_in(rng, salt),
                                     len(self.layers)))

    # ------------------------------------------------------------------
    def forward(self, params, x, rng=None, exact=False):
        """Run all layers; returns (z, log_px) where log_px includes the
        base log-prob (``flowsequential.py:20-43``)."""
        rngs = self._layer_rngs(rng)
        logdet = jnp.zeros((x.shape[0],), jnp.float32)
        for layer, p, r in zip(self.layers, params, rngs):
            if exact and layer.has_exact_path:
                x, ldj = layer.exact_forward(p, x)
            else:
                x, ldj = layer.forward(p, x, rng=r)
            logdet = logdet + ldj
        logprob = self.base_distribution.log_prob(x)
        return x, logprob + logdet

    def log_prob(self, params, x, rng=None, exact=True):
        """``flowsequential.py:45-46`` — exact path by default."""
        return self.forward(params, x, rng=rng, exact=exact)[1]

    def forward_verbose(self, params, x, rng=None):
        """Forward returning per-layer mean ldj (the reference's `verbose`
        per-layer logdet logging, README.md:121 / flowsequential.py:36).
        Returns (z, log_px, {layer_name_i: mean_ldj})."""
        rngs = self._layer_rngs(rng)
        logdet = jnp.zeros((x.shape[0],), jnp.float32)
        per_layer = {}
        for i, (layer, p, r) in enumerate(zip(self.layers, params, rngs)):
            x, ldj = layer.forward(p, x, rng=r)
            logdet = logdet + ldj
            per_layer[f"{i:02d}_{type(layer).__name__}"] = jnp.mean(ldj)
        logprob = self.base_distribution.log_prob(x)
        return x, logprob + logdet, per_layer

    def cheap_log_prob(self, params, x, rng=None):
        return self.forward(params, x, rng=rng, exact=False)[1]

    def exact_ldj_correction(self, params, input_shape, rng=None):
        """Params-only scalar with
        ``exact log_prob == cheap log_prob + correction`` per sample.

        Valid because every modified-grad layer's exact path transforms the
        data identically to the cheap path (only the ldj accounting
        differs, and that part is data-independent). Evaluating this ONCE
        per eval epoch replaces the reference's per-batch dense slogdets
        (dirty-flag cache semantics, ``selfnorm.py:241-246``).

        ConvExp is the one exact-path layer whose VALUES differ (13- vs
        6-term series); it contributes no correction, so with ConvExp in
        the flow the identity holds up to the series tail
        (~coeff^7/7! ≈ 1e-4 per layer at coeff=0.9).
        """
        corr = jnp.zeros((), jnp.float32)
        shape = tuple(input_shape)
        if rng is None:
            rng = jax.random.PRNGKey(0)     # shapes only, values unused
        for layer, p in zip(self.layers, params):
            corr = corr + layer.exact_ldj_correction(p, shape)
            z = jax.eval_shape(
                lambda pp, shp=shape, lyr=layer: lyr.forward(
                    pp, jnp.zeros((1,) + shp, jnp.float32), rng=rng)[0], p)
            shape = tuple(z.shape[1:])
        return corr

    # ------------------------------------------------------------------
    def sample(self, params, rng, n_samples, exact=False):
        """Draw from the base and run layers in reverse
        (``flowsequential.py:88-114``)."""
        rng, base_rng = jax.random.split(rng)
        z, _ = self.base_distribution.sample(base_rng, n_samples)
        rngs = self._layer_rngs(rng, salt=1)
        for layer, p, r in zip(reversed(self.layers),
                               reversed(params), reversed(rngs)):
            if exact and layer.has_exact_path:
                z = layer.exact_inverse(p, z)
            else:
                z = layer.inverse(p, z, rng=r)
        return z

    def reconstruct(self, params, x, rng=None, exact=False):
        """Forward then inverse (``flowsequential.py:116-137``)."""
        rngs = self._layer_rngs(rng, salt=2)
        for layer, p, r in zip(self.layers, params, rngs):
            if exact and layer.has_exact_path:
                x, _ = layer.exact_forward(p, x)
            else:
                x, _ = layer.forward(p, x, rng=r)
        for layer, p, r in zip(reversed(self.layers),
                               reversed(params), reversed(rngs)):
            if exact and layer.has_exact_path:
                x = layer.exact_inverse(p, x)
            else:
                x = layer.inverse(p, x, rng=r)
        return x

    # ------------------------------------------------------------------
    def data_init(self, params, x, rng=None):
        """One forward pass applying each layer's data-dependent init
        (functional replacement for ActNorm's first-batch init,
        ``actnorm.py:21-27``)."""
        rngs = self._layer_rngs(rng)
        new_params = []
        for layer, p, r in zip(self.layers, params, rngs):
            p = layer.data_init(p, x)
            new_params.append(p)
            x, _ = layer.forward(p, x, rng=r)
        return new_params

    def recon_loss(self, params, x, rng=None, sym=False, only_R=False):
        """Sum of layer-local reconstruction losses along the forward pass
        (``flowsequential.py:80-86`` add_recon_grad fan-out). Returns (B,).

        The reference adds these gradients via separate ``.backward()``
        calls (``selfnorm.py:216``); summing the losses into one scalar and
        differentiating once is mathematically identical.
        """
        rngs = self._layer_rngs(rng)
        total = jnp.zeros((x.shape[0],), jnp.float32)
        for layer, p, r in zip(self.layers, params, rngs):
            # Each layer's recon loss sees a *detached* input, exactly like
            # the reference's ``x = self.input.detach()`` (selfnorm.py:189):
            # gradients reach only that layer's own weights.
            x = jax.lax.stop_gradient(x)
            if layer.has_recon_loss:
                total = total + layer.recon_loss(p, x, sym=sym, only_R=only_R)
            x, _ = layer.forward(p, x, rng=r)
        return total

    # ------------------------------------------------------------------
    @property
    def has_carry(self):
        return any(l.has_carry for l in self.layers)

    def update_carry(self, params):
        """Refresh all layers' carried non-learnable state (e.g. ConvExp's
        power-iteration u) — the trainer calls this after each optimizer
        step, replacing the reference's mutating forward-pre-hooks
        (``spectral.py:208-244``)."""
        return [l.update_carry(p) if l.has_carry else p
                for l, p in zip(self.layers, params)]

    def carry_mask(self, params):
        """Per-leaf bools marking carried state; the trainer zeroes
        optimizer updates and skips weight clamps on these leaves."""
        return [l.carry_mask(p) for l, p in zip(self.layers, params)]

    # ------------------------------------------------------------------
    def plot_filters(self, params, save_dir, prefix="filters"):
        """Dump every conv-kernel-shaped parameter as a heatmap-grid PNG
        (``flowsequential.py:139-142`` fan-out to the SelfNorm wandb filter
        plots, ``selfnorm.py:248-278``). Returns the written paths."""
        import os

        import numpy as np

        from ..utils.imaging import filter_heatmap_grid, write_png

        os.makedirs(save_dir, exist_ok=True)
        written = []
        for i, (layer, p) in enumerate(zip(self.layers, params)):
            leaves = jax.tree_util.tree_leaves_with_path(p)
            for path, leaf in leaves:
                a = np.asarray(leaf)
                key = "".join(str(getattr(k, "key", getattr(k, "idx", "")))
                              for k in path)
                # RepeatedBlock stacks step params with a leading K dim
                # — a 5-D (K, O, I, kh, kw) leaf is K conv kernels, one
                # heatmap per scanned step (otherwise every kernel
                # inside a scanned block would be silently skipped)
                if a.ndim == 5 and a.shape[3] <= 16 and a.shape[4] <= 16:
                    kernels = [(f"{key}_k{j}", a[j]) for j in
                               range(a.shape[0])]
                elif a.ndim == 4 and a.shape[2] <= 16 and a.shape[3] <= 16:
                    kernels = [(key, a)]
                else:
                    continue            # not a small conv kernel
                for kkey, ka in kernels:
                    name = (f"{prefix}_{i:02d}_{type(layer).__name__}_"
                            f"{kkey}.png")
                    out = os.path.join(save_dir, name)
                    write_png(out, filter_heatmap_grid(ka))
                    written.append(out)
        return written

    # ------------------------------------------------------------------
    @property
    def preprocessing_layers(self):
        return [l for l in self.layers if l.is_preprocessing]

    @property
    def non_preprocessing_layers(self):
        return [l for l in self.layers if not l.is_preprocessing]

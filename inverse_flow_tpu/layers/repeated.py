"""Scan-over-depth: K identical flow steps as ONE traced step.

TPU-native optimization with no reference equivalent: the reference's
``FlowSequential`` python loop traces (and the CUDA path launches) every
layer separately; a Glow block is K repetitions of an identical step
(actnorm -> invertible conv -> activation -> coupling,
``if_glow_mnist.py:60-129``), so here the K steps become a single
``lax.scan`` over stacked parameters. Compile time and HLO size drop from
O(K) to O(1) per block; the math is unchanged.

Constraints: every sublayer must preserve the activation shape and be
rng-free (no dequantization / split-prior inside a block — true for all
reference block bodies).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .base import FlowLayer, zeros_ldj


@dataclass(frozen=True)
class RepeatedBlock(FlowLayer):
    step_layers: Tuple[FlowLayer, ...]
    n_repeats: int
    # rematerialize each step in the backward pass (jax.checkpoint):
    # activation memory drops from O(K) to O(1) per block at the cost of
    # one extra forward — the HBM lever for deep ImageNet-scale stacks.
    remat: bool = False
    # lax.scan unroll factor: replicate the step body N times per loop
    # iteration. Trades HLO size (and compile time) for fewer
    # dynamic-slice/dynamic-update-slice round-trips on the stacked
    # params — the profile shows those DUS+conv fusions as a top cost of
    # scan-over-depth at production scale. 1 = pure scan.
    scan_unroll: int = 1

    def init(self, rng, shape):
        per_repeat = []
        for k in range(self.n_repeats):
            step_params = []
            s = shape
            for layer in self.step_layers:
                rng, sub = jax.random.split(rng)
                p, s = layer.init(sub, s)
                step_params.append(p)
            assert tuple(s) == tuple(shape), (
                "RepeatedBlock sublayers must preserve shape "
                f"({shape} -> {s})")
            per_repeat.append(step_params)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *per_repeat)
        return {"steps": stacked}, shape

    # ------------------------------------------------------------------
    def _step_forward(self, step_params, x, exact=False, aux=None):
        ldj = zeros_ldj(x)
        auxes = aux if aux is not None else [None] * len(self.step_layers)
        for layer, p, a in zip(self.step_layers, step_params, auxes):
            if exact and layer.has_exact_path:
                x, l = layer.exact_forward(p, x)
            elif a is not None:
                x, l = layer.forward_prepared(p, a, x)
            else:
                x, l = layer.forward(p, x)
            ldj = ldj + l
        return x, ldj

    def _make_aux(self, params, shape):
        """Per-layer :meth:`FlowLayer.prepare` hoisted out of the depth
        scan: vmapped over the K stacked steps, so K operator builds run
        as a few batched matmuls instead of K sequential in-scan ones
        (and the scan body receives them as plain scanned inputs)."""
        auxes = []
        for j, layer in enumerate(self.step_layers):
            if layer.has_prepare:
                sp = params["steps"][j]
                auxes.append(jax.vmap(
                    lambda p, lyr=layer: lyr.prepare(p, shape))(sp))
            else:
                auxes.append(None)
        return auxes if any(a is not None for a in auxes) else None

    def _step_inverse(self, step_params, z, exact=False):
        for layer, p in zip(reversed(self.step_layers),
                            reversed(step_params)):
            if exact and layer.has_exact_path:
                z = layer.exact_inverse(p, z)
            else:
                z = layer.inverse(p, z)
        return z

    def forward(self, params, x, rng=None):
        aux = self._make_aux(params, x.shape[1:])

        def body(carry, xs):
            step_params, aux_k = xs
            x, ldj = carry
            x, l = self._step_forward(step_params, x, aux=aux_k)
            return (x, ldj + l), None

        if self.remat:
            body = jax.checkpoint(body)
        (x, ldj), _ = lax.scan(body, (x, zeros_ldj(x)),
                               (params["steps"], aux),
                               unroll=self.scan_unroll)
        return x, ldj

    def inverse(self, params, z, rng=None):
        def body(carry, step_params):
            return self._step_inverse(step_params, carry), None

        z, _ = lax.scan(body, z, params["steps"], reverse=True,
                        unroll=self.scan_unroll)
        return z

    def exact_forward(self, params, x):
        aux = self._make_aux(params, x.shape[1:])

        def body(carry, xs):
            step_params, aux_k = xs
            x, ldj = carry
            x, l = self._step_forward(step_params, x, exact=True,
                                      aux=aux_k)
            return (x, ldj + l), None

        (x, ldj), _ = lax.scan(body, (x, zeros_ldj(x)),
                               (params["steps"], aux),
                               unroll=self.scan_unroll)
        return x, ldj

    def exact_inverse(self, params, z):
        def body(carry, step_params):
            return self._step_inverse(step_params, carry, exact=True), None

        z, _ = lax.scan(body, z, params["steps"], reverse=True,
                        unroll=self.scan_unroll)
        return z

    # ------------------------------------------------------------------
    def data_init(self, params, x):
        """Sequential data-dependent init (ActNorm) across the K repeats."""
        if not any(type(l).data_init is not FlowLayer.data_init
                   for l in self.step_layers):
            return params
        stacked = params["steps"]
        for k in range(self.n_repeats):
            step_params = jax.tree_util.tree_map(lambda s: s[k], stacked)
            new_step = []
            for layer, p in zip(self.step_layers, step_params):
                p = layer.data_init(p, x)
                new_step.append(p)
                x, _ = layer.forward(p, x)
            stacked = jax.tree_util.tree_map(
                lambda s, n: s.at[k].set(n), stacked, new_step)
        return {"steps": stacked}

    def recon_loss(self, params, x, sym=False, only_R=False):
        if not any(l.has_recon_loss for l in self.step_layers):
            return jnp.zeros((x.shape[0],), jnp.float32)

        def body(carry, step_params):
            x, total = carry
            for layer, p in zip(self.step_layers, step_params):
                # per-LAYER detach, matching FlowSequential.recon_loss
                # (the reference's ``x = self.input.detach()``,
                # selfnorm.py:189): a step-boundary-only detach leaks
                # recon gradients into preceding sublayers (e.g.
                # ActNorm) within the step, diverging from the
                # unrolled build on the same params
                x = jax.lax.stop_gradient(x)
                if layer.has_recon_loss:
                    total = total + layer.recon_loss(p, x, sym=sym,
                                                     only_R=only_R)
                x, _ = layer.forward(p, x)
            return (x, total), None

        (_, total), _ = lax.scan(
            body, (x, jnp.zeros((x.shape[0],), jnp.float32)),
            params["steps"], unroll=self.scan_unroll)
        return total

    @property
    def has_recon_loss(self):
        return any(l.has_recon_loss for l in self.step_layers)

    @property
    def has_carry(self):
        return any(l.has_carry for l in self.step_layers)

    def update_carry(self, params):
        if not self.has_carry:
            return params
        new = []
        for j, layer in enumerate(self.step_layers):
            sp = params["steps"][j]
            new.append(jax.vmap(layer.update_carry)(sp)
                       if layer.has_carry else sp)
        return {"steps": new}

    def carry_mask(self, params):
        masks = []
        for j, layer in enumerate(self.step_layers):
            sp = params["steps"][j]
            # the mask of one step's slice transfers to the stacked params
            # (same tree structure; bool leaves are shape-agnostic)
            masks.append(layer.carry_mask(
                jax.tree_util.tree_map(lambda s: s[0], sp)))
        return {"steps": masks}

    def exact_ldj_correction(self, params, in_shape):
        """Sum of sublayer corrections over the K scanned repeats.

        vmapped over the stacked step params — K dense slogdets become one
        batched slogdet per sublayer kind.
        """
        corr = jnp.zeros((), jnp.float32)
        shape = tuple(in_shape)
        for j, layer in enumerate(self.step_layers):
            stacked = params["steps"][j]
            if layer.has_modified_grad:
                shp = shape
                per_step = jax.vmap(
                    lambda p: layer.exact_ldj_correction(p, shp))(stacked)
                corr = corr + jnp.sum(per_step)
            # track shape through the step with the k=0 params (sublayers
            # may reshape internally even though the step is shape-preserving)
            p0 = jax.tree_util.tree_map(lambda s: s[0], stacked)
            z = jax.eval_shape(
                lambda pp, shp=shape, lyr=layer: lyr.forward(
                    pp, jnp.zeros((1,) + shp, jnp.float32))[0], p0)
            shape = tuple(z.shape[1:])
        return corr

    @property
    def has_modified_grad(self):
        """True iff any sublayer has a modified-grad/exact path.

        Without this, ``Flow.forward(exact=True)`` (dispatch at
        ``sequential.py:61``) would skip this block's ``exact_forward``
        entirely — the reference's expensive path always recurses into
        every layer (``flowsequential.py:45``), so a scanned block must
        advertise its sublayers' flag.
        """
        return any(l.has_modified_grad for l in self.step_layers)

    @property
    def has_exact_path(self):
        """Aggregated like :meth:`has_modified_grad` — the block's own
        exact_forward/exact_inverse overrides are pure plumbing, so the
        gate must reflect the sublayers, not the override presence."""
        return any(l.has_exact_path for l in self.step_layers)

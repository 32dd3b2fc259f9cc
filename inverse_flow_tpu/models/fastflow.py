"""FastFlow: the multi-scale ImageNet model with Gaussianize splits.

Reference parity: ``inf/if_imagenet_multi_gpu.py:188-429`` — ``Preprocess``
(dequant/normalize/logit), ``GlowStep`` (actnorm? -> conv1x1 -> coupling),
``FastFlowStep`` (inv_flow_with_pad TL + GlowStep), ``FastFlowLevel``
(squeeze -> K steps -> split), and ``FastFlow`` (n_blocks-1 levels, final
squeeze + K steps, Gaussianize, standard-normal base). The reference keeps
an explicit multi-scale ``zs`` list; here each level's factored half is
folded into the running log-det by :class:`GaussianizeSplit` (identical
log-likelihood) and re-drawn from the base on sampling, so the whole model
stays one jittable ``Flow``.

The reference trains this under ``nn.DataParallel``
(``if_imagenet_multi_gpu.py:445-446,497-498``); the TPU equivalent is batch
sharding over an ICI mesh (see ``parallel/mesh.py``) — the model itself
needs no change.
"""

from __future__ import annotations

from ..distributions import GaussianPrior
from ..layers import (ActNorm, Conv1x1, Coupling, Flow, InvFlow,
                      RepeatedBlock, Squeeze)
from ..layers.gaussianize import GaussianizeSplit
from .glow import build_preprocess


def build_fastflow(data_size=(3, 32, 32), n_blocks=3, block_size=48,
                   actnorm=False, coupling_width=512, if_kernel_size=3,
                   scan_blocks=True):
    """The FastFlow stack (``if_imagenet_multi_gpu.py:328-360``):

    preprocess
    -> (n_blocks-1) x [squeeze; K x (inv_flow TL; {actnorm}; conv1x1;
                       coupling); gaussianize-split]
    -> squeeze; K x step
    -> N(0, I) base on the (C*2^(n_blocks+1), H/2^n, W/2^n) output.
    """
    layers = build_preprocess(data_size, alpha=1e-6)
    size = tuple(data_size)

    def make_step():
        step = [InvFlow(size[0], (if_kernel_size, if_kernel_size),
                        order="TL")]
        if actnorm:
            step.append(ActNorm(size[0]))
        step.append(Conv1x1(size[0]))
        step.append(Coupling(size, width=coupling_width))
        return step

    for level in range(n_blocks):
        layers.append(Squeeze())
        size = (size[0] * 4, size[1] // 2, size[2] // 2)
        if scan_blocks:
            layers.append(RepeatedBlock(tuple(make_step()), block_size))
        else:
            for _ in range(block_size):
                layers.extend(make_step())
        if level < n_blocks - 1:
            layers.append(GaussianizeSplit(size))
            size = (size[0] // 2, size[1], size[2])

    return Flow(GaussianPrior(size), layers)

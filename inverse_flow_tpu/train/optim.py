"""Optimizers and LR schedules on optax.

Reference parity: the optimizer/scheduler selections of the experiment
scripts (``inf/experiments/if_glow_mnist.py:220-238``: Adam / Adamax / SGD;
StepLR / MultiStepLR / ExponentialLR / CosineAnnealingLR /
CosineAnnealingWarmRestarts stepped per EPOCH) plus the per-batch linear
warmup (``inf/train/experiment.py:197-202``). Everything is folded into a
single ``lr(step)`` schedule so the whole update stays inside one jit.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import optax

from .config import ExperimentConfig


def make_lr_schedule(cfg: ExperimentConfig, steps_per_epoch: int):
    """lr(step) = base * warmup(step) * epoch_schedule(epoch(step))."""

    warmup_steps = max(1, cfg.warmup_epochs * steps_per_epoch)

    def epoch_factor(epoch):
        name = cfg.scheduler_name
        if name in (None, "None", "none"):
            return jnp.ones(())
        if name == "StepLR":
            return cfg.gamma ** (epoch // cfg.step_size)
        if name == "MultiStepLR":
            ms = jnp.asarray(cfg.milestones)
            return cfg.gamma ** jnp.sum(epoch >= ms)
        if name == "ExponentialLR":
            return cfg.gamma ** epoch
        if name == "CosineAnnealingLR":
            t = jnp.minimum(epoch, cfg.cosine_t_max)
            return 0.5 * (1 + jnp.cos(math.pi * t / cfg.cosine_t_max))
        if name == "CosineAnnealingWarmRestarts":
            t = jnp.mod(epoch, cfg.cosine_t0)
            frac = 0.5 * (1 + jnp.cos(math.pi * t / cfg.cosine_t0))
            return (cfg.cosine_eta_min / cfg.lr
                    + (1 - cfg.cosine_eta_min / cfg.lr) * frac)
        raise ValueError(f"unknown scheduler: {name}")

    def schedule(step):
        step = jnp.asarray(step)
        # Per-batch warmup over the first warmup_epochs
        # (experiment.py:197-202): s = (step+1)/warmup_steps, capped at 1.
        warm = jnp.minimum((step + 1.0) / warmup_steps, 1.0)
        epoch = step // steps_per_epoch
        return cfg.lr * warm * epoch_factor(epoch)

    return schedule


def make_optimizer(cfg: ExperimentConfig, steps_per_epoch: int):
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    name = cfg.optimizer_name
    if name == "Adam":
        tx = optax.adam(schedule, b1=0.9, b2=0.999)
    elif name == "Adamax":
        tx = optax.adamax(schedule, b1=0.9, b2=0.999)
    elif name == "SGD":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.sgd_weight_decay),
            optax.sgd(schedule, momentum=cfg.sgd_momentum),
        )
    else:
        raise ValueError(f"unknown optimizer: {name}")

    parts = []
    if cfg.grad_clip_norm is not None:
        # clip_grad_norm_ equivalent (experiment.py:287-289)
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    parts.append(tx)
    return optax.chain(*parts), schedule

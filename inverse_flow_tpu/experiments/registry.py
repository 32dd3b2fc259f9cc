"""Named experiments mirroring the reference's 22 experiment scripts.

Reference parity: every ``inf/experiments/*.py`` (plus the root-level
multi-GPU and timescaling scripts) becomes a registry entry carrying its
model builder, dataset, and ExperimentConfig; run them via
``python -m inverse_flow_tpu.cli --name <experiment>``
(the reference's ``inf --name <experiment>``, ``inf/cli.py:15-22``).
Config values are taken from each script's inline config dict (cited per
entry); the reference's ``grad_clip`` weight clamp is carried under its
honest name ``weight_clamp`` (see ``experiment.py:292-296``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from ..data import cifar10, digits, imagenet, mnist, patches, synthetic
from ..models.glow import build_cnn_flow, build_fc_flow, build_glow
from ..train.config import ExperimentConfig


@dataclass(frozen=True)
class ExperimentSpec:
    name: str
    build_model: Callable          # () -> Flow
    load_data: Callable            # (batch_size, **kw) -> 3 loaders
    config: ExperimentConfig


EXPERIMENTS = {}


def _register(spec: ExperimentSpec):
    EXPERIMENTS[spec.name] = spec
    return spec


def get_experiment(name: str) -> ExperimentSpec:
    if name not in EXPERIMENTS:
        raise KeyError(
            f"unknown experiment '{name}'; available: "
            + ", ".join(sorted(EXPERIMENTS)))
    return EXPERIMENTS[name]


MNIST = (1, 28, 28)
CIFAR = (3, 32, 32)
IMAGENET32 = (3, 32, 32)

# ---------------------------------------------------------------------------
# FC MNIST (exact_fc_mnist.py:57-80, selfnorm_fc_mnist.py)
# ---------------------------------------------------------------------------
_register(ExperimentSpec(
    "exact_fc_mnist",
    lambda: build_fc_flow(MNIST, num_layers=2, kind="inv_conv_no_pad",
                          activation="Spline", tail_bound=10.0),
    mnist.load_data,
    ExperimentConfig(name="2L IF FC Exact MNIST", lr=1e-4, batch_size=100,
                     modified_grad=False, add_recon_grad=False,
                     warmup_epochs=2, recon_loss_weight=0.0,
                     sample_true_inv=False, scheduler_name="None")))

_register(ExperimentSpec(
    "selfnorm_fc_mnist",
    lambda: build_fc_flow(MNIST, num_layers=2, kind="snf_fc",
                          activation="Spline", tail_bound=10.0),
    mnist.load_data,
    ExperimentConfig(name="2L SNF FC MNIST", lr=1e-4, batch_size=100,
                     modified_grad=True, add_recon_grad=True,
                     recon_loss_weight=1.0, scheduler_name="None")))

# ---------------------------------------------------------------------------
# CNN MNIST (if_cnn_mnist.py, exact/selfnorm/emerging/exponential variants)
# ---------------------------------------------------------------------------
_register(ExperimentSpec(
    "if_cnn_mnist",
    lambda: build_cnn_flow(MNIST, step_kind="inv_conv_no_pad", num_blocks=3,
                           block_size=16, activation="Spline", n_bins=10,
                           tail_bound=30.0, kernel=(2, 2)),
    mnist.load_data,
    ExperimentConfig(name="cnn_IF_Spline MNIST", lr=1e-5, batch_size=100,
                     epochs=100, modified_grad=True, add_recon_grad=False,
                     recon_loss_weight=0.0, weight_clamp=0.01,
                     warmup_epochs=2, scheduler_name="None")))

_register(ExperimentSpec(
    "if_exact_cnn_mnist",
    lambda: build_cnn_flow(MNIST, step_kind="inv_conv_no_pad", num_blocks=3,
                           block_size=3, activation="Spline", n_bins=10,
                           tail_bound=30.0, kernel=(2, 2)),
    mnist.load_data,
    ExperimentConfig(name="IF exact cnn MNIST", lr=1e-5, batch_size=100,
                     epochs=100, modified_grad=False, add_recon_grad=False,
                     weight_clamp=0.01, grad_clip_norm=1.0,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "exact_cnn_mnist",
    lambda: build_cnn_flow(MNIST, step_kind="inv_conv_no_pad", num_blocks=3,
                           block_size=3, activation="Spline", kernel=(3, 3)),
    mnist.load_data,
    ExperimentConfig(name="9L Exact CNN MNIST", lr=1e-4, batch_size=1000,
                     modified_grad=False, add_recon_grad=False,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "selfnorm_cnn_mnist",
    lambda: build_cnn_flow(MNIST, step_kind="snf_cnn", num_blocks=3,
                           block_size=3, activation="Spline"),
    mnist.load_data,
    ExperimentConfig(name="9L SNF CNN MNIST", lr=1e-3, batch_size=100,
                     modified_grad=True, add_recon_grad=True,
                     recon_loss_weight=1.0, scheduler_name="None")))

_register(ExperimentSpec(
    "emerging_cnn_mnist",
    lambda: build_cnn_flow(MNIST, step_kind="emerging", num_blocks=2,
                           block_size=4, activation="Spline", n_bins=10,
                           tail_bound=70.0),
    mnist.load_data,
    ExperimentConfig(name="9L Emerging Spline MNIST", lr=1e-3,
                     batch_size=100, modified_grad=False,
                     add_recon_grad=False, scheduler_name="None")))

_register(ExperimentSpec(
    "exponential_cnn_mnist",
    lambda: build_cnn_flow(MNIST, step_kind="convexp", num_blocks=3,
                           block_size=3, activation="Spline",
                           tail_bound=10.0),
    mnist.load_data,
    ExperimentConfig(name="9L Conv Exponential Spline MNIST", lr=1e-3,
                     batch_size=100, modified_grad=False,
                     add_recon_grad=False, scheduler_name="None")))

# ---------------------------------------------------------------------------
# Glow MNIST family (if_glow_mnist.py:150-196 and siblings)
# ---------------------------------------------------------------------------
_register(ExperimentSpec(
    "if_glow_mnist",
    lambda: build_glow(MNIST, step_kind="inv_conv_no_pad", num_blocks=2,
                       block_size=16, coupling_width=512, actnorm=True,
                       split_prior=True, activation="Spline", n_bins=5,
                       tail_bound=20.0),
    mnist.load_data,
    ExperimentConfig(name="2L-16K_IF_Glow_MNIST", lr=1e-5, batch_size=100,
                     epochs=2000, warmup_epochs=1, gamma=0.96170,
                     scheduler_name="ExponentialLR", grad_clip_norm=None,
                     weight_clamp=0.01, modified_grad=True,
                     add_recon_grad=True, sym_recon_grad=True,
                     recon_loss_weight=0.0, sample_true_inv=True,
                     eval_train=True)))

_register(ExperimentSpec(
    "selfnorm_glow_mnist",
    lambda: build_glow(MNIST, step_kind="snf", num_blocks=2, block_size=16,
                       coupling_width=512, actnorm=True, split_prior=True,
                       activation="None"),
    mnist.load_data,
    ExperimentConfig(name="2L-16K SNF Glow MNIST", lr=1e-3, batch_size=100,
                     modified_grad=True, add_recon_grad=True,
                     recon_loss_weight=100.0, weight_clamp=0.01,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "geco_selfnorm_glow_mnist",
    lambda: build_glow(MNIST, step_kind="snf", num_blocks=2, block_size=16,
                       coupling_width=512, actnorm=True, split_prior=True,
                       activation="None"),
    mnist.load_data,
    ExperimentConfig(name="GECO SNF Glow MNIST", lr=1e-3, batch_size=100,
                     modified_grad=True, add_recon_grad=True,
                     recon_loss_weight=1.0, recon_loss_lr=1e-3,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "conv1x1_glow_mnist",
    lambda: build_glow(MNIST, step_kind="conv1x1", num_blocks=2,
                       block_size=16, coupling_width=512, actnorm=True,
                       split_prior=True, activation="None"),
    mnist.load_data,
    ExperimentConfig(name="2L-16K Conv1x1 Glow MNIST", lr=1e-3,
                     batch_size=100, modified_grad=False,
                     add_recon_grad=False, weight_clamp=0.01,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "if_conv1x1_glow_mnist",
    lambda: build_glow(MNIST, step_kind="inv_conv", num_blocks=2,
                       block_size=16, coupling_width=512, actnorm=True,
                       split_prior=True, activation="Spline"),
    mnist.load_data,
    ExperimentConfig(name="IF+Conv1x1 Glow MNIST", lr=1e-5, batch_size=100,
                     modified_grad=True, add_recon_grad=False,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "ff_glow_mnist",
    lambda: build_glow(MNIST, step_kind="ff", num_blocks=2, block_size=16,
                       coupling_width=512, actnorm=True, split_prior=True,
                       activation="Spline"),
    mnist.load_data,
    ExperimentConfig(name="2L-16K FF Glow MNIST", lr=1e-5, batch_size=100,
                     modified_grad=True, add_recon_grad=True,
                     sym_recon_grad=True, recon_loss_weight=10.0,
                     weight_clamp=0.01, scheduler_name="None")))

# ---------------------------------------------------------------------------
# CIFAR-10 family (if_glow_cifar.py, selfnorm/conv1x1/ff variants)
# ---------------------------------------------------------------------------
_register(ExperimentSpec(
    "if_glow_cifar",
    lambda: build_glow(CIFAR, step_kind="inv_conv_no_pad", num_blocks=2,
                       block_size=16, coupling_width=128, actnorm=False,
                       split_prior=True, activation="Spline"),
    cifar10.load_data,
    ExperimentConfig(name="IF Glow CIFAR", lr=1e-4, batch_size=140,
                     gamma=0.1097170, modified_grad=False,
                     add_recon_grad=False, weight_clamp=0.01,
                     warmup_epochs=2, scheduler_name="None")))

_register(ExperimentSpec(
    "selfnorm_glow_cifar",
    lambda: build_glow(CIFAR, step_kind="snf", num_blocks=2, block_size=4,
                       coupling_width=512, actnorm=True, split_prior=True,
                       activation="None"),
    cifar10.load_data,
    ExperimentConfig(name="SNF Glow CIFAR", lr=1e-3, batch_size=100,
                     modified_grad=True, add_recon_grad=True,
                     sym_recon_grad=True, recon_loss_weight=1000.0,
                     weight_clamp=0.001, scheduler_name="None")))

_register(ExperimentSpec(
    "conv1x1_glow_cifar",
    lambda: build_glow(CIFAR, step_kind="conv1x1", num_blocks=2,
                       block_size=16, coupling_width=512, actnorm=True,
                       split_prior=True, activation="None"),
    cifar10.load_data,
    ExperimentConfig(name="Conv1x1 Glow CIFAR", lr=1e-3, batch_size=100,
                     modified_grad=False, add_recon_grad=False,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "ff_glow_cifar",
    lambda: build_glow(CIFAR, step_kind="ff", num_blocks=2, block_size=16,
                       coupling_width=512, actnorm=True, split_prior=True,
                       activation="Spline"),
    cifar10.load_data,
    ExperimentConfig(name="FF Glow CIFAR", lr=1e-5, batch_size=100,
                     modified_grad=True, add_recon_grad=True,
                     recon_loss_weight=10.0, scheduler_name="None")))

# ---------------------------------------------------------------------------
# ImageNet32 family (if_glow_imagenet32.py, selfnorm/conv1x1 variants,
# if_multiGPU_imagenet32.py -> data_parallel)
# ---------------------------------------------------------------------------
_register(ExperimentSpec(
    "if_glow_imagenet32",
    lambda: build_glow(IMAGENET32, step_kind="inv_conv_no_pad",
                       num_blocks=3, block_size=48, coupling_width=256,
                       actnorm=True, split_prior=True, activation="Spline"),
    lambda **kw: imagenet.load_data(size=32, **kw),
    ExperimentConfig(name="IF Glow ImageNet32", lr=1e-5, batch_size=100,
                     modified_grad=True, add_recon_grad=False,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "selfnorm_glow_imagenet",
    lambda: build_glow(IMAGENET32, step_kind="snf", num_blocks=3,
                       block_size=48, coupling_width=512, actnorm=True,
                       split_prior=True, activation="None"),
    lambda **kw: imagenet.load_data(size=32, **kw),
    ExperimentConfig(name="SNF Glow ImageNet32", lr=1e-3, batch_size=100,
                     modified_grad=True, add_recon_grad=True,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "conv1x1_glow_imagenet",
    lambda: build_glow(IMAGENET32, step_kind="conv1x1", num_blocks=3,
                       block_size=48, coupling_width=512, actnorm=True,
                       split_prior=True, activation="None"),
    lambda **kw: imagenet.load_data(size=32, **kw),
    ExperimentConfig(name="Conv1x1 Glow ImageNet32", lr=1e-3,
                     batch_size=100, modified_grad=False,
                     add_recon_grad=False, scheduler_name="None")))

_register(ExperimentSpec(
    "if_multiGPU_imagenet32",
    lambda: build_glow(IMAGENET32, step_kind="inv_conv_no_pad",
                       num_blocks=3, block_size=48, coupling_width=256,
                       actnorm=True, split_prior=True, activation="Spline"),
    lambda **kw: imagenet.load_data(size=32, **kw),
    ExperimentConfig(name="IF Glow ImageNet32 DP", lr=1e-5, batch_size=250,
                     modified_grad=True, add_recon_grad=False,
                     data_parallel=True, scheduler_name="None")))


def _build_fastflow_imagenet():
    from ..models.fastflow import build_fastflow
    return build_fastflow(IMAGENET32, n_blocks=3, block_size=48,
                          actnorm=False, coupling_width=512)


# The explicit multi-scale FastFlow model tree with Gaussianize splits
# (``inf/if_imagenet_multi_gpu.py:328-429,454-458``; DataParallel there,
# batch sharding over the ICI mesh here).
_register(ExperimentSpec(
    "if_imagenet_multi_gpu",
    _build_fastflow_imagenet,
    lambda **kw: imagenet.load_data(size=32, **kw),
    ExperimentConfig(name="FastFlow ImageNet32 DP", lr=1e-5, batch_size=100,
                     modified_grad=True, add_recon_grad=False,
                     data_parallel=True, scheduler_name="None")))

# ---------------------------------------------------------------------------
# Timescaling (if_timescaling.py:98-151, snf_timescaling.py:77-124):
# batch-time vs image size sweeps on synthetic data — see cli --timescale.
# ---------------------------------------------------------------------------
_register(ExperimentSpec(
    "if_timescaling",
    lambda: None,   # model built per size inside the sweep
    synthetic.load_data,
    ExperimentConfig(name="IF timescaling", lr=1e-5, batch_size=128,
                     modified_grad=True, add_recon_grad=False,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "if_jacobi_timescaling",
    lambda: None,
    synthetic.load_data,
    ExperimentConfig(name="IF jacobi timescaling", lr=1e-5, batch_size=128,
                     modified_grad=True, add_recon_grad=False,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "if_auto_timescaling",
    lambda: None,
    synthetic.load_data,
    ExperimentConfig(name="IF auto timescaling", lr=1e-5, batch_size=128,
                     modified_grad=True, add_recon_grad=False,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "snf_timescaling",
    lambda: None,
    synthetic.load_data,
    ExperimentConfig(name="SNF timescaling", lr=1e-3, batch_size=128,
                     modified_grad=True, add_recon_grad=False,
                     scheduler_name="None")))

# tall-image variants: the reference's LITERAL Fig. 4 convention,
# (1, H, 1) inputs with H up to 4160 (``if_timescaling.py:99``) —
# isolates the sequential wavefront axis
for _tname, _tlabel in (("if_tall_timescaling", "IF tall timescaling"),
                        ("if_jacobi_tall_timescaling",
                         "IF jacobi tall timescaling"),
                        # the axis where solver='auto' actually routes
                        # Jacobi — without this entry the CLI could only
                        # sweep auto on squares, where auto==exact
                        ("if_auto_tall_timescaling",
                         "IF auto tall timescaling")):
    _register(ExperimentSpec(
        _tname,
        lambda: None,
        synthetic.load_data,
        ExperimentConfig(name=_tlabel, lr=1e-5, batch_size=128,
                         modified_grad=True, add_recon_grad=False,
                         scheduler_name="None")))

# ---------------------------------------------------------------------------
# Real-data runs on the EMBEDDED real digits set (data/digits.py: 1,797
# real UCI handwritten digit scans checked into the package) — the only
# real image data available in the egress-free build container. These
# produce the in-repo real-data bits/dim trajectories
# (results/real_digits_bpd.jsonl); the MNIST/CIFAR entries above bind to
# the real datasets automatically when IDX/pickle files are present.
# ---------------------------------------------------------------------------
DIGITS = (1, 8, 8)

_register(ExperimentSpec(
    "real_digits_fc",
    lambda: build_fc_flow(DIGITS, num_layers=2, kind="inv_conv_no_pad",
                          activation="Spline", tail_bound=10.0),
    digits.load_data,
    ExperimentConfig(name="2L IF FC RealDigits", lr=1e-4, batch_size=100,
                     modified_grad=False, add_recon_grad=False,
                     warmup_epochs=2, recon_loss_weight=0.0,
                     scheduler_name="None")))

_register(ExperimentSpec(
    "real_digits_glow",
    lambda: build_glow(DIGITS, step_kind="inv_flow_unit", num_blocks=2,
                       block_size=4, coupling_width=64, actnorm=True,
                       split_prior=True, activation="SLR"),
    digits.load_data,
    ExperimentConfig(name="IF Glow RealDigits", lr=1e-3, batch_size=100,
                     epochs=30, warmup_epochs=2, modified_grad=True,
                     add_recon_grad=False, recon_loss_weight=0.0,
                     scheduler_name="None", eval_train=False)))

# Second embedded real set (data/patches.py: 2,080 real 16x16 RGB patches
# from scikit-learn's bundled photographs) — real pixels on the 3-channel
# CIFAR/ImageNet32 shape class; trajectory: results/real_patches_bpd.jsonl.
PATCHES = (3, 16, 16)

_register(ExperimentSpec(
    "real_patches_glow",
    lambda: build_glow(PATCHES, step_kind="inv_flow_unit", num_blocks=2,
                       block_size=4, coupling_width=64, actnorm=True,
                       split_prior=True, activation="SLR"),
    patches.load_data,
    ExperimentConfig(name="IF Glow RealPatches", lr=1e-3, batch_size=104,
                     epochs=30, warmup_epochs=2, modified_grad=True,
                     add_recon_grad=False, recon_loss_weight=0.0,
                     scheduler_name="None", eval_train=False)))

"""inverse_flow_tpu — a TPU-native normalizing-flow framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
girish-lab/Inverse-Flow (AISTATS 2025, arXiv:2410.14634): invertible
convolutions whose training-direction transform is the inverse of a masked
convolution, a Glow-style model zoo, and a training/eval/sampling harness —
re-designed TPU-first (MXU-dense triangular-solve kernels, pjit data
parallelism over an ICI mesh, functional transforms).
"""

__version__ = "0.1.0"

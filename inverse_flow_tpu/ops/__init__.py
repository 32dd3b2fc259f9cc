from .convs import (conv2d, conv2d_input_grad, conv2d_pad_lrtb,
                    conv2d_weight_grad)
from .inv_conv import (apply_mask, dense_operator, inv_conv_solve,
                       inv_conv_solve_jacobi, masked_conv_apply)
from .toeplitz import conv_exact_inverse, conv_logdet, dense_conv_operator

__all__ = [
    "conv2d", "conv2d_input_grad", "conv2d_pad_lrtb", "conv2d_weight_grad",
    "apply_mask", "dense_operator", "inv_conv_solve",
    "inv_conv_solve_jacobi", "masked_conv_apply",
    "conv_exact_inverse", "conv_logdet", "dense_conv_operator",
]

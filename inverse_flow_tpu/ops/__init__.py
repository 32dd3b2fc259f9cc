from .convs import conv2d, conv2d_pad_lrtb, conv2d_input_grad, conv2d_weight_grad

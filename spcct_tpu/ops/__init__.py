from .shape import (
    next_mult,
    pad_to_mult_3d,
    center_crop_3d,
    pad_to_mult_hw,
    crop_to_hw,
    resize_depth,
)
from .resize import trilinear_resize, bilinear_resize_2d
from .init import torch_conv_kernel_init, torch_bias_init, torch_linear_kernel_init

__all__ = [
    "next_mult", "pad_to_mult_3d", "center_crop_3d", "pad_to_mult_hw",
    "crop_to_hw", "resize_depth", "trilinear_resize", "bilinear_resize_2d",
    "torch_conv_kernel_init", "torch_bias_init", "torch_linear_kernel_init",
]

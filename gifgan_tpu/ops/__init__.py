from gifgan_tpu.ops.nn import (
    conv2d_init,
    conv2d,
    conv3d_init,
    conv3d,
    deconv2d_init,
    deconv2d,
    linear_init,
    linear,
    batch_norm_init,
    batch_norm,
    lrelu,
    add_noise,
    get_std,
)
from gifgan_tpu.ops.image import (
    transform,
    inverse_transform,
    merge_grid,
    center_crop,
)

__all__ = [
    "conv2d_init", "conv2d", "conv3d_init", "conv3d", "deconv2d_init",
    "deconv2d", "linear_init", "linear", "batch_norm_init", "batch_norm",
    "lrelu", "add_noise", "get_std", "transform", "inverse_transform",
    "merge_grid", "center_crop",
]

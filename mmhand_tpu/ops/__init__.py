"""Pure array ops: the contracts of the reference's data path, reimplemented
as JAX (with Pallas kernels for the hot raster ops) so rendering runs
on-device instead of in per-worker cv2/numpy loops."""

from mmhand_tpu.ops.heatmap import (
    gaussian_heatmap,
    gaussian_heatmaps,
    gaussian_heatmaps_pallas,
)
from mmhand_tpu.ops.depth import (
    decode_depth_gan,
    decode_depth_rhd_raw,
    depth_to_rgb_planes,
    keypoint_z_gan,
)
from mmhand_tpu.ops.image import (
    normalize_image,
    denormalize_image,
    bbox_from_uv,
    rescale_intrinsics,
    flip_uv_x,
)
from mmhand_tpu.ops.jointsmap import generate_jointsmap, HAND_BONES, BONE_COLORS
from mmhand_tpu.ops.ssim import ssim

__all__ = [
    "gaussian_heatmap",
    "gaussian_heatmaps",
    "gaussian_heatmaps_pallas",
    "decode_depth_gan",
    "decode_depth_rhd_raw",
    "depth_to_rgb_planes",
    "keypoint_z_gan",
    "normalize_image",
    "denormalize_image",
    "bbox_from_uv",
    "rescale_intrinsics",
    "flip_uv_x",
    "generate_jointsmap",
    "HAND_BONES",
    "BONE_COLORS",
    "ssim",
]

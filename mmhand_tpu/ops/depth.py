"""Depth-map decoding.

The RHD/STB crops store depth as an RGB PNG with depth packed into two
8-bit channels.  The reference has *two different decodes* — both are
reproduced here, with the quirk documented:

* GAN data path (reference data/generic_dataset.py:148-159): cv2 reads BGR,
  and the code computes ``256*img[:,:,1] + img[:,:,2]`` = 256*G + R, scales
  by 1/700, then normalizes to [-1, 1] and stacks to 3 channels.
* Legacy RHD path (reference data/rhd_dataset.py:115-127): ``256*R + G``
  normalized by 2^16-1 — matching the original RHD encoding
  (reference tool/create_RHD_DB.py:27-32, depth_two_uint8_to_float).

Inputs here are **RGB-ordered** uint8 arrays (PIL convention), so channel
indices are translated from the reference's BGR indexing.
"""

from __future__ import annotations

import jax.numpy as jnp

GAN_DEPTH_SCALE = 700.0  # reference generic_dataset.py:156
RHD_MAX_DEPTH = 2.0 ** 16 - 1.0  # reference create_RHD_DB.py:30


def decode_depth_gan(rgb):
    """GAN-path decode: 256*G + R, /700 (reference generic_dataset.py:151-159).

    Args:
      rgb: (..., H, W, 3) uint8/float RGB image array.
    Returns:
      (..., H, W) float32 depth in [0, ~93] (raw/700 scale).
    """
    rgb = jnp.asarray(rgb, jnp.float32)
    return (256.0 * rgb[..., 1] + rgb[..., 0]) / GAN_DEPTH_SCALE


def decode_depth_rhd_raw(rgb):
    """Original RHD decode: (256*R + G) / (2^16-1) in [0, 1]
    (reference data/rhd_dataset.py:118-126, tool/create_RHD_DB.py:27-32)."""
    rgb = jnp.asarray(rgb, jnp.float32)
    return (256.0 * rgb[..., 0] + rgb[..., 1]) / RHD_MAX_DEPTH


def depth_to_rgb_planes(depth):
    """Normalize decoded depth to [-1, 1] and replicate to 3 channels —
    'simulate rgb image' (reference generic_dataset.py:155-159).

    Args:
      depth: (..., H, W) decoded depth (already /700 or /(2^16-1) scaled).
    Returns:
      (..., H, W, 3) float32 in [-1, 1] (NHWC, vs the reference's CHW stack).
    """
    d = (jnp.asarray(depth, jnp.float32) - 0.5) / 0.5
    return jnp.stack([d, d, d], axis=-1)


def keypoint_z_gan(z):
    """Per-keypoint depth scaling for the xyz conditioning vector:
    z/700*255 (reference generic_dataset.py:162,166).

    The legacy RHD path instead used z/5*255 with a one-sided /5*225 typo at
    reference data/rhd_dataset.py:133,135 — deliberately NOT reproduced; the
    active GAN path is the generic one.
    """
    return jnp.asarray(z, jnp.float32) / GAN_DEPTH_SCALE * 255.0

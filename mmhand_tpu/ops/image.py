"""Image / keypoint / intrinsics transforms used across the pipeline.

Golden contracts (reference file:line in each docstring).  These are pure
functions, usable from numpy (host preprocessing) or jit'd JAX code alike.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BBOX_MARGIN = 20  # pixels (reference tool/create_RHD_DB.py:42-47)


def normalize_image(img):
    """[0, 255] -> [-1, 1] (reference data/generic_dataset.py:182-185)."""
    img = jnp.asarray(img, jnp.float32)
    return (img / 255.0 - 0.5) / 0.5


def denormalize_image(img):
    """[-1, 1] -> [0, 255] uint8 (reference util/util.py:15-24 tensor2im,
    reference aug.py:61-66)."""
    img = (jnp.asarray(img, jnp.float32) + 1.0) / 2.0 * 255.0
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


def bbox_from_uv(uv, shape_hw, margin: int = BBOX_MARGIN):
    """Keypoint-extent bbox, +-margin, clipped to the frame.

    Matches reference tool/create_RHD_DB.py:35-49 get_bbox, including the
    int() truncation of coordinates before the min/max.

    Args:
      uv: (K, 2) array of (x, y).
      shape_hw: (height, width) of the frame.
    Returns:
      (xmin, xmax, ymin, ymax) ints.
    """
    uv = np.asarray(uv)
    xs = uv[:, 0].astype(np.int64)
    ys = uv[:, 1].astype(np.int64)
    xmin = max(0, int(xs.min()) - margin)
    ymin = max(0, int(ys.min()) - margin)
    xmax = min(int(shape_hw[1]), int(xs.max()) + margin)
    ymax = min(int(shape_hw[0]), int(ys.max()) + margin)
    return xmin, xmax, ymin, ymax


def rescale_intrinsics(k, xmin, ymin, xmax, ymax, size: int):
    """Crop+resize the camera matrix: K' = S @ T @ K with T the crop shift
    and S the resize scale (reference tool/create_RHD_DB.py:248-264).

    Note the reference hardcodes 256. in the scale even when `size` differs;
    we use `size` (the only invocation uses size=256, so behavior is equal).
    """
    k = np.asarray(k, np.float64)
    shift = np.array([[1.0, 0.0, -xmin], [0.0, 1.0, -ymin], [0.0, 0.0, 1.0]])
    xscale = float(size) / (xmax - xmin + 1.0)
    yscale = float(size) / (ymax - ymin + 1.0)
    scale = np.diag([xscale, yscale, 1.0])
    return scale @ shift @ k


def rescale_uv(uv, xmin, ymin, xmax, ymax, size: int):
    """Map keypoints into the crop-resized frame
    (reference tool/create_RHD_DB.py:248-250)."""
    uv = np.asarray(uv, np.float64).copy()
    uv[:, 0] = (uv[:, 0] - xmin) / (xmax - xmin + 1.0) * size
    uv[:, 1] = (uv[:, 1] - ymin) / (ymax - ymin + 1.0) * size
    return uv


def flip_uv_x(uv, size: int):
    """Mirror x-coordinates for flipped (right-hand) crops:
    x' = x + 2*(size/2 - x) (reference tool/create_RHD_DB.py:292-294)."""
    uv = jnp.asarray(uv, jnp.float32)
    x = uv[..., 0] + 2.0 * (size / 2.0 - uv[..., 0])
    return jnp.stack([x, uv[..., 1]], axis=-1)

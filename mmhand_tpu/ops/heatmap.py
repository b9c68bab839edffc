"""Gaussian keypoint heatmaps.

Reference semantics (reference data/generic_dataset.py:208-217,238-242):

    map[i, j] = exp(-((j - x)^2 + (i - y)^2) / (2 sigma^2))
    map[map > 1] = 1          (no-op for a true Gaussian, kept anyway)
    map[map < 0.0099] = 0     (sparsity clip)

The reference renders 21 full-frame 256x256 numpy Gaussians per image per
pair inside DataLoader workers — its dominant CPU cost (SURVEY.md section 3.1).
Here rendering is a batched on-device op: one fused elementwise XLA program
(`gaussian_heatmaps`) or an explicit Pallas kernel
(`gaussian_heatmaps_pallas`) that splats each keypoint channel in VMEM.

Layout is NHWC: heatmaps come back as (..., H, W, K) so they concatenate
directly onto image channels for the TPU-preferred conv layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sparsity clip threshold (reference generic_dataset.py:215).
CLIP_LO = 0.0099


def gaussian_heatmap(x, y, height: int, width: int, sigma: float):
    """Single-channel heatmap, float32 (H, W).

    `x` indexes columns, `y` rows — identical to the reference formula for
    its (only-used) square 256x256 case.
    """
    rows = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    d2 = (cols - x) ** 2 + (rows - y) ** 2
    m = jnp.exp(-d2 / (2.0 * sigma * sigma))
    m = jnp.minimum(m, 1.0)
    return jnp.where(m < CLIP_LO, 0.0, m)


@functools.partial(jax.jit, static_argnames=("height", "width", "sigma"))
def gaussian_heatmaps(uv, height: int = 256, width: int = 256,
                      sigma: float = 6.0):
    """Batched heatmaps from keypoints.

    Args:
      uv: (..., K, 2) float array of (x, y) pixel coordinates.
    Returns:
      (..., H, W, K) float32 heatmaps (NHWC channel-minor).
    """
    uv = jnp.asarray(uv, jnp.float32)
    x = uv[..., 0]                      # (..., K)
    y = uv[..., 1]
    rows = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    # (..., H, W, K) via broadcasting: grid axes inserted before K.
    d2 = ((cols[..., None] - x[..., None, None, :]) ** 2
          + (rows[..., None] - y[..., None, None, :]) ** 2)
    m = jnp.exp(-d2 / (2.0 * sigma * sigma))
    m = jnp.minimum(m, 1.0)
    return jnp.where(m < CLIP_LO, 0.0, m)


# ----------------------------------------------------------------------------
# Pallas kernel: one grid step per (batch, keypoint), channel plane in VMEM.
# ----------------------------------------------------------------------------

def _heatmap_kernel(uv_ref, sig_ref, out_ref):
    """Splat one keypoint's Gaussian into a (1, H, W) VMEM block."""
    b = pl.program_id(0)
    k = pl.program_id(1)
    x = uv_ref[b, k, 0]
    y = uv_ref[b, k, 1]
    sigma = sig_ref[0]
    h, w = out_ref.shape[1], out_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    d2 = (cols - x) ** 2 + (rows - y) ** 2
    m = jnp.exp(-d2 / (2.0 * sigma * sigma))
    m = jnp.minimum(m, 1.0)
    out_ref[0, :, :] = jnp.where(m < CLIP_LO, 0.0, m)


@functools.partial(jax.jit, static_argnames=("height", "width", "sigma"))
def gaussian_heatmaps_pallas(uv, height: int = 256, width: int = 256,
                             sigma: float = 6.0):
    """Pallas TPU kernel version of `gaussian_heatmaps`.

    Args:
      uv: (B, K, 2) float32 keypoints.
    Returns:
      (B, H, W, K) float32 heatmaps.

    Grid is (B, K); each program writes one (H, W) channel plane held in
    VMEM (256x256 f32 = 256 KiB, well under the ~16 MiB budget).  Keypoint
    coordinates ride in SMEM as scalars.
    """
    b, k, _ = uv.shape
    sig = jnp.array([sigma], jnp.float32)
    out = pl.pallas_call(
        _heatmap_kernel,
        interpret=jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct((b * k, height, width), jnp.float32),
        grid=(b, k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, height, width),
            lambda i, j: (i * k + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(jnp.asarray(uv, jnp.float32), sig)
    # (B*K, H, W) -> (B, H, W, K)
    return out.reshape(b, k, height, width).transpose(0, 2, 3, 1)

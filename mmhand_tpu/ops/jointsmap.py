"""Depth-ordered bone-ellipse "jointsmap" rasterizer.

Reference (reference data/generic_dataset.py:30-78): for each of 20 hand
bones, cv2 rasterizes an ellipse around the bone segment (semi-axes
(length/2, 5), rotated to the segment angle), filled with the bone's average
keypoint depth; a running per-pixel min over bone depths decides occlusion
and the winning bone's color value is written (background 0).

TPU-native design: the ellipse-inside test is analytic per pixel (point in
rotated ellipse), vectorized over (H, W, 20) and fused by XLA — replacing
cv2.ellipse2Poly + fillConvexPoly.  A Pallas variant keeps the whole
composite in VMEM with a fori_loop over bones.

Divergence note: cv2 draws an integer polygon *approximation* of the
ellipse; the analytic test is the exact ellipse, so boundary pixels can
differ by <=1 px.  Ties in depth resolve to the later bone in both
implementations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (joint_a, joint_b), color value — order matters for depth-tie resolution
# (reference generic_dataset.py:33-54).
HAND_BONES = (
    (0, 17), (0, 1), (0, 5), (0, 9), (0, 13),
    (17, 18), (18, 19), (19, 20),
    (1, 2), (2, 3), (3, 4),
    (5, 6), (6, 7), (7, 8),
    (9, 10), (10, 11), (11, 12),
    (13, 14), (14, 15), (15, 16),
)
BONE_COLORS = (
    160, 170, 180, 190, 200,
    130, 140, 150,
    10, 20, 30,
    40, 50, 60,
    70, 80, 90,
    100, 110, 120,
)
BONE_RADIUS = 5.0  # reference generic_dataset.py:70
_BIG = 3.0e38  # python float: jnp scalars would be captured as pallas consts


def _bone_params(uv, depth):
    """Per-bone (mx, my, cos, sin, half_len, avg_depth) arrays, each (20,)."""
    uv = jnp.asarray(uv, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    a_idx = jnp.array([b[0] for b in HAND_BONES])
    b_idx = jnp.array([b[1] for b in HAND_BONES])
    p0 = uv[a_idx]          # (20, 2)
    p1 = uv[b_idx]
    mx = (p0[:, 0] + p1[:, 0]) / 2.0
    my = (p0[:, 1] + p1[:, 1]) / 2.0
    dx = p0[:, 0] - p1[:, 0]
    dy = p0[:, 1] - p1[:, 1]
    length = jnp.sqrt(dx * dx + dy * dy)
    # unit direction of the bone (the ellipse major axis); guard zero-length
    safe = jnp.maximum(length, 1e-6)
    cos = dx / safe
    sin = dy / safe
    half_len = jnp.maximum(length / 2.0, 1e-3)
    avg_d = (depth[a_idx] + depth[b_idx]) / 2.0
    return mx, my, cos, sin, half_len, avg_d


@functools.partial(jax.jit, static_argnames=("height", "width"))
def generate_jointsmap(uv, depth, height: int = 256, width: int = 256):
    """Rasterize the colored-bone jointsmap.

    Args:
      uv: (..., 21, 2) keypoint pixel coords.
      depth: (..., 21) per-keypoint depth.
    Returns:
      (..., H, W) float32 map of bone color values (0 = background),
      min-depth compositing across bones (reference generic_dataset.py:56-78).
    """
    if jnp.ndim(uv) > 2:
        fn = lambda u, d: generate_jointsmap(u, d, height, width)
        for _ in range(jnp.ndim(uv) - 2):
            fn = jax.vmap(fn)
        return fn(uv, depth)

    mx, my, cos, sin, half_len, avg_d = _bone_params(uv, depth)
    colors = jnp.array(BONE_COLORS, jnp.float32)

    rows = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    # (H, W, 20) rotated-ellipse inside test
    dx = cols[..., None] - mx
    dy = rows[..., None] - my
    u = dx * cos + dy * sin
    v = -dx * sin + dy * cos
    inside = (u / half_len) ** 2 + (v / BONE_RADIUS) ** 2 <= 1.0

    masked_depth = jnp.where(inside, avg_d, _BIG)
    dmin = jnp.min(masked_depth, axis=-1)
    # later bone wins depth ties (reference overwrites in bone order)
    bone_idx = jnp.arange(len(HAND_BONES))
    winner = jnp.argmax(
        jnp.where(masked_depth == dmin[..., None], bone_idx, -1), axis=-1)
    return jnp.where(dmin < _BIG, colors[winner], 0.0)


# ----------------------------------------------------------------------------
# Pallas kernel: whole composite in VMEM, fori_loop over bones.
# ----------------------------------------------------------------------------

def _jointsmap_kernel(params_ref, out_ref, best_ref):
    """params_ref: (B, 20, 7) SMEM scalars; writes one (H, W) plane."""
    b = pl.program_id(0)
    h, w = out_ref.shape[1], out_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    best_ref[:, :] = jnp.full((h, w), _BIG)
    out_ref[0, :, :] = jnp.zeros((h, w), jnp.float32)

    def body(i, _):
        mx = params_ref[b, i, 0]
        my = params_ref[b, i, 1]
        cos = params_ref[b, i, 2]
        sin = params_ref[b, i, 3]
        half_len = params_ref[b, i, 4]
        avg_d = params_ref[b, i, 5]
        color = params_ref[b, i, 6]
        dx = cols - mx
        dy = rows - my
        u = dx * cos + dy * sin
        v = -dx * sin + dy * cos
        inside = (u / half_len) ** 2 + (v / BONE_RADIUS) ** 2 <= 1.0
        win = inside & (avg_d <= best_ref[:, :])
        best_ref[:, :] = jnp.where(win, avg_d, best_ref[:, :])
        out_ref[0, :, :] = jnp.where(win, color, out_ref[0, :, :])
        return 0

    jax.lax.fori_loop(0, params_ref.shape[1], body, 0)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def generate_jointsmap_pallas(uv, depth, height: int = 256, width: int = 256):
    """Pallas version of `generate_jointsmap` for batched (B, 21, 2) input.

    Returns (B, H, W) float32.
    """
    uv = jnp.atleast_3d(jnp.asarray(uv, jnp.float32))
    depth = jnp.atleast_2d(jnp.asarray(depth, jnp.float32))
    bsz = uv.shape[0]

    def pack(u, d):
        mx, my, cos, sin, half_len, avg_d = _bone_params(u, d)
        colors = jnp.array(BONE_COLORS, jnp.float32)
        return jnp.stack([mx, my, cos, sin, half_len, avg_d, colors], axis=-1)

    params = jax.vmap(pack)(uv, depth)  # (B, 20, 7)

    return pl.pallas_call(
        _jointsmap_kernel,
        interpret=jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct((bsz, height, width), jnp.float32),
        grid=(bsz,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, height, width), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((height, width), jnp.float32)],
    )(params)

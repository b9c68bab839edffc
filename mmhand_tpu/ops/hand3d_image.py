"""Image-space helpers for the hand3d (ColorHandPose3D) stack.

TPU-native ports of the TF1 graph utilities in the reference
hand_pose_estimators/CVPR2020_hand3d/utils/general.py and
data/BinaryDbReader.py: everything here is batched, static-shape, and
jit-safe (no boolean_mask / per-sample Python loops — masked reductions and
lax.fori_loop instead), so the full detection→crop→pose pipeline compiles
into one XLA program.

Semantics notes (deliberate, documented):
* `resize_bilinear_tf1` reproduces TF1 `tf.image.resize_images` defaults
  (align_corners=False, half_pixel_centers=False: src = dst * in/out) —
  NOT the modern half-pixel convention of jax.image.resize.
* `crop_and_resize` reproduces `tf.image.crop_and_resize` sampling
  (box corners in normalized [0,1] coords over (size-1), align-corners
  interpolation inside the box, extrapolation value 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear_tf1(x, out_hw):
    """TF1-default bilinear resize of NHWC (align_corners=False,
    half_pixel_centers=False): src coordinate of output pixel i is
    i * (in/out), clamped; used to upsample hand3d scoremaps
    (reference nets/ColorHandPose3DNetwork.py:100,177,218)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x

    def axis_weights(in_size, out_size):
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size)
        i0 = jnp.floor(src).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, in_size - 1)
        i1 = jnp.clip(i0 + 1, 0, in_size - 1)
        frac = src - i0.astype(jnp.float32)
        return i0, i1, frac

    y0, y1, fy = axis_weights(h, oh)
    x0, x1, fx = axis_weights(w, ow)

    top = x[:, y0]          # (B, oh, W, C)
    bottom = x[:, y1]
    fy = fy[None, :, None, None].astype(x.dtype)
    rows = top * (1 - fy) + bottom * fy
    left = rows[:, :, x0]   # (B, oh, ow, C)
    right = rows[:, :, x1]
    fx = fx[None, None, :, None].astype(x.dtype)
    return left * (1 - fx) + right * fx


def crop_and_resize(image, boxes, crop_size: int):
    """tf.image.crop_and_resize for one box per image.

    Args:
      image: (B, H, W, C) float.
      boxes: (B, 4) normalized [y1, x1, y2, x2] over (H-1, W-1).
      crop_size: output side length.
    Returns:
      (B, crop_size, crop_size, C); samples outside the image read 0
      (TF extrapolation_value default).
    """
    b, h, w, c = image.shape
    y1, x1, y2, x2 = [boxes[:, i] for i in range(4)]

    def axis_coords(lo, hi, in_size):
        # align-corners inside the box: crop_size samples spanning
        # [lo, hi] * (in_size - 1)
        t = jnp.arange(crop_size, dtype=jnp.float32) / max(crop_size - 1, 1)
        return (lo[:, None] + (hi - lo)[:, None] * t[None, :]) * (in_size - 1)

    ys = axis_coords(y1, y2, h)          # (B, S)
    xs = axis_coords(x1, x2, w)

    def gather_axis1(img, idx, valid):
        # img (H, W, C), idx (S,) int, valid (S,) bool -> (S, W, C)
        out = img[jnp.clip(idx, 0, h - 1)]
        return out * valid[:, None, None]

    def one(img, ys_i, xs_i):
        y0 = jnp.floor(ys_i).astype(jnp.int32)
        x0 = jnp.floor(xs_i).astype(jnp.int32)
        fy = (ys_i - y0)[:, None, None]
        fx = (xs_i - x0)[None, :, None]

        def val(yi, xi):
            ok = ((yi >= 0) & (yi <= h - 1))[:, None, None] * \
                 ((xi >= 0) & (xi <= w - 1))[None, :, None]
            v = img[jnp.clip(yi, 0, h - 1)][:, jnp.clip(xi, 0, w - 1)]
            return v * ok

        v00 = val(y0, x0)
        v01 = val(y0, x0 + 1)
        v10 = val(y0 + 1, x0)
        v11 = val(y0 + 1, x0 + 1)
        top = v00 * (1 - fx) + v01 * fx
        bot = v10 * (1 - fx) + v11 * fx
        return top * (1 - fy) + bot * fy

    return jax.vmap(one)(image.astype(jnp.float32), ys, xs)


def crop_image_from_xy(image, crop_location, crop_size: int, scale):
    """Scaled central crop around (y, x) per sample
    (reference utils/general.py:163-197).

    crop_location: (B, 2) [y, x] pixel coords; scale: (B,) or scalar.
    """
    b, h, w, _ = image.shape
    scale = jnp.reshape(jnp.asarray(scale, jnp.float32), (-1,))
    scale = jnp.broadcast_to(scale, (b,))
    loc = jnp.reshape(crop_location.astype(jnp.float32), (b, 2))
    size_scaled = crop_size / scale
    y1 = loc[:, 0] - size_scaled // 2
    y2 = y1 + size_scaled
    x1 = loc[:, 1] - size_scaled // 2
    x2 = x1 + size_scaled
    boxes = jnp.stack([y1 / h, x1 / w, y2 / h, x2 / w], -1)
    return crop_and_resize(image, boxes, crop_size)


def find_max_location(scoremap):
    """(B, H, W) -> (B, 2) int [y, x] of the per-sample argmax
    (reference utils/general.py:199-230)."""
    b, h, w = scoremap.shape
    flat_idx = jnp.argmax(scoremap.reshape(b, -1), axis=1)
    return jnp.stack([flat_idx // w, flat_idx % w], -1).astype(jnp.int32)


def single_obj_scoremap(scoremap, filter_size: int = 21):
    """Keep only the connected foreground blob containing the per-sample
    maximum (reference utils/general.py:233-268).

    The reference grows a seed at the argmax by `num_passes` rounds of
    21x21 grayscale dilation ANDed with the rounded foreground map; its
    per-sample Python loop becomes a batched lax.fori_loop over
    reduce_window max — same fixpoint, one fused program.

    scoremap: (B, H, W, C) segmentation logits -> (B, H, W, 1) float mask.
    """
    b, h, w, _ = scoremap.shape
    softmax = jax.nn.softmax(scoremap, axis=-1)
    fg = jnp.max(softmax[:, :, :, 1:], axis=3)          # (B, H, W)
    det_fg = jnp.round(fg)

    max_loc = find_max_location(fg)                     # (B, 2)
    seed = jnp.zeros((b, h, w), jnp.float32)
    seed = seed.at[jnp.arange(b), max_loc[:, 0], max_loc[:, 1]].set(1.0)

    num_passes = max(h, w) // (filter_size // 2)

    def body(_, obj):
        dil = jax.lax.reduce_window(
            obj, -jnp.inf, jax.lax.max,
            (1, filter_size, filter_size), (1, 1, 1), "SAME")
        # reference dilation2d adds the (uniform 1/k^2) kernel inside the
        # max; with a constant kernel that is max(obj) + 1/k^2
        return jnp.round(det_fg * (dil + 1.0 / filter_size ** 2))

    obj = jax.lax.fori_loop(0, num_passes, body, seed)
    return obj[..., None]


def calc_center_bb(mask):
    """Bounding-box center / extent of a binary mask
    (reference utils/general.py:271-328).

    mask: (B, H, W) or (B, H, W, 1) -> (center (B,2) [y,x] float,
    bb (B,2,2), crop_size (B,1)); empty masks fall back to the reference's
    constants (center [160,160], size 100).
    """
    if mask.ndim == 4:
        mask = mask[..., 0]
    b, h, w = mask.shape
    on = mask > 0.5
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    big = jnp.float32(1e9)
    y_min = jnp.min(jnp.where(on, ys, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(on, ys, -big), axis=(1, 2))
    x_min = jnp.min(jnp.where(on, xs, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(on, xs, -big), axis=(1, 2))

    empty = ~jnp.any(on, axis=(1, 2))
    center = jnp.stack([0.5 * (y_max + y_min), 0.5 * (x_max + x_min)], -1)
    center = jnp.where(empty[:, None], jnp.float32(160.0), center)
    crop_size = jnp.maximum(y_max - y_min, x_max - x_min)[:, None]
    crop_size = jnp.where(empty[:, None], jnp.float32(100.0), crop_size)
    bb = jnp.stack([jnp.stack([y_min, x_min], -1),
                    jnp.stack([y_max, x_max], -1)], -1)
    return center, bb, crop_size


def detect_keypoints(scoremaps):
    """Argmax (y, x) per channel: (B, H, W, K) -> (B, K, 2) float
    (reference utils/general.py:331-345, vectorized)."""
    b, h, w, k = scoremaps.shape
    flat = scoremaps.reshape(b, h * w, k)
    idx = jnp.argmax(flat, axis=1)
    return jnp.stack([idx // w, idx % w], -1).astype(jnp.float32)


def gaussian_scoremap(coords_hw, out_hw, sigma: float, valid=None):
    """Per-keypoint gaussian maps, hand3d flavor
    (reference data/BinaryDbReader.py:413-459): coords are truncated to
    int first, map = exp(-d^2 / sigma^2) (NO factor 2), keypoints outside
    (0, size-1) exclusive or invisible are zeroed.

    coords_hw: (K, 2) [y, x]; returns (H, W, K).
    """
    h, w = out_hw
    coords = jnp.floor(coords_hw).astype(jnp.int32).astype(jnp.float32)
    if valid is None:
        cond_val = jnp.ones((coords.shape[0],), bool)
    else:
        cond_val = jnp.asarray(valid).astype(jnp.float32) > 0.5
    in_1 = (coords[:, 0] < h - 1) & (coords[:, 0] > 0)
    in_2 = (coords[:, 1] < w - 1) & (coords[:, 1] > 0)
    cond = cond_val & in_1 & in_2

    ys = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    dist = (ys - coords[None, None, :, 0]) ** 2 + \
           (xs - coords[None, None, :, 1]) ** 2
    return jnp.exp(-dist / sigma ** 2) * cond[None, None, :].astype(
        jnp.float32)

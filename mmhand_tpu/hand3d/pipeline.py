"""hand3d training-sample derivation (BinaryDbReader port).

Reimplements the field derivations of the reference TF queue reader
(reference hand_pose_estimators/CVPR2020_hand3d/data/BinaryDbReader.py:
130-380) as one pure, batched, jit-safe function: raw record arrays in,
training dict out.  The reference runs this per-sample inside TF queue
runners; here the whole batch derives on device in one fused program
(vmap over records), so the binary reader thread only does IO.

Derived fields (names match the reference data_dict):
  image (mean-subtracted), hand_side (one-hot 2), keypoint_vis21,
  keypoint_uv21, keypoint_xyz21, keypoint_scale, keypoint_xyz21_normed,
  keypoint_xyz21_local, keypoint_xyz21_can, rot_mat, scoremap,
  hand_mask (2ch), and with hand_crop: image_crop, crop_scale, cam_mat.

Quirks kept: palm coord = mean(wrist, kp12) when use_wrist_coord=False
(:141-144); scale = |kp12-kp11| of the root-relative coords (:238-242);
rot_mat stored INVERTED (:250-253); scoremap gaussian exp(-d^2/sigma^2)
(no factor 2) over int-truncated coords (:413-459); crop size clamped to
[50, 500] px then scale to [1, 10] (:295-308).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mmhand_tpu.ops import hand3d_image as h3img
from mmhand_tpu.ops.hand_trafo import (
    bone_rel_trafo,
    canonical_trafo,
    flip_right_hand,
)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Mirror of the BinaryDbReader flags (reference :32-92)."""

    image_size: tuple = (256, 256)
    crop_size: int = 256
    sigma: float = 25.0
    use_wrist_coord: bool = True
    hand_crop: bool = False
    coord_uv_noise: bool = False
    coord_uv_noise_sigma: float = 2.5
    crop_center_noise: bool = False
    crop_center_noise_sigma: float = 20.0
    crop_scale_noise: bool = False
    crop_offset_noise: bool = False
    crop_offset_noise_sigma: float = 10.0
    scoremap_dropout: bool = False
    scoremap_dropout_prob: float = 0.8


def _trunc_normal(key, shape, stddev):
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape)


def derive_record(record, cfg: PipelineConfig, rng):
    """One record -> training dict.

    record: dict with keypoint_xyz (42,3) f32, keypoint_uv (42,2) f32,
    cam_mat (3,3), image (H,W,3) uint8, hand_parts (H,W) int32,
    keypoint_vis (42,) bool.
    """
    k_uv, k_center, k_scale, k_offset, k_drop = jax.random.split(rng, 5)
    h, w = cfg.image_size

    keypoint_xyz = record["keypoint_xyz"].astype(jnp.float32)
    keypoint_uv = record["keypoint_uv"].astype(jnp.float32)
    keypoint_vis = record["keypoint_vis"].astype(bool)
    hand_parts = record["hand_parts"].astype(jnp.int32)
    cam_mat = record["cam_mat"].astype(jnp.float32)

    # palm coord replaces the wrist (reference :141-157)
    if not cfg.use_wrist_coord:
        def palmify(arr):
            palm_l = 0.5 * (arr[0] + arr[12])
            palm_r = 0.5 * (arr[21] + arr[33])
            return jnp.concatenate(
                [palm_l[None], arr[1:21], palm_r[None], arr[-20:]], 0)
        keypoint_xyz = palmify(keypoint_xyz)
        keypoint_uv = palmify(keypoint_uv)
        palm_vis_l = keypoint_vis[0] | keypoint_vis[12]
        palm_vis_r = keypoint_vis[21] | keypoint_vis[33]
        keypoint_vis = jnp.concatenate(
            [palm_vis_l[None], keypoint_vis[1:21],
             palm_vis_r[None], keypoint_vis[-20:]], 0)

    if cfg.coord_uv_noise:
        keypoint_uv = keypoint_uv + _trunc_normal(
            k_uv, (42, 2), cfg.coord_uv_noise_sigma)

    image = record["image"].astype(jnp.float32) / 255.0 - 0.5
    hand_mask_fg = hand_parts > 1
    hand_mask = jnp.stack([~hand_mask_fg, hand_mask_fg], 2).astype(jnp.int32)

    # dominant hand from the parts mask (reference :215-233)
    cond_l = (hand_parts > 1) & (hand_parts < 18)
    cond_r = hand_parts > 17
    num_l = jnp.sum(cond_l.astype(jnp.int32))
    num_r = jnp.sum(cond_r.astype(jnp.int32))
    left = num_l > num_r
    hand_side = jax.nn.one_hot(jnp.where(left, 0, 1), 2)

    kp_xyz21 = jnp.where(left, keypoint_xyz[:21], keypoint_xyz[-21:])
    kp_vis21 = jnp.where(left, keypoint_vis[:21], keypoint_vis[-21:])
    kp_uv21 = jnp.where(left, keypoint_uv[:21], keypoint_uv[-21:])

    kp_rel = kp_xyz21 - kp_xyz21[0]
    scale = jnp.sqrt(jnp.sum((kp_rel[12] - kp_rel[11]) ** 2))
    kp_normed = kp_rel / scale
    kp_local = bone_rel_trafo(kp_normed)[0]
    kp_can, rot = canonical_trafo(kp_normed)
    kp_can = flip_right_hand(kp_can[0], jnp.tile(~left, (21, 3)))
    rot_mat = jnp.linalg.inv(rot[0])

    out = {
        "image": image,
        "hand_mask": hand_mask,
        "hand_side": hand_side,
        "keypoint_xyz21": kp_xyz21,
        "keypoint_vis21": kp_vis21,
        "keypoint_scale": scale[None],
        "keypoint_xyz21_normed": kp_normed,
        "keypoint_xyz21_local": kp_local,
        "keypoint_xyz21_can": kp_can,
        "rot_mat": rot_mat,
    }

    if cfg.hand_crop:
        crop_center = kp_uv21[12, ::-1]
        crop_center = jnp.where(jnp.all(jnp.isfinite(crop_center)),
                                crop_center, jnp.zeros(2))
        if cfg.crop_center_noise:
            crop_center = crop_center + _trunc_normal(
                k_center, (2,), cfg.crop_center_noise_sigma)
        scale_noise = jnp.float32(1.0)
        if cfg.crop_scale_noise:
            scale_noise = jax.random.uniform(
                k_scale, (), minval=1.0, maxval=1.2)

        # visible-keypoint extent (static-shape analog of boolean_mask)
        kp_hw = jnp.stack([kp_uv21[:, 1], kp_uv21[:, 0]], 1)
        big = jnp.float32(1e9)
        visf = kp_vis21[:, None]
        min_coord = jnp.maximum(
            jnp.min(jnp.where(visf, kp_hw, big), 0), 0.0)
        max_coord = jnp.minimum(
            jnp.max(jnp.where(visf, kp_hw, -big), 0),
            jnp.asarray([h, w], jnp.float32))
        crop_size_best = 2 * jnp.maximum(max_coord - crop_center,
                                         crop_center - min_coord)
        crop_size_best = jnp.clip(jnp.max(crop_size_best), 50.0, 500.0)
        crop_size_best = jnp.where(
            jnp.all(kp_vis21 == 0) | ~jnp.isfinite(crop_size_best),
            jnp.float32(200.0), crop_size_best)
        crop_scale = jnp.clip(cfg.crop_size / crop_size_best, 1.0, 10.0)
        crop_scale = crop_scale * scale_noise
        if cfg.crop_offset_noise:
            crop_center = crop_center + _trunc_normal(
                k_offset, (2,), cfg.crop_offset_noise_sigma)

        img_crop = h3img.crop_image_from_xy(
            image[None], crop_center[None], cfg.crop_size, crop_scale)[0]
        u = (kp_uv21[:, 0] - crop_center[1]) * crop_scale + \
            cfg.crop_size // 2
        v = (kp_uv21[:, 1] - crop_center[0]) * crop_scale + \
            cfg.crop_size // 2
        kp_uv21 = jnp.stack([u, v], 1)

        # cam matrix update (reference :327-346)
        s = crop_scale
        scale_matrix = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]) * \
            jnp.array([s, s, 1.0])[:, None]
        trans1 = crop_center[0] * s - cfg.crop_size // 2
        trans2 = crop_center[1] * s - cfg.crop_size // 2
        trans_matrix = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        trans_matrix = trans_matrix.at[0, 2].set(-trans2).at[1, 2].set(
            -trans1)
        out["cam_mat"] = trans_matrix @ (scale_matrix @ cam_mat)
        out["image_crop"] = img_crop
        out["crop_scale"] = crop_scale[None]

    out["keypoint_uv21"] = kp_uv21

    # scoremaps from the 21 uv coords (reference :348-377)
    kp_hw21 = jnp.stack([kp_uv21[:, 1], kp_uv21[:, 0]], -1)
    size = (cfg.crop_size, cfg.crop_size) if cfg.hand_crop else (h, w)
    scoremap = h3img.gaussian_scoremap(kp_hw21, size, cfg.sigma, kp_vis21)
    if cfg.scoremap_dropout:
        keep = jax.random.bernoulli(
            k_drop, cfg.scoremap_dropout_prob, (1, 1, 21))
        # TF dropout scales kept values by 1/keep_prob and the reference
        # multiplies keep_prob right back (:370-372) — net effect: the
        # channel mask alone
        scoremap = scoremap * keep
    out["scoremap"] = scoremap
    return out


def derive_batch(records, cfg: PipelineConfig, rng):
    """vmapped derive_record over stacked record arrays."""
    b = records["image"].shape[0]
    keys = jax.random.split(rng, b)
    return jax.vmap(lambda r, k: derive_record(r, cfg, k))(records, keys)

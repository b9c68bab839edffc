"""ColorHandPose3D (hand3d) network stack, flax port.

Reimplements the reference TF1 graphs
(reference hand_pose_estimators/CVPR2020_hand3d/nets/ColorHandPose3DNetwork.py
and nets/PosePriorNetwork.py) as flax modules with the SAME layer names as
the TF variable scopes, so pickled TF weight dicts
('HandSegNet/conv1_1/weights' ...) map 1:1 onto the param tree
(tools/convert_hand3d_weights.py).

Networks:
* HandSegNet  — VGG-ish encoder + 1x1 head -> 2-class hand segmentation
  (reference ColorHandPose3DNetwork.py:183-220).
* PoseNet2D   — CPM-style 2D keypoint net: initial scoremap + 2 recurrent
  refinement passes over cat(scoremap, encoding) (reference :225-274).
* PosePrior   — canonical 3D coords from pooled scoremaps + hand side
  (reference :311-334); optional 30-d bottleneck variant
  (reference PosePriorNetwork.py:97-122).
* ViewpointNet — axis-angle viewpoint -> rotation matrix via Rodrigues
  (reference :339-399).
* ColorHandPose3D — full pipeline: detection -> single-object mask ->
  crop -> 2D keypoints -> lifted normalized 3D (reference :64-102).
* PosePriorNetwork — the lifting-study variants direct / bottleneck /
  local / local_w_xyz_loss / proposed (reference PosePriorNetwork.py:59-95).

All TF ops used by the graph (leaky-relu slope 0.01, SAME convs with
bias-0.0001 init, VALID 2x2 max-pool, TF1 bilinear resize, crop_and_resize)
are reproduced exactly; the batched/jit-safe image helpers live in
mmhand_tpu/ops/hand3d_image.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmhand_tpu.ops import hand3d_image as h3img
from mmhand_tpu.ops.hand_trafo import flip_right_hand

Dtype = Any

# TF xavier_initializer_conv2d == uniform(-a, a), a = sqrt(6/(fan_in+fan_out))
_kernel_init = nn.initializers.xavier_uniform()
# reference NetworkOps.conv biases: constant 0.0001 (utils/general.py:49-50)
def _bias_init(key, shape, dtype=jnp.float32):
    return jnp.full(shape, 1e-4, dtype)


def leaky_relu(x):
    """tf.maximum(x, 0.01*x) (reference utils/general.py:28-33)."""
    return jnp.maximum(x, 0.01 * x)


class TFConv(nn.Module):
    """SAME conv with the reference's init; params named kernel/bias to
    match 'weights'/'biases' via the converter."""

    features: int
    kernel: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            kernel_init=_kernel_init, bias_init=_bias_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


def _max_pool(x):
    """2x2/2 VALID max pool (reference utils/general.py:61-65)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


class HandSegNet(nn.Module):
    """Hand segmentation net (reference ColorHandPose3DNetwork.py:183-220).

    Input: (B, H, W, 3) mean-subtracted image; output: (B, H, W, 2)
    background/hand scores upsampled to input size (TF1 bilinear).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image):
        x = image.astype(self.dtype)
        layers_per_block = [2, 2, 4, 4]
        out_chan_list = [64, 128, 256, 512]
        pool_list = [True, True, True, False]
        for block_id, (n, ch, pool) in enumerate(
                zip(layers_per_block, out_chan_list, pool_list), 1):
            for layer_id in range(n):
                x = leaky_relu(TFConv(
                    ch, 3, dtype=self.dtype,
                    name=f"conv{block_id}_{layer_id + 1}")(x))
            if pool:
                x = _max_pool(x)
        x = leaky_relu(TFConv(512, 3, dtype=self.dtype, name="conv5_1")(x))
        encoding = leaky_relu(
            TFConv(128, 3, dtype=self.dtype, name="conv5_2")(x))
        x = leaky_relu(TFConv(512, 1, dtype=self.dtype, name="conv6_1")(
            encoding))
        scoremap = TFConv(2, 1, dtype=self.dtype, name="conv6_2")(x)
        s = image.shape
        return h3img.resize_bilinear_tf1(
            scoremap.astype(jnp.float32), (s[1], s[2]))


class PoseNet2D(nn.Module):
    """2D keypoint scoremap net (reference ColorHandPose3DNetwork.py:225-274).

    Input: (B, 256, 256, 3) crop; returns list of 3 scoremaps at 1/8
    resolution (initial + 2 recurrent refinements), NOT upsampled — the
    callers resize as needed (training resizes to GT size, inference to
    crop size).
    """

    num_kp: int = 21
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_crop):
        x = image_crop.astype(self.dtype)
        layers_per_block = [2, 2, 4, 2]
        out_chan_list = [64, 128, 256, 512]
        pool_list = [True, True, True, False]
        for block_id, (n, ch, pool) in enumerate(
                zip(layers_per_block, out_chan_list, pool_list), 1):
            for layer_id in range(n):
                x = leaky_relu(TFConv(
                    ch, 3, dtype=self.dtype,
                    name=f"conv{block_id}_{layer_id + 1}")(x))
            if pool:
                x = _max_pool(x)
        for i in range(3, 7):
            x = leaky_relu(TFConv(256, 3, dtype=self.dtype,
                                  name=f"conv4_{i}")(x))
        encoding = leaky_relu(
            TFConv(128, 3, dtype=self.dtype, name="conv4_7")(x))

        x = leaky_relu(TFConv(512, 1, dtype=self.dtype, name="conv5_1")(
            encoding))
        scoremap = TFConv(self.num_kp, 1, dtype=self.dtype,
                          name="conv5_2")(x)
        scoremap_list = [scoremap]

        # recurrent refinement (reference :261-270)
        for pass_id in range(2):
            x = jnp.concatenate(
                [scoremap_list[-1].astype(self.dtype), encoding], 3)
            for rec_id in range(5):
                x = leaky_relu(TFConv(
                    128, 7, dtype=self.dtype,
                    name=f"conv{pass_id + 6}_{rec_id + 1}")(x))
            x = leaky_relu(TFConv(128, 1, dtype=self.dtype,
                                  name=f"conv{pass_id + 6}_6")(x))
            scoremap_list.append(
                TFConv(self.num_kp, 1, dtype=self.dtype,
                       name=f"conv{pass_id + 6}_7")(x))
        return [s.astype(jnp.float32) for s in scoremap_list]


class PosePrior(nn.Module):
    """Canonical-coordinate lifting net
    (reference ColorHandPose3DNetwork.py:311-334; bottleneck variant
    reference PosePriorNetwork.py:97-122)."""

    num_kp: int = 21
    bottleneck: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, scoremap, hand_side, train: bool = False):
        x = scoremap.astype(self.dtype)
        b = x.shape[0]
        for i, ch in enumerate([32, 64, 128]):
            x = leaky_relu(TFConv(ch, 3, dtype=self.dtype,
                                  name=f"conv_pose_{i}_1")(x))
            x = leaky_relu(TFConv(ch, 3, stride=2, dtype=self.dtype,
                                  name=f"conv_pose_{i}_2")(x))
        x = x.reshape(b, -1)
        x = jnp.concatenate([x, hand_side.astype(self.dtype)], 1)
        for i in [0, 1]:
            x = leaky_relu(nn.Dense(
                512, kernel_init=_kernel_init, bias_init=_bias_init,
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"fc_rel{i}")(x))
            # TF ops.dropout keep_prob 0.8, off at evaluation
            x = nn.Dropout(0.2, deterministic=not train)(x)
        if self.bottleneck:
            x = nn.Dense(30, kernel_init=_kernel_init, bias_init=_bias_init,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="fc_bottleneck")(x)
        coord = nn.Dense(self.num_kp * 3, kernel_init=_kernel_init,
                         bias_init=_bias_init, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc_xyz")(x)
        return coord.reshape(b, self.num_kp, 3).astype(jnp.float32)


def rot_mat_from_axis_angle(ux, uy, uz):
    """Rodrigues rotation matrix from the (encoded) axis-angle vector
    (reference ColorHandPose3DNetwork.py:376-399): theta = |u| with the
    1e-8 under the sqrt; rows assembled row-first."""
    u_norm = jnp.sqrt(ux ** 2 + uy ** 2 + uz ** 2 + 1e-8)[:, 0]
    theta = u_norm
    st, ct = jnp.sin(theta), jnp.cos(theta)
    one_ct = 1.0 - ct
    ux, uy, uz = ux[:, 0] / u_norm, uy[:, 0] / u_norm, uz[:, 0] / u_norm
    rows = [ct + ux * ux * one_ct, ux * uy * one_ct - uz * st,
            ux * uz * one_ct + uy * st,
            uy * ux * one_ct + uz * st, ct + uy * uy * one_ct,
            uy * uz * one_ct - ux * st,
            uz * ux * one_ct - uy * st, uz * uy * one_ct + ux * st,
            ct + uz * uz * one_ct]
    return jnp.stack(rows, -1).reshape(-1, 3, 3)


class ViewpointNet(nn.Module):
    """Viewpoint (rotation) estimation
    (reference ColorHandPose3DNetwork.py:339-374)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, scoremap, hand_side, train: bool = False):
        x = scoremap.astype(self.dtype)
        b = x.shape[0]
        for i, ch in enumerate([64, 128, 256]):
            x = leaky_relu(TFConv(ch, 3, dtype=self.dtype,
                                  name=f"conv_vp_{i}_1")(x))
            x = leaky_relu(TFConv(ch, 3, stride=2, dtype=self.dtype,
                                  name=f"conv_vp_{i}_2")(x))
        x = x.reshape(b, -1)
        x = jnp.concatenate([x, hand_side.astype(self.dtype)], 1)
        for i, ch in enumerate([256, 128]):
            x = leaky_relu(nn.Dense(
                ch, kernel_init=_kernel_init, bias_init=_bias_init,
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"fc_vp{i}")(x))
            # TF ops.dropout keep_prob 0.75
            x = nn.Dropout(0.25, deterministic=not train)(x)

        def head(name):
            return nn.Dense(1, kernel_init=_kernel_init,
                            bias_init=_bias_init, dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)(x) \
                .astype(jnp.float32)

        ux = head("fc_vp_ux")
        uy = head("fc_vp_uy")
        uz = head("fc_vp_uz")
        return rot_mat_from_axis_angle(ux, uy, uz)


class ColorHandPose3D(nn.Module):
    """Full pipeline: HandSegNet + PoseNet + PosePrior + Viewpoint
    (reference ColorHandPose3DNetwork.py:64-102).

    `__call__(image, hand_side, train)` returns the same 6-tuple as the
    reference `inference`: (hand_scoremap, image_crop, scale_crop, center,
    keypoints_scoremap_upsampled, keypoint_coord3d).
    """

    crop_size: int = 256
    num_kp: int = 21
    dtype: Dtype = jnp.float32

    def setup(self):
        self.segnet = HandSegNet(dtype=self.dtype, name="HandSegNet")
        self.posenet = PoseNet2D(num_kp=self.num_kp, dtype=self.dtype,
                                 name="PoseNet2D")
        self.poseprior = PosePrior(num_kp=self.num_kp, dtype=self.dtype,
                                   name="PosePrior")
        self.viewpoint = ViewpointNet(dtype=self.dtype, name="ViewpointNet")

    def __call__(self, image, hand_side, train: bool = False,
                 crop_externally: bool = False):
        hand_scoremap = self.segnet(image)

        # intermediate processing (reference :84-89)
        hand_mask = h3img.single_obj_scoremap(hand_scoremap)
        center, _, crop_size_best = h3img.calc_center_bb(hand_mask)
        crop_size_best = crop_size_best * 1.25
        scale_crop = jnp.clip(
            self.crop_size / crop_size_best, 0.25, 5.0)
        if crop_externally:
            # inference_crop variant (reference :107-144): the input is
            # already a tight crop
            image_crop = image
        else:
            image_crop = h3img.crop_image_from_xy(
                image, center, self.crop_size, scale_crop[:, 0])

        keypoints_scoremap = self.posenet(image_crop)[-1]
        coord3d = self.pose3d(keypoints_scoremap, hand_side, train)

        s = image_crop.shape
        keypoints_scoremap = h3img.resize_bilinear_tf1(
            keypoints_scoremap, (s[1], s[2]))
        return (hand_scoremap, image_crop, scale_crop, center,
                keypoints_scoremap, coord3d)

    def pose3d(self, keypoints_scoremap, hand_side, train: bool = False):
        """PosePrior + Viewpoint + side flip (reference :279-305)."""
        coord_can = self.poseprior(keypoints_scoremap, hand_side, train)
        rot_mat = self.viewpoint(keypoints_scoremap, hand_side, train)
        # reference tiles cond to (B, 21, 3) for tf.where (:298-300); our
        # flip_right_hand broadcasts a per-batch cond to the same effect
        cond_right = jnp.argmax(hand_side, 1) == 1
        coord_flip = flip_right_hand(coord_can, cond_right)
        return jnp.matmul(coord_flip, rot_mat)

    def detection(self, image):
        """HandSegNet alone (reference inference_detection)."""
        return self.segnet(image)

    def pose2d(self, image_crop):
        """PoseNet alone; list of 3 scoremaps at 1/8 res."""
        return self.posenet(image_crop)


class PosePriorNetwork(nn.Module):
    """Lifting-study variants (reference PosePriorNetwork.py:30-95).

    __call__(scoremap, hand_side, train) -> (coord_xyz_rel_normed,
    coord3d, R); scoremap is the full-res (B, 256, 256, 21) GT scoremap,
    avg-pooled 8x8 on entry (reference :61).
    """

    variant: str = "proposed"
    num_kp: int = 21
    dtype: Dtype = jnp.float32

    def setup(self):
        self.poseprior = PosePrior(
            num_kp=self.num_kp, bottleneck=(self.variant == "bottleneck"),
            dtype=self.dtype, name="PosePrior")
        if self.variant == "proposed":
            self.viewpoint = ViewpointNet(dtype=self.dtype,
                                          name="ViewpointNet")

    def __call__(self, scoremap, hand_side, train: bool = False):
        pooled = nn.avg_pool(scoremap, (8, 8), strides=(8, 8),
                             padding="SAME")
        if self.variant in ("direct", "bottleneck"):
            coord3d = self.poseprior(pooled, hand_side, train)
            return coord3d, coord3d, None
        if self.variant in ("local", "local_w_xyz_loss"):
            from mmhand_tpu.ops.hand_trafo import bone_rel_trafo_inv
            coord_rel_loc = self.poseprior(pooled, hand_side, train)
            coord_normed = bone_rel_trafo_inv(coord_rel_loc)
            return coord_normed, coord_rel_loc, None
        if self.variant == "proposed":
            coord_can = self.poseprior(pooled, hand_side, train)
            rot_mat = self.viewpoint(pooled, hand_side, train)
            # NOTE: unlike the full pipeline, the study variant does NOT
            # flip by hand side (commented out in the reference :85-88)
            return jnp.matmul(coord_can, rot_mat), coord_can, rot_mat
        raise ValueError(f"Unknown variant [{self.variant}]")

"""hand3d trainer: staged-LR Adam training of the three subnets.

Ports the reference training scripts
(reference hand_pose_estimators/CVPR2020_hand3d/training_handsegnet.py,
training_posenet.py, training_lifting.py) as one system with three jitted
train steps:

* handsegnet — softmax cross-entropy of the upsampled 2-class scoremap vs
  the hand mask (training_handsegnet.py:59-64); lr [1e-5,1e-6,1e-7] at
  steps [20000, 30000].
* posenet — per-scoremap loss sum(vis * sqrt(mean_sq_err over HW)) /
  (sum(vis)+0.001) over all 3 stage outputs resized to GT size
  (training_posenet.py:61-66); lr [1e-4,1e-5,1e-6] at [10000, 20000].
* lifting (PosePriorNetwork) — variant-dependent MSE
  (training_lifting.py:64-78): local -> vs xyz21_local;
  local_w_xyz_loss / direct / bottleneck -> vs xyz21_normed;
  proposed -> vs xyz21_can plus MSE(R, rot_mat); lr [1e-5,1e-6] at [60000].

The staged LR (reference utils/general.py LearningRateScheduler) is a
piecewise-constant schedule evaluated from the traced step counter, so one
compiled step covers all stages.  TPU-native: optax.adam, bf16-able nets,
single fused forward+backward per step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mmhand_tpu.models.hand3d import (
    ColorHandPose3D,
    HandSegNet,
    PoseNet2D,
    PosePriorNetwork,
)
from mmhand_tpu.ops.hand3d_image import resize_bilinear_tf1

# reference training_*.py train_para dicts
TRAIN_PARA_HANDSEGNET = {
    "lr": [1e-5, 1e-6, 1e-7], "lr_iter": [20000, 30000],
    "max_iter": 40000, "show_loss_freq": 1000, "snapshot_freq": 5000}
TRAIN_PARA_POSENET = {
    "lr": [1e-4, 1e-5, 1e-6], "lr_iter": [10000, 20000],
    "max_iter": 30000, "show_loss_freq": 1000, "snapshot_freq": 5000}
TRAIN_PARA_LIFTING = {
    "lr": [1e-5, 1e-6], "lr_iter": [60000],
    "max_iter": 80000, "show_loss_freq": 1000, "snapshot_freq": 5000}


def staged_lr(values, steps, global_step):
    """Piecewise-constant LR (reference utils/general.py
    LearningRateScheduler): values[i] applies until global_step reaches
    steps[i]."""
    lr = jnp.float32(values[0])
    for v, s in zip(values[1:], steps):
        lr = jnp.where(global_step >= s, jnp.float32(v), lr)
    return lr


class SubnetTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt: Any
    rng: Any


@dataclasses.dataclass(frozen=True)
class Hand3DSystem:
    """Builds the nets and the three jitted subnet train steps."""

    net: str = "posenet"  # handsegnet | posenet | lifting
    variant: str = "proposed"  # lifting only
    crop_size: int = 256
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None  # data-parallel mesh axis (shard_map)

    def __post_init__(self):
        if self.net == "handsegnet":
            module = HandSegNet(dtype=self.dtype)
            para = TRAIN_PARA_HANDSEGNET
        elif self.net == "posenet":
            module = PoseNet2D(dtype=self.dtype)
            para = TRAIN_PARA_POSENET
        elif self.net == "lifting":
            module = PosePriorNetwork(variant=self.variant,
                                      dtype=self.dtype)
            para = TRAIN_PARA_LIFTING
        else:
            raise ValueError(f"unknown hand3d net [{self.net}]")
        object.__setattr__(self, "module", module)
        object.__setattr__(self, "train_para", para)
        object.__setattr__(self, "tx", optax.chain(
            optax.scale_by_adam(), optax.scale(-1.0)))

    def init_state(self, rng, image_size=(256, 256)) -> SubnetTrainState:
        k_init, k_run = jax.random.split(rng)
        h, w = image_size
        if self.net == "handsegnet":
            dummy = (jnp.zeros((1, h, w, 3)),)
        elif self.net == "posenet":
            dummy = (jnp.zeros((1, self.crop_size, self.crop_size, 3)),)
        else:
            dummy = (jnp.zeros((1, self.crop_size, self.crop_size, 21)),
                     jnp.zeros((1, 2)))
        params = self.module.init(
            {"params": k_init, "dropout": k_init}, *dummy)["params"]
        return SubnetTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt=self.tx.init(params), rng=k_run)

    # ------------------------------------------------------------ losses
    def loss_fn(self, params, batch, rng):
        """Per-subnet loss on a derived-pipeline batch dict."""
        if self.net == "handsegnet":
            pred = self.module.apply({"params": params}, batch["image"])
            gt = batch["hand_mask"].astype(jnp.float32)
            logp = jax.nn.log_softmax(pred)
            return jnp.mean(-jnp.sum(gt * logp, axis=-1))

        if self.net == "posenet":
            maps = self.module.apply({"params": params}, batch["image"])
            gt = batch["scoremap"]
            s = gt.shape
            vis = batch["keypoint_vis21"].astype(jnp.float32) \
                .reshape(s[0], s[3])
            loss = 0.0
            for pred in maps:
                pred = resize_bilinear_tf1(pred, (s[1], s[2]))
                per_kp = jnp.sqrt(jnp.mean(
                    jnp.square(pred - gt), axis=(1, 2)))
                loss += jnp.sum(vis * per_kp) / (jnp.sum(vis) + 0.001)
            return loss

        # lifting
        coord_normed, coord3d, rot = self.module.apply(
            {"params": params}, batch["scoremap"], batch["hand_side"],
            train=True, rngs={"dropout": rng})
        v = self.variant
        if v == "local":
            return jnp.mean(jnp.square(
                coord3d - batch["keypoint_xyz21_local"]))
        if v in ("local_w_xyz_loss", "direct", "bottleneck"):
            return jnp.mean(jnp.square(
                coord_normed - batch["keypoint_xyz21_normed"]))
        # proposed
        loss = jnp.mean(jnp.square(coord3d - batch["keypoint_xyz21_can"]))
        loss += jnp.mean(jnp.square(rot - batch["rot_mat"]))
        return loss

    def make_train_step(self):
        values = self.train_para["lr"]
        steps = self.train_para["lr_iter"]
        axis = self.axis_name

        def train_step(state: SubnetTrainState, batch):
            rng = state.rng
            if axis:
                # decorrelate dropout across replicas (same pattern as the
                # GAN step); grads are pmean'd so updates stay identical
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            rng, next_rng = jax.random.split(rng)
            if axis:
                # keep the replicated rng state identical on every replica
                next_rng = jax.random.split(state.rng)[1]
            lr = staged_lr(values, steps, state.step)
            loss, grads = jax.value_and_grad(self.loss_fn)(
                state.params, batch, rng)
            if axis:
                loss = jax.lax.pmean(loss, axis)
                grads = jax.lax.pmean(grads, axis)
            updates, opt = self.tx.update(grads, state.opt, state.params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt=opt, rng=next_rng), loss

        return train_step


def make_sharded_hand3d_train_step(system: Hand3DSystem, mesh):
    """Data-parallel hand3d subnet step: batch sharded over the mesh's
    data axis, params replicated, grads pmean'd — the TPU equivalent of
    multi-GPU training the reference hand3d scripts never had (they are
    single-GPU TF1 loops; parity plus).  `system.axis_name` must match
    the mesh axis."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = system.axis_name
    assert axis is not None, "system must be built with axis_name for DP"
    core = system.make_train_step()
    sharded = shard_map(
        core, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))

"""Downstream hand-pose-estimator trainer (the augmentation study).

Port of the reference hpm trainer
(reference hand_pose_estimators/CVPR2020_hpm3d/models/hpm_model.py:25-199):

* two networks — Hpm2d (image -> 6-stage heatmaps), Hpm3d (GT heatmaps ->
  21 z values) — with two separate Adam optimizers;
* loss_mse = sum over the 6 stage outputs of MSE vs the sigma-5 GT
  heatmaps, masked by instance_weight, x1000 (reference Criterion :168-173);
* loss_lz = SmoothL1 on z, instance-weight masked (:108-115).

instance_weight masks samples whose image was replaced by random noise in
the method="None" ablation (reference data/RHD_dataset.py:142-152).  Torch
indexes `x[iw==1]` (dynamic shape); here the same mean is computed with
static-shape weighting: sum(iw * per_sample) / max(1, sum(iw)).

TPU-native: one jitted step, both backward passes fused; optax.adam
replaces apex FusedAdam (hpm_model.py:61).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mmhand_tpu.models.cpm import Hpm2d, Hpm3d

STAGE_LOSS_SCALE = 1000.0  # reference hpm_model.py:173


class HPETrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params2d: Any
    params3d: Any
    opt2d: Any
    opt3d: Any


def smooth_l1(pred, target):
    """torch SmoothL1Loss (beta=1): 0.5 x^2 if |x|<1 else |x|-0.5."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def _masked_mean(per_sample, weight):
    """Mean over samples with weight 1 (static-shape `x[iw==1]` analog)."""
    w = weight.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


@dataclasses.dataclass(frozen=True)
class HPESystem:
    """`variant` selects the reference's `--model` trainer
    (reference models/__init__.py:55-67 importlib factory):

    * ``hpm``   — the joint 2d+3d trainer (hpm_model.py:25-135; default,
      the only one the reference's own scripts use, train-hpm.sh:9);
    * ``hpm2d`` — Hpm2d alone with the staged Criterion (hpm2d_model.py:
      25-112).  NOTE the reference variant is broken as shipped: it calls
      Criterion(output, heatmaps) but Criterion.forward requires a third
      instance_weight arg (hpm_model.py:168-173) — TypeError on the first
      backward.  We implement the policy the flag promises (staged
      masked MSE x1000) instead of reproducing the crash;
    * ``hpm3d`` — Hpm3d alone with SmoothL1 x10 (hpm3d_model.py:98-107;
      the x10 is the reference's own quirk — its comment says "amply this
      loss by 100", the code multiplies by 10; code wins, preserved).
    """

    num_joints: int = 21
    lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    axis_name: Optional[str] = None
    dtype: Any = jnp.bfloat16
    variant: str = "hpm"

    def __post_init__(self):
        if self.variant not in ("hpm", "hpm2d", "hpm3d"):
            raise ValueError(f"unknown HPE model variant [{self.variant}]")
        object.__setattr__(self, "hpm2d",
                           Hpm2d(self.num_joints, dtype=self.dtype))
        object.__setattr__(self, "hpm3d",
                           Hpm3d(self.num_joints, dtype=self.dtype))
        # lr applied as a traced scalar in the step (per-epoch schedule
        # without re-jit — same pattern as the GAN step); reference uses
        # apex FusedAdam + torch schedulers
        # (hand_pose_estimators/CVPR2020_hpm3d/models/networks/__init__.py:
        # 19-182, base_model.py:165-244)
        object.__setattr__(self, "tx", optax.chain(
            optax.scale_by_adam(b1=self.beta1, b2=self.beta2, eps=1e-8),
            optax.scale(-1.0)))

    def init_state(self, rng, size: int = 256) -> HPETrainState:
        """Eager flax init routed via the host CPU on accelerator backends
        (axon tunnel: per-op dispatch is a network RTT — see
        MMHandSystem.init_state)."""
        try:
            if jax.default_backend() != "cpu":
                cpu = jax.devices("cpu")[0]
                with jax.default_device(cpu):
                    state = self._init_state_impl(rng, size)
                return jax.device_put(state, jax.devices()[0])
        except RuntimeError:
            pass
        return self._init_state_impl(rng, size)

    def _init_state_impl(self, rng, size: int = 256) -> HPETrainState:
        k2, k3 = jax.random.split(rng)
        p2d = p3d = o2d = o3d = None
        if self.variant in ("hpm", "hpm2d"):
            p2d = self.hpm2d.init(k2, jnp.zeros((1, size, size, 3)))["params"]
            o2d = self.tx.init(p2d)
        if self.variant in ("hpm", "hpm3d"):
            p3d = self.hpm3d.init(
                k3, jnp.zeros((1, size, size, self.num_joints)))["params"]
            o3d = self.tx.init(p3d)
        return HPETrainState(
            step=jnp.zeros((), jnp.int32),
            params2d=p2d, params3d=p3d, opt2d=o2d, opt3d=o3d)


def make_hpe_train_step(system: HPESystem):
    """step(state, batch, lr) -> (state, metrics).

    batch: {image (B,S,S,3) in [-1,1], heatmaps (B,S,S,21) sigma-5 GT,
            z (B,21) depth/0.7, weight (B,) 0/1}; lr is a traced scalar.
    """
    axis = system.axis_name

    def psync(tree):
        return jax.lax.pmean(tree, axis) if axis else tree

    variant = system.variant
    # hpm3d single-net quirk: SmoothL1 x10 (reference hpm3d_model.py:105);
    # the joint trainer applies it unscaled (hpm_model.py:108-115)
    lz_scale = 10.0 if variant == "hpm3d" else 1.0

    def train_step(state: HPETrainState, batch, lr):
        image, heat = batch["image"], batch["heatmaps"]
        z, w = batch["z"], batch["weight"]

        def loss2d_fn(params):
            stages = system.hpm2d.apply({"params": params}, image)
            loss = 0.0
            for s in stages:
                per = jnp.mean((s - heat) ** 2, axis=(1, 2, 3))
                loss = loss + _masked_mean(per, w)
            return loss * STAGE_LOSS_SCALE

        def loss3d_fn(params):
            # 3d net trains on GT heatmaps (reference hpm_model.py:97)
            z_pred = system.hpm3d.apply({"params": params}, heat)
            per = jnp.mean(smooth_l1(z_pred, z), axis=-1)
            return _masked_mean(per, w) * lz_scale

        updates = {"step": state.step + 1}
        metrics = {}
        if variant in ("hpm", "hpm2d"):
            loss_mse, g2d = jax.value_and_grad(loss2d_fn)(state.params2d)
            up2d, opt2d = system.tx.update(
                psync(g2d), state.opt2d, state.params2d)
            up2d = jax.tree.map(lambda u: u * lr, up2d)
            updates.update(
                params2d=optax.apply_updates(state.params2d, up2d),
                opt2d=opt2d)
            metrics["mse"] = loss_mse
        if variant in ("hpm", "hpm3d"):
            loss_lz, g3d = jax.value_and_grad(loss3d_fn)(state.params3d)
            up3d, opt3d = system.tx.update(
                psync(g3d), state.opt3d, state.params3d)
            up3d = jax.tree.map(lambda u: u * lr, up3d)
            updates.update(
                params3d=optax.apply_updates(state.params3d, up3d),
                opt3d=opt3d)
            metrics["lz"] = loss_lz
        return state.replace(**updates), psync(metrics)

    return train_step


def make_sharded_hpe_train_step(system: HPESystem, mesh):
    """Data-parallel HPE step: batch sharded over the mesh's data axis,
    params/optimizer replicated, grads pmean'd inside (the APEX-DDP
    equivalent for the HPE trainer — reference
    hand_pose_estimators/CVPR2020_hpm3d/models/networks/__init__.py:100-139
    `_networks_DDP`).  `system.axis_name` must match the mesh axis."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = system.axis_name
    assert axis is not None, "system must be built with axis_name for DP"
    core = make_hpe_train_step(system)
    sharded = shard_map(
        core, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))

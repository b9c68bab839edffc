#!/usr/bin/env python
"""hand3d evaluation: 2D PoseNet EPE/AUC and 3D lifting EPE/AUC.

Ports the reference eval scripts:
* --mode 2d  — PoseNet on GT-cropped frames, argmax keypoint decode,
  EvalUtil over 0-30 px / 20 steps
  (reference hand_pose_estimators/CVPR2020_hand3d/eval2d_gt_cropped.py:38-93).
* --mode 3d  — PosePriorNetwork variant on GT scoremaps, prediction
  rescaled by keypoint_scale, GT root-centered, EvalUtil over 0-0.050 m /
  20 steps (reference eval3d.py:60-105).
* --mode full — the composed ColorHandPose3D pipeline on full frames
  (reference eval_full.py role): segmentation->crop->2D->3D, scored like 3d.

Reads the packed binary GAN DB (or synthetic records); restores params
saved by scripts/train_hand3d.py.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mmhand_tpu.data.hand3d_binary import Hand3dBinaryDataset  # noqa: E402
from mmhand_tpu.eval.metrics import EvalUtil  # noqa: E402
from mmhand_tpu.hand3d import (  # noqa: E402
    Hand3DSystem,
    PipelineConfig,
    derive_batch,
)
from mmhand_tpu.models.hand3d import ColorHandPose3D  # noqa: E402
from mmhand_tpu.ops.hand3d_image import (  # noqa: E402
    detect_keypoints,
    resize_bilinear_tf1,
)
from mmhand_tpu.utils.checkpoint import CheckpointManager  # noqa: E402
from scripts.train_hand3d import (  # noqa: E402
    records_to_pipeline_batch,
    synthetic_records,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["2d", "3d", "full"], default="2d")
    p.add_argument("--variant", default="proposed")
    p.add_argument("--bin", default=None)
    p.add_argument("--name", default="hand3d")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--max_samples", type=int, default=None)
    args = p.parse_args(argv)

    size = (args.image_size, args.image_size)
    if args.bin:
        ds = Hand3dBinaryDataset(args.bin, args.image_size, args.image_size)
        records = [ds[i] for i in range(len(ds))]
    else:
        records = synthetic_records(max(args.batch_size, 8),
                                    args.image_size)
    if args.max_samples:
        records = records[:args.max_samples]

    # evaluation reader flags (reference eval3d.py:48, eval2d_gt_cropped:37)
    cfg = PipelineConfig(image_size=size, crop_size=args.crop_size,
                         use_wrist_coord=False,
                         hand_crop=(args.mode != "full"))

    util = EvalUtil(num_kp=21)
    b = args.batch_size

    if args.mode == "2d":
        system = Hand3DSystem(net="posenet", crop_size=args.crop_size)
        state = system.init_state(jax.random.PRNGKey(0), size)
        ckpt = CheckpointManager(args.checkpoints_dir,
                                 f"{args.name}_posenet")
        if ckpt.has("latest"):
            state = ckpt.restore(state, "latest")

        @jax.jit
        def predict(params, batch):
            maps = system.module.apply({"params": params},
                                       batch["image_crop"])[-1]
            s = batch["image_crop"].shape
            maps = resize_bilinear_tf1(maps, (s[1], s[2]))
            return detect_keypoints(maps)  # (B, 21, 2) [y, x]

        derive = jax.jit(lambda raw: derive_batch(
            raw, cfg, jax.random.PRNGKey(0)))
        for i in range(0, len(records), b):
            chunk = records[i:i + b]
            batch = derive(records_to_pipeline_batch(chunk))
            coords_hw = np.asarray(predict(state.params, batch))
            uv_pred = coords_hw[:, :, ::-1]
            uv_gt = np.asarray(batch["keypoint_uv21"])
            vis = np.asarray(batch["keypoint_vis21"])
            crop_scale = np.asarray(batch["crop_scale"])[:, 0]
            for j in range(len(chunk)):
                s = crop_scale[j]
                util.feed(uv_gt[j] / s, vis[j], uv_pred[j] / s)
        mean, median, auc, _, _ = util.get_measures(0.0, 30.0, 20)
        unit = "pixels"
    else:
        if args.mode == "3d":
            system = Hand3DSystem(net="lifting", variant=args.variant,
                                  crop_size=args.crop_size)
            state = system.init_state(jax.random.PRNGKey(0), size)
            ckpt = CheckpointManager(args.checkpoints_dir,
                                     f"{args.name}_lifting")
            if ckpt.has("latest"):
                state = ckpt.restore(state, "latest")

            @jax.jit
            def predict(params, batch):
                normed, _, _ = system.module.apply(
                    {"params": params}, batch["scoremap"],
                    batch["hand_side"])
                return normed
            params = state.params
        else:  # full pipeline
            net = ColorHandPose3D()
            params = net.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, args.image_size, args.image_size, 3)),
                jnp.zeros((1, 2)))["params"]
            ckpt = CheckpointManager(args.checkpoints_dir,
                                     f"{args.name}_full")
            if ckpt.has("latest"):
                params = ckpt.restore(params, "latest")

            @jax.jit
            def predict(params, batch):
                outs = net.apply({"params": params}, batch["image"],
                                 batch["hand_side"])
                return outs[5]  # keypoint_coord3d

        derive = jax.jit(lambda raw: derive_batch(
            raw, cfg, jax.random.PRNGKey(0)))
        for i in range(0, len(records), b):
            chunk = records[i:i + b]
            batch = derive(records_to_pipeline_batch(chunk))
            pred = np.asarray(predict(params, batch))
            gt = np.asarray(batch["keypoint_xyz21"])
            scale = np.asarray(batch["keypoint_scale"])[:, 0]
            for j in range(len(chunk)):
                # rescale to meters, center GT (reference eval3d.py:85-95)
                p3d = pred[j] * scale[j]
                g = gt[j] - gt[j][0:1]
                util.feed(g, np.ones(21), p3d)
        mean, median, auc, _, _ = util.get_measures(0.0, 0.050, 20)
        mean, median = mean * 1000, median * 1000
        unit = "mm"

    print(f"Evaluation results ({args.mode}):")
    print(f"Average mean EPE: {mean:.3f} {unit}")
    print(f"Average median EPE: {median:.3f} {unit}")
    print(f"Area under curve: {auc:.3f}")
    return {"mean": float(mean), "median": float(median),
            "auc": float(auc)}


if __name__ == "__main__":
    main()

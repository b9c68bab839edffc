#!/usr/bin/env python
"""hand3d subnet training (ColorHandPose3D stack).

Port of the reference per-subnet training scripts
(reference hand_pose_estimators/CVPR2020_hand3d/training_handsegnet.py,
training_posenet.py:28-120, training_lifting.py): staged-LR Adam on one
subnet at a time, reading the packed binary GAN DB written by
scripts/create_hand3d_db.py (reference data/create_GAN_DB.py role) or a
synthetic in-memory dataset for smoke runs.

    python scripts/train_hand3d.py --net posenet --bin db.bin \\
        --name h3d_posenet --checkpoints_dir ckpt [--max_iter 30000]
    python scripts/train_hand3d.py --net lifting --variant proposed ...

TPU-native: records are stacked on host; ALL derivations (palm coords,
hand-side from mask, canonical/relative trafos, crop, scoremap rendering)
run on device inside the jitted step's data-prep (hand3d/pipeline.py),
replacing the reference's TF CPU queue runners.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from mmhand_tpu.data.hand3d_binary import Hand3dBinaryDataset  # noqa: E402
from mmhand_tpu.hand3d import (  # noqa: E402
    Hand3DSystem,
    PipelineConfig,
    derive_batch,
)
from mmhand_tpu.utils.checkpoint import CheckpointManager  # noqa: E402


def records_to_pipeline_batch(records):
    """Stack read_record dicts into the pipeline's raw-record arrays."""
    return {
        "keypoint_xyz": np.stack([r["xyz"] for r in records]),
        "keypoint_uv": np.stack([r["uv"] for r in records]),
        "cam_mat": np.stack([r["K"] for r in records]),
        "image": np.stack([r["image"] for r in records]),
        "hand_parts": np.stack([r["mask"] for r in records]),
        "keypoint_vis": np.stack([r["visible"] for r in records]) > 0,
    }


def synthetic_records(batch, size=64, seed=0):
    """Random records shaped like the GAN DB (smoke/test path)."""
    rng = np.random.RandomState(seed)
    recs = []
    for _ in range(batch):
        mask = np.zeros((size, size), np.uint8)
        mask[size // 4:size // 2, size // 4:size // 2] = 5  # left hand px
        recs.append({
            "xyz": rng.normal(size=(42, 3)).astype(np.float32),
            "uv": rng.uniform(5, size - 5, (42, 2)).astype(np.float32),
            "K": np.eye(3, dtype=np.float32) * size,
            "image": rng.randint(0, 255, (size, size, 3), np.uint8),
            "mask": mask,
            "visible": np.ones(42, np.uint8),
        })
    return recs


def pipeline_config_for(net: str, size, args) -> PipelineConfig:
    """Reader flags per reference training script."""
    if net == "handsegnet":
        # training_handsegnet.py:41-43: full frames, no crop
        return PipelineConfig(image_size=size, use_wrist_coord=False)
    if net == "posenet":
        # training_posenet.py:41-43
        return PipelineConfig(
            image_size=size, use_wrist_coord=False, hand_crop=False,
            coord_uv_noise=True, crop_center_noise=True)
    # training_lifting.py:45-47: GT scoremaps of tight noisy crops
    return PipelineConfig(
        image_size=size, crop_size=args.crop_size, use_wrist_coord=False,
        hand_crop=True, coord_uv_noise=True, crop_center_noise=True,
        crop_offset_noise=True, crop_scale_noise=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--net", choices=["handsegnet", "posenet", "lifting"],
                   required=True)
    p.add_argument("--variant", default="proposed",
                   choices=["direct", "bottleneck", "local",
                            "local_w_xyz_loss", "proposed"])
    p.add_argument("--bin", default=None,
                   help="packed GAN DB (create_hand3d_db.py); synthetic "
                        "records when omitted")
    p.add_argument("--name", default="hand3d")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--max_iter", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--continue_train", action="store_true")
    args = p.parse_args(argv)

    system = Hand3DSystem(net=args.net, variant=args.variant,
                          crop_size=args.crop_size)
    para = dict(system.train_para)
    if args.max_iter is not None:
        para["max_iter"] = args.max_iter

    size = (args.image_size, args.image_size)
    cfg = pipeline_config_for(args.net, size, args)

    if args.bin:
        ds = Hand3dBinaryDataset(args.bin, args.image_size, args.image_size)
        n = len(ds)
        get = lambda idx: [ds[i % n] for i in idx]  # noqa: E731
    else:
        recs = synthetic_records(args.batch_size * 4, args.image_size,
                                 args.seed)
        n = len(recs)
        get = lambda idx: [recs[i % n] for i in idx]  # noqa: E731

    state = system.init_state(jax.random.PRNGKey(args.seed), size)
    ckpt = CheckpointManager(args.checkpoints_dir,
                             f"{args.name}_{args.net}")
    if args.continue_train and ckpt.has("latest"):
        state = ckpt.restore(state, "latest")
        print(f"resumed at step {int(state.step)}")

    step = jax.jit(system.make_train_step())
    derive = jax.jit(lambda rec, key: derive_batch(rec, cfg, key))

    rng = np.random.RandomState(args.seed)
    data_key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    start = int(state.step)
    for it in range(start, para["max_iter"]):
        idx = rng.randint(0, n, args.batch_size)
        raw = records_to_pipeline_batch(get(idx))
        data_key, sub = jax.random.split(data_key)
        batch = derive(raw, sub)
        state, loss = step(state, batch)
        if it % para["show_loss_freq"] == 0:
            print(f"Iteration {it}\t Loss {float(loss):.3e}\t "
                  f"({time.time() - t0:.1f}s)", flush=True)
        if it and it % para["snapshot_freq"] == 0:
            ckpt.save(state, "latest")
            print("Saved a snapshot.", flush=True)
    ckpt.save(state, "latest")
    print(f"Training finished after {para['max_iter']} iterations; "
          f"final loss {float(loss):.3e}")
    return state


if __name__ == "__main__":
    main()

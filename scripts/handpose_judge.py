#!/usr/bin/env python
"""Independent hand-landmark judge: GT-vs-generated keypoint JSON dump.

Port of the reference's Node.js TF.js-handpose judge
(reference baselines/tf-handpose/test.js:1-31, utilities.js:1-21): given a
directory whose first two (sorted) files are the ground-truth and the
generated image, run a hand-pose estimator on both and write
`gt_js.json` / `pred_js.json` next to them, in the tfjs-handpose output
layout ([{handInViewConfidence, landmarks: [[x, y, z] x 21]}]) so any
downstream comparison tooling keeps working.

The @tensorflow-models/handpose network itself is a pretrained browser
model with no trainable counterpart here; its ROLE — an *independent*
judge that never saw MM-Hand training — is served by the in-framework
ColorHandPose3D pipeline (models/hand3d.py, --judge hand3d) or the CPM
judge (--judge cpm).  Images are resized 256x256 with nearest-neighbor
exactly like utilities.js loadTensor.

    python scripts/handpose_judge.py SAMPLE_DIR [--judge hand3d|cpm]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def load_tensor(path, size=256):
    """utilities.js loadTensor: decode + nearest-neighbor resize to 256."""
    img = Image.open(path).convert("RGB")
    img = img.resize((size, size), Image.NEAREST)
    return np.asarray(img, np.float32)


def estimate_hands_hand3d(images, ckpt_dir=None, name="hand3d"):
    """21 (x, y, z) landmarks per image via the ColorHandPose3D pipeline:
    2D from PoseNet argmax in image coords, z from the lifted normalized
    3D (reference run.py:55-60 post-processing)."""
    from mmhand_tpu.models.hand3d import ColorHandPose3D
    from mmhand_tpu.ops.hand3d_image import (
        detect_keypoints, resize_bilinear_tf1)
    from mmhand_tpu.utils.checkpoint import CheckpointManager

    net = ColorHandPose3D()
    x = jnp.asarray(images) / 255.0 - 0.5
    side = jnp.tile(jnp.asarray([[1.0, 0.0]]), (x.shape[0], 1))
    params = net.init({"params": jax.random.PRNGKey(0)}, x[:1],
                      side[:1])["params"]
    if ckpt_dir:
        ckpt = CheckpointManager(ckpt_dir, f"{name}_full")
        if ckpt.has("latest"):
            params = ckpt.restore(params, "latest")
        else:
            import warnings
            warnings.warn("no hand3d checkpoint found - judging with "
                          "RANDOM weights; landmarks are structural only")

    _, _, scale, center, kp_maps, coord3d = net.apply(
        {"params": params}, x, side)
    coords_hw = detect_keypoints(kp_maps)          # crop coords
    # trafo_coords back to image frame (reference utils/general.py:348-357)
    coords_hw = np.asarray(coords_hw)
    center = np.asarray(center)[:, None, :]
    scale = np.asarray(scale)[:, None, :]
    coords_hw = (coords_hw - net.crop_size // 2) / scale + center
    z = np.asarray(coord3d)[:, :, 2:3]
    xy = coords_hw[:, :, ::-1]                      # (y,x) -> (x,y)
    return np.concatenate([xy, z], axis=2)


def estimate_hands_cpm(images, hpm2d_npz=None, hpm3d_npz=None):
    """Landmarks via the CPM judge (evaluate_gan's HPEJudge)."""
    from mmhand_tpu.eval.evaluator import HPEJudge
    if hpm2d_npz and hpm3d_npz:
        from mmhand_tpu.models.cpm import load_cpm_npz
        judge = HPEJudge(load_cpm_npz(hpm2d_npz), load_cpm_npz(hpm3d_npz))
    else:
        judge = HPEJudge.random_init(size=images.shape[1])
    x = jnp.asarray(images) / 127.5 - 1.0
    px, py, z = jax.device_get(judge._predict(judge.v2d, judge.v3d, x))
    return np.stack([px, py, z], axis=2)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sample_dir")
    p.add_argument("--judge", choices=["hand3d", "cpm"], default="hand3d")
    p.add_argument("--size", type=int, default=256,
                   help="judge input resize (utilities.js uses 256)")
    p.add_argument("--checkpoints_dir", default=None)
    p.add_argument("--hpm2d_npz", default=None)
    p.add_argument("--hpm3d_npz", default=None)
    args = p.parse_args(argv)

    sample = sorted(
        f for f in Path(args.sample_dir).iterdir()
        if f.suffix.lower() in (".png", ".jpg", ".jpeg"))
    assert len(sample) >= 2, "need [gt, generated] images in the dir"
    gt_image = load_tensor(sample[0], args.size)
    pred_image = load_tensor(sample[1], args.size)
    images = np.stack([gt_image, pred_image])

    if args.judge == "hand3d":
        lm = estimate_hands_hand3d(images, args.checkpoints_dir)
    else:
        lm = estimate_hands_cpm(images, args.hpm2d_npz, args.hpm3d_npz)

    for fname, landmarks in [("gt_js.json", lm[0]),
                             ("pred_js.json", lm[1])]:
        out = [{"handInViewConfidence": 1.0,
                "landmarks": np.asarray(landmarks, np.float64)
                .round(4).tolist()}]
        path = Path(args.sample_dir) / fname
        path.write_text(json.dumps(out))
        print("The file has been saved!", path)


if __name__ == "__main__":
    main()

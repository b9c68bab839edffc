#!/usr/bin/env python
"""ColorHandPose3D demo: full pipeline over a list of images with
keypoint overlays (reference hand_pose_estimators/CVPR2020_hand3d/run.py:
30-80).

For each input image: resize, run HandSegNet->crop->PoseNet->PosePrior,
draw the 21 detected keypoints (circle + index, run.py:77-80 style) on
the crop, and write `<name>_crop_kp.png` + a JSON with the normalized 3D
coordinates next to it.  Left-hand one-hot conditioning like the demo
(run.py:41).

    python scripts/run_hand3d.py img1.png img2.png --out_dir demo_out \\
        [--checkpoints_dir ckpt --name hand3d]
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
from PIL import Image, ImageDraw  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("images", nargs="+")
    p.add_argument("--out_dir", default="hand3d_demo")
    p.add_argument("--checkpoints_dir", default=None)
    p.add_argument("--name", default="hand3d")
    p.add_argument("--size", type=int, default=256,
                   help="network input resize (reference feeds 240x320; "
                        "any size works — the pipeline crops to crop_size)")
    p.add_argument("--crop_size", type=int, default=256)
    args = p.parse_args(argv)

    from mmhand_tpu.models.hand3d import ColorHandPose3D
    from mmhand_tpu.ops.hand3d_image import detect_keypoints
    from mmhand_tpu.utils.checkpoint import CheckpointManager

    net = ColorHandPose3D(crop_size=args.crop_size)
    side = jnp.asarray([[1.0, 0.0]])  # left hand (run.py:41)
    dummy = jnp.zeros((1, args.size, args.size, 3))
    params = net.init({"params": jax.random.PRNGKey(0)}, dummy,
                      side)["params"]
    if args.checkpoints_dir:
        ckpt = CheckpointManager(args.checkpoints_dir, f"{args.name}_full")
        if ckpt.has("latest"):
            params = ckpt.restore(params, "latest")
        else:
            import warnings
            warnings.warn("no hand3d checkpoint found - demo runs with "
                          "RANDOM weights (overlay positions meaningless)")

    @jax.jit
    def infer(params, x):
        return net.apply({"params": params}, x, side)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for img_path in args.images:
        raw = Image.open(img_path).convert("RGB").resize(
            (args.size, args.size))
        x = jnp.asarray(np.asarray(raw, np.float32) / 255.0 - 0.5)[None]
        _, crop, scale, center, kp_maps, coord3d = infer(params, x)

        crop_img = Image.fromarray(
            np.clip((np.asarray(crop[0]) + 0.5) * 255, 0, 255)
            .astype(np.uint8))
        coords_hw = np.asarray(detect_keypoints(kp_maps))[0]  # (21, 2)
        draw = ImageDraw.Draw(crop_img)
        for i, (y, xk) in enumerate(coords_hw):
            draw.ellipse([xk - 2, y - 2, xk + 2, y + 2],
                         outline=(255, 255, 255), width=2)
            draw.text((xk + 3, y - 3), str(i), fill=(255, 255, 255))

        stem = Path(img_path).stem
        crop_img.save(out_dir / f"{stem}_crop_kp.png")
        (out_dir / f"{stem}_coord3d.json").write_text(json.dumps({
            "keypoint_coord3d": np.asarray(coord3d[0], np.float64)
            .round(5).tolist(),
            "scale": float(scale[0, 0]),
            "center": np.asarray(center[0], np.float64).tolist(),
        }))
        print(f"{img_path}: wrote {stem}_crop_kp.png, {stem}_coord3d.json")


if __name__ == "__main__":
    main()

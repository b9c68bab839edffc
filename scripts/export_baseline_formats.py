#!/usr/bin/env python
"""Export preprocessed crop trees into the input formats of external
baseline repos (reference baselines/PoseTransfer_convert_RHD.py,
PG2_convert_*.py, pix2pixHD_convert_synthetic_hands.py, label2colormap.py —
notebook-style converters unified into one CLI).

Modes:
  pairs       random (from, to) pair CSV over the crop tree
              (PoseTransfer/PG2 input; reference PoseTransfer_convert_RHD.py:17-45)
  keypoints   name:keypoints_y:keypoints_x CSV (feeds generate_pose_maps.py)
  pix2pixhd   label maps (depth-ordered jointsmap, quantized bone colors)
              + image copies in pix2pixHD's train_label/train_img layout

    python scripts/export_baseline_formats.py pairs /data/rhd_crop pairs.csv
    python scripts/export_baseline_formats.py keypoints /data/rhd_crop annos.csv
    python scripts/export_baseline_formats.py pix2pixhd /data/rhd_crop /data/p2phd
"""

import argparse
import csv
import json
import os
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from mmhand_tpu.data.annotations import load_annotations  # noqa: E402


def _color_images(annotations):
    if "color" in annotations:
        return [("color", name) for name in sorted(annotations["color"])]
    out = []
    for folder in sorted(annotations):
        for name in sorted(annotations[folder]):
            out.append((folder, name))
    return out


def export_pairs(dataroot: str, out_csv: str, seed: int = 49) -> int:
    """Random pairing, one pair per image (reference
    PoseTransfer_convert_RHD.py:17-45)."""
    annotations = load_annotations(dataroot)
    images = _color_images(annotations)
    rng = random.Random(seed)
    with open(out_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["from", "to"])
        for _ in range(len(images)):
            a = rng.randrange(len(images))
            b = rng.randrange(len(images))
            writer.writerow([os.path.join(*images[a]),
                             os.path.join(*images[b])])
    return len(images)


def export_keypoints(dataroot: str, out_csv: str) -> int:
    """name:keypoints_y:keypoints_x CSV for the pose-map generator
    (the input format of reference tool/generate_pose_map_*.py)."""
    annotations = load_annotations(dataroot)
    images = _color_images(annotations)
    with open(out_csv, "w") as f:
        f.write("name:keypoints_y:keypoints_x\n")
        for folder, name in images:
            uv = np.asarray(annotations[folder][name]["uv_coord"])
            ys = json.dumps([round(float(v), 3) for v in uv[:, 1]])
            xs = json.dumps([round(float(v), 3) for v in uv[:, 0]])
            stem = os.path.join(folder, name.rsplit(".", 1)[0])
            f.write(f"{stem}:{ys}:{xs}\n")
    return len(images)


def export_pix2pixhd(dataroot: str, dst: str, size: int = 256) -> int:
    """Label-map + image export (reference
    pix2pixHD_convert_synthetic_hands.py role): label = the depth-ordered
    jointsmap with bone color values as label ids."""
    from PIL import Image

    from mmhand_tpu.ops.jointsmap import generate_jointsmap

    annotations = load_annotations(dataroot)
    images = _color_images(annotations)
    img_dir = os.path.join(dst, "train_img")
    lbl_dir = os.path.join(dst, "train_label")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    for folder, name in images:
        anno = annotations[folder][name]
        uv = np.asarray(anno["uv_coord"], np.float32)
        z = np.asarray(anno["depth"], np.float32)
        jm = np.asarray(generate_jointsmap(uv, z, size, size))
        flat = f"{folder}_{name}"
        Image.fromarray(jm.astype(np.uint8)).save(
            os.path.join(lbl_dir, flat))
        src_img = os.path.join(dataroot, folder, name)
        if os.path.isfile(src_img):
            Image.open(src_img).convert("RGB").save(
                os.path.join(img_dir, flat))
    return len(images)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", choices=["pairs", "keypoints", "pix2pixhd"])
    parser.add_argument("dataroot")
    parser.add_argument("out")
    parser.add_argument("--seed", type=int, default=49)
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args(argv)
    if args.mode == "pairs":
        n = export_pairs(args.dataroot, args.out, args.seed)
    elif args.mode == "keypoints":
        n = export_keypoints(args.dataroot, args.out)
    else:
        n = export_pix2pixhd(args.dataroot, args.out, args.size)
    print(f"{args.mode}: exported {n} entries to {args.out}")


if __name__ == "__main__":
    main()

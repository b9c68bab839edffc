#!/usr/bin/env python
"""Offline pose-map renderer: CSV keypoint annotations -> 21-channel
Gaussian .npy maps (reference tool/generate_pose_map_{RHD,STB,MHP,
GANerated,realhand}.py — five near-identical scripts unified).

    python scripts/generate_pose_maps.py annotations.csv trainK \\
        [--size 256 256] [--sigma 6]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.data.csv_dataset import compute_pose_maps  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("annotations_csv")
    parser.add_argument("save_path")
    parser.add_argument("--size", type=int, nargs=2, default=[256, 256])
    parser.add_argument("--sigma", type=float, default=6.0)
    parser.add_argument("--sep", default=":")
    args = parser.parse_args(argv)
    n = compute_pose_maps(args.annotations_csv, args.save_path,
                          tuple(args.size), args.sigma, args.sep)
    print(f"rendered {n} pose maps to {args.save_path}")


if __name__ == "__main__":
    main()

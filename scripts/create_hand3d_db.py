#!/usr/bin/env python
"""Pack a generated crop tree into the hand3d binary GAN database
(reference hand_pose_estimators/CVPR2020_hand3d/data/create_GAN_DB.py),
so the synthetic images can fine-tune an external ColorHandPose3D stack.

    python scripts/create_hand3d_db.py --dataroot /data/rhd_crop \\
        --images /data/MM-Hand_rhd_crop --out gan_train.bin
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from mmhand_tpu.data.annotations import load_annotations  # noqa: E402
from mmhand_tpu.data.hand3d_binary import write_gan_db  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataroot", required=True,
                        help="crop tree with annotation.pickle")
    parser.add_argument("--images", default=None,
                        help="image tree (defaults to dataroot, e.g. the "
                             "aug.py output dir)")
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    annotations = load_annotations(args.dataroot)
    images_root = args.images or args.dataroot

    def samples():
        folders = (["color"] if "color" in annotations
                   else sorted(annotations.keys()))
        for folder in folders:
            for name, anno in sorted(annotations[folder].items()):
                path = os.path.join(images_root, folder, name)
                if not os.path.isfile(path):
                    continue
                image = np.asarray(Image.open(path).convert("RGB"), np.uint8)
                yield {"image": image,
                       "uv": np.asarray(anno["uv_coord"], np.float32),
                       "xyz": np.asarray(anno["xyz"], np.float32),
                       "K": np.asarray(anno.get("K", anno.get("k")),
                                       np.float32)}

    n = write_gan_db(args.out, samples())
    print(f"wrote {n} records to {args.out}")


if __name__ == "__main__":
    main()

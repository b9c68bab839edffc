#!/usr/bin/env python
"""The augmentation-ratio study driver
(reference scripts/mm-train-ratio.sh:3-59, scripts/README.md:1-6).

For each ratio r in the sweep:
  1. train the GAN on the last r fraction of the train set;
  2. generate fakes for the unseen (1-r) complement (scripts/aug.py) into
     the '{method}_{dataroot-leaf}' sibling dir the HPE datasets expect;
  3. train the HPE on the real/synthetic mixture;
  4. evaluate EPE/PCK-AUC on the test set.

    python scripts/mm_train_ratio.py --dataset RHD \\
        --dataroot /data/rhd_crop --test_dataroot /data/rhd_crop_test \\
        --ratios 1.0 0.8 0.6 0.4 0.2 --niter 500
"""

import argparse
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from mmhand_tpu.hpe.data import augmentation_dir_for  # noqa: E402


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run([sys.executable, *cmd], check=True, cwd=str(ROOT))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--dataroot", required=True)
    parser.add_argument("--test_dataroot", required=True)
    parser.add_argument("--ratios", type=float, nargs="+",
                        default=[1.0, 0.8, 0.6, 0.4, 0.2])
    parser.add_argument("--method", default="MM-Hand")
    parser.add_argument("--batchSize", type=int, default=32)
    parser.add_argument("--niter", type=int, default=500)
    parser.add_argument("--hpe_epochs", type=int, default=90)
    parser.add_argument("--checkpoints_dir", default="./checkpoints")
    parser.add_argument("--extra_gan_args", nargs="*", default=[])
    parser.add_argument("--with_hand3d", action="store_true",
                        help="also fine-tune + eval the second HPE stack "
                             "(ColorHandPose3D posenet) on the generated "
                             "data via the packed binary GAN DB — the "
                             "reference's dual-judge study "
                             "(hand3d training_posenet.py on "
                             "BinaryDbReader_gan)")
    parser.add_argument("--hand3d_iters", type=int, default=30000)
    args = parser.parse_args(argv)

    ds = args.dataset
    for ratio in args.ratios:
        tag = f"{ds.lower()}_r{ratio:g}".replace(".", "p")
        gan_name = f"gan_{tag}"
        hpe_name = f"hpe_{tag}_{args.method}"

        # 1. GAN on the r fraction
        run(["scripts/train.py", "--dataset", ds,
             "--dataroot", args.dataroot, "--name", gan_name,
             "--batchSize", str(args.batchSize),
             "--augmentation_ratio", str(ratio),
             "--niter", str(args.niter),
             "--checkpoints_dir", args.checkpoints_dir,
             *args.extra_gan_args])

        # 2. generate the (1-r) complement into {method}_{leaf}
        if ratio < 1.0:
            aug_dir = augmentation_dir_for(args.dataroot, args.method)
            run(["scripts/aug.py", "--dataset", ds,
                 "--dataroot", args.dataroot, "--name", gan_name,
                 "--augmentation_ratio", str(ratio),
                 "--checkpoints_dir", args.checkpoints_dir,
                 "--dst", aug_dir])

        # 3. HPE on the mixture
        run(["scripts/train_hpe.py", "--dataset", ds,
             "--dataroot", args.dataroot, "--name", hpe_name,
             "--batchSize", str(args.batchSize),
             "--augmentation_ratio", str(ratio),
             "--augmentation_method", args.method,
             "--epochs", str(args.hpe_epochs),
             "--checkpoints_dir", args.checkpoints_dir])

        # 4. evaluate
        run(["scripts/test_hpe.py", "--dataset", ds,
             "--dataroot", args.test_dataroot, "--name", hpe_name,
             "--checkpoints_dir", args.checkpoints_dir])

        # 5. optional second judge: hand3d posenet fine-tuned on the
        # generated data (reference hand3d training_posenet.py fed by
        # BinaryDbReader_gan / create_GAN_DB outputs)
        if args.with_hand3d and ratio < 1.0:
            db = str(Path(args.checkpoints_dir) / f"gan_db_{tag}.bin")
            run(["scripts/create_hand3d_db.py",
                 "--dataroot", args.dataroot,
                 "--images", augmentation_dir_for(args.dataroot,
                                                  args.method),
                 "--out", db])
            run(["scripts/train_hand3d.py", "--net", "posenet",
                 "--bin", db, "--name", f"h3d_{tag}",
                 "--max_iter", str(args.hand3d_iters),
                 "--checkpoints_dir", args.checkpoints_dir])
            run(["scripts/eval_hand3d.py", "--mode", "2d",
                 "--bin", db, "--name", f"h3d_{tag}",
                 "--checkpoints_dir", args.checkpoints_dir])


if __name__ == "__main__":
    main()

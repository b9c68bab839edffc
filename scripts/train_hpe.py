#!/usr/bin/env python
"""Downstream HPE training on real/synthetic mixtures
(reference hand_pose_estimators/CVPR2020_hpm3d/train.py:28-92).

    python scripts/train_hpe.py --dataset RHD --dataroot /data/rhd_crop \\
        --augmentation_ratio 0.8 --augmentation_method MM-Hand \\
        --name hpe_rhd_08 --batchSize 16 --niter 90
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

from mmhand_tpu.config import Config, add_cli_args, from_cli_args  # noqa: E402
from mmhand_tpu.data.loader import epoch_permutation  # noqa: E402
from mmhand_tpu.hpe import (  # noqa: E402
    HPEMixDataset,
    HPESystem,
    make_hpe_prepare_batch,
    make_hpe_train_step,
)
from mmhand_tpu.utils.checkpoint import CheckpointManager  # noqa: E402
from mmhand_tpu.utils.logging import Visualizer  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_cli_args(parser)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--from_bin", type=str, default=None,
                        help="train from a hand3d packed binary GAN DB "
                             "(scripts/create_hand3d_db.py output) instead "
                             "of a crop tree")
    args = parser.parse_args(argv)
    cfg = from_cli_args(args, Config())

    system = HPESystem(lr=cfg.optim.lr, beta1=cfg.optim.beta1)
    state = system.init_state(jax.random.PRNGKey(cfg.data.seed),
                              size=cfg.model.fine_size)
    step = jax.jit(make_hpe_train_step(system), donate_argnums=(0,))
    prepare = make_hpe_prepare_batch()

    if args.from_bin:
        from mmhand_tpu.hpe.data import BinDBDataset
        dataset = BinDBDataset(args.from_bin, size=cfg.model.fine_size)
    else:
        dataset = HPEMixDataset(cfg, is_train=True)
    ckpt = CheckpointManager(cfg.run.checkpoints_dir, cfg.run.name)
    vis = Visualizer(cfg.run.checkpoints_dir, cfg.run.name)
    vis.save_options(cfg)

    bsz = cfg.data.batch_size
    epochs = args.epochs if args.epochs is not None else cfg.optim.niter
    total = 0
    n = len(dataset)
    if cfg.data.max_dataset_size:
        n = min(n, cfg.data.max_dataset_size)
    for epoch in range(1, epochs + 1):
        order = epoch_permutation(n, cfg.data.seed, epoch)
        for i in range(n // bsz):
            t0 = time.time()
            raw = dataset.batch(order[i * bsz:(i + 1) * bsz])
            state, metrics = step(state, prepare(raw))
            total += 1
            if total % cfg.run.print_freq == 0:
                jax.block_until_ready(metrics)
                vis.print_current_errors(
                    epoch, total, {k: float(v) for k, v in metrics.items()},
                    (time.time() - t0) / bsz)
            if args.max_steps and total >= args.max_steps:
                ckpt.save(state, "latest")
                print(f"done: {total} steps, mse={float(metrics['mse']):.4f} "
                      f"lz={float(metrics['lz']):.4f}")
                return
        if epoch % cfg.run.save_epoch_freq == 0:
            ckpt.save(state, str(epoch))
            ckpt.save(state, "latest")
    ckpt.save(state, "latest")
    print(f"done: {total} steps")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""HPE evaluation: EPE / PCK-AUC over a test crop tree
(reference hand_pose_estimators/CVPR2020_hpm3d/test.py:39-50,
models/hpm_model.py:147-161 — thresholds 0-30 px, 20 steps).

    python scripts/test_hpe.py --dataset RHD --dataroot /data/rhd_crop_test \\
        --name hpe_rhd_08
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from mmhand_tpu.config import Config, add_cli_args, from_cli_args  # noqa: E402
from mmhand_tpu.eval import HPEJudge  # noqa: E402
from mmhand_tpu.hpe import HPEMixDataset, HPESystem  # noqa: E402
from mmhand_tpu.ops.image import normalize_image  # noqa: E402
from mmhand_tpu.utils.checkpoint import CheckpointManager  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_cli_args(parser)
    parser.add_argument("--eval_batch", type=int, default=8)
    parser.add_argument("--model", default="hpm",
                        choices=("hpm", "hpm2d", "hpm3d"),
                        help="which trained variant to evaluate (reference "
                             "models/__init__.py:55-67)")
    args = parser.parse_args(argv)
    cfg = from_cli_args(args, Config(is_train=False))

    system = HPESystem(variant=args.model)
    # shape-only template: avoids paying the full init compile just to
    # restore (orbax restores into a ShapeDtypeStruct tree)
    template = jax.eval_shape(
        lambda: system.init_state(jax.random.PRNGKey(0),
                                  size=cfg.model.fine_size))
    ckpt = CheckpointManager(cfg.run.checkpoints_dir, cfg.run.name)
    state = ckpt.restore(template, cfg.run.which_epoch, place=True)
    dataset = HPEMixDataset(cfg, is_train=False)

    if args.model == "hpm3d":
        return _eval_hpm3d(cfg, system, state, dataset, args.eval_batch)

    if args.model == "hpm2d":
        # 2d-only checkpoint: the z-regressor head does not exist; judge
        # runs with a random 3d net and only the 2d block is reported
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rand3d = HPEJudge.random_init(size=cfg.model.fine_size)
        judge = HPEJudge({"params": state.params2d}, rand3d.v3d)
    else:
        judge = HPEJudge({"params": state.params2d},
                         {"params": state.params3d})

    n = len(dataset)
    if cfg.data.max_dataset_size:
        n = min(n, cfg.data.max_dataset_size)
    bsz = args.eval_batch
    for i in range(0, n, bsz):
        raw = dataset.batch(range(i, min(i + bsz, n)))
        images = np.asarray(normalize_image(raw["image"]))
        # raw z is depth/0.7 (training target); the judge divides gt z by
        # 700 and multiplies by 256, so feeding raw_z*700 lands the gt at
        # depth/0.7*256 px — matching the reference's pre-scaled pseudo_xyz
        # (RHD_dataset.py:135 with hpm_model.py:324's rescale commented out)
        xyz = np.concatenate(
            [raw["uv"], (raw["z"] * 700.0)[:, :, None]], axis=-1)
        judge.feed(images, xyz)

    r2d, r3d = judge.get_results(30, 20)
    blocks = [("2d", r2d)] if args.model == "hpm2d" else \
        [("2d", r2d), ("3d", r3d)]
    for tag, r in blocks:
        print(f"################# {tag} #################")
        print(f"epe_mean: {r[0]:.4f}")
        print(f"epe_median: {r[1]:.4f}")
        print(f"auc: {r[2]:.4f}")


def _eval_hpm3d(cfg, system, state, dataset, bsz):
    """hpm3d variant: GT sigma-5 heatmaps -> z; reports the z error in the
    judge's pixel scale (z*256, the hpe_estimator.py:131-137 convention)."""
    predict = jax.jit(lambda p, h: system.hpm3d.apply({"params": p}, h))
    from mmhand_tpu.hpe import make_hpe_prepare_batch
    prepare = make_hpe_prepare_batch()
    n = len(dataset)
    if cfg.data.max_dataset_size:
        n = min(n, cfg.data.max_dataset_size)
    errs = []
    for i in range(0, n, bsz):
        batch = prepare(dataset.batch(range(i, min(i + bsz, n))))
        z = np.asarray(predict(state.params3d, batch["heatmaps"]))
        errs.append(np.abs(z - np.asarray(batch["z"])) * 256.0)
    errs = np.concatenate(errs, axis=0)
    print("################# 3d (z only) #################")
    print(f"epe_mean: {float(np.mean(errs)):.4f}")
    print(f"epe_median: {float(np.median(errs)):.4f}")


if __name__ == "__main__":
    main()

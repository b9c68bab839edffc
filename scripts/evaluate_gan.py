#!/usr/bin/env python
"""Image-quality + pose-consistency evaluation of a trained generator
("benchmark 1", reference scripts/README.md:1-6, driven by
baselines/quantitative_on_benchmarks/bench_*.py through Evaluator
utils.py:12-139).

Sweeps the test split, generates fakes from (source image, target pose,
target depth) conditioning, and reports {IS_avg/std, SSIM_avg/std,
pck2d_auc, pck3d_auc, fid} — FID being the north-star addition.

    python scripts/evaluate_gan.py --dataset RHD --dataroot /data/rhd_test \\
        --name rhd_256 [--inception_npz inception_v3.npz] \\
        [--hpm2d_npz w2d.npz --hpm3d_npz w3d.npz]

Without converted weights the inception/CPM nets run random-init: the
numbers are structural only (pipeline health), not comparable metrics.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from mmhand_tpu.config import Config, add_cli_args, from_cli_args  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_cli_args(parser)
    parser.add_argument("--eval_batch", type=int, default=16)
    parser.add_argument("--inception_npz", type=str, default=None)
    parser.add_argument("--hpm2d_npz", type=str, default=None)
    parser.add_argument("--hpm3d_npz", type=str, default=None)
    parser.add_argument("--no_pck", action="store_true",
                        help="skip the CPM judge (faster)")
    parser.add_argument("--ssim_quirk", action="store_true",
                        help="reproduce the reference SSIM range quirk "
                             "(pred in [-1,1] vs gt in [0,1]; reference "
                             "baselines/quantitative_on_benchmarks/"
                             "utils.py:100-111) for 1:1 harness A/Bs")
    args = parser.parse_args(argv)
    cfg = from_cli_args(args, Config(is_train=False))
    scores = evaluate(cfg, batch_size=args.eval_batch,
                      inception_npz=args.inception_npz,
                      hpm2d_npz=args.hpm2d_npz, hpm3d_npz=args.hpm3d_npz,
                      with_pck=not args.no_pck,
                      ssim_quirk=args.ssim_quirk)
    print(json.dumps({
        k: (v if isinstance(v, str) else round(float(v), 4))
        for k, v in scores.items()}))


def evaluate(cfg: Config, batch_size: int = 16, state=None,
             inception_npz=None, hpm2d_npz=None, hpm3d_npz=None,
             with_pck: bool = True, ssim_quirk: bool = False) -> dict:
    from mmhand_tpu.data import HostLoader, build_dataset, make_prepare_batch
    from mmhand_tpu.eval import Evaluator, HPEJudge
    from mmhand_tpu.train.loop import build_system
    from mmhand_tpu.train.step import make_eval_step
    from mmhand_tpu.utils.checkpoint import CheckpointManager

    system, _ = build_system(cfg.replace(is_train=False))
    if state is None:
        ckpt = CheckpointManager(cfg.run.checkpoints_dir, cfg.run.name)
        template = jax.eval_shape(
            lambda: system.init_state(jax.random.PRNGKey(0), 1))
        state = ckpt.restore(template, cfg.run.which_epoch, place=True)
    eval_step = make_eval_step(system)

    inception_vars = None
    if inception_npz:
        from mmhand_tpu.models.inception import load_inception_npz
        inception_vars = load_inception_npz(inception_npz)

    judge = None
    if with_pck:
        if hpm2d_npz and hpm3d_npz:
            from mmhand_tpu.models.cpm import load_cpm_npz
            judge = HPEJudge(load_cpm_npz(hpm2d_npz),
                             load_cpm_npz(hpm3d_npz))
        else:
            judge = HPEJudge.random_init(size=cfg.model.fine_size)

    evaluator = Evaluator(inception_vars=inception_vars, judge=judge,
                          ssim_quirk=ssim_quirk)

    dataset = build_dataset(cfg)
    loader = HostLoader(dataset, batch_size, seed=cfg.data.seed,
                        shuffle=False, drop_last=False,
                        max_items=cfg.data.max_dataset_size)
    prepare = make_prepare_batch(cfg.data.sigma)

    import time
    n_images = 0
    first_n = first_t = None
    t0 = time.perf_counter()
    # phase 1: generate everything (one resident program); metric programs
    # then each run back-to-back over the collected batches — rotating the
    # 4+ executables per batch thrashes the tunnel backend's program
    # residency (see Evaluator.feed_phased)
    preds, gts, xyzs = [], [], []
    for raw in loader.epoch(0):
        batch = prepare({k: v for k, v in raw.items()
                         if not k.endswith("paths")})
        fakes = eval_step(state.g, batch)
        xyz = None
        if judge is not None and "tgt_uv" in raw:
            # raw depth in the z column; the judge rescales to pixels
            # (/700*256) internally — reference hpe_estimator.py:122.
            # Prerendered datasets (MMHand CSV) carry no uv/z: PCK is
            # skipped for them, like the reference's pose-map-only path.
            xyz = np.concatenate(
                [raw["tgt_uv"], raw["tgt_z"][:, :, None]], axis=-1)
        preds.append(fakes)
        gts.append(batch["H2"])
        xyzs.append(xyz)
        n_images += int(fakes.shape[0])
        if first_t is None:  # first batch pays the G compile
            first_n, first_t = n_images, time.perf_counter()
    evaluator.feed_phased(preds, gts, xyzs)

    if n_images == 0:
        raise SystemExit(
            "evaluate_gan: the dataset produced no eval pairs.  A dataroot "
            "whose path lacks 'test' uses the generate-mode complement "
            "split (reference generic_dataset.py:114-121): with "
            "--augmentation_ratio 1.0 the complement is empty — pass a "
            "ratio < 1, or point --dataroot at a *test* tree.")
    t_end = time.perf_counter()
    scores = evaluator.evaluate()
    scores["images"] = n_images
    scores["images_per_sec"] = (n_images / (t_end - t0)
                                if t_end > t0 else 0.0)
    if first_t is not None and n_images > first_n and t_end > first_t:
        # steady-state rate: excludes the first batch's compile cost
        scores["images_per_sec_steady"] = (
            (n_images - first_n) / (t_end - first_t))
    return scores


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Baseline-judge benchmarks (reference baselines/quantitative_on_benchmarks/
bench_p2p.py, bench_cyclegan.py, bench_poseTransfer.py).

Evaluates a baseline generator over a test crop tree with the same metric
engine as the MM-Hand model (IS/SSIM/FID/PCK):

* --arch patn2   2-stream PoseTransfer generator, input (src image, heatmaps)
* --arch resnet  CycleGAN resnet generator, input = depth-colored jointsmap
* --arch unet    pix2pix UNet, input = depth-colored jointsmap

    python scripts/bench_baselines.py --arch patn2 --dataset RHD \\
        --dataroot /data/rhd_crop_test [--ckpt checkpoints/ptn_rhd]
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

from mmhand_tpu.config import Config, add_cli_args, from_cli_args  # noqa: E402


def jointsmap_condition(uv, z, size):
    """Depth-colored jointsmap conditioning, minmax-normalized to [0, 1]
    (reference utils.py:113-125 _create_input_image; canonical
    implementation: Evaluator.create_input_image)."""
    from mmhand_tpu.eval import Evaluator

    xyz = np.concatenate([np.asarray(uv, np.float32),
                          np.asarray(z, np.float32)[..., None]], axis=-1)
    return Evaluator.create_input_image(xyz, size)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_cli_args(parser)
    parser.add_argument("--arch", required=True,
                        choices=["patn2", "resnet", "unet"])
    parser.add_argument("--ckpt", default=None,
                        help="orbax dir holding {'params': ...} for the "
                             "generator (random init if omitted)")
    parser.add_argument("--eval_batch", type=int, default=8)
    parser.add_argument("--inception_npz", default=None)
    parser.add_argument("--no_pck", action="store_true")
    args = parser.parse_args(argv)
    cfg = from_cli_args(args, Config(is_train=False))

    from mmhand_tpu.data import HostLoader, build_dataset, make_prepare_batch
    from mmhand_tpu.eval import Evaluator, HPEJudge
    from mmhand_tpu.models.baselines import (
        PATN2Stream,
        ResnetGenerator,
        UnetGenerator,
    )

    size = cfg.model.fine_size
    if args.arch == "patn2":
        net = PATN2Stream()
        example = (jnp.zeros((1, size, size, 3)),
                   jnp.zeros((1, size, size, 42)))
    elif args.arch == "resnet":
        net = ResnetGenerator(n_blocks=9)
        example = jnp.zeros((1, size, size, 3))
    else:
        net = UnetGenerator(num_downs=8)
        example = jnp.zeros((1, size, size, 3))

    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = net.init(rngs, example, train=False)
    if args.ckpt:
        import orbax.checkpoint as ocp
        variables = ocp.PyTreeCheckpointer().restore(
            args.ckpt, item=jax.device_get(variables))

    @jax.jit
    def forward(v, x):
        return net.apply(v, x, train=False)

    inception_vars = None
    if args.inception_npz:
        from mmhand_tpu.models.inception import load_inception_npz
        inception_vars = load_inception_npz(args.inception_npz)
    judge = None if args.no_pck else HPEJudge.random_init(size=size)
    evaluator = Evaluator(inception_vars=inception_vars, judge=judge)

    dataset = build_dataset(cfg)
    loader = HostLoader(dataset, args.eval_batch, seed=cfg.data.seed,
                        shuffle=False, drop_last=False,
                        max_items=cfg.data.max_dataset_size)
    prepare = make_prepare_batch(cfg.data.sigma)

    for raw in loader.epoch(0):
        batch = prepare({k: v for k, v in raw.items()
                         if not k.endswith("paths")})
        if args.arch == "patn2":
            g_in = (batch["H1"],
                    jnp.concatenate([batch["P1"], batch["P2"]], -1))
        else:
            cond = jointsmap_condition(
                raw["tgt_uv"],
                np.asarray(raw["tgt_z"]) / 700.0 * 255.0, size)
            g_in = jnp.asarray(cond)
        fakes = forward(variables, g_in)
        xyz = None
        if judge is not None:
            xyz = np.concatenate(
                [raw["tgt_uv"], raw["tgt_z"][:, :, None]], axis=-1)
        evaluator.feed(fakes, batch["H2"], gt_xyz=xyz)

    scores = evaluator.evaluate()
    print(json.dumps({"arch": args.arch,
                      **{k: (v if isinstance(v, str) else round(float(v), 4))
                         for k, v in scores.items()}}))


if __name__ == "__main__":
    main()

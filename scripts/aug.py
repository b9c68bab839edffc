#!/usr/bin/env python
"""Synthetic data generation (reference aug.py:12-71).

Loads the latest generator checkpoint, sweeps the augmentation split of the
dataset (the (1-ratio) complement the GAN never trained on — or the whole
test set), and writes fake PNGs mirroring the target path under DST:
DST/<folder>/<name> (reference aug.py:67-71 — the ONLY output contract the
downstream HPE stacks consume).

    python scripts/aug.py --name rhd_256 --dataroot /data/rhd_crop \\
        --dataset RHD --augmentation_ratio 0.8 --dst /data/rhd_fake

TPU-native: generation is batched (the reference ran batch=1) and the
conditioning heatmaps/depth planes render on device.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from mmhand_tpu.config import Config, add_cli_args, from_cli_args  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_cli_args(parser)
    parser.add_argument("--dst", type=str, required=True,
                        help="output root for fake images")
    parser.add_argument("--gen_batch", type=int, default=16)
    parser.add_argument("--torch_netG", type=str, default=None,
                        help="reference latest_net_netG.pth (or its .npz "
                             "dump) — generate directly from a PyTorch-"
                             "trained checkpoint")
    args = parser.parse_args(argv)

    cfg = from_cli_args(args, Config(is_train=False))
    generate(cfg, args.dst, batch_size=args.gen_batch,
             torch_netG=args.torch_netG)


def load_torch_generator(path: str):
    """Reference latest_net_netG.pth / .npz -> flax variables
    (tools/convert_mmhand_torch.py; numerically parity-tested)."""
    import sys as _sys
    from pathlib import Path as _Path
    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "tools"))
    from convert_mmhand_torch import convert_generator

    if path.endswith(".npz"):
        import numpy as _np
        sd = dict(_np.load(path))
    else:
        import torch
        sd = torch.load(path, map_location="cpu")
    return convert_generator(sd)


def generate(cfg: Config, dst: str, batch_size: int = 16,
             state=None, torch_netG=None) -> int:
    """Run the generator over the aug split; returns #images written."""
    import jax

    from mmhand_tpu.data import HostLoader, build_dataset, make_prepare_batch
    from mmhand_tpu.ops.image import denormalize_image
    from mmhand_tpu.train.loop import build_system
    from mmhand_tpu.train.state import NetState
    from mmhand_tpu.train.step import make_eval_step
    from mmhand_tpu.utils.checkpoint import CheckpointManager

    system, _ = build_system(cfg.replace(is_train=False))
    if torch_netG is not None:
        variables = load_torch_generator(torch_netG)
        g_state = NetState(variables["params"], variables["batch_stats"])
    elif state is None:
        ckpt = CheckpointManager(cfg.run.checkpoints_dir, cfg.run.name)
        template = jax.eval_shape(
            lambda: system.init_state(jax.random.PRNGKey(0), 1))
        state = ckpt.restore(template, cfg.run.which_epoch, place=True)
        g_state = state.g
    else:
        g_state = state.g
    eval_step = make_eval_step(system)

    dataset = build_dataset(cfg)
    loader = HostLoader(dataset, batch_size, seed=cfg.data.seed,
                        shuffle=False, drop_last=False,
                        max_items=cfg.data.max_dataset_size)
    prepare = make_prepare_batch(cfg.data.sigma)

    import jax

    to_u8 = jax.jit(lambda x: denormalize_image(x))

    written = 0
    for raw in loader.epoch(0):
        batch = prepare({k: v for k, v in raw.items()
                         if not k.endswith("paths")})
        # denormalize ON DEVICE and fetch uint8: 4x less device->host
        # traffic than pulling float32 (tensor2im on host)
        fakes = np.asarray(to_u8(eval_step(g_state, batch)))
        for i, tgt_path in enumerate(raw["tgt_paths"]):
            img = fakes[i]
            folder = os.path.basename(os.path.dirname(tgt_path))
            name = os.path.basename(tgt_path)
            out_dir = os.path.join(dst, folder)
            os.makedirs(out_dir, exist_ok=True)
            Image.fromarray(img).save(os.path.join(out_dir, name))
            written += 1
    print(f"wrote {written} fakes under {dst}")
    return written


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""GAN training entry point (reference train.py:10-65).

CLI keeps the reference's flag names (see mmhand_tpu/config.py); e.g.:

    python scripts/train.py --dataset RHD --dataroot /data/rhd_crop \\
        --name rhd_256 --batchSize 32 --augmentation_ratio 1.0

Data parallelism is automatic: all visible devices form a 1-D `data` mesh
(replacing torch.distributed.launch + NCCL; reference
scripts/mm-train-ratio.sh:19-21, options/base_options.py:171-178).

Run a data-free end-to-end smoke with `--dataset synthetic`.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()  # fast PRNG + persistent compile cache

from mmhand_tpu.config import Config, add_cli_args, from_cli_args  # noqa: E402
from mmhand_tpu.train.loop import train  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    add_cli_args(parser)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke runs)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override total epochs (default niter+niter_decay)")
    parser.add_argument("--vgg_npz", type=str, default=None,
                        help="converted VGG19 weights (tools/convert_torch_weights.py)")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of the first "
                             "steps under checkpoints/<name>/trace")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (multi-host DCN; "
                             "replaces torch.distributed.launch)")
    args = parser.parse_args(argv)

    host_id, num_hosts = 0, 1
    if args.multihost:
        import jax
        jax.distributed.initialize()
        host_id, num_hosts = jax.process_index(), jax.process_count()

    cfg = from_cli_args(args, Config())

    if args.profile:
        import jax
        import os
        trace_dir = os.path.join(cfg.run.checkpoints_dir, cfg.run.name,
                                 "trace")
        try:
            with jax.profiler.trace(trace_dir):
                result = train(cfg, max_steps=args.max_steps or 3,
                               vgg_npz=args.vgg_npz, total_epochs=args.epochs,
                               host_id=host_id, num_hosts=num_hosts)
            print(f"profile trace written to {trace_dir}")
        except Exception as e:  # some backends (axon tunnel) can't profile
            print(f"profiler unavailable on this backend ({e}); "
                  "running without trace")
            result = train(cfg, max_steps=args.max_steps or 3,
                           vgg_npz=args.vgg_npz, total_epochs=args.epochs,
                           host_id=host_id, num_hosts=num_hosts)
        print(f"done: {result.steps} steps")
        return

    result = train(cfg, max_steps=args.max_steps, vgg_npz=args.vgg_npz,
                   total_epochs=args.epochs,
                   host_id=host_id, num_hosts=num_hosts)
    print(f"done: {result.steps} steps, last metrics: "
          f"{ {k: round(v, 4) for k, v in result.last_metrics.items()} }")


if __name__ == "__main__":
    main()

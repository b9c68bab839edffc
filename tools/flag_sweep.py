"""XLA:TPU compiler-option sweep for the full train step.

The axon plugin ignores XLA_FLAGS env vars, but per-executable compiler
options go through `.lower().compile(compiler_options=...)` — this sweeps
a few scheduling/fusion options against the baseline.

Usage: python tools/flag_sweep.py [--batch 16] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp
import numpy as np

OPTION_SETS = {
    "baseline": None,
    "latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "flash_fusion": {"xla_tpu_enable_dot_strength_reduction": "false"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    b = args.batch

    from mmhand_tpu.config import Config
    from mmhand_tpu.train import MMHandSystem, make_train_step

    cfg = Config()
    system = MMHandSystem(cfg)
    state = system.init_state(jax.random.PRNGKey(0), local_batch_size=b)
    vgg = system.make_l1_loss(None).init_vgg(
        jax.random.PRNGKey(1), (1, 256, 256, 3))
    l1 = system.make_l1_loss(vgg)
    step = make_train_step(system, l1)

    rng = np.random.RandomState(0)
    data = {k: jnp.asarray(
        rng.uniform(-1, 1, (b, 256, 256, c)).astype(np.float32))
        for k, c in [("H1", 3), ("H2", 3), ("D1", 3), ("D2", 3),
                     ("P1", 21), ("P2", 21)]}

    lowered = jax.jit(step, donate_argnums=(0,)).lower(state, data, 2e-4)
    state_host = jax.device_get(state)  # pristine copy: state is donated
    for name, opts in OPTION_SETS.items():
        try:
            compiled = lowered.compile(compiler_options=opts)
        except Exception as e:
            print(f"  {name:20s} COMPILE FAILED: {str(e)[:120]}", flush=True)
            continue
        s = jax.device_put(state_host)
        out = compiled(s, data, 2e-4)
        s = out[0]
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, m = compiled(s, data, 2e-4)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  {name:20s} {dt*1e3:8.1f} ms  {b/dt:7.1f} img/s",
              flush=True)


if __name__ == "__main__":
    main()

"""Secondary training-throughput benches: HPE (hpm2d+3d) and hand3d subnets.

bench.py covers the flagship GAN step; this measures the other two trainers
a user of the augmentation study actually pays for (reference benchmark 2
retrains the HPE stacks at every ratio — scripts/mm-train-ratio.sh):

* hpe      — staged-MSE CPM 2D + SmoothL1 z-regressor step at 256px,
             batch 20 (reference hand_pose_estimators/CVPR2020_hpm3d/
             scripts/train-hpm.sh:11 --batch_size 20)
* posenet / handsegnet / lifting — ColorHandPose3D subnet steps, batch 8
             (reference hand_pose_estimators/CVPR2020_hand3d/
             training_{posenet,handsegnet,lifting}.py batch_size=8)

Methodology follows BASELINE.md's axon gotchas: the train STATE chains
through iterations (each step consumes the previous step's output, so the
loop cannot collapse into independent dispatches) and the loop ends with a
device-to-host scalar fetch (block_until_ready alone returns about one
program early on axon).  Synthetic device-resident batches — this times the
compiled step, not the host loader.

    python tools/bench_secondary.py [hpe posenet ...]   # default: all

Prints one JSON line per bench; results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _time_steps(step, state, args, iters=20):
    """Compile, then time `iters` chained steps; returns seconds."""
    state, metrics = step(state, *args)
    jax.block_until_ready((state, metrics))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, *args)
    # D2H fetch of a scalar forces full completion on axon
    leaf = jax.tree.leaves(metrics)[0]
    val = float(np.asarray(jax.device_get(leaf)).ravel()[0])
    dt = time.perf_counter() - t0
    # A NaN/Inf chained value makes the axon timing chain return early and
    # throughput read impossibly fast (BASELINE.md gotchas) — a diverged
    # step must invalidate the timing, not inflate it.
    if not math.isfinite(val):
        raise RuntimeError(
            f"bench metrics went non-finite ({val}); timing invalid")
    return dt


def bench_hpe(size=256, batch=20, iters=20):
    from mmhand_tpu.hpe.system import HPESystem, make_hpe_train_step

    system = HPESystem()
    state = system.init_state(jax.random.PRNGKey(0), size=size)
    step = jax.jit(make_hpe_train_step(system), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    batch_d = {
        "image": jnp.asarray(rng.uniform(
            -1, 1, (batch, size, size, 3)).astype(np.float32)),
        "heatmaps": jnp.asarray(rng.uniform(
            0, 1, (batch, size, size, 21)).astype(np.float32)),
        "z": jnp.asarray(rng.uniform(0, 1, (batch, 21)).astype(np.float32)),
        "weight": jnp.ones((batch,), np.float32),
    }
    dt = _time_steps(step, state, (batch_d, 2e-4), iters)
    return batch * iters / dt


def bench_hand3d(net, size=256, batch=8, iters=20):
    from mmhand_tpu.hand3d import (Hand3DSystem, PipelineConfig,
                                   derive_batch)
    from scripts.train_hand3d import (pipeline_config_for,
                                      records_to_pipeline_batch,
                                      synthetic_records)

    class _Args:
        crop_size = size

    cfg = pipeline_config_for(net, (size, size), _Args)
    cfg = PipelineConfig(**{**cfg.__dict__, "crop_size": size})
    raw = records_to_pipeline_batch(synthetic_records(batch, size, 0))
    batch_d = jax.device_get(derive_batch(raw, cfg, jax.random.PRNGKey(0)))
    batch_d = jax.tree.map(jnp.asarray, batch_d)

    system = Hand3DSystem(net=net, crop_size=size)
    state = system.init_state(jax.random.PRNGKey(0), (size, size))
    step = jax.jit(system.make_train_step(), donate_argnums=(0,))
    dt = _time_steps(step, state, (batch_d,), iters)
    return batch * iters / dt


BENCHES = {
    "hpe": bench_hpe,
    "posenet": lambda: bench_hand3d("posenet"),
    "handsegnet": lambda: bench_hand3d("handsegnet"),
    "lifting": lambda: bench_hand3d("lifting"),
}


def main(argv):
    names = argv or list(BENCHES)
    unknown = [n for n in names if n not in BENCHES]
    if unknown:
        print(f"usage: python tools/bench_secondary.py [{' '.join(BENCHES)}]")
        return 2
    for name in names:
        rate = BENCHES[name]()
        print(json.dumps({
            "metric": f"{name}_train_images_per_sec_per_chip_256px",
            "value": round(rate, 2), "unit": "img/s/chip"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

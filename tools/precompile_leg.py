"""AOT-precompile one A/B leg's full train step into the persistent cache.

    python tools/precompile_leg.py <leg-name>

Uses jax.eval_shape + jit(...).lower(...).compile() so the 1GB+ train state
stays abstract; the remote TPU compiler does the heavy work.  Note the
process still touches the single-tenant chip: init_vgg runs a real (tiny)
init, and PJRT compile() loads the executable onto the device — so run
precompiles only while no foreground measurement is active.  The compiled
executable lands in the persistent compile cache (utils/runtime.py), so the
subsequent tools/stem_ab_oneproc.py measurement pass loads it in seconds.

The traced program must hash identically to the one the measurement pass
traces: same Config, batch, arg avals, donate_argnums (cache key = HLO +
compile options).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp
import numpy as np

from tools.stem_ab_oneproc import LEGS, KNOB_KEYS


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in LEGS:
        print(f"usage: python tools/precompile_leg.py <leg>\n"
              f"valid legs: {sorted(LEGS)}", file=sys.stderr)
        raise SystemExit(2)
    name = sys.argv[1]
    batch = 16
    for k in KNOB_KEYS:
        os.environ.pop(k, None)
    os.environ.update(LEGS[name])

    from mmhand_tpu.config import Config
    from mmhand_tpu.train import MMHandSystem, make_train_step

    cfg = Config()
    system = MMHandSystem(cfg)

    state_shape = jax.eval_shape(
        lambda: system.init_state(jax.random.PRNGKey(0),
                                  local_batch_size=batch))
    # The measurement pass closes the step over CONCRETE vgg params, whose
    # values are baked into the HLO as constants — init them for real with
    # the same deterministic key (tiny: relu1_2 prefix, ~KBs of HBM) so the
    # cache key matches.  The 1GB+ train state stays abstract (eval_shape).
    vgg = system.make_l1_loss(None).init_vgg(
        jax.random.PRNGKey(1), (1, 256, 256, 3))
    l1 = system.make_l1_loss(vgg)
    step = jax.jit(make_train_step(system, l1), donate_argnums=(0,))

    data_shape = {k: jax.ShapeDtypeStruct((batch, 256, 256, c), jnp.float32)
                  for k, c in [("H1", 3), ("H2", 3), ("D1", 3), ("D2", 3),
                               ("P1", 21), ("P2", 21)]}
    t0 = time.perf_counter()
    lowered = step.lower(state_shape, data_shape, 2e-4)
    lowered.compile()
    print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()

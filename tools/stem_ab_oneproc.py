"""One-process full-step A/B matrix for the r3 perf knobs.

Same trusted methodology as bench.py (state-threaded full-program timing,
20 iters after a warmup/compile step) but runs every variant in ONE python
process: the env knobs are read at model-build / trace time, so setting
os.environ between legs and rebuilding the system re-traces with the new
implementation while the backend connection, PRNG setup, and the remote
compile channel stay warm (process startup + backend init is 1-2 min/leg
on the axon tunnel — the bash matrix tools/stem_ab.sh pays it 10x).

    python tools/stem_ab_oneproc.py [out.json] [leg ...]

Legs default to the full tools/stem_ab.sh matrix.  Each leg's result is
appended to the JSON file as it lands, so a timeout mid-matrix keeps the
completed legs.
"""

from __future__ import annotations

import dataclasses
import json
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

# name -> env overrides, applied on top of the CURRENT ModelConfig
# defaults (then removed).  NOTE the r4 default flip: dstem_split is now
# False, so "control" == "nosplit" == the shipped configuration; "split"
# re-measures the r3 default for continuity.  up_* legs therefore now
# measure their composition WITH the nosplit winner.
LEGS = {
    "control": {},
    "split": {"MMHAND_DSTEM_SPLIT": "1"},
    "nosplit": {"MMHAND_DSTEM_SPLIT": "0"},
    "fused": {"MMHAND_G_STEM_FUSED": "1"},
    "fused_ds2d": {"MMHAND_G_STEM_FUSED": "1", "MMHAND_STEM_IMPL": "s2d"},
    "fusedbn": {"MMHAND_G_STEM_FUSED": "2"},
    "bnstats": {"MMHAND_BN_STATS": "dot"},
    "bnpallas": {"MMHAND_BN_STATS": "pallas"},
    "fusedbn_dot": {"MMHAND_G_STEM_FUSED": "2", "MMHAND_BN_STATS": "dot"},
    "up_d2s": {"MMHAND_UPCONV_SHUFFLE": "d2s"},
    "up_conv4": {"MMHAND_UPCONV_SHUFFLE": "conv4"},
    "pre_r3b": {"MMHAND_DSTEM_SPLIT": "0", "MMHAND_G_STEM_FUSED": "0"},
    # Config-field legs ("cfg.<path>" keys are applied to Config() instead
    # of the environment).  zeropad measures the reference's own
    # --padding_type zero flag (base_options.py accepts reflect|replicate|
    # zero) — same flag surface, cheaper padding semantics — as the
    # documented fast preset.
    "zeropad": {"cfg.model.padding_type": "zero"},
}

KNOB_KEYS = sorted({k for env in LEGS.values() for k in env
                    if not k.startswith("cfg.")})


def run_leg(env: dict, batch: int = 16, iters: int = 20) -> float:
    from mmhand_tpu.config import Config
    from mmhand_tpu.train import MMHandSystem, make_train_step

    for k in KNOB_KEYS:
        os.environ.pop(k, None)
    os.environ.update({k: v for k, v in env.items()
                       if not k.startswith("cfg.")})

    cfg = Config()
    for key, value in env.items():
        if key.startswith("cfg."):
            # Config dataclasses are frozen: rebuild the chain of nodes
            # from the leaf outward with dataclasses.replace.
            path = key[len("cfg."):].split(".")
            nodes = [cfg]
            for p in path[:-1]:
                nodes.append(getattr(nodes[-1], p))
            for attr, node in zip(reversed(path), reversed(nodes)):
                value = dataclasses.replace(node, **{attr: value})
            cfg = value
    system = MMHandSystem(cfg)
    state = system.init_state(jax.random.PRNGKey(0), local_batch_size=batch)
    vgg = system.make_l1_loss(None).init_vgg(
        jax.random.PRNGKey(1), (1, 256, 256, 3))
    l1 = system.make_l1_loss(vgg)
    step = jax.jit(make_train_step(system, l1), donate_argnums=(0,))

    rng = np.random.RandomState(0)
    data = {k: jnp.asarray(
        rng.uniform(-1, 1, (batch, 256, 256, c)).astype(np.float32))
        for k, c in [("H1", 3), ("H2", 3), ("D1", 3), ("D2", 3),
                     ("P1", 21), ("P2", 21)]}

    state, metrics = step(state, data, 2e-4)  # warmup / compile
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data, 2e-4)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    del state, data, metrics, step  # free device HBM before the next leg
    return batch * iters / dt


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stem_ab_oneproc.json"
    names = sys.argv[2:] or list(LEGS)
    unknown = [n for n in names if n not in LEGS]
    if unknown:
        print(f"unknown leg(s) {unknown}; valid: {sorted(LEGS)}",
              file=sys.stderr)
        raise SystemExit(2)

    # The watcher launches this right when the chip returns — the
    # highest-risk window for a flapping backend; a hang inside backend
    # init would wedge the whole matrix.  Probe from a killable
    # subprocess first (same guard as bench.py).
    from bench import _wait_for_backend
    _wait_for_backend()

    # Merge with prior results so a resume run (subset of legs after a
    # timeout) does not clobber already-completed legs.
    results = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                results = json.load(f)
        except (json.JSONDecodeError, OSError):
            results = {}
    for name in names:
        t0 = time.perf_counter()
        ips = run_leg(LEGS[name])
        wall = time.perf_counter() - t0
        results[name] = round(ips, 2)
        print(json.dumps({"leg": name, "img_per_sec": round(ips, 2),
                          "leg_wall_s": round(wall, 1)}), flush=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

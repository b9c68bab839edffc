"""Benchmark: 256px GAN training throughput (images/sec/chip).

Runs the FULL flagship train step — 9-block ngf-64 generator forward+backward,
both discriminators with pool replay, L1+VGG(relu1_2) perceptual loss, three
Adam updates — at 256x256 on the available device(s), and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
north-star target is >5x a PyTorch V100 per-chip baseline.  Until a measured
V100 number exists we report vs_baseline against a documented estimate of
the reference's per-V100 throughput for this workload (see ESTIMATED_*
below), so the ratio is comparable across rounds.
"""

from __future__ import annotations

import json
import time

from mmhand_tpu.utils.runtime import setup_runtime

setup_runtime()  # fast PRNG + persistent compile cache

import jax
import jax.numpy as jnp
import numpy as np

# Estimated reference throughput: PyTorch 1.4 + APEX O1 on one V100 for the
# same step.  No published number exists (BASELINE.md), so the anchor is
# FLOP-bounded instead of guessed: the full step costs ~2.45 TFLOP/image
# (measured on this implementation: 39.3 TF / 16 images — same architecture,
# so the same arithmetic for torch).  A V100 peaks at 125 TFLOP/s fp16;
# PyTorch 1.4 + APEX O1 CNN workloads without channels_last typically
# sustain 30-50% of peak (37-62 TFLOP/s), bounding the reference at
# ~15-25 img/s.  The anchor sits at the midpoint; vs_baseline is therefore
# accurate within about +/-25%, and stays a stable cross-round ratio.
#
# Cross-checked r4 (tools/torch_cpu_anchor.py): running the reference's OWN
# torch nets for one optimize_parameters step under torch.profiler counts
# 2.561 TFLOP/image at 256px (within 4.5% of the 2.45 used here), and the
# same step sustains 50.4% of this host CPU's measured GEMM peak — mid-band
# of the 30-50% sustained-fraction assumption above.  Derivation chain in
# BASELINE.md "V100 anchor validation".
ESTIMATED_REFERENCE_IMG_PER_SEC_V100 = 20.0


def main():
    from mmhand_tpu.config import Config
    from mmhand_tpu.train import MMHandSystem, make_train_step

    cfg = Config()  # flagship: 256px, ngf64, 9 blocks, pool 50
    batch = 16

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

    # warmup / compile
    state, metrics = step(state, data, 2e-4)
    jax.block_until_ready(metrics)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data, 2e-4)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    n_chips = 1  # single-chip bench (state/step are single-device here)
    img_per_sec_per_chip = batch * iters / dt / n_chips
    print(json.dumps({
        "metric": "gan_train_images_per_sec_per_chip_256px",
        "value": round(img_per_sec_per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(
            img_per_sec_per_chip / ESTIMATED_REFERENCE_IMG_PER_SEC_V100, 2),
    }))


def _wait_for_backend(attempts: int = 4, probe_timeout: int = 240) -> None:
    """Bounded wait for the TPU backend.

    A mid-outage axon plugin hangs indefinitely inside backend init (no
    exception), which would wedge the whole bench process.  Probe from a
    SUBPROCESS (killable even when the hang is inside a C extension); only
    after a probe succeeds does this process touch the backend.  Exits 3
    with a diagnostic if the backend stays unreachable.
    """
    import os
    import subprocess
    import sys

    attempts = int(os.environ.get("MMHAND_BENCH_PROBES", attempts))
    probe_timeout = int(os.environ.get("MMHAND_BENCH_PROBE_TIMEOUT",
                                       probe_timeout))
    code = "import jax; d = jax.devices(); print(d[0].platform)"
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                return
            err = r.stderr.decode()[-300:]
        except subprocess.TimeoutExpired:
            err = f"backend init hung >{probe_timeout}s"
        print(f"bench: backend probe {i + 1}/{attempts} failed: {err}",
              file=sys.stderr)
    print(json.dumps({"error": "TPU backend unreachable",
                      "metric": "gan_train_images_per_sec_per_chip_256px"}))
    raise SystemExit(3)


if __name__ == "__main__":
    _wait_for_backend()
    main()

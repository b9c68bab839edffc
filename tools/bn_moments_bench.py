"""Isolated chip microbench: BN statistic formulations at the real sites.

Compares per-call wall time of the three ModelConfig.bn_stats methods on
the 8 stem-resolution shapes the r3 xplane profile flagged (the
convert_reduce_fusion ops at 2-4.7 ms each vs ~0.2 ms HBM roofline;
BASELINE.md "Per-op profile").  Isolated numbers are INDICATIVE only on
the axon tunnel (BASELINE.md measurement gotchas) — adoption decisions
use the full-step leg (tools/stem_ab_oneproc.py bnpallas) — but this
catches a kernel that is outright slow before burning a full A/B leg.

Methodology per the gotchas: iterations chain through the previous output
(x = x * (1 + eps*mean)), values kept finite, f32 accumulation.

    python tools/bn_moments_bench.py [iters]
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp
import numpy as np

from mmhand_tpu.ops.bn_stats import bn_moments

# the 8 full-res BN sites at 256px batch 16 (3 G stems C=64 post-concat
# handled as one C=192 site when fused; measured here per-stream) plus the
# D stems
SHAPES = [
    ("g_stem", (16, 256, 256, 64)),
    ("d_stem", (16, 256, 256, 64)),
    ("g_up", (16, 128, 128, 128)),
]


def chained(fn, x, iters):
    """Time iters calls of fn(x), threading a SCALAR through the calls
    (data dependence without an x-sized fold pass; finite via tanh)."""

    def body(s, x):
        mu, mu2 = fn(x)
        return s + 1e-6 * jnp.tanh(mu.mean() + mu2.mean())

    run = jax.jit(body)
    s = run(jnp.float32(0.0), x)  # compile
    _ = float(s)  # D2H fetch: true sync on the axon tunnel
    t0 = time.perf_counter()
    for _i in range(iters):
        s = run(s, x)
    _ = float(s)
    return (time.perf_counter() - t0) / iters


def reduce_moments(x):
    xf = x.astype(jnp.float32)
    return xf.mean((0, 1, 2)), (xf * xf).mean((0, 1, 2))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"backend={jax.default_backend()} iters={iters}", flush=True)
    for name, shape in SHAPES:
        x = jnp.asarray(
            np.random.RandomState(0).normal(size=shape), jnp.bfloat16)
        nbytes = x.size * 2
        roofline_us = nbytes / 819e9 * 1e6  # v5e ~819 GB/s
        row = {"site": name, "shape": shape,
               "roofline_us": round(roofline_us, 1)}
        for method, fn in [
                ("reduce", reduce_moments),
                ("dot", partial(bn_moments, method="dot")),
                ("pallas", partial(bn_moments, method="pallas"))]:
            dt = chained(fn, x, iters)
            row[method + "_us"] = round(dt * 1e6, 1)
        print(row, flush=True)


if __name__ == "__main__":
    main()

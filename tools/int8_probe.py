"""Chip probe: does XLA:TPU lower s8 x s8 -> s32 convolutions natively,
and at what rate vs bf16, on the discriminator's conv shapes?

Feasibility scout for the opt-in int8 D-phase experiment (CLAUDE.md r3
"untried ideas"; VERDICT r3 item 2).  The D phases cost ~74 ms/step
(BASELINE.md timeline); v5e int8 MXU peak is 2x bf16 (394 vs 197 TOPS),
so int8 forward convs could in principle halve the D-forward share.  This
probe answers, per representative D conv shape:

1. does `lax.conv_general_dilated(int8, int8, preferred_element_type=
   int32)` compile for TPU at all (vs an UNSUPPORTED crash / silent
   upcast)?
2. measured rate vs the same conv in bf16 (chained scalar dependence,
   finite values — BASELINE.md measurement gotchas).

    python tools/int8_probe.py [iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# (name, NHWC input, HWIO kernel, stride): the D stem, one downsample,
# one interior 3x3 (the bulk of D FLOPs at 64x64x256)
SHAPES = [
    ("d_stem7", (16, 262, 262, 24), (7, 7, 24, 64), 1),
    ("d_down0", (16, 258, 258, 64), (3, 3, 64, 128), 2),
    ("d_res3x3", (16, 66, 66, 256), (3, 3, 256, 256), 1),
]

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def conv(x, k, stride, acc):
    return lax.conv_general_dilated(
        x, k, (stride, stride), "VALID",
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")),
        preferred_element_type=acc)


def timed(x, k, stride, acc, iters):
    """Chain the LARGE tensor through the iterations — a scalar chain is
    not enough on the axon tunnel (fictitious sub-roofline timings; see
    BASELINE.md measurement gotchas).  The x-update costs one extra
    x-sized HBM pass (~0.1-0.2 ms), reported separately as chain_ms via a
    conv-free control so callers can subtract."""

    def body(x, k):
        y = conv(x, k, stride, acc)
        f = jnp.tanh(y.astype(jnp.float32).mean() * 1e-6)
        if x.dtype == jnp.int8:
            # keep int8 values exactly (avoid drifting to zeros): flip
            # sign on a data-dependent scalar instead of scaling
            return jnp.where(f > 1.0, -x, x)
        return (x * (1.0 + 1e-6 * f)).astype(x.dtype)

    def chain_only(x, k):
        f = jnp.tanh(x.astype(jnp.float32)[0, 0, 0, :4].mean() * 1e-6)
        if x.dtype == jnp.int8:
            return jnp.where(f > 1.0, -x, x)
        return (x * (1.0 + 1e-6 * f)).astype(x.dtype)

    def run_loop(fn, x, k):
        # True sync on the axon tunnel needs a D2H scalar fetch —
        # block_until_ready alone signals ~one program early (measured:
        # a 39 ms scan read as 0.17 ms without the fetch)
        r = jax.jit(fn)
        x = r(x, k)
        _ = np.asarray(x[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            x = r(x, k)
        _ = np.asarray(x[0, 0, 0, 0])
        return (time.perf_counter() - t0) / iters

    base = run_loop(chain_only, x, k)
    full = run_loop(body, x, k)
    return max(full - base, 1e-9), base


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    print(f"backend={jax.default_backend()} iters={iters}", flush=True)
    rng = np.random.RandomState(0)
    for name, xs, ks, stride in SHAPES:
        ho = (xs[1] - ks[0]) // stride + 1
        flops = 2 * xs[0] * ho * ho * ks[0] * ks[1] * ks[2] * ks[3]
        row = {"shape": name, "gflop": round(flops / 1e9, 1)}
        xb = jnp.asarray(rng.normal(size=xs), jnp.bfloat16)
        kb = jnp.asarray(rng.normal(size=ks) * 0.05, jnp.bfloat16)
        dt, base = timed(xb, kb, stride, jnp.float32, iters)
        row["bf16_ms"] = round(dt * 1e3, 3)
        row["bf16_chain_ms"] = round(base * 1e3, 3)
        row["bf16_tfs"] = round(flops / dt / 1e12, 1)
        xi = jnp.asarray(rng.randint(-127, 128, xs), jnp.int8)
        ki = jnp.asarray(rng.randint(-127, 128, ks), jnp.int8)
        try:
            dt, base = timed(xi, ki, stride, jnp.int32, iters)
            row["int8_ms"] = round(dt * 1e3, 3)
            row["int8_chain_ms"] = round(base * 1e3, 3)
            row["int8_tops"] = round(flops / dt / 1e12, 1)
        except Exception as e:  # noqa: BLE001 — report, keep probing
            row["int8_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(row, flush=True)


if __name__ == "__main__":
    main()

"""Micro-benchmarks of the hot ops at MM-Hand shapes: answers 'what does a
single conv/BN/dropout/reflect-variant cost on this chip', to locate where
the full step's MXU headroom goes.

Usage: python tools/microbench.py [--batch 16]
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


def bench(fn, *args, iters=50):
    """NOTE (axon): two timing hazards, both verified on-chip.
    1. Chain each iteration's input through the previous output — the
       backend pipelines aggressively and a loop of independent dispatches
       measures dispatch latency, not execution.
    2. Keep values FINITE: once a chained value goes NaN/Inf,
       block_until_ready returns early and timings become garbage
       (observed 13,000 'TF/s').  Scale weights so activations stay
       bounded."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        args = (out,) + args[1:]
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    b = args.batch
    rng = np.random.RandomState(0)

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.uniform(-1, 1, shape), dtype)

    results = []

    def report(name, dt, flops=None, bytes_moved=None):
        line = f"{name:44s} {dt*1e3:8.3f} ms"
        if flops:
            line += f"  {flops/dt/1e12:6.1f} TF/s"
        if bytes_moved:
            line += f"  {bytes_moved/dt/1e9:6.0f} GB/s"
        results.append(line)
        print(line, flush=True)

    def pad_modes(k_size, pad):
        """Same-shaped reflect-conv variants, all (x, k) -> x-shaped out
        so iterations chain (see bench)."""
        from mmhand_tpu.ops.reflect_conv import conv_reflect

        lo = pad

        def zero(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((lo, lo), (lo, lo)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def refl_border(x, k):
            return conv_reflect(x, k)

        def refl_jnp_pad(x, k):
            xp = jnp.pad(x, [(0, 0), (lo, lo), (lo, lo), (0, 0)],
                         mode="reflect")
            return jax.lax.conv_general_dilated(
                xp, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def refl_concat(x, k):
            xp = jnp.concatenate(
                [x[:, 1:lo + 1][:, ::-1], x, x[:, -lo - 1:-1][:, ::-1]],
                axis=1)
            xp = jnp.concatenate(
                [xp[:, :, 1:lo + 1][:, :, ::-1], xp,
                 xp[:, :, -lo - 1:-1][:, :, ::-1]], axis=2)
            return jax.lax.conv_general_dilated(
                xp, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        return [("zeropad", zero), ("reflect-border", refl_border),
                ("reflect-jnp.pad", refl_jnp_pad),
                ("reflect-concat", refl_concat)]

    # --- 3x3 512->512 at PATBlock shape (chainable: same in/out shape);
    # weights scaled so the 50-deep chain keeps finite activations
    x = mk((b, 64, 64, 512))
    k = mk((3, 3, 512, 512)) * 0.02
    fl = 2 * b * 64 * 64 * 9 * 512 * 512
    for name, fn in pad_modes(3, 1):
        dt = bench(jax.jit(fn), x, k)
        report(f"conv3x3 512->512 @64 {name}", dt, fl)

    # --- 7x7 64->64 at 256px (stem-like, chainable)
    xs = mk((b, 256, 256, 64))
    ks = mk((7, 7, 64, 64)) * 0.017
    fls = 2 * b * 256 * 256 * 49 * 64 * 64
    for name, fn in pad_modes(7, 3):
        dt = bench(jax.jit(fn), xs, ks)
        report(f"conv7x7 64->64 @256 {name}", dt, fls)

    # --- elementwise at PATBlock shape (all chain through arg 0)
    big = mk((b, 64, 64, 512))
    nbytes = big.size * 2

    @jax.jit
    def drop(x, key):
        keep = jax.random.bernoulli(key, 0.5, x.shape)
        return jnp.where(keep, x / 0.5, 0)

    dt = bench(drop, big, jax.random.PRNGKey(0))
    report("dropout @(16,64,64,512)", dt, None, 3 * nbytes)

    from flax import linen as nn

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.bfloat16, param_dtype=jnp.float32)
    bnv = bn.init(jax.random.PRNGKey(0), big)

    @jax.jit
    def bn_fwd(x, v):
        return bn.apply(v, x, mutable=["batch_stats"])[0]

    dt = bench(bn_fwd, big, bnv)
    report("batchnorm train @(16,64,64,512)", dt, None, 4 * nbytes)

    @jax.jit
    def sigmul(a, b2, c):
        return a * jax.nn.sigmoid(b2) * jax.nn.sigmoid(c)

    dt = bench(sigmul, big, big, big)
    report("att product a*sig(b)*sig(c)", dt, None, 4 * nbytes)

    print("\n".join(["", "== summary =="] + results))


if __name__ == "__main__":
    main()

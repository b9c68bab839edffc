"""On-chip A/B of the s2d stem-conv reformulations (ops/s2d_conv.py)
against XLA's direct lowering, at the exact shapes the xplane profile
flagged as MXU-starved (tools/xplane_report.py, r3).

Chained timings per tools/microbench.py rules: fwd chains
x <- x * (1 + 0*mean(y)); bwd chains x <- x - 1e-6 * dx (keeps values
finite and forces real execution).

Usage: python tools/s2d_experiments.py [--batch 16] [--iters 30]
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

from mmhand_tpu.ops import s2d_conv as s2d


def bench(fn, x, k, iters):
    # NOTE (axon): jax.block_until_ready(tuple) can return BEFORE the
    # computation finishes (measured 0.03 ms for a 3.1 ms conv chain);
    # block on the chained leaf itself.
    out = fn(x, k)
    out[1].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x, k)
        x = out[1]                      # chained next input
    x.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    b, iters = args.batch, args.iters
    rng = np.random.RandomState(0)

    def mk(shape, scale=1.0):
        return jnp.asarray(rng.uniform(-1, 1, shape) * scale, jnp.bfloat16)

    def direct(stride):
        def f(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (stride, stride), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return f

    def run_site(name, x, k, variants, flops):
        print(f"\n== {name}  x{tuple(x.shape)} k{tuple(k.shape)}")
        for vname, conv in variants:
            # Chains must change x's BITS every iteration: `0*mean(y)` gets
            # algebraically folded, and even real-dependency updates that
            # round back to identical bf16 values are served from cache by
            # the tunnel (measured 0.03 ms for a 2.2 TF conv).  A 3% decay
            # modulated by y keeps values drifting, finite, and dependent.
            def fwd(x, k, conv=conv):
                y = conv(x, k)
                s = jnp.tanh(jnp.mean(jnp.abs(y)).astype(jnp.float32))
                return y, x * (0.97 + 0.03 * s).astype(x.dtype)

            def bwd(x, k, conv=conv):
                def loss(x):
                    return jnp.mean(jnp.square(conv(x, k))).astype(
                        jnp.float32)
                l, dx = jax.value_and_grad(loss)(x)
                dxn = dx * jax.lax.rsqrt(
                    jnp.mean(jnp.square(dx)).astype(jnp.float32) + 1e-20
                ).astype(dx.dtype)
                return l, x * jnp.bfloat16(0.995) + jnp.bfloat16(0.01) * dxn

            tf_ = bench(jax.jit(fwd), x, k, iters)
            tb = bench(jax.jit(bwd), x, k, iters)
            print(f"  {vname:28s} fwd {tf_*1e3:7.2f} ms ({flops/tf_/1e12:5.1f}"
                  f" TF/s)   fwd+bwd {tb*1e3:7.2f} ms", flush=True)

    # --- 7x7 stems (pre-padded 262x262), small Cin
    for cin, label in [(24, "D_PB stem 24->64"), (6, "D_PP stem 6->64"),
                       (42, "G stream2 stem 42->64"),
                       (3, "G stream1 stem 3->64")]:
        x = mk((b, 262, 262, cin))
        k = mk((7, 7, cin, 64), 0.05)
        fl = 2 * b * 256 * 256 * 49 * cin * 64
        run_site(label, x, k, [
            ("direct", direct(1)),
            ("s2d f2", lambda x, k: s2d.conv_s2d(x, k, f=2)),
        ], fl)

    # --- out_conv 7x7 64->3 (pre-padded)
    x = mk((b, 262, 262, 64))
    k = mk((7, 7, 64, 3), 0.02)
    fl = 2 * b * 256 * 256 * 49 * 64 * 3
    run_site("G out_conv 64->3", x, k, [
        ("direct", direct(1)),
        ("d2s f2", lambda x, k: s2d.conv_d2s_out(x, k, f=2)),
        ("d2s f4", lambda x, k: s2d.conv_d2s_out(x, k, f=4)),
        ("d2s f8", lambda x, k: s2d.conv_d2s_out(x, k, f=8)),
    ], fl)

    # --- stride-2 downsamples (pre-padded by 1, zero)
    for (size, cin, cout, label) in [(256, 64, 128, "down0 64->128 @256"),
                                     (128, 128, 256, "down1 128->256 @128")]:
        x = mk((b, size + 2, size + 2, cin))
        k = mk((3, 3, cin, cout), 0.05)
        fl = 2 * b * (size // 2) ** 2 * 9 * cin * cout
        run_site(label, x, k, [
            ("direct s2", direct(2)),
            ("stride s2d", lambda x, k: s2d.conv_stride_s2d(x, k, 2)),
        ], fl)


if __name__ == "__main__":
    main()

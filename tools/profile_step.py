"""Step-timeline profiler: times the full GAN train step and ablations.

VERDICT r1 asked for an on-chip profile of the full step
(reference models/MMHandModel.py:310-330) with each remaining cost
accounted.  Rather than parsing xplane traces (no tensorboard profile
plugin in this image), this times jitted *ablations* — each variant
differs from the baseline in exactly one knob — plus isolated sub-programs
(G forward, G phase, one D phase, pool query, VGG loss) so every major
cost has a measured number.

Usage:  python tools/profile_step.py [--batch 16] [--iters 20]
Writes a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp
import numpy as np


def make_data(batch, size=256, seed=0):
    rng = np.random.RandomState(seed)
    return {k: jnp.asarray(
        rng.uniform(-1, 1, (batch, size, size, c)).astype(np.float32))
        for k, c in [("H1", 3), ("H2", 3), ("D1", 3), ("D2", 3),
                     ("P1", 21), ("P2", 21)]}


def time_fn(fn, *args, iters=20, donate_state=False):
    """Run fn(*args) -> (state, out) or out; returns sec/iter."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    res = args
    for _ in range(iters):
        out = fn(*args)
        if donate_state:
            args = (out[0],) + args[1:]
    jax.block_until_ready(out)
    del res
    return (time.perf_counter() - t0) / iters


def build(cfg_overrides=None, vgg=True):
    from mmhand_tpu.config import Config
    from mmhand_tpu.train import MMHandSystem, make_train_step

    cfg = Config()
    for path, val in (cfg_overrides or {}).items():
        obj = cfg
        *parents, leaf = path.split(".")
        for p in parents[:-1]:
            obj = getattr(obj, p)
        sub = getattr(obj, parents[-1]) if parents else cfg
        new_sub = dataclasses.replace(sub, **{leaf: val})
        if parents:
            object.__setattr__(obj, parents[-1], new_sub)
        else:
            cfg = new_sub
    system = MMHandSystem(cfg)
    l1 = None
    if vgg and cfg.loss.l1_type != "origin":
        vvars = system.make_l1_loss(None).init_vgg(
            jax.random.PRNGKey(1), (1, 256, 256, 3))
        l1 = system.make_l1_loss(vvars)
    step = jax.jit(make_train_step(system, l1))
    return cfg, system, l1, step


VARIANTS = {
    "base": ("full step (baseline)", None, True),
    "pool0": ("pool_size=0", {"optim.pool_size": 0}, True),
    "nodrop": ("no dropout", {"model.use_dropout_g": False}, True),
    "zeropad": ("zero padding", {"model.padding_type": "zero"}, True),
    "novgg": ("plain L1 (no VGG)", {"loss.l1_type": "origin"}, False),
    "gonly": ("dg_ratio=0 (G phase only)", {"optim.dg_ratio": 0}, True),
    "instnorm": ("instance norm", {"model.norm": "instance"}, True),
    "remat": ("PATBlock remat (save conv outs)", {"model.g_remat": True},
              True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", type=str, default="base",
                    help=f"comma list of {list(VARIANTS)} and/or 'parts'")
    args = ap.parse_args()
    b = args.batch
    data = make_data(b)
    rows = []

    def bench_variant(name, overrides=None, vgg=True):
        cfg, system, l1, step = build(overrides, vgg=vgg)
        state = system.init_state(jax.random.PRNGKey(0), local_batch_size=b)
        dt = time_fn(step, state, data, 2e-4, iters=args.iters)
        rows.append((name, dt, b / dt))
        print(f"  {name:42s} {dt*1e3:8.1f} ms  {b/dt:7.1f} img/s", flush=True)
        return dt

    print(f"batch={b} iters={args.iters} device={jax.devices()[0]}",
          flush=True)
    wanted = args.variants.split(",")
    base = None
    for key in wanted:
        if key == "parts":
            continue
        name, overrides, vgg = VARIANTS[key]
        dt = bench_variant(name, overrides, vgg)
        if key == "base":
            base = dt
    if "parts" not in wanted:
        print("\n| variant | ms/step | img/s |")
        print("|---|---|---|")
        for name, dt, ips in rows:
            print(f"| {name} | {dt*1e3:.1f} | {ips:.1f} |")
        return
    base = base or 1.0

    # isolated sub-programs
    from mmhand_tpu.train import MMHandSystem
    from mmhand_tpu.config import Config
    cfg = Config()
    system = MMHandSystem(cfg)
    state = system.init_state(jax.random.PRNGKey(0), local_batch_size=b)
    g_in = (data["H1"], jnp.concatenate([data["P1"], data["P2"]], -1),
            jnp.concatenate([data["D1"], data["D2"]], -1))

    @jax.jit
    def g_fwd(params, bs):
        out, _ = system.generator.apply(
            {"params": params, "batch_stats": bs}, g_in, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        return out

    dt = time_fn(g_fwd, state.g.params, state.g.batch_stats, iters=args.iters)
    rows.append(("G forward only", dt, b / dt))
    print(f"  {'G forward only':42s} {dt*1e3:8.1f} ms  {b/dt:7.1f} img/s")

    @jax.jit
    def g_fwd_bwd(params, bs):
        def loss(p):
            out, _ = system.generator.apply(
                {"params": p, "batch_stats": bs}, g_in, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.mean(jnp.abs(out - data["H2"]))
        return jax.grad(loss)(params)

    dt = time_fn(g_fwd_bwd, state.g.params, state.g.batch_stats,
                 iters=args.iters)
    rows.append(("G fwd+bwd (L1 head)", dt, b / dt))
    print(f"  {'G fwd+bwd (L1 head)':42s} {dt*1e3:8.1f} ms  {b/dt:7.1f} img/s")

    @jax.jit
    def d_fwd_bwd(params, bs):
        x = jnp.concatenate([data["H2"], data["P2"]], -1)

        def loss(p):
            out, _ = system.d_pb.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.mean(out * out)
        return jax.grad(loss)(params)

    dt = time_fn(d_fwd_bwd, state.d_pb.params, state.d_pb.batch_stats,
                 iters=args.iters)
    rows.append(("one D fwd+bwd (24ch)", dt, b / dt))
    print(f"  {'one D fwd+bwd (24ch)':42s} {dt*1e3:8.1f} ms  {b/dt:7.1f} img/s")

    from mmhand_tpu.train.pool import pool_query

    @jax.jit
    def pool_only(pool, batch, key):
        return pool_query(pool, batch, key)

    fake_pb = jnp.concatenate([data["H2"], data["P2"]], -1)
    dt = time_fn(pool_only, state.pool_pb, fake_pb, jax.random.PRNGKey(0),
                 iters=args.iters)
    rows.append(("pool query (27ch pool 50)", dt, b / dt))
    print(f"  {'pool query (27ch pool 50)':42s} {dt*1e3:8.1f} ms  {b/dt:7.1f} img/s")

    print("\n| variant | ms/step | img/s | delta vs base |")
    print("|---|---|---|---|")
    for name, dt, ips in rows:
        print(f"| {name} | {dt*1e3:.1f} | {ips:.1f} | "
              f"{(dt-base)*1e3:+.1f} ms |")


if __name__ == "__main__":
    main()

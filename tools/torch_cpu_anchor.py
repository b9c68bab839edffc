"""Validate the FLOP accounting behind bench.py's V100 anchor (VERDICT r3
item 7).

bench.py anchors `vs_baseline` to an ESTIMATED reference V100 throughput
derived from a FLOP count: ~2.45 TFLOP/image for the full GAN step at
256px.  This tool validates that count with an independent counter — the
reference's own PyTorch nets (imported from /root/reference, run not
copied) measured by torch.profiler's analytic FLOP counting — and times a
real reference-shaped `optimize_parameters` step on this host's CPU.

    python tools/torch_cpu_anchor.py [--size 64] [--batch 1] [--steps 1]

Derivation chain (documented in BASELINE.md):
1. torch.profiler(with_flops=True) counts FORWARD conv/matmul FLOPs only
   (convolution_backward reports 0), so the step total is assembled as
   3x the differentiated forward FLOPs (1 fwd + ~2x bwd for convs: grad-
   input + grad-weight) plus 1x the no-grad forwards (target-VGG).
2. Conv FLOPs in this fully-convolutional stack scale exactly with H*W,
   so the measurement at --size scales to 256px by (256/size)^2.
3. The same run wall-times the step and a pure f32 GEMM, giving this
   CPU's sustained-fraction datum for the "torch CNN workloads sustain
   30-50% of peak" assumption bounding the V100 estimate.

The perceptual trunk (torchvision vgg19 features[:4] in the reference,
losses/L1_plus_perceptualLoss.py:22-27) is rebuilt inline — torchvision
is absent in this environment; only layer SHAPES matter for FLOPs
(conv3-64, relu, conv64-64, relu = indices 0..3 at the default
--perceptual_layers 3).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/reference")

import torch
import torch.nn as tnn
import torch.nn.functional as F
from torch.profiler import ProfilerActivity, profile


def build_nets(size: int):
    from models.Discriminator import Discriminator as TorchD
    from models.Generator import Generator as TorchG

    g = TorchG([3, 42, 6], 3, 64, norm_layer=tnn.BatchNorm2d,
               use_dropout=True, n_blocks=9)
    # D_PB: H+P = 3+21 channels; D_PP: H+H = 6 (reference
    # MMHandModel.py:50-66); DG nets use n_blocks=3 there
    d_pb = TorchD(24, 64, norm_layer=tnn.BatchNorm2d, n_blocks=3)
    d_pp = TorchD(6, 64, norm_layer=tnn.BatchNorm2d, n_blocks=3)
    # vgg19 features[:4] shape-equivalent (see module docstring)
    vgg = tnn.Sequential(tnn.Conv2d(3, 64, 3, padding=1), tnn.ReLU(),
                         tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU())
    return g, d_pb, d_pp, vgg


def make_step(g, d_pb, d_pp, vgg, batch, size):
    """One reference-shaped optimize_parameters (MMHandModel.py:310-330):
    G fwd -> backward_G (L1 + perceptual + 2 GAN terms) -> G Adam step;
    then DG_ratio=1 step of each D on (real, detached fake)."""
    opt_g = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_pb = torch.optim.Adam(d_pb.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_pp = torch.optim.Adam(d_pp.parameters(), lr=2e-4, betas=(0.5, 0.999))

    h1 = torch.randn(batch, 3, size, size)
    h2 = torch.randn(batch, 3, size, size)
    p2 = torch.randn(batch, 21, size, size)
    pmap = torch.randn(batch, 42, size, size)
    dmap = torch.randn(batch, 6, size, size)

    def mse_vs(pred, val):
        return F.mse_loss(pred, torch.full_like(pred, val))

    def step():
        fake = g([h1, pmap, dmap])
        # backward_G (reference :236-261)
        opt_g.zero_grad()
        loss = (mse_vs(d_pb(torch.cat([fake, p2], 1)), 1.0)
                + mse_vs(d_pp(torch.cat([fake, h1], 1)), 1.0)) / 2.0
        loss = loss + 10.0 * F.l1_loss(fake, h2)
        with torch.no_grad():
            tgt_feat = vgg(h2)
        loss = loss + 10.0 * F.l1_loss(vgg(fake), tgt_feat)
        loss.backward()
        opt_g.step()
        # D phases (reference backward_D_basic :263-274), DG_ratio=1
        fake_d = fake.detach()
        for d, opt, real in ((d_pb, opt_pb, torch.cat([h2, p2], 1)),
                             (d_pp, opt_pp, torch.cat([h1, h1], 1))):
            opt.zero_grad()
            d_loss = (mse_vs(d(real), 1.0)
                      + mse_vs(d(torch.cat([fake_d[:, :3], real[:, 3:]], 1)),
                               0.0)) * 0.5
            d_loss.backward()
            opt.step()

    return step


def profiled_flops(step_fn):
    """(differentiated_fwd_flops, nograd_fwd_flops) for one step."""
    with profile(activities=[ProfilerActivity.CPU], with_flops=True) as p:
        step_fn()
    total = sum(e.flops for e in p.key_averages() if e.flops)
    return total


def gemm_peak_gflops(n: int = 1024, iters: int = 20) -> float:
    a = torch.randn(n, n)
    b = torch.randn(n, n)
    torch.mm(a, b)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        a = torch.mm(a, b)
        a = a / a.abs().max()  # keep finite, chain the dependency
    dt = time.perf_counter() - t0
    return 2 * n ** 3 * iters / dt / 1e9


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=1)
    args = ap.parse_args()
    torch.manual_seed(0)

    g, d_pb, d_pp, vgg = build_nets(args.size)
    step = make_step(g, d_pb, d_pp, vgg, args.batch, args.size)

    step()  # warmup (allocator, thread pool)

    fwd_flops = profiled_flops(step)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    wall = (time.perf_counter() - t0) / args.steps

    # no-grad share: the target-VGG forward (2 convs at full res)
    b, s = args.batch, args.size
    vgg_fwd = 2 * 9 * (3 * 64 + 64 * 64) * s * s * b
    diff_fwd = fwd_flops - vgg_fwd
    step_flops = 3 * diff_fwd + vgg_fwd
    scale = (256 / s) ** 2
    tf_per_img_256 = step_flops * scale / b / 1e12

    gemm = gemm_peak_gflops()
    sustained = step_flops / wall / 1e9

    print(json.dumps({
        "size": s, "batch": b,
        "profiler_fwd_tflop": round(fwd_flops / 1e12, 4),
        "step_tflop_with_bwd": round(step_flops / 1e12, 4),
        "tflop_per_img_at_256px": round(tf_per_img_256, 3),
        "bench_py_claim_tflop_per_img": 2.45,
        "step_wall_s": round(wall, 2),
        "cpu_img_per_sec": round(b / wall, 4),
        "cpu_sustained_gflops": round(sustained, 1),
        "cpu_gemm_gflops": round(gemm, 1),
        "sustained_fraction_of_gemm": round(sustained / gemm, 3),
    }, indent=1))


if __name__ == "__main__":
    main()

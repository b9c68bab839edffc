#!/usr/bin/env python
"""Convert reference baseline-zoo torch checkpoints into flax variables.

Covers the judge generators of baselines/quantitative_on_benchmarks/
networks/networks.py: ResnetGenerator (:365-426), UnetGenerator (:486-588),
and PoseResNet (:801-990, loader lives in mmhand_tpu.models.baselines).
Layout contracts identical to tools/convert_mmhand_torch.py (conv
OIHW->HWIO; convT spatial-flip -> HWIO; BN -> scale/bias + batch_stats).

Parity verified numerically by tests/test_baseline_parity.py.
"""

from __future__ import annotations

import re

from convert_mmhand_torch import _TreeBuilder, _seq_layers, _strip_prefix


def convert_resnet_generator(sd, n_downsampling: int = 2) -> dict:
    """torch ResnetGenerator.state_dict -> mmhand_tpu ResnetGenerator
    variables.  Sequential layout (networks.py:390-419): pad, conv7, bn,
    relu, [conv3s2, bn, relu]*nd, ResnetBlock*n, [convT, bn, relu]*nd,
    pad, conv7, tanh."""
    sd = _strip_prefix(sd)
    tb = _TreeBuilder()
    top = _seq_layers(sd, "")
    convs = [i for i, kind in top if kind == "conv"]
    bns = [i for i, kind in top if kind == "bn"]

    tb.put_conv(sd, str(convs[0]), "in_conv", "PadConv_0")
    tb.put_bn(sd, str(bns[0]), "in_conv", "Norm_0", "BatchNorm_0")
    for d in range(n_downsampling):
        tb.put_conv(sd, str(convs[1 + d]), f"down{d}",
                    "StridedConv_0", "Conv_0")
        tb.put_bn(sd, str(bns[1 + d]), f"down{d}", "Norm_0", "BatchNorm_0")

    res_blocks = sorted({int(m.group(1)) for k in sd
                         for m in [re.match(r"^(\d+)\.conv_block\.", k)]
                         if m})
    for r, bidx in enumerate(res_blocks):
        prefix = f"{bidx}.conv_block"
        layers = _seq_layers(sd, prefix)
        rconvs = [i for i, kind in layers if kind == "conv"]
        rbns = [i for i, kind in layers if kind == "bn"]
        tb.put_conv(sd, f"{prefix}.{rconvs[0]}", f"res{r}",
                    "ConvNormRelu_0", "PadConv_0")
        tb.put_bn(sd, f"{prefix}.{rbns[0]}", f"res{r}",
                  "ConvNormRelu_0", "Norm_0", "BatchNorm_0")
        tb.put_conv(sd, f"{prefix}.{rconvs[1]}", f"res{r}", "PadConv_0")
        tb.put_bn(sd, f"{prefix}.{rbns[1]}", f"res{r}",
                  "Norm_0", "BatchNorm_0")

    # after the down convs: nd convT levels then the out conv
    for d in range(n_downsampling):
        ci = convs[1 + n_downsampling + d]
        tb.put_convt(sd, str(ci), f"up{d}")
        tb.put_bn(sd, str(bns[1 + n_downsampling + d]),
                  f"up{d}_norm", "BatchNorm_0")
    tb.put_conv(sd, str(convs[1 + 2 * n_downsampling]), "out_conv")
    return tb.variables()


def convert_unet_generator(sd, num_downs: int = 8) -> dict:
    """torch UnetGenerator.state_dict -> mmhand_tpu UnetGenerator variables.

    torch nests UnetSkipConnectionBlock Sequentials (networks.py:518-588):
    the key prefix of level L is 'model.' + 'model.<sub_idx>.' * L where
    sub_idx is the submodule position in each level's Sequential (1 for the
    outermost — [downconv, sub, ...]; 2/3 for middles — [relu, conv,
    (norm), sub, ...]).  Flax level names outer, lvl1, lvl2, lvl4,
    mid{i}..., inner (see UnetGenerator)."""
    sd = _strip_prefix(sd)
    # UnetGenerator.model -> outermost block -> block.model (Sequential):
    # two 'model.' levels wrap the top Sequential; strip until gone
    while sd and all(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    tb = _TreeBuilder()

    names = (["outer", "lvl1", "lvl2", "lvl4"]
             + [f"mid{i}" for i in reversed(range(num_downs - 5))]
             + ["inner"])
    # after _strip_prefix the outermost Sequential's keys are top-level:
    # outermost = [downconv(0), sub(1), uprelu, upconv(3), tanh]
    # middle    = [downrelu, downconv(1), downnorm(2), sub(3), uprelu,
    #              upconv(5), upnorm(6), (dropout)]
    # innermost = [downrelu, downconv(1), uprelu, upconv(3), upnorm(4)]
    prefix = ""
    for level, name in enumerate(names):
        layers = _seq_layers(sd, prefix.rstrip("."))
        convs = [i for i, kind in layers if kind == "conv"]
        bns = [i for i, kind in layers if kind == "bn"]
        tb.put_conv(sd, f"{prefix}{convs[0]}", name, "down")
        tb.put_convt(sd, f"{prefix}{convs[1]}", name, "up")
        outermost, innermost = level == 0, name == "inner"
        if innermost:
            tb.put_bn(sd, f"{prefix}{bns[0]}", name, "up_norm",
                      "BatchNorm_0")
        elif not outermost:
            tb.put_bn(sd, f"{prefix}{bns[0]}", name, "down_norm",
                      "BatchNorm_0")
            tb.put_bn(sd, f"{prefix}{bns[1]}", name, "up_norm",
                      "BatchNorm_0")
        if not innermost:
            sub_idx = 1 if outermost else 3
            prefix = f"{prefix}{sub_idx}.model."
    return tb.variables()

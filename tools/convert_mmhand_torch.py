#!/usr/bin/env python
"""Convert reference MM-Hand torch checkpoints (Generator / Discriminator
state_dicts, reference models/Generator.py + models/Discriminator.py) into
this framework's flax variable trees — enabling bit-for-bit reuse of models
trained with the original PyTorch code.

Works from either a live torch state_dict (dict of tensors) or an .npz dump
made by tools/convert_torch_weights.py `state_dict` mode.  Layout contracts:

  conv        OIHW -> HWIO
  conv-transpose (k3 s2 p1 op1)  (I, O, kh, kw) -> spatial-flip ->
              (kh, kw, I, O)   (see mmhand_tpu.models.layers.UpConv)
  batchnorm   weight/bias -> scale/bias; running_mean/var -> batch_stats

Parity is verified numerically by tests/test_torch_parity.py.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _to_np(v):
    # copy, not view: .numpy() aliases the torch storage, which in-place
    # optimizer steps mutate — a converted-live-state_dict tree must be a
    # snapshot (tests/test_torch_parity.py trains the torch twin afterwards)
    return (np.array(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.array(v))


def _conv(sd, key):
    return {"kernel": np.transpose(_to_np(sd[f"{key}.weight"]), (2, 3, 1, 0)),
            **({"bias": _to_np(sd[f"{key}.bias"])}
               if f"{key}.bias" in sd else {})}


def _convt(sd, key):
    w = _to_np(sd[f"{key}.weight"])          # (I, O, kh, kw)
    w = w[:, :, ::-1, ::-1]                   # spatial flip
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))}
    if f"{key}.bias" in sd:
        out["bias"] = _to_np(sd[f"{key}.bias"])
    return out


def _bn(sd, key):
    params = {"scale": _to_np(sd[f"{key}.weight"]),
              "bias": _to_np(sd[f"{key}.bias"])}
    stats = {"mean": _to_np(sd[f"{key}.running_mean"]),
             "var": _to_np(sd[f"{key}.running_var"])}
    return params, stats


def _seq_layers(sd, prefix):
    """Ordered (index, kind) of parameterized layers in a torch Sequential:
    kind 'bn' if running stats exist, else 'conv'.  Empty prefix addresses a
    top-level Sequential ('<i>.weight' keys)."""
    dot = f"{re.escape(prefix)}\\." if prefix else ""
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(rf"^{dot}(\d+)\.(weight|running_mean)",
                                      k)]
                   if m})
    base = f"{prefix}." if prefix else ""
    out = []
    for i in idxs:
        kind = "bn" if f"{base}{i}.running_mean" in sd else "conv"
        out.append((i, kind))
    return out


class _TreeBuilder:
    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def put_conv(self, sd, torch_key, *flax_path):
        node = self.params
        for p in flax_path[:-1]:
            node = node.setdefault(p, {})
        node[flax_path[-1]] = _conv(sd, torch_key)

    def put_convt(self, sd, torch_key, *flax_path):
        node = self.params
        for p in flax_path[:-1]:
            node = node.setdefault(p, {})
        leaf = _convt(sd, torch_key)
        node[flax_path[-1]].update(leaf) if flax_path[-1] in node else \
            node.__setitem__(flax_path[-1], leaf)

    def put_bn(self, sd, torch_key, *flax_path):
        p, s = _bn(sd, torch_key)
        node_p, node_s = self.params, self.stats
        for seg in flax_path[:-1]:
            node_p = node_p.setdefault(seg, {})
            node_s = node_s.setdefault(seg, {})
        node_p[flax_path[-1]] = p
        node_s[flax_path[-1]] = s

    def variables(self):
        return {"params": self.params, "batch_stats": self.stats}


def _strip_prefix(sd, candidates=("module.", "model.")):
    """Normalize DataParallel / PATNModel-wrapper prefixes: the reference
    saves Generator.model.* (Generator wraps PATNModel,
    reference Generator.py:302)."""
    sd = { (k[len("module."):] if k.startswith("module.") else k): v
           for k, v in sd.items()}
    if all(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    return sd


def convert_generator(sd, n_downsampling: int = 2) -> dict:
    """Reference 3-stream Generator state_dict -> flax variables for
    mmhand_tpu.models.Generator."""
    sd = _strip_prefix(sd)
    if any(k.startswith("model.") for k in sd):  # Generator.model.PATNModel
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}
    tb = _TreeBuilder()

    # stems: conv/bn pairs in order = [in, down0, down1, ...]
    for s in (1, 2, 3):
        prefix = f"stream{s}_down"
        layers = _seq_layers(sd, prefix)
        convs = [i for i, kind in layers if kind == "conv"]
        bns = [i for i, kind in layers if kind == "bn"]
        # PadConv holds its kernel directly; StridedConv wraps nn.Conv
        targets = ([(f"stream{s}_in", ("PadConv_0",))]
                   + [(f"stream{s}_down{d}", ("StridedConv_0", "Conv_0"))
                      for d in range(n_downsampling)])
        for (mod, tail), ci, bi in zip(targets, convs, bns):
            tb.put_conv(sd, f"{prefix}.{ci}", mod, *tail)
            tb.put_bn(sd, f"{prefix}.{bi}", mod, "Norm_0", "BatchNorm_0")

    # attention blocks
    blocks = sorted({int(m.group(1)) for k in sd
                     for m in [re.match(r"^att\.(\d+)\.", k)] if m})
    for b in blocks:
        for snum in (1, 2, 3):
            prefix = f"att.{b}.conv_block_stream{snum}"
            layers = _seq_layers(sd, prefix)
            convs = [i for i, kind in layers if kind == "conv"]
            bns = [i for i, kind in layers if kind == "bn"]
            stream = f"stream{snum}"
            tb.put_conv(sd, f"{prefix}.{convs[0]}", f"att{b}", stream,
                        "ConvNormRelu_0", "PadConv_0")
            tb.put_bn(sd, f"{prefix}.{bns[0]}", f"att{b}", stream,
                      "ConvNormRelu_0", "Norm_0", "BatchNorm_0")
            tb.put_conv(sd, f"{prefix}.{convs[1]}", f"att{b}", stream,
                        "PadConv_0")
            if len(bns) > 1:  # stream1 has a trailing norm (cal_att=False)
                tb.put_bn(sd, f"{prefix}.{bns[1]}", f"att{b}", stream,
                          "Norm_0", "BatchNorm_0")

    # upsampling: convT/bn per level then the final 7x7 conv
    prefix = "stream1_up"
    layers = _seq_layers(sd, prefix)
    convs = [i for i, kind in layers if kind == "conv"]
    bns = [i for i, kind in layers if kind == "bn"]
    for d in range(n_downsampling):
        tb.put_convt(sd, f"{prefix}.{convs[d]}", f"up{d}")
        tb.put_bn(sd, f"{prefix}.{bns[d]}", f"up{d}_norm", "BatchNorm_0")
    tb.put_conv(sd, f"{prefix}.{convs[n_downsampling]}", "out_conv")
    return tb.variables()


def convert_discriminator(sd, n_downsampling: int = 2) -> dict:
    """Reference Discriminator state_dict -> flax variables for
    mmhand_tpu.models.Discriminator."""
    sd = _strip_prefix(sd)
    tb = _TreeBuilder()
    layers = _seq_layers(sd, "")
    # the trunk Sequential is saved as '<idx>.weight' after prefix strip
    convs = [i for i, kind in layers if kind == "conv"]
    bns = [i for i, kind in layers if kind == "bn"]
    targets = ([("in_conv", ("PadConv_0",))]
               + [(f"down{d}", ("StridedConv_0", "Conv_0"))
                  for d in range(n_downsampling)])
    for (mod, tail), ci, bi in zip(targets, convs, bns):
        tb.put_conv(sd, f"{ci}", mod, *tail)
        tb.put_bn(sd, f"{bi}", mod, "Norm_0", "BatchNorm_0")

    res_blocks = sorted({int(m.group(1)) for k in sd
                         for m in [re.match(r"^(\d+)\.conv_block\.", k)]
                         if m})
    for r, block_idx in enumerate(res_blocks):
        prefix = f"{block_idx}.conv_block"
        layers = _seq_layers(sd, prefix)
        rconvs = [i for i, kind in layers if kind == "conv"]
        rbns = [i for i, kind in layers if kind == "bn"]
        tb.put_conv(sd, f"{prefix}.{rconvs[0]}", f"res{r}",
                    "ConvNormRelu_0", "PadConv_0")
        tb.put_bn(sd, f"{prefix}.{rbns[0]}", f"res{r}",
                  "ConvNormRelu_0", "Norm_0", "BatchNorm_0")
        tb.put_conv(sd, f"{prefix}.{rconvs[1]}", f"res{r}",
                    "PadConv_0")
        tb.put_bn(sd, f"{prefix}.{rbns[1]}", f"res{r}",
                  "Norm_0", "BatchNorm_0")
    return tb.variables()


def main():
    import sys

    import jax.numpy as jnp

    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    if src.endswith(".npz"):
        sd = dict(np.load(src))
    else:
        import torch
        sd = torch.load(src, map_location="cpu")
    variables = (convert_generator(sd) if kind == "generator"
                 else convert_discriminator(sd))
    import pickle
    with open(dst, "wb") as f:
        pickle.dump(variables, f)
    print(f"converted {kind} -> {dst}")


if __name__ == "__main__":
    main()

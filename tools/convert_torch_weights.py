#!/usr/bin/env python
"""Offline weight converter: torchvision / reference .pth -> .npz.

Run this in ANY environment that has torchvision (this TPU image does not —
zero egress), then copy the .npz files next to your checkpoints:

    python tools/convert_torch_weights.py vgg19 vgg19_features.npz
    python tools/convert_torch_weights.py inception inception_v3.npz
    python tools/convert_torch_weights.py state_dict some_net.pth out.npz

The npz keys are the torch state_dict keys verbatim; the flax-side loaders
(mmhand_tpu.models.vgg.load_vgg19_npz,
mmhand_tpu.models.inception.load_inception_npz) do the layout transposes.
"""

import sys

import numpy as np


def dump_state_dict(state_dict, out_path: str) -> None:
    arrays = {k: v.detach().cpu().numpy() for k, v in state_dict.items()
              if hasattr(v, "detach")}
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} arrays to {out_path}")


def main():
    kind = sys.argv[1]
    if kind == "vgg19":
        import torchvision.models as models
        vgg = models.vgg19(weights="IMAGENET1K_V1")
        sd = {f"features.{k}": v for k, v in
              vgg.features.state_dict().items()}
        dump_state_dict(sd, sys.argv[2])
    elif kind == "inception":
        import torchvision.models as models
        net = models.inception_v3(weights="IMAGENET1K_V1", aux_logits=True)
        sd = {k: v for k, v in net.state_dict().items()
              if not k.startswith("AuxLogits")}
        dump_state_dict(sd, sys.argv[2])
    elif kind == "state_dict":
        import torch
        sd = torch.load(sys.argv[2], map_location="cpu")
        # strip DataParallel 'module.' prefixes (reference hpe_estimator.py:149-160)
        sd = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in sd.items()}
        dump_state_dict(sd, sys.argv[3])
    else:
        raise SystemExit(f"unknown kind {kind}; use vgg19|inception|state_dict")


if __name__ == "__main__":
    main()

"""VGG19 feature extractor for the perceptual loss.

The reference truncates torchvision's pretrained `vgg19().features` at layer
index `--perceptual_layers` (default 3 = relu1_2)
(reference losses/L1_plus_perceptualLoss.py:22-30).  Here the architecture
is rebuilt in flax (NHWC, torch layer indices preserved in parameter names
so offline weight conversion is 1:1), truncated the same way.

Pretrained weights: this environment has no torchvision / network egress, so
ImageNet weights must be converted offline with
tools/convert_torch_weights.py into an .npz and passed via
``load_vgg19_npz``.  Without them the extractor falls back to fixed
random-init features — a random-projection perceptual loss; documented
divergence that keeps the training loop runnable anywhere.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# torchvision VGG19 'E' config: conv widths with 'M' maxpools between stages
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

# ImageNet renorm constants (reference L1_plus_perceptualLoss.py:40-52)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def torch_layer_sequence():
    """(torch_index, kind, width) sequence mirroring vgg19().features."""
    seq = []
    idx = 0
    for v in _VGG19_CFG:
        if v == "M":
            seq.append((idx, "pool", 0))
            idx += 1
        else:
            seq.append((idx, "conv", v))
            idx += 1
            seq.append((idx, "relu", 0))
            idx += 1
    return seq


class VGG19Features(nn.Module):
    """VGG19 features truncated at torch layer index `truncate_at`
    (inclusive, matching the reference's `if i == perceptual_layers: break`
    after adding layer i)."""

    truncate_at: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for idx, kind, width in torch_layer_sequence():
            if kind == "conv":
                x = nn.Conv(width, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{idx}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if idx == self.truncate_at:
                break
        return x.astype(jnp.float32)


def imagenet_renorm(img_m11):
    """[-1, 1] image -> ImageNet-normalized
    (reference L1_plus_perceptualLoss.py:54-58)."""
    x = (img_m11 + 1.0) / 2.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def load_vgg19_npz(path: str, truncate_at: int = 3):
    """Load converted torchvision weights (tools/convert_torch_weights.py)
    into the flax param tree.  npz keys: 'features.<i>.weight' (OIHW) and
    'features.<i>.bias'."""
    raw = np.load(path)
    params = {}
    for idx, kind, _w in torch_layer_sequence():
        if kind == "conv":
            wkey = f"features.{idx}.weight"
            if wkey not in raw:
                break
            w = raw[wkey]  # OIHW
            params[f"conv{idx}"] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
                "bias": jnp.asarray(raw[f"features.{idx}.bias"]),
            }
        if idx == truncate_at:
            break
    return {"params": params}

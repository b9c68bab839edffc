"""Inception-v3 for IS / FID evaluation.

Faithful flax reimplementation of the torchvision Inception3 architecture
(the reference vendors a torchvision copy for its on-GPU inception score,
reference baselines/quantitative_on_benchmarks/inception.py:27-430; no aux
head, as the reference constructs `inception_v3(..., aux_logits)` unused at
eval).  NHWC; module names match torch state_dict keys so
tools/convert_torch_weights.py converts 1:1.

Returns (logits[1000], pool[2048]): logits drive the Inception Score
(reference utils.py:196-232), pool features drive FID — **FID is absent
from the reference** (BASELINE.md) and required by the north star; this is
the deliberate addition.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicConv2d(nn.Module):
    """conv(no bias) + BN(eps=1e-3) + relu."""

    features: int
    kernel: tuple
    stride: int = 1
    padding: Any = 0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _avgpool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=d,
                         name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d,
                         name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d,
                         name="branch3x3dbl_3")(b3, train)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d,
                         name="branch_pool")(_avgpool3(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=d,
                         name="branch3x3")(x, train)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=d,
                         name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=d,
                         name="branch3x3dbl_3")(bd, train)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_5")(bd, train)
        bp = BasicConv2d(192, (1, 1), dtype=d,
                         name="branch_pool")(_avgpool3(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=d,
                         name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=d,
                         name="branch7x7x3_4")(b7, train)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x, train)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x, train)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                        name="branch3x3_2a")(b3, train),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                        name="branch3x3_2b")(b3, train)], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=d,
                         name="branch3x3dbl_2")(bd, train)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                        name="branch3x3dbl_3a")(bd, train),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                        name="branch3x3dbl_3b")(bd, train)], axis=-1)
        bp = BasicConv2d(192, (1, 1), dtype=d,
                         name="branch_pool")(_avgpool3(x), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class Inception3(nn.Module):
    """Input: NHWC 299x299 ImageNet-normalized; returns (logits, pool2048)."""

    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), stride=2, dtype=d,
                        name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=d,
                        name="Conv2d_2b_3x3")(x, train)
        x = _maxpool3s2(x)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x, train)
        x = _maxpool3s2(x)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x, train)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x, train)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x, train)
        x = InceptionB(dtype=d, name="Mixed_6a")(x, train)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x, train)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x, train)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x, train)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x, train)
        x = InceptionD(dtype=d, name="Mixed_7a")(x, train)
        x = InceptionE(dtype=d, name="Mixed_7b")(x, train)
        x = InceptionE(dtype=d, name="Mixed_7c")(x, train)
        pool = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc")(pool)
        return logits, pool


def load_inception_npz(path: str):
    """Load converted torchvision inception_v3 weights
    (tools/convert_torch_weights.py) into flax variables.

    npz keys are torch state_dict keys: '<Module>.conv.weight' (OIHW),
    '<Module>.bn.{weight,bias,running_mean,running_var}', 'fc.{weight,bias}'.
    """
    import numpy as np

    raw = np.load(path)
    params: dict = {}
    stats: dict = {}

    def put(tree, dotted, value):
        keys = dotted.split(".")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value)

    for key in raw.files:
        parts = key.split(".")
        if key.startswith("fc."):
            if parts[1] == "weight":
                put(params, "fc.kernel", np.transpose(raw[key], (1, 0)))
            else:
                put(params, "fc.bias", raw[key])
        elif parts[-2] == "conv" and parts[-1] == "weight":
            put(params, ".".join(parts[:-1]) + ".kernel",
                np.transpose(raw[key], (2, 3, 1, 0)))  # OIHW -> HWIO
        elif parts[-2] == "bn":
            prefix = ".".join(parts[:-1])
            if parts[-1] == "weight":
                put(params, prefix + ".scale", raw[key])
            elif parts[-1] == "bias":
                put(params, prefix + ".bias", raw[key])
            elif parts[-1] == "running_mean":
                put(stats, prefix + ".mean", raw[key])
            elif parts[-1] == "running_var":
                put(stats, prefix + ".var", raw[key])
    return {"params": params, "batch_stats": stats}


def inception_preprocess(images_m11, size: int = 299):
    """[-1,1] NHWC -> 299x299 ImageNet-normalized.

    Saner replacement for the reference's transforms pipeline, which feeds
    a [-1,1] float tensor through ToPILImage (u8 cast wraps negatives —
    reference utils.py:22-28 quirk NOT reproduced).
    """
    import jax
    x = (images_m11 + 1.0) / 2.0
    x = jax.image.resize(
        x, (x.shape[0], size, size, x.shape[-1]), method="bilinear")
    mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
    return (x - mean) / std

"""Depth/voxel baseline-zoo nets (the B5 tail).

Ports of the reference's four depth/voxel GAN baselines under
``baselines/quantitative_on_benchmarks/networks/``:

* ``DepthGenerator``      — reference net_depthgenerator.py:1-41: keypoint
  uv vector -> Linear -> 4x4x32 seed -> 5x ConvTranspose(k6,s2,p2) + BN +
  LeakyReLU(.2) to a 128x128 1-channel depth map.  NOTE the reference's
  final Tanh is commented out — the output head is BN+LeakyReLU
  (quirk preserved).
* ``DepthDiscriminator``  — reference net_depthdiscriminator.py:1-63: 1x1
  pixelGAN encoder with three heads: per-pixel real/fake logits, a
  21-channel heatmap predictor, and a flatten+MLP "hard" 63-dim keypoint
  regressor (Linear sized for 256px inputs, like the torch original).
  Quirks preserved: predictor/hard_predictor apply LeakyReLU BEFORE and
  AFTER their norm layer.
* ``VoxelGenerator``      — reference net_voxelgenerator.py:103-139: the
  V2V-PoseNet-style 3D hourglass (Basic/Res/Pool/Upsample 3D blocks +
  EncoderDecoder3D, reference networks/blocks.py:342-465) with a tanh
  1-channel voxel output.
* ``VoxelDiscriminator``  — reference net_voxeldiscriminator.py:1-55: four
  strided Conv3d+BN+LeakyReLU blocks 2ch -> 1ch.

No reference bench driver instantiates these (they are the zoo's tail —
VERDICT r4 missing #2); they are ported for inventory completeness with
torch forward-parity tests (tests/test_baseline_parity.py).

Layout: NHWC / NDHWC, f32 params; torch weight interchange via
``load_*_state_dict`` below (kernels OIHW/OIDHW -> HWIO/DHWIO, transposed
convs spatially flipped — same contracts as tools/convert_mmhand_torch.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mmhand_tpu.models.layers import UpConv

Dtype = Any


def _bn(dtype, name):
    """torch BatchNorm2d/3d defaults: eps 1e-5, momentum .1 (flax .9)."""
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype,
                        param_dtype=jnp.float32, name=name)


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


class _ConvT3D(nn.Module):
    """torch ConvTranspose3d(k, s, p=0, op=0) as an input-dilated conv
    (same lowering as layers.UpConv, NDHWC)."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, k, x.shape[-1], self.features),
                            jnp.float32)
        pad = (k - 1 - p, k - 1 - p)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1, 1), padding=(pad, pad, pad),
            lhs_dilation=(s, s, s),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _basic3d(x, features, kernel_size, dtype, prefix, train):
    """Conv3d(k, s=1, p=(k-1)//2) + BN + ReLU (reference blocks.py:372-383).
    Plain function so layers land in the caller's scope (flat torch-key
    naming for the weight converter)."""
    k = kernel_size
    x = nn.Conv(features, (k, k, k), padding=(k - 1) // 2, dtype=dtype,
                param_dtype=jnp.float32, name=f"{prefix}_block_0")(x)
    x = _bn(dtype, f"{prefix}_block_1")(x, use_running_average=not train)
    return nn.relu(x)


def _res3d(x, features, dtype, prefix, train):
    """Two 3x3x3 conv+BN with a (projected) skip (reference blocks.py:385-408)."""
    p = prefix
    res = nn.Conv(features, (3, 3, 3), padding=1, dtype=dtype,
                  param_dtype=jnp.float32, name=f"{p}_res_branch_0")(x)
    res = _bn(dtype, f"{p}_res_branch_1")(res, use_running_average=not train)
    res = nn.relu(res)
    res = nn.Conv(features, (3, 3, 3), padding=1, dtype=dtype,
                  param_dtype=jnp.float32, name=f"{p}_res_branch_3")(res)
    res = _bn(dtype, f"{p}_res_branch_4")(res, use_running_average=not train)
    if x.shape[-1] == features:
        skip = x
    else:
        skip = nn.Conv(features, (1, 1, 1), dtype=dtype,
                       param_dtype=jnp.float32, name=f"{p}_skip_con_0")(x)
        skip = _bn(dtype, f"{p}_skip_con_1")(
            skip, use_running_average=not train)
    return nn.relu(res + skip)


def _pool3d(x, k=2):
    """max_pool3d(k, k) (reference blocks.py:410-416)."""
    return nn.max_pool(x, (k, k, k), strides=(k, k, k))


def _upsample3d(x, features, kernel_size, stride, dtype, prefix, train):
    """ConvTranspose3d(k, s) + BN + ReLU (reference blocks.py:418-428)."""
    x = _ConvT3D(features, kernel_size, stride, dtype=dtype,
                 name=f"{prefix}_block_0")(x)
    x = _bn(dtype, f"{prefix}_block_1")(x, use_running_average=not train)
    return nn.relu(x)


class DepthGenerator(nn.Module):
    """Keypoints (B, 42) -> (B, 128, 128, 1) depth map
    (reference net_depthgenerator.py:5-30; n_layer=5, n_filter=32)."""

    n_layer: int = 5
    n_filter: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = self.n_filter
        x = nn.Dense(4 * 4 * nf, param_dtype=jnp.float32, dtype=self.dtype,
                     name="linear")(x.astype(self.dtype))
        # torch reshape(-1, 32, 4, 4) is channels-first; transpose to NHWC
        x = x.reshape((-1, nf, 4, 4)).transpose((0, 2, 3, 1))
        for i in range(self.n_layer):
            feats = 1 if i == self.n_layer - 1 else nf
            x = UpConv(feats, use_bias=True, kernel_size=6, stride=2,
                       padding=2, output_padding=0, dtype=self.dtype,
                       name=f"models_{i}_0")(x)
            x = _bn(self.dtype, f"models_{i}_1")(
                x, use_running_average=not train)
            x = _lrelu(x)
        # reference quirk: the Tanh is commented out — raw BN+LeakyReLU out
        return x.astype(jnp.float32)


class DepthDiscriminator(nn.Module):
    """1x1 pixelGAN with classification/heatmap/keypoint heads
    (reference net_depthdiscriminator.py:5-58).  `linear_hw` mirrors the
    torch Linear(1*256*256, 256) hard-coded input size."""

    input_nc: int = 1
    output_nc: int = 0
    ndf: int = 64
    n_keypoints: int = 21
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        conv1 = lambda f, name, bias=False: nn.Conv(
            f, (1, 1), use_bias=bias, dtype=d, param_dtype=jnp.float32,
            name=name)
        h = conv1(self.ndf, "encoder_0", bias=True)(x.astype(d))
        h = _lrelu(h)
        h = conv1(self.ndf * 2, "encoder_2")(h)
        h = _bn(d, "encoder_3")(h, use_running_average=not train)
        h = _lrelu(h)

        classification = conv1(1, "classifier")(h)

        p = conv1(self.n_keypoints, "predictor_0")(h)
        p = _lrelu(p)  # reference quirk: LeakyReLU both sides of the norm
        p = _bn(d, "predictor_2")(p, use_running_average=not train)
        heatmaps = _lrelu(p)

        q = conv1(1, "hard_predictor_0")(h)
        q = _lrelu(q)
        q = _bn(d, "hard_predictor_2")(q, use_running_average=not train)
        q = _lrelu(q)
        q = q.reshape((q.shape[0], -1))  # C=1: same order as torch flatten
        q = nn.Dense(256, dtype=d, param_dtype=jnp.float32,
                     name="hard_predictor_5")(q)
        keypoints = nn.Dense(63, dtype=d, param_dtype=jnp.float32,
                             name="hard_predictor_6")(q)
        return (classification.astype(jnp.float32),
                heatmaps.astype(jnp.float32), keypoints.astype(jnp.float32))


class VoxelGenerator(nn.Module):
    """V2V-style 3D hourglass voxel generator
    (reference net_voxelgenerator.py:103-139 + blocks.py:430-465).
    Input (B, D, H, W, 1) with D,H,W divisible by 8; tanh output."""

    output_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        x = x.astype(d)
        # front_layers :107-113
        x = _basic3d(x, 16, 7, d, "front_layers_0", train)
        x = _pool3d(x)
        x = _res3d(x, 32, d, "front_layers_2", train)
        x = _res3d(x, 32, d, "front_layers_3", train)
        x = _res3d(x, 32, d, "front_layers_4", train)
        # encoder_decoder (blocks.py:430-465)
        e = "encoder_decoder"
        skip1 = _res3d(x, 32, d, f"{e}_skip_res1", train)
        x = _pool3d(x)
        x = _res3d(x, 64, d, f"{e}_encoder_res1", train)
        skip2 = _res3d(x, 64, d, f"{e}_skip_res2", train)
        x = _pool3d(x)
        x = _res3d(x, 128, d, f"{e}_encoder_res2", train)
        x = _res3d(x, 128, d, f"{e}_mid_res", train)
        x = _res3d(x, 128, d, f"{e}_decoder_res2", train)
        x = _upsample3d(x, 64, 2, 2, d, f"{e}_decoder_upsample2", train)
        x = x + skip2
        x = _res3d(x, 64, d, f"{e}_decoder_res1", train)
        x = _upsample3d(x, 32, 2, 2, d, f"{e}_decoder_upsample1", train)
        x = x + skip1
        # back_layers :117-122
        x = _res3d(x, 32, d, "back_layers_0", train)
        x = _basic3d(x, 32, 1, d, "back_layers_1", train)
        x = _basic3d(x, 32, 1, d, "back_layers_2", train)
        x = _upsample3d(x, self.output_channels, 2, 2, d,
                        "back_layers_3", train)
        x = nn.Conv(self.output_channels, (3, 3, 3), padding=1, dtype=d,
                    param_dtype=jnp.float32, name="output_layer")(x)
        return jnp.tanh(x).astype(jnp.float32)


class VoxelDiscriminator(nn.Module):
    """Four strided Conv3d+BN+LeakyReLU blocks, 2ch in -> 1ch out
    (reference net_voxeldiscriminator.py:7-42)."""

    settings: Sequence = ((64, 3, 2, 1), (128, 3, 2, 1),
                          (256, 3, 2, 1), (1, 4, 3, 1))
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        x = x.astype(d)
        for i, (f, k, s, p) in enumerate(self.settings):
            x = nn.Conv(f, (k, k, k), strides=(s, s, s), padding=p,
                        use_bias=False, dtype=d, param_dtype=jnp.float32,
                        name=f"models_{i * 3}")(x)
            x = _bn(d, f"models_{i * 3 + 1}")(
                x, use_running_average=not train)
            x = _lrelu(x)
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# torch weight interchange
# ---------------------------------------------------------------------------


def _to_np(v):
    return (np.array(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.array(v))


def _convert(sd, layout):
    """Build {params, batch_stats} from a torch state_dict and a
    {torch_prefix: kind} layout; flax names are the prefix with '.'->'_'.
    kinds: conv (OIHW/OIDHW), convt (spatially flipped, (I,O,spatial...)),
    linear (out,in), bn."""
    params, stats = {}, {}
    for prefix, kind in layout.items():
        name = prefix.replace(".", "_")
        if kind == "bn":
            params[name] = {"scale": _to_np(sd[f"{prefix}.weight"]),
                            "bias": _to_np(sd[f"{prefix}.bias"])}
            stats[name] = {"mean": _to_np(sd[f"{prefix}.running_mean"]),
                           "var": _to_np(sd[f"{prefix}.running_var"])}
            continue
        w = _to_np(sd[f"{prefix}.weight"])
        if kind == "linear":
            entry = {"kernel": w.T}
        elif kind == "conv":
            perm = (2, 3, 1, 0) if w.ndim == 4 else (2, 3, 4, 1, 0)
            entry = {"kernel": np.transpose(w, perm)}
        elif kind == "convt":
            sl = (slice(None), slice(None)) + (slice(None, None, -1),) * (
                w.ndim - 2)
            w = np.ascontiguousarray(w[sl])
            perm = (2, 3, 0, 1) if w.ndim == 4 else (2, 3, 4, 0, 1)
            entry = {"kernel": np.transpose(w, perm)}
        else:
            raise ValueError(kind)
        if f"{prefix}.bias" in sd:
            entry["bias"] = _to_np(sd[f"{prefix}.bias"])
        params[name] = entry
    return {"params": params, "batch_stats": stats}


def load_depth_generator_state_dict(sd, n_layer: int = 5):
    layout = {"linear": "linear"}
    for i in range(n_layer):
        layout[f"models.{i}.0"] = "convt"
        layout[f"models.{i}.1"] = "bn"
    return _convert(sd, layout)


def load_depth_discriminator_state_dict(sd):
    layout = {"encoder.0": "conv", "encoder.2": "conv", "encoder.3": "bn",
              "classifier": "conv",
              "predictor.0": "conv", "predictor.2": "bn",
              "hard_predictor.0": "conv", "hard_predictor.2": "bn",
              "hard_predictor.5": "linear", "hard_predictor.6": "linear"}
    return _convert(sd, layout)


def _res3d_layout(layout, prefix, projected):
    layout[f"{prefix}.res_branch.0"] = "conv"
    layout[f"{prefix}.res_branch.1"] = "bn"
    layout[f"{prefix}.res_branch.3"] = "conv"
    layout[f"{prefix}.res_branch.4"] = "bn"
    if projected:
        layout[f"{prefix}.skip_con.0"] = "conv"
        layout[f"{prefix}.skip_con.1"] = "bn"


def load_voxel_generator_state_dict(sd):
    layout = {"front_layers.0.block.0": "conv", "front_layers.0.block.1": "bn"}
    _res3d_layout(layout, "front_layers.2", True)
    _res3d_layout(layout, "front_layers.3", False)
    _res3d_layout(layout, "front_layers.4", False)
    e = "encoder_decoder"
    _res3d_layout(layout, f"{e}.skip_res1", False)
    _res3d_layout(layout, f"{e}.encoder_res1", True)
    _res3d_layout(layout, f"{e}.skip_res2", False)
    _res3d_layout(layout, f"{e}.encoder_res2", True)
    _res3d_layout(layout, f"{e}.mid_res", False)
    _res3d_layout(layout, f"{e}.decoder_res2", False)
    layout[f"{e}.decoder_upsample2.block.0"] = "convt"
    layout[f"{e}.decoder_upsample2.block.1"] = "bn"
    _res3d_layout(layout, f"{e}.decoder_res1", False)
    layout[f"{e}.decoder_upsample1.block.0"] = "convt"
    layout[f"{e}.decoder_upsample1.block.1"] = "bn"
    _res3d_layout(layout, "back_layers.0", False)
    layout["back_layers.1.block.0"] = "conv"
    layout["back_layers.1.block.1"] = "bn"
    layout["back_layers.2.block.0"] = "conv"
    layout["back_layers.2.block.1"] = "bn"
    layout["back_layers.3.block.0"] = "convt"
    layout["back_layers.3.block.1"] = "bn"
    layout["output_layer"] = "conv"
    return _convert(sd, layout)


def load_voxel_discriminator_state_dict(sd, n_blocks: int = 4):
    # torch path is models.models.<i> (LeakyConv3dBlocks wraps its own
    # Sequential, net_voxeldiscriminator.py:7-17); strip the outer level
    sd = {k[len("models."):]: v for k, v in sd.items()
          if k.startswith("models.")}
    layout = {}
    for i in range(n_blocks):
        layout[f"models.{i * 3}"] = "conv"
        layout[f"models.{i * 3 + 1}"] = "bn"
    return _convert(sd, layout)

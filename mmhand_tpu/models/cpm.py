"""CPM-style hand-pose estimation networks (the HPE judge + the downstream
augmentation-study estimator).

Faithful flax reimplementation of the reference nets
(reference baselines/quantitative_on_benchmarks/networks/net_hpm2d.py:26-120,
net_hpm3d.py:27-145; identical copies under
hand_pose_estimators/CVPR2020_hpm3d/models/networks/):

* Hpm2d: VGG-ish trunk (3 maxpools -> 32x32 at 256 input) + 6 CPM stages,
  each refining 21 heatmaps conditioned on trunk features; every stage
  output is upsampled x8 with align_corners=True bilinear.
* Hpm3d: same trunk+stages over the 21 predicted heatmaps, plus a depth
  head: one more stage -> flatten -> 3 FC -> 21 z values.  NOTE the
  reference applies NO ReLU between the depth FCs (net_hpm3d.py:138-141) —
  a linear 3-layer stack; preserved.

NHWC, bf16 compute.  Param names mirror torch attribute names for 1:1
weight conversion.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def upsample_bilinear_align_corners(x, factor: int):
    """torch nn.Upsample(scale_factor=f, mode='bilinear',
    align_corners=True) for NHWC inputs (jax.image.resize implements the
    half-pixel convention, so the mapping is built explicitly)."""
    n, h, w, c = x.shape
    oh, ow = h * factor, w * factor

    def axis_weights(in_size, out_size):
        if out_size == 1 or in_size == 1:
            idx0 = jnp.zeros((out_size,), jnp.int32)
            return idx0, idx0, jnp.zeros((out_size,), x.dtype)
        pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (
            out_size - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 1)
        i1 = jnp.clip(i0 + 1, 0, in_size - 1)
        frac = (pos - i0.astype(jnp.float32)).astype(x.dtype)
        return i0, i1, frac

    r0, r1, rf = axis_weights(h, oh)
    c0, c1, cf = axis_weights(w, ow)
    top = x[:, r0] * (1 - rf)[None, :, None, None] + \
        x[:, r1] * rf[None, :, None, None]
    out = top[:, :, c0] * (1 - cf)[None, None, :, None] + \
        top[:, :, c1] * cf[None, None, :, None]
    return out


class _Conv(nn.Module):
    features: int
    kernel: int
    padding: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.padding
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       padding=((p, p), (p, p)), dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class CPMStage(nn.Module):
    """One refinement stage (reference net_hpm2d.py:4-24 'Repeat'):
    5x conv7 + conv1 + conv1 -> num_joints maps."""

    num_joints: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(5):
            x = nn.relu(_Conv(128, 7, 3, self.dtype, name=f"conv{i+1}")(x))
        x = nn.relu(_Conv(128, 1, 0, self.dtype, name="conv6")(x))
        return _Conv(self.num_joints, 1, 0, self.dtype, name="conv7")(x)


class _Trunk(nn.Module):
    """Shared VGG-ish trunk + first-stage head (net_hpm2d.py:40-101)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = self.dtype

        def block(x, widths, prefix):
            for i, w in enumerate(widths):
                x = nn.relu(_Conv(w, 3, 1, d, name=f"{prefix}_{i+1}")(x))
            return x

        x = block(x, [64, 64], "conv1")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = block(x, [128, 128], "conv2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = block(x, [256, 256, 256, 256], "conv3")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = block(x, [512, 512, 512, 512], "conv4")
        x = block(x, [512, 512], "conv5")
        feat = nn.relu(_Conv(128, 3, 1, d, name="conv5_3_CPM")(x))
        return feat


class Hpm2d(nn.Module):
    """Image -> 6 stage outputs of 21 heatmaps each, upsampled x8 to input
    resolution (reference net_hpm2d.py:26-120)."""

    num_joints: int = 21
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        feat = _Trunk(self.dtype, name="trunk")(x)
        s1 = nn.relu(_Conv(512, 1, 0, self.dtype, name="conv6_1_CPM")(feat))
        s1 = _Conv(self.num_joints, 1, 0, self.dtype, name="conv6_2_CPM")(s1)
        outputs = [s1]
        for i in range(2, 7):
            prev = jnp.concatenate([outputs[-1], feat], axis=-1)
            outputs.append(CPMStage(self.num_joints, self.dtype,
                                    name=f"stage{i}")(prev))
        return [upsample_bilinear_align_corners(o, 8).astype(jnp.float32)
                for o in outputs]


def load_cpm_state_dict(sd) -> dict:
    """Reference Hpm2d/Hpm3d torch state_dict (or its .npz dump) -> flax
    params for the modules above.  Torch keys: 'convX_Y(_CPM).weight',
    'stageN.convM.weight', 'depth.convM.weight' (hpm3d), 'depth_fc_N.weight'
    (Linear).  DataParallel 'module.' prefixes are stripped
    (reference hpe_estimator.py:149-160)."""
    import numpy as np

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)

    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}
    params: dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, val in sd.items():
        base, leaf = key.rsplit(".", 1)
        v = to_np(val)
        if base.startswith("depth_fc"):
            # torch Linear (out, in) -> Dense kernel (in, out)
            put((base, "kernel" if leaf == "weight" else "bias"),
                v.T if leaf == "weight" else v)
            continue
        if leaf == "weight":
            leaf_name, v = "kernel", np.transpose(v, (2, 3, 1, 0))
        else:
            leaf_name = "bias"
        parts = base.split(".")
        if len(parts) == 2:          # stageN.convM / depth.convM
            put((parts[0], parts[1], "Conv_0", leaf_name), v)
        elif parts[0].startswith("conv6"):   # first-stage head, top level
            put((parts[0], "Conv_0", leaf_name), v)
        else:                         # trunk convs
            put(("trunk", parts[0], "Conv_0", leaf_name), v)
    return {"params": params}


def load_cpm_npz(path: str) -> dict:
    import numpy as np

    return load_cpm_state_dict(dict(np.load(path)))


class Hpm3d(nn.Module):
    """21 heatmaps -> 21 z values (reference net_hpm3d.py:27-145)."""

    num_joints: int = 21
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        feat = _Trunk(self.dtype, name="trunk")(x)
        s1 = nn.relu(_Conv(512, 1, 0, self.dtype, name="conv6_1_CPM")(feat))
        s1 = _Conv(self.num_joints, 1, 0, self.dtype, name="conv6_2_CPM")(s1)
        out = s1
        for i in range(2, 7):
            out = CPMStage(self.num_joints, self.dtype,
                           name=f"stage{i}")(
                jnp.concatenate([out, feat], axis=-1))
        out = CPMStage(self.num_joints, self.dtype, name="depth")(
            jnp.concatenate([out, feat], axis=-1))
        # NHWC -> flatten in torch's CHW order for weight-port parity
        out = out.transpose(0, 3, 1, 2).reshape(out.shape[0], -1)
        out = out.astype(jnp.float32)
        # three Linear layers with NO activation between (reference quirk)
        out = nn.Dense(512, param_dtype=jnp.float32, name="depth_fc_1")(out)
        out = nn.Dense(512, param_dtype=jnp.float32, name="depth_fc_2")(out)
        return nn.Dense(self.num_joints, param_dtype=jnp.float32,
                        name="depth_fc_3")(out)

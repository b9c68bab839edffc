"""3-stream pose-attention generator (PATN variant).

Reimplements the reference architecture (reference models/Generator.py:8-313)
TPU-first: NHWC, bf16 compute, flax.linen.  Structure:

* three downsample stems — image (3 ch), pose (42 ch = src+tgt 21-kp
  heatmaps), depth (6 ch = src+tgt depth-RGB): ReflectPad3+Conv7 then
  `n_downsampling` stride-2 Conv3 doublings (reference :158-223);
* 9 PATBlocks at ngf*4 channels (n_blocks hardcoded at reference
  MMHandModel.py:156);
* image-stream upsampling: 2x ConvTranspose doublings then
  ReflectPad3+Conv7+tanh (reference :240-259).

PATBlock (reference :8-130): three conv blocks; pose and depth streams emit
sigmoid attention maps; `x1_out = x1_out * att_pose * att_depth`, residual
add; pose/depth streams receive feedback `cat(att_logits, out)` — hence the
`dim*2`-wide convs in blocks 1..8 (`cated_stream2`).

Deliberately-preserved reference quirk: PATBlock returns
`(out, x3_cat, x2_cat, x1_out)` and the block loop unpacks
`x1, x2, x3, _` (reference :130,277-278) — so the pose and depth streams
**swap every block**.  This is part of the trained architecture; we keep it.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmhand_tpu.models.layers import (
    DEFAULT_IMPL,
    ConvNormRelu,
    Norm,
    NormConfig,
    OpImpl,
    PadConv,
    UpConv,
    checkpoint_name,
    pad2d,
)

Dtype = Any


class _FusedBNCore(nn.Module):
    """Param/variable twin of flax nn.BatchNorm (scale, bias, batch_stats
    mean/var) whose batch statistics are supplied by the caller — so the
    three stem BNs can share ONE fused stat reduction (stats are
    per-channel, so slices of the fused tensor's stats equal the
    per-stream stats exactly).  The normalize/update formulas replicate
    flax BatchNorm (fast variance, f32 stats, momentum 0.9, eps 1e-5)."""

    features: int
    dtype: Dtype

    def setup(self):
        from mmhand_tpu.models.layers import norm_scale_init
        self.scale = self.param("scale", norm_scale_init,
                                (self.features,), jnp.float32)
        self.offset = self.param("bias", nn.initializers.zeros,
                                 (self.features,), jnp.float32)
        self.ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (self.features,))
        self.ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (self.features,))

    def __call__(self, y, mean, var, train: bool):
        if not train:
            mean, var = self.ra_mean.value, self.ra_var.value
        elif not self.is_initializing():
            self.ra_mean.value = 0.9 * self.ra_mean.value + 0.1 * mean
            self.ra_var.value = 0.9 * self.ra_var.value + 0.1 * var
        yn = (y - mean) * (jax.lax.rsqrt(var + 1e-5) * self.scale)
        yn = yn + self.offset
        return yn.astype(self.dtype)


class _FusedNormShell(nn.Module):
    """Scope twin of Norm(kind='batch') holding a _FusedBNCore under the
    same child name as flax BatchNorm ('BatchNorm_0')."""

    features: int
    dtype: Dtype

    def setup(self):
        self.bn = _FusedBNCore(self.features, self.dtype,
                               name="BatchNorm_0")

    def __call__(self, y, mean, var, train: bool):
        return self.bn(y, mean, var, train)


class _StemBlock(nn.Module):
    """Param-tree twin of the stem ConvNormRelu for the fused-stems path.

    Creates the identical children (PadConv_0, Norm_0) so checkpoints and
    converters are interchangeable with the unfused path, but exposes the
    conv params (`conv_params`) and the norm+relu tail (`finish`)
    separately: the parent computes all three stem convs as ONE
    block-diagonal 7x7 conv (see Generator.__call__).  With
    `fused_bn=True` the Norm_0 child is the stat-fed twin
    (_FusedNormShell) and `finish` takes the shared fused statistics."""

    features: int
    kernel: int
    norm: NormConfig
    pad: int
    dtype: Dtype
    fused_bn: bool = False
    impl: OpImpl = DEFAULT_IMPL

    def setup(self):
        self.conv = PadConv(self.features, self.kernel, pad=self.pad,
                            pad_mode="reflect", use_bias=self.norm.use_bias,
                            dtype=self.dtype, params_only=True,
                            name="PadConv_0")
        if self.fused_bn:
            self.norm_m = _FusedNormShell(self.features, self.dtype,
                                          name="Norm_0")
        else:
            self.norm_m = Norm(self.norm, dtype=self.dtype, impl=self.impl,
                               name="Norm_0")

    def conv_params(self, x):
        return self.conv(x)

    def finish(self, y, train: bool = True, mean=None, var=None):
        if self.fused_bn:
            return nn.relu(self.norm_m(y, mean, var, train))
        return nn.relu(self.norm_m(y, train))


def _fused_stem_conv(xs, kbs, pad: int):
    """One block-diagonal 7x7 reflect conv over the channel-concatenated
    streams == the three per-stream convs, exactly (the off-block kernel
    entries are zeros, contributing exact 0 to the f32 accumulators).

    The per-stream convs are MXU-starved (Cin 3/42/6 at 256px: ~24 ms/step
    fwd+dK at the r3 profile); the fused conv has contraction 51*49 and 192
    output lanes, and pays one padded-input pass instead of three."""
    xcat = jnp.concatenate(xs, axis=-1)
    xp = pad2d(xcat, pad, "reflect")
    cins = [x.shape[-1] for x in xs]
    feats = [k.shape[-1] for k, _ in kbs]
    kk = kbs[0][0]
    big = jnp.zeros((kk.shape[0], kk.shape[1], sum(cins), sum(feats)),
                    kk.dtype)
    ci = co = 0
    for (k, _), c in zip(kbs, cins):
        big = big.at[:, :, ci:ci + c, co:co + k.shape[-1]].set(k)
        ci += c
        co += k.shape[-1]
    y = jax.lax.conv_general_dilated(
        xp, big, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if kbs[0][1] is not None:
        y = y + jnp.concatenate([b for _, b in kbs])
    y = checkpoint_name(y, "conv_out")
    splits = []
    co = 0
    for f in feats:
        splits.append(y[..., co:co + f])
        co += f
    return splits


class _AttConvBlock(nn.Module):
    """One PATBlock stream: pad->conv->norm->relu->[dropout]->pad->conv[->norm].

    cal_att=True (pose/depth streams) ends with a conv projecting to `dim`
    and NO trailing norm (the sigmoid attention head, reference
    Generator.py:90-106); cal_att=False (image stream) ends conv->norm
    (reference :107-111).
    """

    dim: int
    cated: bool
    cal_att: bool
    norm: NormConfig
    use_dropout: bool
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.bfloat16
    impl: OpImpl = DEFAULT_IMPL

    @nn.compact
    def __call__(self, x, train: bool = True):
        width = self.dim * 2 if (self.cated and self.cal_att) else self.dim
        x = ConvNormRelu(width, 3, self.norm, stride=1, pad=1,
                         pad_mode=self.pad_mode, dtype=self.dtype,
                         impl=self.impl)(x, train)
        if self.use_dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        x = PadConv(self.dim, 3, 1, pad=1, pad_mode=self.pad_mode,
                    use_bias=self.norm.use_bias, dtype=self.dtype,
                    impl=self.impl)(x)
        if not self.cal_att:
            x = Norm(self.norm, dtype=self.dtype, impl=self.impl)(x, train)
        return x


class PATBlock(nn.Module):
    """Pose-attention block (reference models/Generator.py:8-130)."""

    dim: int
    cated_stream2: bool
    norm: NormConfig
    use_dropout: bool
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.bfloat16
    impl: OpImpl = DEFAULT_IMPL

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = True):
        x1_out = _AttConvBlock(self.dim, cated=False, cal_att=False,
                               norm=self.norm, use_dropout=self.use_dropout,
                               pad_mode=self.pad_mode, dtype=self.dtype,
                               impl=self.impl, name="stream1")(x1, train)
        x2_out = _AttConvBlock(self.dim, cated=self.cated_stream2,
                               cal_att=True, norm=self.norm,
                               use_dropout=self.use_dropout,
                               pad_mode=self.pad_mode, dtype=self.dtype,
                               impl=self.impl, name="stream2")(x2, train)
        x3_out = _AttConvBlock(self.dim, cated=self.cated_stream2,
                               cal_att=True, norm=self.norm,
                               use_dropout=self.use_dropout,
                               pad_mode=self.pad_mode, dtype=self.dtype,
                               impl=self.impl, name="stream3")(x3, train)

        att_pose = nn.sigmoid(x2_out)
        att_depth = nn.sigmoid(x3_out)
        x1_att = x1_out * att_pose * att_depth
        out = x1 + x1_att  # residual (reference :125)

        # feedback: streams get cat(att_logits, out); NOTE the x2/x3 swap at
        # the caller (reference :130 returns x3 before x2; :277-278 unpacks
        # in x2, x3 order) — reproduced by returning (out, x3_cat, x2_cat).
        x2_cat = jnp.concatenate([x2_out, out], axis=-1)
        x3_cat = jnp.concatenate([x3_out, out], axis=-1)
        return out, x3_cat, x2_cat


class Generator(nn.Module):
    """PATN 3-stream generator (reference models/Generator.py:133-313).

    Input: tuple (image NHWC[3], pose NHWC[42], depth NHWC[6]) in [-1, 1].
    Output: NHWC[output_nc] tanh image in [-1, 1], dtype float32.
    """

    input_nc: Sequence[int] = (3, 42, 6)
    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    n_downsampling: int = 2
    norm: NormConfig = NormConfig()
    use_dropout: bool = True
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.bfloat16
    remat: bool = False  # save conv outputs, recompute elementwise tails
    impl: OpImpl = DEFAULT_IMPL
    stem_fused: int = 0  # ModelConfig.g_stem_fused: 0 | 1 | 2

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x1, x2, x3 = inputs
        x1 = x1.astype(self.dtype)
        x2 = x2.astype(self.dtype)
        x3 = x3.astype(self.dtype)

        # --- downsample stems (reference :158-223)
        def down(x, name):
            for i in range(self.n_downsampling):
                mult = 2 ** i
                x = ConvNormRelu(self.ngf * mult * 2, 3, self.norm, stride=2,
                                 pad=1, zero_pad_in_conv=True,
                                 dtype=self.dtype, impl=self.impl,
                                 name=f"{name}_down{i}")(x, train)
            return x

        if self.stem_fused in (1, 2):
            # One block-diagonal conv for all three 7x7 stems (exact; see
            # _fused_stem_conv).  Param tree identical to the unfused path.
            # Mode "2" additionally computes the three BNs' batch stats as
            # ONE reduction over the fused 192-channel conv output (stats
            # are per-channel: slices equal the per-stream stats exactly);
            # its autodiff likewise fuses the backward stat reductions.
            fused_bn = self.stem_fused == 2 and self.norm.kind == "batch"
            shells = [
                _StemBlock(self.ngf, 7, self.norm, 3, self.dtype,
                           fused_bn=fused_bn, impl=self.impl,
                           name=f"stream{i}_in")
                for i in (1, 2, 3)]
            kbs = [sh.conv_params(x)
                   for sh, x in zip(shells, (x1, x2, x3))]
            ys = _fused_stem_conv((x1, x2, x3), kbs, pad=3)
            means = vars_ = (None, None, None)
            if fused_bn and train:
                if self.impl.bn_stats in ("dot", "pallas"):
                    from mmhand_tpu.ops.bn_stats import bn_moments
                    mu, mu2 = bn_moments(jnp.concatenate(ys, axis=-1),
                                         method=self.impl.bn_stats)
                else:
                    yc = jnp.concatenate(ys, axis=-1).astype(jnp.float32)
                    mu = yc.mean((0, 1, 2))
                    mu2 = (yc * yc).mean((0, 1, 2))
                if self.norm.axis_name and not self.is_initializing():
                    mu, mu2 = jax.lax.pmean(
                        jnp.stack([mu, mu2]), self.norm.axis_name)
                var = jnp.maximum(0.0, mu2 - mu * mu)
                n = self.ngf
                means = [mu[i * n:(i + 1) * n] for i in range(3)]
                vars_ = [var[i * n:(i + 1) * n] for i in range(3)]
            x1, x2, x3 = (
                down(sh.finish(y, train, mean=m, var=v), f"stream{i}")
                for i, (sh, y, m, v)
                in enumerate(zip(shells, ys, means, vars_), 1))
        else:
            def stem(x, name):
                x = ConvNormRelu(self.ngf, 7, self.norm, pad=3,
                                 pad_mode="reflect", dtype=self.dtype,
                                 impl=self.impl,
                                 name=f"{name}_in")(x, train)
                return down(x, name)

            x1 = stem(x1, "stream1")
            x2 = stem(x2, "stream2")
            x3 = stem(x3, "stream3")

        # --- attention blocks (reference :226-237; n_blocks=9 hardcoded at
        # MMHandModel.py:156; cated_stream2 False only for block 0)
        dim = self.ngf * (2 ** self.n_downsampling)
        block_cls = PATBlock
        if self.remat:
            # per-block gradient checkpointing that saves ONLY conv/BN-able
            # outputs (checkpoint_name 'conv_out' tags in layers.py) and
            # recomputes the cheap elementwise tails in the backward pass.
            # static_argnums counts self: train is arg 4.
            block_cls = nn.remat(
                PATBlock, static_argnums=(4,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"))
        for i in range(self.n_blocks):
            x1, x2, x3 = block_cls(dim, cated_stream2=(i != 0),
                                   norm=self.norm,
                                   use_dropout=self.use_dropout,
                                   pad_mode=self.pad_mode, dtype=self.dtype,
                                   impl=self.impl,
                                   name=f"att{i}")(x1, x2, x3, train)

        # --- upsample image stream (reference :240-259)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x1 = UpConv(self.ngf * mult // 2, use_bias=self.norm.use_bias,
                        dtype=self.dtype, impl=self.impl,
                        name=f"up{i}")(x1)
            x1 = Norm(self.norm, dtype=self.dtype, impl=self.impl,
                      name=f"up{i}_norm")(x1, train)
            x1 = nn.relu(x1)

        # final conv has default bias=True (reference :257 has no bias kwarg)
        x1 = PadConv(self.output_nc, 7, pad=3, pad_mode="reflect",
                     use_bias=True, dtype=self.dtype, impl=self.impl,
                     name="out_conv")(x1)
        return jnp.tanh(x1).astype(jnp.float32)

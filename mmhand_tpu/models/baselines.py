"""Baseline generator zoo for the quantitative-benchmark drivers.

Flax reimplementations of the judge networks the reference benchmarks
against (reference baselines/quantitative_on_benchmarks/):

* ResnetGenerator — CycleGAN-style (networks/net_resnetgenerator.py,
  networks/networks.py:365-483; used by bench_cyclegan.py:2).
* UnetGenerator — pix2pix UNet, recursive skip blocks
  (networks/net_unetgenerator.py, networks.py:486-588; bench_p2p.py:2).
* PATN2Stream — the original 2-stream Pose-Attentional-Transfer generator
  (networks/model_variants.py:8-170; bench_poseTransfer.py:2): like the
  MM-Hand generator but without the depth stream; a single sigmoid pose
  attention gates the image stream.

All NHWC, bf16 compute / f32 params.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mmhand_tpu.models.discriminator import ResnetBlock
from mmhand_tpu.models.generator import _AttConvBlock
from mmhand_tpu.models.layers import (
    ConvNormRelu,
    Norm,
    NormConfig,
    PadConv,
    UpConv,
    conv_init,
)

Dtype = Any


class ResnetGenerator(nn.Module):
    """CycleGAN resnet generator (reference networks.py:365-426)."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 6
    n_downsampling: int = 2
    norm: NormConfig = NormConfig()
    use_dropout: bool = False
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = ConvNormRelu(self.ngf, 7, self.norm, pad=3, pad_mode="reflect",
                         dtype=self.dtype, name="in_conv")(x, train)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            x = ConvNormRelu(self.ngf * mult * 2, 3, self.norm, stride=2,
                             pad=1, zero_pad_in_conv=True, dtype=self.dtype,
                             name=f"down{i}")(x, train)
        mult = 2 ** self.n_downsampling
        for i in range(self.n_blocks):
            x = ResnetBlock(self.ngf * mult, self.norm, self.use_dropout,
                            self.pad_mode, dtype=self.dtype,
                            name=f"res{i}")(x, train)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x = UpConv(self.ngf * mult // 2, use_bias=self.norm.use_bias,
                       dtype=self.dtype, name=f"up{i}")(x)
            x = Norm(self.norm, dtype=self.dtype, name=f"up{i}_norm")(x, train)
            x = nn.relu(x)
        x = PadConv(self.output_nc, 7, pad=3, pad_mode="reflect",
                    use_bias=True, dtype=self.dtype, name="out_conv")(x)
        return jnp.tanh(x).astype(jnp.float32)


class _UnetBlock(nn.Module):
    """One recursive UNet level (reference networks.py:518-588):
    down: [leaky_relu] conv4 s2 [norm]; submodule; up: relu convT4 s2 [norm];
    outermost ends with tanh, innermost has no submodule."""

    outer_nc: int
    inner_nc: int
    submodule: Any = None
    outermost: bool = False
    innermost: bool = False
    norm: NormConfig = NormConfig()
    use_dropout: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = x
        if not self.outermost:
            h = nn.leaky_relu(h, 0.2)
        # down conv never gets a bias under batch norm — including the
        # outermost level (torch networks.py:outermost downconv bias=use_bias)
        h = nn.Conv(self.inner_nc, (4, 4), strides=(2, 2),
                    padding=[(1, 1), (1, 1)],
                    use_bias=self.norm.use_bias,
                    kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="down")(h)
        if not (self.outermost or self.innermost):
            h = Norm(self.norm, dtype=self.dtype, name="down_norm")(h, train)
        if self.submodule is not None:
            h = self.submodule(h, train)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.outer_nc, (4, 4), strides=(2, 2),
                             padding="SAME",
                             use_bias=self.norm.use_bias or self.outermost,
                             kernel_init=conv_init, dtype=self.dtype,
                             param_dtype=jnp.float32, name="up")(h)
        if self.outermost:
            return jnp.tanh(h)
        h = Norm(self.norm, dtype=self.dtype, name="up_norm")(h, train)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return jnp.concatenate([x, h], axis=-1)  # skip connection


class UnetGenerator(nn.Module):
    """pix2pix UNet (reference networks.py:486-515): num_downs levels;
    structure ngf -> 2ngf -> 4ngf -> 8ngf (x repeated middle levels)."""

    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    norm: NormConfig = NormConfig()
    use_dropout: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        d = self.dtype
        block = _UnetBlock(self.ngf * 8, self.ngf * 8, innermost=True,
                           norm=self.norm, dtype=d, name="inner")
        for i in range(self.num_downs - 5):
            block = _UnetBlock(self.ngf * 8, self.ngf * 8, submodule=block,
                               norm=self.norm, use_dropout=self.use_dropout,
                               dtype=d, name=f"mid{i}")
        block = _UnetBlock(self.ngf * 4, self.ngf * 8, submodule=block,
                           norm=self.norm, dtype=d, name="lvl4")
        block = _UnetBlock(self.ngf * 2, self.ngf * 4, submodule=block,
                           norm=self.norm, dtype=d, name="lvl2")
        block = _UnetBlock(self.ngf, self.ngf * 2, submodule=block,
                           norm=self.norm, dtype=d, name="lvl1")
        block = _UnetBlock(self.output_nc, self.ngf, submodule=block,
                           outermost=True, norm=self.norm, dtype=d,
                           name="outer")
        return block(x, train).astype(jnp.float32)


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN (reference networks/net_nlayerdiscriminator.py,
    networks.py:591-636): conv4 s2 stack widening to ndf*8, 1-ch head."""

    ndf: int = 64
    n_layers: int = 3
    norm: NormConfig = NormConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], kernel_init=conv_init,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            x = nn.Conv(self.ndf * mult, (4, 4), strides=(stride, stride),
                        padding=[(1, 1), (1, 1)],
                        use_bias=self.norm.use_bias, kernel_init=conv_init,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{n}")(x)
            x = Norm(self.norm, dtype=self.dtype, name=f"norm{n}")(x, train)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), padding=[(1, 1), (1, 1)],
                    kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head")(x)
        return x.astype(jnp.float32)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (reference networks/net_pixeldiscriminator.py,
    networks.py:639-686)."""

    ndf: int = 64
    norm: NormConfig = NormConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(self.ndf, (1, 1), kernel_init=conv_init,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.ndf * 2, (1, 1), use_bias=self.norm.use_bias,
                    kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = Norm(self.norm, dtype=self.dtype, name="norm1")(x, train)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (1, 1), kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head")(x)
        return x.astype(jnp.float32)


class PATBlock2(nn.Module):
    """2-stream pose-attention block (reference model_variants.py:8-69)."""

    dim: int
    cated_stream2: bool
    norm: NormConfig
    use_dropout: bool
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        x1_out = _AttConvBlock(self.dim, cated=False, cal_att=False,
                               norm=self.norm, use_dropout=self.use_dropout,
                               pad_mode=self.pad_mode, dtype=self.dtype,
                               name="stream1")(x1, train)
        x2_out = _AttConvBlock(self.dim, cated=self.cated_stream2,
                               cal_att=True, norm=self.norm,
                               use_dropout=self.use_dropout,
                               pad_mode=self.pad_mode, dtype=self.dtype,
                               name="stream2")(x2, train)
        att = nn.sigmoid(x2_out)
        out = x1 + x1_out * att
        x2_cat = jnp.concatenate([x2_out, out], axis=-1)
        return out, x2_cat


class PATN2Stream(nn.Module):
    """2-stream PATN generator (reference model_variants.py:71-170;
    bench_poseTransfer builds G([3,42], 3, 64, BN, dropout, 9 blocks)).
    Input: (image NHWC[3], pose NHWC[42])."""

    input_nc: Sequence[int] = (3, 42)
    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    n_downsampling: int = 2
    norm: NormConfig = NormConfig()
    use_dropout: bool = True
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x1, x2 = inputs
        x1 = x1.astype(self.dtype)
        x2 = x2.astype(self.dtype)

        def stem(x, name):
            x = ConvNormRelu(self.ngf, 7, self.norm, pad=3,
                             pad_mode="reflect", dtype=self.dtype,
                             name=f"{name}_in")(x, train)
            for i in range(self.n_downsampling):
                mult = 2 ** i
                x = ConvNormRelu(self.ngf * mult * 2, 3, self.norm, stride=2,
                                 pad=1, zero_pad_in_conv=True,
                                 dtype=self.dtype,
                                 name=f"{name}_down{i}")(x, train)
            return x

        x1 = stem(x1, "stream1")
        x2 = stem(x2, "stream2")
        dim = self.ngf * (2 ** self.n_downsampling)
        for i in range(self.n_blocks):
            x1, x2 = PATBlock2(dim, cated_stream2=(i != 0), norm=self.norm,
                               use_dropout=self.use_dropout,
                               pad_mode=self.pad_mode, dtype=self.dtype,
                               name=f"att{i}")(x1, x2, train)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x1 = UpConv(self.ngf * mult // 2, use_bias=self.norm.use_bias,
                        dtype=self.dtype, name=f"up{i}")(x1)
            x1 = Norm(self.norm, dtype=self.dtype, name=f"up{i}_norm")(
                x1, train)
            x1 = nn.relu(x1)
        x1 = PadConv(self.output_nc, 7, pad=3, pad_mode="reflect",
                     use_bias=True, dtype=self.dtype, name="out_conv")(x1)
        return jnp.tanh(x1).astype(jnp.float32)

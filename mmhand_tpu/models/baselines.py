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
        # torch ConvTranspose2d(k4 s2 p1) — UpConv keeps the torch kernel
        # orientation so weight ports are 1:1 (networks.py:553-570)
        h = UpConv(self.outer_nc, kernel_size=4, stride=2, padding=1,
                   output_padding=0,
                   use_bias=self.norm.use_bias or self.outermost,
                   dtype=self.dtype, name="up")(h)
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


class _ResnetBackboneBlock(nn.Module):
    """BasicBlock / Bottleneck of the PoseResNet backbone
    (reference networks.py:686-758).  torch BN momentum 0.1 -> flax 0.9."""

    planes: int
    stride: int = 1
    bottleneck: bool = False
    has_downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype

        def conv(h, feats, k, s, name):
            p = k // 2
            return nn.Conv(feats, (k, k), strides=(s, s),
                           padding=[(p, p), (p, p)], use_bias=False,
                           kernel_init=conv_init, dtype=d,
                           param_dtype=jnp.float32, name=name)(h)

        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=d,
                                param_dtype=jnp.float32, name=name)(h)

        residual = x
        if self.bottleneck:  # expansion 4 (reference networks.py:718-757)
            h = nn.relu(bn(conv(x, self.planes, 1, 1, "conv1"), "bn1"))
            h = nn.relu(bn(conv(h, self.planes, 3, self.stride, "conv2"),
                           "bn2"))
            h = bn(conv(h, self.planes * 4, 1, 1, "conv3"), "bn3")
            out_ch = self.planes * 4
        else:  # BasicBlock, expansion 1 (reference networks.py:686-716)
            h = nn.relu(bn(conv(x, self.planes, 3, self.stride, "conv1"),
                           "bn1"))
            h = bn(conv(h, self.planes, 3, 1, "conv2"), "bn2")
            out_ch = self.planes
        if self.has_downsample:
            residual = bn(conv(x, out_ch, 1, self.stride, "down_conv"),
                          "down_bn")
        return nn.relu(h + residual)


# (block-is-bottleneck, per-stage block counts) — reference networks.py:964-968
POSE_RESNET_SPEC = {18: (False, [2, 2, 2, 2]),
                    34: (False, [3, 4, 6, 3]),
                    50: (True, [3, 4, 6, 3]),
                    101: (True, [3, 4, 23, 3]),
                    152: (True, [3, 8, 36, 3])}


class PoseResNet(nn.Module):
    """SimpleBaselines-style pose network: ResNet backbone + 3 deconv
    upsampling layers + 1x1 joint-heatmap head
    (reference networks.py:801-990 / net_poseresnet.py, built by
    define_poseNet with --resnet_size, default 101 at
    hand_pose_estimators/CVPR2020_hpm3d/options/base_options.py:45).

    POSE_RESNET extra config is never defined inside the reference repo
    (the opt namespace expects it injected); the values here are the
    upstream SimpleBaselines defaults the code was written against:
    NUM_DECONV_LAYERS=3, NUM_DECONV_FILTERS=[256]*3, NUM_DECONV_KERNELS=
    [4]*3, FINAL_CONV_KERNEL=1, DECONV_WITH_BIAS=False.
    """

    num_joints: int = 21
    resnet_size: int = 50
    deconv_filters: Sequence[int] = (256, 256, 256)
    deconv_kernels: Sequence[int] = (4, 4, 4)
    final_conv_kernel: int = 1
    deconv_with_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        bottleneck, layers = POSE_RESNET_SPEC[self.resnet_size]
        expansion = 4 if bottleneck else 1
        x = x.astype(d)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=conv_init, dtype=d,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=d, param_dtype=jnp.float32,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_planes = 64
        for stage, (planes, blocks) in enumerate(
                zip([64, 128, 256, 512], layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_down = (b == 0 and
                            (s != 1 or in_planes != planes * expansion))
                x = _ResnetBackboneBlock(
                    planes, stride=s, bottleneck=bottleneck,
                    has_downsample=has_down, dtype=d,
                    name=f"layer{stage + 1}_{b}")(x, train)
                in_planes = planes * expansion

        # deconv head (reference networks.py:864-892): convT k4 s2 p1 op0
        for i, (f, k) in enumerate(zip(self.deconv_filters,
                                       self.deconv_kernels)):
            pad, op = {4: (1, 0), 3: (1, 1), 2: (0, 0)}[k]
            x = UpConv(f, use_bias=self.deconv_with_bias, kernel_size=k,
                       stride=2, padding=pad, output_padding=op, dtype=d,
                       name=f"deconv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=d, param_dtype=jnp.float32,
                             name=f"deconv_bn{i}")(x)
            x = nn.relu(x)

        fk = self.final_conv_kernel
        p = 1 if fk == 3 else 0
        x = nn.Conv(self.num_joints, (fk, fk), padding=[(p, p), (p, p)],
                    kernel_init=conv_init, dtype=d, param_dtype=jnp.float32,
                    name="final_layer")(x)
        return x.astype(jnp.float32)


def load_pose_resnet_state_dict(sd, resnet_size: int = 50):
    """torch PoseResNet state_dict (tensors or arrays) -> flax variables.

    Layout contracts as tools/convert_mmhand_torch.py: conv OIHW->HWIO,
    convT (I,O,kh,kw) -> spatial flip -> HWIO, BN weight/bias->scale/bias +
    running stats -> batch_stats.  Key map mirrors reference
    networks.py:801-892 module names.
    """
    import numpy as np

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)

    def conv(key):
        return {"kernel": np.transpose(to_np(sd[key + ".weight"]),
                                       (2, 3, 1, 0)),
                **({"bias": to_np(sd[key + ".bias"])}
                   if key + ".bias" in sd else {})}

    def convt(key):
        w = to_np(sd[key + ".weight"])[:, :, ::-1, ::-1]
        out = {"kernel": np.ascontiguousarray(
            np.transpose(w, (2, 3, 0, 1)))}
        if key + ".bias" in sd:
            out["bias"] = to_np(sd[key + ".bias"])
        return out

    def bn(key):
        return ({"scale": to_np(sd[key + ".weight"]),
                 "bias": to_np(sd[key + ".bias"])},
                {"mean": to_np(sd[key + ".running_mean"]),
                 "var": to_np(sd[key + ".running_var"])})

    bottleneck, layers = POSE_RESNET_SPEC[resnet_size]
    params: dict = {"conv1": conv("conv1")}
    stats: dict = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            tk = f"layer{stage + 1}.{b}"
            fk = f"layer{stage + 1}_{b}"
            node, snode = {}, {}
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                node[f"conv{c}"] = conv(f"{tk}.conv{c}")
                node[f"bn{c}"], snode[f"bn{c}"] = bn(f"{tk}.bn{c}")
            if f"{tk}.downsample.0.weight" in sd:
                node["down_conv"] = conv(f"{tk}.downsample.0")
                node["down_bn"], snode["down_bn"] = bn(f"{tk}.downsample.1")
            params[fk] = node
            stats[fk] = snode
    i = 0
    while f"deconv_layers.{3 * i}.weight" in sd:
        params[f"deconv{i}"] = convt(f"deconv_layers.{3 * i}")
        params[f"deconv_bn{i}"], stats[f"deconv_bn{i}"] = bn(
            f"deconv_layers.{3 * i + 1}")
        i += 1
    params["final_layer"] = conv("final_layer")
    return {"params": params, "batch_stats": stats}


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

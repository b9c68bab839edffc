"""Shared layer primitives for the model zoo.

TPU-first conventions:
* NHWC activations (XLA's preferred conv layout on TPU).
* bfloat16 compute with float32 parameters (`dtype` / `param_dtype`),
  replacing APEX amp O1 (reference models/MMHandModel.py:99-108) — bf16
  needs no loss scaling.
* Cross-replica BatchNorm via `axis_name`: batch statistics are psum'd over
  the data mesh axis, the TPU equivalent of APEX `convert_syncbn_model`
  (reference models/MMHandModel.py:109-116).  This is the *correct* sync-BN
  (mean of moments, not mean-of-means) because flax reduces sums of x and
  x^2 across the axis.

Weight init matches the reference (reference models/network_utils.py:12-71):
conv/linear kernels ~ N(0, 0.02); norm scale ~ N(1, 0.02), bias 0.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


@dataclasses.dataclass(frozen=True)
class OpImpl:
    """TPU lowering selection for the conv/norm primitives.

    Field meanings, valid values and the measured full-step A/Bs behind
    the defaults are documented on the matching ModelConfig fields
    (config.py) — the two MUST stay in sync (asserted in
    tests/test_models.py).  Instances flow from ModelConfig through
    MMHandSystem into the module tree; modules built outside the flagship
    system (CPM, baselines, hand3d) use DEFAULT_IMPL.  Never read env
    vars here: profiling overrides happen once at system build
    (ModelConfig.with_env_overrides).
    """

    reflect: str = "padadd"
    head: str = "d2s"
    stem: str = "direct"
    down: str = "direct"
    upconv_shuffle: str = "conv4"
    bn_stats: str = "reduce"
    bn_stats_min: int = 1 << 18

    @classmethod
    def from_model_config(cls, m) -> "OpImpl":
        return cls(reflect=m.reflect_impl, head=m.head_impl,
                   stem=m.stem_impl, down=m.down_impl,
                   upconv_shuffle=m.upconv_shuffle, bn_stats=m.bn_stats,
                   bn_stats_min=m.bn_stats_min)


DEFAULT_IMPL = OpImpl()

# N(0, 0.02) kernel init (reference network_utils.py:12-20 weights_init_normal)
conv_init = nn.initializers.normal(stddev=0.02)
# N(1, 0.02) norm scale init (reference network_utils.py:18-19)
def norm_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * nn.initializers.normal(stddev=1.0)(key, shape, dtype)


def apply_init_type(params, init_type: str, rng):
    """Re-draw conv/linear kernels per --init_type, post-init.

    The reference applies init by walking modules (`net.apply(weights_init_*)`,
    reference models/network_utils.py:23-72); the functional analog is a
    param-tree map over 4-D ('kernel', HWIO conv) and 2-D (linear) leaves.
    Norm scale/bias leaves keep their N(1,.02)/0 init from construction
    (identical across init types in the reference :29-56).

    normal:     N(0, 0.02)                 (weights_init_normal :12-20)
    xavier:     xavier_normal gain=0.02 -> std = .02*sqrt(2/(fan_in+fan_out))
                (:23-32)
    kaiming:    kaiming_normal fan_in, a=0 -> std = sqrt(2/fan_in) (:35-44)
    orthogonal: orthogonal gain=1, torch semantics — flatten to
                (out_features, rest), semi-orthogonal via QR (:47-56)
    """
    if init_type == "normal":
        return params  # construction-time default already matches

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    keys = jax.random.split(rng, max(1, len(leaves)))
    out = []
    for (path, leaf), key in zip(leaves, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name != "kernel" or leaf.ndim not in (2, 4):
            out.append(leaf)
            continue
        if leaf.ndim == 4:  # HWIO
            kh, kw, cin, cout = leaf.shape
            fan_in, fan_out = cin * kh * kw, cout * kh * kw
        else:  # (in, out) flax Dense
            fan_in, fan_out = leaf.shape
            cout = leaf.shape[1]
        if init_type == "xavier":
            std = 0.02 * (2.0 / (fan_in + fan_out)) ** 0.5
            out.append(std * jax.random.normal(key, leaf.shape, leaf.dtype))
        elif init_type == "kaiming":
            std = (2.0 / fan_in) ** 0.5
            out.append(std * jax.random.normal(key, leaf.shape, leaf.dtype))
        elif init_type == "orthogonal":
            # torch flattens weight (O, I, kh, kw) to (O, I*kh*kw); our HWIO
            # layout transposes to OIHW first so rows match torch's
            rest = leaf.size // cout
            a = jax.random.normal(key, (max(cout, rest), min(cout, rest)),
                                  jnp.float32)
            q, r = jnp.linalg.qr(a)
            q = q * jnp.sign(jnp.diagonal(r))  # unique decomposition
            q = q.T if cout > rest else q      # (rest, cout) -> rows=rest
            if leaf.ndim == 4:
                # q: (rest=I*kh*kw, cout) with torch row order (I, kh, kw)
                w = q.reshape(cin, kh, kw, cout).transpose(1, 2, 0, 3)
            else:
                w = q.reshape(leaf.shape)
            out.append(w.astype(leaf.dtype))
        else:
            raise NotImplementedError(
                f"initialization method [{init_type}] is not implemented")
    return jax.tree_util.tree_unflatten(treedef, [l for l in out])


@dataclasses.dataclass(frozen=True)
class NormConfig:
    """Normalization factory config (reference network_utils.py:74-84
    get_norm_layer): 'batch' (affine) or 'instance' (no affine).

    `axis_name` enables cross-replica statistics when the module runs under
    shard_map/pmap with that named axis (sync-BN equivalent).
    """

    kind: str = "batch"
    axis_name: Optional[str] = None

    @property
    def use_bias(self) -> bool:
        """Torch convs skip bias before affine BatchNorm; keep bias with
        InstanceNorm (reference models/Generator.py:152-155)."""
        return self.kind == "instance"


class _DotStatsBN(nn.Module):
    """Param/variable twin of flax nn.BatchNorm whose batch statistics are
    computed by ops.bn_stats.bn_moments (MXU dots or a one-pass Pallas
    reduction, per `method`) instead of reduce ops — same tree (scale,
    bias, batch_stats mean/var under 'BatchNorm_0'-style naming), same
    fast-variance f32 formula, momentum 0.9, eps 1e-5, and the same
    axis_name pmean-of-moments sync-BN.  Routed by Norm when
    ModelConfig.bn_stats is 'dot'/'pallas' for large-spatial sites (see
    ops/bn_stats.py for the profile evidence)."""

    features: int
    dtype: Dtype
    axis_name: Optional[str] = None
    method: str = "dot"

    def setup(self):
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

    def __call__(self, x, train: bool = True):
        if not train:
            mean, var = self.ra_mean.value, self.ra_var.value
        else:
            from mmhand_tpu.ops.bn_stats import bn_moments
            mu, mu2 = bn_moments(x, method=self.method)
            if self.axis_name and not self.is_initializing():
                mu, mu2 = jax.lax.pmean(
                    jnp.stack([mu, mu2]), self.axis_name)
            mean = mu
            var = jnp.maximum(0.0, mu2 - mu * mu)
            if not self.is_initializing():
                self.ra_mean.value = 0.9 * self.ra_mean.value + 0.1 * mean
                self.ra_var.value = 0.9 * self.ra_var.value + 0.1 * var
        y = (x - mean) * (jax.lax.rsqrt(var + 1e-5) * self.scale)
        y = y + self.offset
        return y.astype(self.dtype)


class Norm(nn.Module):
    """Norm layer chosen by NormConfig; torch-parity constants
    (BatchNorm2d: eps 1e-5, momentum 0.1 -> flax momentum 0.9)."""

    cfg: NormConfig
    dtype: Dtype = jnp.bfloat16
    impl: OpImpl = DEFAULT_IMPL

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.cfg.kind == "batch":
            # Restructured batch statistics for full-res BN sites (~24 ms
            # of pathological reduce fusions at the r3 profile;
            # bn_stats.py): 'dot' = MXU dots, 'pallas' = one-pass Mosaic
            # reduction.  Shape-gated to the big-spatial stem-resolution
            # sites.  Same param/variable tree either way
            # (checkpoint-compatible).
            if (self.impl.bn_stats in ("dot", "pallas")
                    and x.ndim == 4
                    and x.shape[0] * x.shape[1] * x.shape[2]
                    >= self.impl.bn_stats_min):
                return _DotStatsBN(x.shape[-1], self.dtype,
                                   axis_name=self.cfg.axis_name,
                                   method=self.impl.bn_stats,
                                   name="BatchNorm_0")(x, train)
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                scale_init=norm_scale_init,
                axis_name=self.cfg.axis_name,
            )(x)
        if self.cfg.kind == "instance":
            # InstanceNorm2d(affine=False): per-sample per-channel over H,W
            return nn.GroupNorm(
                num_groups=None,
                group_size=1,
                epsilon=1e-5,
                use_bias=False,
                use_scale=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.cfg.kind == "none":
            return x
        raise NotImplementedError(f"norm [{self.cfg.kind}] not found")


def reflect_pad_concat(x, p: int):
    """Reflect-pad NHWC spatially by p using slice+concat (lowers to plain
    copies; jnp.pad(mode='reflect') lowers to gathers that cost measurably
    more inside the fused step)."""
    x = jnp.concatenate(
        [x[:, 1:p + 1][:, ::-1], x, x[:, -p - 1:-1][:, ::-1]], axis=1)
    x = jnp.concatenate(
        [x[:, :, 1:p + 1][:, :, ::-1], x, x[:, :, -p - 1:-1][:, :, ::-1]],
        axis=2)
    return x


def pad2d(x, pad: int, mode: str = "reflect"):
    """Spatial padding of NHWC tensors (reference uses nn.ReflectionPad2d /
    ReplicationPad2d ahead of VALID convs)."""
    if pad == 0:
        return x
    widths = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    if mode == "reflect":
        return reflect_pad_concat(x, pad)
    if mode == "replicate":
        return jnp.pad(x, widths, mode="edge")
    if mode == "zero":
        return jnp.pad(x, widths, mode="constant")
    raise NotImplementedError(f"padding [{mode}] is not implemented")


class PadConv(nn.Module):
    """pad(k//2 or explicit) -> Conv(VALID). The reference's
    ReflectionPad2d + Conv2d(padding=0) pattern.

    The hot 3x3/pad-1/reflect case routes through
    ops.reflect_conv.conv3_reflect — a fused zero-pad conv plus exact
    border corrections — because a materialized reflect pad cannot fuse
    into the TPU conv op (measured ~17% of the whole train step)."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    pad_mode: str = "reflect"
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    # params_only: declare kernel/bias and return them (compute-dtype cast)
    # instead of convolving — lets a parent fuse several PadConvs into one
    # conv (Generator fused stems) while keeping this param tree.
    params_only: bool = False
    # grad_split > 0: compute the conv as conv(x[..:s]) + conv(x[s:..]) on
    # input-channel blocks (bit-equivalent: zero contributions commute).
    # Used for discriminator stems inside the G loss, where only the first
    # `s` input channels (the generated image) carry gradient — the split
    # lets XLA dead-code the conditioning channels' input-gradient conv
    # (9.07 + 4.64 ms/step of MXU-starved 7x7 bwd at r3 profile).
    grad_split: int = 0
    impl: OpImpl = DEFAULT_IMPL

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", conv_init,
            (self.kernel, self.kernel, in_features, self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        bd = bias.astype(self.dtype) if bias is not None else None
        if self.params_only:
            return kd, bd

        s = self.grad_split
        if 0 < s < in_features and self.stride == 1:
            xp = pad2d(xd, self.pad, self.pad_mode)
            conv = lambda lhs, rhs: jax.lax.conv_general_dilated(
                lhs, rhs, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = (conv(xp[..., :s], kd[:, :, :s])
                 + conv(xp[..., s:], kd[:, :, s:]))
            if bd is not None:
                y = y + bd
            return checkpoint_name(y, "conv_out")

        # Reflect-conv implementation choice, A/B'd at full-step level on
        # the chip (r2: border 44.65 img/s vs concat 42.74; see BASELINE.md):
        #  'border' — zero-pad conv + exact 1-D border corrections
        #             (ops/reflect_conv.py) for 3x3; 7x7 stems use the
        #             concat-pad (equal to jnp.pad within noise).
        #  'concat' — slice+concat padded input, VALID conv everywhere.
        # The 7x7 border decomposition (24 corrections x 7 taps) measured
        # much worse (44.2 -> 32.8 img/s) and is never used.
        # Full-step A/B (r3, img/s): padadd 44.71 / 45.39 with the d2s
        # head; DUS border-correction ("border") 44.29.  padadd default.
        impl = self.impl.reflect
        if (impl in ("border", "dusonly", "padadd") and self.kernel == 3
                and self.pad == 1 and self.stride == 1
                and self.pad_mode == "reflect"):
            from mmhand_tpu.ops import reflect_conv as rc
            if impl == "dusonly":  # profiling-only, wrong numerics
                return checkpoint_name(
                    rc.conv3_reflect_dusonly(xd, kd, bd), "conv_out")
            if impl == "border":  # DUS formulation (pre-r3 default)
                return checkpoint_name(
                    rc._conv3_reflect_batched(xd, kd, bd), "conv_out")
            return checkpoint_name(rc.conv_reflect(xd, kd, bd), "conv_out")

        xd = pad2d(xd, self.pad, self.pad_mode)

        # Space-to-depth reformulation for MXU-starved stems/heads: the r3
        # xplane profile showed the 7x7 stems (Cin 3/6/24/42) at 15-33% MXU
        # and out_conv (Cout 3) at 2-5% — the channel dim is what the MXU
        # contracts/tiles over.  conv_s2d folds 2x2 pixels into channels
        # (exact; ops/s2d_conv.py); conv_d2s_out fattens the output tile.
        # Full-step A/B (r3, 256px batch16, img/s): direct 44.29; stem s2d
        # 40.67 (the (B,262,262,C) relayout passes cost more than the MXU
        # win — OFF by default); head d2s 44.99 (small real win — ON).
        if (self.stride == 1 and self.kernel > 1
                and self.pad * 2 + 1 == self.kernel):
            from mmhand_tpu.ops import s2d_conv
            hp, wp = xd.shape[1], xd.shape[2]
            ho, wo = hp - self.kernel + 1, wp - self.kernel + 1
            div2 = all(v % 2 == 0 for v in (hp, wp, ho, wo))
            # Spatial floor: below 128px output the fattened conv (10x10
            # kernel, stride 4 on a ~70px input) sends the XLA:TPU remote
            # compiler into a multi-minute tiling search (observed hang at
            # fineSize=64, r4) — a cousin of the small-spatial conv
            # SIGABRT in ops/reflect_conv.py.  The d2s win was only ever
            # measured at 256px; small sizes take the direct path.
            if (div2 and self.features <= 16 and in_features >= 32
                    and min(ho, wo) >= 128
                    and self.impl.head == "d2s"):
                f = 4 if ho % 4 == 0 and wo % 4 == 0 else 2
                return checkpoint_name(
                    s2d_conv.conv_d2s_out(xd, kd, bd, f=f), "conv_out")
            if (div2 and in_features <= 48 and self.features >= 32
                    and self.impl.stem == "s2d"):
                return checkpoint_name(
                    s2d_conv.conv_s2d(xd, kd, bd, f=2), "conv_out")

        y = jax.lax.conv_general_dilated(
            xd, kd, window_strides=(self.stride, self.stride),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bd is not None:
            y = y + bd
        return checkpoint_name(y, "conv_out")


class StridedConv(nn.Module):
    """Conv with torch-style symmetric zero padding (padding=1, k=3, s=2
    downsampling convs of the reference stems)."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    impl: OpImpl = DEFAULT_IMPL

    @nn.compact
    def __call__(self, x):
        p = self.padding
        if (self.impl.down == "s2d"
                and self.stride > 1
                and (x.shape[1] + 2 * p) % self.stride == 0
                and (x.shape[2] + 2 * p) % self.stride == 0):
            # stride-matched space-to-depth: zero FLOP overhead, but the
            # full-step A/B (r3) measured 37.91 vs 44.29 img/s — the input
            # relayout pass dominates; OFF by default, kept for profiling.
            # name="Conv_0" keeps the param tree identical to the nn.Conv
            # branch (checkpoint/converter compatibility).
            y = _S2dStrideConv(self.features, self.kernel, self.stride, p,
                               self.use_bias, self.dtype, name="Conv_0")(x)
            return checkpoint_name(y, "conv_out")
        return checkpoint_name(nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=self.use_bias,
            kernel_init=conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x), "conv_out")


class _S2dStrideConv(nn.Module):
    """Strided zero-padded conv via ops.s2d_conv.conv_stride_s2d with the
    same param names/shapes as nn.Conv ('kernel' HWIO, 'bias')."""

    features: int
    kernel: int
    stride: int
    padding: int
    use_bias: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        from mmhand_tpu.ops import s2d_conv
        kernel = self.param(
            "kernel", conv_init,
            (self.kernel, self.kernel, x.shape[-1], self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        p = self.padding
        xd = jnp.pad(x.astype(self.dtype), [(0, 0), (p, p), (p, p), (0, 0)])
        return s2d_conv.conv_stride_s2d(
            xd, kernel.astype(self.dtype), self.stride,
            bias.astype(self.dtype) if bias is not None else None)


class UpConv(nn.Module):
    """torch ConvTranspose2d(k, s, p, op) — default (3, 2, 1, 1), the
    reference generator's 2x upsampler (reference models/Generator.py:
    243-253) — implemented as an explicit input-dilated convolution so the
    geometry AND numerics match torch exactly (enables 1:1 weight ports,
    tools/convert_mmhand_torch.py):

    lhs_dilation=s, padding=(k-1-p, k-1-p+output_padding), with the kernel
    stored in torch-convT orientation (HWIO of the equivalent spatially
    flipped conv) — see the converter for the layout contract.
    """

    features: int
    use_bias: bool = False
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: Dtype = jnp.bfloat16
    impl: OpImpl = DEFAULT_IMPL

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k, s, p, op = (self.kernel_size, self.stride, self.padding,
                       self.output_padding)
        kernel = self.param("kernel", conv_init,
                            (k, k, in_features, self.features), jnp.float32)
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if (k, s, p, op) == (3, 2, 1, 1):
            y = _upconv3_pixel_shuffle(xd, kd, self.impl.upconv_shuffle)
        else:
            pad = (k - 1 - p, k - 1 - p + op)
            y = jax.lax.conv_general_dilated(
                xd, kd,
                window_strides=(1, 1),
                padding=(pad, pad),
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _upconv3_pixel_shuffle(x, w, impl: str = "stack"):
    """ConvTranspose2d(k3 s2 p1 op1) via output-parity decomposition.

    The lhs-dilated formulation computes a 3x3 conv at OUTPUT resolution
    over an input that is 3/4 zeros — 4x wasted MXU work that XLA:TPU does
    not elide.  Decompose by output parity instead
    (y[p,q] = sum_uv xd[p+u-1, q+v-1] w[u,v], xd nonzero at even indices):

      y[2i,   2j  ] = x[i,j]*w[1,1]                      (1x1 conv)
      y[2i,   2j+1] = x[i,j]*w[1,0] + x[i,j+1]*w[1,2]    (1x2 conv)
      y[2i+1, 2j  ] = x[i,j]*w[0,1] + x[i+1,j]*w[2,1]    (2x1 conv)
      y[2i+1, 2j+1] = sum over w[{0,2},{0,2}]            (2x2 conv)

    then interleave (pixel shuffle).  Exactly equal to the dilated form
    (verified vs torch in test_torch_parity.py and vs the dilated conv in
    test_models.py); ~4x fewer MAC ops.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]

    def conv(inp, kern, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            inp, kern, window_strides=(1, 1), padding=(pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # Interleave-implementation knob (r3): the original 3-stack interleave
    # ("stack") shows ~3-4 ms/step of f32 relayout copies in the xplane
    # profile; the candidates express the shuffle as depth_to_space on
    # channel-concatenated parity planes ("d2s"), or compute all four
    # parity planes with ONE 2x2 conv over an end-padded input ("conv4",
    # 16/9 the MACs but one dispatch + no plane concat).  All exact.
    if impl == "conv4":
        # K4[(u,v), :, (a,b,co)]: y[2i+a, 2j+b] = sum_uv xpad[i+u, j+v] K
        # with K derived from the parity decomposition below.
        k4 = jnp.zeros((2, 2, cin, 4, cout), w.dtype)
        k4 = k4.at[0, 0, :, 0].set(w[1, 1])              # ee
        k4 = k4.at[0, 0, :, 1].set(w[1, 0])              # eo taps
        k4 = k4.at[0, 1, :, 1].set(w[1, 2])
        k4 = k4.at[0, 0, :, 2].set(w[0, 1])              # oe taps
        k4 = k4.at[1, 0, :, 2].set(w[2, 1])
        k4 = k4.at[0, 0, :, 3].set(w[0, 0])              # oo taps
        k4 = k4.at[0, 1, :, 3].set(w[0, 2])
        k4 = k4.at[1, 0, :, 3].set(w[2, 0])
        k4 = k4.at[1, 1, :, 3].set(w[2, 2])
        y4 = conv(x, k4.reshape(2, 2, cin, 4 * cout), (0, 1), (0, 1))
        from mmhand_tpu.ops.s2d_conv import depth_to_space
        return depth_to_space(y4, 2)

    y_ee = conv(x, w[1:2, 1:2], (0, 0), (0, 0))
    y_eo = conv(x, w[1:2, 0::2], (0, 0), (0, 1))
    y_oe = conv(x, w[0::2, 1:2], (0, 1), (0, 0))
    y_oo = conv(x, w[0::2, 0::2], (0, 1), (0, 1))

    if impl == "d2s":
        from mmhand_tpu.ops.s2d_conv import depth_to_space
        return depth_to_space(
            jnp.concatenate([y_ee, y_eo, y_oe, y_oo], axis=-1), 2)

    # interleave columns then rows (pixel shuffle)
    top = jnp.stack([y_ee, y_eo], axis=3).reshape(b, h, 2 * wd, cout)
    bot = jnp.stack([y_oe, y_oo], axis=3).reshape(b, h, 2 * wd, cout)
    return jnp.stack([top, bot], axis=2).reshape(b, 2 * h, 2 * wd, cout)


class ConvNormRelu(nn.Module):
    """pad -> conv -> norm -> relu block used throughout stems."""

    features: int
    kernel: int
    norm: NormConfig
    stride: int = 1
    pad: int = 0
    pad_mode: str = "reflect"
    zero_pad_in_conv: bool = False  # torch-style conv padding instead of pre-pad
    dtype: Dtype = jnp.bfloat16
    conv_grad_split: int = 0  # see PadConv.grad_split
    impl: OpImpl = DEFAULT_IMPL

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.zero_pad_in_conv:
            x = StridedConv(self.features, self.kernel, self.stride,
                            padding=self.pad, use_bias=self.norm.use_bias,
                            dtype=self.dtype, impl=self.impl)(x)
        else:
            x = PadConv(self.features, self.kernel, self.stride, self.pad,
                        self.pad_mode, use_bias=self.norm.use_bias,
                        dtype=self.dtype,
                        grad_split=self.conv_grad_split,
                        impl=self.impl)(x)
        x = Norm(self.norm, dtype=self.dtype, impl=self.impl)(x, train)
        return nn.relu(x)

"""ResNet-style discriminator (reference models/Discriminator.py:8-155).

Structure: ReflectPad3+Conv7(ndf) -> stride-2 downsamples (2 default, or the
special-cased 3-downsample stack, reference :100-133) -> `n_blocks`
ResnetBlocks -> optional sigmoid.

Deliberately-preserved reference quirk: there is **no final 1-channel
projection** — the "logits" are the full ndf*4-channel feature map, consumed
directly by BCE-with-logits against an expanded scalar target
(reference models/network_utils.py:143-163, MMHandModel.py:238-244).

Two instances are trained (reference MMHandModel.py:50-68):
* D_PB on cat(image, 21-ch target heatmaps) = 24 input channels,
* D_PP on cat(generated, source image) = 6 input channels.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mmhand_tpu.models.layers import (
    DEFAULT_IMPL,
    ConvNormRelu,
    Norm,
    NormConfig,
    OpImpl,
    PadConv,
)

Dtype = Any


class ResnetBlock(nn.Module):
    """pad->conv->norm->relu->[dropout]->pad->conv->norm, residual add
    (reference Discriminator.py:8-55)."""

    dim: int
    norm: NormConfig
    use_dropout: bool
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.bfloat16
    impl: OpImpl = DEFAULT_IMPL

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ConvNormRelu(self.dim, 3, self.norm, pad=1,
                         pad_mode=self.pad_mode, dtype=self.dtype,
                         impl=self.impl)(x, train)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = PadConv(self.dim, 3, pad=1, pad_mode=self.pad_mode,
                    use_bias=self.norm.use_bias, dtype=self.dtype,
                    impl=self.impl)(h)
        h = Norm(self.norm, dtype=self.dtype, impl=self.impl)(h, train)
        return x + h


class Discriminator(nn.Module):
    """Input NHWC in [-1, 1]; output NHWC feature-map logits, float32."""

    ndf: int = 64
    n_blocks: int = 3          # --n_layers_D
    n_downsampling: int = 2
    norm: NormConfig = NormConfig()
    use_dropout: bool = True   # not --no_dropout_D
    pad_mode: str = "reflect"
    use_sigmoid: bool = False  # define_D always passes False (MMHandModel.py:190)
    dtype: Dtype = jnp.bfloat16
    # stem_grad_split > 0: compute the 7x7 stem as two channel-block convs
    # split at this input channel (PadConv.grad_split).  Bit-equivalent;
    # used by the train step's G-loss applies, where only the first 3 input
    # channels (the generated image) carry gradient — the conditioning
    # channels' MXU-starved input-gradient conv then dead-codes away.
    stem_grad_split: int = 0
    impl: OpImpl = DEFAULT_IMPL

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = ConvNormRelu(self.ndf, 7, self.norm, pad=3, pad_mode="reflect",
                         dtype=self.dtype, name="in_conv",
                         conv_grad_split=self.stem_grad_split,
                         impl=self.impl)(x, train)

        if self.n_downsampling <= 2:
            for i in range(self.n_downsampling):
                mult = 2 ** i
                x = ConvNormRelu(self.ndf * mult * 2, 3, self.norm, stride=2,
                                 pad=1, zero_pad_in_conv=True,
                                 dtype=self.dtype, impl=self.impl,
                                 name=f"down{i}")(x, train)
            mult = 2 ** self.n_downsampling
        elif self.n_downsampling == 3:
            # special case: third downsample keeps width at ndf*4
            # (reference Discriminator.py:100-133)
            for i, feats in enumerate(
                    [self.ndf * 2, self.ndf * 4, self.ndf * 4]):
                x = ConvNormRelu(feats, 3, self.norm, stride=2, pad=1,
                                 zero_pad_in_conv=True, dtype=self.dtype,
                                 impl=self.impl,
                                 name=f"down{i}")(x, train)
            mult = 4
        else:
            raise NotImplementedError(
                f"n_downsampling={self.n_downsampling} unsupported")

        for i in range(self.n_blocks):
            x = ResnetBlock(self.ndf * mult, self.norm, self.use_dropout,
                            self.pad_mode, dtype=self.dtype, impl=self.impl,
                            name=f"res{i}")(x, train)

        x = x.astype(jnp.float32)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x

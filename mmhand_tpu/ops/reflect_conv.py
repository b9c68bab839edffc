"""Fast exact reflect-padded convolution (stride 1, odd kernel).

The reference architecture reflect-pads before its convs — 1 px for every
3x3 (reference models/Generator.py:50-58) and 3 px for the 7x7 stems
(reference :158-165).  On TPU, `jnp.pad(mode='reflect')` materializes a new
padded tensor per conv that XLA cannot fuse into the convolution (only zero
padding is native) — measured cost: ~17% of the whole MM-Hand train step.

This module computes the SAME result without materializing the pad, using
linearity of convolution:

    conv_valid(reflect_pad(x, p)) = conv_same_zero(x) + conv(halo)

and the halo contribution decomposes into cheap 1-D convolutions along the
borders (O(W*C^2) each vs the full conv's O(H*W*C^2)):

* top/bottom: for each of the p border output rows, the kernel rows that
  fall outside the image read reflected rows; each (border row, kernel row)
  pair is one k-tap 1-D conv over a column-reflect-extended row.
* left/right: the remaining missing taps (in-range rows, out-of-range
  columns) are k-tap 1-D convs down reflected columns with zero row
  padding (row-out-of-range cells are already covered by top/bottom).

The 1-D convs are expressed as shifted matmuls: width-1 `lax.conv` forms
trigger XLA:TPU compiler crashes (SIGABRT) when fused into large graphs at
small spatial sizes.

Exactness is tested against jnp.pad reflect + VALID conv for k=3 and k=7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv1d_valid(x, w):
    """k-tap 1-D conv as shifted matmuls.

    x: (B, L + k - 1, Cin); w: (k, Cin, Cout); VALID -> (B, L, Cout)."""
    k = w.shape[0]
    length = x.shape[1] - k + 1

    def dot(a, kk):
        return jax.lax.dot_general(
            a, kk, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    acc = dot(x[:, 0:length], w[0])
    for t in range(1, k):
        acc = acc + dot(x[:, t:t + length], w[t])
    return acc


def _conv1d_same(x, w, pad: int):
    """zero-padded variant: x: (B, L, Cin) -> (B, L, Cout)."""
    xp = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)])
    return _conv1d_valid(xp, w)


def _reflect_ext(row, p: int):
    """Reflect-extend the length axis by p on each side: (B, W, C) ->
    (B, W + 2p, C)."""
    left = row[:, 1:p + 1][:, ::-1]
    right = row[:, -p - 1:-1][:, ::-1]
    return jnp.concatenate([left, row, right], axis=1)


def _conv3_reflect_batched(x, kernel, bias):
    """3x3/p=1 fast path for square inputs: all four border corrections as
    ONE 4-way batched matmul.

    The generic path issues 12 small dots + 4 dynamic-update-slices per conv
    site; with ~54 reflect-conv sites in the full GAN step those small ops
    are pure overhead (each is a 3-tap x Cin contraction — a fraction of an
    MXU tile).  Here each border's three taps are concatenated along the
    channel axis (contraction 3*Cin) and the four borders ride the batch
    dimension of a single dot_general:

      top    row 0   reads reflected row 1    -> kernel row 0 taps
      bottom row H-1 reads reflected row H-2  -> kernel row 2 taps
      left   col 0   reads col 1 (rows zero-padded; out-of-range rows are
                     already covered by top/bottom)  -> kernel col 0 taps
      right  col W-1 reads col W-2 (same)          -> kernel col 2 taps

    Exactly equal to the generic path (same tap algebra, test_ops.py).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # border source lines, each extended to length L+2 (L = W = H)
    top = _reflect_ext(x[:, 1], 1)                      # (B, W+2, C)
    bot = _reflect_ext(x[:, h - 2], 1)
    left = jnp.pad(x[:, :, 1], [(0, 0), (1, 1), (0, 0)])
    right = jnp.pad(x[:, :, w - 2], [(0, 0), (1, 1), (0, 0)])
    lines = jnp.stack([top, bot, left, right], 0)       # (4, B, L+2, C)

    # 3 shifted taps concatenated channelwise: (4, B, L, 3C) -> (4, B*L, 3C)
    lhs = jnp.concatenate(
        [lines[:, :, t:t + w] for t in range(3)], axis=-1)
    lhs = lhs.reshape(4, b * w, 3 * cin)
    # matching per-border kernels: (4, 3, C, Cout) -> (4, 3C, Cout)
    rhs = jnp.stack(
        [kernel[0], kernel[2], kernel[:, 0], kernel[:, 2]], 0)
    rhs = rhs.reshape(4, 3 * cin, cout)

    corr = jax.lax.dot_general(
        lhs, rhs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)
    corr = corr.reshape(4, b, w, cout)

    y = y.at[:, 0].add(corr[0])
    y = y.at[:, -1].add(corr[1])
    y = y.at[:, :, 0].add(corr[2])
    y = y.at[:, :, -1].add(corr[3])
    if bias is not None:
        y = y + bias
    return y


def _conv3_reflect_padadd(x, kernel, bias):
    """Same tap algebra as `_conv3_reflect_batched`, but the four border
    corrections are zero-padded to full (B,H,W,Cout) and ADDED instead of
    dynamic-update-sliced in.  The 4 DUS adds cost ~25 ms/step in the full
    GAN train step (measured r3 via MMHAND_REFLECT_IMPL=dusonly: 352 ms vs
    zero-pad 327 ms; correction matmuls are only ~12 ms) because each DUS
    forces a full-tensor copy XLA cannot elide.  `lax.pad` + add lowers to
    a single fusible elementwise pass (iota-select) over y that XLA can
    fold into the conv epilogue.  Numerically identical: corners receive
    the same additive top/bottom + left/right contributions either way.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    top = _reflect_ext(x[:, 1], 1)
    bot = _reflect_ext(x[:, h - 2], 1)
    left = jnp.pad(x[:, :, 1], [(0, 0), (1, 1), (0, 0)])
    right = jnp.pad(x[:, :, w - 2], [(0, 0), (1, 1), (0, 0)])
    lines = jnp.stack([top, bot, left, right], 0)       # (4, B, L+2, C)

    lhs = jnp.concatenate(
        [lines[:, :, t:t + w] for t in range(3)], axis=-1)
    lhs = lhs.reshape(4, b * w, 3 * cin)
    rhs = jnp.stack(
        [kernel[0], kernel[2], kernel[:, 0], kernel[:, 2]], 0)
    rhs = rhs.reshape(4, 3 * cin, cout)
    corr = jax.lax.dot_general(
        lhs, rhs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)
    corr = corr.reshape(4, b, w, cout)

    zero = jnp.zeros((), y.dtype)
    y = (y
         + jax.lax.pad(corr[0][:, None], zero,
                       [(0, 0, 0), (0, h - 1, 0), (0, 0, 0), (0, 0, 0)])
         + jax.lax.pad(corr[1][:, None], zero,
                       [(0, 0, 0), (h - 1, 0, 0), (0, 0, 0), (0, 0, 0)])
         + jax.lax.pad(corr[2][:, :, None], zero,
                       [(0, 0, 0), (0, 0, 0), (0, w - 1, 0), (0, 0, 0)])
         + jax.lax.pad(corr[3][:, :, None], zero,
                       [(0, 0, 0), (0, 0, 0), (w - 1, 0, 0), (0, 0, 0)]))
    if bias is not None:
        y = y + bias
    return y


def conv3_reflect_dusonly(x, kernel, bias):
    """PROFILING ONLY — WRONG NUMERICS.  Keeps the border-line stacking and
    the 4 dynamic-update-slice adds of the batched fast path but replaces
    the correction matmuls with a free broadcast, isolating the DUS/copy
    cost from the matmul cost (MMHAND_REFLECT_IMPL=dusonly)."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    top = _reflect_ext(x[:, 1], 1)
    bot = _reflect_ext(x[:, h - 2], 1)
    left = jnp.pad(x[:, :, 1], [(0, 0), (1, 1), (0, 0)])
    right = jnp.pad(x[:, :, w - 2], [(0, 0), (1, 1), (0, 0)])
    lines = jnp.stack([top, bot, left, right], 0)
    corr = jnp.broadcast_to(lines[:, :, 1:w + 1, :1],
                            (4, b, w, cout)).astype(x.dtype)
    y = y.at[:, 0].add(corr[0])
    y = y.at[:, -1].add(corr[1])
    y = y.at[:, :, 0].add(corr[2])
    y = y.at[:, :, -1].add(corr[3])
    if bias is not None:
        y = y + bias
    return y


def conv_reflect(x, kernel, bias=None):
    """Exact reflect-pad(p) + kxk VALID conv, NHWC, stride 1, k odd.

    Args:
      x: (B, H, W, Cin); kernel: (k, k, Cin, Cout); bias: (Cout,) or None.
    Returns:
      (B, H, W, Cout), identical to conv(jnp.pad(x, reflect), VALID).
    """
    k = kernel.shape[0]
    p = k // 2
    if k == 3 and x.shape[1] == x.shape[2] and x.shape[1] >= 4:
        # padadd beats the DUS formulation in the full GAN step
        # (45.39 vs 44.29 img/s with the d2s head, r3 A/B).
        return _conv3_reflect_padadd(x, kernel, bias)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    h = x.shape[1]

    # --- top/bottom border rows (these also cover the corners)
    for i in range(p):
        corr = None
        for t in range(p - i):
            # kernel row t reads input row i-p+t < 0 -> reflected row p-i-t
            c = _conv1d_valid(_reflect_ext(x[:, p - i - t], p), kernel[t])
            corr = c if corr is None else corr + c
        y = y.at[:, i].add(corr)

        corr = None
        for u in range(p - i):
            # kernel row p+i+1+u reads row >= H -> reflected row H-2-u
            c = _conv1d_valid(_reflect_ext(x[:, h - 2 - u], p),
                              kernel[p + i + 1 + u])
            corr = c if corr is None else corr + c
        y = y.at[:, -1 - i].add(corr)

    # --- left/right border columns (in-range rows only: zero row padding)
    w_dim = x.shape[2]
    for j in range(p):
        corr = None
        for t in range(p - j):
            c = _conv1d_same(x[:, :, p - j - t], kernel[:, t], p)
            corr = c if corr is None else corr + c
        y = y.at[:, :, j].add(corr)

        corr = None
        for u in range(p - j):
            c = _conv1d_same(x[:, :, w_dim - 2 - u], kernel[:, p + j + 1 + u],
                             p)
            corr = c if corr is None else corr + c
        y = y.at[:, :, -1 - j].add(corr)

    if bias is not None:
        y = y + bias
    return y


def conv3_reflect(x, kernel, bias=None):
    """3x3 special case (kept as the public name used by PadConv)."""
    return conv_reflect(x, kernel, bias)

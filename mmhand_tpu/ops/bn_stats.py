"""BatchNorm batch-statistics off the XLA reduce emitter (bn_stats knob).

Motivation (r3 xplane profile, 256px batch-16 full step): the full-res
BatchNorm statistic reductions — `convert_reduce_fusion` ops producing
(f32[64] sum, f32[64] sum-sq, bf16[16,256,256,64]) — measure 2-4.7 ms
each, ~24 ms/step over the 8 stem-resolution sites, vs a ~0.5 ms
HBM-roofline expectation.  XLA:TPU's reduce emitter walks the conv
layout's major dims inefficiently at these shapes.  Two alternative
formulations, selected by ModelConfig.bn_stats:

* ``dot``: stream the tensor through the MXU —

      sum_j  x[n, j]          = ones(1, N) @ x            (N = B*H*W)
      sum_j  x[n, j] x[n, j]  = diag(x^T @ x)             (Gram diagonal)

  bf16 products are exact in the MXU's f32 accumulators, so this is the
  same class of f32 summation flax performs (reduction order differs ->
  the usual f32 tolerance).  The Gram costs N*C^2 MACs.  **Measured
  full-step LOSER** (43.34 vs 44.23 control, r4 A/B): the extra MACs +
  the diag'd Gram's wasted off-diagonal work exceed the prize.

* ``pallas``: a one-pass Mosaic reduction kernel — grid over row tiles
  of the (N, C) view, f32 accumulation of (sum, sum-sq) into a revisited
  (1, C) output block.  Reads x exactly once and adds ZERO matmul work.
  **Measured full-step LOSER too** (43.57 vs 45.87 control, r4c):
  isolated fetch-synced timing shows the kernel at ~2x the reduce
  emitter's cost on the C=64 sites — a bf16 (N, 64) array is lane-padded
  to 128, so the (N,64)->(N/2,128) packing view is a relayout copy, not
  a bitcast, and the unpacked kernel half-fills the VPU lanes.  With all
  three formulations measured (reduce/dot/pallas), the stat bucket is
  irreducible: the profile cost lives in the producing conv+cast
  fusion's HBM traffic, not in the statistics computation (BASELINE.md
  r4c section).  Kept behind the knob for profiling.

Both share the analytic backward (custom_vjp): the elementwise form
d(sum)/dx = 1, d(sum_sq)/dx = 2x — identical math to autodiff of the
reduce formulation, and fusable into neighbouring elementwise work —
instead of autodiff of the forward, which would emit an extra x-sized
HBM pass (dot) or require a transposed kernel (pallas).

The reference has no analog (torch BN statistics are cuDNN-internal,
reference models/network_utils.py:74-84 just selects BatchNorm2d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


@jax.custom_vjp
def _sums_2d(x2d):
    """(N, C) -> (sum f32[C], sum_sq f32[C]) via two MXU dots."""
    n = x2d.shape[0]
    ones = jnp.ones((1, n), x2d.dtype)
    s1 = lax.dot_general(
        ones, x2d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    gram = lax.dot_general(
        x2d, x2d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return s1, jnp.diagonal(gram)


def _sums_2d_fwd(x2d):
    return _sums_2d(x2d), x2d


def _sums_2d_bwd(x2d, g):
    g1, g2 = g
    dx = g1.astype(jnp.float32) \
        + 2.0 * g2.astype(jnp.float32) * x2d.astype(jnp.float32)
    return (dx.astype(x2d.dtype),)


_sums_2d.defvjp(_sums_2d_fwd, _sums_2d_bwd)


# ----------------------------------------------------------------------------
# Pallas one-pass moments
# ----------------------------------------------------------------------------

def _moments_kernel(x_ref, s1_ref, s2_ref):
    """Accumulate (sum, sum-sq) of a (TN, C) tile into revisited (1, C)
    f32 outputs; grid dim 0 walks the row tiles sequentially."""
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    s1 = jnp.sum(x, axis=0, keepdims=True)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        s1_ref[...] = s1
        s2_ref[...] = s2

    @pl.when(i > 0)
    def _acc():
        s1_ref[...] = s1_ref[...] + s1
        s2_ref[...] = s2_ref[...] + s2


def _row_tile(n: int, c: int, budget_bytes: int = 1 << 21) -> int:
    """Largest row-tile TN dividing n with TN*C*2 bytes under the VMEM
    budget (bf16 input tiles), sublane-aligned when possible."""
    tn = max(1, min(n, budget_bytes // (2 * c)))
    while n % tn:
        tn -= 1
    return tn


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _sums_2d_pallas(x2d):
    n, c = x2d.shape
    # Lane packing: a (TN, C<128) block half-fills the VPU's 128-lane
    # tiles (2x HBM traffic for C=64).  When 128 % C == 0, view the
    # contiguous buffer as (N/p, p*C) — row r lands in lane group r%p —
    # and fold the p per-group partial sums afterwards (free bitcast,
    # one tiny add).
    pack = 128 // c if (c < 128 and 128 % c == 0 and n % (128 // c) == 0) \
        else 1
    xv = x2d.reshape(n // pack, pack * c)
    nv, cv = xv.shape
    tn = _row_tile(nv, cv)
    s1, s2 = pl.pallas_call(
        _moments_kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(nv // tn,),
        in_specs=[pl.BlockSpec((tn, cv), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((1, cv), lambda i: (0, 0)),
                   pl.BlockSpec((1, cv), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((1, cv), jnp.float32),
                   jax.ShapeDtypeStruct((1, cv), jnp.float32)),
        # grid dim 0 carries the accumulation -> needs the default
        # sequential ("arbitrary") TPU semantics; do NOT mark it parallel
    )(xv)
    if pack > 1:
        return s1.reshape(pack, c).sum(0), s2.reshape(pack, c).sum(0)
    return s1[0], s2[0]


def _sums_2d_pallas_fwd(x2d):
    return _sums_2d_pallas(x2d), x2d


_sums_2d_pallas.defvjp(_sums_2d_pallas_fwd, _sums_2d_bwd)


def bn_moments(x, method: str = "dot"):
    """Per-channel (mean, mean-of-squares) of an (..., C) tensor, f32.

    Drop-in for flax BatchNorm's `jnp.mean(x)` / `jnp.mean(x*x)` statistic
    reductions (same f32 summation class; see module docstring).
    method: 'dot' (MXU dots) | 'pallas' (one-pass Mosaic reduction).
    """
    c = x.shape[-1]
    x2d = x.reshape(-1, c)
    n = x2d.shape[0]
    if method == "pallas":
        s1, s2 = _sums_2d_pallas(x2d)
    else:
        s1, s2 = _sums_2d(x2d)
    return s1 / n, s2 / n

"""BatchNorm batch-statistics via MXU dot-products (MMHAND_BN_STATS=dot).

Motivation (r3 xplane profile, 256px batch-16 full step): the full-res
BatchNorm statistic reductions — `convert_reduce_fusion` ops producing
(f32[64] sum, f32[64] sum-sq, bf16[16,256,256,64]) — measure 2-4.7 ms
each, ~24 ms/step over the 8 stem-resolution sites, vs a ~0.5 ms
HBM-roofline expectation.  XLA:TPU's reduce emitter walks the conv
layout's major dims inefficiently at these shapes; a matmul formulation
streams the tensor through the MXU instead:

    sum_j  x[n, j]          = ones(1, N) @ x            (N = B*H*W)
    sum_j  x[n, j] x[n, j]  = diag(x^T @ x)             (Gram diagonal)

bf16 products are exact in the MXU's f32 accumulators, so this is the
same class of f32 summation flax performs (reduction order differs -> the
usual f32 tolerance).  The Gram costs N*C^2 MACs — negligible next to
HBM time for the starved full-res sites this targets (C<=192), which is
why the Norm router gates on B*H*W (layers.py).

The backward pass is defined analytically (custom_vjp) as the elementwise
form d(sum)/dx = 1, d(sum_sq)/dx = 2x — identical math to autodiff of the
reduce formulation, and fusable into neighbouring elementwise work —
instead of autodiff of the dots, which would emit an x @ sym(dG) matmul
(an extra x-sized HBM pass) in the backward.

The reference has no analog (torch BN statistics are cuDNN-internal,
reference models/network_utils.py:74-84 just selects BatchNorm2d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


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


def bn_moments(x):
    """Per-channel (mean, mean-of-squares) of an (..., C) tensor, f32.

    Drop-in for flax BatchNorm's `jnp.mean(x)` / `jnp.mean(x*x)` statistic
    reductions (same f32 summation class; see module docstring).
    """
    c = x.shape[-1]
    x2d = x.reshape(-1, c)
    n = x2d.shape[0]
    s1, s2 = _sums_2d(x2d)
    return s1 / n, s2 / n

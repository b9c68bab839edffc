"""Device-resident image replay pool.

Functional port of the reference's ImagePool (reference util/image_pool.py:
7-34): a buffer of up to `pool_size` past fakes; per query image, while the
pool is filling the image is stored and returned as-is; once full, with
p=0.5 a random stored fake is returned (and replaced by the new one),
otherwise the new image passes through.

TPU-native: the pool lives in HBM as a fixed-shape ring array inside the
train state; `query` is pure (threads a PRNG key) and runs inside the jitted
step — no host round-trip per batch, unlike the reference's python-list pool.
Per-image sequential semantics are kept via a fori_loop over the (static)
batch dimension.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PoolState(NamedTuple):
    images: jnp.ndarray  # (pool_size, H, W, C)
    num: jnp.ndarray     # () int32 — count of stored images


def pool_init(pool_size: int, image_shape, dtype=jnp.float32) -> PoolState:
    return PoolState(
        images=jnp.zeros((pool_size, *image_shape), dtype),
        num=jnp.zeros((), jnp.int32),
    )


def pool_query(state: PoolState, batch, rng):
    """Query the pool with a batch of fakes.

    Returns (new_state, replayed_batch) with replayed_batch the mix of
    stored and fresh images per the reference's per-image policy.
    A pool_size of 0 passes the batch through (reference :15-16).
    """
    pool_size = state.images.shape[0]
    if pool_size == 0:
        return state, batch
    batch = batch.astype(state.images.dtype)  # bf16 pools: cast on entry
    bsz = batch.shape[0]

    def body(i, carry):
        images, num, out = carry
        img = jax.lax.dynamic_index_in_dim(batch, i, keepdims=False)
        key = jax.random.fold_in(rng, i)
        k_swap, k_idx = jax.random.split(key)

        def fill(_):
            return (jax.lax.dynamic_update_index_in_dim(images, img, num, 0),
                    num + 1, img)

        def full(_):
            p = jax.random.uniform(k_swap)
            rid = jax.random.randint(k_idx, (), 0, pool_size)

            def swap(_):
                old = jax.lax.dynamic_index_in_dim(images, rid, keepdims=False)
                return (jax.lax.dynamic_update_index_in_dim(images, img, rid, 0),
                        num, old)

            def passthrough(_):
                return images, num, img

            return jax.lax.cond(p > 0.5, swap, passthrough, None)

        new_images, new_num, ret = jax.lax.cond(num < pool_size, fill, full, None)
        out = jax.lax.dynamic_update_index_in_dim(out, ret, i, 0)
        return new_images, new_num, out

    init_out = jnp.zeros_like(batch)
    images, num, out = jax.lax.fori_loop(
        0, bsz, body, (state.images, state.num, init_out))
    return PoolState(images=images, num=num), out

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

    Exact-semantics vectorization: the reference processes images one at a
    time (fill while not full; afterwards p=.5 swap-with-random-slot).  A
    naive fori_loop carries the whole buffer through B iterations of conds
    (measured 3.1 ms/query at 256px — pure HBM shuffling).  Instead the
    per-image decisions (which touch only scalars: the fill counter, swap
    coins, slot ids, and who-wrote-a-slot-last bookkeeping) are computed as
    vectorized index math, then the buffer is rebuilt in ONE gather and the
    replay batch in one gather — identical results, single pass over HBM.
    """
    pool_size = state.images.shape[0]
    if pool_size == 0:
        return state, batch
    batch = batch.astype(state.images.dtype)  # bf16 pools: cast on entry
    bsz = batch.shape[0]

    i_idx = jnp.arange(bsz)
    # draws are made per-image WITHOUT vmap: the hardware 'rbg' PRNG
    # (utils/fast_prng.py) is not vmap-invariant, and these must equal the
    # sequential reference stream exactly under any PRNG implementation
    ps, rids = [], []
    for i in range(bsz):
        k_swap, k_slot = jax.random.split(jax.random.fold_in(rng, i))
        ps.append(jax.random.uniform(k_swap))
        rids.append(jax.random.randint(k_slot, (), 0, pool_size))
    p = jnp.stack(ps)                                          # (B,)
    rid = jnp.stack(rids)

    # image i fills while the pool is not yet full: exactly images with
    # num0 + i < pool_size; its slot is num0 + i
    fills = state.num + i_idx < pool_size                      # (B,)
    swaps = jnp.logical_and(~fills, p > 0.5)                   # (B,)
    writes = jnp.logical_or(fills, swaps)
    slot = jnp.where(fills, state.num + i_idx, rid)            # (B,)

    # last writer per pool slot (or -1): writers with larger i win,
    # matching the sequential order
    writer_i = jnp.where(writes, i_idx, -1)                    # (B,)
    onehot = (slot[None, :] == jnp.arange(pool_size)[:, None])  # (P, B)
    last_writer = jnp.max(jnp.where(onehot, writer_i[None, :], -1), axis=1)

    # new buffer: one gather over the batch
    new_images = jnp.where(
        (last_writer >= 0)[:, None, None, None],
        batch[jnp.maximum(last_writer, 0)], state.images)
    new_num = jnp.minimum(state.num + bsz, pool_size)

    # replay batch: swap images return the value their slot held JUST
    # BEFORE their own write — i.e. the latest earlier writer to that
    # slot, else the original buffer content; everyone else passes through
    match = slot[None, :] == rid[:, None]                      # (B_i, B_j)
    earlier = jnp.logical_and(match, writer_i[None, :] < i_idx[:, None])
    prev_writer = jnp.max(
        jnp.where(earlier, writer_i[None, :], -1), axis=1)     # (B,)
    from_batch = batch[jnp.maximum(prev_writer, 0)]
    from_pool = state.images[rid]
    replayed = jnp.where(
        swaps[:, None, None, None],
        jnp.where((prev_writer >= 0)[:, None, None, None],
                  from_batch, from_pool),
        batch)
    return PoolState(images=new_images, num=new_num), replayed

"""Data-parallel train step via shard_map.

TPU-native replacement for the reference's APEX DDP + NCCL stack
(reference models/MMHandModel.py:99-116):

* batch sharded over the `data` mesh axis; params/optimizer state replicated;
* gradients `pmean`'d inside the step (XLA schedules the collectives after
  backward — the `delay_allreduce=True` behavior for free);
* BatchNorm batch statistics psum'd cross-replica via the same axis name
  (`convert_syncbn_model` equivalent, mean-of-moments not mean-of-means);
* image pools are PER-REPLICA, exactly like the reference's per-rank
  ImagePool instances — in the global state they carry a leading device
  axis sharded over `data`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mmhand_tpu.train.state import MMHandSystem, MMHandTrainState
from mmhand_tpu.train.step import make_train_step


def replicate_state_for_mesh(state: MMHandTrainState, mesh: Mesh,
                             local: bool = False) -> MMHandTrainState:
    """Add the leading per-device axis to the pool buffers (everything else
    stays replicated).  `local=True` sizes the axis to this process's
    devices only (multi-host: each host materializes just its shard, to be
    assembled with host_local_array_to_global_array)."""
    n = mesh.local_mesh.size if local else mesh.devices.size
    stack = lambda x: jnp.broadcast_to(x[None], (n, *x.shape))
    return state.replace(
        pool_pb=jax.tree.map(stack, state.pool_pb),
        pool_pp=jax.tree.map(stack, state.pool_pp),
    )


def _state_specs(axis: str) -> MMHandTrainState:
    """PartitionSpec tree for the (pool-stacked) global state."""
    spec = MMHandTrainState(
        step=P(), g=P(), d_pb=P(), d_pp=P(),
        opt_g=P(), opt_d_pb=P(), opt_d_pp=P(),
        pool_pb=P(axis), pool_pp=P(axis), rng=P())
    return spec


def make_sharded_train_step(system: MMHandSystem, l1_loss, mesh: Mesh):
    """Build the jitted, shard_map'd step.

    `system` must have been constructed with axis_name matching the mesh
    axis (so BatchNorm syncs).  Returns step(state, batch, lr) operating on
    a pool-stacked state (see replicate_state_for_mesh) and a GLOBAL batch
    (leading dim = global batch size, divisible by mesh size).
    """
    axis = system.axis_name
    assert axis is not None, "system must be built with axis_name for DP"
    core = make_train_step(system, l1_loss)

    def local_step(state, batch, lr):
        # strip the (local size 1) device axis off the pools
        s = state.replace(
            pool_pb=jax.tree.map(lambda x: x[0], state.pool_pb),
            pool_pp=jax.tree.map(lambda x: x[0], state.pool_pp))
        s, metrics = core(s, batch, lr)
        s = s.replace(
            pool_pb=jax.tree.map(lambda x: x[None], s.pool_pb),
            pool_pp=jax.tree.map(lambda x: x[None], s.pool_pp))
        return s, metrics

    specs = _state_specs(axis)
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(specs, P(axis), P()),
        out_specs=(specs, P()),
        check_vma=False,
    )
    # Donate the state buffer (matches the single-device path,
    # train/loop.py): without donation a v5e-8 holds TWO copies of
    # params + 3x Adam state + the per-device pool stacks across the
    # step boundary — pool stacks alone are 2 pools x 2 stacks x
    # n_dev x [50,256,256,{24,6}] bf16 (~3.4 GB/dev at batch-16
    # shapes), which is exactly the headroom that already OOMs
    # batch 32 single-chip (BASELINE.md).
    return jax.jit(sharded, donate_argnums=(0,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch sharded over the mesh's data axis."""
    sharding = jax.sharding.NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_global(tree, mesh: Mesh, specs):
    """Multi-host assembly: each process holds its local shard (or the
    replicated value for P() leaves); build the global jax.Arrays
    (the TPU equivalent of scattering per-rank tensors under NCCL)."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        tree, mesh, specs)


def state_specs(axis: str) -> MMHandTrainState:
    """Public alias of the train-state PartitionSpec tree."""
    return _state_specs(axis)

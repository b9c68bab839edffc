"""Training loop orchestration (reference train.py:10-65).

Epoch/iter loop: prepare-on-device -> jitted step -> periodic
print/visualize/save, per-epoch LR recompute (no re-jit: lr is a traced
scalar), deterministic per-epoch reshuffle keyed by (seed, epoch) — the
`DistributedSampler.set_epoch` equivalent (reference train.py:52-53).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from mmhand_tpu.config import Config
from mmhand_tpu.data import HostLoader, build_dataset, make_prepare_batch
from mmhand_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate_state_for_mesh,
    shard_batch,
)
from mmhand_tpu.train.state import MMHandSystem
from mmhand_tpu.train.step import LRSchedule, make_train_step
from mmhand_tpu.utils.checkpoint import CheckpointManager
from mmhand_tpu.utils.logging import Visualizer
from mmhand_tpu.utils.visualize import seven_tile_strip


@dataclass
class TrainResult:
    state: object
    steps: int
    last_metrics: dict


def build_system(cfg: Config, vgg_npz: Optional[str] = None):
    """System + l1 loss, data-parallel when >1 device is visible."""
    n_dev = jax.device_count()
    axis = "data" if n_dev > 1 else None
    system = MMHandSystem(cfg, axis_name=axis)
    if cfg.loss.l1_type == "origin":
        l1 = None
    else:
        if vgg_npz:
            from mmhand_tpu.models.vgg import load_vgg19_npz
            vgg_vars = load_vgg19_npz(vgg_npz, cfg.loss.perceptual_layers)
        else:
            import warnings
            warnings.warn(
                "perceptual loss running with RANDOM VGG19 weights (a "
                "random-projection loss, structurally valid but NOT the "
                "reference's ImageNet-VGG perceptual term; pass "
                "--vgg_npz converted weights for parity)", stacklevel=2)
            # PRNGKey(1) == the bench/tools seed: the random VGG weights
            # embed as jaxpr CONSTANTS, so the persistent compile cache
            # only hits across entry points when the values match
            vgg_vars = system.make_l1_loss(None).init_vgg(
                jax.random.PRNGKey(1),
                (1, cfg.model.fine_size, cfg.model.fine_size, 3))
        l1 = system.make_l1_loss(vgg_vars)
    return system, l1


def train(cfg: Config, *, max_steps: Optional[int] = None,
          vgg_npz: Optional[str] = None, total_epochs: Optional[int] = None,
          host_id: int = 0, num_hosts: int = 1) -> TrainResult:
    n_dev = jax.device_count()        # global across all hosts
    n_local = jax.local_device_count()
    multiprocess = num_hosts > 1
    distributed = n_dev > 1
    master = host_id == 0

    system, l1 = build_system(cfg, vgg_npz)
    rng = jax.random.PRNGKey(cfg.data.seed)
    # per-device batch (reference splits the global batch per rank,
    # options/base_options.py:178); n_dev already counts every host's chips
    local_bsz = max(1, cfg.data.batch_size // n_dev)
    state = system.init_state(rng, local_batch_size=local_bsz)

    ckpt = CheckpointManager(cfg.run.checkpoints_dir, cfg.run.name)
    sched = LRSchedule(cfg)
    sched_path = os.path.join(
        cfg.run.checkpoints_dir, cfg.run.name, "lr_sched.json")
    resume = cfg.run.continue_train and ckpt.has(cfg.run.which_epoch)

    if distributed:
        from jax.sharding import PartitionSpec as P
        mesh = make_mesh()
        step_fn = make_sharded_train_step(system, l1, mesh)
        if resume and multiprocess:
            # checkpoints store GLOBALLY stacked pools (allgathered at
            # save); restore the full state on every host, then keep only
            # this host's pool shard before global assembly
            template = jax.device_get(
                replicate_state_for_mesh(state, mesh, local=False))
            restored = ckpt.restore(template, cfg.run.which_epoch)
            lo = host_id * n_local
            state = restored.replace(
                pool_pb=jax.tree.map(
                    lambda x: x[lo:lo + n_local], restored.pool_pb),
                pool_pp=jax.tree.map(
                    lambda x: x[lo:lo + n_local], restored.pool_pp))
        else:
            state = replicate_state_for_mesh(state, mesh,
                                             local=multiprocess)
            if resume:
                state = ckpt.restore(state, cfg.run.which_epoch)
        if multiprocess:
            # assemble per-host shards into global jax.Arrays (DCN path)
            from mmhand_tpu.parallel.sharding import make_global, state_specs
            state = make_global(state, mesh, state_specs("data"))
            place = lambda b: make_global(
                b, mesh, jax.tree.map(lambda _: P("data"), b))
        else:
            place = lambda b: shard_batch(b, mesh)
    else:
        mesh = None
        from mmhand_tpu.utils.runtime import lazy_aot
        step_fn = lazy_aot(jax.jit(make_train_step(system, l1),
                                   donate_argnums=(0,)))
        place = lambda b: b
        if resume:
            state = ckpt.restore(state, cfg.run.which_epoch)

    if resume and os.path.exists(sched_path):  # plateau state sidecar
        with open(sched_path) as fh:
            sched.load_state_dict(json.load(fh))

    vis = Visualizer(cfg.run.checkpoints_dir, cfg.run.name, master=master)
    vis.save_options(cfg)

    dataset = build_dataset(cfg)
    # per-device batch times THIS host's devices = the host's slice
    host_bsz = local_bsz * n_local
    loader = HostLoader(dataset, host_bsz, seed=cfg.data.seed,
                        host_id=host_id, num_hosts=num_hosts,
                        shuffle=not cfg.data.serial_batches,
                        num_threads=cfg.data.n_threads,
                        max_items=cfg.data.max_dataset_size)
    prepare = make_prepare_batch(cfg.data.sigma)

    epochs_end = total_epochs if total_epochs is not None else (
        cfg.optim.niter + cfg.optim.niter_decay)
    total_steps = 0
    metrics = {}
    last_batch = None
    plateau = cfg.optim.lr_policy == "plateau"
    epoch_metric = None  # last epoch's mean G objective (plateau input)
    for epoch in range(cfg.optim.epoch_count, epochs_end + 1):
        lr = sched.epoch_lr(epoch - cfg.optim.epoch_count, epoch_metric)
        if plateau and master:
            os.makedirs(os.path.dirname(sched_path), exist_ok=True)
            with open(sched_path, "w") as fh:
                json.dump(sched.state_dict(), fh)
        epoch_losses = []  # device scalars, fetched once per epoch
        epoch_start = time.time()
        for raw in loader.epoch(epoch):
            t0 = time.time()
            batch = prepare({k: v for k, v in raw.items()
                             if not k.endswith("paths")})
            batch = place(batch)
            state, metrics = step_fn(state, batch, lr)
            total_steps += 1
            last_batch = batch
            if plateau:
                epoch_losses.append(
                    metrics["pair_L1loss"] + metrics["pair_GANloss"])

            if total_steps % cfg.run.print_freq == 0:
                jax.block_until_ready(metrics)
                errors = {k: float(v) for k, v in metrics.items()}
                vis.print_current_errors(
                    epoch, total_steps, errors,
                    (time.time() - t0) / host_bsz)
                if cfg.run.display_id > 0:  # live chart (reference
                    # train.py:41-44 plots at print_freq when display_id>0)
                    spe = max(1, loader.steps_per_epoch())
                    vis.plot_current_errors(
                        epoch, (total_steps % spe) / spe, errors)
            if (total_steps % cfg.run.display_freq == 0 and master
                    and not multiprocess):  # snapshot fetches device->host
                _save_snapshot(vis, system, state, batch, mesh,
                               f"epoch{epoch:03d}_step{total_steps}.png")
            if total_steps % cfg.run.save_latest_freq == 0:
                ckpt.save(state, "latest")
            if max_steps and total_steps >= max_steps:
                ckpt.save(state, "latest")
                return TrainResult(state, total_steps,
                                   {k: float(v) for k, v in metrics.items()})

        if plateau and epoch_losses:
            epoch_metric = float(np.mean(
                [float(x) for x in jax.device_get(epoch_losses)]))
        if epoch % cfg.run.save_epoch_freq == 0:
            ckpt.save(state, str(epoch))
            ckpt.save(state, "latest")
        if master:
            print(f"End of epoch {epoch} / {epochs_end} \t"
                  f"Time Taken: {time.time() - epoch_start:.0f} sec")

    ckpt.save(state, "latest")
    return TrainResult(state, total_steps,
                       {k: float(v) for k, v in metrics.items()})


def _save_snapshot(vis, system, state, batch, mesh, name):
    """7-tile [H1,P1,D1,H2,P2,D2,fake] strip (reference MMHandModel.py:343-369)."""
    from mmhand_tpu.train.step import make_eval_step
    eval_step = make_eval_step(system)
    host_batch = jax.device_get(batch)
    one = {k: v[:1] for k, v in host_batch.items()}
    fake = np.asarray(eval_step(state.g, one))
    strip = seven_tile_strip(one["H1"], one["P1"], one["D1"],
                             one["H2"], one["P2"], one["D2"], fake)
    vis.save_image(strip, name)

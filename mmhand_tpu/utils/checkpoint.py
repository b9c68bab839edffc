"""Checkpoint / resume.

Reference contract (reference models/base_model.py:8-87, train.py:44-60):
per-network `.pth` files labeled `latest` on a step cadence and by epoch
number, consumers hard-coding `latest_net_netG.pth` (reference aug.py:26-27).

TPU-native: one orbax checkpoint of the entire functional train state
(G/D_PB/D_PP params+batch_stats, 3 optimizer states, pools, step, rng) per
label, with the same `latest` + per-epoch labeling scheme.  Single-write
(process 0) like the reference's master-rank gating (base_model.py:48).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, checkpoints_dir: str, name: str):
        self.root = os.path.abspath(os.path.join(checkpoints_dir, name))
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, label: str) -> str:
        return os.path.join(self.root, f"state_{label}")

    def save(self, state: Any, label: str = "latest") -> None:
        """Save under `label` (reference save_network base_model.py:37-57).

        Multi-host: cross-process-sharded leaves (the per-replica pools)
        are allgathered to host memory first, then EVERY process calls the
        orbax save (it synchronizes internally and gates the actual write
        to the primary host — the reference's master-rank gating,
        base_model.py:48)."""
        path = self._path(label)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            state = multihost_utils.process_allgather(state, tiled=True)
            self._ckptr.save(path, state, force=True)
            return
        self._ckptr.save(path, jax.device_get(state), force=True)

    def restore(self, template: Any, label: str = "latest",
                place: bool = False) -> Any:
        """Restore into the structure of `template`
        (reference load_network base_model.py:60-80).

        `place=True` device_puts the restored tree onto the default device
        in one bulk transfer.  Orbax returns HOST numpy arrays; an eval
        loop that calls a jitted function with them re-uploads every leaf
        on EVERY call (measured r5: 8.4 s/batch for the generator's eval
        forward through the tunnel — 160x the compute).  Training loops
        don't need it (the step donates + returns device state), and
        multi-process restores must stay host-side for global reassembly
        (train/loop.py), hence opt-in."""
        path = self._path(label)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no checkpoint labeled '{label}' under {self.root}")
        restored = self._ckptr.restore(path, item=template)
        if place:
            restored = jax.device_put(restored, jax.devices()[0])
            jax.block_until_ready(restored)
        return restored

    def has(self, label: str = "latest") -> bool:
        return os.path.exists(self._path(label))

    def available_labels(self) -> list:
        if not os.path.isdir(self.root):
            return []
        return sorted(d[len("state_"):] for d in os.listdir(self.root)
                      if d.startswith("state_"))

"""Device mesh construction.

The reference's only parallelism is single-node data parallelism over NCCL
(reference options/base_options.py:171-178, scripts/mm-train-ratio.sh:19-21).
The models are ~71M-param CNNs at 256x256 — far below one chip's HBM — so a
1-D `data` mesh is the whole story; gradients and BN statistics ride ICI via
psum/pmean inside the shard_map'd step.  (Tensor/pipeline/sequence/expert
parallelism are deliberately absent, matching the problem — SURVEY.md §2.5.)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis_name,))

"""Device-mesh helpers.

The reference is single-GPU by design (SURVEY §2.3: zero distributed
machinery). Multi-chip is a new capability of this framework: a 1-axis
mesh named "graph" over which adjacency rows and node features are
partitioned; compressed CBSR features ride the ICI
(`maxk_tpu.parallel.shard`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

GRAPH_AXIS = "graph"


def make_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(list(devices), (GRAPH_AXIS,))

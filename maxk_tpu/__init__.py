"""maxk_tpu — TPU-native sparse GNN training framework (MaxK-GNN capabilities).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``julius-sk/spgemm-prunning`` (MaxK-GNN, ASPLOS'24): GCN/GraphSAGE/GIN
training on large graphs with the MaxK top-k nonlinearity, graph
aggregation running over CBSR-compressed (top-k-pruned) feature matrices,
a Pallas row-block SpMM kernel, custom_vjp forward/backward wiring, and
multi-host scaling via row-partitioned adjacency + compressed-feature
collectives over a `jax.sharding.Mesh`.

Layout:
    maxk_tpu.sparse    CSR/CSC/CBSR containers, tile scheduling metadata
    maxk_tpu.ops       XLA oracle ops + Pallas kernels + dispatch
    maxk_tpu.models    MaxK layers + models (SAGE/GCN/GIN + baselines)
    maxk_tpu.parallel  mesh / sharded training step
    maxk_tpu.data      dataset registry, synthetic graphs, binary IO
    maxk_tpu.train     config, training loop, metrics, optim, checkpointing
    maxk_tpu.bench     kernel benchmark harness (main.cu protocol analog)
"""

__version__ = "0.1.0"

from maxk_tpu.sparse.csr import CSRGraph  # noqa: F401
from maxk_tpu.sparse.cbsr import CBSR  # noqa: F401

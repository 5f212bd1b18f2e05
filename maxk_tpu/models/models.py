"""GNN models: MaxK-accelerated and ReLU baselines.

Re-design of the reference model stacks (`maxk_models_integrated.py:378-454`
MaxKSAGE/MaxKGCN/MaxKGIN; `utils/models.py:27-220` SAGE/GCN/GIN/GNN_res
baselines). Shared shape: `lin_in → L×[nonlinear → dropout → conv] → lin_out`
with per-family extras (LayerNorm for GCN/GIN, BatchNorm+residual for
GNN_res).

The nonlinearity is a constructor argument ("maxk" | "relu"), replicating
the reference's control arm (`utils/config.py: --nonlinear`). With maxk, the
model computes the CBSR once per layer (`maxk_cbsr`) and hands both the
masked dense features and the compact CBSR to the conv — the fused
"precomputed topk" design (`mode_v2.py:21-46`, `spgemmfunction.py`) that
avoids the double top-k of the reference's v1 path.

Graph norm expectations: SAGE → "right", GCN/GNNRes → "both", GIN → "none"
(see `build_graph`). `build_model()` returns (model, norm_mode).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from maxk_tpu.models.layers import MaxKGINConv, MaxKGraphConv, MaxKSAGEConv
from maxk_tpu.sparse.cbsr import cbsr_densify, maxk_cbsr
from maxk_tpu.sparse.graph import Graph


class _GNNBase(nn.Module):
    hidden_dim: int = 256
    num_layers: int = 3
    out_dim: int = 41
    maxk: int = 32
    nonlinear: str = "maxk"  # "maxk" | "relu"
    dropout: float = 0.5
    norm: bool = False  # LayerNorm on hidden layers (config.norm)
    kernel_mode: str = "auto"
    compute_dtype: Optional[jnp.dtype] = None

    def _nonlinear(self, x, graph: Optional[Graph] = None):
        """Returns (activated_dense, cbsr_or_None).

        Sharded graphs need the compact CBSR (the compressed all_gather
        moves V·k over ICI, and only the explicit custom-VJP op carries
        that collective); there the densify is the ONLY expansion per
        layer and its VJP samples compactly at the selectors. Single
        device, `densify(topk(x)) ≡ x ⊙ mask`, so the threshold-only
        Pallas kernel skips the compaction loop entirely and the layers
        aggregate the masked dense features directly."""
        if self.nonlinear == "maxk":
            from maxk_tpu.parallel.shard import ShardedGraph

            if isinstance(graph, ShardedGraph):
                from maxk_tpu.ops.topk_pallas import maxk_cbsr_fast

                cbsr = maxk_cbsr_fast(x, self.maxk)
                dense = cbsr_densify(
                    cbsr, x.shape[-1], onehot_dtype=self.compute_dtype
                )
                return dense, cbsr
            from maxk_tpu.ops.topk_pallas import maxk_mask_fast

            return maxk_mask_fast(x, self.maxk), None
        return nn.relu(x), None


class MaxKSAGE(_GNNBase):
    """`lin_in → L×[MaxK → SAGEConv(mean)] → lin_out`
    (`maxk_models_integrated.py:378-454`)."""

    @nn.compact
    def __call__(self, graph: Graph, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, name="lin_in")(x)
        for i in range(self.num_layers):
            x, cbsr = self._nonlinear(x, graph)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = MaxKSAGEConv(
                self.hidden_dim,
                kernel_mode=self.kernel_mode,
                compute_dtype=self.compute_dtype,
                name=f"conv{i}",
            )(graph, x, cbsr)
            if self.norm:
                x = nn.LayerNorm(name=f"ln{i}")(x)
        return nn.Dense(self.out_dim, name="lin_out")(x)


class MaxKGCN(_GNNBase):
    """`lin_in → L×[MaxK → dropout → GraphConv (+LayerNorm)] → lin_out`
    (`all_model.py:423-611`)."""

    @nn.compact
    def __call__(self, graph: Graph, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, name="lin_in")(x)
        for i in range(self.num_layers):
            x, cbsr = self._nonlinear(x, graph)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = MaxKGraphConv(
                self.hidden_dim,
                kernel_mode=self.kernel_mode,
                compute_dtype=self.compute_dtype,
                name=f"conv{i}",
            )(graph, x, cbsr)
            if self.norm:
                x = nn.LayerNorm(name=f"ln{i}")(x)
        return nn.Dense(self.out_dim, name="lin_out")(x)


class MaxKGIN(_GNNBase):
    """GIN stack with `(1+eps)x + sum_agg` convs (`all_model.py:283-421`)."""

    @nn.compact
    def __call__(self, graph: Graph, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, name="lin_in")(x)
        for i in range(self.num_layers):
            x, cbsr = self._nonlinear(x, graph)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = MaxKGINConv(
                self.hidden_dim,
                kernel_mode=self.kernel_mode,
                compute_dtype=self.compute_dtype,
                name=f"conv{i}",
            )(graph, x, cbsr)
            if self.norm:
                x = nn.LayerNorm(name=f"ln{i}")(x)
        return nn.Dense(self.out_dim, name="lin_out")(x)


# ReLU-defaulting aliases for the baseline arm (`utils/models.py:27-220`).
# Same architecture; nonlinear="relu" switches off the CBSR path entirely.
class SAGE(MaxKSAGE):
    nonlinear: str = "relu"


class GCN(MaxKGCN):
    nonlinear: str = "relu"


class GIN(MaxKGIN):
    nonlinear: str = "relu"


class GNNRes(_GNNBase):
    """Residual GCN with BatchNorm (`utils/models.py` GNN_res): each layer
    `h = conv(x); h = BN(h); x = relu(h) + x`, mean-pool-free node head."""

    @nn.compact
    def __call__(self, graph: Graph, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, name="lin_in")(x)
        for i in range(self.num_layers):
            h = MaxKGraphConv(
                self.hidden_dim,
                kernel_mode=self.kernel_mode,
                compute_dtype=self.compute_dtype,
                name=f"conv{i}",
            )(graph, x, None)
            h = nn.BatchNorm(use_running_average=not train, name=f"bn{i}")(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            x = nn.relu(h) + x
        return nn.Dense(self.out_dim, name="lin_out")(x)


_MODEL_NORMS = {
    "sage": (MaxKSAGE, "right"),
    "gcn": (MaxKGCN, "both"),
    "gin": (MaxKGIN, "none"),
    "gnn_res": (GNNRes, "both"),
}


def build_model(
    model: str,
    out_dim: int,
    hidden_dim: int = 256,
    num_layers: int = 3,
    maxk: int = 32,
    nonlinear: str = "maxk",
    dropout: float = 0.5,
    norm: bool = False,
    kernel_mode: str = "auto",
    compute_dtype=None,
):
    """Model factory mirroring the driver's selection
    (`maxk_gnn_integrated.py:271-296`). Returns (module, graph_norm_mode)."""
    cls, gnorm = _MODEL_NORMS[model]
    return (
        cls(
            hidden_dim=hidden_dim,
            num_layers=num_layers,
            out_dim=out_dim,
            maxk=maxk,
            nonlinear=nonlinear,
            dropout=dropout,
            norm=norm,
            kernel_mode=kernel_mode,
            compute_dtype=compute_dtype,
        ),
        gnorm,
    )

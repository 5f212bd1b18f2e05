"""Graph convolution layers (flax.linen) over the maxk_tpu aggregation ops.

TPU re-design of the reference layer zoo:
  MaxKSAGEConv   ← `maxk_models_integrated.py:45-376`
  MaxKGraphConv  ← `all_model.py:45-281` (DGL GraphConv equivalent)
  MaxKGINConv    ← `all_model.py:283-421` (DGL GINConv equivalent)

Differences by design:
  - Degree normalization is folded into the graph's edge values at build
    time (`build_graph(norm=...)`), not applied as pre/post feature
    scaling per forward (`all_model.py:167-176`) — the VJP is then exactly
    A^T and the in/out-degree bookkeeping of the reference autograd
    functions disappears.
  - Each layer takes an optional CBSR; when given, aggregation runs the
    compact maxk_spgemm path (precomputed-topk design of
    `spgemmfunction.py`), otherwise the dense spmm path (the ReLU/DGL
    baseline arm, `utils/models.py:27-220`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from maxk_tpu.ops.spgemm import maxk_spgemm, spmm
from maxk_tpu.sparse.cbsr import CBSR
from maxk_tpu.sparse.graph import Graph


class _AggMixin:
    def _aggregate(self, graph: Graph, x, cbsr: Optional[CBSR]):
        if cbsr is not None:
            from maxk_tpu.parallel.shard import ShardedGraph

            if isinstance(graph, ShardedGraph):
                # sharded: the compressed-CBSR all_gather path (V·k over
                # ICI instead of V·D) needs the explicit custom-VJP op.
                # Resample values from x so post-densify transforms (the
                # model's dropout) reach the aggregation, matching the
                # single-device path; with no dropout this is exactly
                # cbsr.values again (x == densify(cbsr)).
                from maxk_tpu.sparse.cbsr import cbsr_sample

                cbsr = cbsr.replace(values=cbsr_sample(x, cbsr.selector))
                return maxk_spgemm(
                    graph,
                    cbsr,
                    dim=x.shape[-1],
                    mode=self.kernel_mode,
                    compute_dtype=self.compute_dtype,
                )
            # single-device: x IS densify(cbsr) (computed once by the
            # model); spmm's VJP is Aᵀ and densify's VJP is the compact
            # (V,k) sampler, so plain autodiff already gives the
            # SSpMM-backward with O(V·k) residuals — no second densify
        if self.compute_dtype is not None:
            y = spmm(graph, x.astype(self.compute_dtype), mode=self.kernel_mode)
            return y.astype(x.dtype)
        return spmm(graph, x, mode=self.kernel_mode)


class MaxKSAGEConv(nn.Module, _AggMixin):
    """GraphSAGE conv, mean aggregator.

    Expects a graph built with norm="right" (mean aggregation:
    `output / in_degrees`, `maxk_spgemm_function.py:85-88`).
    `lin_before_mp` (apply fc_neigh before aggregation when it shrinks
    the width) follows `maxk_models_integrated.py:247`.
    """

    out_dim: int
    kernel_mode: str = "auto"
    compute_dtype: Optional[jnp.dtype] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, cbsr: Optional[CBSR] = None):
        in_dim = x.shape[-1]
        fc_self = nn.Dense(self.out_dim, use_bias=self.use_bias, name="fc_self")
        fc_neigh = nn.Dense(self.out_dim, use_bias=False, name="fc_neigh")
        lin_before_mp = in_dim > self.out_dim
        if lin_before_mp:
            # shrinking first reduces SpMM width; breaks CBSR sparsity, so
            # the compact path only applies when aggregation comes first
            h_neigh = spmm(graph, fc_neigh(x), mode=self.kernel_mode)
        else:
            h_neigh = fc_neigh(self._aggregate(graph, x, cbsr))
        return fc_self(x) + h_neigh


class MaxKGraphConv(nn.Module, _AggMixin):
    """GCN conv. Expects a graph built with norm="both" (symmetric
    D^-1/2 A D^-1/2, `all_model.py:167-176,263-272`)."""

    out_dim: int
    kernel_mode: str = "auto"
    compute_dtype: Optional[jnp.dtype] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, cbsr: Optional[CBSR] = None):
        in_dim = x.shape[-1]
        dense = nn.Dense(self.out_dim, use_bias=self.use_bias, name="weight")
        if in_dim > self.out_dim:
            return spmm(graph, dense(x), mode=self.kernel_mode)
        return dense(self._aggregate(graph, x, cbsr))


class MaxKGINConv(nn.Module, _AggMixin):
    """GIN conv: `apply_func((1+eps)·x + sum_agg(x))`
    (`all_model.py:410-411`). Expects a graph with norm="none" (raw sum).

    `apply_func` is the 2-layer MLP (Dense → ReLU → Dense) of the
    reference's fixed GIN (`GIN:17-21` — the bare-Dense variant was the
    bug its "CRITICAL FIX" comment repairs); `mlp_hidden` sizes the
    hidden layer (reference uses hid_size for both)."""

    out_dim: int
    kernel_mode: str = "auto"
    compute_dtype: Optional[jnp.dtype] = None
    learn_eps: bool = True
    init_eps: float = 0.0
    mlp_hidden: Optional[int] = None  # None → out_dim

    @nn.compact
    def __call__(self, graph: Graph, x, cbsr: Optional[CBSR] = None):
        if self.learn_eps:
            eps = self.param(
                "eps", lambda _: jnp.asarray(self.init_eps, jnp.float32)
            )
        else:
            eps = self.init_eps
        agg = self._aggregate(graph, x, cbsr)
        h = (1.0 + eps) * x + agg
        hid = self.mlp_hidden or self.out_dim
        h = nn.Dense(hid, name="apply_func_0")(h)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, name="apply_func_1")(h)

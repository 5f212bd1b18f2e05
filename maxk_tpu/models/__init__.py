from maxk_tpu.models.layers import MaxKSAGEConv, MaxKGraphConv, MaxKGINConv
from maxk_tpu.models.models import (
    MaxKSAGE,
    MaxKGCN,
    MaxKGIN,
    SAGE,
    GCN,
    GIN,
    GNNRes,
    build_model,
)

__all__ = [
    "MaxKSAGEConv",
    "MaxKGraphConv",
    "MaxKGINConv",
    "MaxKSAGE",
    "MaxKGCN",
    "MaxKGIN",
    "SAGE",
    "GCN",
    "GIN",
    "GNNRes",
    "build_model",
]

from maxk_tpu.data.datasets import DATASETS, GraphData, load_dataset
from maxk_tpu.data.synthetic import rmat_graph, planted_partition_data
from maxk_tpu.data.io import save_graph_binary, load_graph_binary

__all__ = [
    "DATASETS",
    "GraphData",
    "load_dataset",
    "rmat_graph",
    "planted_partition_data",
    "save_graph_binary",
    "load_graph_binary",
]

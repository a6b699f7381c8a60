from gsdx.graph.edges import construct_edges, construct_edges_batch
from gsdx.graph.dataset import GraphBatch, EpisodeStore, GraphDatasetConfig, GraphSampler

__all__ = [
    "construct_edges",
    "construct_edges_batch",
    "GraphBatch",
    "EpisodeStore",
    "GraphDatasetConfig",
    "GraphSampler",
]

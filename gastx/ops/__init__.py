from gastx.ops.batchnorm import batch_norm, init_batch_norm
from gastx.ops.temporal import temporal_conv, pointwise
from gastx.ops.graph import (
    sem_ch_graph_conv,
    local_graph,
    multi_global_graph,
    graph_attention_block,
)

__all__ = [
    "batch_norm",
    "init_batch_norm",
    "temporal_conv",
    "pointwise",
    "sem_ch_graph_conv",
    "local_graph",
    "multi_global_graph",
    "graph_attention_block",
]

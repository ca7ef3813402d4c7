from gastx.models.config import (
    TPU_MIXED_PRECISION_OVERRIDES,
    TPU_MIXED_SAFE_OVERRIDES,
    GastNetConfig,
    GraphStatics,
    config_for_frames,
    graph_statics,
)
from gastx.models.init import init_gastnet, param_count
from gastx.models.gastnet import gastnet_forward

__all__ = [
    "TPU_MIXED_PRECISION_OVERRIDES",
    "TPU_MIXED_SAFE_OVERRIDES",
    "GastNetConfig",
    "GraphStatics",
    "config_for_frames",
    "graph_statics",
    "init_gastnet",
    "param_count",
    "gastnet_forward",
]

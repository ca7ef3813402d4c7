from gastx.models.config import (
    GastNetConfig,
    GraphStatics,
    config_for_frames,
    graph_statics,
)
from gastx.models.init import init_gastnet, param_count
from gastx.models.gastnet import gastnet_forward

__all__ = [
    "GastNetConfig",
    "GraphStatics",
    "config_for_frames",
    "graph_statics",
    "init_gastnet",
    "param_count",
    "gastnet_forward",
]

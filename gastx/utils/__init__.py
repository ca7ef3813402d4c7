from gastx.utils.profiling import benchmark, capture_trace, flops_estimate, trace
from gastx.utils.logging import MetricLogger, export_training_curves

__all__ = [
    "benchmark",
    "capture_trace",
    "flops_estimate",
    "trace",
    "MetricLogger",
    "export_training_curves",
]

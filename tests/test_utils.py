"""Utility tests: steady-state benchmark helper, metric logger, trace ctx."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from gastx.utils import MetricLogger, benchmark, trace


def test_benchmark_reports_sane_stats():
    @jax.jit
    def f(x):
        return (x * 2.0).sum()

    x = jnp.ones((128, 128))
    stats = benchmark(f, x, iters=5, warmup=1, items_per_call=128)
    assert stats["mean_ms"] > 0
    assert {"p50_ms", "p90_ms"} <= stats.keys()
    assert 0 < stats["p50_ms"] <= stats["p90_ms"]  # percentile ordering
    assert stats["items_per_s"] > 0


def test_trace_annotation_context():
    with trace("unit-test-region"):
        x = jnp.ones(8).sum()
    assert float(x) == 8.0


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricLogger(path)
    log.log(1, loss=0.5, tag="a")
    log.log(2, loss=np.float32(0.25))
    lines = [json.loads(line) for line in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[0]["tag"] == "a"
    assert lines[1]["loss"] == 0.25
    assert "wall_s" in lines[1]


def test_metric_logger_no_path():
    record = MetricLogger(None).log(3, x=1.0)
    assert record["step"] == 3 and record["x"] == 1.0

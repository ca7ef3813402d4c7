"""bench.py smoke test: every metric function runs on the CPU backend.

The driver runs `python bench.py` on real TPU hardware at the end of every
round; a broken bench loses the round's perf record, so each measurement
path (default + --full) is exercised here with the tiny CPU shapes the
functions select on this backend.
"""
import json
import subprocess
import sys

import bench


def test_all_metric_functions_run_on_cpu():
    assert bench.measure_gastx() > 0
    assert bench.measure_gastx_frames(81) > 0
    assert bench.measure_gastx_frames(243) > 0
    assert bench.measure_train_step() > 0
    assert bench.measure_streaming_steps() > 0


def test_realtime_e2e_metric_runs_on_cpu():
    fps = bench.measure_realtime_e2e()
    if fps is None:  # reference checkout unavailable
        return
    assert fps > 0


def test_roofline_terms():
    roof = bench.measure_roofline(1000.0)
    assert roof["gflop_per_seq"] > 0
    assert roof["mb_per_seq"] > 0
    # sustained terms scale linearly with the measured throughput
    roof2 = bench.measure_roofline(2000.0)
    assert abs(roof2["sustained_tflops"] - 2 * roof["sustained_tflops"]) \
        <= 0.02 * roof2["sustained_tflops"] + 0.02


def test_bench_cli_prints_one_json_line(tmp_path):
    """The driver contract: default mode prints ONE parseable JSON line."""
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        cwd=bench.REPO, timeout=900,
        # A minimal env WITHOUT the axon plugin path: this subprocess must
        # run on the CPU backend (JAX_PLATFORMS is honored when the axon
        # site config isn't loaded), and CLAUDE.md's "append, don't
        # overwrite PYTHONPATH" rule is deliberately inverted here for
        # that reason.
        env={"PYTHONPATH": bench.REPO, "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu",
             "HOME": str(tmp_path)},
    )
    lines = [l for l in out.stdout.strip().splitlines()
             if l.startswith("{")]
    assert len(lines) == 1, out.stdout + out.stderr
    rec = json.loads(lines[0])
    assert rec["metric"] == "27f_17j_lifting_throughput"
    assert rec["unit"] == "seq/s" and rec["value"] > 0

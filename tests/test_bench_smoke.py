"""bench.py smoke: the driver runs it unattended on real hardware — the code path
must never crash. Run here tiny on CPU."""

import json
import os
import subprocess
import sys


def test_bench_smoke_cpu():
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_RESOLUTION="32",
        BENCH_BATCH="2",
        BENCH_ITERS="2",
    )
    result = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        timeout=300, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    lines = [l for l in result.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1  # exactly ONE JSON line on stdout
    blob = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(blob)
    assert blob["value"] > 0


def test_bench_smoke_fp32_high():
    """The BENCH_DTYPE/GANCE_TPU_PRECISION knobs drive the same protocol."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_RESOLUTION="32",
        BENCH_BATCH="2",
        BENCH_ITERS="2",
        BENCH_DTYPE="float32",
        GANCE_TPU_PRECISION="high",
    )
    result = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        timeout=300, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    blob = json.loads(result.stdout.strip().splitlines()[-1])
    assert "float32" in blob["metric"] and "high" in blob["metric"]

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


def test_bench_stall_guard_kills_and_reports():
    """A dead-stalled child (the remote-compile hang class) is killed and the
    guard exits nonzero after the attempt budget instead of hanging forever
    (CPU fallback disabled, so no result line may be fabricated)."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_TEST_HANG="1",
        BENCH_STALL_SECS="4",
        BENCH_STALL_POLL_SECS="2",
        BENCH_STALL_OUTPUT_ONLY="1",
        BENCH_ATTEMPTS="1",
        BENCH_NO_FALLBACK="1",
    )
    result = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        timeout=120, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert result.returncode == 1
    assert "dead stall" in result.stderr
    assert result.stdout.strip() == ""  # no result line fabricated


def test_bench_stall_guard_cpu_fallback_records_labeled_result():
    """When every (simulated-TPU) attempt dead-stalls, the guard's final
    CPU-pinned fallback still emits ONE JSON result line, labeled with the
    executing platform so a tunnel outage can't masquerade as a TPU number."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_TEST_HANG="1",
        BENCH_STALL_SECS="4",
        BENCH_STALL_POLL_SECS="2",
        BENCH_STALL_OUTPUT_ONLY="1",
        BENCH_ATTEMPTS="1",
        BENCH_RESOLUTION="32",
        BENCH_FALLBACK_BATCH="2",
        BENCH_FALLBACK_ITERS="2",
    )
    result = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        timeout=300, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    lines = [l for l in result.stdout.splitlines() if l.strip()]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["device"] == "cpu"
    assert payload["unit"] == "frames/sec"
    assert payload["value"] > 0

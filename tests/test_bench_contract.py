"""Contract tests for bench.py's driver-facing JSON line.

The driver records bench stdout as BENCH_r{N}.json; rounds 1-3 each lost
fields to a crash or an outer timeout. These tests pin the two guarantees
added in round 4: assemble() builds a complete, schema-stable line from
ANY partial measurement state, and a SIGTERM from the driver's window
flushes that snapshot instead of dying silently.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

EXTRA_KEYS = {
    "workload_degraded", "rays_per_s", "xla_fallback_iters_per_s",
    "object_train_iters_per_s", "hand_720p_131k_iters_per_s",
    "flagship_voxel_ms", "flagship_voxel_iters_per_s",
    "flagship_voxel_lpips_ms", "gaussians", "resolution",
    "peak_hbm_mb_primary", "device", "errors",
}


def test_assemble_empty_state_is_schema_complete():
    out = bench.assemble({})
    assert out["metric"] == "hand_train_iters_per_s"
    assert out["value"] is None
    assert out["vs_baseline"] is None
    assert set(out["extra"]) == EXTRA_KEYS
    json.dumps(out)  # must serialize


def test_assemble_tpu_vs_baseline_ratio():
    out = bench.assemble({
        "on_tpu": True, "pallas_ips": 80.0, "xla_ips": 4.0,
        "capacity": 65536, "width": 512, "height": 512, "views": 1,
    })
    assert out["value"] == 80.0
    assert out["vs_baseline"] == 20.0
    assert out["extra"]["rays_per_s"] == 80 * 512 * 512


def test_assemble_degraded_suppresses_rays_and_cpu_baseline_is_1():
    out = bench.assemble({"on_tpu": False, "pallas_ips": 0.5,
                          "degraded": "cpu_xla_2048g_128px",
                          "width": 128, "height": 128, "views": 1})
    assert out["vs_baseline"] == 1.0
    assert out["extra"]["rays_per_s"] is None
    assert out["extra"]["workload_degraded"] == "cpu_xla_2048g_128px"


def test_assemble_partial_flagship_fields():
    out = bench.assemble({"on_tpu": True, "pallas_ips": 80.0,
                          "flag_ips": 47.0, "width": 512, "height": 512,
                          "views": 1, "errors": ["flagship lpips: timeout"]})
    assert out["extra"]["flagship_voxel_ms"] == round(1e3 / 47.0, 2)
    assert out["extra"]["flagship_voxel_lpips_ms"] is None
    assert out["vs_baseline"] is None  # xla unmeasured -> no stale constant
    assert out["extra"]["errors"] == ["flagship lpips: timeout"]


@pytest.mark.parametrize("sig", [signal.SIGTERM, signal.SIGINT])
def test_sigkill_window_flushes_snapshot_json(sig):
    """A driver-side timeout kill must still produce the JSON line."""
    env = dict(os.environ, BENCH_FORCE_CPU="1", BENCH_BUDGET_S="300",
               JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__),
                                      "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
    )
    try:
        time.sleep(6.0)  # mid-probe: before any section completes
        proc.send_signal(sig)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()  # exact PID spawned here
    lines = [ln for ln in out.decode().strip().splitlines() if ln]
    assert lines, "killed bench produced no output"
    parsed = json.loads(lines[-1])
    assert parsed["metric"] == "hand_train_iters_per_s"
    errs = (parsed.get("extra") or {}).get("errors") or []
    assert any("killed by signal" in e for e in errs)

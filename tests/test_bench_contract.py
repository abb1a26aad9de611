"""Contract tests for bench.py's driver-facing JSON line.

The driver records bench stdout as BENCH_r{N}.json; rounds 1-3 each lost
fields to a crash or an outer timeout. These tests pin the guarantees
added in rounds 4-5: assemble() builds a complete, schema-stable line
from ANY partial measurement state, a SIGTERM from the driver's window
flushes that snapshot instead of dying silently, and partial result
lines from chained children are recovered even when the child is killed
mid-chain.
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
    "peak_hbm_mb_primary", "peak_hbm_mb_flagship",
    "session_probe_matmul_ms", "device", "errors",
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


def test_assemble_probe_normalizer_and_hbm_fields():
    out = bench.assemble({"on_tpu": True, "pallas_ips": 80.0,
                          "prim_hbm": 812, "flag_hbm": 2048,
                          "probe_ms": 1.23,
                          "width": 512, "height": 512, "views": 1})
    assert out["extra"]["peak_hbm_mb_primary"] == 812
    assert out["extra"]["peak_hbm_mb_flagship"] == 2048
    assert out["extra"]["session_probe_matmul_ms"] == 1.23


def test_parse_child_output_recovers_partials_on_kill():
    """A timed-out chained child must surrender every partial line that
    made it into the pipe buffer before the kill."""
    out = "\n".join([
        "some stderr-looking noise that is not json",
        json.dumps({"partial": {"pallas_ips": 80.9, "prim_hbm": 812}}),
        json.dumps({"partial": {"xla_ips": 3.25}}),
        "truncated {\"ok\": tru",
    ])
    r = bench.parse_child_output(out, "timeout after 900s")
    assert r["ok"] is False
    assert r["partials"] == {"pallas_ips": 80.9, "prim_hbm": 812,
                             "xla_ips": 3.25}

    # and a completed chain merges partials under the final result
    out2 = "\n".join([
        json.dumps({"partial": {"flag_ips": 47.0}}),
        json.dumps({"ok": True,
                    "results": {"flag_ips": 47.0, "flag_lpips_ips": 31.1}}),
    ])
    r2 = bench.parse_child_output(out2, "unused")
    assert r2["ok"] is True
    assert r2["results"]["flag_lpips_ips"] == 31.1
    assert r2["partials"]["flag_ips"] == 47.0


def test_hand_chain_emits_partial_before_xla_leg(capsys):
    """section_hand_chain must flush the primary result as a partial line
    before starting the xla fallback leg (the driver-kill recovery path
    depends on it). Monkeypatched workload: no jax involved."""
    calls = []

    def fake_build(backend, *a, **kw):
        calls.append(backend)
        return ("step", "state", {"rgb": "gt"})

    def fake_time(step, state, batch, warmup, iters, want_mem=False):
        return (80.0 if len(calls) == 1 else 4.0,
                812 if want_mem else None)

    orig_build, orig_time = bench.build_workload, bench.time_iters
    bench.build_workload, bench.time_iters = fake_build, fake_time
    try:
        res = bench.section_hand_chain(
            {"backend": "pallas", "capacity": 64, "width": 32,
             "height": 32, "views": 1, "warmup": 0, "iters": 4,
             "want_mem": True})
    finally:
        bench.build_workload, bench.time_iters = orig_build, orig_time
    out_lines = capsys.readouterr().out.strip().splitlines()
    partials = [json.loads(ln)["partial"] for ln in out_lines
                if "partial" in ln]
    assert partials[0] == {"pallas_ips": 80.0, "prim_hbm": 812}
    assert partials[1] == {"xla_ips": 4.0}
    assert res == {"pallas_ips": 80.0, "prim_hbm": 812, "xla_ips": 4.0}
    assert calls == ["pallas", "xla"]


@pytest.mark.parametrize("sig", [signal.SIGTERM, signal.SIGINT])
def test_sigkill_window_flushes_snapshot_json(sig):
    """A driver-side timeout kill must still produce the JSON line.
    The kill is gated on the first '[bench]' stderr marker (the probe
    launch) rather than a fixed sleep, so a fast machine cannot finish
    the whole CPU bench before the signal lands (ADVICE r4 #4)."""
    env = dict(os.environ, BENCH_FORCE_CPU="1", BENCH_BUDGET_S="300",
               JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__),
                                      "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
    )
    try:
        deadline = time.time() + 60
        seen_marker = False
        while time.time() < deadline:
            line = proc.stderr.readline()
            if not line:
                break
            if b"[bench]" in line:
                seen_marker = True
                break
        assert seen_marker, "bench never printed a [bench] stderr marker"
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

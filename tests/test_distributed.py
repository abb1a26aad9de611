"""Multi-process jax.distributed execution (SURVEY §5.8, VERDICT r2 item 5).

Launches 2 real OS processes x 4 virtual CPU devices each (the worker is
tests/dist_worker.py), which bring up jax.distributed over a localhost
coordinator, build the hybrid (data x gauss) mesh through
parallel/distributed.py's multi-process branch, and run one fully sharded
train step. Asserts both processes agree AND that the result matches the
identical computation on a single-process 8-device mesh — the multi-host
code path is numerically the same program.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_step(tmp_path):
    worker = os.path.join(_ROOT, "tests", "dist_worker.py")
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"proc{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(port), out, "2"],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=_ROOT,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), (
        "worker failed:\n" + "\n---\n".join(logs)
    )

    r0, r1 = (json.load(open(o)) for o in outs)
    # both controllers of the SPMD program computed the same global result
    assert r0["loss"] == r1["loss"]
    assert r0["xyz_abs_sum"] == r1["xyz_abs_sum"]
    assert r0["num_active"] == r1["num_active"]
    # host-local batch responsibility: disjoint halves covering all views
    assert sorted(r0["local_views"] + r1["local_views"]) == [0, 1, 2, 3]
    assert set(r0["local_views"]).isdisjoint(r1["local_views"])

    # single-process reference: same computation on the in-test 8-device
    # mesh (different device order than the hybrid mesh -> tiny reduction-
    # order noise is legitimate)
    from dist_worker import run_one_step
    from manus_tpu.parallel.distributed import make_multihost_mesh

    ref = run_one_step(make_multihost_mesh(n_data=4, n_gauss=2))
    np.testing.assert_allclose(r0["loss"], ref["loss"], rtol=1e-4)
    np.testing.assert_allclose(r0["xyz_abs_sum"], ref["xyz_abs_sum"],
                               rtol=1e-4)
    np.testing.assert_allclose(r0["opacity_abs_sum"], ref["opacity_abs_sum"],
                               rtol=1e-4)
    assert r0["num_active"] == ref["num_active"]

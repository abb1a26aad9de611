"""Bisect the train-step INVALID_ARGUMENT on the tunneled TPU platform.

Round-4 finding: the flagship render FORWARD executes on the chip, but the
fused train step (render -> loss -> grad -> Adam) dies at execution time
with `INVALID_ARGUMENT: TPU backend error` on BOTH raster backends, in
fresh processes, reproducibly (BENCH_r03 died the same way inside a
different op). This script walks a cheap-to-expensive probe ladder in ONE
process to localise the failing feature: scale (tiny vs bench), backend,
buffer donation (MANUS_TPU_NO_DONATE, the one train-step feature that
changes the runtime buffer protocol rather than the HLO), and grad vs
eval graphs. Progress is flushed per probe so a hang is attributable.

Run detached (never SIGKILL mid-compile — it wedges the tunnel):
  python scripts/tpu_step_bisect.py > bisect.log 2>&1
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

T0 = time.time()


def note(msg):
    print(f"[{time.time() - T0:6.0f}s] {msg}", flush=True)


def run_probe(name, fn):
    note(f"START {name}")
    try:
        out = fn()
        note(f"OK    {name}: {out}")
        return True
    except Exception as e:
        note(f"FAIL  {name}: {type(e).__name__}: {e}")
        return False


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    def probe_matmul():
        x = jnp.ones((256, 256), jnp.float32)
        return float(np.asarray(x @ x)[0, 0])

    run_probe("matmul", probe_matmul)

    def step_probe(backend, capacity, px, donate):
        os.environ.pop("MANUS_TPU_NO_DONATE", None)
        if not donate:
            os.environ["MANUS_TPU_NO_DONATE"] = "1"
        step, state, batch = bench.build_workload(
            backend, capacity, px, px, 1
        )
        state, metrics = step(state, batch)
        loss = float(np.asarray(metrics["loss"]))
        # a second step exercises the donated-buffer reuse path
        state, metrics = step(state, batch)
        loss2 = float(np.asarray(metrics["loss"]))
        return f"loss={loss:.5f},{loss2:.5f}"

    # tiny scale first: fast compiles, isolates graph features from size
    ok_tiny_nodon = run_probe(
        "tiny xla step, donation OFF",
        lambda: step_probe("xla", 2048, 128, donate=False),
    )
    ok_tiny_don = run_probe(
        "tiny xla step, donation ON",
        lambda: step_probe("xla", 2048, 128, donate=True),
    )
    run_probe(
        "tiny pallas step, donation ON",
        lambda: step_probe("pallas", 2048, 128, donate=True),
    )

    # bench scale
    ok_big_nodon = run_probe(
        "bench pallas step, donation OFF",
        lambda: step_probe("pallas", 1 << 16, 512, donate=False),
    )
    ok_big_don = run_probe(
        "bench pallas step, donation ON",
        lambda: step_probe("pallas", 1 << 16, 512, donate=True),
    )

    note(
        "verdict: "
        + (
            "donation is the trigger"
            if ok_big_nodon and not ok_big_don
            else "scale-dependent, not donation"
            if ok_tiny_don and not ok_big_don
            else "all pass (transient platform fault earlier)"
            if ok_big_don
            else "fails beyond donation/scale — bisect the step graph next"
        )
    )


if __name__ == "__main__":
    main()

"""A/B: random-feature LPIPS loss on vs off at flagship scale (VERDICT
r4 item 3).

Two 2000-step HAND_GAUSSIAN train-CLI runs on the same synthetic
flagship-scale scene (131k capacity, 512^2, 96^3 voxel grid, 12 cameras,
4 frames, seed-matched):
  * arm "on":  loss.lpips_random_in_loss=true — the pre-round-5 behavior
    (random-feature VGG term live past step 1000);
  * arm "off": the shipped default (term stripped; metric stays).
Reports held-out val PSNR/SSIM per arm from val_results.csv. Each arm is
a fresh process (tunnel contexts poison on failure; compile caches are
server-side anyway).

Run: python scripts/ab_lpips_flagship.py  (TPU; ~15-25 min/arm)
"""
from __future__ import annotations

import csv
import os
import subprocess
import sys
import time

BASE = [
    "--config-name", "HAND_GAUSSIAN",
    "dataset.width=512", "dataset.height=512",
    "dataset.num_cameras=12", "dataset.num_frames=4",
    "dataset.grid_res=96", "capacity=131072",
    "dataset.sample_size=4000",  # x(bones+joints)=30 -> 120k init <= 131k cap
    "trainer.max_steps=2000", "trainer.val_every=500",
    "trainer.checkpoint_every=0", "trainer.log_every=200",
    "model.start_lpips_iter=1000",
    "raster.backend=pallas",
    "trainer.output_dir=outputs/lpips_ab",
]


def run_arm(name: str, extra: list) -> dict:
    out_dir = os.path.join("outputs", "lpips_ab", "manus_tpu", "synthetic",
                           name)
    args = BASE + [f"trainer.exp_name={name}"] + extra
    t0 = time.time()
    code = (
        "import sys, main; main.main(sys.argv[1:])"
    )
    r = subprocess.run([sys.executable, "-c", code] + args,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    dt = time.time() - t0
    res = {"name": name, "rc": r.returncode, "minutes": round(dt / 60, 1)}
    csv_path = os.path.join(out_dir, "results", "val_results.csv")
    if os.path.exists(csv_path):
        with open(csv_path) as f:
            all_rows = list(csv.DictReader(f))
        # the aggregate row's name column is the exp_name (per-camera
        # rows carry camera names)
        rows = [row for row in all_rows if row.get("name") == name] \
            or all_rows
        if rows:
            last = rows[-1]
            res.update(step=last.get("step"),
                       psnr=float(last.get("psnr", "nan")),
                       ssim=float(last.get("ssim", "nan")),
                       lpips=float(last.get("lpips", "nan")))
    return res


def main():
    results = []
    for name, extra in (
        ("lpips_on", ["loss.lpips_random_in_loss=true"]),
        ("lpips_off", []),
    ):
        print(f"[ab] starting arm {name}", flush=True)
        res = run_arm(name, extra)
        print(f"[ab] arm done: {res}", flush=True)
        results.append(res)
    print("[ab] SUMMARY", flush=True)
    for r in results:
        print(f"  {r}", flush=True)


if __name__ == "__main__":
    main()

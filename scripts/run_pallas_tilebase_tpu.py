"""Hardware check: the tile-sharded Pallas composite COMPILES (Mosaic, not
interpret) and matches the full grid, with tile_base as a TRACED argument.

This is the exact building block the gauss-axis tile sharding uses inside
shard_map (ops/rasterizer/api.py:205-239), where tile_base = axis_index *
t_local is a traced scalar. tests/test_pallas.py proves the math in
interpret mode on CPU; this script closes the "never compiled on the real
chip" gap (VERDICT r2 item 6) — single device, both half-grid blocks
through ONE jitted program with base traced.

Run on the TPU: python scripts/run_pallas_tilebase_tpu.py
Expected output ends with: tilebase-on-hardware: OK
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from utils import make_test_camera, random_scene  # noqa: E402

from manus_tpu.ops.rasterizer import pallas_backend, payload as pm  # noqa: E402
from manus_tpu.ops.rasterizer.binning import bin_gaussians  # noqa: E402
from manus_tpu.ops.rasterizer.projection import TILE, project_gaussians  # noqa: E402


def main():
    assert jax.default_backend() == "tpu", (
        f"this script targets the real chip, got {jax.default_backend()}"
    )
    scene = random_scene(300, seed=5)
    cam = make_test_camera(64, 64)
    proj = project_gaussians(
        jnp.asarray(scene["means"]), jnp.asarray(scene["cov6"]), cam
    )
    ntx = nty = 64 // TILE
    bins = bin_gaussians(proj, ntx, nty, 64, 128, 8, 1024)
    pay = pm.build_payload(
        proj, jnp.asarray(scene["colors"]), jnp.asarray(scene["opacity"]),
        bins, 64,
    )
    T = ntx * nty
    count = T // 2

    @jax.jit
    def full(pay, offs, cnts):
        return pallas_backend.composite_tiles_pallas(
            pay, offs, cnts, ntx, nty, tile=TILE, chunk=128
        )

    @jax.jit
    def block(pay, offs, cnts, base):
        # base is TRACED — same contract as axis_index inside shard_map
        return pallas_backend.composite_tiles_pallas(
            pay, offs, cnts, ntx, nty, tile=TILE, chunk=128,
            tile_base=base[None],
        )

    rgb_full, t_full = jax.tree.map(
        np.asarray, full(pay, bins.tile_offsets, bins.tile_counts)
    )
    for base in (0, count):
        rgb_b, t_b = jax.tree.map(
            np.asarray,
            block(
                pay,
                jax.lax.dynamic_slice_in_dim(bins.tile_offsets, base, count),
                jax.lax.dynamic_slice_in_dim(bins.tile_counts, base, count),
                jnp.asarray(base, jnp.int32),
            ),
        )
        np.testing.assert_allclose(
            rgb_b, rgb_full[base : base + count], atol=1e-6
        )
        np.testing.assert_allclose(t_b, t_full[base : base + count], atol=1e-6)
        print(f"block base={base} count={count}: parity ok", flush=True)
    print("tilebase-on-hardware: OK", flush=True)


if __name__ == "__main__":
    main()

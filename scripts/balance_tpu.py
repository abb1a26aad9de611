"""On-chip per-column composite wall time: owner vs pairslice at gauss=4.

Supplements the dryrun's CPU-side balance probe (VERDICT r4 item 4) with
REAL Pallas-kernel timings: the dryrun's XLA emulation scans a fixed
chunk grid, so its absolute ms overstate empty-tile cost; the Pallas
kernel's empty-tile skip and early exit are what production columns
actually run. Scene: the bench hand scene CLUSTERED (positions and
footprints shrunk 0.18x about the centroid) so occupancy collapses to a
few adjacent tiles — the case where static tile ownership cannot
balance.

Each column's local composite is timed as its own chained-loop program
(columns run concurrently on a real mesh; per-column wall time is the
work-share evidence).

Run: python scripts/balance_tpu.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

from manus_tpu.config import hand_config  # noqa: E402
from manus_tpu.models.gaussians import (  # noqa: E402
    get_features, get_opacity,
)
from manus_tpu.ops.rasterizer.api import (  # noqa: E402
    calculate_colors_from_sh,
)
from manus_tpu.ops.rasterizer.binning import (  # noqa: E402
    bin_gaussians, tile_owner_tables,
)
from manus_tpu.ops.rasterizer.pallas_backend import (  # noqa: E402
    composite_tiles_pallas,
)
from manus_tpu.ops.rasterizer.payload import build_payload  # noqa: E402
from manus_tpu.ops.rasterizer.projection import (  # noqa: E402
    TILE, project_gaussians,
)
from manus_tpu.train.workloads import forward_gaussians  # noqa: E402
from manus_tpu.utils.camera import index_camera  # noqa: E402

N_COLS = 4
CHUNK = 128


def chain_time(fn, payload, *args, iters=200):
    @jax.jit
    def chain(k, payload, *a):
        def body(_, carry):
            p = payload + (carry * 1e-30)
            return carry + fn(p, *a) * 1e-12

        return jax.lax.fori_loop(0, k, body, jnp.asarray(0.0))

    np.asarray(chain(jnp.asarray(2), payload, *args))

    def timed(k):
        t = time.perf_counter()
        np.asarray(chain(jnp.asarray(k), payload, *args))
        return time.perf_counter() - t

    t2 = min(timed(2) for _ in range(2))
    thi = min(timed(2 + iters) for _ in range(2))
    return (thi - t2) / iters * 1e3


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    cap, res = 1 << 16, 512
    step, state, batch = bench.build_workload("pallas", cap, res, res, 1)
    cfg = hand_config()
    opts = cfg.model
    model = state.model
    # cluster: shrink positions + footprints about the active centroid
    act = model.active[:, None]
    ctr = (model.params.xyz * act).sum(0) / jnp.maximum(act.sum(), 1)
    shrink = 0.18
    model = model._replace(params=model.params._replace(
        xyz=(model.params.xyz - ctr) * shrink + ctr,
        scaling=model.params.scaling + jnp.log(shrink),
    ))
    params, active = model.params, model.active
    cam = index_camera(batch["cameras"], 0)
    posed_xyz, posed_cov, tf = jax.jit(
        lambda p: forward_gaussians(p, active, model.skin_weights,
                                    batch["bone_tf"], opts)
    )(params)
    colors = jax.jit(lambda: calculate_colors_from_sh(
        posed_xyz, get_features(params), params.xyz, cam, opts.sh_degree,
        tf=tf))()
    opac = get_opacity(params)
    proj = jax.jit(lambda a, b: project_gaussians(a, b, cam, active=active))(
        posed_xyz, posed_cov
    )
    nt = res // TILE
    bins = jax.jit(lambda p: bin_gaussians(
        p, nt, nt, 64, 128, 2, 4096, 0.25
    ))(proj)
    op1 = opac[:, 0] if opac.ndim == 2 else opac
    pay = jax.jit(lambda: build_payload(proj, colors, op1, bins, 64))()
    all_counts = np.asarray(bins.tile_counts)
    all_offs = np.asarray(bins.tile_offsets)
    occ = int((all_counts > 0).sum())
    print(f"pairs={int(all_counts.sum())} occupancy={occ}/{nt * nt} tiles",
          flush=True)

    def report(mode, rows):
        times = np.asarray([t for t, _ in rows])
        pairs = np.asarray([p for _, p in rows])
        rt = times.max() / max(times.mean(), 1e-9)
        rp = pairs.max() / max(pairs.mean(), 1e-9)
        print(f"[{mode:9s}] pairs/col {pairs.tolist()} (max/mean {rp:.2f})"
              f" | pallas composite ms "
              f"{[round(t, 3) for t in times.tolist()]} "
              f"(max/mean {rt:.2f})", flush=True)

    # owner mode: column c composites its dealt tile set
    _, _, owned_np, _ = tile_owner_tables(nt, nt, N_COLS)
    rows = []
    for c in range(N_COLS):
        tids_np = owned_np[c]
        offs = jnp.asarray(all_offs[tids_np])
        cnts = jnp.asarray(all_counts[tids_np])
        tids = jnp.asarray(tids_np)

        def fwd(payload, offs, cnts, tids):
            rgb, tfin = composite_tiles_pallas(
                payload, offs, cnts, nt, nt, tile=TILE, chunk=CHUNK,
                tile_ids=tids,
            )
            return (jnp.sum(rgb) + jnp.sum(tfin)) * 1e-9

        t = chain_time(fwd, pay, offs, cnts, tids)
        rows.append((t, int(all_counts[tids_np].sum())))
    report("owner", rows)

    # hybrid mode: owner tiles + the K deepest tiles depth-split
    k_hot = 8
    hot = np.argsort(-all_counts)[:k_hot]
    hot_cnt = all_counts[hot]
    share = -(-hot_cnt // N_COLS)
    rows = []
    for c in range(N_COLS):
        tids_np = owned_np[c]
        own_cnt = np.where(np.isin(tids_np, hot), 0,
                           all_counts[tids_np]).astype(np.int32)
        sub_off = (all_offs[hot]
                   + np.minimum(c * share, hot_cnt)).astype(np.int32)
        sub_cnt = (np.minimum((c + 1) * share, hot_cnt)
                   - np.minimum(c * share, hot_cnt)).astype(np.int32)
        offs_np = np.concatenate([all_offs[tids_np], sub_off])
        cnts_np = np.concatenate([own_cnt, sub_cnt])
        ids_np = np.concatenate([tids_np, hot]).astype(np.int32)
        offs = jnp.asarray(offs_np)
        cnts = jnp.asarray(cnts_np)
        tids = jnp.asarray(ids_np)

        def fwd(payload, offs, cnts, tids):
            rgb, tfin = composite_tiles_pallas(
                payload, offs, cnts, nt, nt, tile=TILE, chunk=CHUNK,
                tile_ids=tids,
            )
            return (jnp.sum(rgb) + jnp.sum(tfin)) * 1e-9

        t = chain_time(fwd, pay, offs, cnts, tids)
        rows.append((t, int(cnts_np.sum())))
    report("hybrid", rows)

    # pairslice mode: column c composites slice [c*S, (c+1)*S) over the
    # full grid (clipped segments; lane-aligned slice width)
    p = int(bins.pair_src.shape[0])
    s = -(-(-(-p // N_COLS)) // 128) * 128
    rows = []
    for c in range(N_COLS):
        start = c * s
        offs_np = np.clip(all_offs - start, 0, s).astype(np.int32)
        ends_np = np.clip(all_offs + all_counts - start, 0, s)
        cnts_np = (ends_np - offs_np).astype(np.int32)
        src = np.asarray(bins.pair_src)
        src_pad = np.full(s * N_COLS, -1, np.int32)
        src_pad[:p] = src
        bins_c = bins._replace(
            pair_src=jnp.asarray(src_pad[start:start + s]),
            tile_offsets=jnp.asarray(offs_np),
            tile_counts=jnp.asarray(cnts_np),
        )
        pay_c = jax.jit(lambda b: build_payload(
            proj, colors, op1, b, 64))(bins_c)
        offs = jnp.asarray(offs_np)
        cnts = jnp.asarray(cnts_np)

        def fwd(payload, offs, cnts):
            rgb, tfin = composite_tiles_pallas(
                payload, offs, cnts, nt, nt, tile=TILE, chunk=CHUNK,
            )
            return (jnp.sum(rgb) + jnp.sum(tfin)) * 1e-9

        t = chain_time(fwd, pay_c, offs, cnts)
        rows.append((t, int(cnts_np.sum())))
    report("pairslice", rows)


if __name__ == "__main__":
    main()

"""The Semantic3D headline chain: 1e8 RAW points -> chunked voxel prune ->
single-chip giant-cloud partition.

Mirrors the reference's flagship large-scale path (Semantic3D.md:11 "more
than 10^8 points", partition/provider.py:250-303: `--ver_batch` chunked
reads with per-chunk pruning, then graphs + cut pursuit on the pruned
voxels). Here the raw station is synthesized chunk by chunk (no dataset in
the image), pruned chunk by chunk exactly like `read_semantic3d_format`
(data/provider.py:111-168), globally re-pruned for one consistent grid, and
the pruned cloud runs the full TPU partition (knn_bigcloud -> chunked geof
-> Morton-chunked device-resident band cut pursuit -> device SPG,
pipeline_big.py). Writes tools/semantic3d_headline_results.json.

Usage: python tools/semantic3d_headline.py [--raw_points 100000000]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigcloud_knn import enable_compile_cache  # noqa: E402

enable_compile_cache()

SIDE = 220.0  # metres: large outdoor station footprint


def station_chunk(rg: np.random.Generator, n: int) -> np.ndarray:
    """One chunk of a synthetic outdoor station: ground + building walls +
    volumetric clutter (surface-dominated like real LiDAR, so voxel pruning
    reduces ~10x at 0.1 m like Semantic3D stations do at 0.05).

    All draws are float32 PCG (the legacy f64 RandomState version + float64
    where-chains cost 17 s per 5e6-point chunk on the 1-core host — ~275 s
    of pure data synthesis at 1e8)."""
    f1 = np.float32
    n_ground = int(n * 0.55)
    n_wall = int(n * 0.35)
    n_scatter = n - n_ground - n_wall
    g = np.empty((n_ground, 3), np.float32)
    g[:, 0] = rg.random(n_ground, dtype=np.float32) * f1(SIDE)
    g[:, 1] = rg.random(n_ground, dtype=np.float32) * f1(SIDE)
    g[:, 2] = f1(0.05) * np.sin(g[:, 0] * f1(0.13)) + f1(
        0.02
    ) * rg.standard_normal(n_ground, dtype=np.float32)

    # 40 axis-aligned buildings, deterministic layout (same every chunk)
    brs = np.random.RandomState(12345)
    bx = (brs.rand(40) * (SIDE - 30) + 5).astype(np.float32)
    by = (brs.rand(40) * (SIDE - 30) + 5).astype(np.float32)
    bw = (brs.rand(40) * 18 + 6).astype(np.float32)
    bd = (brs.rand(40) * 18 + 6).astype(np.float32)
    bh = (brs.rand(40) * 12 + 4).astype(np.float32)
    bid = rg.integers(0, 40, n_wall)
    side = rg.integers(0, 4, n_wall, dtype=np.int8)
    t = rg.random(n_wall, dtype=np.float32)
    z = rg.random(n_wall, dtype=np.float32) * bh[bid]
    wx = np.where(
        side < 2, bx[bid] + t * bw[bid],
        np.where(side == 2, bx[bid], bx[bid] + bw[bid]),
    )
    wy = np.where(
        side < 2, np.where(side == 0, by[bid], by[bid] + bd[bid]),
        by[bid] + t * bd[bid],
    )
    w = np.stack([wx, wy, z], axis=1)
    w += f1(0.01) * rg.standard_normal((n_wall, 3), dtype=np.float32)

    # clutter as compact blobs (cars, bushes, poles — real LiDAR returns are
    # surface-dominated; a uniform volumetric fill would alone occupy ~1e7
    # voxels at 0.1 m and misrepresent the workload): deterministic centers
    # shared by every chunk, like the buildings
    crs = np.random.RandomState(777)
    n_blobs = 3000
    cx = crs.rand(n_blobs, 3).astype(np.float32) * np.array(
        [SIDE, SIDE, 0.0], np.float32
    )
    cr = (crs.rand(n_blobs) * 0.8 + 0.2).astype(np.float32)
    bidx = rg.integers(0, n_blobs, n_scatter)
    s = cx[bidx] + rg.standard_normal(
        (n_scatter, 3), dtype=np.float32
    ) * (cr[bidx][:, None] * f1(0.35))
    s[:, 2] = np.abs(s[:, 2])
    return np.concatenate([g, w, s])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_points", type=int, default=100_000_000)
    ap.add_argument("--ver_batch", type=int, default=5_000_000)
    ap.add_argument("--voxel_width", type=float, default=0.1)
    ap.add_argument("--k_nn_geof", type=int, default=45)
    ap.add_argument("--k_nn_adj", type=int, default=10)
    ap.add_argument("--reg_strength", type=float, default=0.8)
    ap.add_argument(
        "--warm_repeat", action="store_true",
        help="re-run the partition a second time in-process to record the "
        "warm (compile-free) number next to the cold one",
    )
    args = ap.parse_args()

    # host prune for the raw chunks: at 5e6 rows/chunk the padded upload
    # over the tunneled TPU costs more than a host pass; the global re-prune
    # (~5e7 concatenated rows) OOMs the device path outright. The C++
    # hash-grid prune (native) is ~11x the numpy argsort path (2.4 s vs
    # 27 s at 5e6 measured) — fall back to numpy only if the lib is absent.
    from superpoint_graph_tpu import native
    from superpoint_graph_tpu.ops.voxel import prune_host
    from superpoint_graph_tpu.pipeline import PartitionConfig
    from superpoint_graph_tpu.pipeline_big import partition_cloud_big

    prune = native.prune if native.available() else prune_host

    rs = np.random.default_rng(0)
    xyz_parts, raw_total = [], 0
    t_gen = t_prune = 0.0
    # chunked generate + per-chunk prune (read_semantic3d_format semantics:
    # peak memory stays at the chunk size). Generation stands in for the
    # reference's pandas chunk read and is timed separately.
    while raw_total < args.raw_points:
        n_c = min(args.ver_batch, args.raw_points - raw_total)
        t0 = time.perf_counter()
        xyz_c = station_chunk(rs, n_c)
        t_gen += time.perf_counter() - t0
        raw_total += n_c
        t0 = time.perf_counter()
        xyz_p, _, _, _ = prune(
            xyz_c, args.voxel_width,
            np.zeros((len(xyz_c), 3), np.uint8), None, None, 0, 0,
        )
        t_prune += time.perf_counter() - t0
        xyz_parts.append(xyz_p)
    t0 = time.perf_counter()
    xyz = np.concatenate(xyz_parts)
    n_after_chunks = len(xyz)
    # one global prune for a consistent grid across chunk boundaries
    xyz, rgb, _, _ = prune(
        xyz, args.voxel_width, np.zeros((len(xyz), 3), np.uint8),
        None, None, 0, 0,
    )
    t_prune += time.perf_counter() - t0
    print(json.dumps({
        "raw_points": raw_total, "after_chunk_prune": n_after_chunks,
        "pruned_points": len(xyz), "gen_seconds": round(t_gen, 1),
        "prune_seconds": round(t_prune, 1),
    }), flush=True)

    cfg = PartitionConfig(
        voxel_width=0.0, k_nn_geof=args.k_nn_geof, k_nn_adj=args.k_nn_adj,
        reg_strength=args.reg_strength, spg_adjacency="knn",
    )
    t0 = time.perf_counter()
    # host_outputs=False: the benchmark never writes the features h5, so
    # skip the ~1 GB adjacency/geof fetch over the tunnel
    res = partition_cloud_big(xyz, rgb, cfg=cfg, host_outputs=False)
    t_cold = time.perf_counter() - t0
    times_cold = {
        k: (round(v, 2) if isinstance(v, float) else v)
        for k, v in res.times.items()
    }

    t_warm = times_warm = None
    if args.warm_repeat:
        t0 = time.perf_counter()
        res = partition_cloud_big(xyz, rgb, cfg=cfg, host_outputs=False)
        t_warm = time.perf_counter() - t0
        times_warm = {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in res.times.items()
        }

    row = {
        "raw_points": int(raw_total),
        "pruned_points": int(len(xyz)),
        "voxel_width": args.voxel_width,
        "gen_seconds": round(t_gen, 1),
        "prune_seconds": round(t_prune, 1),
        "partition_seconds_cold": round(t_cold, 1),
        "end_to_end_seconds_cold": round(t_prune + t_cold, 1),
        "raw_mpts_per_sec": round(raw_total / (t_prune + t_cold) / 1e6, 3),
        "n_superpoints": len(res.components),
        "n_superedges": int(res.graph_sp["source"].shape[0]),
        "times": times_cold,
    }
    if t_warm is not None:
        row["partition_seconds_warm"] = round(t_warm, 1)
        row["raw_mpts_per_sec_warm"] = round(
            raw_total / (t_prune + t_warm) / 1e6, 3
        )
        row["times_warm"] = times_warm
    print(json.dumps(row), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "semantic3d_headline_results.json")
    with open(out, "w") as f:
        json.dump(row, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

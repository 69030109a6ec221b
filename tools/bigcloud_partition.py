"""End-to-end giant-cloud partition measurement (pipeline_big.py).

The reference's large-scale headline: Semantic3D stations are pruned to
1e6-1e7 voxels, then partitioned on the host with a KD-tree + C++ cut
pursuit needing 24 GB RAM (Semantic3D.md:11). This drives the single-chip
TPU equivalent — multi-level sorted-cell kNN, chunked geof, Morton-chunked
band cut pursuit with boundary heal, SPG — and records per-stage seconds.
Writes tools/bigcloud_partition_results.json.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigcloud_knn import big_scene, enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[2_000_000])
    ap.add_argument("--k_nn_geof", type=int, default=45)
    ap.add_argument("--k_nn_adj", type=int, default=10)
    ap.add_argument("--reg_strength", type=float, default=0.1)
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--chunk_points", type=int, default=1 << 19,
                    help="Morton chunk size for the banded CP solver")
    ap.add_argument("--out", type=str, default="bigcloud_partition_results.json",
                    help="results filename (under tools/)")
    ap.add_argument("--r4_mode", action="store_true",
                    help="run the solver with the round-4 knobs (global "
                    "accept, max_iter 8, no tol stop, jumps 3, rounds 16) "
                    "— the like-for-like arm for the 44.2 s r4 receipt")
    args = ap.parse_args()

    from superpoint_graph_tpu.pipeline import PartitionConfig
    from superpoint_graph_tpu.pipeline_big import partition_cloud_big

    results = []
    for n in args.sizes:
        xyz = big_scene(n)
        rgb = np.full((len(xyz), 3), 127, np.uint8)
        cfg = PartitionConfig(
            voxel_width=0.0, k_nn_geof=args.k_nn_geof,
            k_nn_adj=args.k_nn_adj, reg_strength=args.reg_strength,
            spg_adjacency="knn",
        )
        solver_kw = dict(
            accept="global", max_iter=8, stop_tol=0.0, cc_jumps=3,
            cc_rounds=16,
        ) if args.r4_mode else None
        cold = None
        if args.warm:
            t0 = time.perf_counter()
            partition_cloud_big(xyz, rgb, cfg=cfg,
                                chunk_points=args.chunk_points,
                                cp_solver_kw=solver_kw)
            cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = partition_cloud_big(xyz, rgb, cfg=cfg,
                                  chunk_points=args.chunk_points,
                                  cp_solver_kw=solver_kw)
        total = time.perf_counter() - t0
        row = {
            "n_points": int(len(xyz)),
            "chunk_points": args.chunk_points,
            # first-in-process run: pays every jit compile not served by the
            # persistent cache (the cold-start number VERDICT r2 flagged)
            "seconds_cold": round(cold, 2) if cold is not None else None,
            "seconds_total": round(total, 2),
            "mpts_per_sec": round(len(xyz) / total / 1e6, 4),
            "n_superpoints": len(res.components),
            "n_superedges": int(res.graph_sp["source"].shape[0]),
            "times": {
                k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in res.times.items()
            },
        }
        print(json.dumps(row))
        results.append(row)
        del xyz, res

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), args.out)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

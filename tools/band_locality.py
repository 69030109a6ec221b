"""Morton-index edge-locality histogram — the data behind the band geometry.

The banded cut-pursuit solver (ops/cutpursuit_band.py) streams a dense
[NB, B, WIN] window every CC/ICM sweep; sweep cost is proportional to WIN,
while edges falling outside the window go to the exact overflow pass whose
segment ops cost ~8 ns/index per round. The optimal (B, HALO) therefore
depends on how concentrated |morton(i) - morton(j)| is for kNN edges.
This tool measures that distribution on the synthetic big scene at a given
scale: fraction of directed kNN edges within +-{64,128,256,512,1024,2048,
4096} Morton positions, for k_adj and k_geof columns separately.

Usage (real TPU): python tools/band_locality.py [--n 2000000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigcloud_knn import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--k_geof", type=int, default=45)
    ap.add_argument("--k_adj", type=int, default=10)
    ap.add_argument("--voxel", type=float, default=0.03)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from superpoint_graph_tpu.data.synthetic import big_scene
    from superpoint_graph_tpu.ops import voxel
    from superpoint_graph_tpu.ops.cutpursuit_band import morton_order
    from superpoint_graph_tpu.ops.knn import knn_bigcloud

    xyz = big_scene(args.n)
    if args.voxel > 0:
        xyz, _, _, _ = voxel.prune(
            xyz, args.voxel, np.zeros((len(xyz), 3), np.uint8), None, None,
            0, 0,
        )
    n = len(xyz)
    print(f"pruned n={n}", flush=True)

    t0 = time.perf_counter()
    bi, _, _ = knn_bigcloud(xyz, args.k_geof)
    idx = np.asarray(bi)
    print(f"knn {time.perf_counter()-t0:.1f}s", flush=True)

    perm = morton_order(xyz)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)

    res = {"n": n}
    for name, k in (("adj", args.k_adj), ("geof", args.k_geof)):
        off = np.abs(
            inv[idx[:, :k]].astype(np.int64) - inv[:, None].astype(np.int64)
        ).reshape(-1)
        e = len(off)
        row = {"edges": e, "p50": int(np.percentile(off, 50)),
               "p90": int(np.percentile(off, 90)),
               "p99": int(np.percentile(off, 99))}
        for r in (64, 128, 256, 512, 1024, 2048, 4096):
            row[f"frac_within_{r}"] = round(float((off < r).mean()), 5)
        res[name] = row
        print(name, row, flush=True)

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "band_locality_results.json",
    )
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()

"""A/B the two giant-path geof kernels on the real chip.

`compute_geof_rows` (fused rank-3 [m, k+1, 3] gather + eigh3x3) vs
`compute_geof_rows_cols` (columnar: three [m, k] gathers + six 1-D
covariance columns; rank-3 trailing dims of 3 tile to 128 lanes on TPU).
Whichever wins becomes pipeline_big's default (SPGT_GEOF_COLS gate today).

Times are best-of-N with a small-reduction host fetch as the sync (the
tunnel's block_until_ready can return before execution — CLAUDE.md).
Writes tools/geof_ab_results.json.
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
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--k", type=int, default=45)
    ap.add_argument("--best_of", type=int, default=3)
    ap.add_argument("--geof_chunk", type=int, default=1 << 21)
    args = ap.parse_args()

    import jax.numpy as jnp

    from superpoint_graph_tpu.ops.geof import (
        compute_geof_rows, compute_geof_rows_cols,
    )
    from superpoint_graph_tpu.ops.knn import knn_bigcloud

    xyz = big_scene(args.n)
    n = len(xyz)
    bi, _, _ = knn_bigcloud(xyz, args.k)
    xyz_dev = jnp.asarray(xyz)

    def run(fn):
        parts = [
            fn(xyz_dev, xyz_dev[s : min(n, s + args.geof_chunk)],
               bi[s : min(n, s + args.geof_chunk)])
            for s in range(0, n, args.geof_chunk)
        ]
        g = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        return g

    out = {"n": n, "k": args.k, "best_of": args.best_of}
    results = {}
    for name, fn in (("rows", compute_geof_rows),
                     ("cols", compute_geof_rows_cols)):
        g = run(fn)  # warm (compile)
        s_warm = float(jnp.sum(g))
        best = float("inf")
        for _ in range(args.best_of):
            t0 = time.perf_counter()
            g = run(fn)
            float(jnp.sum(g))  # tunnel-safe sync
            best = min(best, time.perf_counter() - t0)
        out[f"t_{name}"] = round(best, 3)
        results[name] = (s_warm, np.asarray(g))
    # numeric agreement between the two forms (same features to f32 tol)
    ga, gb = results["rows"][1], results["cols"][1]
    out["max_abs_diff"] = float(np.abs(ga - gb).max())
    out["speedup_cols_over_rows"] = round(out["t_rows"] / out["t_cols"], 3)
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "geof_ab_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()

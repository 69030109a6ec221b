"""Big-cloud kNN verification + benchmark on the real TPU.

Builds a Semantic3D-scale synthetic scan (a grid of synthetic rooms — surface
geometry, non-uniform density), runs the sorted-cell kNN (`knn_bigcloud`) at
1e6 and 1e7 points, and verifies neighbor agreement against an exact blocked
brute-force answer on a random query sample (exact full-cloud kNN at 1e7 is
O(1e14) pairs — the sample is the established protocol; VERDICT.md item 3
asks for >=99% agreement at 1e7).

Writes tools/bigcloud_knn_results.json. Run on the real TPU:
    python tools/bigcloud_knn.py [--sizes 1000000 10000000]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def enable_compile_cache():
    import jax

    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_spgt"
    )
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache sub-second compiles too: ~80 eager-op executables x ~0.5 s
        # each re-compiled per process under the default 1.0 s threshold
        # (tools/cache_diag_results.json)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


enable_compile_cache()


# shared generator (moved into the package so bench.py's big-path leg can
# use the identical scene)
from superpoint_graph_tpu.data.synthetic import big_scene  # noqa: E402,F401


def sampled_exact(xyz: np.ndarray, k: int, sample: int, seed: int = 1):
    """Exact kNN for `sample` random queries via blocked brute force."""
    import jax.numpy as jnp

    from superpoint_graph_tpu.ops.knn import knn_vs_db

    n = len(xyz)
    rs = np.random.RandomState(seed)
    sel = rs.choice(n, size=sample, replace=False)
    bq = 256
    mq = -(-sample // bq) * bq
    q = np.full((mq, 3), 2e17, np.float32)
    q[:sample] = xyz[sel]
    bdb = 65536
    ndb = -(-n // bdb) * bdb
    db = np.full((ndb, 3), 0, np.float32)
    db[:n] = xyz
    if ndb > n:
        db[n:] = 1e17 + np.arange(ndb - n, dtype=np.float32)[:, None]
    fi, fd = knn_vs_db(
        jnp.asarray(q), jnp.asarray(db), k + 1,
        block_q=bq, block_db=bdb, recall_target=0.9999,
    )
    fi = np.asarray(fi[:sample])
    fd = np.asarray(fd[:sample])
    is_self = fi == sel[:, None]
    order = np.argsort(np.where(is_self, np.inf, fd), axis=1)[:, :k]
    return sel, np.take_along_axis(fi, order, axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[1_000_000, 10_000_000])
    ap.add_argument("--k", type=int, default=45)
    ap.add_argument("--sample", type=int, default=1024)
    args = ap.parse_args()

    from superpoint_graph_tpu.ops.knn import knn_bigcloud

    results = []
    for n in args.sizes:
        xyz = big_scene(n)
        t0 = time.perf_counter()
        bi, bd, info = knn_bigcloud(xyz, args.k)
        bi.block_until_ready()
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        bi, bd, info = knn_bigcloud(xyz, args.k)
        bi.block_until_ready()
        t_warm = time.perf_counter() - t0
        bi_host = np.asarray(bi)

        sel, exact_idx = sampled_exact(xyz, args.k, args.sample)
        agree = np.mean(
            [
                len(np.intersect1d(exact_idx[i], bi_host[sel[i]])) / args.k
                for i in range(len(sel))
            ]
        )
        row = {
            "n_points": int(len(xyz)),
            "k": args.k,
            "agreement_vs_exact": round(float(agree), 5),
            "seconds_warm": round(t_warm, 3),
            "seconds_cold": round(t_cold, 3),
            "mpts_per_sec": round(len(xyz) / t_warm / 1e6, 3),
            "window": info["window"],
            "cell_h": round(info["h"], 5),
            "n_fallback": info["n_fallback"],
            "stage_seconds": info.get("stage_seconds"),
            "levels": info.get("levels"),
        }
        print(json.dumps(row))
        results.append(row)
        del xyz, bi, bd, bi_host

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bigcloud_knn_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

"""Benchmark: end-to-end geometric partition throughput (Mpts/sec) on TPU.

Measures the headline pipeline of the reference's partition stage
(partition/partition.py:113-189: kNN graphs + geometric features + l0 cut
pursuit + SPG build) on a synthetic S3DIS-like room cloud, steady-state
(after compile), on the real device.

`vs_baseline` compares against a host CPU implementation of the same pipeline
built from the reference's ingredient choices (sklearn KD-tree kNN +
vectorized-numpy covariance/eigen features + the exact max-flow cut-pursuit
oracle) measured on this machine — the stand-in for the C++/OpenMP reference
path until BASELINE.md gains measured reference numbers (its C++ deps are not
buildable here: the cut-pursuit submodule is absent upstream).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: compiles survive across bench runs
    (the partition programs are large; first-compile dominates otherwise)."""
    import jax

    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_spgt"
    )
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

N_POINTS = 60000
N_REPEATS = 3


def tpu_partition_time(clouds, cfg):
    """Mean per-cloud time over N distinct clouds, processed through the
    2-stage software pipeline (features of cloud i+1 overlap the cut-pursuit
    host work of cloud i)."""
    from superpoint_graph_tpu.pipeline import partition_cloud, partition_clouds

    xyz0, rgb0 = clouds[0]
    partition_cloud(xyz0, rgb0, None, None, n_labels=0, cfg=cfg)  # warm compile
    t0 = time.perf_counter()
    partition_clouds([(x, r, None, None) for x, r in clouds], cfg)
    return (time.perf_counter() - t0) / len(clouds)


def host_partition_time(xyz, rgb, cfg):
    """Reference-architecture host pipeline: KD-tree kNN (sklearn, like
    graphs.py:26) + the C++ native kernels (compute_geof, l0 cut pursuit with
    Dinic max-flow — native/spgt_native.cpp) + the vectorized SPG builder.
    This mirrors the reference's C++-kernels-plus-host-orchestration design
    and is the measured stand-in for its absent buildable binaries."""
    from sklearn.neighbors import NearestNeighbors

    from superpoint_graph_tpu import native
    from superpoint_graph_tpu.graph.spg import compute_sp_graph

    if native.available():
        geof_fn = lambda x, i: native.compute_geof(x, i, i.shape[1])
        cp_fn = lambda f, s, t, w, reg: native.cutpursuit(
            f, s, t, w, reg, max_iter=6
        )
    else:
        from superpoint_graph_tpu.ops.cutpursuit import cutpursuit
        from superpoint_graph_tpu.ops.geof import compute_geof_numpy

        geof_fn = compute_geof_numpy
        cp_fn = lambda f, s, t, w, reg: cutpursuit(f, s, t, w, reg, max_iter=6)

    def run():
        nn = NearestNeighbors(
            n_neighbors=cfg.k_nn_geof + 1, algorithm="kd_tree"
        ).fit(xyz)
        dist, idx = nn.kneighbors(xyz)
        idx, dist = idx[:, 1:].astype(np.uint32), dist[:, 1:]
        geof = geof_fn(xyz, idx)
        src = np.repeat(np.arange(len(xyz)), cfg.k_nn_adj)
        tgt = idx[:, : cfg.k_nn_adj].reshape(-1)
        d = dist[:, : cfg.k_nn_adj].reshape(-1)
        w = (1.0 / (cfg.lambda_edge_weight + d / d.mean())).astype(np.float32)
        feats = np.hstack([geof, rgb / 255.0]).astype(np.float32)
        feats[:, 3] *= 2.0
        comps, in_comp = cp_fn(feats, src, tgt, w, cfg.reg_strength)
        compute_sp_graph(xyz, cfg.d_se_max, in_comp, comps, None, 0,
                         adjacency=cfg.spg_adjacency)

    t0 = time.perf_counter()
    run()
    return time.perf_counter() - t0


def main():
    from superpoint_graph_tpu.data.synthetic import synthetic_room
    from superpoint_graph_tpu.pipeline import PartitionConfig

    rng = np.random.RandomState(0)
    clouds = []
    for _ in range(N_REPEATS + 1):
        xyz, rgb, _, _ = synthetic_room(rng, n_points=N_POINTS, noise=0.008)
        clouds.append((xyz, rgb))
    cfg = PartitionConfig(
        voxel_width=0.0,  # bench the dense path; prune is measured implicitly
        k_nn_geof=45,
        k_nn_adj=10,
        reg_strength=0.1,
        cp_backend="tpu",
        spg_adjacency="knn",
    )

    t_tpu = tpu_partition_time(clouds, cfg)
    mpts = N_POINTS / t_tpu / 1e6

    try:
        t_host = host_partition_time(clouds[0][0], clouds[0][1], cfg)
        vs = t_host / t_tpu
    except Exception:
        vs = float("nan")

    print(
        json.dumps(
            {
                "metric": "partition_throughput",
                "value": round(mpts, 4),
                "unit": "Mpts/sec",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

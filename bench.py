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
import time

import numpy as np

N_POINTS = 60000
N_REPEATS = 3


def tpu_partition_time(xyz, rgb, cfg):
    from superpoint_graph_tpu.pipeline import partition_cloud

    # warmup/compile
    partition_cloud(xyz, rgb, None, None, n_labels=0, cfg=cfg)
    t0 = time.perf_counter()
    for _ in range(N_REPEATS):
        partition_cloud(xyz, rgb, None, None, n_labels=0, cfg=cfg)
    return (time.perf_counter() - t0) / N_REPEATS


def host_partition_time(xyz, rgb, cfg):
    """Reference-style host pipeline: KD-tree kNN, numpy geof, exact CP."""
    from sklearn.neighbors import NearestNeighbors

    from superpoint_graph_tpu.graph.spg import compute_sp_graph
    from superpoint_graph_tpu.ops.cutpursuit import cutpursuit
    from superpoint_graph_tpu.ops.eigen3 import eigh3x3  # noqa: F401

    def run():
        nn = NearestNeighbors(n_neighbors=cfg.k_nn_geof + 1, algorithm="kd_tree").fit(xyz)
        dist, idx = nn.kneighbors(xyz)
        idx, dist = idx[:, 1:], dist[:, 1:]
        # vectorized numpy geof (the reference's per-point Eigen loop, batched)
        pos = np.concatenate([xyz[:, None, :], xyz[idx]], axis=1)
        cen = pos - pos.mean(1, keepdims=True)
        cov = np.einsum("nki,nkj->nij", cen, cen) / (cfg.k_nn_geof + 1)
        ev = np.linalg.eigvalsh(cov)[:, ::-1]
        ev = np.maximum(ev, 0)
        s = np.sqrt(ev + 1e-10)
        geof = np.stack(
            [(s[:, 0] - s[:, 1]) / s[:, 0],
             (s[:, 1] - s[:, 2]) / s[:, 0],
             s[:, 2] / s[:, 0],
             np.ones(len(xyz), np.float32)], 1,
        ).astype(np.float32)
        src = np.repeat(np.arange(len(xyz)), cfg.k_nn_adj)
        tgt = idx[:, : cfg.k_nn_adj].reshape(-1)
        d = dist[:, : cfg.k_nn_adj].reshape(-1)
        w = 1.0 / (cfg.lambda_edge_weight + d / d.mean())
        feats = np.hstack([geof, rgb / 255.0]).astype(np.float32)
        comps, in_comp = cutpursuit(feats, src, tgt, w, cfg.reg_strength,
                                    max_iter=6)
        compute_sp_graph(xyz, cfg.d_se_max, in_comp, comps, None, 0,
                         adjacency=cfg.spg_adjacency)

    t0 = time.perf_counter()
    run()
    return time.perf_counter() - t0


def main():
    from superpoint_graph_tpu.data.synthetic import synthetic_room
    from superpoint_graph_tpu.pipeline import PartitionConfig

    rng = np.random.RandomState(0)
    xyz, rgb, _, _ = synthetic_room(rng, n_points=N_POINTS, noise=0.008)
    cfg = PartitionConfig(
        voxel_width=0.0,  # bench the dense path; prune is measured implicitly
        k_nn_geof=45,
        k_nn_adj=10,
        reg_strength=0.1,
        cp_backend="tpu",
        spg_adjacency="knn",
    )

    t_tpu = tpu_partition_time(xyz, rgb, cfg)
    mpts = N_POINTS / t_tpu / 1e6

    try:
        t_host = host_partition_time(xyz, rgb, cfg)
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

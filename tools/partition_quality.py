"""Partition-quality validation: TPU cut pursuit vs the exact max-flow oracle
vs the C++ native solver (SURVEY.md §7.2 milestone B: the TPU reformulation is
validated statistically, not bit-exactly).

For synthetic rooms with known object structure, reports per solver:
  energy   — the l0 objective (lower is better)
  n_comp   — region count
  OOA      — optimal attainable overall accuracy of the partition (majority
             label per region; the ceiling a classifier could reach)
  BR / BP  — boundary recall/precision vs ground-truth object transitions
Results land in tools/partition_quality_results.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def connectivity_audit(in_comp, src, tgt):
    """Count labels whose same-label kNN subgraph is disconnected."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = len(in_comp)
    m = in_comp[src] == in_comp[tgt]
    g = coo_matrix(
        (np.ones(int(m.sum()), np.int8), (src[m], tgt[m])), shape=(n, n)
    )
    n_cc, _ = connected_components(g, directed=False)
    n_lab = int(in_comp.max()) + 1
    return {"n_labels": n_lab, "n_true_cc": int(n_cc),
            "disconnected_labels": int(n_cc - n_lab)}


def evaluate_partition(in_comp, labels_hist, objects, src, tgt, f, w, reg):
    from superpoint_graph_tpu.learn.metrics import (
        compute_boundary_precision,
        compute_boundary_recall,
        compute_OOA,
    )
    from superpoint_graph_tpu.ops.components import group_components
    from superpoint_graph_tpu.ssp.losses import relax_edge_binary

    comps = group_components(np.asarray(in_comp))
    ooa = compute_OOA(comps, labels_hist[:, 1:])
    is_tr = objects[src] != objects[tgt]
    pred_tr = in_comp[src] != in_comp[tgt]
    n = len(in_comp)
    br = compute_boundary_recall(
        is_tr, relax_edge_binary(pred_tr, src, tgt, n, 1)
    )
    bp = compute_boundary_precision(
        relax_edge_binary(is_tr, src, tgt, n, 1), pred_tr
    )
    # energy
    from superpoint_graph_tpu.ops.cutpursuit import _energy

    e, _ = _energy(
        f.astype(np.float64), np.ones(n), np.asarray(in_comp, np.int64),
        src.astype(np.int64), tgt.astype(np.int64), w.astype(np.float64), reg,
    )
    return {
        "energy": round(float(e), 1),
        "n_comp": int(np.max(in_comp)) + 1,
        "OOA": round(float(ooa), 2),
        "BR": round(float(br), 2),
        "BP": round(float(bp), 2),
    }


def main():
    from superpoint_graph_tpu import native
    from superpoint_graph_tpu.data.synthetic import N_CLASSES, synthetic_room
    from superpoint_graph_tpu.ops.cutpursuit import cutpursuit as cp_exact
    from superpoint_graph_tpu.ops.cutpursuit_jax import cutpursuit_tpu
    from superpoint_graph_tpu.ops.voxel import prune
    from superpoint_graph_tpu.pipeline import (
        PartitionConfig,
        assemble_partition_features,
        edge_weights,
        partition_features,
    )

    reg = 0.03
    results = {}
    for room_i in range(3):
        rng = np.random.RandomState(100 + room_i)
        xyz, rgb, labels, objects = synthetic_room(rng, n_points=30000)
        px, pr, hist, obj_hist = prune(
            xyz, 0.04, rgb, labels + 1, objects, N_CLASSES,
            int(objects.max()) + 1,
        )
        obj = obj_hist[:, 1:].argmax(1)
        cfg = PartitionConfig(voxel_width=0.0, k_nn_geof=30, k_nn_adj=8)
        graph_nn, geof = partition_features(px, cfg)
        f = assemble_partition_features(geof, pr, cfg)
        w = edge_weights(graph_nn["distances"], 1.0)
        src = graph_nn["source"].astype(np.int64)
        tgt = graph_nn["target"].astype(np.int64)

        from superpoint_graph_tpu.ops.cutpursuit_band import cutpursuit_band

        solvers = {
            "tpu": lambda: cutpursuit_tpu(f, src, tgt, w, reg),
            "band": lambda: cutpursuit_band(f, src, tgt, w, reg, xyz=px),
            "exact": lambda: cp_exact(f, src, tgt, w, reg),
        }
        if native.available():
            solvers["native"] = lambda: native.cutpursuit(
                f, src, tgt, w.astype(np.float32), reg, max_iter=6
            )
        for name, fn in solvers.items():
            t0 = time.perf_counter()
            _, in_comp = fn()
            dt = time.perf_counter() - t0
            r = evaluate_partition(in_comp, hist, obj, src, tgt, f, w, reg)
            r["seconds"] = round(dt, 2)
            results.setdefault(name, []).append(r)
            print(f"room {room_i} {name:7s} {r}", flush=True)

    summary = {
        name: {
            k: round(float(np.mean([r[k] for r in rs])), 2)
            for k in ("energy", "n_comp", "OOA", "BR", "BP", "seconds")
        }
        for name, rs in results.items()
    }
    print(json.dumps(summary, indent=2))
    out = os.path.join(os.path.dirname(__file__), "partition_quality_results.json")
    with open(out, "w") as fjson:
        json.dump({"per_room": results, "mean": summary}, fjson, indent=2)


if __name__ == "__main__":
    main()

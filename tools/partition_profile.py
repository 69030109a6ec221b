"""Per-stage partition timing at the bench shape (60k-pt room, steady
state) — guides optimization of the dominant stage. Writes
tools/partition_profile_results.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigcloud_knn import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp

    from superpoint_graph_tpu.data.synthetic import synthetic_room
    from superpoint_graph_tpu.graph.spg import compute_sp_graph
    from superpoint_graph_tpu.ops import geof as geof_ops
    from superpoint_graph_tpu.ops.cutpursuit import merge_regions
    from superpoint_graph_tpu.ops.cutpursuit_band import cutpursuit_band_device
    from superpoint_graph_tpu.ops.knn import compute_graph_nn_2
    from superpoint_graph_tpu.pipeline import (
        PartitionConfig, assemble_partition_features, edge_weights,
    )

    rng = np.random.RandomState(0)
    xyz, rgb, labels, objects = synthetic_room(
        rng, n_points=60000, noise=0.008
    )
    xyz = np.asarray(xyz, np.float32)
    cfg = PartitionConfig(
        voxel_width=0.0, k_nn_geof=45, k_nn_adj=10, reg_strength=0.1,
        cp_backend="tpu", spg_adjacency="knn",
    )

    t = {}

    def run_once(record):
        t0 = time.perf_counter()
        out = compute_graph_nn_2(
            xyz, cfg.k_nn_adj, cfg.k_nn_geof, return_device=True
        )
        graph_nn, target_geof, dev = out
        jax.block_until_ready(dev["idx"])
        if record:
            t["knn"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        n = len(xyz)
        n_pad = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
        xyz_d = jnp.asarray(xyz)
        if n_pad > n:
            xyz_d = jnp.pad(xyz_d, ((0, n_pad - n), (0, 0)))
            tg = jnp.pad(target_geof, ((0, n_pad - n), (0, 0)))
        else:
            tg = target_geof
        geof_dev = geof_ops.compute_geof(xyz_d, tg)
        geof = np.asarray(geof_dev[:n])
        dev["geof"] = geof_dev
        if record:
            t["geof"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        rgb_p = np.zeros((n_pad, 3), np.uint8)
        rgb_p[:n] = np.asarray(rgb, np.uint8)
        from superpoint_graph_tpu.pipeline import _assemble_features_device

        f_dev = _assemble_features_device(dev["geof"], jnp.asarray(rgb_p))
        in_comp = cutpursuit_band_device(
            f_dev, dev["idx"][:, : cfg.k_nn_adj], dev["d2"][:, : cfg.k_nn_adj],
            xyz, n, cfg.reg_strength,
            lambda_edge_weight=cfg.lambda_edge_weight,
        )
        if record:
            t["cp_band_device"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        features = assemble_partition_features(geof, rgb, cfg)
        src = np.asarray(graph_nn["source"], np.int64)
        tgt = np.asarray(graph_nn["target"], np.int64)
        w = edge_weights(graph_nn["distances"], cfg.lambda_edge_weight)
        in_comp = merge_regions(
            features, np.ones(n), in_comp, src, tgt, w,
            float(cfg.reg_strength),
        )
        if record:
            t["merge_host"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        from superpoint_graph_tpu.ops.components import group_components

        comps = group_components(in_comp)
        if record:
            t["group"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        compute_sp_graph(
            xyz, cfg.d_se_max, in_comp, comps, labels, 13,
            adjacency="knn", knn_edges=(src, tgt),
        )
        if record:
            t["spg"] = time.perf_counter() - t0

        # the device SPG builder (giant-path default) — A/B'd for the room
        # path in round 5 and REJECTED: tunnel-RPC-bound at this scale
        # (0.18 vs 0.12 s host in the same run)
        t0 = time.perf_counter()
        from superpoint_graph_tpu.graph.spg_device import (
            compute_sp_graph_device,
        )

        compute_sp_graph_device(
            xyz, cfg.d_se_max, in_comp, comps, labels, 13,
            idx_adj=dev["idx"][:n, : cfg.k_nn_adj],
        )
        if record:
            t["spg_device"] = time.perf_counter() - t0
        return comps

    run_once(record=False)  # warm
    best = {}
    for _ in range(3):
        t.clear()
        comps = run_once(record=True)
        for k, v in t.items():
            best[k] = min(best.get(k, float("inf")), v)
    t.clear()
    t.update(best)
    # production room-path total: spg_device is the rejected alternative
    t["total"] = sum(v for k, v in t.items() if k != "spg_device")
    t["n_superpoints"] = len(comps)
    for k, v in t.items():
        t[k] = round(v, 4)
    print(json.dumps(t))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "partition_profile_results.json")
    with open(out, "w") as f:
        json.dump(t, f, indent=1)


if __name__ == "__main__":
    main()

"""In-loop SSP partition viability on TPU (VERDICT item 6).

The SSP training step runs cut pursuit INSIDE every step
(supervized_partition/losses.py:91-117 — the crosspartition weighting needs
the predicted partition). This measures the per-step cut-pursuit cost at the
SSP training shape (max_ver_train=1e4, k_nn_adj=5; supervized_partition.py)
for the host-exact oracle vs the TPU band solver, steady state.

Target: cp_backend='tpu' step <= 2x the 'exact' step. Writes
tools/ssp_inloop_results.json.
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
    from superpoint_graph_tpu.data.synthetic import synthetic_room
    from superpoint_graph_tpu.ssp.losses import (
        SspLossConfig, compute_partition,
    )

    rng = np.random.RandomState(0)
    n = 10_000  # reference max_ver_train (supervized_partition.py:97)
    xyz, _, _, objects = synthetic_room(rng, n_points=n)
    k = 5
    # kNN graph like graph_loader's
    from superpoint_graph_tpu.ops.knn import compute_graph_nn_2

    graph, _ = compute_graph_nn_2(xyz, k, k)
    src = graph["source"].astype(np.int64)
    tgt = graph["target"].astype(np.int64)
    # 4-d embeddings, L2-normalized like LocalCloudEmbedder output
    emb = rng.randn(n, 4).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    diff = np.linalg.norm(emb[src] - emb[tgt], axis=1)

    results = {}
    for backend in ("exact", "tpu"):
        cfg = SspLossConfig(cp_backend=backend, CP_cutoff=25, k_nn_adj=k)
        # warm (jit compile on the tpu path)
        compute_partition(cfg, emb, src, tgt, diff, xyz=xyz)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            comps, in_comp = compute_partition(
                cfg, emb, src, tgt, diff, xyz=xyz
            )
        dt = (time.perf_counter() - t0) / reps
        results[backend] = {
            "sec_per_partition": round(dt, 4),
            "n_superpoints": len(comps),
        }
        print(backend, results[backend])

    ratio = (
        results["tpu"]["sec_per_partition"]
        / results["exact"]["sec_per_partition"]
    )
    results["tpu_over_exact"] = round(ratio, 3)
    print("tpu/exact ratio:", results["tpu_over_exact"])
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ssp_inloop_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

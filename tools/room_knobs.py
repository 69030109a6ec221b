"""Room-scale (bench shape, 60k) knob A/Bs on the real chip.

The flagship bench value is ~all partition time: knn 0.34 s + band CP
0.36 s + spg 0.10 s at 60k (tools/partition_profile_results.json). This
times the two dominant legs under knob variants:

* knn block_q: the blocked brute-force search lax.maps over n/block_q
  query tiles; wider tiles = fewer approx_min_k dispatches, more MXU
  parallelism per tile.
* band CP cc_jumps at the SQUARE geometry (the chunk-scale receipt
  tools/band_profile_results.json showed jumps1 saves 10% at narrow with
  rounds/labels unchanged; the room path was left at 3 pending this).

Writes tools/room_knobs_results.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigcloud_knn import enable_compile_cache  # noqa: E402

enable_compile_cache()


def best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from superpoint_graph_tpu.data.synthetic import synthetic_room
    from superpoint_graph_tpu.ops import cutpursuit_band as cpb
    from superpoint_graph_tpu.ops.geof import compute_geof
    from superpoint_graph_tpu.ops.knn import knn
    from superpoint_graph_tpu.pipeline import _assemble_features_device

    rng = np.random.RandomState(0)
    xyz, rgb, _, _ = synthetic_room(rng, n_points=60000, noise=0.008)
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    res = {"n": n}

    xyz_dev = jnp.asarray(xyz)

    # --- kNN block_q sweep (k=45, the geof k) ---------------------------
    for bq in (512, 1024, 2048, 4096):
        def run(bq=bq):
            i, d = knn(xyz_dev, 45, block_q=bq)
            float(jnp.sum(d[:4, 0]))
        run()  # compile
        res[f"knn_bq{bq}"] = round(best_of(run), 4)
        print(f"knn_bq{bq}: {res[f'knn_bq{bq}']}", flush=True)

    # --- band CP cc_jumps at the square geometry ------------------------
    idx, d2 = knn(xyz_dev, 45)
    n_pad = 1 << int(np.ceil(np.log2(max(n, 1024))))
    xyz_p = jnp.pad(xyz_dev, ((0, n_pad - n), (0, 0)))
    tg = compute_geof(xyz_p, jnp.pad(idx[:, :45], ((0, n_pad - n), (0, 0))))
    rgb_p = np.zeros((n_pad, 3), np.uint8)
    rgb_p[:n] = rgb
    f_dev = _assemble_features_device(tg, jnp.asarray(rgb_p))
    idx_p = jnp.pad(idx[:, :10], ((0, n_pad - n), (0, 0)))
    d2_p = jnp.pad(d2[:, :10], ((0, n_pad - n), (0, 0)), constant_values=1e17)
    for jumps in (3, 2, 1):
        def run(jumps=jumps):
            return cpb.cutpursuit_band_device(
                f_dev, idx_p, d2_p, xyz, n, 0.1, cc_jumps=jumps,
            )
        ic = run()
        st = dict(cpb.LAST_SOLVE_STATS)
        res[f"cp_jumps{jumps}"] = round(best_of(run), 4)
        res[f"cp_jumps{jumps}_rounds"] = st.get("cc_rounds")
        res[f"cp_jumps{jumps}_ncomp"] = int(ic.max()) + 1
        print(f"cp_jumps{jumps}: {res[f'cp_jumps{jumps}']} "
              f"rounds={st.get('cc_rounds')} ncomp={res[f'cp_jumps{jumps}_ncomp']}",
              flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "room_knobs_results.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()



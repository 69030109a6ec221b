"""Attribute the at-scale partition-quality gap (VERDICT r3 #4 follow-up).

tools/partition_quality_atscale_results.json showed the chunked device path
under-segmenting at 656k voxels vs the exact host solver (6725 vs 15009
components, energy ratio 1.159, OOA -2.5 / BR -2.5 / BP -7.0). Both solvers
share the same outer algorithm (global accept + early break on a
non-improving iteration, sticky per-region saturation) so the gap must come
from (a) parameter mismatch — the band solver defaults to max_iter=8 /
flow_steps=2 / power_iters=8, the C++ exact to 10 / 3 / 12 — or (b) the
ICM split underperforming exact Dinic max-flow at scale, or (c) the chunk
machinery (2 chunks at this size). This tool isolates them on IDENTICAL
features/graph (cached to an npz so legs don't repay the 205 s kNN+geof):

  exact          native.cutpursuit defaults (receipt reproduction)
  exact_matched  native.cutpursuit at the band solver's budget (8 / 2)
  chunked        chunked_cutpursuit_device defaults (+ per-chunk iters now
                 recorded via LAST_CP_STATS.solve_iters)
  chunked_strong chunked with max_iter=16 flow_steps=3 icm_sweeps=5
                 power_iters=12
  mono           cutpursuit_band_device (no chunking) + host merge step,
                 the single-room path of pipeline.py:102-135

Each leg also audits label connectivity (labels whose same-label kNN
subgraph splits into >1 true connected component — would implicate CC-round
truncation or a non-adjacent merge).

Usage (TPU for chunked/mono legs; exact legs host-only):
  python tools/atscale_knobs.py --legs exact_matched,chunked,chunked_strong
Results merge into tools/atscale_knobs_results.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigcloud_knn import enable_compile_cache  # noqa: E402

enable_compile_cache()

from partition_quality import (  # noqa: E402
    connectivity_audit, evaluate_partition,
)
from partition_quality_atscale import sp_size_hist  # noqa: E402

CACHE = "/tmp/atscale_cache_{n}.npz"


def build_or_load(n_raw: int, voxel: float, k_geof: int, k_adj: int):
    path = CACHE.format(n=n_raw)
    if os.path.exists(path):
        z = np.load(path)
        return {k: z[k] for k in z.files}
    import jax.numpy as jnp

    from superpoint_graph_tpu.data.synthetic import (
        N_CLASSES, big_scene_labeled,
    )
    from superpoint_graph_tpu.ops.geof import compute_geof_rows
    from superpoint_graph_tpu.ops.knn import knn_bigcloud
    from superpoint_graph_tpu.ops.voxel import prune
    from superpoint_graph_tpu.pipeline import (
        _assemble_features_device_nocolor,
    )

    t0 = time.perf_counter()
    xyz, labels, objects = big_scene_labeled(n_raw)
    rgb = np.zeros((len(xyz), 3), np.uint8)
    px, _, hist, obj_hist = prune(
        xyz, voxel, rgb, labels + 1, objects, N_CLASSES,
        int(objects.max()) + 1,
    )
    obj = obj_hist[:, 1:].argmax(1)
    bi, bd2, _ = knn_bigcloud(px, k_geof)
    px_dev = jnp.asarray(px)
    geof = compute_geof_rows(px_dev, px_dev, bi)
    f = np.asarray(_assemble_features_device_nocolor(geof))
    idx = np.asarray(bi[:, :k_adj])
    d2 = np.asarray(bd2[:, :k_adj])
    print(f"built scene+graph in {time.perf_counter()-t0:.1f}s", flush=True)
    data = dict(px=px, f=f, idx=idx, d2=d2, hist=hist, obj=obj)
    np.savez(path, **data)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--voxel", type=float, default=0.04)
    ap.add_argument("--reg", type=float, default=0.03)
    ap.add_argument("--k_geof", type=int, default=45)
    ap.add_argument("--k_adj", type=int, default=10)
    ap.add_argument("--legs", default="exact_matched,chunked,chunked_strong")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    data = build_or_load(args.n, args.voxel, args.k_geof, args.k_adj)
    px, f, idx, d2 = data["px"], data["f"], data["idx"], data["d2"]
    hist, obj = data["hist"], data["obj"]
    n, k_adj = idx.shape

    src = np.repeat(np.arange(n, dtype=np.int64), k_adj)
    tgt = idx.reshape(-1).astype(np.int64)
    d = np.sqrt(np.maximum(d2, 0.0)).reshape(-1)
    w = (1.0 / (1.0 + d / max(d.mean(), 1e-12))).astype(np.float32)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "atscale_knobs_results.json",
    )
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as fj:
            results = json.load(fj)
    results.update(n_raw=args.n, n_voxels=int(n), reg=args.reg)

    def record(name, ic, secs, extra=None):
        r = evaluate_partition(ic, hist, obj, src, tgt, f, w, args.reg)
        r["seconds"] = round(secs, 1)
        r.update(sp_size_hist(ic))
        r["connectivity"] = connectivity_audit(ic, src, tgt)
        if extra:
            r.update(extra)
        results[name] = r
        print(name, r, flush=True)
        with open(out_path, "w") as fj:
            json.dump(results, fj, indent=1)

    legs = set(args.legs.split(","))

    if "exact" in legs or "exact_matched" in legs:
        from superpoint_graph_tpu import native
    if "exact" in legs:
        t0 = time.perf_counter()
        _, ic = native.cutpursuit(f, src, tgt, w, args.reg)
        record("exact", ic, time.perf_counter() - t0)
    if "exact_matched" in legs:
        t0 = time.perf_counter()
        _, ic = native.cutpursuit(
            f, src, tgt, w, args.reg, max_iter=8, flow_steps=2
        )
        record("exact_matched", ic, time.perf_counter() - t0)

    if legs & {"chunked", "chunked_strong", "mono", "mono_strong"}:
        import jax.numpy as jnp

        f_dev = jnp.asarray(f)
        idx_dev = jnp.asarray(idx)
        d2_dev = jnp.asarray(d2)
        px_dev = jnp.asarray(px)

    def run_chunked(name, **kw):
        from superpoint_graph_tpu.pipeline_big import (
            LAST_CP_STATS, chunked_cutpursuit_device,
        )

        t0 = time.perf_counter()
        _, ic = chunked_cutpursuit_device(
            f_dev, idx_dev, d2_dev, px, args.reg, xyz_dev=px_dev, **kw
        )
        record(name, ic, time.perf_counter() - t0,
               {"solve_iters": LAST_CP_STATS.get("solve_iters")})

    if "chunked" in legs:
        run_chunked("chunked")
    if "chunked_strong" in legs:
        run_chunked(
            "chunked_strong", max_iter=16, flow_steps=3, icm_sweeps=5,
            power_iters=12,
        )
    if "chunked_region" in legs:
        run_chunked("chunked_region", accept="region")
    if "chunked_region16" in legs:
        run_chunked("chunked_region16", accept="region", max_iter=16)
    # stop_tol A/B (r5): default now region+max_iter16+stop_tol=1e-4;
    # tol0 reproduces the r4 "any region accepted" continuation exactly
    if "chunked_tol0" in legs:
        run_chunked("chunked_tol0", stop_tol=0.0)
    if "chunked_tol3" in legs:
        run_chunked("chunked_tol3", stop_tol=1e-3)
    if "chunked_tol3e3" in legs:
        run_chunked("chunked_tol3e3", stop_tol=3e-3)
    if "chunked_halo16" in legs:
        # halve the halo (chunk_pad/16): stride grows ~17%, one chunk fewer
        # at 2e6 — boundary quality must hold through the heal + relabel
        run_chunked("chunked_halo16", halo_points=1 << 15)

    def run_mono(name, **kw):
        from superpoint_graph_tpu.ops.cutpursuit import merge_regions
        from superpoint_graph_tpu.ops.cutpursuit_band import (
            B, LAST_SOLVE_STATS, cutpursuit_band_device,
        )

        n_pad = -(-n // B) * B
        fp = jnp.zeros((n_pad, f.shape[1]), f_dev.dtype).at[:n].set(f_dev)
        ip = jnp.zeros((n_pad, k_adj), idx_dev.dtype).at[:n].set(idx_dev)
        dp = jnp.zeros((n_pad, k_adj), d2_dev.dtype).at[:n].set(d2_dev)
        t0 = time.perf_counter()
        ic = cutpursuit_band_device(fp, ip, dp, px, n, args.reg, **kw)
        ic = merge_regions(
            f, np.ones(n), ic, src, tgt, w, float(args.reg)
        ).astype(np.int32)
        record(name, ic, time.perf_counter() - t0,
               {"solve_iters": [LAST_SOLVE_STATS.get("iters")]})

    if "mono" in legs:
        run_mono("mono")
    if "mono_strong" in legs:
        run_mono(
            "mono_strong", max_iter=16, flow_steps=3, icm_sweeps=5,
            power_iters=12,
        )
    if "mono_region" in legs:
        run_mono("mono_region", accept="region")
    if "mono_region16" in legs:
        run_mono("mono_region16", accept="region", max_iter=16)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

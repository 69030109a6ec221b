"""A/B the block-banded cut-pursuit geometry (B, PAD) on the real TPU.

The band solver's window width is a pure bandwidth-vs-overflow trade: the
Morton edge-offset histogram (tools/band_locality_results.json) says 84% of
adjacency edges land within +-128 positions and 87% within +-256, so a
narrow guard (PAD) should stream far fewer band bytes per sweep at a small
increase in exact-overflow-edge work. This tool measures the trade on the
full solve: for each (B, PAD) it runs `cutpursuit_band_device` end-to-end
at the same cloud and records warm best-of-N time, overflow fraction, and
the host-oracle energy (ops.cutpursuit._energy over the full kNN edge
list — the one metric comparable ACROSS geometries).

Geometry is baked into ops/cutpursuit_band at import (SPGT_BAND_B /
SPGT_BAND_PAD), so each variant runs in its own subprocess.

Usage (real TPU): python tools/band_geometry_ab.py [--n 500000]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GEOMETRIES = [
    (1024, 1024),  # round-3 square geometry (B=1024, HALO=1, WIN=3072)
    (512, 512),
    (512, 256),    # round-4 default
    (512, 128),
    (1024, 256),
]


def worker(args):
    from bigcloud_knn import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from superpoint_graph_tpu.data.synthetic import big_scene
    from superpoint_graph_tpu.ops import cutpursuit_band as cpb
    from superpoint_graph_tpu.ops.cutpursuit import _energy
    from superpoint_graph_tpu.ops.geof import compute_geof_rows
    from superpoint_graph_tpu.ops.knn import knn_bigcloud
    from superpoint_graph_tpu.pipeline import _assemble_features_device

    xyz = big_scene(args.n)
    n = len(xyz)
    bi, bd2, _ = knn_bigcloud(xyz, args.k_geof)
    idx_adj = bi[:, : args.k_adj]
    d2_adj = bd2[:, : args.k_adj]
    xyz_dev = jnp.asarray(xyz)
    geof_dev = compute_geof_rows(xyz_dev, xyz_dev, bi)
    rgb = jnp.asarray(np.full((n, 3), 127, np.uint8))
    f_dev = _assemble_features_device(geof_dev, rgb)
    float(jnp.sum(f_dev[:4, 0]))

    B = cpb.B
    nb = -(-n // B)
    nb_pad = 1 << int(np.ceil(np.log2(max(nb, 2))))
    n_pad = nb_pad * B
    f_dev = jnp.pad(f_dev, ((0, n_pad - n), (0, 0)))
    idx_adj = jnp.pad(idx_adj, ((0, n_pad - n), (0, 0)))
    d2_adj = jnp.pad(d2_adj, ((0, n_pad - n), (0, 0)))

    t0 = time.perf_counter()
    comp = cpb.cutpursuit_band_device(
        f_dev, idx_adj, d2_adj, xyz, n, args.reg
    )
    t_cold = time.perf_counter() - t0
    best = float("inf")
    for _ in range(args.best_of):
        t0 = time.perf_counter()
        comp = cpb.cutpursuit_band_device(
            f_dev, idx_adj, d2_adj, xyz, n, args.reg
        )
        best = min(best, time.perf_counter() - t0)

    # host-oracle energy over the full (symmetrized, deduped-by-direction)
    # kNN edge list — identical edge set for every geometry
    f_h = np.asarray(f_dev[:n], np.float32)
    idx_h = np.asarray(idx_adj[:n], np.int64)
    d_h = np.sqrt(np.maximum(np.asarray(d2_adj[:n], np.float64), 0.0))
    src = np.repeat(np.arange(n, dtype=np.int64), args.k_adj)
    tgt = idx_h.reshape(-1)
    d0 = d_h.reshape(-1)
    w = (1.0 / (1.0 + d0 / max(d0.mean(), 1e-12))).astype(np.float32)
    nw = np.ones(n, np.float32)
    energy, _ = _energy(f_h, nw, comp, src, tgt, w, args.reg)

    # overflow fraction at this geometry
    perm = cpb.morton_order(xyz)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ps, pt = inv[src], inv[tgt]
    cs = pt - (ps // cpb.B) * cpb.B + cpb.PAD
    ct = ps - (pt // cpb.B) * cpb.B + cpb.PAD
    inband = (cs >= 0) & (cs < cpb.WIN) & (ct >= 0) & (ct < cpb.WIN)
    st = dict(cpb.LAST_SOLVE_STATS)
    print("RESULT " + json.dumps({
        "B": cpb.B, "PAD": cpb.PAD, "WIN": cpb.WIN,
        "n": n, "n_pad": int(n_pad),
        "warm_sec": round(best, 3), "cold_sec": round(t_cold, 1),
        "energy": round(float(energy), 2),
        "ncomp": int(comp.max()) + 1,
        "of_frac": round(float(1.0 - inband.mean()), 4),
        "outer_iters": st.get("iters"), "cc_rounds": st.get("cc_rounds"),
        "band_gb": round(n_pad * cpb.WIN * 2 / 2**30, 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--k_geof", type=int, default=45)
    ap.add_argument("--k_adj", type=int, default=10)
    ap.add_argument("--reg", type=float, default=0.1)
    ap.add_argument("--best_of", type=int, default=3)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.worker:
        worker(args)
        return

    results = {"n": args.n, "variants": []}
    for b, pad in GEOMETRIES:
        env = dict(os.environ, SPGT_BAND_B=str(b), SPGT_BAND_PAD=str(pad))
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--n", str(args.n), "--k_geof", str(args.k_geof),
            "--k_adj", str(args.k_adj), "--reg", str(args.reg),
            "--best_of", str(args.best_of),
        ]
        print(f"=== B={b} PAD={pad}", flush=True)
        p = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=3600
        )
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[len("RESULT "):])
        if rec is None:
            rec = {"B": b, "PAD": pad, "error": p.stderr[-2000:]}
        print(json.dumps(rec), flush=True)
        results["variants"].append(rec)

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "band_geometry_ab_results.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

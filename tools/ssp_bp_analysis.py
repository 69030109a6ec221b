"""Why is SSP boundary precision ~31 while BR climbs? (VERDICT r4 weak-#5)

BP here is the reference's formula exactly (supervized_partition/
losses.py:175-186, mirrored in learn/metrics.py:74-79): the fraction of
PREDICTED transition edges that lie within BR_tolerance=1 hops of a GT
transition. Three hypotheses for the flat ~31: (a) a metric floor at this
synthetic density, (b) the over-segmentation operating point (n_clusters
~600 vs ~25 GT objects at reg 0.03 — every extra cluster boundary is a
false-positive edge), (c) a loss defect. This tool separates them:

  1. GT-oracle sanity: the GT partition (connected components of the
     non-transition subgraph) must score BP ~= 100.
  2. Operating-point sweep: reg_strength in {0.03, 0.1, 0.3, 1.0}, same
     seed/epochs/backend. If BP tracks n_clusters toward the GT object
     count, ~31 is the reg-0.03 operating point, not a defect.
  3. Trained-vs-untrained at each reg: does training buy BR without
     paying BP at a FIXED operating point?

CPU-forced (cp_backend=exact partitions on the host; the embedding model
is tiny) so it can run while the chip is busy.

Writes tools/ssp_bp_analysis_results.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ssp_quality_smoke import build_tree  # noqa: E402


def gt_oracle_check(sample):
    """BP/BR of the GT partition itself (CCs of the non-transition
    subgraph) — the metric must give ~100/100."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components as scc

    from superpoint_graph_tpu.learn import metrics
    from superpoint_graph_tpu.ssp.evaluate import relax_edge_binary

    es = np.asarray(sample["edg_source"])
    et = np.asarray(sample["edg_target"])
    is_tr = np.asarray(sample["is_transition"]).astype(bool)
    n = int(max(es.max(), et.max())) + 1
    keep = ~is_tr
    g = sp.coo_matrix(
        (np.ones(int(keep.sum()), np.int8), (es[keep], et[keep])),
        shape=(n, n),
    )
    _, lab = scc(g, directed=False)
    pred_tr = lab[es] != lab[et]
    return {
        "br": round(float(metrics.compute_boundary_recall(
            is_tr, relax_edge_binary(pred_tr, es, et, n, 1))), 2),
        "bp": round(float(metrics.compute_boundary_precision(
            relax_edge_binary(is_tr, es, et, n, 1), pred_tr)), 2),
        "n_clusters": int(lab.max()) + 1,
        "n_gt_transition_edges": int(is_tr.sum()),
        "n_edges": int(len(es)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--regs", default="0.03,0.1,0.3,1.0")
    ap.add_argument("--cp_backend", default="exact")
    ap.add_argument("--cp_cutoff", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp

    from superpoint_graph_tpu.ssp.embed import SspModelConfig, SspTrainer
    from superpoint_graph_tpu.ssp.evaluate import evaluate_cloud
    from superpoint_graph_tpu.ssp.graph_processing import (
        SspLoaderConfig, graph_collate, graph_loader,
    )
    from superpoint_graph_tpu.ssp.losses import SspLossConfig, compute_dist

    root = tempfile.mkdtemp(prefix="ssp_bp_")
    results = {"epochs": args.epochs, "cp_backend": args.cp_backend,
               "cp_cutoff": args.cp_cutoff}
    try:
        build_tree(root)
        import glob

        files = sorted(glob.glob(
            os.path.join(root, "features_supervision", "*", "*.h5")
        ))
        train_files, test_files = files[:-1], files[-1:]

        model_cfg = SspModelConfig(
            ptn_widths=((32, 32, 64), (64, 32, 4)),
            ptn_widths_stn=((16, 32), (32, 16)),
            ptn_nfeat_stn=2, use_rgb=True, ptn_norm="layer",
        )
        loader_cfg = SspLoaderConfig(
            k_nn_local=20, max_ver_train=10000, use_rgb=True
        )

        # 1. metric sanity on the GT partition
        probe = graph_collate([graph_loader(test_files[0], False, loader_cfg)])
        results["gt_oracle"] = gt_oracle_check(probe)
        print("gt_oracle", results["gt_oracle"], flush=True)

        def eval_quality(trainer, loss_cfg, state):
            asa, br, bp, nc = [], [], [], []
            for path in test_files:
                sample = graph_collate(
                    [graph_loader(path, False, loader_cfg)]
                )
                emb = np.asarray(trainer.embed(
                    state, sample["clouds"], sample["clouds_global"]
                ))
                diff = np.asarray(compute_dist(
                    jnp.asarray(emb),
                    jnp.asarray(sample["edg_source"], jnp.int32),
                    jnp.asarray(sample["edg_target"], jnp.int32),
                    loss_cfg.dist_type,
                ))
                out = evaluate_cloud(loss_cfg, emb, diff, sample, 13)
                asa.append(out.get("asa", np.nan))
                br.append(out.get("br", np.nan))
                bp.append(out.get("bp", np.nan))
                nc.append(out["n_clusters"])
            return {
                "asa": round(float(np.nanmean(asa)), 2),
                "br": round(float(np.nanmean(br)), 2),
                "bp": round(float(np.nanmean(bp)), 2),
                "n_clusters": float(np.mean(nc)),
            }

        # 2+3. operating-point sweep, untrained AND trained per reg
        sweep = []
        for reg in [float(r) for r in args.regs.split(",")]:
            t0 = time.time()
            loss_cfg = SspLossConfig(
                reg_strength=reg, k_nn_adj=5,
                CP_cutoff=args.cp_cutoff, cp_backend=args.cp_backend,
            )
            trainer = SspTrainer(model_cfg, loss_cfg, lr=5e-3)
            rs = np.random.RandomState(0)
            probe_tr = graph_collate(
                [graph_loader(train_files[0], False, loader_cfg)]
            )
            state = trainer.init(
                jax.random.PRNGKey(0), jnp.asarray(probe_tr["clouds"]),
                jnp.asarray(probe_tr["clouds_global"]),
            )
            row = {"reg_strength": reg,
                   "untrained": eval_quality(trainer, loss_cfg, state)}
            for _ in range(args.epochs):
                for j in rs.permutation(len(train_files)):
                    batch = graph_collate(
                        [graph_loader(train_files[j], True, loader_cfg, rs)]
                    )
                    state, loss, _, _ = trainer.train_step(state, batch)
            row["trained"] = eval_quality(trainer, loss_cfg, state)
            row["seconds"] = round(time.time() - t0, 1)
            sweep.append(row)
            print(json.dumps(row), flush=True)
        results["sweep"] = sweep

        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ssp_bp_analysis_results.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", out)
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""End-to-end quality smoke on synthetic rooms (real device).

Builds a synthetic S3DIS-layout dataset (3 areas x 2 rooms), runs the full
chain — partition CLI -> parsed caches -> training CLI -> final multisample
eval — and prints the resulting scores. Evidence that the whole framework
learns end-to-end on-device; numbers land in tools/quality_smoke_results.json.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--spg_adjacency", default="knn",
                    help="'knn' (giant-path superedge support) or 'delaunay' "
                         "(the reference's graphs.py:75-118 support) — the "
                         "SURVEY §7.3-3 mIoU-impact A/B")
    ap.add_argument("--out", default="quality_smoke_results.json")
    args = ap.parse_args()

    from test_cli import write_s3dis_room

    from superpoint_graph_tpu.cli import partition as cli_partition
    from superpoint_graph_tpu.cli import train as cli_train
    from superpoint_graph_tpu.data.parsed import preprocess_pointclouds

    root = tempfile.mkdtemp(prefix="spgt_quality_")
    rng = np.random.RandomState(5)
    for area in ("Area_1", "Area_2", "Area_3"):
        for r in range(2):
            write_s3dis_room(root, area, f"room_{r}", rng, n_points=8000)

    cli_partition.main([
        "--ROOT_PATH", root, "--dataset", "s3dis",
        "--voxel_width", "0.05", "--reg_strength", "0.05",
        "--k_nn_geof", "30", "--k_nn_adj", "8",
        "--spg_adjacency", args.spg_adjacency, "--cp_backend", "tpu",
    ])
    preprocess_pointclouds(root, "s3dis", 13)

    odir = os.path.join(root, "results")
    cli_train.main([
        "--dataset", "s3dis", "--S3DIS_PATH", root, "--cvfold", "3",
        "--odir", odir, "--epochs", "60", "--lr", "5e-3",
        "--lr_steps", "[40,50]",
        "--model_config", "gru_5_0,f_13",
        "--ptn_widths", "[[32,64,128],[128,32]]",
        "--ptn_widths_stn", "[[16,32],[32,16]]",
        "--fnet_widths", "[32,64]",
        "--ptn_minpts", "10", "--ptn_npts", "64",
        "--spg_augm_nneigh", "50", "--spg_augm_hardcutoff", "256",
        "--test_multisamp_n", "5", "--loss_weights", "sqrt",
        "--test_nth_epoch", "10",
    ])
    scores = json.load(open(os.path.join(odir, "scores_test.json")))
    log = json.load(open(os.path.join(odir, "trainlog.json")))
    import jax

    out = {
        "final_test_oacc": scores["oacc"],
        "final_test_miou": scores["avg_iou"],
        "first_epoch_train_acc": log[0]["acc"],
        "last_epoch_train_acc": log[-1]["acc"],
        "backend": jax.devices()[0].platform,
        "spg_adjacency": args.spg_adjacency,
        "root": root,
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(__file__), args.out), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

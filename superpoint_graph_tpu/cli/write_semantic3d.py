"""Semantic3D submission exporter: upsample superpoint predictions to the raw
clouds and write .labels files.

CLI parity with reference partition/write_Semantic3d.py:16-75.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="write Semantic3D .labels submissions")
    p.add_argument("--SEMA3D_PATH", default="datasets/semantic3d")
    p.add_argument("--odir", default="results/sema3d")
    p.add_argument("--db_test_name", default="testred",
                   choices=["testred", "testfull"])
    p.add_argument("--ver_batch", default=5000000, type=int)
    return p.parse_args(argv)


def main(argv=None):
    import h5py

    from ..data.provider import interpolate_labels_batch, reduced_labels2full
    from ..utils.h5io import read_spg

    args = parse_args(argv)
    root = args.SEMA3D_PATH.rstrip("/")
    sub = {"testred": "test_reduced", "testfull": "test_full"}[args.db_test_name]
    pred_file = os.path.join(args.odir, f"predictions_{args.db_test_name}.h5")
    out_dir = os.path.join(args.odir, "submission")
    os.makedirs(out_dir, exist_ok=True)

    with h5py.File(pred_file, "r") as f:
        preds = {k: f[k][:] for k in f.keys()}

    raw_files = sorted(glob.glob(os.path.join(root, "data", sub, "*.txt")))
    for raw in raw_files:
        name = os.path.splitext(os.path.basename(raw))[0]
        key = f"{sub}__{name}"
        if key not in preds and f"{sub}/{name}" in preds:
            key = f"{sub}/{name}"
        if key not in preds:
            print(f"{name}: no prediction, skipping")
            continue
        spg_file = os.path.join(root, "superpoint_graphs", sub, name + ".h5")
        fea_file = os.path.join(root, "features", sub, name + ".h5")
        _, components, _ = read_spg(spg_file)
        with h5py.File(fea_file, "r") as f:
            xyz = f["xyz"][:]
        # superpoint -> pruned points -> full raw cloud (chunked 1-NN)
        pruned_labels = reduced_labels2full(
            preds[key].astype(np.uint8) + 1, components, len(xyz)
        )
        full = interpolate_labels_batch(raw, xyz, pruned_labels, args.ver_batch)
        out = os.path.join(out_dir, name + ".labels")
        np.savetxt(out, full.astype(np.int64), fmt="%d")
        print(f"{name}: wrote {out}")


if __name__ == "__main__":
    main()

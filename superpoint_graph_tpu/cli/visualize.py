"""Visualization CLI: export ply files per --output_type letters.

CLI parity with reference partition/visualize.py:15-123 —
i = input rgb cloud, g = ground truth, f = geometric features, p = partition,
r = prediction, e = errors, s = SPG; optional --upsample to the raw cloud.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ply visualization export")
    p.add_argument("--dataset", default="s3dis")
    p.add_argument("--ROOT_PATH", default="datasets/s3dis")
    p.add_argument("--res_file", default="results/predictions_test")
    p.add_argument("--supervized_partition", type=int, default=0)
    p.add_argument("--file_path", default="Area_1/conferenceRoom_1")
    p.add_argument("--upsample", default=0, type=int)
    p.add_argument("--ver_batch", default=0, type=int)
    p.add_argument("--output_type", default="igfpres")
    return p.parse_args(argv)


def main(argv=None):
    import h5py

    from ..data import provider
    from ..utils.h5io import read_features, read_spg

    args = parse_args(argv)
    root = args.ROOT_PATH.rstrip("/") + "/"
    n_labels = {"s3dis": 13, "sema3d": 8, "vkitti": 13}.get(args.dataset, 10)
    folder, file_name = os.path.split(args.file_path)
    folder += "/"

    fea_file = root + "features/" + folder + file_name + ".h5"
    if not os.path.isfile(fea_file) or args.supervized_partition:
        fea_file = root + "features_supervision/" + folder + file_name + ".h5"
    spg_file = root + "superpoint_graphs/" + folder + file_name + ".h5"
    ply_folder = root + "clouds/" + folder
    ply_file = ply_folder + file_name
    os.makedirs(ply_folder, exist_ok=True)
    if not os.path.isfile(fea_file):
        raise SystemExit(f"{fea_file} does not exist and is needed")
    geof, xyz, rgb, graph_nn, labels = read_features(fea_file)

    ot = args.output_type
    need_spg = ("p" in ot) or ("r" in ot) or ("s" in ot) or ("e" in ot)
    if need_spg:
        if not os.path.isfile(spg_file):
            raise SystemExit(f"{spg_file} needed for partition/result output")
        graph_spg, components, in_component = read_spg(spg_file)

    pred_red = pred_full = None
    if "r" in ot or "e" in ot:
        res_file = args.res_file + ".h5"
        if not os.path.isfile(res_file):
            raise SystemExit(f"{res_file} needed for result output")
        with h5py.File(res_file, "r") as f:
            key = (folder + file_name).replace("/", "__")
            if key not in f and folder + file_name in f:
                key = folder + file_name
            pred_red = np.array(f[key])
        pred_full = provider.reduced_labels2full(pred_red, components, len(xyz))

    if "i" in ot:
        provider._write_ply_xyzrgb(ply_file + "_rgb.ply", xyz, rgb)
        print("writing the RGB file...")
    if "g" in ot and np.size(labels):
        lab = labels.argmax(1) if np.ndim(labels) > 1 else labels
        provider.prediction2ply(ply_file + "_GT.ply", xyz, lab, n_labels, args.dataset)
        print("writing the GT file...")
    if "f" in ot:
        provider.geof2ply(ply_file + "_geof.ply", xyz, geof)
        print("writing the features file...")
    if "p" in ot:
        provider.partition2ply(ply_file + "_partition.ply", xyz, components)
        print("writing the partition file...")
    if "r" in ot and pred_full is not None:
        provider.prediction2ply(
            ply_file + "_pred.ply", xyz, pred_full + 1, n_labels, args.dataset
        )
        print("writing the prediction file...")
    if "e" in ot and pred_full is not None and np.size(labels):
        provider.error2ply(ply_file + "_err.ply", xyz, rgb, labels, pred_full + 1)
        print("writing the error file...")
    if "s" in ot:
        provider.spg2ply(ply_file + "_spg.ply", graph_spg)
        print("writing the SPG file...")


if __name__ == "__main__":
    main()

"""Geometric partition CLI.

CLI parity with reference partition/partition.py:20-31 (flags/defaults) and
its per-file pipeline (113-189): read raw -> prune -> kNN -> geof ->
cut pursuit -> SPG, cached as features/ and superpoint_graphs/ h5 with
skip-if-exists idempotency and the 3-bucket timing report.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native large-scale point cloud segmentation "
                    "— geometric partition"
    )
    parser.add_argument("--ROOT_PATH", default="datasets/s3dis")
    parser.add_argument("--dataset", default="s3dis",
                        help="s3dis|sema3d|vkitti|custom_dataset")
    parser.add_argument("--k_nn_geof", default=45, type=int)
    parser.add_argument("--k_nn_adj", default=10, type=int)
    parser.add_argument("--lambda_edge_weight", default=1.0, type=float)
    parser.add_argument("--reg_strength", default=0.03, type=float)
    parser.add_argument("--d_se_max", default=0, type=float)
    parser.add_argument("--voxel_width", default=0.03, type=float)
    parser.add_argument("--ver_batch", default=0, type=int)
    parser.add_argument("--overwrite", default=0, type=int)
    parser.add_argument("--cp_backend", default="tpu", choices=["tpu", "exact"])
    parser.add_argument("--n_labels", default=0, type=int,
                        help="class count for custom_dataset (the reference's "
                             "custom_dataset template variable); 0 = infer "
                             "from the data when labels are present")
    parser.add_argument("--spg_adjacency", default="delaunay",
                        choices=["delaunay", "knn"])
    return parser.parse_args(argv)


def find_folders(root: str, dataset: str):
    data_root = os.path.join(root, "data")
    if dataset in ("s3dis", "sema3d", "custom_dataset", "vkitti"):
        return sorted(
            os.path.basename(f)
            for f in glob.glob(os.path.join(data_root, "*"))
            if os.path.isdir(f)
        )
    raise ValueError(f"unknown dataset {dataset!r}")


def files_in_folder(root, folder, dataset):
    data = os.path.join(root, "data", folder)
    if dataset == "s3dis":
        return sorted(glob.glob(os.path.join(data, "*/*.txt")))
    if dataset == "sema3d":
        return sorted(glob.glob(os.path.join(data, "*.txt")))
    if dataset == "vkitti":
        return sorted(glob.glob(os.path.join(data, "*.npy")))
    return sorted(
        glob.glob(os.path.join(data, "*.ply"))
        + glob.glob(os.path.join(data, "*.las"))
        + glob.glob(os.path.join(data, "*.pcd"))
    )


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    from ..data import provider
    from ..pipeline import PartitionConfig, partition_cloud
    from ..utils.h5io import read_features, read_spg, write_features, write_spg

    args = parse_args(argv)
    root = args.ROOT_PATH.rstrip("/")
    n_labels = {"s3dis": 13, "sema3d": 8, "vkitti": 13}.get(
        args.dataset, args.n_labels
    )
    cfg = PartitionConfig(
        k_nn_geof=args.k_nn_geof,
        k_nn_adj=args.k_nn_adj,
        lambda_edge_weight=args.lambda_edge_weight,
        reg_strength=args.reg_strength,
        d_se_max=args.d_se_max,
        voxel_width=args.voxel_width,
        dataset=args.dataset,
        cp_backend=args.cp_backend,
        spg_adjacency=args.spg_adjacency,
    )

    folders = find_folders(root, args.dataset)
    times = {"features": 0.0, "partition": 0.0, "spg": 0.0}
    for folder in folders:
        files = files_in_folder(root, folder, args.dataset)
        fea_dir = os.path.join(root, "features", folder)
        spg_dir = os.path.join(root, "superpoint_graphs", folder)
        os.makedirs(fea_dir, exist_ok=True)
        os.makedirs(spg_dir, exist_ok=True)
        for i_file, data_file in enumerate(files):
            if args.dataset == "s3dis":
                name = os.path.basename(os.path.dirname(data_file))
            else:
                name = os.path.splitext(os.path.basename(data_file))[0]
            fea_file = os.path.join(fea_dir, name + ".h5")
            spg_file = os.path.join(spg_dir, name + ".h5")
            print(f"{i_file + 1} / {len(files)} ---> {folder}/{name}")
            if (os.path.isfile(fea_file) and os.path.isfile(spg_file)
                    and not args.overwrite):
                print("    already computed, skipping (use --overwrite 1)")
                continue

            if args.dataset == "s3dis":
                xyz, rgb, labels, objects = provider.read_s3dis_format(data_file)
            elif args.dataset == "sema3d":
                label_file = data_file[:-4] + ".labels"
                if os.path.isfile(label_file):
                    xyz, rgb, labels = provider.read_semantic3d_format(
                        data_file, n_labels, label_file, args.voxel_width,
                        args.ver_batch,
                    )
                else:
                    xyz, rgb = provider.read_semantic3d_format(
                        data_file, 0, "", args.voxel_width, args.ver_batch
                    )
                    labels = None
                objects = None
            elif args.dataset == "vkitti":
                xyz, rgb, labels = provider.read_vkitti_format(data_file)
                objects = None
            elif data_file.endswith(".pcd"):
                xyz, labels = provider.read_pcd(data_file)
                if labels.size == 0:
                    labels = None
                elif n_labels == 0:
                    n_labels = int(labels.max())
                rgb = np.zeros((len(xyz), 3), np.uint8)
                objects = None
            elif data_file.endswith(".las"):
                xyz = provider.read_las(data_file)
                rgb = np.zeros((len(xyz), 3), np.uint8)
                labels = objects = None
            else:
                xyz, rgb, labels = provider.read_ply(data_file)
                if labels is not None and np.size(labels) == 0:
                    labels = None
                elif labels is not None and n_labels == 0:
                    n_labels = int(np.max(labels))
                objects = None

            # sema3d is pruned inside the chunked reader; skip double pruning
            cfg_i = cfg
            if args.dataset == "sema3d":
                import dataclasses

                cfg_i = dataclasses.replace(cfg, voxel_width=0.0)
            res = partition_cloud(
                xyz, rgb,
                None if labels is None else np.asarray(labels),
                None if objects is None else np.asarray(objects),
                n_labels=n_labels, cfg=cfg_i,
            )
            for k in times:
                times[k] += res.times[k]
            write_features(fea_file, res.geof, res.xyz, res.rgb, res.graph_nn,
                           res.labels)
            write_spg(spg_file, res.graph_sp, res.components, res.in_component)
            print("Timer : %5.1f / %5.1f / %5.1f" % (
                times["features"], times["partition"], times["spg"]))


if __name__ == "__main__":
    main()

"""SSP preprocessing CLI: build features_supervision/ caches.

CLI parity with reference supervized_partition/graph_processing.py:34-46
(flags) and its per-file pipeline (110-193).
"""
from __future__ import annotations

import argparse
import glob
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SSP graph preprocessing")
    p.add_argument("--ROOT_PATH", default="datasets/s3dis")
    p.add_argument("--dataset", default="s3dis", help="s3dis|sema3d|vkitti")
    p.add_argument("--k_nn_local", default=20, type=int)
    p.add_argument("--k_nn_adj", default=5, type=int)
    p.add_argument("--voxel_width", default=0.03, type=float)
    p.add_argument("--plane_model", default=1, type=int)
    p.add_argument("--use_voronoi", default=0.0, type=float)
    p.add_argument("--ver_batch", default=5000000, type=int)
    p.add_argument("--overwrite", default=0, type=int)
    p.add_argument("--compute_geof", default=1, type=int)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    from ..data import provider
    from ..ssp.graph_processing import (
        SspPreprocessConfig,
        build_supervision_structure,
        write_structure,
    )
    from .partition import files_in_folder, find_folders

    args = parse_args(argv)
    root = args.ROOT_PATH.rstrip("/")
    n_labels = {"s3dis": 13, "sema3d": 8, "vkitti": 13}[args.dataset]
    cfg = SspPreprocessConfig(
        k_nn_adj=args.k_nn_adj,
        k_nn_local=args.k_nn_local,
        voxel_width=args.voxel_width,
        compute_geof=bool(args.compute_geof),
        plane_model=bool(args.plane_model),
        use_voronoi=float(args.use_voronoi),
        dataset=args.dataset,
    )
    for folder in find_folders(root, args.dataset):
        out_dir = os.path.join(root, "features_supervision", folder)
        os.makedirs(out_dir, exist_ok=True)
        files = files_in_folder(root, folder, args.dataset)
        for i, data_file in enumerate(files):
            if args.dataset == "s3dis":
                name = os.path.basename(os.path.dirname(data_file))
            else:
                name = os.path.splitext(os.path.basename(data_file))[0]
            str_file = os.path.join(out_dir, name + ".h5")
            print(f"{i + 1} / {len(files)} ---> {folder}/{name}")
            if os.path.isfile(str_file) and not args.overwrite:
                print("    already computed, skipping")
                continue
            objects = None
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
                    labels = np.zeros(len(xyz), np.int32)
            else:
                xyz, rgb, labels = provider.read_vkitti_format(data_file)
            cfg_i = cfg
            if args.dataset == "sema3d":
                # sema3d clouds are pruned inside the chunked reader (labels
                # arrive as per-voxel histograms) — skip the second prune
                import dataclasses

                cfg_i = dataclasses.replace(cfg, voxel_width=0.0)
            s = build_supervision_structure(
                np.asarray(xyz, np.float32), np.asarray(rgb),
                np.asarray(labels, np.int32),
                None if objects is None else np.asarray(objects, np.int32),
                cfg_i, n_labels,
            )
            write_structure(str_file, s)


if __name__ == "__main__":
    main()

"""Partition-inference CLI: load a trained SSP embedder and produce
superpoint_graphs/ for a folder of preprocessed clouds.

CLI parity with reference supervized_partition/generate_partition.py:23-140;
the per-cloud map is embarrassingly parallel (the reference uses a
multiprocessing.Pool; device work here is already batched per cloud).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="generate partitions with a trained SSP model")
    p.add_argument("--ROOT_PATH", default="datasets/s3dis")
    p.add_argument("--dataset", default="s3dis")
    p.add_argument("--model_path", default="results_partition/cv1/model.ckpt")
    p.add_argument("--folder", default="", help="restrict to one subfolder")
    p.add_argument("--overwrite", default=0, type=int)
    p.add_argument("--cp_backend", default="tpu", choices=["exact", "tpu"])
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ..graph.spg import compute_sp_graph
    from ..learn.checkpoint import load_checkpoint, read_checkpoint_args
    from ..ssp.embed import SspModelConfig, SspTrainer
    from ..ssp.graph_processing import SspLoaderConfig, graph_collate, graph_loader
    from ..ssp.losses import SspLossConfig, compute_dist, compute_partition
    from ..utils.h5io import write_spg

    args = parse_args(argv)
    root = args.ROOT_PATH.rstrip("/")
    n_classes = {"s3dis": 13, "sema3d": 8, "vkitti": 13}[args.dataset]

    # model args come from the checkpoint (generate_partition.py:88:
    # architecture can't drift)
    ck = read_checkpoint_args(args.model_path)
    model_cfg = SspModelConfig(
        ptn_widths=tuple(map(tuple, ck["ptn_widths"])),
        ptn_widths_stn=tuple(map(tuple, ck["ptn_widths_stn"])),
        ptn_nfeat_stn=ck["ptn_nfeat_stn"],
        use_rgb=bool(ck["use_rgb"]),
        global_feat=ck["global_feat"],
        stn_as_global=bool(ck["stn_as_global"]),
        ptn_norm=ck["ptn_norm"],
    )
    loss_cfg = SspLossConfig(
        loss=ck["loss"], dist_type=ck["dist_type"], loss_weight=ck["loss_weight"],
        edge_weight_threshold=ck["edge_weight_threshold"],
        spatial_emb=ck["spatial_emb"], reg_strength=ck["reg_strength"],
        k_nn_adj=ck["k_nn_adj"], CP_cutoff=ck["CP_cutoff"],
        cp_backend=args.cp_backend,
    )
    loader_cfg = SspLoaderConfig(
        k_nn_local=ck["k_nn_local"], max_ver_train=0,
        use_rgb=bool(ck["use_rgb"]), global_feat=ck["global_feat"],
        ver_value=ck.get("ver_value", "ptn"),
    )
    trainer = SspTrainer(model_cfg, loss_cfg)

    base = os.path.join(root, "features_supervision")
    folders = [args.folder] if args.folder else sorted(os.listdir(base))
    state = None
    for folder in folders:
        in_dir = os.path.join(base, folder)
        if not os.path.isdir(in_dir):
            continue
        out_dir = os.path.join(root, "superpoint_graphs", folder)
        os.makedirs(out_dir, exist_ok=True)
        for fname in sorted(os.listdir(in_dir)):
            if not fname.endswith(".h5"):
                continue
            out_path = os.path.join(out_dir, fname)
            if os.path.isfile(out_path) and not args.overwrite:
                print(f"{folder}/{fname}: exists, skipping")
                continue
            sample = graph_collate(
                [graph_loader(os.path.join(in_dir, fname), False, loader_cfg)]
            )
            if state is None:
                template = trainer.init(
                    jax.random.PRNGKey(0), jnp.asarray(sample["clouds"]),
                    jnp.asarray(sample["clouds_global"]),
                )
                state, _, _, _ = load_checkpoint(args.model_path, template)
            emb = np.asarray(
                trainer.embed(state, sample["clouds"], sample["clouds_global"])
            )
            diff = np.asarray(
                compute_dist(
                    jnp.asarray(emb),
                    jnp.asarray(sample["edg_source"], jnp.int32),
                    jnp.asarray(sample["edg_target"], jnp.int32),
                    loss_cfg.dist_type,
                )
            )
            comps, in_comp = compute_partition(
                loss_cfg, emb, sample["edg_source"], sample["edg_target"],
                diff, sample["xyz"],
            )
            graph_sp = compute_sp_graph(
                sample["xyz"], 100.0, in_comp, comps, sample["labels"], n_classes
            )
            write_spg(out_path, graph_sp, comps, in_comp)
            print(f"{folder}/{fname}: {len(comps)} superpoints")


if __name__ == "__main__":
    main()

"""SSP embedding-training CLI.

CLI parity with reference supervized_partition/supervized_partition.py:57-135
(flags incl. the adaptive CP_cutoff rule, 132-133) and its embed() driver
(152-408): train the local embedder with the graph-structured loss and
in-loop cross-partition weighting, evaluate ASA/BR/BP per epoch, and finally
write superpoint_graphs/ + res.h5 for the downstream segmentation stage.
"""
from __future__ import annotations

import argparse
import ast
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SSP embedding training")
    p.add_argument("--ROOT_PATH", default="datasets/s3dis")
    p.add_argument("--dataset", default="s3dis")
    p.add_argument("--cvfold", default=1, type=int)
    p.add_argument("--odir", default="results_partition")
    p.add_argument("--resume", default="")
    p.add_argument("--epochs", default=50, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--lr", default=1e-2, type=float)
    p.add_argument("--lr_decay", default=0.7, type=float)
    p.add_argument("--lr_steps", default="[20,35]")
    p.add_argument("--grad_clip", default=1.0, type=float)
    p.add_argument("--nworkers", default=0, type=int)
    p.add_argument("--test_nth_epoch", default=10, type=int)
    # embeddings / model
    p.add_argument("--learned_embeddings", default=1, type=int)
    p.add_argument("--ptn_embedding", default="ptn")
    p.add_argument("--ver_value", default="ptn")
    p.add_argument("--ptn_widths", default="[[32,128], [34,32,32,4]]")
    p.add_argument("--ptn_widths_stn", default="[[16,64], [32,16]]")
    p.add_argument("--ptn_nfeat_stn", default=2, type=int)
    p.add_argument("--use_rgb", default=1, type=int)
    p.add_argument("--global_feat", default="eXYrgb")
    p.add_argument("--stn_as_global", default=1, type=int)
    p.add_argument("--ptn_norm", default="batch")
    p.add_argument("--ptn_prelast_do", default=0.0, type=float)
    # loss / partition
    p.add_argument("--loss", default="TVH_zhang")
    p.add_argument("--dist_type", default="euclidian")
    p.add_argument("--loss_weight", default="crosspartition")
    p.add_argument("--transition_factor", default=5.0, type=float)
    p.add_argument("--edge_weight_threshold", default=-0.5, type=float)
    p.add_argument("--spatial_emb", default=0.2, type=float)
    p.add_argument("--reg_strength", default=0.8, type=float)
    p.add_argument("--CP_cutoff", default=25, type=int)
    p.add_argument("--k_nn_adj", default=5, type=int)
    p.add_argument("--k_nn_local", default=20, type=int)
    p.add_argument("--max_ver_train", default=10000, type=int)
    p.add_argument("--BR_tolerance", default=1, type=int)
    p.add_argument("--spg_out", default=1, type=int)
    # band solver measured 3.9x faster than the host oracle at the in-loop
    # shape (tools/ssp_inloop_results.json) — default since round 2
    p.add_argument("--cp_backend", default="tpu", choices=["exact", "tpu"])
    p.add_argument("--pc_augm_rot", default=1, type=int)
    p.add_argument("--pc_augm_jitter", default=1, type=int)
    p.add_argument("--seed", default=1, type=int)
    args = p.parse_args(argv)
    args.ptn_widths = ast.literal_eval(args.ptn_widths)
    args.ptn_widths_stn = ast.literal_eval(args.ptn_widths_stn)
    args.lr_steps = ast.literal_eval(args.lr_steps)
    if args.CP_cutoff < 0:
        # adaptive cutoff rule (supervized_partition.py:132-133): negative
        # value means |cutoff| scaled down for small reg_strength
        args.CP_cutoff = max(
            -args.CP_cutoff // 2, int(-args.CP_cutoff * args.reg_strength)
        )
    return args


def supervision_files(root, dataset, cvfold):
    base = os.path.join(root, "features_supervision")
    folders = sorted(
        d for d in os.listdir(base) if os.path.isdir(os.path.join(base, d))
    )
    train, test = [], []
    for i, folder in enumerate(folders, start=1):
        files = sorted(
            os.path.join(base, folder, f)
            for f in os.listdir(os.path.join(base, folder))
            if f.endswith(".h5")
        )
        if dataset in ("s3dis", "vkitti") and i == cvfold:
            test.extend(files)
        elif dataset == "sema3d" and folder != "train":
            test.extend(files)
        else:
            train.extend(files)
    return train, test


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ..ssp.embed import SspModelConfig, SspTrainer
    from ..ssp.evaluate import FinalEvaluator, FolderHierarchy
    from ..ssp.graph_processing import SspLoaderConfig, graph_collate, graph_loader
    from ..ssp.losses import SspLossConfig, compute_dist

    args = parse_args(argv)
    root = args.ROOT_PATH.rstrip("/")
    n_classes = {"s3dis": 13, "sema3d": 8, "vkitti": 13}[args.dataset]
    hierarchy = FolderHierarchy(args.odir, args.dataset, root, args.cvfold)
    with open(os.path.join(hierarchy.outputdir, "cmdline.txt"), "w") as f:
        f.write(json.dumps(vars(args)))

    model_cfg = SspModelConfig(
        ptn_widths=tuple(map(tuple, args.ptn_widths)),
        ptn_widths_stn=tuple(map(tuple, args.ptn_widths_stn)),
        ptn_nfeat_stn=args.ptn_nfeat_stn,
        use_rgb=bool(args.use_rgb),
        global_feat=args.global_feat,
        stn_as_global=bool(args.stn_as_global),
        ptn_norm=args.ptn_norm,
        ptn_prelast_do=args.ptn_prelast_do,
    )
    loss_cfg = SspLossConfig(
        loss=args.loss,
        dist_type=args.dist_type,
        loss_weight=args.loss_weight,
        transition_factor=args.transition_factor,
        edge_weight_threshold=args.edge_weight_threshold,
        spatial_emb=args.spatial_emb,
        reg_strength=args.reg_strength,
        k_nn_adj=args.k_nn_adj,
        CP_cutoff=args.CP_cutoff,
        cp_backend=args.cp_backend,
    )
    loader_cfg = SspLoaderConfig(
        k_nn_local=args.k_nn_local,
        max_ver_train=args.max_ver_train,
        use_rgb=bool(args.use_rgb),
        global_feat=args.global_feat,
        pc_augm_rot=bool(args.pc_augm_rot),
        pc_augm_jitter=bool(args.pc_augm_jitter),
        ver_value=args.ver_value,
    )
    train_files, test_files = supervision_files(root, args.dataset, args.cvfold)
    if not train_files:
        raise SystemExit("no features_supervision files found; run ssp_preprocess")

    use_geof = (not args.learned_embeddings) or "geof" in args.ver_value
    if use_geof:
        # spatialEmbedder parity (reference graph_processing.py:548-560):
        # handcrafted geof(+rgb) features ARE the embeddings — no training,
        # straight to partition evaluation
        ev = FinalEvaluator(n_classes, args.BR_tolerance)
        for path in test_files or train_files:
            sample = graph_collate([graph_loader(path, False, loader_cfg)])
            emb = np.asarray(sample["clouds"], np.float32).reshape(
                len(sample["xyz"]), -1
            )
            diff = np.asarray(
                compute_dist(
                    jnp.asarray(emb),
                    jnp.asarray(sample["edg_source"], jnp.int32),
                    jnp.asarray(sample["edg_target"], jnp.int32),
                    loss_cfg.dist_type,
                )
            )
            spg_path = None
            if args.spg_out:
                rel = os.path.relpath(
                    path, os.path.join(root, "features_supervision")
                )
                spg_path = os.path.join(hierarchy.spg_folder, rel)
            ev.add_cloud(loss_cfg, emb, diff, sample, spg_out_path=spg_path)
        ev.write_res(os.path.join(hierarchy.outputdir, "res.h5"))
        return

    rs = np.random.RandomState(args.seed)
    trainer = SspTrainer(model_cfg, loss_cfg, lr=args.lr,
                         grad_clip=args.grad_clip)
    probe = graph_collate([graph_loader(train_files[0], False, loader_cfg)])
    state = trainer.init(
        jax.random.PRNGKey(args.seed), jnp.asarray(probe["clouds"]),
        jnp.asarray(probe["clouds_global"]),
    )
    stats = []
    start_epoch = 0
    if args.resume:
        from ..learn.checkpoint import load_checkpoint

        path = args.resume if os.path.isfile(args.resume) else hierarchy.model_path
        if os.path.isfile(path):
            state, start_epoch, _, _ = load_checkpoint(path, state)
            try:
                stats = json.loads(
                    open(os.path.join(hierarchy.outputdir, "trainlog.json")).read()
                )
            except Exception:
                stats = []
    for epoch in range(start_epoch, args.epochs):
        order = rs.permutation(len(train_files))
        losses, n_clusters = [], []
        for i in range(0, len(order), args.batch_size):
            samples = [
                graph_loader(train_files[j], True, loader_cfg, rs)
                for j in order[i : i + args.batch_size]
            ]
            batch = graph_collate(samples)
            state, loss, comps, in_comp = trainer.train_step(state, batch)
            losses.append(loss)
            n_clusters.append(len(batch["xyz"]) / max(len(comps), 1))
        entry = {
            "epoch": epoch,
            "loss": float(np.mean(losses)),
            "avg_comp_size": float(np.mean(n_clusters)),
        }
        stats.append(entry)
        print(json.dumps(entry))
        with open(os.path.join(hierarchy.outputdir, "trainlog.json"), "w") as f:
            json.dump(stats, f, indent=2)
        if not np.isfinite(entry["loss"]):
            print("NaN loss, aborting")
            break

    # final evaluation + SPG output for the segmentation stage
    ev = FinalEvaluator(n_classes, args.BR_tolerance)
    for path in test_files or train_files:
        sample = graph_collate([graph_loader(path, False, loader_cfg)])
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
        spg_path = None
        if args.spg_out:
            rel = os.path.relpath(path, os.path.join(root, "features_supervision"))
            spg_path = os.path.join(hierarchy.spg_folder, rel)
        ev.add_cloud(loss_cfg, emb, diff, sample, spg_out_path=spg_path)
    ev.write_res(os.path.join(hierarchy.outputdir, "res.h5"))

    # checkpoint
    from ..learn.checkpoint import save_checkpoint

    save_checkpoint(
        hierarchy.model_path, state, args.epochs,
        {k: v for k, v in vars(args).items()}, None,
    )


if __name__ == "__main__":
    main()

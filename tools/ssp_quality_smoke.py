"""SSP quality smoke: train supervised-partition embeddings with the TPU
in-loop cut pursuit and record ASA/BR/BP per epoch.

VERDICT r2 item 7: the `cp_backend=tpu` in-loop partition was validated as
FAST (tools/ssp_inloop_results.json) but not as TRAINABLE — this harness
mirrors the reference's embedding-training eval loop
(supervized_partition/supervized_partition.py:248-295: per-epoch partition
quality on held-out clouds) on synthetic rooms and records the epoch curve
of ASA (achievable segmentation accuracy), BR (boundary recall), BP
(boundary precision). Writes tools/ssp_quality_results.json.

Usage: python tools/ssp_quality_smoke.py [--epochs 8]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigcloud_knn import enable_compile_cache  # noqa: E402

enable_compile_cache()


def build_tree(root: str, n_rooms: int = 6, n_points: int = 6000):
    """Rooms with BLOBBY clutter (clutter_blobs=True): the historic uniform
    volumetric clutter interleaves with every surface and caps the per-voxel
    ASA oracle at ~55%, leaving no headroom for training to show up in ASA."""
    from superpoint_graph_tpu.data.synthetic import synthetic_room

    rng = np.random.RandomState(3)
    class_names = {0: "floor", 1: "ceiling", 2: "wall", 3: "table",
                   4: "clutter", 5: "beam"}
    for r in range(n_rooms):
        area, room = f"Area_{r % 2 + 1}", f"room_{r // 2}"
        xyz, rgb, labels, objects = synthetic_room(
            rng, n_points=n_points, clutter_blobs=True
        )
        room_dir = os.path.join(root, "data", area, room)
        ann = os.path.join(room_dir, "Annotations")
        os.makedirs(ann, exist_ok=True)
        np.savetxt(os.path.join(room_dir, room + ".txt"),
                   np.hstack([xyz, rgb.astype(np.float64)]), fmt="%.4f")
        for obj in np.unique(objects):
            m = objects == obj
            cname = class_names[int(labels[m][0])]
            np.savetxt(os.path.join(ann, f"{cname}_{obj + 1}.txt"),
                       np.hstack([xyz[m], rgb[m].astype(np.float64)]),
                       fmt="%.4f")
    from superpoint_graph_tpu.cli import ssp_preprocess

    ssp_preprocess.main([
        "--ROOT_PATH", root, "--dataset", "s3dis",
        "--voxel_width", "0.02", "--k_nn_local", "20", "--k_nn_adj", "5",
    ])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--cp_backend", default="tpu")
    ap.add_argument("--reg_strength", type=float, default=0.03)
    ap.add_argument("--cp_cutoff", type=int, default=4)
    ap.add_argument("--out", default="ssp_quality_results.json",
                    help="results filename (under tools/)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from superpoint_graph_tpu.ssp.embed import SspModelConfig, SspTrainer
    from superpoint_graph_tpu.ssp.evaluate import evaluate_cloud
    from superpoint_graph_tpu.ssp.graph_processing import (
        SspLoaderConfig, graph_collate, graph_loader,
    )
    from superpoint_graph_tpu.ssp.losses import SspLossConfig, compute_dist

    root = tempfile.mkdtemp(prefix="ssp_quality_")
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
        loss_cfg = SspLossConfig(
            reg_strength=args.reg_strength, k_nn_adj=5,
            CP_cutoff=args.cp_cutoff, cp_backend=args.cp_backend,
        )
        loader_cfg = SspLoaderConfig(
            k_nn_local=20, max_ver_train=10000, use_rgb=True
        )

        trainer = SspTrainer(model_cfg, loss_cfg, lr=5e-3)
        rs = np.random.RandomState(0)
        probe = graph_collate([graph_loader(train_files[0], False, loader_cfg)])
        state = trainer.init(
            jax.random.PRNGKey(0), jnp.asarray(probe["clouds"]),
            jnp.asarray(probe["clouds_global"]),
        )

        def eval_quality(state):
            asa, br, bp, nc = [], [], [], []
            for path in test_files:
                sample = graph_collate([graph_loader(path, False, loader_cfg)])
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
            return (
                float(np.nanmean(asa)), float(np.nanmean(br)),
                float(np.nanmean(bp)), float(np.mean(nc)),
            )

        curve = []
        asa0, br0, bp0, nc0 = eval_quality(state)
        curve.append({"epoch": -1, "asa": round(asa0, 2), "br": round(br0, 2),
                      "bp": round(bp0, 2), "n_clusters": nc0})
        print(json.dumps(curve[-1]), flush=True)
        for epoch in range(args.epochs):
            order = rs.permutation(len(train_files))
            losses = []
            for j in order:
                batch = graph_collate(
                    [graph_loader(train_files[j], True, loader_cfg, rs)]
                )
                state, loss, comps, in_comp = trainer.train_step(state, batch)
                losses.append(float(loss))
            asa, br, bp, nc = eval_quality(state)
            curve.append({
                "epoch": epoch, "loss": round(float(np.mean(losses)), 4),
                "asa": round(asa, 2), "br": round(br, 2),
                "bp": round(bp, 2), "n_clusters": nc,
            })
            print(json.dumps(curve[-1]), flush=True)

        first, last = curve[0], curve[-1]
        summary = {
            "cp_backend": args.cp_backend,
            "reg_strength": args.reg_strength,
            "cp_cutoff": args.cp_cutoff,
            "epochs": args.epochs,
            "asa_first": first["asa"], "asa_last": last["asa"],
            "br_first": first["br"], "br_last": last["br"],
            "bp_first": first["bp"], "bp_last": last["bp"],
            "improved": bool(
                last["asa"] >= first["asa"] and last["br"] >= first["br"]
            ),
            "curve": curve,
        }
        print(json.dumps({k: v for k, v in summary.items() if k != "curve"}),
              flush=True)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           args.out)
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
        print("wrote", out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Training / evaluation driver for SPG semantic segmentation.

CLI parity with reference learning/main.py:40-135 (flag names and defaults);
behavior parity with its epoch loop (176-388): per-epoch train with SPG
subsampling augmentation, optional val-gated best model, periodic test,
multisample final inference with mean-logit voting, predictions h5 + scores
json + pointwise confusion matrix, trainlog.json, checkpoint/resume carrying
args and the edge-feature scaler.
"""
from __future__ import annotations

import argparse
import ast
import json
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native Superpoint-Graph semantic segmentation"
    )
    # Optimization
    parser.add_argument("--wd", default=0, type=float)
    parser.add_argument("--lr", default=1e-2, type=float)
    parser.add_argument("--lr_decay", default=0.7, type=float)
    parser.add_argument("--lr_steps", default="[]")
    parser.add_argument("--momentum", default=0.9, type=float)
    parser.add_argument("--epochs", default=10, type=int)
    parser.add_argument("--batch_size", default=2, type=int)
    parser.add_argument("--optim", default="adam")
    parser.add_argument("--grad_clip", default=1, type=float)
    parser.add_argument("--loss_weights", default="none",
                        choices=["none", "proportional", "sqrt"])
    # Learning process
    parser.add_argument("--nworkers", default=0, type=int)
    parser.add_argument(
        "--steps_per_dispatch", default=1, type=int,
        help="group consecutive same-bucket train batches into one device "
        "dispatch (lax.scan; measured slower on the tunneled box - see "
        "ROADMAP r5 dead ends)",
    )
    parser.add_argument("--test_nth_epoch", default=1, type=int)
    parser.add_argument("--save_nth_epoch", default=1, type=int)
    parser.add_argument("--test_multisamp_n", default=10, type=int)
    # Dataset
    parser.add_argument("--dataset", default="sema3d")
    parser.add_argument("--cvfold", default=0, type=int)
    parser.add_argument("--odir", default="results")
    parser.add_argument("--resume", default="")
    parser.add_argument("--db_train_name", default="train")
    parser.add_argument("--db_test_name", default="test")
    parser.add_argument("--use_val_set", type=int, default=0)
    parser.add_argument("--SEMA3D_PATH", default="datasets/semantic3d")
    parser.add_argument("--S3DIS_PATH", default="datasets/s3dis")
    parser.add_argument("--VKITTI_PATH", default="datasets/vkitti")
    parser.add_argument("--CUSTOM_SET_PATH", default="datasets/custom_set")
    # Model
    parser.add_argument("--model_config", default="gru_10,f_8")
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument(
        "--edge_attribs",
        default="delta_avg,delta_std,nlength/ld,surface/ld,volume/ld,size/ld,xyz/d",
    )
    # Point cloud processing
    parser.add_argument("--pc_attribs", default="xyzrgbelpsvXYZ")
    parser.add_argument("--pc_augm_scale", default=0, type=float)
    parser.add_argument("--pc_augm_rot", default=1, type=int)
    parser.add_argument("--pc_augm_mirror_prob", default=0, type=float)
    parser.add_argument("--pc_augm_jitter", default=1, type=int)
    parser.add_argument("--pc_xyznormalize", default=1, type=int)
    # Filter generating network
    parser.add_argument("--fnet_widths", default="[32,128,64]")
    parser.add_argument("--fnet_llbias", default=0, type=int)
    parser.add_argument("--fnet_orthoinit", default=1, type=int)
    parser.add_argument("--fnet_bnidx", default=2, type=int)
    parser.add_argument("--edge_mem_limit", default=30000, type=int,
                        help="kept for flag parity; padding buckets bound memory instead")
    # Superpoint graph
    parser.add_argument("--spg_attribs01", default=1, type=int)
    parser.add_argument("--spg_augm_nneigh", default=100, type=int)
    parser.add_argument("--spg_augm_order", default=3, type=int)
    parser.add_argument("--spg_augm_hardcutoff", default=512, type=int)
    parser.add_argument("--spg_superedge_cutoff", default=-1, type=float)
    # Point net
    parser.add_argument("--ptn_minpts", default=40, type=int)
    parser.add_argument("--ptn_npts", default=128, type=int)
    parser.add_argument("--ptn_widths", default="[[64,64,128,128,256], [256,64,32]]")
    parser.add_argument("--ptn_widths_stn", default="[[64,64,128], [128,64]]")
    parser.add_argument("--ptn_nfeat_stn", default=11, type=int)
    parser.add_argument("--ptn_prelast_do", default=0, type=float)
    parser.add_argument("--ptn_mem_monger", default=1, type=int)

    args = parser.parse_args(argv)
    args.start_epoch = 0
    args.lr_steps = ast.literal_eval(args.lr_steps)
    args.fnet_widths = ast.literal_eval(args.fnet_widths)
    args.ptn_widths = ast.literal_eval(args.ptn_widths)
    args.ptn_widths_stn = ast.literal_eval(args.ptn_widths_stn)
    return args


def dataset_root(args) -> str:
    return {
        "s3dis": args.S3DIS_PATH,
        "sema3d": args.SEMA3D_PATH,
        "vkitti": args.VKITTI_PATH,
        "custom_dataset": args.CUSTOM_SET_PATH,
    }[args.dataset]


def build(args, dbinfo):
    """Model + trainer from args (reference create_model, main.py:414-431)."""
    from ..data.loader import LoaderConfig, pc_attrib_dims
    from ..learn.train import Trainer
    from ..models import SpgModel

    loader_cfg = LoaderConfig(
        ptn_npts=args.ptn_npts,
        ptn_minpts=args.ptn_minpts,
        pc_attribs=args.pc_attribs,
        pc_xyznormalize=bool(args.pc_xyznormalize),
        pc_augm_scale=args.pc_augm_scale,
        pc_augm_rot=bool(args.pc_augm_rot),
        pc_augm_mirror_prob=args.pc_augm_mirror_prob,
        pc_augm_jitter=bool(args.pc_augm_jitter),
        spg_augm_nneigh=args.spg_augm_nneigh,
        spg_augm_order=args.spg_augm_order,
        spg_augm_hardcutoff=args.spg_augm_hardcutoff,
    )
    n_ch = pc_attrib_dims(args.pc_attribs)
    model = SpgModel(
        n_classes=dbinfo.classes,
        model_config=args.model_config,
        ptn_widths=tuple(map(tuple, args.ptn_widths)),
        ptn_widths_stn=tuple(map(tuple, args.ptn_widths_stn)),
        ptn_nfeat=n_ch,
        ptn_nfeat_stn=args.ptn_nfeat_stn,
        ptn_prelast_do=args.ptn_prelast_do,
        fnet_widths=tuple([dbinfo.edge_feats] + list(args.fnet_widths)),
        fnet_orthoinit=bool(args.fnet_orthoinit),
        fnet_llbias=bool(args.fnet_llbias),
        fnet_bnidx=args.fnet_bnidx,
    )
    trainer = Trainer(
        model,
        optim=args.optim,
        lr=args.lr,
        lr_steps=args.lr_steps,
        lr_decay=args.lr_decay,
        momentum=args.momentum,
        wd=args.wd,
        grad_clip=args.grad_clip,
        class_weights=dbinfo.class_weights,
        checkpoint_ptn=bool(args.ptn_mem_monger),
    )
    return model, trainer, loader_cfg, n_ch


def _parsed_path(root, name):
    return os.path.join(root, "parsed", name + ".h5")


def run_epoch(trainer, state, entries, names, root, loader_cfg, n_ch, dbinfo,
              train, rng_np, rng_jax, batch_size, test_seed_offset=0,
              nworkers=0, steps_per_dispatch=1):
    """One pass over `entries`; returns (state, mean_loss, ConfusionMatrix).

    With nworkers > 0 the h5 loading + collation of the next batch overlaps
    the device step of the current one (the reference's DataLoader workers,
    main.py:180 — thread-based here since loading is h5py/numpy bound).

    steps_per_dispatch > 1 groups consecutive same-padding-bucket batches
    into ONE device dispatch (Trainer.train_steps lax.scan): the tunneled
    single-chip target pays a fixed ~5 ms per dispatch, which caps
    single-step training at ~150-200 steps/s regardless of model size.
    Identical optimizer math per step; only the dropout rng stream differs
    from the sequential loop (split once per group, folded per step)."""
    import dataclasses as _dc

    import jax

    from ..data.loader import collate_spg, load_spg_sample
    from ..learn.metrics import ConfusionMatrix

    order = rng_np.permutation(len(entries)) if train else np.arange(len(entries))
    cm = ConfusionMatrix(dbinfo.classes)
    losses = []
    bs = batch_size if train else 1

    def load_batch(idx):
        samples = []
        for j in idx:
            s = load_spg_sample(
                entries[j], _parsed_path(root, names[j]), loader_cfg,
                train=train, test_seed_offset=test_seed_offset, rs=rng_np,
            )
            if s is not None:
                samples.append(s)
        if not samples:
            return None
        return collate_spg(samples, loader_cfg, dbinfo.classes, n_ch)

    groups = [order[i : i + bs] for i in range(0, len(order), bs)]
    if nworkers > 0:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=max(1, nworkers))
        batch_iter = iter(pool.map(load_batch, groups))
    else:
        pool = None
        batch_iter = (load_batch(g) for g in groups)

    def account(loss, logits, batch):
        losses.append(float(loss))
        pred = np.asarray(logits).argmax(1)
        tsize = np.asarray(batch.target_size)
        valid = np.asarray(batch.targets) != -100
        cm.count_predicted_batch(tsize[valid][:, 1:], pred[valid])

    def shape_sig(b):
        return tuple(
            (f.name, None if getattr(b, f.name) is None
             else tuple(getattr(b, f.name).shape))
            for f in _dc.fields(b)
        )

    pending: list = []

    def flush():
        nonlocal state, rng_jax
        if not pending:
            return
        rng_jax, sub = jax.random.split(rng_jax)
        state, lk, gk = trainer.train_steps(state, list(pending), sub)
        lk, gk = np.asarray(lk), np.asarray(gk)
        for i, b in enumerate(pending):
            account(lk[i], gk[i], b)
        pending.clear()

    for batch in batch_iter:
        if batch is None:
            continue
        if train and steps_per_dispatch > 1:
            if pending and shape_sig(pending[-1]) != shape_sig(batch):
                flush()
            pending.append(batch)
            if len(pending) >= steps_per_dispatch:
                flush()
            continue
        if train:
            rng_jax, sub = jax.random.split(rng_jax)
            state, loss, logits = trainer.train_step(state, batch, sub)
        else:
            loss, logits = trainer.eval_step(state, batch)
        account(loss, logits, batch)
    flush()
    if pool is not None:
        pool.shutdown()
    return state, (float(np.mean(losses)) if losses else 0.0), cm, rng_jax


def eval_final(args, trainer, state, entries, names, root, loader_cfg, n_ch,
               dbinfo):
    """Multisample voting inference (main.py:267-311): average logits over
    test_multisamp_n reseeded superpoint samplings."""
    from ..data.loader import collate_spg, load_spg_sample
    from ..learn.metrics import ConfusionMatrix

    cm = ConfusionMatrix(dbinfo.classes)
    predictions = {}
    for j, (entry, name) in enumerate(zip(entries, names)):
        acc_logits = None
        for ss in range(max(args.test_multisamp_n, 1)):
            s = load_spg_sample(
                entry, _parsed_path(root, name), loader_cfg, train=False,
                test_seed_offset=ss,
            )
            if s is None:
                break
            batch = collate_spg([s], loader_cfg, dbinfo.classes, n_ch)
            _, logits = trainer.eval_step(state, batch)
            n_real = s["node_gt"].shape[0]
            logits = np.asarray(logits)[:n_real]
            acc_logits = logits if acc_logits is None else acc_logits + logits
        if acc_logits is None:
            continue
        pred = acc_logits.argmax(1)
        predictions[name] = pred
        tsize = entry[1]
        valid = entry[0].ravel() != -100
        cm.count_predicted_batch(tsize[valid][:, 1:], pred[valid])
    return predictions, cm


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    import h5py
    import jax

    from ..data import datasets as ds
    from ..learn.checkpoint import load_checkpoint, save_checkpoint

    args = parse_args(argv)
    os.makedirs(args.odir, exist_ok=True)
    with open(os.path.join(args.odir, "cmdline.txt"), "w") as f:
        f.write(" ".join(sys.argv))

    root = dataset_root(args)
    dbinfo = ds.get_info(
        args.dataset, root, args.edge_attribs, args.pc_attribs,
        args.loss_weights, args.cvfold,
    )
    import jax

    if jax.process_count() > 1:
        # multi-host launch: shard the train file list per host over DCN and
        # fit the edge scaler on the global union (parallel/multihost.py)
        from superpoint_graph_tpu.parallel.multihost import (
            get_datasets_multihost,
        )

        trainlist, testlist, validlist, scaler = get_datasets_multihost(
            args.dataset, root, args.edge_attribs,
            spg_superedge_cutoff=args.spg_superedge_cutoff,
            spg_attribs01=bool(args.spg_attribs01), cvfold=args.cvfold,
            use_val_set=bool(args.use_val_set),
            db_train_name=args.db_train_name,
            db_test_name=args.db_test_name,
        )
    else:
        trainlist, testlist, validlist, scaler = ds.get_datasets(
            args.dataset, root, args.edge_attribs, args.spg_superedge_cutoff,
            bool(args.spg_attribs01), args.cvfold, bool(args.use_val_set),
            args.db_train_name, args.db_test_name,
        )
    train_names = [e[4] for e in trainlist]
    test_names = [e[4] for e in testlist]
    valid_names = [e[4] for e in validlist]

    # Resolve the resume checkpoint path up-front: the model must be rebuilt
    # from the checkpoint's *own* saved args so architecture flags cannot
    # drift (reference main.py:390-412 resume(): "use original arguments,
    # architecture can't change"). Unlike the reference we also restore
    # model_config from the checkpoint — its current-args override is a
    # self-described legacy hack ("should be removed once new models are
    # uploaded"). Optimizer / run-control settings stay on the current args.
    resume_path = ""
    if args.resume:
        resume_path = args.resume
        if not os.path.isfile(resume_path):
            resume_path = os.path.join(args.odir, "model.ckpt")
    if resume_path:
        from ..learn.checkpoint import read_checkpoint_args

        ckpt_args = read_checkpoint_args(resume_path)
        build_args = argparse.Namespace(**vars(args))
        for key in (
            "model_config",
            "fnet_widths", "fnet_llbias", "fnet_orthoinit", "fnet_bnidx",
            "ptn_widths", "ptn_widths_stn", "ptn_nfeat_stn", "ptn_prelast_do",
            "pc_attribs",
        ):
            if key in ckpt_args:
                setattr(build_args, key, ckpt_args[key])
    else:
        build_args = args

    model, trainer, loader_cfg, n_ch = build(build_args, dbinfo)
    rng_np = np.random.RandomState(args.seed)
    rng_jax = jax.random.PRNGKey(args.seed)

    # init from a first batch (or resume)
    from ..data.loader import collate_spg, load_spg_sample

    probe = None
    for e, n in zip(trainlist + testlist, train_names + test_names):
        probe = load_spg_sample(e, _parsed_path(root, n), loader_cfg,
                                train=False)
        if probe is not None:
            break
    if probe is None:
        raise SystemExit("no loadable clouds found under " + root)
    init_batch = collate_spg([probe], loader_cfg, dbinfo.classes, n_ch)
    state = trainer.init(jax.random.PRNGKey(args.seed), init_batch)

    stats = []
    if resume_path:
        state, args.start_epoch, _, scaler_state = load_checkpoint(
            resume_path, state)
        if scaler_state is not None:
            from ..data.spg_io import EdgeFeatScaler

            scaler = EdgeFeatScaler.from_state(scaler_state)
        try:
            stats = json.loads(
                open(os.path.join(args.odir, "trainlog.json")).read()
            )
        except Exception:
            stats = []

    best_val = -1.0
    for epoch in range(args.start_epoch, args.epochs):
        state = trainer.set_epoch_lr(state, epoch)
        t0 = time.time()
        state, tr_loss, tr_cm, rng_jax = run_epoch(
            trainer, state, trainlist, train_names, root, loader_cfg, n_ch,
            dbinfo, True, rng_np, rng_jax, args.batch_size,
            nworkers=args.nworkers,
            steps_per_dispatch=args.steps_per_dispatch,
        )
        entry = {
            "epoch": epoch,
            "loss": tr_loss,
            "acc": 100 * tr_cm.get_overall_accuracy(),
            "time": time.time() - t0,
        }
        if args.use_val_set and validlist:
            _, v_loss, v_cm, rng_jax = run_epoch(
                trainer, state, validlist, valid_names, root, loader_cfg, n_ch,
                dbinfo, False, rng_np, rng_jax, 1,
            )
            entry["val_oacc"] = 100 * v_cm.get_overall_accuracy()
            if entry["val_oacc"] > best_val:
                best_val = entry["val_oacc"]
                save_checkpoint(
                    os.path.join(args.odir, "model_best.ckpt"), state, epoch + 1,
                    vars(args) | {"lr_steps": list(args.lr_steps)},
                    scaler.state_dict() if scaler else None,
                )
        if testlist and args.test_nth_epoch > 0 and (epoch + 1) % args.test_nth_epoch == 0:
            _, te_loss, te_cm, rng_jax = run_epoch(
                trainer, state, testlist, test_names, root, loader_cfg, n_ch,
                dbinfo, False, rng_np, rng_jax, 1,
            )
            entry["oacc"] = 100 * te_cm.get_overall_accuracy()
            entry["avg_iou"] = 100 * te_cm.get_average_intersection_union()
        stats.append(entry)
        print(json.dumps(entry))
        if args.save_nth_epoch > 0 and (epoch + 1) % args.save_nth_epoch == 0:
            save_checkpoint(
                os.path.join(args.odir, "model.ckpt"), state, epoch + 1,
                {k: v for k, v in vars(args).items()},
                scaler.state_dict() if scaler else None,
            )
        with open(os.path.join(args.odir, "trainlog.json"), "w") as f:
            json.dump(stats, f, indent=2)
        if not np.isfinite(tr_loss):
            print("NaN loss, aborting")
            break

    # final multisample evaluation
    if testlist:
        predictions, cm = eval_final(
            args, trainer, state, testlist, test_names, root, loader_cfg, n_ch,
            dbinfo,
        )
        with h5py.File(
            os.path.join(args.odir, f"predictions_{args.db_test_name}.h5"), "w"
        ) as f:
            for name, pred in predictions.items():
                f.create_dataset(name.replace("/", "__"), data=pred.astype(np.int32))
        scores = {
            "oacc": cm.get_overall_accuracy(),
            "avg_iou": cm.get_average_intersection_union(),
            "avg_acc": cm.get_mean_class_accuracy(),
            "per_class_iou": {
                dbinfo.inv_class_map[i]: iou
                for i, iou in enumerate(cm.get_intersection_union_per_class())
            },
        }
        with open(
            os.path.join(args.odir, f"scores_{args.db_test_name}.json"), "w"
        ) as f:
            json.dump(scores, f, indent=2)
        np.save(os.path.join(args.odir, "pointwise_cm.npy"), cm.confusion_matrix)
        print(json.dumps({"final": scores["oacc"], "miou": scores["avg_iou"]}))


if __name__ == "__main__":
    main()

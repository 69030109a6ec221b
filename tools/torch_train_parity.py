"""Training-parity receipt (VERDICT r4 next-#7): does TRAINING through this
framework match training through the reference torch stack?

The strongest accuracy-parity proxy available without the S3DIS dataset:
one synthetic S3DIS-layout dataset is generated and partitioned ONCE, then
two models with identical architecture/hyper-parameters are trained from
scratch on the identical parsed caches:

  * flax arm — the full framework CLI (`cli.train.main`), exactly the
    quality-smoke recipe (tools/quality_smoke.py).
  * torch arm — the ACTUAL reference modules (/root/reference
    learning/pointnet.py + learning/graphnet.py, igraph stubbed out like
    tests/test_torch_convert.py), trained with the reference's optimizer
    recipe (Adam + MultiStepLR + element-wise grad clamp, main.py:204-212,
    341) on batches drawn by OUR loader (identical partitions, identical
    superpoint sampling rules, spg.py:130-236 semantics).

Both arms are evaluated with the same multisample mean-logit protocol
(main.py:267-311) and the same ConfusionMatrix code; the torch-trained
weights are ALSO converted to flax (learn/convert_torch.py) and evaluated
through our eval path, which re-verifies conversion equivalence on a
TRAINED model (BN stats and all), not just on random weights.

Receipt: tools/torch_train_parity_results.json — flax-trained vs
torch-trained OA/mIoU within noise on identical partitions upgrades the
parity evidence from "logits match" (test_torch_convert.py) to "training
matches".

Runs CPU-only (forced, so it can run while the chip is busy).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env selection

REF = "/root/reference"
EDGE_ATTRIBS = "delta_avg,delta_std,nlength/ld,surface/ld,volume/ld,size/ld,xyz/d"
PC_ATTRIBS = "xyzrgbelpsvXYZ"
EPOCHS = 60
LR, LR_STEPS, LR_DECAY, GRAD_CLIP, BATCH = 5e-3, [40, 50], 0.7, 1.0, 2
MODEL_CONFIG = "gru_5_0,f_13"
PTN_WIDTHS = [[32, 64, 128], [128, 32]]
STN_WIDTHS = [[16, 32], [32, 16]]
FNET_WIDTHS = [32, 64]
PTN_MINPTS, PTN_NPTS = 10, 64
NNEIGH, HARDCUT = 50, 256
MULTISAMP = 5
CVFOLD = 3


def build_dataset(root: str):
    from test_cli import write_s3dis_room

    from superpoint_graph_tpu.cli import partition as cli_partition
    from superpoint_graph_tpu.data.parsed import preprocess_pointclouds

    rng = np.random.RandomState(5)
    for area in ("Area_1", "Area_2", "Area_3"):
        for r in range(2):
            write_s3dis_room(root, area, f"room_{r}", rng, n_points=8000)
    cli_partition.main([
        "--ROOT_PATH", root, "--dataset", "s3dis",
        "--voxel_width", "0.05", "--reg_strength", "0.05",
        "--k_nn_geof", "30", "--k_nn_adj", "8",
        "--spg_adjacency", "knn", "--cp_backend", "exact",
    ])
    preprocess_pointclouds(root, "s3dis", 13)


def flax_arm(root: str, seed: int = 1) -> dict:
    from superpoint_graph_tpu.cli import train as cli_train

    odir = os.path.join(root, f"results_flax_s{seed}")
    cli_train.main([
        "--seed", str(seed),
        "--dataset", "s3dis", "--S3DIS_PATH", root, "--cvfold", str(CVFOLD),
        "--odir", odir, "--epochs", str(EPOCHS), "--lr", str(LR),
        "--lr_steps", str(LR_STEPS), "--lr_decay", str(LR_DECAY),
        "--grad_clip", str(GRAD_CLIP), "--batch_size", str(BATCH),
        "--model_config", MODEL_CONFIG,
        "--ptn_widths", str(PTN_WIDTHS),
        "--ptn_widths_stn", str(STN_WIDTHS),
        "--fnet_widths", str(FNET_WIDTHS),
        "--ptn_minpts", str(PTN_MINPTS), "--ptn_npts", str(PTN_NPTS),
        "--spg_augm_nneigh", str(NNEIGH),
        "--spg_augm_hardcutoff", str(HARDCUT),
        "--test_multisamp_n", str(MULTISAMP), "--loss_weights", "sqrt",
        "--test_nth_epoch", "20",
    ])
    scores = json.load(open(os.path.join(odir, "scores_test.json")))
    return {"oacc": scores["oacc"], "miou": scores["avg_iou"]}


class Gci:
    """Raw-buffer GraphConvInfo (the reference's own unit tests build these
    directly, test_GraphConvModule.py:34)."""

    def __init__(self, torch, idxn, degs, edgefeats):
        self._b = (
            torch.LongTensor(idxn), None, torch.LongTensor(degs),
            torch.LongTensor(degs), torch.FloatTensor(edgefeats),
        )

    def get_buffers(self):
        return self._b

    def get_pyg_buffers(self):
        return None


def torch_union(samples):
    """Concatenate per-cloud samples into one UNPADDED union with the
    reference's edge layout (sorted by target, GraphConvInfo.py:33-69)."""
    n_sp = sum(s["node_gt"].shape[0] for s in samples)
    n_ch = samples[0]["clouds"].shape[2]
    npts = samples[0]["clouds"].shape[1]
    nc1 = samples[0]["node_gt_size"].shape[1]
    clouds = np.zeros((n_sp, npts, n_ch), np.float32)
    glob = np.zeros((n_sp, 1), np.float32)
    flags = np.zeros(n_sp, np.int64)
    targets = np.full(n_sp, -100, np.int64)
    tsize = np.zeros((n_sp, nc1), np.int64)
    src_all, tgt_all, ef_all = [], [], []
    off = 0
    for s in samples:
        k = s["node_gt"].shape[0]
        clouds[off : off + k] = s["clouds"]
        glob[off : off + k, 0] = s["clouds_global"]
        flags[off : off + k] = s["cloud_flag"]
        targets[off : off + k] = s["node_gt"].ravel()
        tsize[off : off + k] = s["node_gt_size"]
        if len(s["edges"]):
            src_all.append(s["edges"][:, 0] + off)
            tgt_all.append(s["edges"][:, 1] + off)
            ef_all.append(s["edge_feats"])
        off += k
    src = np.concatenate(src_all).astype(np.int64)
    tgt = np.concatenate(tgt_all).astype(np.int64)
    ef = np.concatenate(ef_all).astype(np.float32)
    order = np.argsort(tgt, kind="stable")
    return {
        "clouds": clouds, "glob": glob, "flags": flags, "targets": targets,
        "tsize": tsize, "idxn": src[order], "ef": ef[order],
        "degs": np.bincount(tgt, minlength=n_sp),
    }


def torch_arm(root: str, seed: int = 1) -> dict:
    import torch
    import torch.nn.functional as F

    torch.set_num_threads(1)
    torch.manual_seed(seed)
    if "igraph" not in sys.modules:
        sys.modules["igraph"] = types.ModuleType("igraph")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import learning.graphnet as ref_graphnet
    import learning.pointnet as ref_pointnet

    # The reference's GraphConvFunction.backward is old-torch code: its
    # `torch.bmm(..., out=sel_input)` reshapes the 2D buffer to [E, 1, C]
    # in modern torch and the subsequent index_add_ crashes (GraphConv
    # Module.py:146). Replace it with a vectorized, mathematically
    # identical backward (same mean-aggregate semantics as forward:
    # out[i] = mean_e input[idxn_e] @ W_e). Verified against autograd on a
    # differentiable re-implementation below before training starts.
    import learning.ecc as ref_ecc

    def _gcf_backward(ctx, grad_output):
        inp, weights = ctx.saved_tensors
        idxn, idxe, degs = ctx._idxn, ctx._idxe, ctx._degs
        node_idx = torch.repeat_interleave(
            torch.arange(degs.numel(), device=grad_output.device), degs
        )
        d = degs[node_idx].clamp(min=1).to(grad_output.dtype).unsqueeze(1)
        gp = grad_output[node_idx] / d          # [E, out] d(out)/d(product)
        sel_input = inp[idxn]                    # [E, in]
        w = weights[idxe] if idxe is not None else weights
        if ctx._full_weight_mat:
            grad_w_e = torch.bmm(sel_input.unsqueeze(2), gp.unsqueeze(1))
            grad_in_e = torch.bmm(gp.unsqueeze(1), w.transpose(1, 2))
            grad_in_e = grad_in_e.squeeze(1)
        else:
            grad_w_e = sel_input * gp            # diagonal: in == out
            grad_in_e = gp * w
        if idxe is not None:
            grad_weights = torch.zeros_like(weights).index_add_(
                0, idxe, grad_w_e
            )
        else:
            grad_weights = grad_w_e
        grad_input = torch.zeros_like(inp).index_add_(0, idxn, grad_in_e)
        return (grad_input, grad_weights, None, None, None, None, None,
                None, None)

    ref_ecc.GraphConvFunction.backward = staticmethod(_gcf_backward)

    # equivalence check: patched backward vs autograd through a pure-torch
    # differentiable forward with identical semantics
    def _check_backward():
        g = torch.Generator().manual_seed(0)
        n, e, ci, co = 7, 19, 3, 4
        tgt, _ = torch.sort(torch.randint(0, n, (e,), generator=g))
        idxn = torch.randint(0, n, (e,), generator=g)
        degs = torch.bincount(tgt, minlength=n)
        x1 = torch.randn(n, ci, generator=g, requires_grad=True)
        w1 = torch.randn(e, ci, co, generator=g, requires_grad=True)
        out = ref_ecc.GraphConvFunction.apply(
            x1, w1, ci, co, idxn, None, degs, degs, int(1e9)
        )
        loss = (out * torch.arange(n * co).view(n, co)).sum()
        loss.backward()
        x2 = x1.detach().clone().requires_grad_(True)
        w2 = w1.detach().clone().requires_grad_(True)
        prod = torch.bmm(x2[idxn].unsqueeze(1), w2).squeeze(1)
        node_idx = torch.repeat_interleave(torch.arange(n), degs)
        agg = torch.zeros(n, co).index_add_(0, node_idx, prod)
        out2 = agg / degs.clamp(min=1).unsqueeze(1).to(agg.dtype)
        ((out2 * torch.arange(n * co).view(n, co)).sum()).backward()
        assert torch.allclose(out, out2, atol=1e-5), "forward mismatch"
        assert torch.allclose(x1.grad, x2.grad, atol=1e-5), "dx mismatch"
        assert torch.allclose(w1.grad, w2.grad, atol=1e-5), "dw mismatch"

    _check_backward()
    print("GraphConvFunction backward shim verified vs autograd",
          flush=True)

    from superpoint_graph_tpu.data import datasets as ds
    from superpoint_graph_tpu.data.loader import (
        LoaderConfig, load_spg_sample, pc_attrib_dims,
    )
    from superpoint_graph_tpu.learn.metrics import ConfusionMatrix

    dbinfo = ds.get_info("s3dis", root, EDGE_ATTRIBS, PC_ATTRIBS, "sqrt",
                         CVFOLD)
    trainlist, testlist, _, _ = ds.get_datasets(
        "s3dis", root, EDGE_ATTRIBS, -1, True, CVFOLD, False, "train", "test"
    )
    loader_cfg = LoaderConfig(
        ptn_npts=PTN_NPTS, ptn_minpts=PTN_MINPTS, pc_attribs=PC_ATTRIBS,
        spg_augm_nneigh=NNEIGH, spg_augm_hardcutoff=HARDCUT,
    )
    n_ch = pc_attrib_dims(PC_ATTRIBS)

    tmodel = torch.nn.Module()
    tmodel.ecc = ref_graphnet.GraphNetwork(
        MODEL_CONFIG, nfeat=PTN_WIDTHS[1][-1],
        fnet_widths=[dbinfo.edge_feats] + FNET_WIDTHS,
        fnet_orthoinit=True, fnet_llbias=False, fnet_bnidx=1,
        use_pyg=False, cuda=False,
    )
    tmodel.ptn = ref_pointnet.PointNet(
        PTN_WIDTHS[0], PTN_WIDTHS[1], STN_WIDTHS[0], STN_WIDTHS[1],
        nfeat=n_ch, nfeat_stn=11, prelast_do=0.0,
    )

    def run_model(bb, train: bool):
        tmodel.train(train)
        valid = np.flatnonzero(bb["flags"] == 0)
        # CloudEmbedder.run_full semantics (pointnet.py:147-158): only
        # embeddable clouds go through the ptn; others get zero embeddings
        out = tmodel.ptn(
            torch.from_numpy(
                bb["clouds"][valid].transpose(0, 2, 1).copy()
            ),
            torch.from_numpy(bb["glob"][valid]),
        )
        emb = out.new_zeros((len(bb["flags"]), out.size(1)))
        emb[torch.from_numpy(valid)] = out
        gci = Gci(torch, bb["idxn"], bb["degs"], bb["ef"])
        tmodel.ecc.set_info([gci] * len(tmodel.ecc.gconvs), cuda=False)
        return tmodel.ecc(emb)

    wt = torch.from_numpy(np.asarray(dbinfo.class_weights, np.float32))
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=LR_STEPS, gamma=LR_DECAY
    )
    rng_np = np.random.RandomState(seed)
    names = [e[4] for e in trainlist]
    parsed = lambda name: os.path.join(root, "parsed", name + ".h5")  # noqa

    log = []
    for epoch in range(EPOCHS):
        order = rng_np.permutation(len(trainlist))
        losses, cm = [], ConfusionMatrix(dbinfo.classes)
        for i in range(0, len(order), BATCH):
            samples = []
            for j in order[i : i + BATCH]:
                s = load_spg_sample(
                    trainlist[j], parsed(names[j]), loader_cfg, train=True,
                    rs=rng_np,
                )
                if s is not None:
                    samples.append(s)
            if not samples:
                continue
            bb = torch_union(samples)
            logits = run_model(bb, train=True)
            tg = torch.from_numpy(bb["targets"])
            loss = F.cross_entropy(logits, tg, weight=wt, ignore_index=-100)
            opt.zero_grad()
            loss.backward()
            for p in tmodel.parameters():  # main.py:210-212
                if p.grad is not None:
                    p.grad.data.clamp_(-GRAD_CLIP, GRAD_CLIP)
            opt.step()
            losses.append(float(loss))
            pred = logits.detach().numpy().argmax(1)
            vmask = bb["targets"] != -100
            cm.count_predicted_batch(bb["tsize"][vmask][:, 1:], pred[vmask])
        sched.step()
        log.append({
            "epoch": epoch, "loss": float(np.mean(losses)),
            "acc": 100 * cm.get_overall_accuracy(),
        })
        if epoch % 10 == 0 or epoch == EPOCHS - 1:
            print("torch", json.dumps(log[-1]), flush=True)

    # --- torch-native multisample eval (main.py:267-311 protocol) ----------
    test_names = [e[4] for e in testlist]
    cm = ConfusionMatrix(dbinfo.classes)
    with torch.no_grad():
        for entry, name in zip(testlist, test_names):
            acc_logits = None
            for ss in range(MULTISAMP):
                s = load_spg_sample(
                    entry, parsed(name), loader_cfg, train=False,
                    test_seed_offset=ss,
                )
                if s is None:
                    break
                bb = torch_union([s])
                logits = run_model(bb, train=False).numpy()
                acc_logits = logits if acc_logits is None else (
                    acc_logits + logits
                )
            if acc_logits is None:
                continue
            pred = acc_logits.argmax(1)
            vmask = entry[0].ravel() != -100
            cm.count_predicted_batch(entry[1][vmask][:, 1:], pred[vmask])
    res = {
        "oacc": cm.get_overall_accuracy(),
        "miou": cm.get_average_intersection_union(),
        "first_epoch_acc": log[0]["acc"], "last_epoch_acc": log[-1]["acc"],
    }

    # --- convert the TRAINED torch weights -> flax, eval through our path --
    import argparse
    import dataclasses

    from superpoint_graph_tpu.cli.train import eval_final
    from superpoint_graph_tpu.data.loader import collate_spg
    from superpoint_graph_tpu.learn.convert_torch import convert_state_dict
    from superpoint_graph_tpu.learn.train import Trainer
    from superpoint_graph_tpu.models import SpgModel

    model = SpgModel(
        n_classes=dbinfo.classes, model_config=MODEL_CONFIG,
        ptn_widths=tuple(map(tuple, PTN_WIDTHS)),
        ptn_widths_stn=tuple(map(tuple, STN_WIDTHS)),
        ptn_nfeat=n_ch, ptn_nfeat_stn=11, ptn_prelast_do=0.0,
        fnet_widths=tuple([dbinfo.edge_feats] + FNET_WIDTHS),
        fnet_orthoinit=True, fnet_llbias=False, fnet_bnidx=1,
    )
    trainer = Trainer(model, class_weights=dbinfo.class_weights)
    probe = load_spg_sample(testlist[0], parsed(test_names[0]), loader_cfg,
                            train=False)
    init_batch = collate_spg([probe], loader_cfg, dbinfo.classes, n_ch)
    state = trainer.init(jax.random.PRNGKey(0), init_batch)
    variables = convert_state_dict(tmodel.state_dict(), model)
    state = dataclasses.replace(
        state, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
    )

    # conversion cross-check on one trained-model eval batch
    bb = torch_union([probe])
    with torch.no_grad():
        logits_t = run_model(bb, train=False).numpy()
    _, logits_j = trainer.eval_step(state, init_batch)
    n_real = len(bb["targets"])
    err = float(np.abs(np.asarray(logits_j)[:n_real] - logits_t).max())
    res["converted_logits_max_delta"] = err

    eval_args = argparse.Namespace(test_multisamp_n=MULTISAMP)
    _, cm2 = eval_final(
        eval_args, trainer, state, testlist, test_names, root, loader_cfg,
        n_ch, dbinfo,
    )
    res["converted_oacc"] = cm2.get_overall_accuracy()
    res["converted_miou"] = cm2.get_average_intersection_union()
    return res


def main():
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1],
                    help="training seeds; the dataset/partitions are fixed "
                    "so the spread is pure training noise in BOTH stacks")
    args = ap.parse_args()

    t0 = time.time()
    root = tempfile.mkdtemp(prefix="spgt_parity_")
    build_dataset(root)
    print(f"dataset built ({time.time()-t0:.0f}s)", flush=True)

    runs = []
    for seed in args.seeds:
        t1 = time.time()
        flax = flax_arm(root, seed)
        print(f"flax arm s{seed}", flax, f"({time.time()-t1:.0f}s)",
              flush=True)
        t2 = time.time()
        tor = torch_arm(root, seed)
        print(f"torch arm s{seed}", tor, f"({time.time()-t2:.0f}s)",
              flush=True)
        runs.append({"seed": seed, "flax_trained": flax,
                     "torch_trained": tor,
                     "delta_miou_flax_minus_torch": round(
                         100 * (flax["miou"] - tor["miou"]), 2)})

    flax, tor = runs[0]["flax_trained"], runs[0]["torch_trained"]
    out = {
        "flax_trained": flax,
        "torch_trained": tor,
        "delta_miou_flax_minus_torch": runs[0][
            "delta_miou_flax_minus_torch"
        ],
        "runs": runs,
        "miou_flax_per_seed": [round(r["flax_trained"]["miou"], 4)
                               for r in runs],
        "miou_torch_per_seed": [round(r["torch_trained"]["miou"], 4)
                                for r in runs],
        "epochs": EPOCHS, "model_config": MODEL_CONFIG,
        "seconds_total": round(time.time() - t0, 1),
        "root": root,
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "torch_train_parity_results.json",
    ), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

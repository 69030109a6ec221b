"""SSP partition evaluation: ASA / boundary recall / boundary precision.

Behavioral spec: reference supervized_partition/supervized_partition.py:248-375
(per-epoch `evaluate` and final `evaluate_final` writing res.h5 + spg files)
and supervized_partition/evaluate_partition.py:24-86 (cross-fold aggregation).
"""
from __future__ import annotations

import os

import h5py
import numpy as np

from ..graph.spg import compute_sp_graph
from ..learn import metrics
from ..learn.metrics import perfect_prediction
from ..utils.h5io import write_spg
from .losses import SspLossConfig, compute_partition, relax_edge_binary


def evaluate_cloud(
    loss_cfg: SspLossConfig,
    embeddings: np.ndarray,
    diff: np.ndarray,
    batch: dict,
    n_classes: int,
    BR_tolerance: int = 1,
):
    """Per-cloud partition quality. Returns dict with n_clusters, ASA-CM
    update, BR, BP, pred_components, pred_in_component."""
    pred_components, pred_in_component = compute_partition(
        loss_cfg, embeddings, batch["edg_source"], batch["edg_target"], diff,
        batch.get("xyz"),
    )
    es, et = batch["edg_source"], batch["edg_target"]
    is_transition = np.asarray(batch["is_transition"]).astype(bool)
    pred_transition = pred_in_component[es] != pred_in_component[et]
    n_ver = len(pred_in_component)

    labels = np.asarray(batch["labels"])
    out = {
        "n_clusters": len(pred_components),
        "pred_components": pred_components,
        "pred_in_component": pred_in_component,
    }
    if labels.ndim > 1:
        per_pred = perfect_prediction(pred_components, labels)
        cm = metrics.ConfusionMatrix(n_classes)
        cm.count_predicted_batch(labels[:, 1:], per_pred)
        out["cm"] = cm.confusion_matrix
        out["asa"] = 100.0 * np.trace(cm.confusion_matrix) / max(
            cm.confusion_matrix.sum(), 1
        )
    if is_transition.sum() > 0:
        out["br"] = metrics.compute_boundary_recall(
            is_transition,
            relax_edge_binary(pred_transition, es, et, n_ver, BR_tolerance),
        )
    if pred_transition.sum() > 0:
        out["bp"] = metrics.compute_boundary_precision(
            relax_edge_binary(is_transition, es, et, n_ver, BR_tolerance),
            pred_transition,
        )
    out["pred_transition"] = pred_transition
    out["is_transition"] = is_transition
    return out


class FinalEvaluator:
    """Accumulates the res.h5 confusion matrices over test clouds
    (supervized_partition.py:297-375)."""

    def __init__(self, n_classes: int, BR_tolerance: int = 1):
        self.n_classes = n_classes
        self.tol = BR_tolerance
        self.cm_classes = metrics.ConfusionMatrix(n_classes)
        self.cm_br = metrics.ConfusionMatrix(2)
        self.cm_bp = metrics.ConfusionMatrix(2)
        self.n_clusters = []

    def add_cloud(self, loss_cfg, embeddings, diff, batch, spg_out_path=None,
                  d_se_max: float = 100.0):
        res = evaluate_cloud(
            loss_cfg, embeddings, diff, batch, self.n_classes, self.tol
        )
        labels = np.asarray(batch["labels"])
        es, et = batch["edg_source"], batch["edg_target"]
        n_ver = len(res["pred_in_component"])
        if labels.ndim > 1:
            self.cm_classes.confusion_matrix += res["cm"]
            self.cm_br.count_predicted_batch_hard(
                res["is_transition"].astype(np.uint8),
                relax_edge_binary(res["pred_transition"], es, et, n_ver, self.tol)
                .astype(np.uint8),
            )
            self.cm_bp.count_predicted_batch_hard(
                relax_edge_binary(res["is_transition"], es, et, n_ver, self.tol)
                .astype(np.uint8),
                res["pred_transition"].astype(np.uint8),
            )
        self.n_clusters.append(res["n_clusters"])

        if spg_out_path is not None:
            graph_sp = compute_sp_graph(
                batch["xyz"], d_se_max, res["pred_in_component"],
                res["pred_components"], labels, self.n_classes,
            )
            os.makedirs(os.path.dirname(spg_out_path), exist_ok=True)
            write_spg(spg_out_path, graph_sp, res["pred_components"],
                      res["pred_in_component"])
        return res

    def write_res(self, path: str):
        with h5py.File(path, "w") as f:
            f.create_dataset(
                "confusion_matrix_classes",
                data=self.cm_classes.confusion_matrix, dtype="uint64",
            )
            f.create_dataset(
                "confusion_matrix_BR", data=self.cm_br.confusion_matrix,
                dtype="uint64",
            )
            f.create_dataset(
                "confusion_matrix_BP", data=self.cm_bp.confusion_matrix,
                dtype="uint64",
            )
            f.create_dataset(
                "n_clusters", data=float(np.mean(self.n_clusters or [0])),
                dtype="uint64",
            )


def aggregate_results(res_files: list[str]):
    """Cross-fold aggregation (evaluate_partition.py:24-86): sums the res.h5
    confusion matrices, returns {n_sp, ASA, BR, BP}."""
    cm_c = cm_br = cm_bp = None
    n_sp = []
    for path in res_files:
        with h5py.File(path, "r") as f:
            c = f["confusion_matrix_classes"][:].astype(np.float64)
            br = f["confusion_matrix_BR"][:].astype(np.float64)
            bp = f["confusion_matrix_BP"][:].astype(np.float64)
            n_sp.append(float(np.asarray(f["n_clusters"])))
        cm_c = c if cm_c is None else cm_c + c
        cm_br = br if cm_br is None else cm_br + br
        cm_bp = bp if cm_bp is None else cm_bp + bp
    asa = 100.0 * np.trace(cm_c) / max(cm_c.sum(), 1)
    recall = 100.0 * cm_br[1, 1] / max(cm_br[1, :].sum(), 1)
    precision = 100.0 * cm_bp[1, 1] / max(cm_bp[:, 1].sum(), 1)
    return {
        "n_sp": float(np.mean(n_sp)),
        "ASA": asa,
        "BR": recall,
        "BP": precision,
    }


class FolderHierarchy:
    """Output tree helper (reference folderhierarchy.py:7-51)."""

    MODEL_FILE = "model.ckpt"

    def __init__(self, output_dir: str, dataset_name: str, root_dir: str,
                 cv_fold: int):
        self.outputdir = os.path.join(output_dir, f"cv{cv_fold}" if cv_fold else "")
        self.root = root_dir
        self.spg_folder = os.path.join(root_dir, "superpoint_graphs")
        self.emb_folder = os.path.join(root_dir, "embeddings")
        self.scalars = os.path.join(root_dir, "scalars")
        for d in (self.outputdir, self.spg_folder, self.emb_folder, self.scalars):
            os.makedirs(d, exist_ok=True)
        self.model_path = os.path.join(self.outputdir, self.MODEL_FILE)

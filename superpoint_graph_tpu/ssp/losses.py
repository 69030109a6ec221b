"""Graph-structured contrastive losses for learned partitions.

Behavioral spec from reference supervized_partition/losses.py:
  * compute_dist (31-42): per-edge embedding distances — euclidian (squared
    L2), intrinsic (normalized arccos of the dot product), scalar (dot - 1).
  * compute_loss (44-64): intra-edge fidelity tv (sqrt) / laplacian (square) /
    TVH (pseudo-Huber, delta=0.2) + inter-edge push: zhang hinge
    max(0, -lam*x + lam*beta) with beta=1 (euclidian) or pi/3 (intrinsic), or
    TVminus.
  * compute_partition (67-89): cut pursuit on [embeddings | spatial_emb*xyz]
    with edge weights from edge_weight_threshold (>0: clamp large-diff edges
    to the threshold; <0: exp(diff*t)/exp(t)); reg = reg_strength/(4*k_nn_adj).
  * weighting (91-166): none / proportional / SEAL (per-component impurity) /
    crosspartition (components of GT-AND-predicted partition; per-superedge
    weight min(|C1|,|C2|)/|sedge| * factor).
  * relax_edge_binary (175-186): dilate transition masks for BR/BP tolerance.

Loss math is JAX (differentiable, jit-able); the in-train-step partition and
component bookkeeping run on host numpy around the jitted step, exactly where
the reference crosses into C++ (SURVEY.md §7.3 item 4).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.components import connected_components
from ..ops.cutpursuit import cutpursuit as cutpursuit_exact
from ..ops.cutpursuit_band import cutpursuit_band


@dataclasses.dataclass
class SspLossConfig:
    loss: str = "TVH_zhang"
    dist_type: str = "euclidian"
    loss_weight: str = "crosspartition"
    transition_factor: float = 5.0
    edge_weight_threshold: float = -0.5
    spatial_emb: float = 0.2
    reg_strength: float = 0.8
    k_nn_adj: int = 5
    CP_cutoff: int = 25
    cp_backend: str = "exact"  # in-loop partition; 'exact' | 'tpu'


def zhang(x, lam, dist_type: str):
    beta = 1.0471975512 if dist_type == "intrinsic" else 1.0
    return jnp.clip(-lam * x + lam * beta, 0.0, None)


def compute_dist(embeddings, edg_source, edg_target, dist_type: str):
    es = embeddings[edg_source]
    et = embeddings[edg_target]
    if dist_type == "euclidian":
        return jnp.sum((es - et) ** 2, axis=1)
    if dist_type == "intrinsic":
        smoothness = 0.999
        dot = jnp.sum(es * et, axis=1) * smoothness
        return (
            (jnp.arccos(dot) - np.arccos(smoothness))
            / (np.arccos(-smoothness) - np.arccos(smoothness))
            * np.pi
        )
    if dist_type == "scalar":
        return jnp.sum(es * et, axis=1) - 1.0
    raise ValueError(f"unknown dist_type {dist_type!r}")


def compute_loss(cfg: SspLossConfig, diff, is_transition, weights_loss):
    """Returns (intra_loss, inter_loss) like losses.py:44-64; masked instead
    of boolean-indexed so the computation jits with static shapes."""
    intra = (is_transition == 0).astype(diff.dtype)
    inter = (is_transition == 1).astype(diff.dtype)
    w_intra = weights_loss * intra
    w_inter = weights_loss * inter

    if "TVH" in cfg.loss:
        delta = 0.2
        loss1 = delta * jnp.sum(
            w_intra * (jnp.sqrt(1.0 + diff / delta**2) - 1.0)
        )
    elif "tv" in cfg.loss:
        loss1 = jnp.sum(w_intra * jnp.sqrt(diff + 1e-10))
    elif "laplacian" in cfg.loss:
        loss1 = jnp.sum(w_intra * diff)
    else:
        raise ValueError(f"unknown intra loss in {cfg.loss!r}")

    if "zhang" in cfg.loss:
        loss2 = jnp.sum(
            inter * zhang(jnp.sqrt(diff + 1e-10), w_inter, cfg.dist_type)
        )
    elif "TVminus" in cfg.loss:
        loss2 = jnp.sum(w_inter * jnp.sqrt(diff + 1e-10))
    else:
        raise ValueError(f"unknown inter loss in {cfg.loss!r}")
    return loss1, loss2


def compute_partition(cfg: SspLossConfig, embeddings, edg_source, edg_target,
                      diff, xyz=None):
    """Cut pursuit on learned embeddings (losses.py:67-89). Host call."""
    embeddings = np.asarray(embeddings)
    diff = np.asarray(diff)
    edge_weight = np.ones(len(edg_source), np.float32)
    if cfg.edge_weight_threshold > 0:
        edge_weight[diff > 1] = cfg.edge_weight_threshold
    elif cfg.edge_weight_threshold < 0:
        edge_weight = (
            np.exp(diff * cfg.edge_weight_threshold)
            / np.exp(cfg.edge_weight_threshold)
        ).astype(np.float32)

    ver_value = embeddings.astype(np.float32)
    use_spatial = False
    if cfg.spatial_emb > 0 and xyz is not None:
        ver_value = np.hstack(
            [ver_value, (cfg.spatial_emb * np.asarray(xyz)).astype(np.float32)]
        )
        use_spatial = True

    kw = {}
    if cfg.cp_backend != "exact":
        # band solver (the TPU fast path): Morton-sort by spatial position
        # when available so the kNN graph is block-banded. Deliberately
        # keeps the GLOBAL accept default (not the chunked paths' region
        # accept): the region-accept fix targets at-scale chunked
        # under-segmentation, while these in-loop solves are <=10k vertices
        # where global accept already matches the exact backend's training
        # curves point-for-point (tools/ssp_quality_exact_results.json vs
        # ssp_quality_results.json) and costs one fewer executable family.
        solver = cutpursuit_band
        kw["xyz"] = np.asarray(xyz, np.float32) if xyz is not None else None
    else:
        solver = cutpursuit_exact
        kw["spatial"] = use_spatial
    return solver(
        ver_value,
        np.asarray(edg_source, np.int64),
        np.asarray(edg_target, np.int64),
        edge_weight,
        cfg.reg_strength / (4 * cfg.k_nn_adj),
        cutoff=cfg.CP_cutoff,
        weight_decay=0.7,
        **kw,
    )


def _mode_freq(array):
    _, counts = np.unique(array, return_counts=True)
    return counts.max()


def compute_weights_SEAL(pred_components, pred_in_component, objects,
                         edg_source, edg_target, is_transition,
                         transition_factor):
    """Per-component impurity weighting (losses.py:119-128)."""
    w = np.ones(len(edg_source), np.float32)
    per_comp = np.array(
        [len(c) - _mode_freq(objects[np.asarray(c, np.int64)]) for c in pred_components],
        dtype=np.float32,
    )
    tr = np.flatnonzero(is_transition)
    w[tr] += (
        np.maximum(
            per_comp[pred_in_component[edg_source[tr]]],
            per_comp[pred_in_component[edg_target[tr]]],
        )
        * transition_factor
    )
    return w


def compute_weights_XPART(pred_components, pred_in_component, objects,
                          edg_source, edg_target, is_transition,
                          transition_factor):
    """Cross-partition weighting (losses.py:130-166): components of the
    intersection graph (edges neither GT- nor predicted-transition), then each
    transition superedge between intersection-components (C1, C2) gets
    +min(|C1|,|C2|)/|sedge| * factor. The reference's per-superedge python
    loop with full-array scans is replaced by sorted-key segment arithmetic."""
    n = len(pred_in_component)
    pred_transition = (
        pred_in_component[edg_source] != pred_in_component[edg_target]
    )
    keep = (np.asarray(is_transition) + pred_transition) == 0
    comps_x, in_comp_x = connected_components(
        n, edg_source, edg_target, keep, 0
    )
    sizes = np.bincount(in_comp_x)
    w = np.ones(len(edg_source), np.float32)

    tr = np.flatnonzero(is_transition)
    if len(tr) == 0:
        return w
    c1 = in_comp_x[edg_source[tr]].astype(np.int64)
    c2 = in_comp_x[edg_target[tr]].astype(np.int64)
    lo = np.minimum(c1, c2)
    hi = np.maximum(c1, c2)
    n_compx = len(comps_x)
    key = lo * n_compx + hi
    uniq, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    min_size = np.minimum(sizes[uniq // n_compx], sizes[uniq % n_compx])
    per_edge_weight = min_size[inv] / cnt[inv] * transition_factor
    w[tr] += per_edge_weight.astype(np.float32)
    return w


def compute_weight_loss(cfg: SspLossConfig, embeddings, objects, edg_source,
                        edg_target, is_transition, diff, return_partition,
                        xyz=None):
    """losses.py:91-117 orchestration (host): weights + optional partition."""
    need_partition = (
        cfg.loss_weight in ("seal", "crosspartition") or return_partition
    )
    pred_components = pred_in_component = None
    if need_partition:
        pred_components, pred_in_component = compute_partition(
            cfg, embeddings, edg_source, edg_target, diff, xyz
        )

    is_tr = np.asarray(is_transition)
    if cfg.loss_weight == "none":
        w = np.ones(len(edg_target), np.float32)
    elif cfg.loss_weight == "proportional":
        w = np.ones(len(edg_target), np.float32) * (
            float(len(is_tr)) / max((1 - is_tr).sum(), 1)
        )
        w[is_tr.nonzero()] = (
            float(len(is_tr)) / max(float(is_tr.sum()), 1.0)
            * cfg.transition_factor
        )
    elif cfg.loss_weight == "seal":
        w = compute_weights_SEAL(
            pred_components, pred_in_component, np.asarray(objects),
            edg_source, edg_target, is_tr, cfg.transition_factor,
        )
    elif cfg.loss_weight == "crosspartition":
        w = compute_weights_XPART(
            pred_components, pred_in_component, np.asarray(objects),
            edg_source, edg_target, is_tr,
            cfg.transition_factor * 2 * cfg.k_nn_adj,
        )
    else:
        raise ValueError(f"unknown loss_weight {cfg.loss_weight!r}")

    if return_partition:
        return w, pred_components, pred_in_component
    return w


def relax_edge_binary(edg_binary, edg_source, edg_target, n_ver, tolerance):
    """Dilate a transition-edge mask `tolerance` hops (losses.py:175-186)."""
    relaxed = np.asarray(edg_binary).copy().astype(bool)
    vertex = np.zeros(n_ver, bool)
    for _ in range(tolerance):
        vertex[edg_source[relaxed]] = True
        vertex[edg_target[relaxed]] = True
        relaxed |= vertex[edg_source] | vertex[edg_target]
    return relaxed

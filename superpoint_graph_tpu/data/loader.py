"""SPG batch loading: training-time graph subsampling, superpoint cloud
sampling, augmentation, and padded collation into static-shape SpgBatch unions.

Behavioral spec from reference learning/spg.py:
  * loader (130-171): at train time permute vertices, sample
    `spg_augm_nneigh` random neighborhoods of order `spg_augm_order`, then keep
    at most `spg_augm_hardcutoff` superpoints counting only those >= ptn_minpts.
  * load_superpoint (198-236): skip clouds < ptn_minpts; sample/duplicate to
    exactly ptn_npts points (test-time sampling seeded RandomState(id+offset));
    normalize xyz to the unit ball keeping the diameter as a global feature;
    select channels via the pc_attribs character DSL from the 15-column parsed
    rows [xyz rgb e lpsv XYZn d].
  * augment_cloud (239-258): z-rotation, uniform scale, xy mirror, Gaussian
    jitter sigma .01 clip .05.
  * eccpc_collate (178-193) + GraphConvInfo.set_batch: concatenate graphs into
    one disconnected union. Here the union is additionally PADDED to bucketed
    capacities so every batch shape hits a cached XLA executable.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import h5py
import numpy as np

from ..models.spgmodel import SpgBatch

# column layout of parsed superpoint rows (s3dis_dataset.py:151-158)
COL_XYZ = slice(0, 3)
COL_RGB = slice(3, 6)
COL_E = 6
COL_LPSV = slice(7, 11)
COL_XYZN = slice(11, 14)
COL_D = 14


@dataclasses.dataclass
class LoaderConfig:
    ptn_npts: int = 128
    ptn_minpts: int = 40
    pc_attribs: str = "xyzrgbelpsvXYZ"
    pc_xyznormalize: bool = True
    pc_augm_scale: float = 0.0
    pc_augm_rot: bool = True
    pc_augm_mirror_prob: float = 0.0
    pc_augm_jitter: bool = True
    spg_augm_nneigh: int = 100
    spg_augm_order: int = 3
    spg_augm_hardcutoff: int = 512
    # padded capacities; batches are bucketed to multiples of these
    n_sp_bucket: int = 128
    n_edge_bucket: int = 512
    # unique-edge-feature rows bucket (edge-feature compaction); 0 disables
    n_uniq_bucket: int = 256


def pc_attrib_dims(pc_attribs: str) -> int:
    dims = 0
    if "xyz" in pc_attribs:
        dims += 3
    if "rgb" in pc_attribs:
        dims += 3
    if "e" in pc_attribs.replace("rgb", "").replace("lpsv", ""):
        dims += 1
    if "lpsv" in pc_attribs:
        dims += 4
    if "XYZ" in pc_attribs:
        dims += 3
    if "d" in pc_attribs:
        dims += 1
    return dims


def select_channels(P: np.ndarray, pc_attribs: str) -> np.ndarray:
    cols = []
    if "xyz" in pc_attribs:
        cols.append(P[:, COL_XYZ])
    if "rgb" in pc_attribs:
        cols.append(P[:, COL_RGB])
    if "e" in pc_attribs.replace("rgb", "").replace("lpsv", ""):
        cols.append(P[:, COL_E, None])
    if "lpsv" in pc_attribs:
        cols.append(P[:, COL_LPSV])
    if "XYZ" in pc_attribs:
        cols.append(P[:, COL_XYZN])
    if "d" in pc_attribs:
        cols.append(P[:, COL_D, None])
    return np.concatenate(cols, axis=1)


def augment_cloud(P: np.ndarray, cfg: LoaderConfig, rs: np.random.RandomState):
    """z-rotation / scaling / mirror on xyz + jitter on everything
    (spg.py:239-258)."""
    M = np.eye(3)
    if cfg.pc_augm_scale > 1:
        s = rs.uniform(1.0 / cfg.pc_augm_scale, cfg.pc_augm_scale)
        M = s * M
    if cfg.pc_augm_rot:
        a = rs.uniform(0, 2 * math.pi)
        c, s = math.cos(a), math.sin(a)
        M = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]) @ M
    if cfg.pc_augm_mirror_prob > 0:
        if rs.rand() < cfg.pc_augm_mirror_prob / 2:
            M = np.diag([-1.0, 1, 1]) @ M
        if rs.rand() < cfg.pc_augm_mirror_prob / 2:
            M = np.diag([1.0, -1, 1]) @ M
    P = P.copy()
    P[:, :3] = P[:, :3] @ M.T
    if cfg.pc_augm_jitter:
        sigma, clip = 0.01, 0.05
        P = P + np.clip(sigma * rs.randn(*P.shape), -clip, clip).astype(np.float32)
    return P.astype(np.float32)


def load_superpoint(
    parsed_file: h5py.File,
    sp_id: int,
    cfg: LoaderConfig,
    train: bool,
    test_seed_offset: int = 0,
    rs: np.random.RandomState | None = None,
):
    """Sample one superpoint's point set to exactly ptn_npts rows
    (spg.py:198-236). Returns (P [npts, C], diameter) or (None, n)."""
    P = parsed_file[str(sp_id)]
    n = P.shape[0]
    if n < cfg.ptn_minpts:
        return None, n
    P = P[:].astype(np.float32)
    if rs is None or not train:
        rs = np.random.RandomState(seed=sp_id + test_seed_offset)
    if n > cfg.ptn_npts:
        P = P[rs.choice(n, cfg.ptn_npts), :]
    elif n < cfg.ptn_npts:
        P = np.concatenate([P, P[rs.choice(n, cfg.ptn_npts - n), :]], 0)

    if cfg.pc_xyznormalize:
        diameter = float(np.max(np.max(P[:, :3], 0) - np.min(P[:, :3], 0)))
        P[:, :3] = (P[:, :3] - P[:, :3].mean(0, keepdims=True)) / (diameter + 1e-10)
    else:
        diameter = 0.0
        P[:, :3] = P[:, :3] - P[:, :3].mean(0, keepdims=True)

    if cfg.pc_attribs:
        P = select_channels(P, cfg.pc_attribs)
    if train:
        P = augment_cloud(P, cfg, rs)
    return P, np.float32(diameter)


# ---------------------------------------------------------------------------
# SPG subgraph augmentation (spg.py:114-143) without igraph: plain CSR BFS.
# ---------------------------------------------------------------------------


def _adjacency(n, edges):
    import scipy.sparse as sp

    if len(edges) == 0:
        return sp.csr_matrix((n, n))
    data = np.ones(len(edges) * 2)
    rows = np.concatenate([edges[:, 0], edges[:, 1]])
    cols = np.concatenate([edges[:, 1], edges[:, 0]])
    return sp.csr_matrix((data, (rows, cols)), shape=(n, n))


def random_neighborhoods(n, edges, num, order, rs):
    """Vertex subset = union of `num` BFS balls of radius `order`
    (spg.py:114-121)."""
    adj = _adjacency(n, edges)
    centers = rs.choice(n, size=min(num, n), replace=False)
    frontier = np.zeros(n, bool)
    frontier[centers] = True
    reach = frontier.copy()
    for _ in range(order):
        frontier = (adj @ frontier) > 0
        reach |= frontier
    return np.flatnonzero(reach)


def induced_subgraph(subset, node_arrays, edges, edge_arrays):
    """Induce the graph on `subset` (sorted), remapping edge endpoints."""
    remap = -np.ones(int(max(np.max(subset), 0)) + 1 if len(subset) else 1, np.int64)
    remap[subset] = np.arange(len(subset))
    if len(edges):
        keep = np.isin(edges[:, 0], subset) & np.isin(edges[:, 1], subset)
        new_edges = remap[edges[keep]]
        new_edge_arrays = [a[keep] for a in edge_arrays]
    else:
        new_edges = edges
        new_edge_arrays = edge_arrays
    new_node_arrays = [a[subset] for a in node_arrays]
    return new_node_arrays, new_edges, new_edge_arrays


def spg_subsample(node_gt, node_gt_size, edges, edge_feats, cfg: LoaderConfig,
                  ptn_minpts: int, rs: np.random.RandomState):
    """Training-time SPG augmentation pipeline (spg.py:132-143):
    permute -> random neighborhoods -> k_big_enough hard cutoff."""
    n = node_gt.shape[0]
    ids = np.arange(n)

    if 0 < cfg.spg_augm_hardcutoff < n:
        perm = rs.permutation(n)
        (node_gt, node_gt_size, ids), edges, (edge_feats,) = induced_subgraph(
            perm, [node_gt, node_gt_size, ids], edges, [edge_feats]
        )
        n = len(perm)

    if 0 < cfg.spg_augm_nneigh < n:
        subset = random_neighborhoods(n, edges, cfg.spg_augm_nneigh,
                                      cfg.spg_augm_order, rs)
        (node_gt, node_gt_size, ids), edges, (edge_feats,) = induced_subgraph(
            subset, [node_gt, node_gt_size, ids], edges, [edge_feats]
        )
        n = len(subset)

    if 0 < cfg.spg_augm_hardcutoff < n:
        valid = node_gt_size.sum(1) >= ptn_minpts
        below = np.flatnonzero(np.cumsum(valid) <= cfg.spg_augm_hardcutoff)
        k = (below[-1] + 1) if len(below) else n
        subset = np.arange(k)
        (node_gt, node_gt_size, ids), edges, (edge_feats,) = induced_subgraph(
            subset, [node_gt, node_gt_size, ids], edges, [edge_feats]
        )
    return node_gt, node_gt_size, edges, edge_feats, ids


# ---------------------------------------------------------------------------
# Collation into a padded SpgBatch union
# ---------------------------------------------------------------------------


def _bucket(n, b):
    return max(b, int(math.ceil(n / b)) * b)


def collate_spg(samples: Sequence[dict], cfg: LoaderConfig, n_classes: int,
                n_ch: int) -> SpgBatch:
    """Concatenate per-cloud samples (dicts with node_gt, node_gt_size, edges,
    edge_feats, clouds, clouds_global, cloud_flag) into one padded union."""
    import jax.numpy as jnp

    n_sp = sum(s["node_gt"].shape[0] for s in samples)
    n_ed = sum(len(s["edges"]) for s in samples)
    cap_sp = _bucket(n_sp, cfg.n_sp_bucket)
    cap_ed = _bucket(max(n_ed, 1), cfg.n_edge_bucket)

    clouds = np.zeros((cap_sp, cfg.ptn_npts, n_ch), np.float32)
    glob = np.zeros((cap_sp, 1), np.float32)
    cloud_mask = np.zeros(cap_sp, bool)
    node_mask = np.zeros(cap_sp, bool)
    targets = np.full(cap_sp, -100, np.int32)
    tsize = np.zeros((cap_sp, n_classes + 1), np.int32)
    src = np.zeros(cap_ed, np.int32)
    tgt = np.zeros(cap_ed, np.int32)
    efeat_dim = samples[0]["edge_feats"].shape[1] if samples else 0
    efeats = np.zeros((cap_ed, efeat_dim), np.float32)
    emask = np.zeros(cap_ed, bool)

    sp_off = 0
    ed_off = 0
    for s in samples:
        k = s["node_gt"].shape[0]
        clouds[sp_off : sp_off + k] = s["clouds"]
        glob[sp_off : sp_off + k, 0] = s["clouds_global"]
        cloud_mask[sp_off : sp_off + k] = s["cloud_flag"] == 0
        node_mask[sp_off : sp_off + k] = True
        targets[sp_off : sp_off + k] = s["node_gt"].ravel()
        tsize[sp_off : sp_off + k, : s["node_gt_size"].shape[1]] = s["node_gt_size"]
        e = len(s["edges"])
        if e:
            src[ed_off : ed_off + e] = s["edges"][:, 0] + sp_off
            tgt[ed_off : ed_off + e] = s["edges"][:, 1] + sp_off
            efeats[ed_off : ed_off + e] = s["edge_feats"]
            emask[ed_off : ed_off + e] = True
        sp_off += k
        ed_off += e

    # edge-feature compaction (reference ecc/utils.py:44-48): the fnet runs
    # once per unique feature row; padding edges map to row 0. The unique
    # matrix gets its own bucket so shapes stay cacheable. When duplicates
    # don't pay for the extra gather (n_uniq ~ n_edges), compaction is
    # skipped for that batch.
    uniq = idx = uniq_mask = None
    if cfg.n_uniq_bucket > 0 and n_ed:
        uniq_rows, inv = np.unique(
            efeats[:n_ed], axis=0, return_inverse=True
        )
        cap_eu = _bucket(len(uniq_rows), cfg.n_uniq_bucket)
        if cap_eu < cap_ed:
            uniq = np.zeros((cap_eu, efeat_dim), np.float32)
            uniq[: len(uniq_rows)] = uniq_rows
            idx = np.zeros(cap_ed, np.int32)
            idx[:n_ed] = inv
            uniq_mask = np.zeros(cap_eu, bool)
            uniq_mask[: len(uniq_rows)] = True

    return SpgBatch(
        clouds=jnp.asarray(clouds),
        clouds_global=jnp.asarray(glob),
        cloud_mask=jnp.asarray(cloud_mask),
        node_mask=jnp.asarray(node_mask),
        targets=jnp.asarray(targets),
        target_size=jnp.asarray(tsize),
        src=jnp.asarray(src),
        tgt=jnp.asarray(tgt),
        edge_feats=jnp.asarray(efeats),
        edge_mask=jnp.asarray(emask),
        edge_feat_uniq=None if uniq is None else jnp.asarray(uniq),
        edge_feat_idx=None if idx is None else jnp.asarray(idx),
        edge_uniq_mask=None if uniq_mask is None else jnp.asarray(uniq_mask),
    )


def load_spg_sample(
    spg_entry,
    parsed_path: str,
    cfg: LoaderConfig,
    train: bool,
    test_seed_offset: int = 0,
    rs: np.random.RandomState | None = None,
) -> dict | None:
    """Full per-cloud sample: SPG subsample + superpoint cloud loading
    (spg.py loader, 130-171). spg_entry = (node_gt, node_gt_size, edges,
    edge_feats, name)."""
    node_gt, node_gt_size, edges, edge_feats, name = spg_entry
    rs = rs or np.random.RandomState()
    if train:
        node_gt, node_gt_size, edges, edge_feats, ids = spg_subsample(
            node_gt, node_gt_size, edges, edge_feats, cfg, cfg.ptn_minpts, rs
        )
    else:
        ids = np.arange(node_gt.shape[0])
    if len(edges) == 0:
        return None

    n_ch = pc_attrib_dims(cfg.pc_attribs)
    k = node_gt.shape[0]
    clouds = np.zeros((k, cfg.ptn_npts, n_ch), np.float32)
    globs = np.zeros(k, np.float32)
    flags = np.zeros(k, np.int32)
    with h5py.File(parsed_path, "r") as f:
        for i, sp in enumerate(ids):
            P, diam = load_superpoint(f, int(sp), cfg, train, test_seed_offset, rs)
            if P is None:
                flags[i] = -1
            else:
                clouds[i] = P
                globs[i] = diam
    return {
        "node_gt": node_gt,
        "node_gt_size": node_gt_size,
        "edges": edges,
        "edge_feats": edge_feats,
        "clouds": clouds,
        "clouds_global": globs,
        "cloud_flag": flags,
        "name": name,
    }

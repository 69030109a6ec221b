"""Superpoint-graph construction: superpoint stats + superedge features.

Behavioral spec from reference partition/graphs.py:75-210 (`compute_sp_graph`):
Delaunay tetrahedra whose endpoints lie in different components become
superedge support edges (all 6 pairs, both directions, uniqued, optional d_max
length filter); edges are grouped by (source component, target component) into
superedges. Superpoint features come from the eigenvalues of the covariance of
the component's *deduplicated* points: length = lam1, surface = sqrt(lam1*lam2),
volume = sqrt(lam1*lam2*lam3); superedge features are offset mean/std/norm,
centroid delta and shape/size ratios.

Where the reference runs two Python loops over components and superedges
(SURVEY.md hot loop #4), this builder is fully vectorized segment reduction —
one `np.add.at`/bincount pass per statistic, with the batched analytic
eigensolver (ops/eigen3) for all component covariances at once. Adjacency is
pluggable: 'delaunay' (scipy, host — matches reference) or 'knn'
(device-friendly approximation: cross-component kNN edges; documented
divergence behind a flag, SURVEY.md 7.2 step 3).
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import Delaunay

import jax.numpy as jnp



def _delaunay_cross_edges(xyz: np.ndarray, in_component: np.ndarray) -> np.ndarray:
    """All directed Delaunay edges whose endpoints are in different components.

    Returns [2, E] int array, unique columns (graphs.py:82-109 semantics)."""
    tri = Delaunay(xyz)
    tets = tri.simplices
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    cols = []
    for a, b in pairs:
        u, v = tets[:, a], tets[:, b]
        m = in_component[u] != in_component[v]
        cols.append(np.stack([u[m], v[m]]))
        cols.append(np.stack([v[m], u[m]]))
    edges = np.concatenate(cols, axis=1)
    return np.unique(edges, axis=1)


def _knn_cross_edges(
    xyz: np.ndarray, in_component: np.ndarray, k: int = 10
) -> np.ndarray:
    """Device-friendly adjacency: kNN edges crossing components (both
    directions, unique). Superedge support is sparser than Delaunay but covers
    the same component adjacencies on dense clouds."""
    from ..ops.knn import knn

    idx, _ = knn(jnp.asarray(xyz, jnp.float32), k)
    idx = np.asarray(idx)
    src = np.repeat(np.arange(len(xyz)), k)
    tgt = idx.reshape(-1)
    m = in_component[src] != in_component[tgt]
    edges = np.concatenate(
        [np.stack([src[m], tgt[m]]), np.stack([tgt[m], src[m]])], axis=1
    )
    return np.unique(edges, axis=1)


def _component_stats(xyz, in_component, n_com):
    """Per-component centroid/length/surface/volume from deduplicated points.

    The reference dedupes each component's coordinates before stats
    (graphs.py:158: np.unique(xyz[comp], axis=0)) and uses np.cov's ddof=1
    normalization; replicated here with one global lexsort instead of a
    per-component loop.
    """
    n = len(xyz)
    keys = np.concatenate([in_component[:, None].astype(np.float64), xyz.astype(np.float64)], 1)
    order = np.lexsort(keys.T[::-1])
    sk = keys[order]
    head = np.ones(n, bool)
    head[1:] = np.any(sk[1:] != sk[:-1], axis=1)
    uniq_idx = order[head]
    ux = xyz[uniq_idx].astype(np.float64)
    uc = in_component[uniq_idx]

    cnt = np.bincount(uc, minlength=n_com).astype(np.float64)
    cent = np.zeros((n_com, 3))
    np.add.at(cent, uc, ux)
    cent /= np.maximum(cnt, 1)[:, None]

    d = ux - cent[uc]
    outer = d[:, :, None] * d[:, None, :]
    cov = np.zeros((n_com, 3, 3))
    np.add.at(cov, uc, outer)
    cov /= np.maximum(cnt - 1, 1)[:, None, None]  # ddof=1 like np.cov

    # host LAPACK: n_com is small (hundreds) and the shape changes per cloud —
    # an eager device eigendecomposition would recompile its op chain per
    # distinct n_com (tens of seconds over a tunneled chip)
    lams = np.linalg.eigvalsh(cov)[:, ::-1]
    lams = np.maximum(lams, 0.0)

    length = lams[:, 0]
    surface = np.sqrt(lams[:, 0] * lams[:, 1] + 1e-10)
    volume = np.sqrt(lams[:, 0] * lams[:, 1] * lams[:, 2] + 1e-10)
    # degenerate sizes (graphs.py:160-173): 1 point -> all zero;
    # 2 points -> length = sqrt(sum var) with ddof=0, surface=volume=0
    one = cnt <= 1
    two = cnt == 2
    if two.any():
        var = np.zeros((n_com, 3))
        np.add.at(var, uc, d * d)
        var /= np.maximum(cnt, 1)[:, None]
        length = np.where(two, np.sqrt(var.sum(1)), length)
    length = np.where(one, 0.0, length)
    surface = np.where(one | two, 0.0, surface)
    volume = np.where(one | two, 0.0, volume)
    return cent.astype(np.float32), length, surface, volume


def compute_sp_graph(
    xyz: np.ndarray,
    d_max: float,
    in_component: np.ndarray,
    components,
    labels,
    n_labels: int,
    adjacency: str = "delaunay",
    knn_edges=None,
):
    """Build the superpoint graph dict (same keys/shapes/dtypes as the
    reference's graphs.py:75-210 so provider-h5 interop holds).

    `knn_edges=(source, target)` reuses an existing adjacency graph (e.g. the
    partition's kNN edges) as superedge support instead of re-searching —
    saves a full kNN pass in the fused pipeline."""
    xyz = np.asarray(xyz, np.float32)
    in_component = np.asarray(in_component).astype(np.int64)
    n_com = int(in_component.max()) + 1
    has_labels = labels is not None and np.size(labels) > 1
    label_hist = has_labels and np.ndim(labels) > 1 and np.shape(labels)[1] > 1

    if knn_edges is not None:
        src = np.asarray(knn_edges[0], np.int64)
        tgt = np.asarray(knn_edges[1], np.int64)
        m = in_component[src] != in_component[tgt]
        edges = np.unique(
            np.concatenate(
                [np.stack([src[m], tgt[m]]), np.stack([tgt[m], src[m]])], axis=1
            ),
            axis=1,
        )
    elif adjacency == "delaunay":
        edges = _delaunay_cross_edges(xyz, in_component)
    elif adjacency == "knn":
        edges = _knn_cross_edges(xyz, in_component)
    else:
        raise ValueError(f"unknown adjacency {adjacency!r}")

    if d_max > 0 and edges.shape[1] > 0:
        dist = np.sqrt(((xyz[edges[0]] - xyz[edges[1]]) ** 2).sum(1))
        edges = edges[:, dist < d_max]

    # group support edges into superedges by (source comp, target comp);
    # int64 keys — an int32 in_component wraps n_com * comp past ~46k comps
    ecomp = in_component[edges].astype(np.int64)
    key = np.int64(n_com) * ecomp[0] + ecomp[1]
    order = np.argsort(key, kind="stable")
    edges = edges[:, order]
    ecomp = ecomp[:, order]
    key = key[order]
    n_edg = edges.shape[1]
    if n_edg > 0:
        head = np.ones(n_edg, bool)
        head[1:] = key[1:] != key[:-1]
        sedge_id = np.cumsum(head) - 1
        n_sedg = int(sedge_id[-1]) + 1
    else:
        sedge_id = np.zeros(0, np.int64)
        n_sedg = 0

    graph = {"is_nn": False}
    cent, length, surface, volume = _component_stats(xyz, in_component, n_com)
    graph["sp_centroids"] = cent
    graph["sp_length"] = length.astype(np.float32)[:, None]
    graph["sp_surface"] = surface.astype(np.float32)[:, None]
    graph["sp_volume"] = volume.astype(np.float32)[:, None]
    counts = np.bincount(in_component, minlength=n_com)
    graph["sp_point_count"] = counts.astype(np.uint64)[:, None]

    if has_labels:
        labels = np.asarray(labels)
        hist = np.zeros((n_com, n_labels + 1), np.int64)
        if label_hist:
            np.add.at(hist, in_component, labels.astype(np.int64))
        else:
            np.add.at(hist, (in_component, labels.astype(np.int64).ravel()), 1)
        graph["sp_labels"] = hist.astype(np.uint32)
    else:
        graph["sp_labels"] = []

    # superedge features via segment reductions over support edges
    com_src = np.zeros(n_sedg, np.int64)
    com_tgt = np.zeros(n_sedg, np.int64)
    if n_edg > 0:
        firsts = np.flatnonzero(head)
        com_src = ecomp[0, firsts]
        com_tgt = ecomp[1, firsts]
    delta = xyz[edges[0]] - xyz[edges[1]]
    cnt_e = np.bincount(sedge_id, minlength=n_sedg).astype(np.float64)
    dmean = np.zeros((n_sedg, 3))
    np.add.at(dmean, sedge_id, delta.astype(np.float64))
    dmean /= np.maximum(cnt_e, 1)[:, None]
    dvar = np.zeros((n_sedg, 3))
    np.add.at(dvar, sedge_id, (delta - dmean[sedge_id]) ** 2)
    dvar /= np.maximum(cnt_e, 1)[:, None]  # np.std is ddof=0 (graphs.py:204)
    dnorm = np.zeros(n_sedg)
    np.add.at(dnorm, sedge_id, np.sqrt((delta.astype(np.float64) ** 2).sum(1)))
    dnorm /= np.maximum(cnt_e, 1)
    single = cnt_e <= 1
    dstd = np.where(single[:, None], 0.0, np.sqrt(dvar))

    graph["source"] = com_src.astype(np.uint32)[:, None]
    graph["target"] = com_tgt.astype(np.uint32)[:, None]
    graph["se_delta_mean"] = dmean.astype(np.float32)
    graph["se_delta_std"] = dstd.astype(np.float32)
    graph["se_delta_norm"] = dnorm.astype(np.float32)[:, None]
    graph["se_delta_centroid"] = (cent[com_src] - cent[com_tgt]).astype(np.float32)
    eps = 1e-6
    graph["se_length_ratio"] = (length[com_src] / (length[com_tgt] + eps)).astype(
        np.float32
    )[:, None]
    graph["se_surface_ratio"] = (surface[com_src] / (surface[com_tgt] + eps)).astype(
        np.float32
    )[:, None]
    graph["se_volume_ratio"] = (volume[com_src] / (volume[com_tgt] + eps)).astype(
        np.float32
    )[:, None]
    graph["se_point_count_ratio"] = (
        counts[com_src] / (counts[com_tgt] + eps)
    ).astype(np.float32)[:, None]
    return graph

"""Device-side superpoint-graph construction for the giant-cloud path.

Same contract as graph.spg.compute_sp_graph (reference
partition/graphs.py:75-210) but every reduction runs on the TPU:

* support-edge dedup + (source comp, target comp) grouping — two
  lexicographic `lax.sort`s (XLA sorts carry payload operands natively)
  instead of host `np.unique(axis=1)` + argsort over tens of millions of
  directed edges;
* superedge stats (delta mean/std/norm, counts) — masked `segment_sum`s;
* per-component stats (dedup, centroid, ddof-1 covariance, analytic
  eigenvalues -> length/surface/volume, label histograms) — one f32 sort +
  segment reductions + the batched closed-form 3x3 eigensolver
  (ops/eigen3.eigvals3x3_cols, column-wise to dodge TPU [N,3,3] tiling).

Host fallback (graph/spg.py) remains for the Delaunay adjacency mode; this
module covers the kNN-adjacency mode used by the fused and giant pipelines.

Shapes are static per (n-bucket, k, segment-cap) so executables are reused
across chunks/clouds; only the final [n_sedg]/[n_com] slices are fetched.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.eigen3 import eigvals3x3_cols


def _cross_mask(idx_adj, in_comp, xyz, *, d_max: float, k: int):
    """Per-directed-edge (both directions) cross-component mask + (u, v)."""
    n = idx_adj.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    src = jnp.repeat(iota, k)
    tgt = idx_adj.reshape(-1).astype(jnp.int32)
    u = jnp.concatenate([src, tgt])
    v = jnp.concatenate([tgt, src])
    ok = in_comp[u] != in_comp[v]
    if d_max > 0:
        # column-wise: an [E, 3] gather is tiled to [E, 128] on TPU (42x the
        # payload — OOMed at 2e6 points / 4e7 edges)
        d2 = sum(
            (xyz[:, a][u] - xyz[:, a][v]) ** 2 for a in range(3)
        )
        ok &= d2 < jnp.float32(d_max) ** 2
    return u, v, ok


@partial(jax.jit, static_argnames=("k", "d_max"))
def _count_cross_edges(idx_adj, in_comp, xyz, *, d_max: float, k: int):
    _, _, ok = _cross_mask(idx_adj, in_comp, xyz, d_max=d_max, k=k)
    return jnp.sum(ok.astype(jnp.int32))


@partial(jax.jit, static_argnames=("k", "d_max", "cap_x"))
def _sort_support_edges(idx_adj, in_comp, xyz, *, d_max: float, k: int,
                        cap_x: int):
    """Both-direction cross-component kNN edges, deduped and grouped.

    Cross-component support edges are typically a few % of the 2nk directed
    edges, so they are cumsum-compacted into a `cap_x` buffer FIRST and a
    single 4-key sort by (source comp, target comp, u, v) runs on the
    compacted list — duplicates of (u, v) share their component pair, so
    they are adjacent in that order and dedup needs no second sort. (Two
    full-width 4e7-row sorts were ~all of the 9.3 s SPG stage at 2e6.)

    Returns (su, sv, cu, cv, valid, head_pair, n_sedg), arrays of length
    cap_x; `valid` marks deduplicated cross-component support edges."""
    n = idx_adj.shape[0]
    u, v, ok = _cross_mask(idx_adj, in_comp, xyz, d_max=d_max, k=k)

    pos = jnp.cumsum(ok.astype(jnp.int32)) - 1
    tgt_pos = jnp.where(ok & (pos < cap_x), pos, cap_x)
    sent = jnp.full(cap_x + 1, n, jnp.int32)
    u_c = sent.at[tgt_pos].set(u)[:cap_x]
    v_c = sent.at[tgt_pos].set(v)[:cap_x]

    big = jnp.int32(2**30)
    cu = jnp.where(u_c < n, in_comp[jnp.minimum(u_c, n - 1)], big)
    cv = in_comp[jnp.minimum(v_c, n - 1)]
    cu_s, cv_s, su_s, sv_s = jax.lax.sort(
        (cu, cv, u_c, v_c), num_keys=4
    )
    alive = cu_s < big
    first = jnp.concatenate(
        [jnp.array([True]), (su_s[1:] != su_s[:-1]) | (sv_s[1:] != sv_s[:-1])]
    )
    valid = alive & first
    head_pair = valid & jnp.concatenate(
        [jnp.array([True]),
         (cu_s[1:] != cu_s[:-1]) | (cv_s[1:] != cv_s[:-1])]
    )
    n_sedg = jnp.sum(head_pair.astype(jnp.int32))
    return su_s, sv_s, cu_s, cv_s, valid, head_pair, n_sedg


@partial(jax.jit, static_argnames=("cap",))
def _superedge_stats(xyz, su, sv, cu, cv, valid, head_pair, *, cap: int):
    """Masked segment reductions over the pair-sorted support edges.

    All edge-length arrays are kept 1-D per coordinate: a single [E, 3]
    delta gather is tiled to [E, 128] on TPU (20 GB at 4e7 edges — the
    r3 OOM). Returns per-coordinate mean/std columns; the host stacks."""
    n = xyz.shape[0]
    seg = jnp.cumsum(head_pair.astype(jnp.int32)) - 1
    seg = jnp.where(valid, jnp.minimum(seg, cap - 1), cap - 1)
    w = valid.astype(jnp.float32)
    cnt = jax.ops.segment_sum(w, seg, num_segments=cap)
    denom = jnp.maximum(cnt, 1.0)
    sui = jnp.minimum(su, n - 1)
    svi = jnp.minimum(sv, n - 1)
    means, stds = [], []
    norm2 = jnp.zeros_like(w)
    for a in range(3):
        col = xyz[:, a]
        da = (col[sui] - col[svi]) * w
        s1 = jax.ops.segment_sum(da, seg, num_segments=cap)
        s2 = jax.ops.segment_sum(da * da, seg, num_segments=cap)
        # E[x^2] - E[x]^2 (ddof=0, np.std parity, graphs.py:204); deltas
        # are voxel-scale so f32 squares are safe
        mean_a = s1 / denom
        var_a = jnp.maximum(s2 / denom - mean_a * mean_a, 0.0)
        means.append(mean_a)
        stds.append(jnp.where(cnt > 1, jnp.sqrt(var_a), 0.0))
        norm2 = norm2 + da * da
    dnorm = (
        jax.ops.segment_sum(jnp.sqrt(norm2), seg, num_segments=cap) / denom
    )
    com_src = jax.ops.segment_max(
        jnp.where(valid, cu, -1), seg, num_segments=cap
    )
    com_tgt = jax.ops.segment_max(
        jnp.where(valid, cv, -1), seg, num_segments=cap
    )
    return com_src, com_tgt, tuple(means), tuple(stds), dnorm, cnt


@partial(jax.jit, static_argnames=("cap",))
def _component_stats_device(xyz, in_comp, *, cap: int):
    """Per-component centroid/length/surface/volume from DEDUPLICATED points
    (graphs.py:158 np.unique(xyz[comp], axis=0), ddof=1 covariance, and the
    1-point / 2-point degenerate rules of graphs.py:160-173)."""
    n = xyz.shape[0]
    c_s, x_s, y_s, z_s = jax.lax.sort(
        (in_comp, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=4
    )
    first = jnp.concatenate(
        [jnp.array([True]),
         (c_s[1:] != c_s[:-1]) | (x_s[1:] != x_s[:-1])
         | (y_s[1:] != y_s[:-1]) | (z_s[1:] != z_s[:-1])]
    )
    w = first.astype(jnp.float32)
    seg = jnp.minimum(c_s, cap - 1)
    cnt = jax.ops.segment_sum(w, seg, num_segments=cap)
    denom = jnp.maximum(cnt, 1.0)
    # column-wise throughout: [n, 3]/[n, 9] intermediates are tiled to
    # [n, 128] on TPU (42x payload); six 1-D covariance columns instead
    cols = (x_s, y_s, z_s)
    cents = [
        jax.ops.segment_sum(c * w, seg, num_segments=cap) / denom
        for c in cols
    ]
    dcols = [(c - cents[a][seg]) * w for a, c in enumerate(cols)]
    ddof = jnp.maximum(cnt - 1.0, 1.0)

    def cov_entry(a, b):
        return jax.ops.segment_sum(
            dcols[a] * dcols[b], seg, num_segments=cap
        ) / ddof

    c00, c11, c22 = cov_entry(0, 0), cov_entry(1, 1), cov_entry(2, 2)
    c01, c02, c12 = cov_entry(0, 1), cov_entry(0, 2), cov_entry(1, 2)
    lam0, lam1, lam2 = eigvals3x3_cols(c00, c11, c22, c01, c02, c12)
    lam0 = jnp.maximum(lam0, 0.0)
    lam1 = jnp.maximum(lam1, 0.0)
    lam2 = jnp.maximum(lam2, 0.0)
    length = lam0
    surface = jnp.sqrt(lam0 * lam1 + 1e-10)
    volume = jnp.sqrt(lam0 * lam1 * lam2 + 1e-10)
    one = cnt <= 1
    two = cnt == 2
    var_tr = sum(
        jax.ops.segment_sum(dc * dc, seg, num_segments=cap) for dc in dcols
    ) / denom
    length = jnp.where(two, jnp.sqrt(var_tr), length)
    length = jnp.where(one, 0.0, length)
    surface = jnp.where(one | two, 0.0, surface)
    volume = jnp.where(one | two, 0.0, volume)
    return tuple(cents), length, surface, volume


@partial(jax.jit, static_argnames=("cap", "n_cols", "is_hist"))
def _label_hist_device(in_comp, labels, *, cap: int, n_cols: int,
                       is_hist: bool):
    if is_hist:
        return jax.ops.segment_sum(
            labels.astype(jnp.int32), in_comp, num_segments=cap
        )
    hist = jnp.zeros((cap, n_cols), jnp.int32)
    return hist.at[in_comp, labels.astype(jnp.int32).ravel()].add(1)


def _pow2(x: int, floor: int = 128) -> int:
    return max(floor, 1 << int(np.ceil(np.log2(max(int(x), 1)))))


def compute_sp_graph_device(
    xyz,
    d_max: float,
    in_component: np.ndarray,
    components,
    labels,
    n_labels: int,
    idx_adj=None,
    knn_edges=None,
):
    """Drop-in for graph.spg.compute_sp_graph(adjacency='knn') with the
    reductions on device.

    `xyz` and `idx_adj` ([n, k] kNN neighbor table) may already live on
    device (the giant pipeline passes its kNN output straight through);
    `knn_edges=(source, target)` is accepted for API parity and reshaped to
    the table form when `idx_adj` is None. `components` is unused (kept for
    signature parity)."""
    del components
    n = len(in_component)
    in_comp_h = np.asarray(in_component).astype(np.int64)
    n_com = int(in_comp_h.max()) + 1
    xyz_d = jnp.asarray(xyz, jnp.float32) if not isinstance(
        xyz, jax.Array
    ) else xyz
    if idx_adj is None:
        src = np.asarray(knn_edges[0], np.int64)
        tgt = np.asarray(knn_edges[1], np.int64)
        k = len(src) // n
        assert len(src) == n * k and (
            src.reshape(n, k) == np.arange(n)[:, None]
        ).all(), "knn_edges must be a dense [n*k] repeat(arange(n), k) list"
        idx_adj = jnp.asarray(tgt.reshape(n, k).astype(np.int32))
    k = int(idx_adj.shape[1])
    in_comp_d = jnp.asarray(in_comp_h.astype(np.int32))

    # bucket n (2^20 granularity above 1M, pow2 below) so every kernel here
    # is keyed on the bucket, not the exact cloud size — each new giant
    # cloud size otherwise pays a full recompile of the 4e7-row kernels
    # (~200 s cold at 1e7). Pad rows: self-edges (same fake component
    # n_com, dropped by the cross-component test), far coords, and the fake
    # component id — sliced away by every [:n_com]/[:n_sedg] fetch.
    gran = 1 << 20
    n_pad = (
        -(-n // gran) * gran if n > gran else _pow2(n, floor=1024)
    )
    if n_pad > n:
        pad = n_pad - n
        pad_iota = jnp.arange(n, n + pad, dtype=jnp.int32)
        xyz_d = jnp.concatenate(
            [xyz_d, jnp.full((pad, 3), 1e17, jnp.float32)]
        )
        idx_adj = jnp.concatenate(
            [idx_adj, jnp.broadcast_to(pad_iota[:, None], (pad, k))]
        )
        in_comp_d = jnp.concatenate(
            [in_comp_d, jnp.full(pad, n_com, jnp.int32)]
        )

    n_cross = int(jax.device_get(_count_cross_edges(
        idx_adj, in_comp_d, xyz_d, d_max=float(d_max), k=k
    )))
    cap_x = _pow2(n_cross, floor=1024)
    su, sv, cu, cv, valid, head_pair, n_sedg_d = _sort_support_edges(
        idx_adj, in_comp_d, xyz_d, d_max=float(d_max), k=k, cap_x=cap_x
    )
    n_sedg = int(jax.device_get(n_sedg_d))
    cap_e = _pow2(n_sedg)
    com_src, com_tgt, dmean_cols, dstd_cols, dnorm, cnt_e = _superedge_stats(
        xyz_d, su, sv, cu, cv, valid, head_pair, cap=cap_e
    )

    # +1: the padding rows use fake component id n_com, which must stay in
    # range (a clamp would fold the far-away pad centroid into comp cap-1)
    cap_c = _pow2(n_com + 1)
    cent_cols, length_d, surface_d, volume_d = _component_stats_device(
        xyz_d, in_comp_d, cap=cap_c
    )

    has_labels = labels is not None and np.size(labels) > 1
    if has_labels:
        labels_np = np.asarray(labels)
        is_hist = labels_np.ndim > 1 and labels_np.shape[1] > 1
        n_cols = labels_np.shape[1] if is_hist else n_labels + 1
        lab_pad = labels_np.reshape(n, -1)
        if n_pad > n:  # pad rows count into the fake comp row, sliced away
            lab_pad = np.concatenate(
                [lab_pad, np.zeros((n_pad - n, lab_pad.shape[1]),
                                   lab_pad.dtype)]
            )
        hist = _label_hist_device(
            in_comp_d, jnp.asarray(lab_pad),
            cap=cap_c, n_cols=int(n_cols), is_hist=bool(is_hist),
        )
    else:
        hist = None

    # ONE tunnel round trip for every stat array: the previous 16 separate
    # np.asarray fetches cost ~10-15 ms EACH in tunnel latency — more than
    # the host SPG builder's entire segment-stats pass at room scale
    (dmean_h, dstd_h, dnorm_h, cs_f, ct_f, cent_h, length_f, surface_f,
     volume_f, hist_f) = jax.device_get((
        tuple(dmean_cols), tuple(dstd_cols), dnorm, com_src, com_tgt,
        tuple(cent_cols), length_d, surface_d, volume_d,
        hist if hist is not None else n_sedg_d,
    ))
    dmean = np.stack(
        [np.asarray(c[:n_sedg], np.float32) for c in dmean_h], axis=1
    )
    dstd = np.stack(
        [np.asarray(c[:n_sedg], np.float32) for c in dstd_h], axis=1
    )
    dnorm = dnorm_h

    graph = {"is_nn": False}
    cent = np.stack(
        [np.asarray(c[:n_com], np.float32) for c in cent_h], axis=1
    )
    length = np.asarray(length_f[:n_com], np.float64)
    surface = np.asarray(surface_f[:n_com], np.float64)
    volume = np.asarray(volume_f[:n_com], np.float64)
    graph["sp_centroids"] = cent
    graph["sp_length"] = length.astype(np.float32)[:, None]
    graph["sp_surface"] = surface.astype(np.float32)[:, None]
    graph["sp_volume"] = volume.astype(np.float32)[:, None]
    counts = np.bincount(in_comp_h, minlength=n_com)
    graph["sp_point_count"] = counts.astype(np.uint64)[:, None]
    graph["sp_labels"] = (
        np.asarray(hist_f[:n_com], np.uint32) if has_labels else []
    )

    cs = np.asarray(cs_f[:n_sedg], np.int64)
    ct = np.asarray(ct_f[:n_sedg], np.int64)
    graph["source"] = cs.astype(np.uint32)[:, None]
    graph["target"] = ct.astype(np.uint32)[:, None]
    graph["se_delta_mean"] = dmean
    graph["se_delta_std"] = dstd
    graph["se_delta_norm"] = np.asarray(dnorm[:n_sedg], np.float32)[:, None]
    graph["se_delta_centroid"] = (cent[cs] - cent[ct]).astype(np.float32)
    eps = 1e-6
    graph["se_length_ratio"] = (
        length[cs] / (length[ct] + eps)
    ).astype(np.float32)[:, None]
    graph["se_surface_ratio"] = (
        surface[cs] / (surface[ct] + eps)
    ).astype(np.float32)[:, None]
    graph["se_volume_ratio"] = (
        volume[cs] / (volume[ct] + eps)
    ).astype(np.float32)[:, None]
    graph["se_point_count_ratio"] = (
        counts[cs] / (counts[ct] + eps)
    ).astype(np.float32)[:, None]
    return graph

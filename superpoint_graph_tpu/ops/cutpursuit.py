"""l0 cut pursuit — host-exact solver (parity oracle + CPU fallback).

Solves the generalized minimal partition problem of the reference's absent
`libcp` submodule (call sites: partition/partition.py:177, supervized_partition/
losses.py:82, graph_processing.py:164; algorithm: Landrieu & Obozinski, SIAM J.
Imaging Sci. 2017, l0 variant):

    argmin_x  sum_i nw_i * ||x_i - f_i||^2  +  reg * sum_(u,v) w_uv * [x_u != x_v]

over piecewise-constant x. Alternates (a) a reduced problem over current
regions (region value = weighted mean) with (b) binary splits of every region
found by a max-flow min-cut on the unary-cost difference (scipy's C max-flow;
all regions are cut in ONE flow problem since they are disconnected), and
(c) recomputing connected regions. Regions whose split yields no energy gain
are saturated and frozen.

The TPU production path lives in cutpursuit_jax.py; this module is the exact
oracle it is validated against, and the drop-in for the reference's `libcp`
API (returns `(components, in_component)` like libcp.cutpursuit).
"""
from __future__ import annotations

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import maximum_flow

from .components import connected_components

_FLOW_SCALE = 2**16


def _mincut_binary(n, unary0, unary1, src, tgt, pair_w):
    """Global binary min-cut: label 1 <=> source side.

    E = sum_i unary_{b_i}(i) + sum_e pair_w_e [b_u != b_v].  Standard graph
    construction: cap(s->i) = unary0[i], cap(i->t) = unary1[i], cap(u<->v) =
    pair_w. scipy needs integer capacities; costs are scaled to a fixed point.
    """
    scale_ref = max(
        float(np.max(unary0, initial=0.0)),
        float(np.max(unary1, initial=0.0)),
        float(np.max(pair_w, initial=0.0)),
        1e-12,
    )
    scale = _FLOW_SCALE / scale_ref
    s, t = n, n + 1
    cap_s = np.rint(unary0 * scale).astype(np.int64)
    cap_t = np.rint(unary1 * scale).astype(np.int64)
    cap_e = np.rint(pair_w * scale).astype(np.int64)

    rows = np.concatenate([np.full(n, s), np.arange(n), src, tgt])
    cols = np.concatenate([np.arange(n), np.full(n, t), tgt, src])
    data = np.concatenate([cap_s, cap_t, cap_e, cap_e])
    keep = data > 0
    graph = csr_matrix(
        (data[keep], (rows[keep], cols[keep])), shape=(n + 2, n + 2), dtype=np.int64
    )
    res = maximum_flow(graph, s, t)
    # source side = vertices reachable from s in the residual graph
    residual = graph - res.flow
    residual.data = np.maximum(residual.data, 0)
    from scipy.sparse.csgraph import breadth_first_order

    order = breadth_first_order(
        residual, s, directed=True, return_predecessors=False
    )
    b = np.zeros(n, dtype=bool)
    order = order[order < n]
    b[order] = True
    return b


def _energy(f, nw, in_comp, src, tgt, w, reg):
    d = f.shape[1]
    n_comp = in_comp.max() + 1
    wsum = np.zeros(n_comp)
    np.add.at(wsum, in_comp, nw)
    mean = np.zeros((n_comp, d))
    np.add.at(mean, in_comp, f * nw[:, None])
    mean /= np.maximum(wsum, 1e-12)[:, None]
    fid = float(np.sum(nw[:, None] * (f - mean[in_comp]) ** 2))
    cross = in_comp[src] != in_comp[tgt]
    return fid + reg * float(np.sum(w[cross])), mean


def merge_regions(
    f: np.ndarray,
    nw: np.ndarray,
    in_comp: np.ndarray,
    src: np.ndarray,
    tgt: np.ndarray,
    w: np.ndarray,
    reg: float,
    max_rounds: int = 10,
):
    """Backward (merge) step of cut pursuit: greedily merge adjacent regions
    whenever it lowers the energy (the paper's backward step; the forward
    split loop alone over-fragments).

    Closed form via sufficient statistics: with weighted sums S_C and masses
    m_C, fid(C) = sum nw||f||^2 - ||S_C||^2/m_C, so merging A,B changes the
    energy by  d = (||S_A||^2/m_A + ||S_B||^2/m_B - ||S_AB||^2/m_AB)
               - reg * w_AB.  Merge when d < 0. Each round every region picks
    its best partner and beneficial pairs are united (union-find), so chains
    resolve across rounds. Fully vectorized over superedges.
    """
    in_comp = np.asarray(in_comp, np.int64).copy()
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        f = f[:, None]
    nw = np.asarray(nw, np.float64)
    src = np.asarray(src, np.int64)
    tgt = np.asarray(tgt, np.int64)
    w = np.asarray(w, np.float64)

    # region sufficient statistics + pair weights — the full edge array is
    # touched ONCE; later rounds operate at the (much smaller) region level
    n_comp = int(in_comp.max()) + 1
    S = np.zeros((n_comp, f.shape[1]))
    np.add.at(S, in_comp, f * nw[:, None])
    m = np.zeros(n_comp)
    np.add.at(m, in_comp, nw)
    m = np.maximum(m, 1e-12)
    ca, cb = in_comp[src], in_comp[tgt]
    cross = ca != cb
    if not cross.any():
        return _densify_first_occurrence(in_comp)
    lo0 = np.minimum(ca[cross], cb[cross])
    hi0 = np.maximum(ca[cross], cb[cross])
    key0, inv0 = np.unique(lo0 * n_comp + hi0, return_inverse=True)
    pair_w = np.zeros(len(key0))
    np.add.at(pair_w, inv0, w[cross])
    pair_a = (key0 // n_comp).astype(np.int64)
    pair_b = (key0 % n_comp).astype(np.int64)
    label = merge_rounds(
        S, m, pair_a, pair_b, pair_w, n_comp, reg, max_rounds=max_rounds
    )
    return _densify_first_occurrence(label[in_comp])


def merge_rounds(
    S: np.ndarray,
    m: np.ndarray,
    pair_a: np.ndarray,
    pair_b: np.ndarray,
    pair_w: np.ndarray,
    n_comp: int,
    reg: float,
    max_rounds: int = 10,
) -> np.ndarray:
    """Region-level greedy merge rounds over precomputed sufficient stats.

    Takes per-region weighted feature sums `S` [n_comp, d], masses `m`
    [n_comp], and the deduplicated adjacent-region pairs (a < b) with summed
    cut weights. The edge-level reduction that produces these can run on
    HOST (merge_regions) or on DEVICE (ops.merge_device.pair_stats) — this
    loop only ever touches O(n_comp + n_pairs) data. Mutates S/m in place.
    Returns the path-compressed label array [n_comp] mapping region -> its
    surviving root."""
    S = np.asarray(S, np.float64)
    m = np.maximum(np.asarray(m, np.float64), 1e-12)
    pair_a = np.asarray(pair_a, np.int64)
    pair_b = np.asarray(pair_b, np.int64)
    pair_w = np.asarray(pair_w, np.float64)
    # union-find: label[i] points toward the surviving (smaller) region id;
    # compressed to roots at the top of every round. Pointer writes are O(1)
    # per merge — a full `label[label == gone] = keep` rewrite per merge was
    # O(n_comp) and dominated the heal at giant-cloud region counts.
    label = np.arange(n_comp)

    def _compress(lab):
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                return lab
            lab = nxt[nxt]

    for _ in range(max_rounds):
        label = _compress(label)
        A = label[pair_a]
        B = label[pair_b]
        live = A != B
        if not live.any():
            break
        loA = np.minimum(A[live], B[live])
        hiB = np.maximum(A[live], B[live])
        # pair dedup: one stable argsort + run-boundary reduceat (np.unique
        # with return_inverse is two sorts, and np.add.at runs ~25M/s —
        # together ~1 s/round at 2e6 pairs)
        k2 = loA * n_comp + hiB
        korder = np.argsort(k2, kind="stable")
        ks = k2[korder]
        heads = np.empty(len(ks), bool)
        heads[0] = True
        np.not_equal(ks[1:], ks[:-1], out=heads[1:])
        starts = np.flatnonzero(heads)
        key = ks[starts]
        w_pair = np.add.reduceat(pair_w[live][korder], starts)
        A = (key // n_comp).astype(np.int64)
        B = (key % n_comp).astype(np.int64)
        # energy delta of merging (A,B): |S_A|^2/m_A + |S_B|^2/m_B -
        # |S_A+S_B|^2/(m_A+m_B) - reg*w. The per-region quadratic q=|S|^2/m
        # is computed once over regions; only the cross term needs pair
        # gathers (S[A] was gathered ~8x here before).
        q = np.einsum("cd,cd->c", S, S) / m
        mA = m[A]
        mB = m[B]
        cross = np.einsum("pd,pd->p", S[A], S[B])
        qa = q[A]
        qb = q[B]
        sab = (qa * mA + qb * mB + 2.0 * cross) / (mA + mB)
        delta = (qa + qb - sab) - reg * w_pair
        good = delta < -1e-12
        if not good.any():
            break
        order = np.argsort(delta[good])
        Ag, Bg = A[good][order], B[good][order]
        # merge only untouched regions this round — the closed-form gains
        # of chained merges are stale; later rounds pick them up. The
        # sequential conflict scan runs in C++ (native.greedy_matching);
        # accepted pairs have pairwise-disjoint endpoints, so the stat
        # updates below are plain fancy-index writes.
        acc = _greedy_matching(Ag, Bg, n_comp)
        if not acc.any():
            break
        keep = np.minimum(Ag[acc], Bg[acc])
        gone = np.maximum(Ag[acc], Bg[acc])
        label[gone] = keep  # both are roots this round -> depth <= 2
        S[keep] += S[gone]
        m[keep] += m[gone]

    return _compress(label)


def _greedy_matching(a: np.ndarray, b: np.ndarray, n_comp: int) -> np.ndarray:
    """Accept mask over ordered merge candidates: candidate i is accepted
    iff neither endpoint was touched by an earlier accepted one. C++ when
    the native lib is present (a ~1e6-candidate python loop dominated the
    giant-cloud heal), interpreter fallback otherwise."""
    try:
        from .. import native

        if native.available():
            return native.greedy_matching(a, b, n_comp)
    except Exception:
        pass
    used = np.zeros(n_comp, bool)
    acc = np.zeros(len(a), bool)
    for i, (x, y) in enumerate(zip(a, b)):
        if used[x] or used[y]:
            continue
        used[x] = used[y] = True
        acc[i] = True
    return acc


def _densify_first_occurrence(labels: np.ndarray) -> np.ndarray:
    labels = np.asarray(labels)
    n = labels.size
    if n == 0:
        return labels.astype(np.int32)
    bound = int(labels.max()) + 1
    if bound <= 4 * n + 1024:
        # dense label space (every call site passes region ids bounded by
        # n_comp): two O(n) scatter/gather passes + a sort over the distinct
        # ids only. np.unique's full-array double sort was 14 s at 1e7.
        # Reversed fancy assignment: the LAST write per duplicate index
        # sticks, so writing positions in descending order leaves each
        # label's FIRST occurrence.
        first = np.full(bound, -1, np.int64)
        first[labels[::-1]] = np.arange(n - 1, -1, -1)
        vals = np.flatnonzero(first >= 0)
        order = np.argsort(first[vals], kind="stable")
        newlab = np.empty(bound, np.int32)
        newlab[vals[order]] = np.arange(len(vals), dtype=np.int32)
        return newlab[labels]
    _, first_pos, inv = np.unique(labels, return_index=True, return_inverse=True)
    order = np.argsort(np.argsort(first_pos))
    return order[inv].astype(np.int32)


def cutpursuit(
    features: np.ndarray,
    source: np.ndarray,
    target: np.ndarray,
    edge_weight: np.ndarray,
    reg_strength: float,
    cutoff: int = 0,
    spatial: bool = False,
    weight_decay: float = 0.7,
    node_weight: np.ndarray | None = None,
    max_iter: int = 10,
    flow_steps: int = 4,
    seed: int = 0,
):
    """Drop-in for `libcp.cutpursuit` (partition.py:177, losses.py:82).

    Args mirror the reference call sites; `spatial` marks that trailing columns
    are scaled coordinates (they participate in the fidelity like any feature —
    documented divergence: the absent submodule's exact treatment is
    unreconstructable, and partition quality is validated statistically).
    `weight_decay` damps the per-iteration split alternations.

    Returns (components: list of uint32 index arrays, in_component: int32 [n]).
    """
    del spatial
    f = np.ascontiguousarray(features, dtype=np.float64)
    if f.ndim == 1:
        f = f[:, None]
    n, d = f.shape
    src = np.asarray(source, dtype=np.int64)
    tgt = np.asarray(target, dtype=np.int64)
    w = np.asarray(edge_weight, dtype=np.float64)
    nw = (
        np.ones(n)
        if node_weight is None
        else np.asarray(node_weight, dtype=np.float64)
    )
    reg = float(reg_strength)
    rng = np.random.RandomState(seed)

    in_comp = np.zeros(n, dtype=np.int64)
    energy, mean = _energy(f, nw, in_comp, src, tgt, w, reg)
    saturated = np.zeros(1, dtype=bool)

    for it in range(max_iter):
        n_comp = in_comp.max() + 1
        # --- split step: binary labels per region via alternating minimization
        active_v = ~saturated[in_comp]
        if not active_v.any():
            break
        # init split direction: principal component of residuals per region
        # (batched: one scatter-add covariance + one batched eigh)
        resid = f - mean[in_comp]
        cov = np.zeros((n_comp, d, d))
        np.add.at(cov, in_comp, resid[:, :, None] * resid[:, None, :])
        _, evec = np.linalg.eigh(cov)
        dirs = evec[..., -1]
        dirs[saturated] = 0.0
        b = np.einsum("nd,nd->n", resid, dirs[in_comp]) > 0

        hp = np.zeros((n_comp, d))
        hm = np.zeros((n_comp, d))
        intra = in_comp[src] == in_comp[tgt]
        e_src, e_tgt, e_w = src[intra], tgt[intra], w[intra]
        steps = max(1, int(round(flow_steps * (weight_decay ** it) + 0.5)))
        for _ in range(steps):
            # centroids of the two sides (weighted); empty side keeps region mean
            for side, h in ((True, hp), (False, hm)):
                sel = b == side
                wsum = np.zeros(n_comp)
                np.add.at(wsum, in_comp[sel], nw[sel])
                acc = np.zeros((n_comp, d))
                np.add.at(acc, in_comp[sel], f[sel] * nw[sel, None])
                empty = wsum <= 0
                h[:] = np.where(
                    empty[:, None], mean, acc / np.maximum(wsum, 1e-12)[:, None]
                )
            u1 = nw * np.sum((f - hp[in_comp]) ** 2, axis=1)
            u0 = nw * np.sum((f - hm[in_comp]) ** 2, axis=1)
            # freeze saturated regions as side 0 with zero cost asymmetry
            u1 = np.where(active_v, u1, 1.0)
            u0 = np.where(active_v, u0, 0.0)
            b = _mincut_binary(n, u0, u1, e_src, e_tgt, reg * e_w)

        # --- new regions = connected components of constant (region, side)
        same = intra & (b[src] == b[tgt])
        comps, new_in_comp = connected_components(n, src, tgt, same, 0)
        new_in_comp = new_in_comp.astype(np.int64)
        new_energy, new_mean = _energy(f, nw, new_in_comp, src, tgt, w, reg)

        if new_energy < energy - 1e-9 * max(abs(energy), 1.0):
            # saturate regions that did not improve: a region is saturated if it
            # did not split (all its vertices kept one side)
            n_new = new_in_comp.max() + 1
            sat_new = np.zeros(n_new, dtype=bool)
            # map: old region -> set of new regions; unsplit (1 kid) => saturate
            pair = np.unique(np.stack([in_comp, new_in_comp]), axis=1)
            old_counts = np.bincount(pair[0], minlength=n_comp)
            only_kids = pair[1, old_counts[pair[0]] == 1]
            sat_new[only_kids] = True
            in_comp, mean, energy, saturated = new_in_comp, new_mean, new_energy, sat_new
        else:
            break

    # backward step: merge adjacent regions whenever it lowers the energy
    in_comp = merge_regions(f, nw, in_comp, src, tgt, w, reg).astype(np.int64)

    if cutoff > 0:
        # fuse regions smaller than cutoff into an adjacent region (absorb into
        # the largest neighbor, as connected_components.cpp:41-110 does)
        active = in_comp[src] == in_comp[tgt]
        _, in_comp32 = connected_components(n, src, tgt, active, cutoff)
        in_comp = in_comp32.astype(np.int64)

    from .components import group_components

    components = group_components(in_comp)
    return components, in_comp.astype(np.int32)


def cutpursuit2(
    values: np.ndarray,
    source: np.ndarray,
    target: np.ndarray,
    edge_weight: np.ndarray,
    node_weight: np.ndarray,
    reg_strength: float,
    **kw,
):
    """Drop-in for `libcp.cutpursuit2` (graph_processing.py:164): l0
    regularization with per-node fidelity weights; returns the regularized
    piecewise-constant values and the region assignment."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    if v.ndim == 1:
        v = v[:, None]
    nw = np.asarray(node_weight, dtype=np.float64)
    comps, in_comp = cutpursuit(
        v, source, target, edge_weight, reg_strength, node_weight=nw, **kw
    )
    n_comp = in_comp.max() + 1
    wsum = np.zeros(n_comp)
    np.add.at(wsum, in_comp, nw)
    acc = np.zeros((n_comp, v.shape[1]))
    np.add.at(acc, in_comp, v * nw[:, None])
    glob = v[nw > 0].mean(axis=0) if (nw > 0).any() else v.mean(axis=0)
    mean = np.where(
        (wsum <= 0)[:, None], glob[None, :], acc / np.maximum(wsum, 1e-12)[:, None]
    )
    values_reg = mean[in_comp].astype(np.float32)
    if values.ndim == 1:
        values_reg = values_reg[:, 0]
    return values_reg, in_comp

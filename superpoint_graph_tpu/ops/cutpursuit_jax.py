"""l0 cut pursuit, TPU-native: every region split in parallel, fully jitted.

The reference's solver (absent `libcp` submodule; SIAM-2017 paper) alternates
sequential per-region max-flow binary splits with a reduced problem. Max-flow
is pointer-chasing and inherently sequential — hostile to the MXU/VPU. This
reformulation keeps the outer cut-pursuit structure but solves every region's
binary split *simultaneously* with an alternating scheme:

  1. reduced problem: region value = (weighted) mean          -> segment_sum
  2. split direction: principal component of region residuals -> segment_sum
     of outer products + batched power iteration (pure VPU)
  3. binary labeling: iterated conditional modes (ICM) sweeps with
     checkerboard updates on the unary-difference + graph-penalty field
     (the exact max-flow of the reference is replaced by this parallel
     relaxation; partition quality is validated statistically, which is the
     validation the reference itself admits — its partition is stochastic,
     README.md:32)
  4. new regions: label-propagation connected components      -> segment_min
  5. saturation: regions that stop improving are frozen

Regions are identified by root-vertex id (labels in [0, n)), so no dynamic
densification is needed inside jit; the host wrapper densifies once at the end.
Everything is static-shape: one compile per (n, E, d, hyperparams).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .components import connected_components


def _seg_mean(data, seg, n, weights=None, mask=None):
    w = jnp.ones(data.shape[0], data.dtype) if weights is None else weights
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    tot = jax.ops.segment_sum(data * w[:, None], seg, num_segments=n)
    cnt = jax.ops.segment_sum(w, seg, num_segments=n)
    return tot / jnp.maximum(cnt, 1e-12)[:, None], cnt


def _energy(f, nw, comp, src, tgt, w, reg, n):
    mean, _ = _seg_mean(f, comp, n, weights=nw)
    fid = jnp.sum(nw * jnp.sum((f - mean[comp]) ** 2, axis=1))
    cross = comp[src] != comp[tgt]
    return fid + reg * jnp.sum(jnp.where(cross, w, 0.0)), mean


@partial(
    jax.jit,
    static_argnames=("max_iter", "icm_sweeps", "flow_steps", "power_iters",
                     "cc_iters", "sorted_reductions"),
)
def _solve(
    f,
    src,
    tgt,
    w,
    nw,
    reg,
    tgt_perm=None,
    weight_decay=1.0,
    *,
    max_iter: int = 8,
    icm_sweeps: int = 3,
    flow_steps: int = 2,
    power_iters: int = 8,
    cc_iters: int = 48,
    sorted_reductions: bool = False,
):
    n, d = f.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    parity = (iota % 2).astype(bool)

    # The edge keys (src, tgt) never change across the solve; with
    # sorted_reductions the edge-keyed reductions exploit that via
    # indices_are_sorted (src sorted by the wrapper's canonicalization, tgt
    # via the precomputed permutation). Measured a wash on v5e over the
    # tunnel — kept switchable for real-pod profiling.
    if tgt_perm is None:
        tgt_perm = jnp.argsort(tgt)
    tgt_s = tgt[tgt_perm]

    if sorted_reductions:
        def seg_sum_by_src(vals):
            return jax.ops.segment_sum(
                vals, src, num_segments=n, indices_are_sorted=True
            )

        def seg_sum_by_tgt(vals):
            return jax.ops.segment_sum(
                vals[tgt_perm], tgt_s, num_segments=n, indices_are_sorted=True
            )

        def seg_min_by_src(vals):
            return jax.ops.segment_min(
                vals, src, num_segments=n, indices_are_sorted=True
            )

        def seg_min_by_tgt(vals):
            return jax.ops.segment_min(
                vals[tgt_perm], tgt_s, num_segments=n, indices_are_sorted=True
            )
    else:
        def seg_sum_by_src(vals):
            return jax.ops.segment_sum(vals, src, num_segments=n)

        def seg_sum_by_tgt(vals):
            return jax.ops.segment_sum(vals, tgt, num_segments=n)

        def seg_min_by_src(vals):
            return jax.ops.segment_min(vals, src, num_segments=n)

        def seg_min_by_tgt(vals):
            return jax.ops.segment_min(vals, tgt, num_segments=n)

    def cc_sweep(lab, active):
        big = jnp.int32(2147483647)
        m = jnp.where(active, jnp.minimum(lab[src], lab[tgt]), big)
        new = jnp.minimum(seg_min_by_src(m), seg_min_by_tgt(m))
        lab = jnp.minimum(lab, jnp.where(new == big, lab, new))
        lab = jnp.minimum(lab, lab[lab])
        lab = jnp.minimum(lab, lab[lab])
        lab = jnp.minimum(lab, lab[lab])
        return lab

    def split_once(comp, saturated, mean, it):
        # weight_decay damps the alternation count per outer iteration like
        # the host solver (cutpursuit.py: steps = round(flow_steps*wd^it+.5));
        # the unrolled steps beyond that are where-gated no-ops
        steps_now = jnp.maximum(
            1,
            jnp.round(
                flow_steps * weight_decay ** it.astype(f.dtype) + 0.5
            ).astype(jnp.int32),
        )
        resid = f - mean[comp]
        # principal direction per region via power iteration on segment covs
        cov = jax.ops.segment_sum(
            (resid[:, :, None] * resid[:, None, :]).reshape(n, d * d),
            comp,
            num_segments=n,
        ).reshape(n, d, d)
        v = jnp.ones((n, d), f.dtype) + 0.01 * jnp.sin(
            iota[:, None].astype(f.dtype) * jnp.arange(1, d + 1, dtype=f.dtype)
        )
        # unrolled power iteration (lax loop carry costs ~20ms/iter on TPU)
        for _ in range(power_iters):
            v = jnp.einsum("nij,nj->ni", cov, v)
            v = v * jax.lax.rsqrt(jnp.sum(v * v, axis=1, keepdims=True) + 1e-20)
        b = jnp.sum(resid * v[comp], axis=1) > 0
        b = jnp.where(saturated[comp], False, b)

        intra = comp[src] == comp[tgt]
        w_intra = jnp.where(intra, w, 0.0)

        # unrolled alternations + ICM sweeps (static trip counts; lax loop
        # carries cost ~20ms/iter on TPU, unrolled bodies ~2ms)
        for k in range(flow_steps):
            step_on = k < steps_now
            b_in = b
            bf = b.astype(f.dtype)[:, None]
            hp, cp_ = _seg_mean(f, comp, n, weights=nw * bf[:, 0])
            hm, cm_ = _seg_mean(f, comp, n, weights=nw * (1.0 - bf[:, 0]))
            hp = jnp.where((cp_ > 0)[:, None], hp, mean)
            hm = jnp.where((cm_ > 0)[:, None], hm, mean)
            delta_u = nw * (
                jnp.sum((f - hp[comp]) ** 2, axis=1)
                - jnp.sum((f - hm[comp]) ** 2, axis=1)
            )
            for s in range(2 * icm_sweeps):
                # graph term: for an in-region edge (u,v), labeling u as 1
                # costs reg*w*(1 - 2 b_v); accumulated from both endpoints
                field = seg_sum_by_src(
                    reg * w_intra * (1.0 - 2.0 * b[tgt].astype(f.dtype))
                ) + seg_sum_by_tgt(
                    reg * w_intra * (1.0 - 2.0 * b[src].astype(f.dtype))
                )
                want = (delta_u + field) < 0
                upd = parity == (s % 2 == 0)
                b = jnp.where(upd, want, b)
            b = jnp.where(step_on, b, b_in)
        b = jnp.where(saturated[comp], False, b)
        return b

    def body(state):
        comp, saturated, energy, it, _ = state
        _, mean = _energy(f, nw, comp, src, tgt, w, reg, n)
        b = split_once(comp, saturated, mean, it)
        same = (comp[src] == comp[tgt]) & (b[src] == b[tgt])
        new_comp = iota
        for _ in range(cc_iters):
            new_comp = cc_sweep(new_comp, same)
        new_energy, _ = _energy(f, nw, new_comp, src, tgt, w, reg, n)
        improved = new_energy < energy - 1e-6 * jnp.maximum(jnp.abs(energy), 1.0)
        # saturation: old region unsplit (its new label is constant) -> freeze
        hi = jax.ops.segment_max(new_comp, comp, num_segments=n)
        lo = jax.ops.segment_min(new_comp, comp, num_segments=n)
        unsplit_old = hi == lo  # indexed by old root
        new_sat = unsplit_old[comp]  # broadcast to vertices -> per-vertex flag
        # store saturation on new roots: a new region is saturated iff its old
        # region did not split at all
        sat_flag = jax.ops.segment_max(
            new_sat.astype(jnp.int32), new_comp, num_segments=n
        ).astype(bool)
        comp_out = jnp.where(improved, new_comp, comp)
        sat_out = jnp.where(improved, sat_flag, saturated)
        e_out = jnp.where(improved, new_energy, energy)
        return comp_out, sat_out, e_out, it + 1, improved

    def cond(state):
        comp, saturated, energy, it, improved = state
        return (it < max_iter) & improved

    comp0 = jnp.zeros(n, jnp.int32)
    energy0, _ = _energy(f, nw, comp0, src, tgt, w, reg, n)
    state = (comp0, jnp.zeros(n, bool), energy0, jnp.int32(0), jnp.bool_(True))
    comp, saturated, energy, it, _ = jax.lax.while_loop(cond, body, state)
    return comp, energy


@partial(
    jax.jit,
    static_argnames=("max_iter", "icm_sweeps", "flow_steps", "power_iters",
                     "cc_iters"),
)
def _solve_dense(
    f,
    nbr,        # [n, K] int32 neighbor ids (symmetrized, padded with self)
    nbr_w,      # [n, K] float edge weight per slot (0 for padding)
    nbr_mask,   # [n, K] bool
    nw,
    reg,
    weight_decay=1.0,
    *,
    max_iter: int = 8,
    icm_sweeps: int = 3,
    flow_steps: int = 2,
    power_iters: int = 8,
    cc_iters: int = 48,
):
    """Dense-neighbor cut pursuit: kNN partition graphs have fixed degree, so
    the graph lives as a [n, K] neighbor matrix (each undirected edge appears
    in both endpoints' rows). Every edge aggregation — the CC hooking sweeps
    and the ICM graph field, i.e. ALL the hot ops — becomes gather + masked
    row-reduction: pure VPU work, zero scatters. Only the region-keyed
    means/covariances (small, [n]-sized) remain segment reductions.

    Cross-partition energy counts each undirected edge twice (once per
    endpoint row) and is halved accordingly.
    """
    n, d = f.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    parity = (iota % 2).astype(bool)
    wmask = jnp.where(nbr_mask, nbr_w, 0.0)

    def energy_of(comp, mean):
        fid = jnp.sum(nw * jnp.sum((f - mean[comp]) ** 2, axis=1))
        cross = jnp.sum(jnp.where(comp[nbr] != comp[:, None], wmask, 0.0))
        return fid + reg * 0.5 * cross

    def means_of(comp):
        mean, _ = _seg_mean(f, comp, n, weights=nw)
        return mean

    def cc_pass(lab, same_nbr):
        # same_nbr: [n, K] bool — neighbor in same (comp, b) region.
        # Unrolled 12-sweep blocks inside a short convergence-checked loop:
        # typical graphs converge in 1-2 blocks; the worst case still gets
        # cc_iters sweeps.
        big = jnp.int32(2147483647)

        def block(lab):
            for _ in range(12):
                cand = jnp.where(same_nbr, lab[nbr], big)
                lab = jnp.minimum(lab, jnp.min(cand, axis=1))
                lab = jnp.minimum(lab, lab[lab])
                lab = jnp.minimum(lab, lab[lab])
                lab = jnp.minimum(lab, lab[lab])
            return lab

        n_blocks = max(1, -(-cc_iters // 12))

        def cond(state):
            lab, changed, i = state
            return changed & (i < n_blocks)

        def body(state):
            lab, _, i = state
            new = block(lab)
            return new, jnp.any(new != lab), i + 1

        lab, _, _ = jax.lax.while_loop(
            cond, body, (block(lab), jnp.bool_(True), jnp.int32(1))
        )
        return lab

    def split_once(comp, saturated, mean, it):
        # weight_decay: same alternation-count schedule as the host solver
        steps_now = jnp.maximum(
            1,
            jnp.round(
                flow_steps * weight_decay ** it.astype(f.dtype) + 0.5
            ).astype(jnp.int32),
        )
        resid = f - mean[comp]
        cov = jax.ops.segment_sum(
            (resid[:, :, None] * resid[:, None, :]).reshape(n, d * d),
            comp,
            num_segments=n,
        ).reshape(n, d, d)
        v = jnp.ones((n, d), f.dtype) + 0.01 * jnp.sin(
            iota[:, None].astype(f.dtype) * jnp.arange(1, d + 1, dtype=f.dtype)
        )
        for _ in range(power_iters):
            v = jnp.einsum("nij,nj->ni", cov, v)
            v = v * jax.lax.rsqrt(jnp.sum(v * v, axis=1, keepdims=True) + 1e-20)
        b = jnp.sum(resid * v[comp], axis=1) > 0
        b = jnp.where(saturated[comp], False, b)

        intra_nbr = comp[nbr] == comp[:, None]
        w_intra = jnp.where(intra_nbr, wmask, 0.0)

        for k in range(flow_steps):
            step_on = k < steps_now
            b_in = b
            bf = b.astype(f.dtype)
            hp, cp_ = _seg_mean(f, comp, n, weights=nw * bf)
            hm, cm_ = _seg_mean(f, comp, n, weights=nw * (1.0 - bf))
            hp = jnp.where((cp_ > 0)[:, None], hp, mean)
            hm = jnp.where((cm_ > 0)[:, None], hm, mean)
            delta_u = nw * (
                jnp.sum((f - hp[comp]) ** 2, axis=1)
                - jnp.sum((f - hm[comp]) ** 2, axis=1)
            )
            for s in range(2 * icm_sweeps):
                field = reg * jnp.sum(
                    w_intra * (1.0 - 2.0 * b[nbr].astype(f.dtype)), axis=1
                )
                want = (delta_u + field) < 0
                upd = parity == (s % 2 == 0)
                b = jnp.where(upd, want, b)
            b = jnp.where(step_on, b, b_in)
        return jnp.where(saturated[comp], False, b)

    def body(state):
        comp, saturated, energy, it, _ = state
        mean = means_of(comp)
        b = split_once(comp, saturated, mean, it)
        same_nbr = (comp[nbr] == comp[:, None]) & (
            b[nbr] == b[:, None]
        ) & nbr_mask
        new_comp = cc_pass(iota, same_nbr)
        new_energy = energy_of(new_comp, means_of(new_comp))
        improved = new_energy < energy - 1e-6 * jnp.maximum(jnp.abs(energy), 1.0)
        hi = jax.ops.segment_max(new_comp, comp, num_segments=n)
        lo = jax.ops.segment_min(new_comp, comp, num_segments=n)
        new_sat = (hi == lo)[comp]
        sat_flag = jax.ops.segment_max(
            new_sat.astype(jnp.int32), new_comp, num_segments=n
        ).astype(bool)
        comp_out = jnp.where(improved, new_comp, comp)
        sat_out = jnp.where(improved, sat_flag, saturated)
        e_out = jnp.where(improved, new_energy, energy)
        return comp_out, sat_out, e_out, it + 1, improved

    def cond(state):
        return (state[3] < max_iter) & state[4]

    comp0 = jnp.zeros(n, jnp.int32)
    energy0 = energy_of(comp0, means_of(comp0))
    state = (comp0, jnp.zeros(n, bool), energy0, jnp.int32(0), jnp.bool_(True))
    comp, saturated, energy, it, _ = jax.lax.while_loop(cond, body, state)
    return comp, energy


def _dense_neighbors(n, source, target, weight, cap=None):
    """Symmetrized dense neighbor matrix from an undirected-unique edge list.

    Returns (nbr [n,K] int32, w [n,K] f32, mask [n,K] bool, kept_fraction).
    Vertices with degree > K keep their K heaviest edges (kept_fraction
    reports coverage so callers can fall back to the edge-list solver)."""
    src = np.asarray(source, np.int64)
    tgt = np.asarray(target, np.int64)
    w = np.asarray(weight, np.float64)
    # deduplicate undirected edges, SUMMING duplicate directed weights (the
    # reference counts each input edge once, so a mutual kNN pair contributes
    # twice its weight to the cut cost)
    lo = np.minimum(src, tgt)
    hi = np.maximum(src, tgt)
    key = lo * n + hi
    uniq_key, inv = np.unique(key, return_inverse=True)
    wsum = np.zeros(len(uniq_key))
    np.add.at(wsum, inv, w)
    lo, hi, w = uniq_key // n, uniq_key % n, wsum
    a = np.concatenate([lo, hi])
    b = np.concatenate([hi, lo])
    ww = np.concatenate([w, w])
    deg = np.bincount(a, minlength=n)
    max_deg = int(deg.max())
    K = max_deg if cap is None else min(max_deg, cap)
    if cap is None or max_deg <= cap:
        # cap doesn't bind: plain stable sort by vertex (2x faster than the
        # heaviest-first lexsort, which only matters when edges get dropped)
        order = np.argsort(a, kind="stable")
    else:
        order = np.lexsort((-ww, a))  # per-vertex, heaviest first
    a, b, ww = a[order], b[order], ww[order]
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=starts[1:])
    slot = np.arange(len(a)) - starts[a]
    keep = slot < K
    nbr = np.zeros((n, K), np.int64)
    wmat = np.zeros((n, K), np.float32)
    mask = np.zeros((n, K), bool)
    nbr[a[keep], slot[keep]] = b[keep]
    wmat[a[keep], slot[keep]] = ww[keep]
    mask[a[keep], slot[keep]] = True
    nbr[~mask] = np.arange(n)[:, None].repeat(K, 1)[~mask]  # self for padding
    kept = keep.sum() / max(len(a), 1)
    return (nbr.astype(np.int32), wmat, mask, float(kept))


def cutpursuit_tpu(
    features: np.ndarray,
    source: np.ndarray,
    target: np.ndarray,
    edge_weight: np.ndarray,
    reg_strength: float,
    cutoff: int = 0,
    spatial: bool = False,
    weight_decay: float = 0.7,
    node_weight: np.ndarray | None = None,
    xyz: np.ndarray | None = None,
    band_threshold: int = 16384,
    **solver_kw,
):
    """libcp.cutpursuit-compatible wrapper running the split loop on device.

    Returns (components, in_component) like the host oracle (cutpursuit.py).
    `weight_decay` follows the host solver's alternation schedule
    (steps = round(flow_steps * wd^it + 0.5), cutpursuit.py); `spatial` is a
    no-op as in the host solver (documented divergence there).

    Large clouds (n >= band_threshold) route to the block-banded solver
    (cutpursuit_band) which eliminates the per-sweep random gathers; `xyz`
    enables its Morton locality sort.
    """
    del spatial
    if features.shape[0] >= band_threshold:
        from .cutpursuit_band import cutpursuit_band

        return cutpursuit_band(
            features, source, target, edge_weight, reg_strength,
            cutoff=cutoff, weight_decay=weight_decay,
            node_weight=node_weight, xyz=xyz, **solver_kw,
        )
    f = np.ascontiguousarray(features, dtype=np.float32)
    if f.ndim == 1:
        f = f[:, None]
    n = f.shape[0]
    # canonicalize the edge list: _solve's sorted segment reductions require
    # edges ordered by src (the solver's contract); a tgt-sorting permutation
    # is precomputed alongside
    src_h = np.asarray(source, np.int64)
    tgt_h = np.asarray(target, np.int64)
    w_h = np.asarray(edge_weight, np.float32)
    if not np.all(src_h[1:] >= src_h[:-1]):
        e_order = np.argsort(src_h, kind="stable")
        src_h, tgt_h, w_h = src_h[e_order], tgt_h[e_order], w_h[e_order]
    nw = (
        jnp.ones(n, jnp.float32)
        if node_weight is None
        else jnp.asarray(node_weight, jnp.float32)
    )
    # dense neighbor-matrix solver whenever the max degree is bounded
    # (kNN partition graphs always are) — all hot aggregations become
    # gather + row-sum instead of scatters
    nbr, wmat, mask, kept = _dense_neighbors(n, src_h, tgt_h, w_h, cap=64)
    if kept >= 0.999:
        # bucket (n -> power of two, K -> multiple of 16 with a floor of 32)
        # so clouds of similar size AND similar max degree share one compiled
        # solver (the max in-degree jitters by a few between clouds — without
        # the coarse K bucket every cloud would recompile); pad vertices are
        # isolated singleton regions with zero features/weight, sliced away
        # after densify
        n_pad = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
        K = nbr.shape[1]
        K_pad = max(32, -(-K // 16) * 16)
        if n_pad > n or K_pad > K:
            f_p = np.zeros((n_pad, f.shape[1]), np.float32)
            f_p[:n] = f
            nbr_p = np.tile(
                np.arange(n_pad, dtype=np.int32)[:, None], (1, K_pad)
            )
            nbr_p[:n, :K] = nbr
            w_p = np.zeros((n_pad, K_pad), np.float32)
            w_p[:n, :K] = wmat
            m_p = np.zeros((n_pad, K_pad), bool)
            m_p[:n, :K] = mask
            nw_p = jnp.concatenate(
                [nw, jnp.zeros(n_pad - n, jnp.float32)]
            ) if n_pad > n else nw
            f, nbr, wmat, mask, nw = f_p, nbr_p, w_p, m_p, nw_p
        comp, _ = _solve_dense(
            jnp.asarray(f), jnp.asarray(nbr), jnp.asarray(wmat),
            jnp.asarray(mask), nw, jnp.float32(reg_strength),
            jnp.float32(weight_decay), **solver_kw,
        )
        comp = comp[:n]
    else:
        import logging

        logging.getLogger(__name__).warning(
            "cutpursuit_tpu: degree cap 64 drops %.2f%% of edge slots; "
            "falling back to the edge-list solver (slower scatter path)",
            100.0 * (1.0 - kept),
        )
        src = jnp.asarray(src_h, jnp.int32)
        tgt = jnp.asarray(tgt_h, jnp.int32)
        w = jnp.asarray(w_h, jnp.float32)
        tgt_perm = jnp.asarray(np.argsort(tgt_h, kind="stable"), jnp.int32)
        comp, _ = _solve(
            jnp.asarray(f), src, tgt, w, nw, jnp.float32(reg_strength),
            tgt_perm, jnp.float32(weight_decay), **solver_kw,
        )
    comp = np.asarray(comp)

    # densify root labels to 0..n_comp-1 in first-occurrence order
    _, first_pos, inv = np.unique(comp, return_index=True, return_inverse=True)
    order = np.argsort(np.argsort(first_pos))
    in_comp = order[inv]

    # backward step: merge adjacent regions whenever it lowers the energy
    # (host closed-form over region sufficient statistics, cutpursuit.py)
    from .cutpursuit import merge_regions

    in_comp = merge_regions(
        f[:n], np.asarray(nw)[:n], in_comp, src_h, tgt_h, w_h,
        float(reg_strength),
    )

    if cutoff > 0:
        src_h = np.asarray(source, np.int64)
        tgt_h = np.asarray(target, np.int64)
        active = in_comp[src_h] == in_comp[tgt_h]
        _, in_comp = connected_components(n, src_h, tgt_h, active, cutoff)

    from .components import group_components

    components = group_components(in_comp)
    return components, in_comp.astype(np.int32)

"""Mesh-sharded giant-cloud partition: Morton-chunked cut pursuit where each
device owns ONE contiguous slab of the cloud — nothing global is ever
materialized on any single device.

This is the scale-out of `pipeline_big.chunked_cutpursuit_device` (single
chip) to the Semantic3D-headline sizes (reference: 1e8-point stations pruned
to 1e6-1e7 voxels, /root/reference/partition/provider.py:250-303,
Semantic3D.md:11 — the reference handles them with a 24 GB host KD-tree and
one monolithic C++ solve; it has no distributed path at all, SURVEY §2.7).

Layout
------
The cloud is Morton-sorted; device d owns core rows [d*L, (d+1)*L) plus a
`halo` of sorted rows each side. Host assembles per-device buffers of
features / kNN targets (as global Morton positions) / distances and
`device_put`s them straight into the sharded layout. Per ROUND r, every
device solves its r-th Morton sub-chunk with the SAME `_solve_band`
executable as the single-chip path (chunks are independent: cross-chunk
edges are dropped and healed later), computes its chunk's merge statistics
on device (`ops.merge_device` kernels), and only core labels + compact
region-level stats cross to the host. After all rounds, the global heal's
edge->pair reduction runs per device over core edges (the rare
beyond-halo edges are folded in on host from the host edge list), and the
greedy merge rounds run on host at region level.

Memory per device: O(n/D) slab tables + O(chunk) band — the full kNN table
(36 GB at 1e8, ROADMAP r2) never exists anywhere.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops.cutpursuit import _densify_first_occurrence, merge_rounds
from ..ops.cutpursuit_band import B as _BLK
from ..ops.cutpursuit_band import PAD as _BPAD
from ..ops.cutpursuit_band import WIN as _BWIN
from ..ops.cutpursuit_band import _solve_band, morton_order
from ..ops.merge_device import _compact_pairs, _dedup_pairs, _pair_stats_kernel


def _window_band(bf, bidx, bd2, x0_loc, g0_win, n, dmean, lam,
                 *, chunk_pad: int, of_cap: int, k_adj: int):
    """Band construction for one Morton window from a device-local slab
    buffer (traceable; runs inside shard_map). `bidx` holds GLOBAL Morton
    positions; `g0_win` is the global position of window row 0 (may be
    negative at the cloud edges — masked by the real-row test)."""
    d = bf.shape[1]
    f_rows = jax.lax.dynamic_slice(bf, (x0_loc, 0), (chunk_pad, d))
    idx_rows = jax.lax.dynamic_slice(bidx, (x0_loc, 0), (chunk_pad, k_adj))
    d2_rows = jax.lax.dynamic_slice(bd2, (x0_loc, 0), (chunk_pad, k_adj))
    iota = jnp.arange(chunk_pad, dtype=jnp.int32)
    g = g0_win + iota
    real = (g >= 0) & (g < n)
    f_rows = jnp.where(real[:, None], f_rows, 0.0)

    tgt_loc = idx_rows - g0_win
    d0 = jnp.sqrt(jnp.maximum(d2_rows, 0.0))
    w0 = 1.0 / (lam + d0 / jnp.maximum(dmean, 1e-12))

    src0 = jnp.repeat(iota, k_adj)
    tgt0 = tgt_loc.reshape(-1)
    w0 = w0.reshape(-1)
    ok = real[src0] & (tgt0 >= 0) & (tgt0 < chunk_pad)
    w0 = jnp.where(ok, w0, 0.0)
    tgt0 = jnp.clip(tgt0, 0, chunk_pad - 1)

    src = jnp.concatenate([src0, tgt0])
    tgt = jnp.concatenate([tgt0, src0])
    w = jnp.concatenate([w0, w0])

    c = tgt - (src // _BLK) * _BLK + _BPAD
    c_rev = src - (tgt // _BLK) * _BLK + _BPAD
    inband = (
        (c >= 0) & (c < _BWIN) & (c_rev >= 0) & (c_rev < _BWIN) & (w > 0.0)
    )
    band = jnp.zeros((chunk_pad, _BWIN), jnp.bfloat16)
    band = band.at[
        jnp.where(inband, src, 0), jnp.where(inband, c, 0)
    ].add(jnp.where(inband, w, 0.0).astype(jnp.bfloat16))
    band_w = band.reshape(chunk_pad // _BLK, _BLK, _BWIN)

    is_of = (~inband) & (w > 0.0)
    pos = jnp.cumsum(is_of.astype(jnp.int32)) - 1
    tgt_pos = jnp.where(is_of & (pos < of_cap), pos, of_cap)
    of_src = jnp.zeros(of_cap + 1, jnp.int32).at[tgt_pos].set(src)[:of_cap]
    of_tgt = jnp.zeros(of_cap + 1, jnp.int32).at[tgt_pos].set(tgt)[:of_cap]
    of_w = (
        jnp.zeros(of_cap + 1, jnp.float32)
        .at[tgt_pos]
        .set(jnp.where(is_of, w, 0.0))[:of_cap]
    )
    # _solve_band's per-round segment ops now require the ASCENDING-src
    # deduped list (indices_are_sorted contract of ops.cutpursuit_band);
    # the dedup also drops ~30% duplicate directed entries
    from ..ops.cutpursuit_band import _dedup_of

    of_src, of_tgt, of_w, _ = _dedup_of(of_src, of_tgt, of_w, of_cap)
    nw = real.astype(jnp.float32)
    return f_rows, band_w, of_src, of_tgt, of_w, nw, src0, tgt0, w0


def chunked_cutpursuit_sharded(
    features: np.ndarray,
    xyz: np.ndarray,
    idx_adj: np.ndarray,
    d2_adj: np.ndarray,
    reg_strength: float,
    mesh: Mesh,
    axis: str = "dp",
    lambda_edge_weight: float = 1.0,
    weight_decay: float = 0.7,
    cutoff: int = 0,
    chunk_points: int = 1 << 19,
    **solver_kw,
):
    """Cut pursuit over ONE giant cloud with every O(n) table sharded.

    features [n, d], idx_adj [n, k] (original ids), d2_adj [n, k] live on
    host (streamed in per-device slabs); each device holds only its slab +
    halo. Returns (components, in_component) — same contract as
    `pipeline_big.chunked_cutpursuit_device`."""
    # chunked-path solver defaults (see pipeline_big.chunked_cutpursuit):
    # per-region accept + max_iter=16
    solver_kw.setdefault("accept", "region")
    solver_kw.setdefault("max_iter", 16)
    solver_kw.setdefault("stop_tol", 1e-3)  # see pipeline_big defaults
    solver_kw.setdefault("cc_jumps", 1)
    # headroom over the observed ~14 CC rounds/iter: with one jump
    # the 16-round safety cap would be a single bad scene away from
    # silent under-convergence (costs nothing when converged sooner)
    solver_kw.setdefault("cc_rounds", 24)  # see pipeline_big defaults
    n, d = features.shape
    k_adj = int(idx_adj.shape[1])
    n_dev = mesh.shape[axis]

    chunk_pad = -(-chunk_points // _BLK) * _BLK
    halo = chunk_pad // 8
    s_core = chunk_pad - 2 * halo
    # core rows per device: multiple of s_core so every device runs the same
    # number of rounds (trailing windows are all-pad and solve trivially)
    rounds = max(1, -(-(-(-n // n_dev)) // s_core))
    L = rounds * s_core
    l_buf = L + 2 * halo

    perm = morton_order(np.asarray(xyz))
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    f_m = np.ascontiguousarray(features[perm], np.float32)
    idx_m = inv[np.asarray(idx_adj, np.int64)[perm]].astype(np.int32)
    d2_m = np.ascontiguousarray(np.asarray(d2_adj, np.float32)[perm])
    dmean = float(np.sqrt(np.maximum(d2_m, 0.0)).mean())

    # per-device slab buffers (host assembly; each device receives only its
    # slab — the sharded device_put is the only transfer)
    buf_f = np.zeros((n_dev, l_buf, d), np.float32)
    buf_i = np.zeros((n_dev, l_buf, k_adj), np.int32)
    buf_d = np.zeros((n_dev, l_buf, k_adj), np.float32)
    for dev in range(n_dev):
        g0 = dev * L - halo  # global Morton position of buffer row 0
        s, e = max(0, g0), min(n, g0 + l_buf)
        if e > s:
            o = s - g0
            buf_f[dev, o : o + e - s] = f_m[s:e]
            buf_i[dev, o : o + e - s] = idx_m[s:e]
            buf_d[dev, o : o + e - s] = d2_m[s:e]

    shard = NamedSharding(mesh, P(axis))
    buf_f_d = jax.device_put(buf_f, shard)
    buf_i_d = jax.device_put(buf_i, shard)
    buf_d_d = jax.device_put(buf_d, shard)

    e_chunk = 2 * chunk_pad * k_adj
    of_cap = max(4096, 1 << int(np.ceil(np.log2(max(e_chunk // 4, 2)))))

    @jax.jit
    def round_step(bf, bi, bd, r):
        # r is TRACED: one executable serves every round (a static round
        # index would recompile the full solve `rounds` times)
        def local_fn(bf, bi, bd, r):
            bf, bi, bd = bf[0], bi[0], bd[0]
            dev = jax.lax.axis_index(axis)
            g0_win = dev * L - halo + r * s_core
            x0 = (r * s_core).astype(jnp.int32)
            f_rows, band_w, of_s, of_t, of_w, nw, es, et, ew = _window_band(
                bf, bi, bd, x0, g0_win, jnp.int32(n),
                jnp.float32(dmean), jnp.float32(lambda_edge_weight),
                chunk_pad=chunk_pad, of_cap=of_cap, k_adj=k_adj,
            )
            comp, _, _, _ = _solve_band(
                f_rows, band_w, of_s, of_t, of_w, nw,
                jnp.float32(reg_strength), jnp.float32(weight_decay),
                **solver_kw,
            )
            S, m, lo_s, hi_s, w_s, new, pid, n_pairs = _pair_stats_kernel(
                f_rows, nw, comp, es, et, ew, n_comp_cap=chunk_pad
            )
            return (
                comp[None], S[None], m[None], lo_s[None], hi_s[None],
                w_s[None], new[None], pid[None], n_pairs[None],
            )

        return jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P()),
            out_specs=tuple([P(axis)] * 9),
            check_vma=False,
        )(bf, bi, bd, r)

    @partial(jax.jit, static_argnames=("p_cap",))
    def compact_step(lo_s, hi_s, w_s, new, pid, *, p_cap: int):
        def local_fn(lo_s, hi_s, w_s, new, pid):
            pa, pb, pw = _compact_pairs(
                lo_s[0], hi_s[0], w_s[0], new[0], pid[0], p_cap=p_cap
            )
            return pa[None], pb[None], pw[None]

        return jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=tuple([P(axis)] * 5),
            out_specs=tuple([P(axis)] * 3),
            check_vma=False,
        )(lo_s, hi_s, w_s, new, pid)

    in_comp = np.full(n, -1, np.int64)
    base = 0
    for r in range(rounds):
        comp, S, m, lo_s, hi_s, w_s, new, pid, n_pairs = round_step(
            buf_f_d, buf_i_d, buf_d_d, jnp.int32(r)
        )
        npair = np.asarray(n_pairs)
        p_cap = max(
            1024, 1 << int(np.ceil(np.log2(max(int(npair.max()), 2))))
        )
        pa, pb, pw = (
            np.asarray(x) for x in compact_step(
                lo_s, hi_s, w_s, new, pid, p_cap=p_cap
            )
        )
        comp_h = np.asarray(comp)
        S_h = np.asarray(S, np.float64)
        m_h = np.asarray(m, np.float64)
        for dev in range(n_dev):
            g_lo = dev * L + r * s_core
            g_hi = min(g_lo + s_core, n)
            if g_hi <= g_lo:
                continue
            np_d = int(npair[dev])
            label = merge_rounds(
                S_h[dev], m_h[dev],
                pa[dev, :np_d], pb[dev, :np_d], pw[dev, :np_d],
                chunk_pad, float(reg_strength),
            ) if np_d else np.arange(chunk_pad)
            core = label[comp_h[dev, halo : halo + g_hi - g_lo]]
            core = _densify_first_occurrence(core)
            in_comp[perm[g_lo:g_hi]] = base + core
            base += int(core.max()) + 1 if len(core) else 0

    # ---- global heal: per-device pair reduction over core edges ----------
    comp_m = in_comp[perm]  # Morton order
    n_comp_cap = 1 << int(np.ceil(np.log2(max(base, 2))))
    buf_c = np.zeros((n_dev, l_buf), np.int32)
    for dev in range(n_dev):
        g0 = dev * L - halo
        s, e = max(0, g0), min(n, g0 + l_buf)
        if e > s:
            buf_c[dev, s - g0 : s - g0 + e - s] = comp_m[s:e]
    buf_c_d = jax.device_put(buf_c, shard)

    @jax.jit
    def heal_stats(bf, bi, bd, bc):
        def local_fn(bf, bi, bd, bc):
            bf, bi, bd, bc = bf[0], bi[0], bd[0], bc[0]
            dev = jax.lax.axis_index(axis)
            g0 = dev * L - halo
            iota = jnp.arange(L, dtype=jnp.int32) + halo  # core buffer rows
            g = g0 + iota
            real = (g >= 0) & (g < n)
            src = jnp.repeat(iota, k_adj)
            tgt = bi[iota].reshape(-1) - g0  # local buffer positions
            d0 = jnp.sqrt(jnp.maximum(bd[iota].reshape(-1), 0.0))
            w = 1.0 / (lambda_edge_weight + d0 / max(dmean, 1e-12))
            # distance <= halo makes this pass exactly disjoint from the
            # host fold (which re-adds Morton distance > halo): a target
            # can sit inside the buffer at distance up to L+2*halo, and
            # without the bound such edges were summed into pair_w twice
            # (systematic over-merging vs the single-chip heal)
            ok = (
                real[src - halo]
                & (tgt >= 0)
                & (tgt < l_buf)
                & (jnp.abs(src - tgt) <= halo)
            )
            w = jnp.where(ok, w, 0.0)
            tgt = jnp.clip(tgt, 0, l_buf - 1)
            nw = real.astype(jnp.float32)
            # shared pair reduction (ops.merge_device._dedup_pairs); only the
            # S/m moments need a psum across slabs, done below
            ca = bc[iota][src - halo]
            cb = bc[tgt]
            lo_s, hi_s, w_s, new, pid, n_pairs = _dedup_pairs(
                ca, cb, w, n_comp_cap
            )
            S = jax.lax.psum(
                jax.ops.segment_sum(
                    bf[iota] * nw[:, None], bc[iota],
                    num_segments=n_comp_cap,
                ),
                axis,
            )
            m = jax.lax.psum(
                jax.ops.segment_sum(nw, bc[iota], num_segments=n_comp_cap),
                axis,
            )
            return (
                S, m, lo_s[None], hi_s[None], w_s[None], new[None],
                pid[None], n_pairs[None],
            )

        return jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=tuple([P(axis)] * 4),
            out_specs=(P(), P()) + tuple([P(axis)] * 6),
            check_vma=False,
        )(bf, bi, bd, bc)

    S_g, m_g, lo_s, hi_s, w_s, new, pid, n_pairs = heal_stats(
        buf_f_d, buf_i_d, buf_d_d, buf_c_d
    )
    npair = np.asarray(n_pairs)
    p_cap = max(1024, 1 << int(np.ceil(np.log2(max(int(npair.max()), 2)))))
    pa, pb, pw = (
        np.asarray(x)
        for x in compact_step(lo_s, hi_s, w_s, new, pid, p_cap=p_cap)
    )
    # combine per-device pair lists + fold in the rare beyond-halo edges the
    # slabs could not see (host edge list, Morton distance > halo)
    pa_all = [pa[dev, : npair[dev]] for dev in range(n_dev)]
    pb_all = [pb[dev, : npair[dev]] for dev in range(n_dev)]
    pw_all = [pw[dev, : npair[dev]] for dev in range(n_dev)]
    src_h = np.repeat(np.arange(n, dtype=np.int64), k_adj)
    tgt_h = np.asarray(idx_adj, np.int64).reshape(-1)
    far = np.abs(inv[src_h] - inv[tgt_h]) > halo
    if far.any():
        d0 = np.sqrt(np.maximum(
            np.asarray(d2_adj, np.float64).reshape(-1)[far], 0.0
        ))
        wf = 1.0 / (lambda_edge_weight + d0 / max(dmean, 1e-12))
        ca, cb = in_comp[src_h[far]], in_comp[tgt_h[far]]
        cross = ca != cb
        if cross.any():
            pa_all.append(np.minimum(ca[cross], cb[cross]))
            pb_all.append(np.maximum(ca[cross], cb[cross]))
            pw_all.append(wf[cross])
    pa_c = np.concatenate(pa_all).astype(np.int64)
    pb_c = np.concatenate(pb_all).astype(np.int64)
    pw_c = np.concatenate(pw_all).astype(np.float64)
    key, kinv = np.unique(pa_c * n_comp_cap + pb_c, return_inverse=True)
    pw_u = np.zeros(len(key))
    np.add.at(pw_u, kinv, pw_c)

    label = merge_rounds(
        np.asarray(S_g, np.float64)[:base],
        np.asarray(m_g, np.float64)[:base],
        (key // n_comp_cap), (key % n_comp_cap), pw_u,
        base, float(reg_strength),
    )
    in_comp = _densify_first_occurrence(label[in_comp]).astype(np.int64)

    # connectivity contract (+ cutoff fuse): core-restricted slab labels can
    # be connected only through halo rows — split them into true graph CCs
    # (same invariant as pipeline_big.chunked_cutpursuit_device)
    from ..ops.components import relabel_connected

    components, in_comp = relabel_connected(n, src_h, tgt_h, in_comp, cutoff)
    return components, in_comp.astype(np.int32)


def partition_big_sharded(
    xyz: np.ndarray,
    rgb: np.ndarray | None,
    cfg,
    mesh: Mesh,
    axis: str = "dp",
    chunk_points: int = 1 << 19,
):
    """Full giant-cloud partition on a mesh: slab-halo kNN/geof
    (`partition_shard.sharded_knn_geof` — no replicated db) chained into the
    slab-sharded chunked cut pursuit above. No device ever holds a full
    cloud-sized table. Returns (graph_nn, geof, components, in_component)."""
    from ..pipeline import assemble_partition_features
    from .partition_shard import sharded_knn_geof

    graph_nn, geof, idx = sharded_knn_geof(
        xyz, cfg.k_nn_adj, cfg.k_nn_geof, mesh, axis=axis
    )
    features = assemble_partition_features(geof, rgb, cfg)
    k_adj = cfg.k_nn_adj
    idx_adj = idx[:, :k_adj]
    # exact squared distances for the adjacency columns (from graph_nn)
    d_adj = graph_nn["distances"].reshape(len(xyz), k_adj)
    components, in_component = chunked_cutpursuit_sharded(
        features, xyz, idx_adj, (d_adj * d_adj), cfg.reg_strength, mesh,
        axis=axis, lambda_edge_weight=cfg.lambda_edge_weight,
        cutoff=cfg.cp_cutoff, chunk_points=chunk_points,
    )
    return graph_nn, geof, components, in_component

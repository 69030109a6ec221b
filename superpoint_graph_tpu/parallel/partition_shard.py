"""Multi-chip partition of ONE giant cloud with the MEMORY sharded, not just
the FLOPs.

An earlier design (`partition_dp`, removed) replicated the db on every
device — it scaled compute but not memory, so it could not unlock clouds one
chip can't hold. This module shards the heavy state across the mesh:

* **kNN + geof** (`sharded_knn_geof`): the cloud is cell-sorted (same layout
  as ops.knn.knn_bigcloud) and split into contiguous slabs of sorted rows, one
  per device. Each device receives ONLY its slab plus a fixed-width halo of
  sorted rows on each side (host-side assembly, `device_put` straight into the
  sharded layout — no device ever holds the full cloud). Searches are purely
  local; the per-point exactness certificate (found d_k <= h, ops/knn.py)
  still holds because the halo is sized to cover every in-slab query's 27-cell
  neighborhood — queries whose certificate fails fall back exactly on host.

* **cut pursuit** (`cutpursuit_band_sharded`): the block-banded solver
  (ops/cutpursuit_band.py) with the dominant [NB, B, WIN] edge band sharded
  over block rows. Label/feature vectors (O(n), ~40 B/point vs the band's
  ~10 KB/point) stay replicated; every sweep updates local rows and
  all-gathers the new labels, region statistics combine with psum/pmin. The
  sweep schedule is identical to the single-chip solver, so outputs match
  exactly (modulo f32 summation order).

The reference has no distributed execution at all (SURVEY.md §2.7); this is
the rebuild's own scale-out layer (SURVEY.md §7.2-8).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops.cutpursuit_band import B, BIG, PAD, WIN, morton_order


def _geof_from(queries, db, nbrs, k):
    """linearity/planarity/scattering/verticality of [self; k db-neighbors]
    (same math as ops/geof.compute_geof, with self taken from the query
    shard; reference ply_c.cpp:436-451)."""
    from ..ops.eigen3 import eigh3x3

    pos_nei = db[nbrs]
    pos = jnp.concatenate([queries[:, None, :], pos_nei], axis=1)
    mean = jnp.mean(pos, axis=1, keepdims=True)
    centered = pos - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / float(k + 1)
    lams, vecs = eigh3x3(cov)
    lams = jnp.maximum(lams, 0.0)
    s0 = jnp.sqrt(lams[:, 0] + 1e-10)
    s1 = jnp.sqrt(lams[:, 1])
    s2 = jnp.sqrt(lams[:, 2])
    unary = jnp.einsum("ni,nji->nj", lams, jnp.abs(vecs))
    norm = jnp.sqrt(jnp.sum(unary * unary, axis=-1) + 1e-10)
    return jnp.stack(
        [(s0 - s1) / s0, (s1 - s2) / s0, s2 / s0, unary[:, 2] / norm], axis=-1
    ).astype(jnp.float32)


def _band_windows_local(v_rep, blk0, nb_local, fill):
    """[NB*B] replicated vector -> [nb_local, WIN] windows for global block
    rows blk0 .. blk0+nb_local-1 (the device's slice): window[q, c] =
    v[(blk0+q)*B - PAD + c], same geometry as ops.cutpursuit_band
    (WIN = B + 2*PAD)."""
    n = v_rep.shape[0]
    v_pad = jnp.concatenate([
        jnp.full((PAD,), fill, v_rep.dtype),
        v_rep,
        jnp.full((B + PAD,), fill, v_rep.dtype),
    ])
    sl = jax.lax.dynamic_slice(
        v_pad, (blk0 * B,), (nb_local * B + 2 * PAD,)
    )
    parts = []
    for s in range(0, WIN, B):
        width = min(B, WIN - s)
        parts.append(
            jax.lax.dynamic_slice(sl, (s,), (nb_local * B,)).reshape(
                nb_local, B
            )[:, :width]
        )
    return jnp.concatenate(parts, axis=1)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "max_iter", "icm_sweeps", "flow_steps", "power_iters",
        "cc_rounds", "cc_sweeps_per_round",
    ),
)
def _solve_band_sharded(
    f,            # [n, d] features (Morton order, padded) — sharded rows
    band_w,       # [NB, B, WIN] edge band — sharded block rows
    of_src,       # [E_of] overflow edges — sharded
    of_tgt,
    of_w,
    nw,           # [n] node weights — sharded rows
    reg,
    weight_decay=1.0,
    *,
    mesh: Mesh,
    axis: str = "dp",
    max_iter: int = 8,
    icm_sweeps: int = 3,
    flow_steps: int = 2,
    power_iters: int = 8,
    cc_rounds: int = 16,
    cc_sweeps_per_round: int = 4,
):
    """Sharded replica of ops.cutpursuit_band._solve_band (same sweep
    schedule; reference solver semantics per SIAM-2017 l0 cut pursuit,
    call sites partition/partition.py:177, losses.py:82)."""
    n, d = f.shape
    nb = n // B
    n_dev = mesh.shape[axis]
    nb_local = nb // n_dev
    n_local = n // n_dev

    def local_fn(f_loc, band_loc, ofs, oft, ofw, nw_loc):
        dev = jax.lax.axis_index(axis)
        blk0 = dev * nb_local
        row0 = dev * n_local
        iota_loc = row0 + jnp.arange(n_local, dtype=jnp.int32)
        parity_loc = (iota_loc % 2).astype(bool)
        band_adj = band_loc > 0.0

        def seg_mean_rep(data_loc, comp_loc, weights_loc):
            """Region means from local rows -> replicated [n, d] table."""
            tot = jax.lax.psum(
                jax.ops.segment_sum(
                    data_loc * weights_loc[:, None], comp_loc, num_segments=n
                ),
                axis,
            )
            cnt = jax.lax.psum(
                jax.ops.segment_sum(weights_loc, comp_loc, num_segments=n),
                axis,
            )
            return tot / jnp.maximum(cnt, 1e-12)[:, None], cnt

        def gather_rows(x_loc):
            """[n_local, ...] -> replicated [n, ...]."""
            return jax.lax.all_gather(x_loc, axis, tiled=True)

        def energy_of(comp_rep, mean_rep):
            comp_loc = jax.lax.dynamic_slice_in_dim(comp_rep, row0, n_local)
            fid = jnp.sum(
                nw_loc * jnp.sum((f_loc - mean_rep[comp_loc]) ** 2, axis=1)
            )
            compw = _band_windows_local(comp_rep, blk0, nb_local, jnp.int32(-1))
            cross_band = jnp.sum(
                jnp.where(
                    band_adj
                    & (compw[:, None, :]
                       != comp_loc.reshape(nb_local, B)[:, :, None]),
                    band_loc,
                    jnp.zeros((), band_loc.dtype),
                ).astype(jnp.float32)
            )
            cross_of = jnp.sum(
                jnp.where(comp_rep[ofs] != comp_rep[oft], ofw, 0.0)
            )
            return jax.lax.psum(
                fid + reg * 0.5 * (cross_band + cross_of), axis
            )

        def means_of(comp_rep):
            comp_loc = jax.lax.dynamic_slice_in_dim(comp_rep, row0, n_local)
            mean, _ = seg_mean_rep(f_loc, comp_loc, nw_loc)
            return mean

        def cc_full(comp_rep, b_rep):
            comp_loc = jax.lax.dynamic_slice_in_dim(comp_rep, row0, n_local)
            b_loc = jax.lax.dynamic_slice_in_dim(b_rep, row0, n_local)
            compw = _band_windows_local(
                comp_rep, blk0, nb_local, jnp.int32(-1)
            )
            bw = _band_windows_local(
                b_rep.astype(jnp.int8), blk0, nb_local, jnp.int8(-1)
            )
            comp2 = comp_loc.reshape(nb_local, B)[:, :, None]
            b2 = b_loc.astype(jnp.int8).reshape(nb_local, B)[:, :, None]
            same_band = band_adj & (compw[:, None, :] == comp2) & (
                bw[:, None, :] == b2
            )
            of_same = (
                (comp_rep[ofs] == comp_rep[oft])
                & (b_rep[ofs] == b_rep[oft])
                & (ofw > 0.0)
            )
            iota_rep = jnp.arange(n, dtype=jnp.int32)

            def sweeps(lab_rep, n_sweeps):
                for _ in range(n_sweeps):
                    labw = _band_windows_local(lab_rep, blk0, nb_local, BIG)
                    lab_loc = jax.lax.dynamic_slice_in_dim(
                        lab_rep, row0, n_local
                    )
                    cand = jnp.where(same_band, labw[:, None, :], BIG)
                    lab_loc = jnp.minimum(
                        lab_loc, jnp.min(cand, axis=2).reshape(-1)
                    )
                    lab_rep = gather_rows(lab_loc)
                return lab_rep

            def round_body(state):
                lab, _, i = state
                new = sweeps(lab, cc_sweeps_per_round)
                m = jnp.where(
                    of_same, jnp.minimum(new[ofs], new[oft]), BIG
                )
                hook = jnp.minimum(
                    jax.ops.segment_min(m, ofs, num_segments=n),
                    jax.ops.segment_min(m, oft, num_segments=n),
                )
                hook = jax.lax.pmin(hook, axis)
                new = jnp.minimum(new, hook)
                for _ in range(3):  # pointer jumping on the replicated labels
                    new = jnp.minimum(new, new[new])
                return new, jnp.any(new != lab), i + 1

            def round_cond(state):
                return state[1] & (state[2] < cc_rounds)

            lab0, _, _ = round_body((iota_rep, jnp.bool_(True), jnp.int32(0)))
            lab, _, _ = jax.lax.while_loop(
                round_cond, round_body, (lab0, jnp.bool_(True), jnp.int32(1))
            )
            return lab

        def split_once(comp_rep, saturated_rep, mean_rep, it):
            comp_loc = jax.lax.dynamic_slice_in_dim(comp_rep, row0, n_local)
            steps_now = jnp.maximum(
                1,
                jnp.round(
                    flow_steps * weight_decay ** it.astype(f_loc.dtype) + 0.5
                ).astype(jnp.int32),
            )
            resid = f_loc - mean_rep[comp_loc]
            cov = jax.lax.psum(
                jax.ops.segment_sum(
                    (resid[:, :, None] * resid[:, None, :]).reshape(
                        n_local, d * d
                    ),
                    comp_loc,
                    num_segments=n,
                ),
                axis,
            ).reshape(n, d, d)
            iota_rep = jnp.arange(n, dtype=jnp.int32)
            v = jnp.ones((n, d), f_loc.dtype) + 0.01 * jnp.sin(
                iota_rep[:, None].astype(f_loc.dtype)
                * jnp.arange(1, d + 1, dtype=f_loc.dtype)
            )
            for _ in range(power_iters):  # replicated power iteration
                v = jnp.einsum("nij,nj->ni", cov, v)
                v = v * jax.lax.rsqrt(
                    jnp.sum(v * v, axis=1, keepdims=True) + 1e-20
                )
            b_loc = jnp.sum(resid * v[comp_loc], axis=1) > 0
            b_loc = jnp.where(saturated_rep[comp_loc], False, b_loc)
            b_rep = gather_rows(b_loc)

            compw = _band_windows_local(
                comp_rep, blk0, nb_local, jnp.int32(-1)
            )
            w_intra = jnp.where(
                band_adj
                & (compw[:, None, :]
                   == comp_loc.reshape(nb_local, B)[:, :, None]),
                band_loc,
                jnp.zeros((), band_loc.dtype),
            )
            of_intra_w = jnp.where(comp_rep[ofs] == comp_rep[oft], ofw, 0.0)

            for k in range(flow_steps):
                step_on = k < steps_now
                b_in = b_rep
                bf_loc = jax.lax.dynamic_slice_in_dim(
                    b_rep, row0, n_local
                ).astype(f_loc.dtype)
                hp, cp_ = seg_mean_rep(f_loc, comp_loc, nw_loc * bf_loc)
                hm, cm_ = seg_mean_rep(
                    f_loc, comp_loc, nw_loc * (1.0 - bf_loc)
                )
                hp = jnp.where((cp_ > 0)[:, None], hp, mean_rep)
                hm = jnp.where((cm_ > 0)[:, None], hm, mean_rep)
                delta_u = nw_loc * (
                    jnp.sum((f_loc - hp[comp_loc]) ** 2, axis=1)
                    - jnp.sum((f_loc - hm[comp_loc]) ** 2, axis=1)
                )
                for s in range(2 * icm_sweeps):
                    bw = _band_windows_local(
                        jnp.ones((), w_intra.dtype)
                        - jnp.full((), 2.0, w_intra.dtype)
                        * b_rep.astype(w_intra.dtype),
                        blk0, nb_local, jnp.zeros((), w_intra.dtype),
                    )
                    band_field = jnp.einsum(
                        "pbw,pw->pb", w_intra, bw,
                        preferred_element_type=jnp.float32,
                    )
                    of_field = jax.lax.psum(
                        jax.ops.segment_sum(
                            of_intra_w
                            * (1.0 - 2.0 * b_rep[oft].astype(f_loc.dtype)),
                            ofs,
                            num_segments=n,
                        ),
                        axis,
                    )
                    of_field_loc = jax.lax.dynamic_slice_in_dim(
                        of_field, row0, n_local
                    )
                    field = reg * (band_field.reshape(-1) + of_field_loc)
                    want = (delta_u + field) < 0
                    upd = parity_loc == (s % 2 == 0)
                    b_new_loc = jnp.where(
                        upd,
                        want,
                        jax.lax.dynamic_slice_in_dim(b_rep, row0, n_local),
                    )
                    b_rep = gather_rows(b_new_loc)
                b_rep = jnp.where(step_on, b_rep, b_in)
            return jnp.where(saturated_rep[comp_rep], False, b_rep)

        def seg_reduce_rep(vals_rep, seg_rep, kind):
            """Replicated segment max/min (inputs replicated — compute once
            identically on every device, no collective needed)."""
            if kind == "max":
                return jax.ops.segment_max(vals_rep, seg_rep, num_segments=n)
            return jax.ops.segment_min(vals_rep, seg_rep, num_segments=n)

        def body(state):
            comp, saturated, energy, it, _ = state
            mean = means_of(comp)
            b = split_once(comp, saturated, mean, it)
            new_comp = cc_full(comp, b)
            new_energy = energy_of(new_comp, means_of(new_comp))
            improved = new_energy < energy - 1e-6 * jnp.maximum(
                jnp.abs(energy), 1.0
            )
            hi = seg_reduce_rep(new_comp, comp, "max")
            lo = seg_reduce_rep(new_comp, comp, "min")
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
        state = (
            comp0, jnp.zeros(n, bool), energy0, jnp.int32(0), jnp.bool_(True)
        )
        comp, saturated, energy, it, _ = jax.lax.while_loop(cond, body, state)
        return comp, energy

    mapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return mapped(f, band_w, of_src, of_tgt, of_w, nw)


def cutpursuit_band_sharded(
    features: np.ndarray,
    source: np.ndarray,
    target: np.ndarray,
    edge_weight: np.ndarray,
    reg_strength: float,
    mesh: Mesh,
    axis: str = "dp",
    cutoff: int = 0,
    weight_decay: float = 0.7,
    node_weight: np.ndarray | None = None,
    xyz: np.ndarray | None = None,
    **solver_kw,
):
    """libcp.cutpursuit-compatible banded solver with the edge band sharded
    over the mesh. Host prep mirrors ops.cutpursuit_band.cutpursuit_band; the
    band is assembled on the host and `device_put` directly into the sharded
    layout (each device receives only its block rows)."""
    from ..ops.components import connected_components, group_components
    from ..ops.cutpursuit import merge_regions
    from ..ops.cutpursuit_band import dedup_of_host, split_band_edges

    n_dev = mesh.shape[axis]
    f = np.ascontiguousarray(features, dtype=np.float32)
    if f.ndim == 1:
        f = f[:, None]
    n = f.shape[0]
    src = np.asarray(source, np.int64)
    tgt = np.asarray(target, np.int64)
    w = np.asarray(edge_weight, np.float32)
    nw_h = (
        np.ones(n, np.float32)
        if node_weight is None
        else np.asarray(node_weight, np.float32)
    )

    perm = morton_order(np.asarray(xyz)) if xyz is not None else np.arange(n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)

    nb = -(-max(n, B) // B)
    nb_pad = max(
        1 << int(np.ceil(np.log2(max(nb, 2)))), n_dev
    )
    n_pad = nb_pad * B

    f_p = np.zeros((n_pad, f.shape[1]), np.float32)
    f_p[:n] = f[perm]
    nw_p = np.zeros(n_pad, np.float32)
    nw_p[:n] = nw_h[perm]

    ps = inv[src].astype(np.int32)
    pt = inv[tgt].astype(np.int32)
    ds = np.concatenate([ps, pt])
    dt = np.concatenate([pt, ps])
    dw = np.concatenate([w, w]).astype(np.float32)

    flat_idx, flat_w, of_src, of_tgt, of_w = split_band_edges(
        n_pad, ds, dt, dw
    )
    of_src, of_tgt, of_w = dedup_of_host(of_src, of_tgt, of_w, n_pad)
    # host-side band assembly; each device receives only its block rows
    band = np.zeros(n_pad * WIN, np.float32)
    np.add.at(band, flat_idx, flat_w)
    # bf16 storage, matching ops.cutpursuit_band's quantization so the
    # sharded and single-chip solvers see identical edge weights
    import ml_dtypes
    band_w = band.reshape(nb_pad, B, WIN).astype(ml_dtypes.bfloat16)

    e_of = max(
        n_dev, 1 << int(np.ceil(np.log2(max(len(of_src), 1))))
    )
    of_src_p = np.zeros(e_of, np.int32)
    of_tgt_p = np.zeros(e_of, np.int32)
    of_w_p = np.zeros(e_of, np.float32)
    of_src_p[: len(of_src)] = of_src
    of_tgt_p[: len(of_tgt)] = of_tgt
    of_w_p[: len(of_w)] = of_w

    shard = NamedSharding(mesh, P(axis))
    comp, _ = _solve_band_sharded(
        jax.device_put(f_p, shard),
        jax.device_put(band_w, shard),
        jax.device_put(of_src_p, shard),
        jax.device_put(of_tgt_p, shard),
        jax.device_put(of_w_p, shard),
        jax.device_put(nw_p, shard),
        jnp.float32(reg_strength),
        jnp.float32(weight_decay),
        mesh=mesh,
        axis=axis,
        **solver_kw,
    )
    comp = np.asarray(comp)[:n][inv]

    _, first_pos, invc = np.unique(
        comp, return_index=True, return_inverse=True
    )
    order = np.argsort(np.argsort(first_pos))
    in_comp = order[invc]

    in_comp = merge_regions(
        f, nw_h, in_comp, src, tgt, w, float(reg_strength)
    )
    if cutoff > 0:
        active = in_comp[src] == in_comp[tgt]
        _, in_comp = connected_components(n, src, tgt, active, cutoff)
    return group_components(in_comp), in_comp.astype(np.int32)


# ---------------------------------------------------------------------------
# sharded kNN + geometric features (slab halos — no replicated db)
# ---------------------------------------------------------------------------


def _host_exact_knn(xyz: np.ndarray, queries: np.ndarray, qidx: np.ndarray,
                    k: int, chunk: int = 1 << 19):
    """Chunked exact kNN on the host for the (rare) certificate failures —
    never materializes more than [m, chunk] distances."""
    m = len(queries)
    best_d = np.full((m, k), np.inf, np.float32)
    best_i = np.zeros((m, k), np.int64)
    for s in range(0, len(xyz), chunk):
        blk = xyz[s : s + chunk]
        d2 = (
            (queries[:, None, :] - blk[None, :, :]) ** 2
        ).sum(-1)
        idx = np.arange(s, s + len(blk))[None, :].repeat(m, 0)
        self_mask = idx == qidx[:, None]
        d2[self_mask] = np.inf
        cat_d = np.concatenate([best_d, d2], axis=1)
        cat_i = np.concatenate([best_i, idx], axis=1)
        sel = np.argsort(cat_d, axis=1)[:, :k]
        best_d = np.take_along_axis(cat_d, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
    return best_i, best_d


def _sample_rk_host(xyz: np.ndarray, k: int, sample: int = 256,
                    quantile: float = 0.999) -> float:
    rs = np.random.RandomState(0)
    sel = rs.choice(len(xyz), size=min(sample, len(xyz) - 1), replace=False)
    _, d = _host_exact_knn(xyz, xyz[sel], sel, k)
    return float(np.quantile(np.sqrt(d[:, k - 1]), quantile))


def sharded_knn_geof(
    xyz: np.ndarray,
    k_adj: int,
    k_geof: int,
    mesh: Mesh,
    axis: str = "dp",
    block_q: int = 128,
    cell_margin: float = 1.3,
):
    """kNN graph + geof with the CLOUD sharded: cell-sorted rows split into
    contiguous slabs (one per device) plus a fixed halo of sorted rows sized
    so every in-slab query's 27-cell candidate window is local. Each device
    receives only its slab buffer (host `device_put` into the sharded layout);
    searches and the geof eigen features are purely local. Per-point
    exactness certificates route the rare misses to a chunked host fallback.

    Replaces an earlier replicated-db layout (which scaled FLOPs but not
    memory). Returns (graph_nn dict, geof [n,4], idx [n, k_geof]
    original-order neighbor table)."""
    from ..ops.knn import _CELL_OFFSETS

    n = len(xyz)
    k = k_geof
    n_dev = mesh.shape[axis]
    xyz = np.ascontiguousarray(xyz, np.float32)
    h = max(_sample_rk_host(xyz, k) * cell_margin, 1e-6)
    mins = xyz.min(0)
    coords = np.floor((xyz - mins) / h).astype(np.int64)
    dims = coords.max(0) + 1
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    order = np.argsort(key, kind="stable").astype(np.int64)
    key_s = key[order]

    L = -(-n // (n_dev * block_q)) * block_q
    n_pad = L * n_dev
    nb = n_pad // block_q
    nb_loc = L // block_q

    first = key_s[np.minimum(np.arange(nb) * block_q, n - 1)]
    last = key_s[np.minimum((np.arange(nb) + 1) * block_q - 1, n - 1)]
    offs = np.array(
        [(dx * dims[1] + dy) * dims[2] for dx, dy in _CELL_OFFSETS], np.int64
    )
    starts = np.empty((nb, 9), np.int64)
    ends = np.empty((nb, 9), np.int64)
    for p in range(9):
        starts[:, p] = np.searchsorted(key_s, first + offs[p] - 1, "left")
        ends[:, p] = np.searchsorted(key_s, last + offs[p] + 1, "right")

    # halo: how far any device's windows reach beyond its slab
    blk_dev = np.arange(nb) // nb_loc
    lo_dev = blk_dev * L
    hi_dev = lo_dev + L
    overhang = np.maximum(
        (lo_dev[:, None] - starts).max(1), (ends - hi_dev[:, None]).max(1)
    )
    G = int(max(-(-max(int(overhang.max()), 1) // 128) * 128, 128))
    window = int(
        -(-int((ends - starts).max() + 2 * block_q) // 128) * 128
    )
    window = min(window, L + 2 * G)

    # per-device slab buffers [D, L + 2G] carved from the extended sorted
    # arrays (far pad rows on both flanks)
    xyz_ext = np.full((n_pad + 2 * G, 3), 1e17, np.float32)
    xyz_ext[G : G + n] = xyz[order]
    pad_rows = np.where(xyz_ext[:, 0] >= 1e16)[0]
    xyz_ext[pad_rows] += (pad_rows % (2 * G + 1))[:, None]
    coords_ext = np.full((n_pad + 2 * G, 3), 1 << 30, np.int32)
    coords_ext[G : G + n] = coords[order].astype(np.int32)

    buf_x = np.stack(
        [xyz_ext[d * L : d * L + L + 2 * G] for d in range(n_dev)]
    )
    buf_c = np.stack(
        [coords_ext[d * L : d * L + L + 2 * G] for d in range(n_dev)]
    )
    # window starts local to each device's buffer
    st_loc = (
        starts.reshape(n_dev, nb_loc, 9)
        - (np.arange(n_dev) * L - G)[:, None, None]
    ).astype(np.int32)

    shard = NamedSharding(mesh, P(axis))
    buf_x_d = jax.device_put(buf_x, shard)
    buf_c_d = jax.device_put(buf_c, shard)
    st_d = jax.device_put(st_loc, shard)

    @partial(jax.jit, static_argnames=("kk", "bq", "win"))
    def run(bx, bc, st, *, kk, bq, win):
        def local_fn(bx, bc, st):
            bx, bc, st = bx[0], bc[0], st[0]
            n_buf = bx.shape[0]
            sq = jnp.sum(bx * bx, axis=-1)
            w_iota = jnp.arange(win, dtype=jnp.int32)

            def per_block(args):
                st_row, blk = args
                q0 = G + blk * bq
                q_xyz = jax.lax.dynamic_slice(bx, (q0, 0), (bq, 3))
                q_coord = jax.lax.dynamic_slice(bc, (q0, 0), (bq, 3))
                q_pos = q0 + jnp.arange(bq, dtype=jnp.int32)
                sq_q = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)
                cd_parts, ci_parts = [], []
                for p, (dx, dy) in enumerate(_CELL_OFFSETS):
                    s = jnp.clip(st_row[p], 0, n_buf - win)
                    c_xyz = jax.lax.dynamic_slice(bx, (s, 0), (win, 3))
                    c_coord = jax.lax.dynamic_slice(bc, (s, 0), (win, 3))
                    c_sq = jax.lax.dynamic_slice(sq, (s,), (win,))
                    c_pos = s + w_iota
                    d2 = sq_q + c_sq[None, :] - 2.0 * jnp.dot(
                        q_xyz, c_xyz.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    valid = (
                        (c_coord[None, :, 0] == q_coord[:, None, 0] + dx)
                        & (c_coord[None, :, 1] == q_coord[:, None, 1] + dy)
                        & (jnp.abs(c_coord[None, :, 2]
                                   - q_coord[:, None, 2]) <= 1)
                        & (c_pos[None, :] != q_pos[:, None])
                    )
                    d2 = jnp.where(valid, d2, jnp.float32(3.4e38))
                    cd, sel = jax.lax.approx_min_k(
                        d2, kk, recall_target=0.999
                    )
                    cd_parts.append(cd)
                    ci_parts.append(c_pos[sel])
                cat_d = jnp.concatenate(cd_parts, axis=1)
                cat_i = jnp.concatenate(ci_parts, axis=1)
                neg, arg = jax.lax.top_k(-cat_d, kk)
                best_i = jnp.take_along_axis(cat_i, arg, axis=1)
                diff = q_xyz[:, None, :] - bx[best_i]
                exact = jnp.sum(diff * diff, axis=-1)
                exact = jnp.where(-neg >= 1.7e38, jnp.float32(3.4e38), exact)
                neg, arg = jax.lax.top_k(-exact, kk)
                return (
                    jnp.take_along_axis(best_i, arg, axis=1),
                    jnp.maximum(-neg, 0.0),
                )

            pos, d2 = jax.lax.map(
                per_block, (st, jnp.arange(nb_loc, dtype=jnp.int32))
            )
            pos = pos.reshape(L, kk)
            d2 = d2.reshape(L, kk)
            q_rows = bx[G : G + L]
            geof = _geof_from(q_rows, bx, pos, kk)
            dev = jax.lax.axis_index(axis)
            pos_global = pos + (dev * L - G)
            return pos_global[None], d2[None], geof[None]

        mapped = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )
        return mapped(bx, bc, st)

    pos_g, d2_g, geof_g = run(
        buf_x_d, buf_c_d, st_d, kk=k, bq=block_q, win=window
    )
    pos_g = np.asarray(pos_g).reshape(n_pad, k)[:n]
    d2_g = np.asarray(d2_g).reshape(n_pad, k)[:n]
    geof_g = np.asarray(geof_g).reshape(n_pad, 4)[:n]

    # sorted space -> original order
    order_ext = np.concatenate(
        [order, np.arange(n, n_pad + 2 * G, dtype=np.int64)]
    )
    idx_orig_rows = order_ext[np.clip(pos_g, 0, n_pad + 2 * G - 1)]
    idx = np.empty((n, k), np.int64)
    d2 = np.empty((n, k), np.float32)
    geof = np.empty((n, 4), np.float32)
    idx[order[:n]] = idx_orig_rows
    d2[order[:n]] = d2_g
    geof[order[:n]] = geof_g

    # exactness certificate + chunked host fallback (the halo covers the
    # 27-cell window by construction, so failures are r_k > h stragglers)
    bad = np.sqrt(np.maximum(d2[:, k - 1], 0.0)) > h
    if bad.any():
        qidx = np.where(bad)[0]
        fi, fd = _host_exact_knn(xyz, xyz[qidx], qidx, k)
        idx[qidx] = fi
        d2[qidx] = fd
        geof[qidx] = np.asarray(
            _geof_from(
                jnp.asarray(xyz[qidx]), jnp.asarray(xyz),
                jnp.asarray(fi), k,
            )
        )

    idx = np.clip(idx, 0, n - 1)
    dist = np.sqrt(np.maximum(d2[:, :k_adj], 0.0))
    graph_nn = {
        "is_nn": True,
        "source": np.repeat(np.arange(n, dtype=np.uint32), k_adj),
        "target": idx[:, :k_adj].reshape(-1).astype(np.uint32),
        "distances": dist.reshape(-1).astype(np.float32),
    }
    return graph_nn, geof, idx


def partition_cloud_sharded(
    xyz: np.ndarray,
    rgb: np.ndarray | None,
    cfg,
    mesh: Mesh,
    axis: str = "dp",
):
    """Geometric partition of ONE cloud with kNN/geof/cut-pursuit state
    sharded over the mesh (pipeline.partition_cloud semantics for the
    features+partition stages; prune/SPG stay host-side like the single-chip
    path). Returns (graph_nn, geof, components, in_component)."""
    from ..pipeline import assemble_partition_features, edge_weights

    graph_nn, geof, _ = sharded_knn_geof(
        xyz, cfg.k_nn_adj, cfg.k_nn_geof, mesh, axis=axis
    )
    features = assemble_partition_features(geof, rgb, cfg)
    w = edge_weights(graph_nn["distances"], cfg.lambda_edge_weight)
    components, in_component = cutpursuit_band_sharded(
        features,
        graph_nn["source"].astype(np.int64),
        graph_nn["target"].astype(np.int64),
        w,
        cfg.reg_strength,
        mesh,
        axis=axis,
        cutoff=cfg.cp_cutoff,
        xyz=xyz,
    )
    return graph_nn, geof, components, in_component

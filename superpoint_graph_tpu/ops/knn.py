"""k-nearest-neighbor graph construction, TPU-first.

The reference builds kNN graphs with a host-side sklearn KD-tree
(partition/graphs.py:11-73, `compute_graph_nn` / `compute_graph_nn_2`). A KD-tree
is pointer-chasing and hostile to the MXU; here the kNN is *blocked
brute-force*: squared distances per (query-tile, db-tile) come from one matmul
(|q|^2 + |p|^2 - 2 q.p — MXU work), selection uses the TPU-native
`lax.approx_min_k` (PartialReduce — orders of magnitude faster than a
sort/top_k merge on TPU), tiles are merged by a tiny exact 2k-column top_k, and
the winners are re-ranked with exact distances.

`recall_target` bounds the per-tile chance of missing a true neighbor. The
default 0.95 is a measured sweet spot on v5e: approx_min_k's PartialReduce
emits l candidate columns before an internal top-k aggregation whose cost
grows with l (l=1024 at 0.95 vs l=7552 at 0.99 for 60k rows); 0.95 runs the
60k-point search 4.3x faster at ~99.1% true index agreement vs exact
(self-match excluded), still above the >99% bar (the reference's own
partition is declared stochastic, README.md:32, so the tail is immaterial).
knn_bigcloud also defaults to 0.95: its exactness certificate gates cell
geometry (not selection), and measured agreement at 1e6 points is identical
to the 0.999 setting (99.94%) — selection misses land in the same tail the
certificate already re-solves."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(3.4e38)

# db-tile width for the radius sampler / straggler brute-force legs, and the
# alignment contract a reusable device db must satisfy (every bucketed db
# size is a multiple). 65536-wide approx_min_k tiles are the round-2 compile
# pathology (CLAUDE.md); 8192 tiles compile benignly.
SAMPLE_DB_BLOCK = 8192
# queries per straggler-fallback dispatch: ONE program over all stragglers
# x a >10M-row db runs minutes and the tunneled worker kills it (1e8
# headline, BASELINE.md r5); tests shrink this to force the slice loop
FALLBACK_QUERY_CHUNK = 8192


def _pad_rows(x: jax.Array, to: int, fill: float = 0.0) -> jax.Array:
    n = x.shape[0]
    if n == to:
        return x
    pad = [(0, to - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_db", "exclude_self", "recall_target"),
)
def knn(
    xyz: jax.Array,
    k: int,
    *,
    block_q: int = 1024,
    block_db: int = 65536,
    exclude_self: bool = True,
    recall_target: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """kNN of every point among all points of the same cloud.

    Args:
      xyz: [n, 3] float32 coordinates.
      k: number of neighbors (excluding the point itself when exclude_self).
      block_q / block_db: tile sizes for the query/database dimensions.
      exclude_self: drop the zero-distance self match (reference behavior:
        graphs.py:30-40 queries k+1 and strips column 0).

    Returns:
      (indices [n, k] int32, sq_distances [n, k] float32) ascending.
    """
    n = xyz.shape[0]
    kq = k + (1 if exclude_self else 0)
    block_db = min(block_db, -(-n // 128) * 128)
    block_q = min(block_q, n)
    n_q = -(-n // block_q) * block_q
    n_db = -(-n // block_db) * block_db
    # Padding db points sit far away so they never enter a top-k; padding
    # queries produce garbage rows that are sliced away at the end.
    xq = _pad_rows(xyz, n_q, 0.0)
    xdb = _pad_rows(xyz, n_db, 1e18)
    sq_db = jnp.sum(xdb * xdb, axis=-1)

    n_tiles = n_db // block_db
    db_tiles = xdb.reshape(n_tiles, block_db, 3)
    sq_tiles = sq_db.reshape(n_tiles, block_db)

    def per_query_block(xq_blk):  # [block_q, 3]
        sq_q = jnp.sum(xq_blk * xq_blk, axis=-1, keepdims=True)  # [bq, 1]

        def tile_candidates(db_blk, sq_blk, tile_idx):
            # Precision.HIGHEST: the default (bf16-class) MXU passes lose ~1e-2
            # in d^2, enough to drop true neighbors; full-f32 passes keep the
            # selection exact at ~3x the MXU cost (still matmul-bound).
            d2 = sq_q + sq_blk[None, :] - 2.0 * jnp.dot(
                xq_blk,
                db_blk.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            cd, ci = jax.lax.approx_min_k(d2, kq, recall_target=recall_target)
            return cd, ci + tile_idx * block_db

        if n_tiles == 1:
            best_d, best_i = tile_candidates(db_tiles[0], sq_tiles[0], 0)
        else:

            def scan_tile(carry, tile):
                best_d, best_i = carry
                db_blk, sq_blk, tile_idx = tile
                cd, ci = tile_candidates(db_blk, sq_blk, tile_idx)
                cat_d = jnp.concatenate([best_d, cd], axis=1)
                cat_i = jnp.concatenate([best_i, ci], axis=1)
                neg_top, arg = jax.lax.top_k(-cat_d, kq)  # 2k cols: cheap
                return (
                    (-neg_top, jnp.take_along_axis(cat_i, arg, axis=1)),
                    None,
                )

            init = (
                jnp.full((xq_blk.shape[0], kq), _INF, jnp.float32),
                jnp.full((xq_blk.shape[0], kq), 0, jnp.int32),
            )
            (best_d, best_i), _ = jax.lax.scan(
                scan_tile,
                init,
                (db_tiles, sq_tiles, jnp.arange(n_tiles, dtype=jnp.int32)),
            )
        return best_d, best_i

    xq_blocks = xq.reshape(n_q // block_q, block_q, 3)
    best_d, best_i = jax.lax.map(per_query_block, xq_blocks)
    best_d = best_d.reshape(n_q, kq)[:n]
    best_i = jnp.minimum(best_i.reshape(n_q, kq)[:n], n - 1)

    if exclude_self:
        # The self match has distance ~0 but may not land in column 0 under
        # ties; mask the exact self index then re-take top-k of the remainder.
        self_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
        is_self = best_i == self_idx
        best_d = jnp.where(is_self, _INF, best_d)
        neg_top, arg = jax.lax.top_k(-best_d, k)
        best_i = jnp.take_along_axis(best_i, arg, axis=1)

    # The |q|^2+|p|^2-2qp selection distances suffer float32 cancellation;
    # recompute exact squared distances for the selected k and re-sort so the
    # returned metric matches a direct (q-p)^2 evaluation.
    diff = xyz[:n, None, :] - xyz[best_i]
    exact = jnp.sum(diff * diff, axis=-1)
    neg_top, arg = jax.lax.top_k(-exact, exact.shape[1])
    best_i = jnp.take_along_axis(best_i, arg, axis=1)
    return best_i, jnp.maximum(-neg_top, 0.0)


def knn_vs_db(
    queries: jax.Array,
    db: jax.Array,
    k: int,
    *,
    self_offset: int | jax.Array | None = None,
    block_q: int = 1024,
    block_db: int = 65536,
    recall_target: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    # Host callers MUST go through the jitted entry below: called eagerly,
    # the lax.map/scan/approx_min_k nest recompiles in EVERY process under
    # generic executable names the persistent cache can't serve — measured
    # 235 s per fresh process at 500k db rows (tools/cache_diag_results.json,
    # the whole round-3 "kNN cold residual").
    return _knn_vs_db_impl(
        queries, db, k, self_offset=self_offset, block_q=block_q,
        block_db=block_db, recall_target=recall_target,
    )


@partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_db", "recall_target"),
)
def knn_vs_db_jit(
    queries, db, k: int, *, block_q: int = 1024, block_db: int = 65536,
    recall_target: float = 0.95,
):
    """One-executable form of `knn_vs_db` (self_offset=None) for host call
    sites — the radius sampler and the straggler fallback."""
    return _knn_vs_db_impl(
        queries, db, k, self_offset=None, block_q=block_q,
        block_db=block_db, recall_target=recall_target,
    )


def _knn_vs_db_impl(
    queries: jax.Array,
    db: jax.Array,
    k: int,
    *,
    self_offset: int | jax.Array | None = None,
    block_q: int = 1024,
    block_db: int = 65536,
    recall_target: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """kNN of `queries` among `db` (traceable; for use inside shard_map —
    the building block of the multi-chip giant-cloud partition where each
    device owns a query shard and the db is replicated).

    `self_offset`: when queries are rows [off, off+m) of db, excludes each
    query's own db row. Shapes must be padded by the caller (db pad rows at
    +1e17). Returns (indices [m, k] into db, sq_distances [m, k])."""
    m = queries.shape[0]
    n_db = db.shape[0]
    kq = k + (1 if self_offset is not None else 0)
    block_db = min(block_db, n_db)
    block_q = min(block_q, m)
    assert m % block_q == 0 and n_db % block_db == 0, "caller pads shapes"
    sq_db = jnp.sum(db * db, axis=-1)
    n_tiles = n_db // block_db
    db_tiles = db.reshape(n_tiles, block_db, 3)
    sq_tiles = sq_db.reshape(n_tiles, block_db)

    def per_query_block(xq_blk):
        sq_q = jnp.sum(xq_blk * xq_blk, axis=-1, keepdims=True)

        def tile_candidates(db_blk, sq_blk, tile_idx):
            d2 = sq_q + sq_blk[None, :] - 2.0 * jnp.dot(
                xq_blk, db_blk.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            cd, ci = jax.lax.approx_min_k(d2, kq, recall_target=recall_target)
            return cd, ci + tile_idx * block_db

        if n_tiles == 1:
            return tile_candidates(db_tiles[0], sq_tiles[0], 0)

        def scan_tile(carry, tile):
            best_d, best_i = carry
            cd, ci = tile_candidates(*tile)
            cat_d = jnp.concatenate([best_d, cd], axis=1)
            cat_i = jnp.concatenate([best_i, ci], axis=1)
            neg_top, arg = jax.lax.top_k(-cat_d, kq)
            return ((-neg_top, jnp.take_along_axis(cat_i, arg, axis=1)), None)

        init = (
            jnp.full((xq_blk.shape[0], kq), _INF, jnp.float32),
            jnp.full((xq_blk.shape[0], kq), 0, jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(
            scan_tile, init,
            (db_tiles, sq_tiles, jnp.arange(n_tiles, dtype=jnp.int32)),
        )
        return best_d, best_i

    xq_blocks = queries.reshape(m // block_q, block_q, 3)
    best_d, best_i = jax.lax.map(per_query_block, xq_blocks)
    best_d = best_d.reshape(m, kq)
    best_i = jnp.minimum(best_i.reshape(m, kq), n_db - 1)

    if self_offset is not None:
        self_idx = self_offset + jnp.arange(m, dtype=jnp.int32)[:, None]
        best_d = jnp.where(best_i == self_idx, _INF, best_d)
        neg_top, arg = jax.lax.top_k(-best_d, k)
        best_i = jnp.take_along_axis(best_i, arg, axis=1)

    diff = queries[:, None, :] - db[best_i]
    exact = jnp.sum(diff * diff, axis=-1)
    neg_top, arg = jax.lax.top_k(-exact, exact.shape[1])
    return jnp.take_along_axis(best_i, arg, axis=1), jnp.maximum(-neg_top, 0.0)


# ---------------------------------------------------------------------------
# Big-cloud kNN: sorted-cell contiguous-slice search (the production path for
# clouds beyond brute-force reach — the reference handles these with a
# KD-tree + 24 GB of RAM, graphs.py:26-73 + Semantic3D.md:11).
#
# Design (TPU-first; fixes both measured dead ends in ROADMAP.md):
#   * points are sorted once by lexicographic cell id (cell size h chosen from
#     a sampled exact k-NN radius quantile, NOT from a uniform-3D-density
#     guess — the failure of the old `knn_grid` on surface clouds);
#   * a query's 27-cell neighborhood = 9 (dx,dy) column offsets x a contiguous
#     z-run, and because z is the fastest key axis each (dx,dy) offset is ONE
#     contiguous slice of the sorted array — so candidates arrive via
#     `dynamic_slice` + one MXU matmul per pass, never random gathers (the
#     failure of `knn_grid`), and validity is a cheap per-candidate cell
#     coordinate comparison;
#   * exactness is *verified*, not hoped for (the failure of `knn_window`):
#     any query whose found k-th distance exceeds h — i.e. whose true
#     neighbors might lie outside the 27-cell block — is re-solved by blocked
#     brute force. Geometry misses therefore cost time, not recall.
# ---------------------------------------------------------------------------

_CELL_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(dst, row_ids, values):
    """dst[row_ids] = values, donating dst (in-place update of the big
    result tables; at 1e7x45 each is ~1.8 GB)."""
    return dst.at[row_ids].set(values)


@jax.jit
def _sort_gather(xyz_dev, order, mins, inv_h):
    """Device-side layout for one level: gather sorted xyz, derive cell
    coords (int32 per axis — never a linear int64 key on device). Pad rows
    (xyz ~1e17) clip to a huge sentinel coord no real cell can match."""
    xs = xyz_dev[order]
    cs = jnp.floor((xs - mins[None, :]) * inv_h)
    cs = jnp.clip(cs, -(2.0**30), 2.0**30).astype(jnp.int32)
    return xs, cs


@jax.jit
def _gather_queries(xs, cs, qpos2d):
    return xs[qpos2d], cs[qpos2d]


@jax.jit
def _level_sort(xyz_dev, mins, inv_h, dy_dim):
    """Device 2-key cell sort for one ladder level.

    Per-axis int32 cell coords; x and y fuse into ONE int32 key (caller
    guards Dx*Dy against overflow), z is the second sort key — never an
    int64 flat key (no x64 on this build). Pad rows (xyz ~1e17) clip to a
    huge coord, get the sentinel key, and stable-sort to the tail in
    original order — exactly the host path's `order_full` layout.
    Returns (kxy_s, cz_s, order)."""
    c = jnp.clip(
        jnp.floor((xyz_dev - mins[None, :]) * inv_h), -(2.0**30), 2.0**30
    ).astype(jnp.int32)
    big = jnp.int32(2**31 - 2**22)
    kxy = jnp.where(
        c[:, 0] >= jnp.int32(1 << 30), big, c[:, 0] * dy_dim + c[:, 1]
    )
    iota = jnp.arange(xyz_dev.shape[0], dtype=jnp.int32)
    kxy_s, cz_s, order = jax.lax.sort(
        (kxy, c[:, 2], iota), num_keys=2, is_stable=True
    )
    return kxy_s, cz_s, order


@partial(jax.jit, static_argnames=("p_cap",))
def _pending_positions(order, pending_ids, *, p_cap: int):
    """Sorted-array positions of the pending query ids, ascending: mark the
    ids, gather the mark through `order`, cumsum-compact into a [p_cap]
    buffer. (The host equivalents — an inverse permutation or a boolean
    flatnonzero over a fetched order — cost an O(n) fetch per level.)"""
    n_db = order.shape[0]
    mark = jnp.zeros(n_db, bool).at[pending_ids].set(True)
    mark_s = mark[order]
    pos = jnp.cumsum(mark_s.astype(jnp.int32)) - 1
    tgt = jnp.where(mark_s & (pos < p_cap), pos, p_cap)
    buf = jnp.full(p_cap + 1, n_db - 1, jnp.int32)
    return buf.at[tgt].set(jnp.arange(n_db, dtype=jnp.int32))[:p_cap]


def _lex_lower(kxy_s, cz_s, K, Z):
    """First index i with (kxy_s[i], cz_s[i]) >= (K, Z) lexicographically —
    a statically-unrolled binary search (while_loop carry overhead is ~20 ms
    per iteration on this target, CLAUDE.md)."""
    n_db = kxy_s.shape[0]
    iters = max(1, int(np.ceil(np.log2(max(n_db, 2)))) + 1)
    lo = jnp.zeros(K.shape, jnp.int32)
    hi = jnp.full(K.shape, n_db, jnp.int32)
    for _ in range(iters):
        mid = (lo + hi) // 2
        midc = jnp.minimum(mid, n_db - 1)
        km = kxy_s[midc]
        zm = cz_s[midc]
        less = (km < K) | ((km == K) & (zm < Z))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


@jax.jit
def _level_windows(kxy_s, cz_s, pos_first, pos_last, offs):
    """Per-(query block, cell offset) candidate windows, on device.

    Reproduces the host flat-key probes exactly: window = sorted rows in
    [(kxy_first+off, cz_first-1), (kxy_last+off, cz_last+1)] lexicographic
    (the flat int64 `first + off - 1 .. last + off + 1` searchsorted pair).
    Returns (starts [m, 9] i32, spans [m, 9] i32)."""
    big = jnp.int32(2**31 - 2**23)
    kf = jnp.minimum(kxy_s[pos_first], big)
    kl = jnp.minimum(kxy_s[pos_last], big)
    zf = cz_s[pos_first]
    zl = cz_s[pos_last]
    Kf = kf[:, None] + offs[None, :]
    Kl = kl[:, None] + offs[None, :]
    starts = _lex_lower(kxy_s, cz_s, Kf, zf[:, None] - 1)
    ends = _lex_lower(kxy_s, cz_s, Kl, zl[:, None] + 2)
    return starts.astype(jnp.int32), jnp.maximum(ends - starts, 0).astype(
        jnp.int32
    )


@partial(jax.jit, donate_argnums=(0, 1))
def _scatter_results_pos(out_i, out_d, order, qpos_rows, pos_b, d2_b, n_limit):
    """Scatter one launch's results into the big tables by ORIGINAL ids,
    resolved on device: rows = order[query positions] (pad positions hold
    pad rows -> clamp to the spare row n), ids = order[candidate positions].
    Replaces a host qs bookkeeping array plus an eager order gather."""
    rows = jnp.minimum(order[qpos_rows.reshape(-1)], n_limit)
    ids = order[pos_b.reshape(rows.shape[0], -1)]
    return (
        out_i.at[rows].set(ids),
        out_d.at[rows].set(d2_b.reshape(rows.shape[0], -1)),
    )


@jax.jit
def _gather_order(order, pos):
    return order[pos]


@partial(
    jax.jit,
    static_argnames=("k", "window", "recall_target"),
)
def _knn_cells_q_concat(
    xyz_sorted: jax.Array,
    coords_sorted: jax.Array,
    q_xyz: jax.Array,
    q_coord: jax.Array,
    q_pos: jax.Array,
    starts: jax.Array,
    *,
    k: int,
    window: int,
    recall_target: float = 0.95,
):
    """Single-selection variant of `_knn_cells_q_device`: the 9 candidate
    slices are concatenated into one [bq, 9*window] distance row and selected
    with ONE approx_min_k — measured 3-4x faster per query than the
    9-pass+top_k merge (the merge epilogue, not the distance work, dominated).
    Valid only while 9*window stays below the PartialReduce width that faults
    the TPU compiler (~72k cols at window 8192); the caller switches to the
    per-pass form above that."""
    n_pad = xyz_sorted.shape[0]
    w_iota = jnp.arange(window, dtype=jnp.int32)

    def per_block(args):
        q_xyz, q_coord, q_pos, start_row = args
        sq_q = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)
        cand_xyz, cand_coord, cand_pos = [], [], []
        for p in range(9):
            s = jnp.clip(start_row[p], 0, n_pad - window)
            cand_xyz.append(
                jax.lax.dynamic_slice(xyz_sorted, (s, 0), (window, 3))
            )
            cand_coord.append(
                jax.lax.dynamic_slice(coords_sorted, (s, 0), (window, 3))
            )
            cand_pos.append(s + w_iota)
        c_xyz = jnp.concatenate(cand_xyz, 0)       # [9*window, 3]
        c_coord = jnp.concatenate(cand_coord, 0)
        c_pos = jnp.concatenate(cand_pos, 0)
        c_sq = jnp.sum(c_xyz * c_xyz, -1)
        d2 = sq_q + c_sq[None, :] - 2.0 * jnp.dot(
            q_xyz, c_xyz.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dxy = jnp.asarray(
            [[dx, dy] for dx, dy in _CELL_OFFSETS], jnp.int32
        )
        off = jnp.repeat(dxy, window, axis=0)      # [9*window, 2]
        valid = (
            (c_coord[None, :, 0] == q_coord[:, None, 0] + off[None, :, 0])
            & (c_coord[None, :, 1] == q_coord[:, None, 1] + off[None, :, 1])
            & (jnp.abs(c_coord[None, :, 2] - q_coord[:, None, 2]) <= 1)
            & (c_pos[None, :] != q_pos[:, None])
        )
        d2 = jnp.where(valid, d2, _INF)
        cd, sel = jax.lax.approx_min_k(d2, k, recall_target=recall_target)
        best_i = c_pos[sel]
        diff = q_xyz[:, None, :] - xyz_sorted[best_i]
        exact = jnp.sum(diff * diff, -1)
        exact = jnp.where(cd >= _INF / 2, _INF, exact)
        neg, arg = jax.lax.top_k(-exact, k)
        return (
            jnp.take_along_axis(best_i, arg, axis=1),
            jnp.maximum(-neg, 0.0),
        )

    return jax.lax.map(per_block, (q_xyz, q_coord, q_pos, starts))


# widest concatenated row verified safe on the TPU compiler (window 2048;
# window 4096 already compiles pathologically, 8192 = 73728 cols faults —
# measured 2026-08)
_CONCAT_MAX_COLS = 9 * 2048


@partial(
    jax.jit,
    static_argnames=("k", "window", "recall_target"),
)
def _knn_cells_q_device(
    xyz_sorted: jax.Array,     # [n_db, 3] f32, pad rows at +1e17 (staggered)
    coords_sorted: jax.Array,  # [n_db, 3] i32 cell coords, pad rows huge
    q_xyz: jax.Array,          # [m, bq, 3] query blocks (cell-key sorted)
    q_coord: jax.Array,        # [m, bq, 3]
    q_pos: jax.Array,          # [m, bq] query's own sorted position (-1: pad)
    starts: jax.Array,         # [m, 9] i32 window starts per pass, per block
    *,
    k: int,
    window: int,
    recall_target: float = 0.999,
):
    """kNN of the query blocks against the cell-sorted cloud. The caller
    groups query blocks into window-size buckets so dense regions don't
    inflate everyone's candidate window (selection cost scales with candidate
    volume). Returns (positions [m, bq, k] into sorted order, exact sq-d)."""
    n_pad = xyz_sorted.shape[0]
    sq = jnp.sum(xyz_sorted * xyz_sorted, axis=-1)
    w_iota = jnp.arange(window, dtype=jnp.int32)

    def per_block(args):
        q_xyz, q_coord, q_pos, start_row = args
        bq = q_xyz.shape[0]
        sq_q = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)
        # per-pass approx_min_k, merged once at the end. (Selecting over one
        # concatenated [bq, 9*window] row would be a single PartialReduce, but
        # that shape reliably faults the TPU compiler — measured 2026-08.)
        cd_parts, ci_parts = [], []
        for p, (dx, dy) in enumerate(_CELL_OFFSETS):
            s = jnp.clip(start_row[p], 0, n_pad - window)
            c_xyz = jax.lax.dynamic_slice(xyz_sorted, (s, 0), (window, 3))
            c_coord = jax.lax.dynamic_slice(
                coords_sorted, (s, 0), (window, 3)
            )
            c_sq = jax.lax.dynamic_slice(sq, (s,), (window,))
            c_pos = s + w_iota
            d2 = sq_q + c_sq[None, :] - 2.0 * jnp.dot(
                q_xyz, c_xyz.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            # a candidate is valid for query q iff it lies in cell
            # (qx+dx, qy+dy, qz-1..qz+1) and is not q itself
            valid = (
                (c_coord[None, :, 0] == q_coord[:, None, 0] + dx)
                & (c_coord[None, :, 1] == q_coord[:, None, 1] + dy)
                & (jnp.abs(c_coord[None, :, 2] - q_coord[:, None, 2]) <= 1)
                & (c_pos[None, :] != q_pos[:, None])
            )
            d2 = jnp.where(valid, d2, _INF)
            cd, sel = jax.lax.approx_min_k(
                d2, k, recall_target=recall_target
            )
            cd_parts.append(cd)
            ci_parts.append(c_pos[sel])
        cat_d = jnp.concatenate(cd_parts, axis=1)        # [bq, 9*k]
        cat_i = jnp.concatenate(ci_parts, axis=1)
        neg, arg = jax.lax.top_k(-cat_d, k)
        best_d = -neg
        best_i = jnp.take_along_axis(cat_i, arg, axis=1)
        # exact re-rank: the |q|^2+|p|^2-2qp distances lose ~1e-2 to f32
        # cancellation; recompute (q-p)^2 for the k winners
        diff = q_xyz[:, None, :] - xyz_sorted[best_i]
        exact = jnp.sum(diff * diff, axis=-1)
        exact = jnp.where(best_d >= _INF / 2, _INF, exact)
        neg, arg = jax.lax.top_k(-exact, k)
        return jnp.take_along_axis(best_i, arg, axis=1), jnp.maximum(-neg, 0.0)

    return jax.lax.map(per_block, (q_xyz, q_coord, q_pos, starts))


@partial(jax.jit, static_argnames=("k",), donate_argnums=(0, 1))
def _remap_sorted_to_original(best_i_s, best_d2_s, order, inv, *, k):
    """Sorted-order kNN table -> original point order (row permute + id map).
    Donates the sorted tables so XLA can reuse their HBM (they are dead after
    this call — at 1e7x45 each table is ~1.8 GB)."""
    idx_orig = order[best_i_s]
    return idx_orig[inv], best_d2_s[inv]


def _sample_knn_radius(
    xyz: np.ndarray, k: int, sample: int = 1024, quantile: float = 0.99,
    db_dev=None,
) -> tuple[float, np.ndarray]:
    """Exact k-th-neighbor distance for a random sample of points (blocked
    brute force on device); returns (quantile radius, per-sample r_k).

    `db_dev`: an already-resident far-padded [n_db, 3] db (n_db %
    SAMPLE_DB_BLOCK == 0) to search against — skips rebuilding +
    re-uploading the padded cloud (~40 MB over the tunnel at 1e7)."""
    n = len(xyz)
    rs = np.random.RandomState(0)
    sel = rs.choice(n, size=min(sample, n), replace=False)
    q = np.ascontiguousarray(xyz[sel], np.float32)
    bq = 256
    mq = -(-len(q) // bq) * bq
    if mq > len(q):
        q = np.concatenate([q, np.full((mq - len(q), 3), 2e17, np.float32)])
    # 8192-wide db tiles: approx_min_k over 65536-wide tiles is the round-2
    # compile pathology (CLAUDE.md), and the tunnel pays that compile at
    # FIRST EXECUTION in every process (~300 s, uncacheable client-side —
    # tools/cache_diag_results.json / r4 knn-cold legs); narrow tiles are the
    # same class as the level-search windows (benign), the scan just runs
    # more, cheap MXU tiles
    bdb = SAMPLE_DB_BLOCK
    if db_dev is not None:
        assert db_dev.shape[0] % bdb == 0
        idx, d2 = knn_vs_db_jit(
            jnp.asarray(q), db_dev, k + 1,
            block_q=bq, block_db=bdb, recall_target=0.95,
        )
        idx = np.asarray(idx[: len(sel)])
        d2 = np.asarray(d2[: len(sel)])
        is_self = idx == sel[:, None]
        order = np.argsort(np.where(is_self, -1.0, d2), axis=1)
        d2_sorted = np.take_along_axis(d2, order, axis=1)
        r_k = np.sqrt(np.maximum(d2_sorted[:, k], 0.0))
        return float(np.quantile(r_k, quantile)), r_k
    # bucket the db rows to 2^20 granularity: differently-sized clouds then
    # share the executable (and the persistent-cache key), and recall 0.95
    # compiles ~10x faster than 0.99 (approx_min_k's aggregation top-k width
    # explodes with recall_target — measured 56.7 s vs 5.3 s cold at 6e6 db
    # rows, identical warm time). A missed neighbor only makes the sampled
    # r_k LARGER (found d_k rises), which over-sizes the cell ladder — safe.
    gran = 1 << 20
    # power-of-two buckets below 1M, 2^20 multiples above (shape reuse)
    ndb = (max(65536, 1 << int(np.ceil(np.log2(max(n, 2)))))
           if n <= gran else -(-n // gran) * gran)
    db = np.asarray(xyz, np.float32)
    if ndb > n:
        far = np.full((ndb - n, 3), 1e17, np.float32) + np.arange(
            ndb - n, dtype=np.float32
        )[:, None]
        db = np.concatenate([db, far])
    idx, d2 = knn_vs_db_jit(
        jnp.asarray(q), jnp.asarray(db), k + 1,
        block_q=bq, block_db=bdb, recall_target=0.95,
    )
    idx = np.asarray(idx[: len(sel)])
    d2 = np.asarray(d2[: len(sel)])
    # drop the self column (d==0 at own index)
    is_self = idx == sel[:, None]
    order = np.argsort(np.where(is_self, -1.0, d2), axis=1)
    d2_sorted = np.take_along_axis(d2, order, axis=1)
    r_k = np.sqrt(np.maximum(d2_sorted[:, k], 0.0))
    return float(np.quantile(r_k, quantile)), r_k


def knn_bigcloud(
    xyz: np.ndarray,
    k: int,
    *,
    block_q: int = 128,
    window_cap: int = 8192,
    recall_target: float = 0.95,
    level_quantiles: tuple = ((0.9, 1.1), (0.999, 1.25)),
    extra_level_factor: float = 3.0,
    n_extra_levels: int = 2,
):
    """Scalable kNN for clouds beyond brute-force reach (1e6 .. 1e8 points).

    Replaces the reference's KD-tree (graphs.py:26, 24 GB RAM at Semantic3D
    scale, Semantic3D.md:11) with a MULTI-LEVEL sorted-cell search: level 0
    uses tight cells sized from the median sampled k-NN radius (cheap, covers
    the dense bulk), each later level re-solves only the points whose
    exactness certificate (found d_k <= h) failed, with geometrically larger
    cells; the (tiny) remainder falls back to blocked brute force. Memory is
    O(n); compute is O(n * mean candidate volume) MXU/VPU work. The level
    sorts, candidate windows (lexicographic binary search over the 2-key
    cell order), and result scatters all run on device; per level the host
    only builds block lists and fetches O(P/block) window spans.

    Returns (indices [n, k] int32 in ORIGINAL order, exact sq-distances,
    info) — index/distance tables are device-resident.
    """
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    assert n > k, "need more points than neighbors"
    t_stage = {"sort_and_windows": 0.0, "device_search": 0.0}
    t0 = time.perf_counter()

    mins = xyz.min(0)
    maxs = xyz.max(0)
    # one padded upload: rows n.. are far-away staggered pad points used to
    # fill candidate windows that run past the end of the sorted array.
    # Bucketed to 2^20 granularity above 1M rows: the level-search
    # executables are keyed on the sorted-db shape, so bucketing lets
    # different cloud sizes (and re-runs after pruning drift) reuse both the
    # in-process executables and the persistent-cache entries (the 1e7 cold
    # run was dominated by per-shape compiles, VERDICT r2)
    n_db = n + 4 * window_cap
    if n_db > (1 << 20):
        n_db = -(-n_db // (1 << 20)) * (1 << 20)
    else:
        # power-of-two buckets below 1M: 65536-granularity left 8 distinct
        # db shapes per octave, each paying a full level-executable-family
        # compile on first sight (~3 min; the at-scale 656k-voxel run hit
        # one) — pad waste is a few MB and only the radius/straggler scans
        # see the extra rows
        n_db = max(65536, 1 << int(np.ceil(np.log2(n_db))))
    xyz_pad = np.full((n_db, 3), 1e17, np.float32)
    xyz_pad[:n] = xyz
    xyz_pad[n:] += np.arange(n_db - n, dtype=np.float32)[:, None]
    xyz_dev = jnp.asarray(xyz_pad)
    mins_dev = jnp.asarray(mins)
    t_stage["upload_db"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    # radius sampling (and the final straggler fallback) brute-force against
    # the SAME resident padded db when its row count divides the db block —
    # always true on the bucketed paths (every bucket is a multiple of
    # SAMPLE_DB_BLOCK)
    db_dev = xyz_dev if n_db % SAMPLE_DB_BLOCK == 0 else None
    _, rk = _sample_knn_radius(xyz, k, db_dev=db_dev)
    ladder = [
        max(float(np.quantile(rk, q)) * m, 1e-6) for q, m in level_quantiles
    ]
    for j in range(n_extra_levels):
        ladder.append(ladder[-1] * extra_level_factor)
    ladder = sorted(set(ladder))
    t_stage["radius_sample"] = time.perf_counter() - t0

    out_i = jnp.zeros((n + 1, k), jnp.int32)  # row n = spare for padding
    out_d = jnp.full((n + 1, k), _INF, jnp.float32)
    pending = np.arange(n, dtype=np.int64)
    level_stats = []

    for h in ladder:
        # after level 0, a small straggler set is cheaper to brute-force
        # exactly than to re-sort the cloud for another level
        if len(pending) == 0 or (
            level_stats and len(pending) * n < 4e9
        ):
            break
        t0 = time.perf_counter()
        # few pending queries cluster tightly in key space: small blocks keep
        # their windows near the per-column occupancy instead of the span of
        # 128 scattered queries (coarse levels would otherwise drown in
        # truncation); cap grows since per-level work is bounded by P
        if len(pending) > 65536:
            bq_lvl, cap_lvl = block_q, window_cap
        else:
            bq_lvl, cap_lvl = 8, 4 * window_cap
        # device 2-key cell sort (per-axis int32, xy fused to one int32 key,
        # z second key). The host path — f64-upcast coords, int64 flat keys,
        # a 1e7 argsort and a ~48 MB order upload per level — was ~12 s per
        # level at 1e7 on the 1-core host. The fused key needs
        # (Dx+2)*Dy < 2^31: clamp the cell size so each xy axis has at most
        # 32768 cells — bigger cells only widen candidate windows, and the
        # exactness certificate already handles under-covered queries, so
        # correctness is unaffected (the pre-rewrite int64 host keys had no
        # such limit; mm-scale grids over 100 m extents hit it)
        h = max(
            h,
            float(maxs[0] - mins[0]) / 32000.0,
            float(maxs[1] - mins[1]) / 32000.0,
        )
        Dy = int(np.floor((maxs[1] - mins[1]) / h)) + 3
        Dx = int(np.floor((maxs[0] - mins[0]) / h)) + 3
        kxy_s, cz_s, order_dev = _level_sort(
            xyz_dev, mins_dev, jnp.float32(1.0 / h), jnp.int32(Dy)
        )
        P = len(pending)
        if P == n:
            qpos = np.arange(n, dtype=np.int32)
        else:
            # sorted positions of the pending ids, computed on device (the
            # padded id list marks the last pad row; stable sort puts it at
            # position n_db-1, past the [:P] slice)
            p_cap = max(1024, 1 << int(np.ceil(np.log2(P + 2))))
            pend_pad = np.full(p_cap, n_db - 1, np.int32)
            pend_pad[:P] = pending.astype(np.int32)
            qpos = np.asarray(
                _pending_positions(
                    order_dev, jnp.asarray(pend_pad), p_cap=p_cap
                )
            )[:P]
        m = -(-P // bq_lvl)
        # pad the block list to a power of two so the window-search
        # executable is shape-bucketed; pad blocks point at the last pad row
        # (sentinel key -> empty spans, zeroed below)
        m_pad = 1 << int(np.ceil(np.log2(max(m, 4))))
        pos_first = np.full(m_pad, n_db - 1, np.int32)
        pos_last = np.full(m_pad, n_db - 1, np.int32)
        pos_first[:m] = qpos[np.minimum(np.arange(m) * bq_lvl, P - 1)]
        pos_last[:m] = qpos[
            np.minimum((np.arange(m) + 1) * bq_lvl - 1, P - 1)
        ]
        offs = np.array(
            [dx * Dy + dy for dx, dy in _CELL_OFFSETS], np.int32
        )
        starts_d, spans_d = _level_windows(
            kxy_s, cz_s, jnp.asarray(pos_first), jnp.asarray(pos_last),
            jnp.asarray(offs),
        )
        starts = np.asarray(starts_d)
        spans = np.asarray(spans_d).astype(np.int64)
        spans[m:] = 0
        need = spans.max(axis=1)
        truncated = need > cap_lvl
        t_stage["sort_and_windows"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        xs, cs = _sort_gather(
            xyz_dev, order_dev, mins_dev, jnp.float32(1.0 / h)
        )
        # pad the query list to full blocks with the last far pad row
        P_pad = m_pad * bq_lvl
        qpos_p = np.full(P_pad, n_db - 1, np.int32)
        qpos_p[:P] = qpos
        qpos2d = qpos_p.reshape(m_pad, bq_lvl)

        bad = np.zeros(P_pad, bool)
        bad[:P] |= truncated[np.arange(P) // bq_lvl]
        sizes = []
        s_ = 256
        cap = min(cap_lvl, n_db)
        while s_ < cap:
            sizes.append(s_)
            s_ *= 2
        sizes.append(cap)
        lo = 0
        for size in sizes:
            in_bucket = (need > lo) & (np.minimum(need, cap) <= size)
            lo = size
            mb = int(in_bucket.sum())
            if mb == 0:
                continue
            blk_all = np.where(in_bucket)[0].astype(np.int32)
            # chunked launches bound the transient [chunk*bq, k] result
            # arrays (the full level-0 bucket at 1e7 points is ~5 GB of
            # transients — past HBM together with the persistent tables)
            chunk_blocks = 8192
            for c0 in range(0, mb, chunk_blocks):
                blk = blk_all[c0 : c0 + chunk_blocks]
                mbc = len(blk)
                mb_pad = 1 << int(np.ceil(np.log2(max(mbc, 4))))
                blk_p = np.zeros(mb_pad, np.int32)
                blk_p[:mbc] = blk
                qpos_b = jnp.asarray(qpos2d[blk_p])
                st_b = jnp.asarray(starts[blk_p])
                q_xyz, q_coord = _gather_queries(xs, cs, qpos_b)
                kern = (
                    _knn_cells_q_concat
                    if 9 * size <= _CONCAT_MAX_COLS
                    else _knn_cells_q_device
                )
                pos_b, d2_b = kern(
                    xs, cs, q_xyz, q_coord, qpos_b, st_b,
                    k=k, window=size, recall_target=recall_target,
                )
                # out rows + candidate ids resolved on device from `order`
                # (pad query positions hold pad rows -> clamp to spare row
                # n; duplicate dummy blocks rewrite rows identically)
                out_i, out_d = _scatter_results_pos(
                    out_i, out_d, order_dev, qpos_b, pos_b, d2_b,
                    jnp.int32(n),
                )
                # certificate: found d_k <= h => provably complete
                bad_b = np.asarray(
                    d2_b[:, :, k - 1] > jnp.float32(h * h)
                ).reshape(-1)
                flat = (
                    blk_p[:, None] * bq_lvl
                    + np.arange(bq_lvl, dtype=np.int64)[None, :]
                ).reshape(-1)
                keep = np.zeros(mb_pad * bq_lvl, bool)
                keep[: mbc * bq_lvl] = True
                np.logical_or.at(bad, flat[keep], bad_b[keep])
        level_stats.append(
            {"h": round(h, 5), "queries": int(P),
             "bad": int(bad[:P].sum())}
        )
        # original ids of the still-bad queries: device gather over `order`
        # at their sorted positions (only the bad subset crosses the tunnel)
        bad_idx = np.flatnonzero(bad[:P])
        if len(bad_idx):
            bp = 1 << int(np.ceil(np.log2(max(len(bad_idx), 2))))
            pos_arr = np.full(bp, n_db - 1, np.int32)
            pos_arr[: len(bad_idx)] = qpos_p[bad_idx]
            pending = np.asarray(
                _gather_order(order_dev, jnp.asarray(pos_arr))
            )[: len(bad_idx)].astype(np.int64)
        else:
            pending = np.zeros(0, np.int64)
        t_stage["device_search"] += time.perf_counter() - t0

    # exact blocked brute force for the stragglers (isolated points whose
    # k-NN ball outgrew every ladder level)
    t0 = time.perf_counter()
    n_bad = len(pending)
    if n_bad:
        fidx_all = pending.astype(np.int64)
        bq = 256
        bdb = SAMPLE_DB_BLOCK  # 65536-wide approx_min_k pathology as above
        if db_dev is not None:
            # reuse the resident padded db (no ~40 MB host rebuild + upload)
            db_arr = db_dev
        else:
            gran2 = 1 << 20
            ndb2 = (max(65536, 1 << int(np.ceil(np.log2(max(n, 2)))))
                    if n <= gran2 else -(-n // gran2) * gran2)
            db = np.full((ndb2, 3), 0, np.float32)
            db[:n] = xyz
            if ndb2 > n:
                db[n:] = 1e17 + np.arange(ndb2 - n, dtype=np.float32)[:, None]
            db_arr = jnp.asarray(db)
        # BOUNDED query slices per dispatch: one knn_vs_db_jit program over
        # tens of thousands of stragglers x a >10M-row db runs for minutes
        # and the tunneled TPU worker KILLS it ("worker crashed or
        # restarted" kernel fault — the 1e8 Semantic3D headline at 12.8M
        # voxels, r5; the isolated 256-query program at the same db shape
        # runs fine). 8192 queries x 13.6M rows ~ a few seconds per program.
        # Query rows bucket to powers of two (recall 0.95 one-shots, same
        # envelope as the ladder) so straggler counts reuse executables.
        fb_chunk = FALLBACK_QUERY_CHUNK
        for s0 in range(0, n_bad, fb_chunk):
            fidx = fidx_all[s0 : s0 + fb_chunk]
            nb = len(fidx)
            mq = max(bq, 1 << int(np.ceil(np.log2(max(nb, 2)))))
            q = np.full((mq, 3), 2e17, np.float32)
            q[:nb] = xyz[fidx]
            fi, fd = knn_vs_db_jit(
                jnp.asarray(q), db_arr, k + 1,
                block_q=bq, block_db=bdb, recall_target=0.95,
            )
            fi = np.asarray(fi[:nb])
            fd = np.asarray(fd[:nb])
            is_self = fi == fidx[:, None]
            ordr = np.argsort(np.where(is_self, _INF, fd), axis=1)[:, :k]
            fi = np.take_along_axis(fi, ordr, axis=1).astype(np.int32)
            fd = np.take_along_axis(fd, ordr, axis=1)
            out_i = _scatter_rows(
                out_i, jnp.asarray(fidx.astype(np.int32)), jnp.asarray(fi)
            )
            out_d = _scatter_rows(
                out_d, jnp.asarray(fidx.astype(np.int32)),
                jnp.asarray(fd.astype(np.float32)),
            )
    t_stage["check_and_fallback"] = time.perf_counter() - t0

    info = {
        "h": ladder[-1],
        "levels": level_stats,
        "n_fallback": int(n_bad),
        "window": window_cap,
        "n_blocks": -(-n // block_q),
        "stage_seconds": {k_: round(v, 3) for k_, v in t_stage.items()},
    }
    return out_i[:n], out_d[:n], info


def compute_graph_nn(xyz: np.ndarray, k_nn: int):
    """Single-k kNN graph (reference graphs.py:11-24)."""
    graph, _ = compute_graph_nn_2(xyz, k_nn, k_nn)
    return graph


BIGCLOUD_THRESHOLD = 300_000  # points; above this brute force stops paying


@partial(jax.jit, static_argnames=("k_geof", "k_adj"))
def _knn_with_adj(xyz_in, *, k_geof: int, k_adj: int):
    """knn + the [:, :k_adj] adjacency columns in ONE executable — each
    eager slice on the tunneled backend costs a ~10-20 ms RPC."""
    idx, d2 = knn(xyz_in, k_geof)
    return idx, d2, idx[:, :k_adj], d2[:, :k_adj]


def compute_graph_nn_2(
    xyz: np.ndarray, k_nn_adj: int, k_nn_geof: int, voronoi: float = 0.0,
    return_device: bool = False, bigcloud_threshold: int | None = None,
    defer_fetch: bool = False,
):
    """Adjacency graph + feature-neighborhood table in one search.

    Mirrors the contract of reference partition/graphs.py:26-73: one kNN query
    at max(k_adj, k_geof); the first k_adj columns become the partition graph
    (source/target/distances), the first k_geof columns the flat geof target
    list. With `voronoi > 0`, Delaunay tetrahedra edges shorter (squared) than
    `voronoi` are merged with the kNN edges and deduped (graphs.py:42-64);
    unlike the reference — whose voronoi branch leaves `distances` covering
    only the Delaunay subset — distances here are recomputed for the full
    merged edge set (documented divergence; the consistent array is what
    downstream edge weights need).

    Returns a dict graph {source, target, distances} (uint32/float32) and
    target_geof [n, k_nn_geof] uint32.

    `defer_fetch` (requires return_device, no voronoi): the graph dict is
    returned with the device->host copy of the adjacency columns only
    STARTED (copy_to_host_async) — `materialize_graph_nn(graph)` completes
    it. Lets the caller dispatch more device work (geof) under the ~5 MB
    tunnel transfer instead of blocking on it (measured 0.16 s at 60k).
    """
    assert k_nn_adj <= k_nn_geof
    n = xyz.shape[0]
    if bigcloud_threshold is None:
        bigcloud_threshold = BIGCLOUD_THRESHOLD
    # bucket the cloud size to the next power of two so differently-sized
    # clouds share one compiled executable (pad points live at +1e17 and are
    # sliced away; they can never enter a real point's top-k)
    n_pad = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
    if n > bigcloud_threshold:
        # sorted-cell search: O(n*window) instead of O(n^2); exactness
        # verified per point (see knn_bigcloud)
        bi, bd2, _ = knn_bigcloud(np.asarray(xyz, np.float32), k_nn_geof)
        idx_dev = jnp.pad(bi, ((0, n_pad - n), (0, 0)))
        d2_dev = jnp.pad(bd2, ((0, n_pad - n), (0, 0)), constant_values=_INF)
        idx_adj_dev = idx_dev[:n, :k_nn_adj]
        d2_adj_dev = d2_dev[:n, :k_nn_adj]
    else:
        if n_pad > n:
            far = np.full((n_pad - n, 3), 1e17, np.float32) + np.arange(
                n_pad - n, dtype=np.float32
            )[:, None]
            xyz_in = np.concatenate([np.asarray(xyz, np.float32), far])
        else:
            xyz_in = np.asarray(xyz, np.float32)
        # fused: the adjacency columns come out of the SAME executable
        # ([n_pad, k_adj] incl. pad rows — sliced to n on host after the
        # fetch); eager [:n, :k] slices cost one tunnel RPC each
        idx_dev, d2_dev, idx_adj_dev, d2_adj_dev = _knn_with_adj(
            jnp.asarray(xyz_in, jnp.float32), k_geof=k_nn_geof,
            k_adj=k_nn_adj,
        )
    # fetch only the adjacency columns (k_adj << k_geof); the geof neighbor
    # table stays ON DEVICE for ops/geof — device->host transfers over a
    # tunneled chip are the hidden cost of the features stage
    idx = idx_dev[:n]
    if defer_fetch and return_device and voronoi == 0:
        for a in (idx_adj_dev, d2_adj_dev):
            try:
                a.copy_to_host_async()
            except Exception:
                pass  # backend without async copies: materialize blocks
        graph = {
            "is_nn": True,
            "_deferred": (n, k_nn_adj, idx_adj_dev, d2_adj_dev),
        }
        dev = {"idx": idx_dev, "d2": d2_dev, "n_pad": n_pad}
        return graph, idx[:, :k_nn_geof], dev
    idx_adj = np.asarray(idx_adj_dev)[:n]
    dist = np.sqrt(np.asarray(d2_adj_dev)[:n])
    source = np.repeat(np.arange(n, dtype=np.uint32), k_nn_adj)
    target = idx_adj.reshape(-1).astype(np.uint32)
    distances = dist.reshape(-1).astype(np.float32)

    if voronoi > 0:
        from scipy.spatial import Delaunay

        tets = Delaunay(np.asarray(xyz, np.float64)).simplices
        pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        vsrc = np.concatenate([tets[:, a] for a, _ in pairs]).astype(np.int64)
        vtgt = np.concatenate([tets[:, b] for _, b in pairs]).astype(np.int64)
        d2 = ((np.asarray(xyz)[vsrc] - np.asarray(xyz)[vtgt]) ** 2).sum(1)
        keep = d2 < voronoi
        vsrc, vtgt = vsrc[keep], vtgt[keep]
        merged_src = np.concatenate([vsrc, source.astype(np.int64)])
        merged_tgt = np.concatenate([vtgt, target.astype(np.int64)])
        edge_id = merged_src + np.int64(n) * merged_tgt
        _, uniq = np.unique(edge_id, return_index=True)
        source = merged_src[uniq].astype(np.uint32)
        target = merged_tgt[uniq].astype(np.uint32)
        distances = np.sqrt(
            ((np.asarray(xyz)[source] - np.asarray(xyz)[target]) ** 2).sum(1)
        ).astype(np.float32)

    graph = {
        "is_nn": True,
        "source": source,
        "target": target,
        "distances": distances,
    }
    if return_device:
        # un-sliced [n_pad, k] device handles for the one-program partition
        # (cutpursuit_band_device) — pad rows' edges are masked there by
        # src >= n
        dev = {"idx": idx_dev, "d2": d2_dev, "n_pad": n_pad}
        return graph, idx[:, :k_nn_geof], dev
    # device array (int32); callers needing uint32 numpy cast lazily
    return graph, idx[:, :k_nn_geof]


def materialize_graph_nn(graph: dict) -> dict:
    """Complete a `defer_fetch` graph in place: finish the async adjacency
    copy and assemble source/target/distances. Idempotent."""
    deferred = graph.pop("_deferred", None)
    if deferred is None:
        return graph
    n, k_nn_adj, idx_adj_dev, d2_adj_dev = deferred
    # the deferred handles may carry n_pad rows (fused small-cloud path) —
    # slice to the real count AFTER the (async-completed) fetch
    idx_adj = np.asarray(idx_adj_dev)[:n]
    dist = np.sqrt(np.maximum(np.asarray(d2_adj_dev)[:n], 0.0))
    graph["source"] = np.repeat(np.arange(n, dtype=np.uint32), k_nn_adj)
    graph["target"] = idx_adj.reshape(-1).astype(np.uint32)
    graph["distances"] = dist.reshape(-1).astype(np.float32)
    return graph

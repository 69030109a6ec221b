"""k-nearest-neighbor graph construction, TPU-first.

The reference builds kNN graphs with a host-side sklearn KD-tree
(partition/graphs.py:11-73, `compute_graph_nn` / `compute_graph_nn_2`). A KD-tree
is pointer-chasing and hostile to the MXU; here the kNN is *blocked
brute-force*: squared distances per (query-tile, db-tile) come from one matmul
(|q|^2 + |p|^2 - 2 q.p — MXU work), selection uses the TPU-native
`lax.approx_min_k` (PartialReduce — orders of magnitude faster than a
sort/top_k merge on TPU), tiles are merged by a tiny exact 2k-column top_k, and
the winners are re-ranked with exact distances.

`recall_target` bounds the per-tile chance of missing a true neighbor
(>99% index agreement with a KD-tree measured at 0.99; the reference's own
partition is declared stochastic, README.md:32, so the tail is immaterial).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(3.4e38)


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
    recall_target: float = 0.99,
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


def compute_graph_nn(xyz: np.ndarray, k_nn: int):
    """Single-k kNN graph (reference graphs.py:11-24)."""
    graph, _ = compute_graph_nn_2(xyz, k_nn, k_nn)
    return graph


def compute_graph_nn_2(
    xyz: np.ndarray, k_nn_adj: int, k_nn_geof: int, voronoi: float = 0.0
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
    """
    assert k_nn_adj <= k_nn_geof
    n = xyz.shape[0]
    # bucket the cloud size to the next power of two so differently-sized
    # clouds share one compiled executable (pad points live at +1e17 and are
    # sliced away; they can never enter a real point's top-k)
    n_pad = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
    if n_pad > n:
        far = np.full((n_pad - n, 3), 1e17, np.float32) + np.arange(
            n_pad - n, dtype=np.float32
        )[:, None]
        xyz_in = np.concatenate([np.asarray(xyz, np.float32), far])
    else:
        xyz_in = np.asarray(xyz, np.float32)
    idx, d2 = knn(jnp.asarray(xyz_in, jnp.float32), k_nn_geof)
    idx = np.asarray(idx)[:n]
    dist = np.sqrt(np.asarray(d2)[:n])
    source = np.repeat(np.arange(n, dtype=np.uint32), k_nn_adj)
    target = idx[:, :k_nn_adj].reshape(-1).astype(np.uint32)
    distances = dist[:, :k_nn_adj].reshape(-1).astype(np.float32)

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
    return graph, idx[:, :k_nn_geof].astype(np.uint32)

"""Pallas fused nearest-neighbor (1-NN) kernel.

The hot op of label upsampling (reference interpolate_labels /
interpolate_labels_batch, provider.py:637-687: 1-NN from every raw point of a
1e8-point Semantic3D cloud into the pruned cloud) and of the S3DIS annotation
re-association (provider.py:200-212).

Why Pallas: the XLA formulation materializes a [block_q, m] distance tile to
HBM and reads it back for the argmin — 2x the tile bytes of HBM traffic per
query block. This kernel computes each distance tile in VMEM and folds it
into a running (min, argmin) immediately; HBM traffic is just the db stream.
Pattern per the TPU guide: 2-D grid (query blocks x db tiles), accumulator
in the output refs, @pl.when(j==0) initialization, MXU matmul for the cross
term, broadcasted_iota + select for the argmin.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 3.4e38  # python float: jnp constants would be captured by the kernel


def _nn1_kernel(q_ref, db_ref, sqdb_ref, best_d_ref, best_i_ref, *, tile: int):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_d_ref[:] = jnp.full(best_d_ref.shape, _BIG, jnp.float32)
        best_i_ref[:] = jnp.zeros(best_i_ref.shape, jnp.int32)

    q = q_ref[:]                       # [bq, 3]
    db = db_ref[:]                     # [T, 3]
    sq_db = sqdb_ref[:]                # [1, T]
    # |q - p|^2 = |q|^2 + |p|^2 - 2 q.p ; |q|^2 is constant per row and does
    # not affect the argmin, so it is omitted entirely.
    cross = jnp.dot(
        q, db.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full-f32 passes: near-tie safe
    )  # [bq, T]
    d2 = sq_db - 2.0 * cross

    tile_min = jnp.min(d2, axis=1, keepdims=True)                 # [bq, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    masked_cols = jnp.where(d2 <= tile_min, cols, jnp.int32(2**30))
    tile_arg = jnp.min(masked_cols, axis=1, keepdims=True) + j * tile

    upd = tile_min < best_d_ref[:]
    best_d_ref[:] = jnp.where(upd, tile_min, best_d_ref[:])
    best_i_ref[:] = jnp.where(upd, tile_arg, best_i_ref[:])


@functools.partial(jax.jit, static_argnames=("block_q", "tile", "interpret"))
def _nn1_call(queries, db, *, block_q: int, tile: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nq = queries.shape[0]
    m = db.shape[0]
    sq_db = jnp.sum(db * db, axis=1)[None, :]  # [1, m]
    grid = (nq // block_q, m // tile)
    kernel = functools.partial(_nn1_kernel, tile=tile)
    best_d, best_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
        ],
        interpret=interpret,
    )(queries, db, sq_db)
    return best_i[:, 0], best_d[:, 0]


def nn1(db: np.ndarray, queries: np.ndarray, block_q: int = 512,
        tile: int = 2048):
    """Index of the nearest db point for every query (exact).

    Falls back to interpret mode off-TPU (tests) — same semantics.
    """
    db = np.ascontiguousarray(db, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    m, n = len(db), len(queries)
    if m == 0 or n == 0:
        return np.zeros(0, np.int64)
    interpret = jax.default_backend() != "tpu"
    # pad db with far points and queries to POWER-OF-TWO buckets (>= one
    # tile/block): the grid shape is baked into the executable, so exact-size
    # padding would recompile for every distinct cloud/object size
    m_pad = 1 << max(int(np.ceil(np.log2(max(m, tile)))), 0)
    n_pad = 1 << max(int(np.ceil(np.log2(max(n, block_q)))), 0)
    if m_pad > m:
        far = np.full((m_pad - m, 3), 1e17, np.float32)
        db = np.concatenate([db, far])
    if n_pad > n:
        queries = np.concatenate(
            [queries, np.zeros((n_pad - n, 3), np.float32)]
        )
    idx, _ = _nn1_call(
        jnp.asarray(queries), jnp.asarray(db), block_q=block_q, tile=tile,
        interpret=interpret,
    )
    return np.asarray(idx)[:n].astype(np.int64)

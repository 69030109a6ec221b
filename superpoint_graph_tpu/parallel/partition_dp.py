"""Multi-chip partition of ONE giant cloud: kNN + geometric features sharded
over the device mesh.

SURVEY.md §2.7/§5.7: the reference scales to 1e8-point clouds only by
reduction and streaming on one machine; here the dominant partition stages
shard across chips. Layout: query rows sharded over the dp axis, the cloud
(db) replicated — each device brute-forces its query shard against the full
cloud and computes its shard's geometric features. Zero collectives in the
forward (embarrassingly parallel over queries); results concatenate by
construction.

The cut-pursuit stage stays single-chip for now (its edge graph is global);
sharding it via halo-exchanged neighbor matrices is the roadmap follow-up.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops.knn import knn_vs_db


def _geof_from(queries, db, nbrs, k):
    """linearity/planarity/scattering/verticality of [self; k db-neighbors]
    (same math as ops/geof.compute_geof, with self taken from the query shard)."""
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


def make_sharded_knn_geof(mesh: Mesh, k_geof: int, axis: str = "dp",
                          block_q: int = 1024):
    """Returns fn(queries_sharded [n,3], db_replicated [n_db,3]) ->
    (neighbors [n,k], sq_dists [n,k], geof [n,4]) with rows sharded on `axis`.
    """
    n_dev = mesh.shape[axis]

    def local_fn(q_shard, db):
        # q_shard: [n/n_dev, 3] local rows; db replicated
        shard = q_shard.shape[0]
        my_off = jax.lax.axis_index(axis) * shard
        idx, d2 = knn_vs_db(
            q_shard, db, k_geof, self_offset=my_off, block_q=min(block_q, shard)
        )
        geof = _geof_from(q_shard, db, idx, k_geof)
        return idx, d2, geof

    mapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_partition_features(
    xyz: np.ndarray, k_nn_adj: int, k_nn_geof: int, mesh: Mesh,
    axis: str = "dp",
):
    """Drop-in for pipeline.partition_features over a device mesh.

    Pads the cloud so rows divide evenly across devices; returns the same
    (graph_nn dict, geof) contract."""
    n = len(xyz)
    n_dev = mesh.shape[axis]
    chunk = 256
    n_pad = -(-n // (n_dev * chunk)) * (n_dev * chunk)
    far = np.full((n_pad - n, 3), 1e17, np.float32) + np.arange(
        max(n_pad - n, 0), dtype=np.float32
    )[:, None]
    xq = np.concatenate([np.asarray(xyz, np.float32), far]) if n_pad > n else (
        np.asarray(xyz, np.float32)
    )
    fn = make_sharded_knn_geof(mesh, k_geof=k_nn_geof, axis=axis)
    q_sharded = jax.device_put(
        jnp.asarray(xq), NamedSharding(mesh, P(axis))
    )
    db = jax.device_put(jnp.asarray(xq), NamedSharding(mesh, P()))
    idx, d2, geof = fn(q_sharded, db)
    idx = np.asarray(idx)[:n]
    dist = np.sqrt(np.asarray(d2)[:n])
    geof = np.asarray(geof)[:n]
    source = np.repeat(np.arange(n, dtype=np.uint32), k_nn_adj)
    graph_nn = {
        "is_nn": True,
        "source": source,
        "target": idx[:, :k_nn_adj].reshape(-1).astype(np.uint32),
        "distances": dist[:, :k_nn_adj].reshape(-1).astype(np.float32),
    }
    return graph_nn, geof

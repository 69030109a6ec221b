"""Giant-cloud geometric partition: one cloud far beyond single-solve reach.

The reference's large-scale path (Semantic3D, partition/partition.py:113-189
with `--ver_batch` chunked reads + 24 GB KD-tree, Semantic3D.md:11) prunes a
1e8-point station to ~1e6-1e7 voxels and then runs kNN + geof + one
monolithic cut pursuit on the host. Here every stage is bounded for TPU HBM:

* kNN — `ops.knn.knn_bigcloud` (multi-level sorted cells, device tables).
* geof — row-chunked over the device kNN table (`ops.geof.compute_geof_rows`
  keeps the [chunk, k+1, 3] gather transient bounded).
* cut pursuit — the block-banded solver's [NB, B, WIN] band costs ~5 KB per
  point, so one solve caps near 1e6 points per chip. Beyond that the cloud
  is split into MORTON-CONTIGUOUS chunks solved independently (dropping
  cross-chunk edges), and the chunk boundaries are HEALED by the global
  backward merge step (`ops.cutpursuit.merge_regions` runs over the full
  edge list, so any beneficial cross-chunk merge is taken — the same
  backward step the monolithic solver already runs). Morton chunks have
  surface-proportional boundaries, so the approximation is the thin shell
  the merge step was designed to clean up.

Dispatched automatically by `pipeline.partition_cloud` when the pruned cloud
exceeds `CHUNKED_CP_THRESHOLD` points.
"""
from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from .graph.spg import compute_sp_graph
from .ops.components import connected_components, group_components
from .ops.cutpursuit import merge_regions
from .ops.cutpursuit_band import cutpursuit_band, morton_order
from .ops.geof import compute_geof_rows
from .ops.knn import knn_bigcloud

# above this the band solver's [NB, B, WIN] edge band plus its solve
# transients (w_intra, same_band) crowd HBM next to the kNN tables
# (n_pad 2^20 -> band 5.4 GB bf16 + w_intra 5.4 + same_band 2.7): chunk
CHUNKED_CP_THRESHOLD = 1 << 19


def chunked_cutpursuit(
    features: np.ndarray,
    xyz: np.ndarray,
    src: np.ndarray,
    tgt: np.ndarray,
    w: np.ndarray,
    reg_strength: float,
    cutoff: int = 0,
    chunk_points: int = 1 << 19,
    **solver_kw,
):
    """Cut pursuit on an arbitrarily large graph with bounded device memory.

    Solves Morton-contiguous chunks independently (band solver, intra-chunk
    edges only), then heals chunk boundaries with the global backward merge
    step over the FULL edge list. Returns (components, in_component)."""
    n = len(features)
    xyz = np.asarray(xyz)
    perm = morton_order(xyz)
    halo = chunk_points // 8
    # core stride chosen so the halo-extended SOLVE window never exceeds
    # chunk_points — the band solver buckets n_pad to powers of two, and one
    # extra doubling at 2^20 costs ~5 GB of band
    stride = max(chunk_points - 2 * halo, 1)
    n_chunks = -(-n // stride)
    mpos = np.empty(n, np.int64)
    mpos[perm] = np.arange(n)

    src = np.asarray(src, np.int64)
    tgt = np.asarray(tgt, np.int64)
    in_comp = np.empty(n, np.int64)
    local = np.full(n, -1, np.int64)
    base = 0
    ps, pt = mpos[src], mpos[tgt]
    for c in range(n_chunks):
        s, e = c * stride, min((c + 1) * stride, n)
        # halo-extended solve window: boundary points see their real
        # neighborhood, so core labels match the monolithic solve; only the
        # core rows' labels are kept
        x0, x1 = max(0, s - halo), min(n, e + halo)
        rows = perm[x0:x1]
        local[rows] = np.arange(x1 - x0)
        emask = (ps >= x0) & (ps < x1) & (pt >= x0) & (pt < x1)
        _, ic_ext = cutpursuit_band(
            features[rows],
            local[src[emask]],
            local[tgt[emask]],
            w[emask],
            reg_strength,
            xyz=xyz[rows],
            # NOTE: the per-chunk merge is NOT redundant with the global
            # heal: it shrinks ~1e5 raw split regions per chunk over cheap
            # chunk-local edges first; skipping it (merge=False) ballooned
            # the global heal 5 s -> ~180 s at 2e6 (measured)
            **solver_kw,
        )
        core = ic_ext[s - x0 : s - x0 + (e - s)].astype(np.int64)
        # renumber the labels that actually appear on the core
        _, core = np.unique(core, return_inverse=True)
        in_comp[perm[s:e]] = base + core
        base += int(core.max()) + 1 if len(core) else 0

    # boundary heal: the backward merge step over the full edge list takes
    # any beneficial cross-chunk merge (and any remaining intra-chunk one)
    in_comp = merge_regions(
        features, np.ones(n), in_comp, src, tgt, w, float(reg_strength)
    )
    if cutoff > 0:
        active = in_comp[src] == in_comp[tgt]
        _, in_comp = connected_components(n, src, tgt, active, cutoff)
    components = group_components(in_comp)
    return components, in_comp.astype(np.int32)


def partition_cloud_big(
    xyz: np.ndarray,
    rgb=None,
    labels=None,
    objects=None,
    n_labels: int = 0,
    cfg=None,
    chunk_points: int = 1 << 19,
    geof_chunk: int = 1 << 21,
):
    """Full partition (prune -> kNN -> geof -> CP -> SPG) of one giant cloud
    on a single chip, all stages memory-bounded. Returns a PartitionResult
    (same contract as pipeline.partition_cloud)."""
    from .ops import voxel
    from .pipeline import (
        PartitionConfig, PartitionResult, assemble_partition_features,
        edge_weights,
    )

    if cfg is None:
        cfg = PartitionConfig()
    times = {}
    t0 = time.perf_counter()
    if cfg.voxel_width > 0:
        n_obj = (
            int(objects.max()) + 1
            if objects is not None and np.size(objects)
            else 0
        )
        xyz, rgb, labels, _ = voxel.prune(
            xyz, cfg.voxel_width,
            rgb if rgb is not None else np.zeros((len(xyz), 3), np.uint8),
            labels, objects, n_labels, n_obj,
        )
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)

    bi, bd2, info = knn_bigcloud(xyz, cfg.k_nn_geof)
    # adjacency columns to host (the only big fetch: n * k_adj * 8 bytes)
    idx_adj = np.asarray(bi[:, : cfg.k_nn_adj])
    dist = np.sqrt(np.maximum(np.asarray(bd2[:, : cfg.k_nn_adj]), 0.0))

    xyz_dev = jnp.asarray(xyz)
    geof = np.empty((n, 4), np.float32)
    for s in range(0, n, geof_chunk):
        e = min(n, s + geof_chunk)
        geof[s:e] = np.asarray(
            compute_geof_rows(xyz_dev, xyz_dev[s:e], bi[s:e])
        )
    del bi, bd2
    times["features"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    src = np.repeat(np.arange(n, dtype=np.int64), cfg.k_nn_adj)
    tgt = idx_adj.reshape(-1).astype(np.int64)
    distances = dist.reshape(-1).astype(np.float32)
    w = edge_weights(distances, cfg.lambda_edge_weight)
    features = assemble_partition_features(geof, rgb, cfg)
    components, in_component = chunked_cutpursuit(
        features, xyz, src, tgt, w, cfg.reg_strength,
        cutoff=cfg.cp_cutoff, chunk_points=chunk_points,
    )
    times["partition"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from .graph.spg_device import compute_sp_graph_device

    graph_sp = compute_sp_graph_device(
        xyz, cfg.d_se_max, in_component, components, labels, n_labels,
        idx_adj=idx_adj,
    )
    times["spg"] = time.perf_counter() - t0
    times["knn_info"] = info.get("stage_seconds")

    graph_nn = {
        "is_nn": True,
        "source": src.astype(np.uint32),
        "target": tgt.astype(np.uint32),
        "distances": distances,
    }
    return PartitionResult(
        xyz=xyz,
        rgb=np.asarray(rgb) if rgb is not None
        else np.zeros((n, 3), np.uint8),
        labels=np.asarray(labels) if labels is not None else np.zeros(0),
        geof=geof,
        graph_nn=graph_nn,
        components=components,
        in_component=in_component,
        graph_sp=graph_sp,
        times=times,
    )

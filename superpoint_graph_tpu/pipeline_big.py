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

import jax
from functools import partial

from .ops.components import relabel_connected
from .ops.cutpursuit import _densify_first_occurrence, merge_regions
from .ops.cutpursuit_band import (
    _prep_band_chunk, _solve_band, cutpursuit_band, morton_order,
    morton_perm_device,
)
from .ops.geof import compute_geof_rows
from .ops.knn import knn_bigcloud
from .ops.merge_device import LAST_MERGE_STATS, merge_regions_device

# stage split of the last chunked_cutpursuit_device call (observability for
# the giant-cloud tools; same pattern as cutpursuit_band.LAST_SOLVE_STATS)
LAST_CP_STATS: dict = {}

# above this the band solver's [NB, B, WIN] edge band plus its solve
# transients (w_intra, same_band) crowd HBM next to the kNN tables
# (n_pad 2^20 -> band 5.4 GB bf16 + w_intra 5.4 + same_band 2.7): chunk
CHUNKED_CP_THRESHOLD = 1 << 19

# (a columnar SPGT_GEOF_COLS geof variant existed through round 3; the
# on-chip A/B showed it 3.4x slower AND numerically divergent at
# eigen-degenerate neighborhoods — removed, tools/geof_ab_results.json)


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
    # Per-region split accept + deeper outer loop: the chunked-path default.
    # Global accept lets ONE bad ICM split reject the whole outer iteration
    # AND end the loop — at 656k voxels it under-segmented 2.2x vs the exact
    # solver (6,725 comps vs 15,009, energy +16%); region accept recovers it
    # (12,7xx comps, energy +7%, OOA 96.8) and is FASTER at max_iter=16
    # (39 s vs 112 s) because rejected regions saturate instead of killing
    # the iteration (tools/atscale_knobs_results.json).
    solver_kw.setdefault("accept", "region")
    solver_kw.setdefault("max_iter", 16)
    # relative-improvement stop: region accept keeps finding microscopic
    # improvements deep into the outer loop; each extra iteration is a full
    # CC+ICM pass (~0.7 s/chunk). 1e-3 cuts iters 10 -> 7 at 656k voxels for
    # energy +8e-5 rel / ncomp -0.5% / OOA-BR-BP unchanged
    # (tools/atscale_knobs_results.json chunked_tol0 vs chunked_tol3)
    solver_kw.setdefault("stop_tol", 1e-3)
    solver_kw.setdefault("cc_jumps", 1)
    # headroom over the observed ~14 CC rounds/iter: with one jump
    # the 16-round safety cap would be a single bad scene away from
    # silent under-convergence (costs nothing when converged sooner)
    solver_kw.setdefault("cc_rounds", 24)  # see chunked_cutpursuit_device
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
        core = _densify_first_occurrence(core)
        in_comp[perm[s:e]] = base + core
        base += int(core.max()) + 1 if len(core) else 0

    # boundary heal: the backward merge step over the full edge list takes
    # any beneficial cross-chunk merge (and any remaining intra-chunk one)
    in_comp = merge_regions(
        features, np.ones(n), in_comp, src, tgt, w, float(reg_strength)
    )
    # connectivity contract: chunk-core label restriction can disconnect a
    # label (connected only through halo vertices) — split such labels into
    # true graph CCs, then fuse < cutoff (ops.components.relabel_connected)
    components, in_comp = relabel_connected(n, src, tgt, in_comp, cutoff)
    return components, in_comp.astype(np.int32)


@partial(jax.jit, static_argnames=("k_adj",))
def _knn_edges_device(idx_adj, d2_adj, dmean, lam, *, k_adj: int):
    """Regenerate the directed kNN edge list + reference weights on device
    (w = 1/(lam + d/mean d), partition.py:175) — feeds the global heal's
    pair reduction without ever materializing edges on host."""
    n = idx_adj.shape[0]
    src = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k_adj)
    tgt = idx_adj.reshape(-1).astype(jnp.int32)
    d = jnp.sqrt(jnp.maximum(d2_adj.reshape(-1), 0.0))
    w = 1.0 / (lam + d / jnp.maximum(dmean, 1e-12))
    return src, tgt, w


@jax.jit
def _global_dmean(d2_adj):
    return jnp.mean(jnp.sqrt(jnp.maximum(d2_adj, 0.0)))


def chunked_cutpursuit_device(
    f_dev,
    idx_adj_dev,
    d2_adj_dev,
    xyz: np.ndarray,
    reg_strength: float,
    lambda_edge_weight: float = 1.0,
    weight_decay: float = 0.7,
    cutoff: int = 0,
    chunk_points: int = 1 << 19,
    src=None,
    tgt=None,
    xyz_dev=None,
    edge_cache: dict | None = None,
    async_fetch=None,
    halo_points: int | None = None,
    **solver_kw,
):
    """Device-resident giant-cloud cut pursuit (successor of
    `chunked_cutpursuit` for the TPU pipeline).

    `f_dev` [n, d], `idx_adj_dev`/`d2_adj_dev` [n, k_adj] stay on device end
    to end (the host-fed path re-uploaded ~150 MB of feature/edge arrays per
    chunk over the tunnel and re-ran a host Morton sort per chunk). Per
    Morton window: one `_prep_band_chunk` + `_solve_band` executable pair
    reused across ALL chunks (window start / row count are traced scalars),
    a device per-chunk merge (load-bearing: it shrinks raw split regions
    before the global heal — skipping it ballooned the heal 5 s -> ~180 s at
    2e6), then only the core labels cross the tunnel. The global heal's
    edge-level reduction also runs on device (`ops.merge_device`).

    `src`/`tgt` (host, optional) are only used for the final cutoff pass.
    When `xyz_dev` is given the Morton permutation is computed on device
    (morton_perm_device — one lax.sort instead of ~35 s of host uint64
    bit-twiddling at 1e7). Returns (components, in_component)."""
    # chunked-path solver defaults: per-region accept + max_iter=16 (see
    # chunked_cutpursuit — fixes the 2.2x at-scale under-segmentation of
    # global accept, faster end to end; tools/atscale_knobs_results.json)
    solver_kw.setdefault("accept", "region")
    solver_kw.setdefault("max_iter", 16)
    # relative-improvement stop: region accept keeps finding microscopic
    # improvements deep into the outer loop; each extra iteration is a full
    # CC+ICM pass (~0.7 s/chunk). 1e-3 cuts iters 10 -> 7 at 656k voxels for
    # energy +8e-5 rel / ncomp -0.5% / OOA-BR-BP unchanged
    # (tools/atscale_knobs_results.json chunked_tol0 vs chunked_tol3)
    solver_kw.setdefault("stop_tol", 1e-3)
    # ONE pointer jump per CC hook at chunk scale: the 3-jump default left
    # cc_rounds AND labels unchanged at 2^19 narrow (55 rounds, identical
    # ncomp) while each extra jump is an n-sized gather per round —
    # region_jumps1 4.51 s vs region 5.01 s at 500k
    # (tools/band_profile_results.json)
    solver_kw.setdefault("cc_jumps", 1)
    # headroom over the observed ~14 CC rounds/iter: with one jump
    # the 16-round safety cap would be a single bad scene away from
    # silent under-convergence (costs nothing when converged sooner)
    solver_kw.setdefault("cc_rounds", 24)
    t_all0 = time.perf_counter()
    n = int(f_dev.shape[0])
    k_adj = int(idx_adj_dev.shape[1])
    # the band layout needs whole blocks; round the window up to block size
    from .ops.cutpursuit_band import B as _BLK

    chunk_pad = -(-chunk_points // _BLK) * _BLK
    halo = chunk_pad // 8 if halo_points is None else int(halo_points)
    stride = chunk_pad - 2 * halo
    n_chunks = -(-n // stride)

    t_morton0 = time.perf_counter()
    if xyz_dev is not None:
        perm = np.asarray(morton_perm_device(xyz_dev[:n]))
    else:
        perm = morton_order(xyz)
    perm_ext = np.zeros(n + chunk_pad, np.int32)
    perm_ext[:n] = perm
    inv_h = np.empty(n, np.int32)
    inv_h[perm] = np.arange(n, dtype=np.int32)
    perm_ext_dev = jnp.asarray(perm_ext)
    inv_dev = jnp.asarray(inv_h)
    dmean = _global_dmean(d2_adj_dev)
    lam = jnp.float32(lambda_edge_weight)

    t_morton = time.perf_counter() - t_morton0
    # queue the big host copies AFTER the morton perm fetch, BEFORE the
    # chunk loop. The tunnel serves transfers FIFO against later fetches,
    # so no placement fully hides them; the A/B receipts: issued BEFORE
    # morton -> the perm fetch eats the wait (morton 6.1 s, _r5b.json);
    # issued IN-LOOP after chunk-0's solve dispatch -> 26 chunks of
    # solve/merge fetches queue behind 800 MB at 1e7 (group 20.7 -> 71.5 s,
    # bigcloud_1e7_r5b.json). Post-morton measured best at both scales
    # (2e6 50.4 s / 1e7 276.2 s): the first prep fetch absorbs the wait
    # once, everything after runs clear.
    if src is None:
        async_fetch = list(async_fetch or ()) + [idx_adj_dev]
    for _arr in async_fetch or ():
        try:
            _arr.copy_to_host_async()
        except Exception:
            pass

    e_chunk = 2 * chunk_pad * k_adj
    of_cap = max(4096, 1 << int(np.ceil(np.log2(max(e_chunk // 4, 2)))))
    in_comp = np.empty(n, np.int64)
    base = 0
    t_solve = t_merge = t_prep = 0.0
    solve_iters: list[int] = []  # per-chunk executed outer iterations
    LAST_MERGE_STATS.update(reduce=0.0, rounds=0.0)
    for c in range(n_chunks):
        t0 = time.perf_counter()
        s, e = c * stride, min((c + 1) * stride, n)
        x0, x1 = max(0, s - halo), min(n, e + halo)
        (f_rows, band_w, of_src, of_tgt, of_w, nw, of_count, of_unique,
         esrc, etgt, ew) = (
            _prep_band_chunk(
                f_dev, idx_adj_dev, d2_adj_dev, perm_ext_dev, inv_dev,
                jnp.int32(x0), jnp.int32(x1 - x0), dmean, lam,
                k_adj=k_adj, chunk_pad=chunk_pad, of_cap=of_cap,
            )
        )
        # one batched fetch: each device_get is a tunnel round trip
        of_n, of_u = map(int, jax.device_get((of_count, of_unique)))
        if of_n > of_cap:
            raise OverflowError(
                f"chunk {c}: overflow edges {of_n} exceed cap {of_cap}"
            )
        cap2 = max(16384, 1 << int(np.ceil(np.log2(max(of_u, 2)))))
        if cap2 < of_cap:
            of_src, of_tgt, of_w = of_src[:cap2], of_tgt[:cap2], of_w[:cap2]
        t_p = time.perf_counter()
        t_prep += t_p - t0
        comp, _, it_dev, _ = _solve_band(
            f_rows, band_w, of_src, of_tgt, of_w, nw,
            jnp.float32(reg_strength), jnp.float32(weight_decay), **solver_kw,
        )
        comp_core = np.asarray(comp[s - x0 : s - x0 + (e - s)])
        solve_iters.append(int(jax.device_get(it_dev)))
        t1 = time.perf_counter()
        t_solve += t1 - t_p
        label = merge_regions_device(
            f_rows, nw, comp, esrc, etgt, ew, chunk_pad,
            float(reg_strength),
        )
        core = label[comp_core]
        core = _densify_first_occurrence(core)
        in_comp[perm[s:e]] = base + core
        base += int(core.max()) + 1 if len(core) else 0
        t_merge += time.perf_counter() - t1

    # global boundary heal: device pair reduction over the full directed
    # kNN edge list + host region-level merge rounds
    t0 = time.perf_counter()
    gsrc, gtgt, gw = _knn_edges_device(
        idx_adj_dev, d2_adj_dev, dmean, lam, k_adj=k_adj
    )
    label = merge_regions_device(
        f_dev, jnp.ones(n, jnp.float32), jnp.asarray(in_comp, jnp.int32),
        gsrc, gtgt, gw, base, float(reg_strength),
    )
    in_comp = _densify_first_occurrence(label[in_comp]).astype(np.int64)
    t_heal = time.perf_counter() - t0

    t0 = time.perf_counter()
    t_edges = 0.0
    if src is None:
        # the async copy started at the top has been draining under the
        # chunk solves — this wait is ~free by now. uint32 views (not the
        # old int64 astype chain: three 160 MB host passes at 2e6)
        idx_host = np.ascontiguousarray(np.asarray(idx_adj_dev))
        src = np.repeat(np.arange(n, dtype=np.uint32), k_adj)
        if idx_host.dtype == np.int32:
            tgt = idx_host.view(np.uint32).reshape(-1)
        else:
            tgt = idx_host.astype(np.uint32).reshape(-1)
        if edge_cache is not None:
            edge_cache.update(idx=idx_host, src=src, tgt=tgt)
        t_edges = time.perf_counter() - t0
    # connectivity contract (+ cutoff fuse): a chunk-core label restriction
    # can be connected only through halo vertices outside the core — split
    # such labels into true graph CCs (disconnected_labels receipts -> 0)
    components, in_comp = relabel_connected(n, src, tgt, in_comp, cutoff)
    in_comp = in_comp.astype(np.int64)
    t_group = time.perf_counter() - t0
    LAST_CP_STATS.update(
        n=n, n_chunks=n_chunks, morton=round(t_morton, 2),
        solve_iters=solve_iters,
        prep=round(t_prep, 2), solve=round(t_solve, 2),
        chunk_merge=round(t_merge, 2), heal=round(t_heal, 2),
        group=round(t_group, 2),
        host_edges=round(t_edges, 2),
        merge_reduce=round(LAST_MERGE_STATS["reduce"], 2),
        merge_rounds=round(LAST_MERGE_STATS["rounds"], 2),
        # wall minus the timed stages: dispatch latency, the cutoff pass,
        # anything not covered above (a ~30 s gap showed up here at 2e6 in
        # the r3 receipts; keep it visible)
        other=round(
            (time.perf_counter() - t_all0)
            - (t_morton + t_prep + t_solve + t_merge + t_heal + t_group),
            2,
        ),
    )
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
    host_outputs: bool = True,
    cp_solver_kw: dict | None = None,
):
    """Full partition (prune -> kNN -> geof -> CP -> SPG) of one giant cloud
    on a single chip, all stages memory-bounded. Returns a PartitionResult
    (same contract as pipeline.partition_cloud).

    host_outputs=False skips fetching the [n, k] adjacency/distance tables
    and geof to host (~1 GB over the tunnel at 1e7 — only needed when the
    caller writes the features h5 / visualizes); the result then carries
    geof=None and a graph_nn without distances."""
    from .ops import voxel
    from .pipeline import (
        PartitionConfig, PartitionResult, _assemble_features_device,
        _assemble_features_device_nocolor,
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

    t_f0 = time.perf_counter()
    bi, bd2, info = knn_bigcloud(xyz, cfg.k_nn_geof)
    t_knn_call = time.perf_counter() - t_f0
    idx_adj_dev = bi[:, : cfg.k_nn_adj]
    d2_adj_dev = bd2[:, : cfg.k_nn_adj]

    t_f0 = time.perf_counter()
    xyz_dev = jnp.asarray(xyz)
    geof_parts = [
        compute_geof_rows(xyz_dev, xyz_dev[s : min(n, s + geof_chunk)],
                          bi[s : min(n, s + geof_chunk)])
        for s in range(0, n, geof_chunk)
    ]
    geof_dev = geof_parts[0] if len(geof_parts) == 1 else jnp.concatenate(
        geof_parts
    )
    del bi, bd2, geof_parts
    t_geof_dispatch = time.perf_counter() - t_f0

    use_color = cfg.dataset == "s3dis" and rgb is not None and len(rgb) > 0
    if use_color:
        f_dev = _assemble_features_device(
            geof_dev, jnp.asarray(np.asarray(rgb, np.uint8))
        )
    else:
        f_dev = _assemble_features_device_nocolor(geof_dev)
    times["features"] = time.perf_counter() - t0
    times["features_info"] = {
        "knn_call": round(t_knn_call, 2),
        "geof_dispatch": round(t_geof_dispatch, 2),
    }

    # the ~160 MB idx/d2 (+ geof) host copies drain over the tunnel WHILE
    # the chunk solves run — the chunked path builds the uint32 edge list
    # itself at relabel time (post-solve, transfers long done) and stashes
    # it in edge_cache for the graph_nn contract below. Serializing the
    # fetch before the partition cost ~10 s of the 2e6 features stage
    # (bigcloud_2e6_r5.json).
    t0 = time.perf_counter()
    edge_cache: dict = {}
    components, in_component = chunked_cutpursuit_device(
        f_dev, idx_adj_dev, d2_adj_dev, xyz, cfg.reg_strength,
        lambda_edge_weight=cfg.lambda_edge_weight,
        cutoff=cfg.cp_cutoff, chunk_points=chunk_points,
        xyz_dev=xyz_dev, edge_cache=edge_cache,
        async_fetch=[d2_adj_dev, geof_dev] if host_outputs else None,
        **(cp_solver_kw or {}),
    )
    times["partition"] = time.perf_counter() - t0
    times["cp_info"] = dict(LAST_CP_STATS)

    t_f0 = time.perf_counter()
    if host_outputs:
        src, tgt = edge_cache["src"], edge_cache["tgt"]
        dist = np.sqrt(np.maximum(np.asarray(d2_adj_dev), 0.0))
        if dist.dtype != np.float32:
            dist = dist.astype(np.float32)
        distances = dist.reshape(-1)
        geof = np.asarray(geof_dev)
    else:
        src = tgt = None
        geof = None
    times["features_info"]["host_fetch"] = round(
        time.perf_counter() - t_f0, 2
    )

    t0 = time.perf_counter()
    from .graph.spg_device import compute_sp_graph_device

    # device-resident inputs: xyz/idx_adj already live on chip (re-uploading
    # the host copies cost ~100 MB over the tunnel at 2e6)
    graph_sp = compute_sp_graph_device(
        xyz_dev, cfg.d_se_max, in_component, components, labels, n_labels,
        idx_adj=idx_adj_dev.astype(jnp.int32)
        if idx_adj_dev.dtype != jnp.int32 else idx_adj_dev,
    )
    times["spg"] = time.perf_counter() - t0
    times["knn_info"] = info.get("stage_seconds")

    if host_outputs:
        graph_nn = {
            "is_nn": True,
            "source": src,
            "target": tgt,
            "distances": distances,
        }
    else:
        graph_nn = {"is_nn": True}
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

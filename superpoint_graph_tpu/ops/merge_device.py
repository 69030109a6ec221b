"""Device-side edge→region reduction for the cut-pursuit backward merge.

The backward (merge) step's only O(edges) work is turning the edge list into
region-level sufficient statistics: per-region weighted feature sums S and
masses m, plus the deduplicated adjacent-region pairs with summed cut
weights (reference semantics: the backward step of SIAM-2017 l0 cut pursuit,
call site partition/partition.py:177). At giant-cloud scale that reduction —
`in_comp[src]` gathers, `np.unique` over 4e7+ keys, `np.add.at` — was the
dominant heal cost on host (VERDICT r2). Here it runs on device:

  * S, m: one `segment_sum` each over the node arrays.
  * pair dedup: a 2-key `lax.sort` over (lo, hi) region ids (no lo*n+hi
    fused key — that overflows int32, and this jax build has no x64),
    run-boundary detection, and a cumsum-compacted segment_sum of weights.

Only the O(n_regions + n_pairs) results cross the tunnel; the greedy merge
rounds stay on host (`ops.cutpursuit.merge_rounds` — data-dependent
union-find, tiny arrays).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cutpursuit import merge_rounds

# cumulative split of merge_regions_device time since last reset:
# device edge->region reduction (+ result fetch) vs host merge rounds.
# Reset by callers that want a per-call split (pipeline_big stats).
LAST_MERGE_STATS = {"reduce": 0.0, "rounds": 0.0}

# above this many edges, pair_stats compacts the cross-region subset before
# the pair-dedup sort (tests lower it to exercise the compact path). Set
# ABOVE the per-chunk merge's edge-list length (5.2M at chunk_pad 2^19):
# right after a chunk solve the cross fraction is high, so compaction there
# spill-retries and lost ~1.5 s at 2e6 (bigcloud_2e6_r4.json) — only the
# global heal (cross fraction ~5-15%) wins from it
COMPACT_THRESHOLD = 1 << 23


def _dedup_pairs(ca, cb, w, n_comp_cap):
    """Shared pair-dedup block: region pairs (ca, cb) with weights w →
    2-key-sorted (lo_s, hi_s, w_s), run-start mask `new`, compact pair ids
    `pid`, and n_pairs. Invalid entries must already carry w == 0 /
    ca == cb; they sort to the tail and their weights are zeroed. Used by
    `_pair_stats_kernel` and the sharded heal
    (parallel/partition_big_shard.heal_stats) so the sentinel/dedup rules
    cannot drift between the single-chip and mesh paths."""
    valid = (ca != cb) & (w > 0.0)
    lo = jnp.where(valid, jnp.minimum(ca, cb), jnp.int32(n_comp_cap))
    hi = jnp.where(valid, jnp.maximum(ca, cb), jnp.int32(n_comp_cap))
    lo_s, hi_s, w_s = jax.lax.sort((lo, hi, w), num_keys=2)
    prev_lo = jnp.concatenate([jnp.full(1, -1, jnp.int32), lo_s[:-1]])
    prev_hi = jnp.concatenate([jnp.full(1, -1, jnp.int32), hi_s[:-1]])
    valid_s = lo_s < n_comp_cap
    new = ((lo_s != prev_lo) | (hi_s != prev_hi)) & valid_s
    pid = jnp.cumsum(new.astype(jnp.int32)) - 1
    n_pairs = jnp.sum(new.astype(jnp.int32))
    # invalid entries sort to the tail but keep their weight and inherit the
    # last valid pid — zero them so they never leak into the last pair
    w_s = jnp.where(valid_s, w_s, 0.0)
    return lo_s, hi_s, w_s, new, pid, n_pairs


@partial(jax.jit, static_argnames=("cap",))
def _compact_cross(comp, src, tgt, w, *, cap: int):
    """Compact the cross-region edges (comp[src] != comp[tgt], w > 0) into a
    static-capacity (ca, cb, w) list via cumsum positions, plus the true
    cross count (> cap means the list spilled and the caller must retry with
    a bigger cap). The pair-dedup sort is the dominant reduction cost and
    scales with its INPUT length — at heal scale only ~5-15% of the directed
    kNN edge list is cross-region, so sorting the compacted list instead of
    the raw one is a 5-10x cut on the sorted rows."""
    ca = comp[src]
    cb = comp[tgt]
    valid = (ca != cb) & (w > 0.0)
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    n_cross = jnp.sum(valid.astype(jnp.int32))
    tgt_pos = jnp.where(valid & (pos < cap), pos, cap)
    a = jnp.zeros(cap + 1, jnp.int32).at[tgt_pos].set(ca)[:cap]
    b = jnp.zeros(cap + 1, jnp.int32).at[tgt_pos].set(cb)[:cap]
    ww = (
        jnp.zeros(cap + 1, jnp.float32)
        .at[tgt_pos]
        .set(jnp.where(valid, w, 0.0))[:cap]
    )
    return a, b, ww, n_cross


@partial(jax.jit, static_argnames=("n_comp_cap",))
def _node_stats_kernel(f, nw, comp, *, n_comp_cap: int):
    S = jax.ops.segment_sum(f * nw[:, None], comp, num_segments=n_comp_cap)
    m = jax.ops.segment_sum(nw, comp, num_segments=n_comp_cap)
    return S, m


@partial(jax.jit, static_argnames=("n_comp_cap",))
def _pair_stats_compact_kernel(ca, cb, w, *, n_comp_cap: int):
    """Pair dedup over an already-compacted cross-edge list."""
    return _dedup_pairs(ca, cb, w, n_comp_cap)


@partial(jax.jit, static_argnames=("n_comp_cap",))
def _pair_stats_kernel(f, nw, comp, src, tgt, w, *, n_comp_cap: int):
    """Edge/node → region reduction, all shapes static.

    f [n, d] f32, nw [n] f32 (0 for padding rows), comp [n] int32 region
    ids (< n_comp_cap), src/tgt [E] int32 directed edges, w [E] f32 (0 for
    padding/invalid edges). Returns (S [cap, d] f32, m [cap] f32,
    lo_s/hi_s/w_s [E] sorted pair keys+weights, new [E] bool run starts,
    n_pairs scalar). Pair ids are cumsum(new)-1 — compact in sorted order —
    so `segment_sum(w_s, pid)[:n_pairs]` is the deduped pair weight table.
    """
    S = jax.ops.segment_sum(
        f * nw[:, None], comp, num_segments=n_comp_cap
    )
    m = jax.ops.segment_sum(nw, comp, num_segments=n_comp_cap)

    ca = comp[src]
    cb = comp[tgt]
    lo_s, hi_s, w_s, new, pid, n_pairs = _dedup_pairs(ca, cb, w, n_comp_cap)
    return S, m, lo_s, hi_s, w_s, new, pid, n_pairs


@partial(jax.jit, static_argnames=("p_cap",))
def _compact_pairs(lo_s, hi_s, w_s, new, pid, *, p_cap: int):
    """Scatter the sorted runs into compact [p_cap] pair tables."""
    e = lo_s.shape[0]
    tgt_pos = jnp.where(new, jnp.minimum(pid, p_cap), p_cap)
    pair_a = (
        jnp.zeros(p_cap + 1, jnp.int32).at[tgt_pos].set(lo_s)[:p_cap]
    )
    pair_b = (
        jnp.zeros(p_cap + 1, jnp.int32).at[tgt_pos].set(hi_s)[:p_cap]
    )
    in_range = pid < p_cap
    pair_w = jax.ops.segment_sum(
        jnp.where(in_range, w_s, 0.0),
        jnp.where(in_range, pid, p_cap),
        num_segments=p_cap + 1,
    )[:p_cap]
    del e
    return pair_a, pair_b, pair_w


def pair_stats(f_dev, nw_dev, comp_dev, src_dev, tgt_dev, w_dev,
               n_comp: int):
    """Host wrapper: device reduction → numpy (S, m, pair_a, pair_b, pair_w).

    All inputs live on device (or are np arrays jax will place); shapes are
    bucketed by the caller. Only [n_comp, d] + 3×[n_pairs] arrays are
    fetched. Above `compact_threshold` edges the cross-region subset is
    compacted first so the pair-dedup sort runs over ~10x fewer rows."""
    n_comp_cap = 1 << int(np.ceil(np.log2(max(n_comp, 2))))
    e = int(np.shape(src_dev)[0])
    if e >= COMPACT_THRESHOLD:
        S, m = _node_stats_kernel(
            f_dev, nw_dev, comp_dev, n_comp_cap=n_comp_cap
        )
        cap = max(1 << 16, 1 << int(np.ceil(np.log2(max(e // 8, 2)))))
        while True:
            ca, cb, ww, n_cross = _compact_cross(
                comp_dev, src_dev, tgt_dev, w_dev, cap=cap
            )
            nc = int(jax.device_get(n_cross))
            if nc <= cap:
                break
            cap = 1 << int(np.ceil(np.log2(nc)))  # spilled: retry bigger
        lo_s, hi_s, w_s, new, pid, n_pairs = _pair_stats_compact_kernel(
            ca, cb, ww, n_comp_cap=n_comp_cap
        )
    else:
        S, m, lo_s, hi_s, w_s, new, pid, n_pairs = _pair_stats_kernel(
            f_dev, nw_dev, comp_dev, src_dev, tgt_dev, w_dev,
            n_comp_cap=n_comp_cap,
        )
    np_pairs = int(jax.device_get(n_pairs))
    p_cap = max(1024, 1 << int(np.ceil(np.log2(max(np_pairs, 2)))))
    pair_a, pair_b, pair_w = _compact_pairs(
        lo_s, hi_s, w_s, new, pid, p_cap=p_cap
    )
    return (
        np.asarray(S[:n_comp], np.float64),
        np.asarray(m[:n_comp], np.float64),
        np.asarray(pair_a[:np_pairs], np.int64),
        np.asarray(pair_b[:np_pairs], np.int64),
        np.asarray(pair_w[:np_pairs], np.float64),
    )


def merge_regions_device(f_dev, nw_dev, comp_dev, src_dev, tgt_dev, w_dev,
                         n_comp: int, reg: float, max_rounds: int = 10):
    """Backward merge with the edge-level reduction on device.

    Equivalent to `ops.cutpursuit.merge_regions` (same greedy rounds, same
    closed-form energy delta) but the O(edges) pass never touches the host.
    Returns the path-compressed label array [n_comp] (region -> surviving
    root id); the caller applies it to its own in_component layout."""
    t0 = time.perf_counter()
    S, m, pa, pb, pw = pair_stats(
        f_dev, nw_dev, comp_dev, src_dev, tgt_dev, w_dev, n_comp
    )
    t1 = time.perf_counter()
    LAST_MERGE_STATS["reduce"] += t1 - t0
    if len(pa) == 0:
        return np.arange(n_comp)
    out = merge_rounds(S, m, pa, pb, pw, n_comp, reg, max_rounds=max_rounds)
    LAST_MERGE_STATS["rounds"] += time.perf_counter() - t1
    return out

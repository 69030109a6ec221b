"""l0 cut pursuit on a block-banded graph layout — the TPU fast path.

The dense-K solver (cutpursuit_jax._solve_dense) spends ~90% of its time in
[n, K] random gathers: on TPU, gather/scatter cost scales with the number of
indices (~8ns each), so the 48 CC sweeps + 12 ICM sweeps per outer iteration
at 2M indices each dominate everything. This module removes the gathers
entirely:

  1. Vertices are sorted by Morton code on the host (spatial locality), so
     ~95% of kNN edges connect vertices within +-2*B index positions.
  2. The graph is stored BLOCK-BANDED: for block row p (rows p*B..p*B+B-1),
     a dense [B, WIN] window over columns (p-2)*B..(p+3)*B. Every sweep
     (connected-components min-propagation, ICM graph field) becomes
     aligned window slices + VPU masked row reductions — zero gathers,
     streaming the band from HBM.
  3. The few out-of-band edges go to an exact edge-list overflow pass that
     runs inside the same jit (small segment_min/segment_sum ops).

Same outer algorithm as cutpursuit_jax (parallel-ICM splits + label-prop CC
+ saturation; reference solver semantics per SIAM-2017 l0 cut pursuit,
call sites partition/partition.py:177, supervized_partition/losses.py:82).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Block geometry: block row p's window covers Morton columns
# [p*B - PAD, p*B + B + PAD), i.e. WIN = B + 2*PAD. PAD (the guard width) is
# DECOUPLED from the block size. Measured trade (tools/
# band_geometry_ab_results.json, 500k voxels on chip): warm solve time is
# FLAT across geometries (3.5-4.0 s from WIN 3072 down to 768 — the solve is
# VPU/latency-bound on CC rounds, not band-bandwidth-bound), while band
# memory scales with WIN (3.0 GB at the old square PAD = B = 1024 geometry
# vs 1.0 GB at PAD = 256, same n). The narrow band is therefore chosen for
# MEMORY: it lets the giant-path chunked solver run 2^20-point chunks
# (band + adjacency + w_intra ~ 5 GB) that the square geometry could not
# fit, halving chunk count / halo overhead / merge-heal work at >= 2e6.
# Overflow stays modest (8.5% of edges at PAD = 256 vs 4.7% at the square
# geometry; Morton locality per tools/band_locality_results.json). Every
# sweep's window matrix is a concat of B-strided slices (no gathers at any
# PAD).
B = int(os.environ.get("SPGT_BAND_B", "512"))        # block row size
PAD = int(os.environ.get("SPGT_BAND_PAD", "256"))    # guard cols each side
WIN = B + 2 * PAD
BIG = jnp.int32(2**30)

# SIZE-AWARE geometry (VERDICT r4 weak-#3/next-#5): the narrow band above is
# a MEMORY trade for 2^19..2^20-point giant-path chunks; serving the 60k
# bench room with it cost ~14% end-to-end (t_cp 0.405 -> 0.501 s, r3 vs r4
# BENCH) — more CC rounds (a band sweep only moves labels WIN/2 positions)
# and ~2x the overflow edges. Small solves therefore use the SQUARE
# geometry (B = PAD = 1024), whose band at n <= SQUARE_MAX_N is <= 0.8 GB
# bf16 (plus an f32 build transient) — nowhere near the giant-path memory
# wall. The geometry is threaded through every banded primitive as a static
# `geom=(B, PAD)` pair so both executable families coexist in one process.
GEOM_NARROW = (B, PAD)
GEOM_SQUARE = (
    int(os.environ.get("SPGT_BAND_B_SMALL", "1024")),
    int(os.environ.get("SPGT_BAND_PAD_SMALL", "1024")),
)
SQUARE_MAX_N = int(os.environ.get("SPGT_BAND_SQUARE_MAX_N", str(1 << 17)))


def geom_for(n: int) -> tuple[int, int]:
    """Band geometry for an n-point solve: square below SQUARE_MAX_N (fast,
    fewer CC rounds / overflow edges), narrow above (fits giant chunks)."""
    return GEOM_SQUARE if n <= SQUARE_MAX_N else GEOM_NARROW


def _geom(geom) -> tuple[int, int, int]:
    """Resolve a (B, PAD) pair (None -> module default) to (B, PAD, WIN)."""
    b, pad = geom if geom is not None else (B, PAD)
    return b, pad, b + 2 * pad

# Observability for roofline accounting (bench.py): per solve, the wrapper
# records the executed outer-iteration count and the band shape so analytic
# FLOPs/bytes can use ACTUAL trip counts instead of static upper bounds.
LAST_SOLVE_STATS: dict = {}


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------


def morton_order(xyz: np.ndarray, bits: int = 16) -> np.ndarray:
    """Morton (z-order) sort permutation — spatial locality => banded graph."""
    xyz = np.asarray(xyz, np.float64)
    lo = xyz.min(0)
    span = max(float(np.ptp(xyz, 0).max()), 1e-9)
    q = ((xyz - lo) / span * ((1 << bits) - 1)).astype(np.uint64)
    code = np.zeros(len(xyz), np.uint64)
    for b in range(bits):
        for a in range(3):
            code |= ((q[:, a] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                3 * b + a
            )
    return np.argsort(code, kind="stable")


@partial(jax.jit, static_argnames=("bits",))
def morton_perm_device(xyz, *, bits: int = 16):
    """Morton permutation computed ON DEVICE (same quantization scheme as
    `morton_order`; f32 arithmetic so ties can order differently — callers
    only rely on spatial locality, not an exact host match).

    The 48-bit code is built as two int32 halves (this jax build truncates
    int64 silently) and sorted with a 2-key `lax.sort`. At 1e7 points the
    host path costs ~35 s of uint64 bit-twiddling + argsort; this is one
    device sort. Returns the int32 permutation (device array)."""
    n = xyz.shape[0]
    lo = jnp.min(xyz, axis=0)
    span = jnp.maximum(jnp.max(jnp.max(xyz, axis=0) - lo), 1e-9)
    scale = jnp.float32((1 << bits) - 1)
    q = jnp.clip(
        ((xyz - lo[None, :]) / span * scale), 0, scale
    ).astype(jnp.int32)
    half = bits // 2
    code_lo = jnp.zeros(n, jnp.int32)
    code_hi = jnp.zeros(n, jnp.int32)
    for b in range(half):
        for a in range(3):
            bit = (q[:, a] >> b) & 1
            code_lo = code_lo | (bit << (3 * b + a))
    for b in range(half, bits):
        for a in range(3):
            bit = (q[:, a] >> b) & 1
            code_hi = code_hi | (bit << (3 * (b - half) + a))
    iota = jnp.arange(n, dtype=jnp.int32)
    _, _, perm = jax.lax.sort((code_hi, code_lo, iota), num_keys=2)
    return perm


def dedup_of_host(of_src, of_tgt, of_w, n_pad: int):
    """Host-side twin of `_dedup_of`: weight-sum duplicate directed overflow
    edges (mutual kNN pairs appear twice in the symmetrized list) — same
    solver semantics, ~30% fewer entries for every CC hook / ICM segment
    pass. Shared by the single-chip and mesh-sharded host preps."""
    if not len(of_src):
        return of_src, of_tgt, of_w
    okey = of_src.astype(np.int64) * n_pad + of_tgt
    order = np.argsort(okey, kind="stable")
    okey_s = okey[order]
    first = np.ones(len(okey_s), bool)
    first[1:] = okey_s[1:] != okey_s[:-1]
    # sum duplicate runs of the key-sorted weights: reduceat over run starts
    # (np.add.at runs ~25M/s on this 1-core host — CLAUDE.md round-3 lesson)
    w_sum = np.add.reduceat(of_w[order], np.flatnonzero(first)).astype(
        np.float32
    )
    return of_src[order][first], of_tgt[order][first], w_sum


def split_band_edges(n_pad: int, src: np.ndarray, tgt: np.ndarray,
                     w: np.ndarray, geom: tuple[int, int] | None = None):
    """Split symmetrized directed edges into in-window and overflow.

    A directed edge (i -> j) is in-band iff BOTH directions fall inside
    their source's window (p*B - PAD <= other < p*B + B + PAD): the overflow
    list then contains both directions of every overflow edge, so the CC
    overflow hook needs only ONE one-sided segment_min instead of two.
    Returns (flat_idx_in_band, w_in_band, src_of, tgt_of, w_of); flat_idx
    indexes the flattened [n_pad, WIN] band as i*WIN + (j - (i//B)*B + PAD).
    """
    b, pad, win = _geom(geom)
    cs = tgt - (src // b) * b + pad
    ct = src - (tgt // b) * b + pad
    inband = (cs >= 0) & (cs < win) & (ct >= 0) & (ct < win)
    flat = src[inband].astype(np.int64) * win + cs[inband]
    return (
        flat,
        w[inband].astype(np.float32),
        src[~inband].astype(np.int32),
        tgt[~inband].astype(np.int32),
        w[~inband].astype(np.float32),
    )


# ---------------------------------------------------------------------------
# device-side banded primitives
# ---------------------------------------------------------------------------


def band_windows(v, fill, geom: tuple[int, int] | None = None):
    """[n] vector -> [NB, WIN] window matrix (column c of block row p holds
    v[p*B - PAD + c], out-of-range positions = fill).

    Built as a concat of B-strided slices of the padded vector — gather-free
    for ANY (B, PAD): part s (columns [s, s+B)) is v_pad[s : s+n] reshaped
    to [NB, B]."""
    b, pad, win = _geom(geom)
    n = v.shape[0]
    nb = n // b
    v_pad = jnp.concatenate([
        jnp.full((pad,), fill, v.dtype), v, jnp.full((b + pad,), fill, v.dtype)
    ])
    parts = []
    for s in range(0, win, b):
        width = min(b, win - s)
        parts.append(v_pad[s : s + n].reshape(nb, b)[:, :width])
    return jnp.concatenate(parts, axis=1)


def cc_band_sweeps(lab, same_band, n_sweeps: int,
                   geom: tuple[int, int] | None = None):
    """`n_sweeps` Jacobi min-propagation sweeps over the band.

    same_band: [NB, B, WIN] bool — in-band edge present AND same (comp, b).
    """
    for _ in range(n_sweeps):
        labw = band_windows(lab, BIG, geom)  # [NB, WIN]
        cand = jnp.where(same_band, labw[:, None, :], BIG)
        lab = jnp.minimum(lab, jnp.min(cand, axis=2).reshape(-1))
    return lab


def cc_band_sweeps_key(lab, adj8, keyw, key2, n_sweeps: int,
                       geom: tuple[int, int] | None = None):
    """`n_sweeps` Jacobi min-propagation sweeps with the same-(comp, b) mask
    fused into the sweep: per sweep the only band-sized read is the int8
    adjacency (built once per SOLVE — vs `cc_band_sweeps`, which streams a
    [NB, B, WIN] bool rebuilt per CC call). keyw = band_windows(key) and
    key2 = key.reshape(nb, B)[:, :, None] are tiny loop-invariant windows;
    the compare/select/min chain fuses into the adjacency read."""
    for _ in range(n_sweeps):
        labw = band_windows(lab, BIG, geom)  # [NB, WIN]
        cand = jnp.where(
            (adj8 != 0) & (keyw[:, None, :] == key2), labw[:, None, :], BIG
        )
        lab = jnp.minimum(lab, jnp.min(cand, axis=2).reshape(-1))
    return lab


def _jump(lab, times: int):
    for _ in range(times):
        lab = jnp.minimum(lab, lab[lab])
    return lab


def _dedup_of(of_src, of_tgt, of_w, of_cap: int):
    """Weight-sum duplicate directed overflow edges in place.

    The symmetrized edge list holds (i->j) TWICE for every mutual kNN pair
    (once from each direction's concat half), so ~30% of the overflow list
    is duplicates — and every CC round's hook gather/scatter and every ICM
    sweep's segment_sum pay per entry. One 2-key sort + run compaction sums
    duplicate weights (identical solver semantics: the band scatter already
    sums its duplicates) and returns the unique count so the caller can
    shrink the static cap the solve loops over. Padding entries (src=tgt=0,
    w=0) collapse into one inert zero-weight run."""
    s_s, t_s, w_s = jax.lax.sort((of_src, of_tgt, of_w), num_keys=2)
    first = jnp.concatenate([
        jnp.ones(1, bool), (s_s[1:] != s_s[:-1]) | (t_s[1:] != t_s[:-1])
    ])
    rid = jnp.cumsum(first.astype(jnp.int32)) - 1
    w2 = jax.ops.segment_sum(w_s, rid, num_segments=of_cap)
    pos = jnp.where(first, rid, of_cap)
    # unwritten tail slots get a BIG sentinel id (not 0) so the compacted
    # list is globally ASCENDING by src — every per-round segment op over it
    # (CC hook segment_min, ICM segment_sum) can then pass
    # indices_are_sorted=True (25% cheaper on this target, tools/
    # band_stage_profile_narrow_r5.json t_of_hook_sorted). Sentinel ids are
    # out of range: gathers clamp to the last node (masked by w == 0),
    # scatters drop.
    src2 = jnp.full(of_cap + 1, BIG, jnp.int32).at[pos].set(s_s)[:of_cap]
    tgt2 = jnp.full(of_cap + 1, BIG, jnp.int32).at[pos].set(t_s)[:of_cap]
    n_unique = jnp.sum(first.astype(jnp.int32))
    return src2, tgt2, w2, n_unique


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------


def _seg_mean(data, seg, n, weights):
    tot = jax.ops.segment_sum(data * weights[:, None], seg, num_segments=n)
    cnt = jax.ops.segment_sum(weights, seg, num_segments=n)
    return tot / jnp.maximum(cnt, 1e-12)[:, None], cnt


@partial(
    jax.jit,
    static_argnames=(
        "max_iter", "icm_sweeps", "flow_steps", "power_iters", "cc_rounds",
        "cc_sweeps_per_round", "cc_hooks", "cc_jumps", "accept", "geom",
        "stop_tol",
    ),
)
def _solve_band(
    f,            # [n, d] features (Morton order, padded)
    band_w,       # [NB, B, WIN] f32 edge weight (0 where no edge)
    of_src,       # [E_of] int32 overflow edges, ASCENDING (BIG-id tail pad)
    of_tgt,       # [E_of] int32
    of_w,         # [E_of] f32 (0 for padding)
    nw,           # [n] node weights (0 for padding)
    reg,
    weight_decay=1.0,
    *,
    max_iter: int = 8,
    icm_sweeps: int = 3,
    flow_steps: int = 2,
    power_iters: int = 8,
    # cc_rounds is a safety CAP (the CC while-loop exits on convergence) —
    # 24 gives headroom over the observed ~10-14 rounds/iter at zero cost;
    # 16 was measured BINDING at 2e6 (silent under-convergence,
    # BASELINE.md r5). ONE pointer jump per hook: 2 and 3 jumps left
    # cc_rounds AND labels identical at 60k square and 500k narrow while
    # costing an n-sized gather each per round (tools/
    # band_profile_results.json region_jumps1, tools/room_knobs_results.json)
    cc_rounds: int = 24,
    cc_sweeps_per_round: int = 4,
    cc_hooks: int = 1,
    cc_jumps: int = 1,
    accept: str = "global",
    geom: tuple[int, int] | None = None,
    stop_tol: float = 0.0,
):
    # (A fused Mosaic Gauss-Seidel CC + masked-matvec ICM variant was built
    # and profiled in round 4 — it LOST to this XLA form at the square
    # geometry (tools/band_profile_results.json: warm 4.94 s vs 4.04 s, cold
    # 33.8 s vs 5.7 s at 2^19) and Mosaic's 1024-aligned dynamic-VMEM-slice
    # constraint rules it out entirely at the narrow PAD geometry that wins;
    # see git history for ops/band_pallas.py.)
    bB, _, _ = _geom(geom)
    n, d = f.shape
    nb = n // bB
    iota = jnp.arange(n, dtype=jnp.int32)
    parity = (iota % 2).astype(bool)
    # the one materialized band-sized mask: adjacency (bool, 1 byte/slot) —
    # every CC sweep reads THIS (plus tiny key windows) instead of a
    # per-CC-call [NB, B, WIN] same-(comp, b) bool
    band_adj = band_w > 0.0
    # the [NB, B, WIN] band is stored bf16 (halves the dominant HBM traffic;
    # labels agree 0.9999 with the f32 band on the 60k bench room) — all
    # reductions over it accumulate in f32
    band_w = band_w.astype(jnp.bfloat16)

    def energy_of(comp, mean):
        fid = jnp.sum(nw * jnp.sum((f - mean[comp]) ** 2, axis=1))
        compw = band_windows(comp, jnp.int32(-1), geom)
        cross_band = jnp.sum(
            jnp.where(
                band_adj
                & (compw[:, None, :] != comp.reshape(nb, bB)[:, :, None]),
                band_w,
                jnp.bfloat16(0.0),
            ).astype(jnp.float32)
        )
        cross_of = jnp.sum(
            jnp.where(comp[of_src] != comp[of_tgt], of_w, 0.0)
        )
        # every undirected edge appears twice (both directions)
        return fid + reg * 0.5 * (cross_band + cross_of)

    def means_of(comp):
        mean, _ = _seg_mean(f, comp, n, nw)
        return mean

    def cc_full(comp, b):
        """Connected components of the same-(comp, b) graph: banded
        min-propagation rounds + overflow hook + pointer jumping, run until a
        full round changes nothing. The (comp, b) pair is fused into one
        int32 comparison key, so each sweep's only band-sized read is the
        loop-invariant adjacency; the overflow list holds both directions of
        every overflow edge (split_band_edges), so the hook is ONE one-sided
        segment_min."""
        # (component, split side) fused into one comparison key
        key = comp * 2 + b.astype(jnp.int32)
        of_same = (key[of_src] == key[of_tgt]) & (of_w > 0.0)
        keyw = band_windows(key, jnp.int32(-1), geom)
        key2 = key.reshape(nb, bB)[:, :, None]

        def round_body(state):
            lab, _, i = state
            new = cc_band_sweeps_key(
                lab, band_adj, keyw, key2, cc_sweeps_per_round, geom
            )
            # overflow hook: relax out-of-band edges exactly (one-sided —
            # the list is direction-symmetric); hook+jump repeated cc_hooks
            # times so long-range label info crosses several overflow edges
            # per round (the band sweeps only move it WIN/2 positions)
            for _ in range(cc_hooks):
                m = jnp.where(of_same, new[of_tgt], BIG)
                # the deduped overflow list is ascending by src (_dedup_of
                # sentinel tail) — sorted scatter is ~25% cheaper
                hook = jax.ops.segment_min(
                    m, of_src, num_segments=n, indices_are_sorted=True
                )
                new = jnp.minimum(new, hook)
                new = _jump(new, cc_jumps)
            return new, jnp.any(new != lab), i + 1

        def round_cond(state):
            return state[1] & (state[2] < cc_rounds)

        lab0, _, _ = round_body((iota, jnp.bool_(True), jnp.int32(0)))
        lab, _, rounds = jax.lax.while_loop(
            round_cond, round_body, (lab0, jnp.bool_(True), jnp.int32(1))
        )
        return lab, rounds

    def split_once(comp, saturated, mean, it):
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

        # intra-region weighted band, materialized once per outer iteration
        # and read by all 2*icm_sweeps*flow_steps matvec sweeps below
        compw = band_windows(comp, jnp.int32(-1), geom)
        w_intra = jnp.where(
            band_adj
            & (compw[:, None, :] == comp.reshape(nb, bB)[:, :, None]),
            band_w,
            jnp.bfloat16(0.0),
        )
        of_intra_w = jnp.where(comp[of_src] == comp[of_tgt], of_w, 0.0)

        for k in range(flow_steps):
            step_on = k < steps_now
            b_in = b
            bf = b.astype(f.dtype)
            # one fused segment_sum for both side-means (the two separate
            # _seg_mean calls cost 2x the scatter indices), and delta_u via
            # the expanded form: |f-hp|^2 - |f-hm|^2 =
            # -2 f.(hp-hm) + |hp|^2 - |hm|^2 — one [n, d+1] gather instead
            # of two [n, d] gathers + two squared-norm passes
            wp = nw * bf
            wm = nw - wp
            sides = jax.ops.segment_sum(
                jnp.concatenate(
                    [f * wp[:, None], wp[:, None], f * wm[:, None],
                     wm[:, None]], axis=1,
                ),
                comp, num_segments=n,
            )
            cp_ = sides[:, d]
            cm_ = sides[:, 2 * d + 1]
            hp = jnp.where(
                (cp_ > 0)[:, None],
                sides[:, :d] / jnp.maximum(cp_, 1e-12)[:, None], mean,
            )
            hm = jnp.where(
                (cm_ > 0)[:, None],
                sides[:, d + 1 : 2 * d + 1]
                / jnp.maximum(cm_, 1e-12)[:, None], mean,
            )
            hd_q = jnp.concatenate(
                [hp - hm,
                 (jnp.sum(hp * hp, 1) - jnp.sum(hm * hm, 1))[:, None]],
                axis=1,
            )[comp]
            delta_u = nw * (
                -2.0 * jnp.sum(f * hd_q[:, :d], axis=1) + hd_q[:, d]
            )
            for s in range(2 * icm_sweeps):
                # +-1/0 spin vector is exact in bf16 -> native MXU bf16 pass
                spin = jnp.bfloat16(1.0) - jnp.bfloat16(2.0) * b.astype(
                    jnp.bfloat16
                )
                bw = band_windows(spin, jnp.bfloat16(0.0), geom)
                # batched matvec: the MXU reads w_intra once per sweep
                # with no materialized [NB, B, WIN] broadcast product
                band_field = jnp.einsum(
                    "pbw,pw->pb", w_intra, bw,
                    preferred_element_type=jnp.float32,
                ).reshape(-1)
                field = reg * (
                    band_field
                    + jax.ops.segment_sum(
                        of_intra_w * (1.0 - 2.0 * b[of_tgt].astype(f.dtype)),
                        of_src,
                        num_segments=n,
                        indices_are_sorted=True,
                    )
                )
                want = (delta_u + field) < 0
                upd = parity == (s % 2 == 0)
                b = jnp.where(upd, want, b)
            b = jnp.where(step_on, b, b_in)
        # w_intra / of_intra_w are handed to the region accept (the newly cut
        # edges it prices are exactly the intra-OLD-region edges whose new
        # labels differ — rebuilding the same [NB, B, WIN] select there was a
        # second full band_w + band_adj read per outer iteration)
        return jnp.where(saturated[comp], False, b), w_intra, of_intra_w

    def body(state):
        comp, saturated, energy, it, _, ccr = state
        mean = means_of(comp)
        b, w_intra, of_intra_w = split_once(comp, saturated, mean, it)
        new_comp, rounds = cc_full(comp, b)
        if accept == "region":
            # Per-OLD-region accept (the exact reference solver's effective
            # semantics: a max-flow split can never increase its own
            # region's energy, so the reference never needs global
            # rejection; the ICM split approximation can, and rejecting the
            # WHOLE iteration over one bad region both under-segments and
            # ends the outer loop early — the at-scale receipt's failure
            # mode). The energy is separable by old region: fidelity is
            # per-node, newly cut edges are intra-region, and cross-region
            # edges are cut both before and after. Labels stay collision
            # free because cc_full labels are min node indices of disjoint
            # node sets.
            new_mean = means_of(new_comp)
            fo_node = nw * jnp.sum((f - mean[comp]) ** 2, axis=1)
            fn_node = nw * jnp.sum((f - new_mean[new_comp]) ** 2, axis=1)
            dfid = jax.ops.segment_sum(
                fn_node - fo_node, comp, num_segments=n
            )
            fo_reg = jax.ops.segment_sum(fo_node, comp, num_segments=n)
            # newly cut edges = intra-OLD-region support (w_intra, already
            # materialized by split_once for the ICM sweeps) whose NEW labels
            # differ — one bf16 band read instead of re-masking band_w with
            # band_adj + two old-comp windows
            ncw = band_windows(new_comp, jnp.int32(-1), geom)
            nc2 = new_comp.reshape(nb, bB)[:, :, None]
            cut_node = jnp.sum(
                jnp.where(
                    ncw[:, None, :] != nc2, w_intra, jnp.bfloat16(0.0)
                ).astype(jnp.float32),
                axis=2,
            ).reshape(-1)
            of_cut = jnp.where(
                new_comp[of_src] != new_comp[of_tgt], of_intra_w, 0.0
            )
            # both directions of every undirected edge are present
            dcut = 0.5 * (
                jax.ops.segment_sum(cut_node, comp, num_segments=n)
                + jax.ops.segment_sum(of_cut, comp[of_src], num_segments=n)
            )
            delta = dfid + reg * dcut
            acc_r = delta < -1e-6 * jnp.maximum(fo_reg, 1.0)
            acc_n = acc_r[comp]
            e_drop = jnp.sum(jnp.where(acc_r, delta, 0.0))
            # relative-improvement stop (stop_tol > 0): the per-region accept
            # keeps finding microscopic improvements for many outer
            # iterations (at 656k voxels, iterations 9-10 moved the energy by
            # 0.1 of 26572 — tools/atscale_knobs_results.json), each costing a
            # full CC+ICM pass; stop once the accepted total drop is below
            # stop_tol x |energy| (stop_tol = 0 reproduces "any region
            # accepted" exactly: every accepted region's delta is < 0)
            improved = e_drop < -stop_tol * jnp.maximum(jnp.abs(energy), 1.0)
            comp_out = jnp.where(acc_n, new_comp, comp)
            # accepted regions' children stay splittable; unsplit or
            # rejected regions saturate (their means — hence their split —
            # cannot change while they stand). `saturated` is keyed by
            # label (split_once reads saturated[comp]), so scatter the
            # uniform-per-region node mask onto the surviving labels.
            sat_out = jax.ops.segment_max(
                (~acc_n).astype(jnp.int32), comp_out, num_segments=n
            ).astype(bool)
            e_out = energy + e_drop
            return comp_out, sat_out, e_out, it + 1, improved, ccr + rounds
        new_energy = energy_of(new_comp, means_of(new_comp))
        improved = new_energy < energy - 1e-6 * jnp.maximum(
            jnp.abs(energy), 1.0
        )
        hi = jax.ops.segment_max(new_comp, comp, num_segments=n)
        lo = jax.ops.segment_min(new_comp, comp, num_segments=n)
        new_sat = (hi == lo)[comp]
        sat_flag = jax.ops.segment_max(
            new_sat.astype(jnp.int32), new_comp, num_segments=n
        ).astype(bool)
        comp_out = jnp.where(improved, new_comp, comp)
        sat_out = jnp.where(improved, sat_flag, saturated)
        e_out = jnp.where(improved, new_energy, energy)
        return comp_out, sat_out, e_out, it + 1, improved, ccr + rounds

    def cond(state):
        return (state[3] < max_iter) & state[4]

    comp0 = jnp.zeros(n, jnp.int32)
    energy0 = energy_of(comp0, means_of(comp0))
    state = (
        comp0, jnp.zeros(n, bool), energy0, jnp.int32(0), jnp.bool_(True),
        jnp.int32(0),
    )
    comp, saturated, energy, it, _, ccr = jax.lax.while_loop(cond, body, state)
    return comp, energy, it, ccr


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k_adj", "of_cap", "geom"))
def _prep_band_device(
    f,          # [n_pad, d] features (original order, pads arbitrary)
    idx_adj,    # [n_pad, k_adj] int32 kNN neighbors (pads self-referential ok)
    d_adj,      # [n_pad, k_adj] f32 neighbor distances
    perm,       # [n_pad] int32 Morton permutation (pads at the tail)
    inv,        # [n_pad] int32 inverse permutation
    n_real,     # scalar int32: number of real points
    lam,        # scalar f32: lambda_edge_weight
    *,
    k_adj: int,
    of_cap: int,
    geom: tuple[int, int] | None = None,
):
    """Device-side band construction straight from the kNN output — the
    one-program partition path (nothing but the final labels crosses the
    tunnel). Returns (f_p, band_w, of_src, of_tgt, of_w, nw, of_count)."""
    bB, bPAD, bWIN = _geom(geom)
    n_pad = f.shape[0]
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    real = iota < n_real

    # directed kNN edges + reference edge weights (partition.py:175:
    # w = 1/(lam + d/mean(d)), mean over real edges only)
    src0 = jnp.repeat(iota, k_adj)
    tgt0 = idx_adj.reshape(-1).astype(jnp.int32)
    emask0 = real[src0]
    d0 = jnp.sqrt(jnp.maximum(d_adj.reshape(-1), 0.0))
    dmean = jnp.sum(jnp.where(emask0, d0, 0.0)) / jnp.maximum(
        jnp.sum(emask0.astype(jnp.float32)), 1.0
    )
    w0 = jnp.where(emask0, 1.0 / (lam + d0 / jnp.maximum(dmean, 1e-12)), 0.0)

    # symmetrize in Morton space
    ps = inv[src0]
    pt = inv[tgt0]
    src = jnp.concatenate([ps, pt])
    tgt = jnp.concatenate([pt, ps])
    w = jnp.concatenate([w0, w0])

    c = tgt - (src // bB) * bB + bPAD
    c_rev = src - (tgt // bB) * bB + bPAD
    inband = (
        (c >= 0) & (c < bWIN) & (c_rev >= 0) & (c_rev < bWIN) & (w > 0.0)
    )
    # 2D scatter (row, col) keeps indices int32 at any cloud size
    band = jnp.zeros((n_pad, bWIN), jnp.float32)
    band = band.at[
        jnp.where(inband, src, 0), jnp.where(inband, c, 0)
    ].add(jnp.where(inband, w, 0.0))
    band_w = band.reshape(n_pad // bB, bB, bWIN).astype(jnp.bfloat16)

    # overflow edges -> compacted static-capacity list via cumsum positions
    is_of = (~inband) & (w > 0.0)
    pos = jnp.cumsum(is_of.astype(jnp.int32)) - 1
    of_count = jnp.sum(is_of.astype(jnp.int32))
    tgt_pos = jnp.where(is_of & (pos < of_cap), pos, of_cap)  # spill slot
    of_src = jnp.zeros(of_cap + 1, jnp.int32).at[tgt_pos].set(src)[:of_cap]
    of_tgt = jnp.zeros(of_cap + 1, jnp.int32).at[tgt_pos].set(tgt)[:of_cap]
    of_w = (
        jnp.zeros(of_cap + 1, jnp.float32)
        .at[tgt_pos]
        .set(jnp.where(is_of, w, 0.0))[:of_cap]
    )
    of_src, of_tgt, of_w, of_unique = _dedup_of(of_src, of_tgt, of_w, of_cap)

    # pad rows' features can be NaN (geof of degenerate pad positions) —
    # where-mask them to zero (a multiply would propagate the NaN)
    real_p = real[perm]
    f_p = jnp.where(real_p[:, None], f[perm], 0.0)
    nw = real_p.astype(jnp.float32)
    return f_p, band_w, of_src, of_tgt, of_w, nw, of_count, of_unique


@partial(jax.jit, static_argnames=("k_adj", "chunk_pad", "of_cap"))
def _prep_band_chunk(
    f,          # [n_pad_g, d] features, ORIGINAL order, device-resident
    idx_adj,    # [n_pad_g, k_adj] int32 kNN neighbors (original ids)
    d2_adj,     # [n_pad_g, k_adj] f32 squared neighbor distances
    perm_ext,   # [n_pad_g + chunk_pad] int32 Morton perm, tail-padded
    inv,        # [n_pad_g] int32 inverse Morton permutation
    x0,         # scalar int32: window start (Morton position)
    n_ext,      # scalar int32: real rows in this window (x1 - x0)
    dmean,      # scalar f32: GLOBAL mean kNN-adjacency distance
    lam,        # scalar f32: lambda_edge_weight
    *,
    k_adj: int,
    chunk_pad: int,
    of_cap: int,
):
    """Per-chunk band construction for the giant-cloud chunked solver —
    everything stays on device (the host-fed path uploaded ~150 MB of edge
    arrays per chunk over the tunnel). The chunk is rows [x0, x0+n_ext) of
    the GLOBAL Morton order; cross-chunk edges are dropped (healed later by
    the global merge step, pipeline_big.chunked_cutpursuit). One executable
    serves every chunk (x0/n_ext are traced scalars)."""
    rows = jax.lax.dynamic_slice(perm_ext, (x0,), (chunk_pad,))
    iota = jnp.arange(chunk_pad, dtype=jnp.int32)
    real = iota < n_ext

    f_rows = jnp.where(real[:, None], f[rows], 0.0)
    tgt_g = idx_adj[rows]                       # [chunk_pad, k_adj] global
    tgt_loc = inv[tgt_g] - x0                   # window-local Morton index
    d0 = jnp.sqrt(jnp.maximum(d2_adj[rows], 0.0))
    w0 = 1.0 / (lam + d0 / jnp.maximum(dmean, 1e-12))

    src0 = jnp.repeat(iota, k_adj)
    tgt0 = tgt_loc.reshape(-1)
    w0 = w0.reshape(-1)
    ok = real[src0] & (tgt0 >= 0) & (tgt0 < n_ext)
    w0 = jnp.where(ok, w0, 0.0)

    src = jnp.concatenate([src0, tgt0])
    tgt = jnp.concatenate([tgt0, src0])
    w = jnp.concatenate([w0, w0])
    okb = jnp.concatenate([ok, ok])
    src = jnp.where(okb, src, 0)
    tgt = jnp.where(okb, tgt, 0)

    c = tgt - (src // B) * B + PAD
    c_rev = src - (tgt // B) * B + PAD
    inband = (
        (c >= 0) & (c < WIN) & (c_rev >= 0) & (c_rev < WIN) & (w > 0.0)
    )
    # (giant-path chunks always use the module NARROW geometry — the whole
    # point of the narrow band is fitting these chunk shapes in HBM)
    band = jnp.zeros((chunk_pad, WIN), jnp.bfloat16)
    band = band.at[
        jnp.where(inband, src, 0), jnp.where(inband, c, 0)
    ].add(jnp.where(inband, w, 0.0).astype(jnp.bfloat16))
    band_w = band.reshape(chunk_pad // B, B, WIN)

    is_of = (~inband) & (w > 0.0)
    pos = jnp.cumsum(is_of.astype(jnp.int32)) - 1
    of_count = jnp.sum(is_of.astype(jnp.int32))
    tgt_pos = jnp.where(is_of & (pos < of_cap), pos, of_cap)
    of_src = jnp.zeros(of_cap + 1, jnp.int32).at[tgt_pos].set(src)[:of_cap]
    of_tgt = jnp.zeros(of_cap + 1, jnp.int32).at[tgt_pos].set(tgt)[:of_cap]
    of_w = (
        jnp.zeros(of_cap + 1, jnp.float32)
        .at[tgt_pos]
        .set(jnp.where(is_of, w, 0.0))[:of_cap]
    )
    of_src, of_tgt, of_w, of_unique = _dedup_of(of_src, of_tgt, of_w, of_cap)
    nw = real.astype(jnp.float32)
    # (src0, tgt0, w0) is the chunk's DIRECTED edge list (w0 already 0 on
    # dropped/padding edges) — returned for the device-side per-chunk merge
    # (ops.merge_device); tgt0 may be out of window (clamped gathers are
    # masked by w0 == 0)
    return (f_rows, band_w, of_src, of_tgt, of_w, nw, of_count, of_unique,
            src0, tgt0, w0)


def cutpursuit_band_device(
    f_dev,
    idx_adj_dev,
    d2_adj_dev,
    xyz: np.ndarray,
    n: int,
    reg_strength: float,
    lambda_edge_weight: float = 1.0,
    weight_decay: float = 0.7,
    **solver_kw,
):
    """One-program cut pursuit over device-resident kNN output.

    `f_dev` [n_pad, d], `idx_adj_dev`/`d2_adj_dev` [n_pad, k_adj] live on
    device (from ops.knn + ops.geof); only the Morton permutation goes up and
    only the final labels come back. Returns in_component [n] (pre-merge,
    original order, root-densified)."""
    n_pad = f_dev.shape[0]
    geom = solver_kw.pop("geom", None) or geom_for(n)
    bB = _geom(geom)[0]
    assert n_pad % bB == 0, "caller buckets n_pad to a power of two >= 1024"
    # Morton permutation on DEVICE (one 2-key sort) + one small fetch: the
    # host uint64 bit-twiddle costs ~38 ms at 60k / ~1 s at 656k — ~9% of
    # the whole 60k-room solve call. Ties may order differently than the
    # host path (f32 quantization); only locality matters here.
    perm = np.asarray(
        morton_perm_device(jnp.asarray(np.ascontiguousarray(
            xyz[:n], np.float32
        )))
    )
    perm_full = np.concatenate([perm, np.arange(n, n_pad)]).astype(np.int32)
    inv = np.empty(n_pad, np.int32)
    inv[perm_full] = np.arange(n_pad, dtype=np.int32)

    k_adj = idx_adj_dev.shape[1]
    e_total = 2 * n_pad * k_adj
    of_cap = max(4096, 1 << int(np.ceil(np.log2(max(e_total // 4, 2)))))
    f_p, band_w, of_src, of_tgt, of_w, nw, of_count, of_unique = (
        _prep_band_device(
            f_dev,
            idx_adj_dev,
            d2_adj_dev,
            jnp.asarray(perm_full),
            jnp.asarray(inv),
            jnp.int32(n),
            jnp.float32(lambda_edge_weight),
            k_adj=k_adj,
            of_cap=of_cap,
            geom=geom,
        )
    )
    # compact the overflow list to its actual (bucketed, DEDUPED) length:
    # every CC round and ICM sweep runs segment ops over it, so the static
    # worst-case cap would cost ~8x on typical (~5% overflow) graphs
    of_n, of_u = map(int, jax.device_get((of_count, of_unique)))
    if of_n > of_cap:  # pathological graph: caller must fall back
        raise OverflowError(f"overflow edges {of_n} exceed cap {of_cap}")
    cap2 = max(16384, 1 << int(np.ceil(np.log2(max(of_u, 2)))))
    if cap2 < of_cap:
        of_src, of_tgt, of_w = (
            of_src[:cap2], of_tgt[:cap2], of_w[:cap2]
        )
    comp, energy, iters, ccr = _solve_band(
        f_p, band_w, of_src, of_tgt, of_w, nw,
        jnp.float32(reg_strength), jnp.float32(weight_decay), geom=geom,
        **solver_kw,
    )
    # one batched fetch for labels + scalars (each device_get is a tunnel
    # round trip)
    comp_h, it_h, ccr_h, e_h = jax.device_get((comp, iters, ccr, energy))
    comp_h = np.asarray(comp_h)
    LAST_SOLVE_STATS.update(
        n_pad=int(n_pad), win=_geom(geom)[2], d=int(f_p.shape[1]),
        iters=int(it_h), cc_rounds=int(ccr_h), energy=float(e_h),
    )
    comp_h = comp_h[inv[:n]]  # back to original order
    _, first_pos, invc = np.unique(
        comp_h, return_index=True, return_inverse=True
    )
    order = np.argsort(np.argsort(first_pos))
    return order[invc].astype(np.int32)


@partial(jax.jit, static_argnames=("n", "geom"))
def _build_band(n: int, row_idx, col_idx, flat_w,
                geom: tuple[int, int] | None = None):
    """Scatter in-window edge weights into the [NB, B, WIN] band (summing
    duplicates, like the dense-K builder). Padding entries carry zero weight
    (index 0, weight 0 — a no-op add). 2D (row, col) scatter so indices stay
    int32 at any cloud size (a flat index overflows int32 at n_pad 2^20)."""
    # direct bf16 scatter-add: duplicate directed edges (<= 2 per slot) sum
    # with ~0.4% worst-case rounding — below the band's own quantization
    # noise, and it halves the build's peak HBM (an f32 buffer + bf16 copy
    # OOMed at n_pad 2^20)
    bB, _, bWIN = _geom(geom)
    band = jnp.zeros((n, bWIN), jnp.bfloat16)
    band = band.at[row_idx, col_idx].add(flat_w.astype(jnp.bfloat16))
    return band.reshape(n // bB, bB, bWIN)


def cutpursuit_band(
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
    merge: bool = True,
    **solver_kw,
):
    """libcp.cutpursuit-compatible banded solver (the large-cloud fast path).

    `xyz` (optional) provides coordinates for the Morton sort; without it the
    input order is assumed to already be spatially local. `merge=False`
    skips the backward merge step (for callers that run their own global
    merge afterwards — pipeline_big.chunked_cutpursuit). Returns
    (components, in_component) like the host oracle."""
    del spatial
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

    # Morton permutation (identity if no coordinates given)
    if xyz is not None:
        perm = morton_order(np.asarray(xyz))
    else:
        perm = np.arange(n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)

    geom = solver_kw.pop("geom", None) or geom_for(n)
    bB = _geom(geom)[0]
    n_pad = -(-max(n, bB) // bB) * bB
    # bucket block count to powers of two for executable reuse
    nb = n_pad // bB
    nb_pad = 1 << int(np.ceil(np.log2(max(nb, 2))))
    n_pad = nb_pad * bB

    f_p = np.zeros((n_pad, f.shape[1]), np.float32)
    f_p[:n] = f[perm]
    nw_p = np.zeros(n_pad, np.float32)
    nw_p[:n] = nw_h[perm]

    # symmetrized directed edges in permuted space. No dedup needed: the band
    # scatter ADDS duplicate directed edges, which reproduces exactly the
    # duplicate-summing of _dense_neighbors (a mutual kNN pair contributes
    # twice its weight to the cut cost, like the reference).
    ps = inv[src].astype(np.int32)
    pt = inv[tgt].astype(np.int32)
    ds = np.concatenate([ps, pt])
    dt = np.concatenate([pt, ps])
    dw = np.concatenate([w, w]).astype(np.float32)

    flat_idx, flat_w, of_src, of_tgt, of_w = split_band_edges(
        n_pad, ds, dt, dw, geom
    )
    of_src, of_tgt, of_w = dedup_of_host(of_src, of_tgt, of_w, n_pad)
    # pad overflow list to a bucketed length with BIG-sentinel ids so the
    # list stays ASCENDING by src (dedup_of_host key-sorts) — _solve_band's
    # segment ops pass indices_are_sorted=True (out-of-range ids: gathers
    # clamp + are masked by w == 0, scatters drop)
    e_of = max(1024, 1 << int(np.ceil(np.log2(max(len(of_src), 1)))))
    of_src_p = np.full(e_of, int(BIG), np.int32)
    of_tgt_p = np.full(e_of, int(BIG), np.int32)
    of_w_p = np.zeros(e_of, np.float32)
    of_src_p[: len(of_src)] = of_src
    of_tgt_p[: len(of_tgt)] = of_tgt
    of_w_p[: len(of_w)] = of_w

    # bucket the in-band scatter length so _build_band reuses executables;
    # (row, col) int32 pairs — flat indices overflow int32 at n_pad 2^20
    e_in = max(4096, 1 << int(np.ceil(np.log2(max(len(flat_idx), 1)))))
    row_p = np.zeros(e_in, np.int32)
    col_p = np.zeros(e_in, np.int32)
    flat_w_p = np.zeros(e_in, np.float32)
    bWIN = _geom(geom)[2]
    row_p[: len(flat_idx)] = (flat_idx // bWIN).astype(np.int32)
    col_p[: len(flat_idx)] = (flat_idx % bWIN).astype(np.int32)
    flat_w_p[: len(flat_w)] = flat_w

    band_w = _build_band(
        n_pad, jnp.asarray(row_p), jnp.asarray(col_p), jnp.asarray(flat_w_p),
        geom,
    )
    comp, energy, iters, ccr = _solve_band(
        jnp.asarray(f_p),
        band_w,
        jnp.asarray(of_src_p),
        jnp.asarray(of_tgt_p),
        jnp.asarray(of_w_p),
        jnp.asarray(nw_p),
        jnp.float32(reg_strength),
        jnp.float32(weight_decay),
        geom=geom,
        **solver_kw,
    )
    comp, it_h, ccr_h, e_h = jax.device_get((comp, iters, ccr, energy))
    comp = np.asarray(comp)[:n][inv]  # back to original vertex order
    LAST_SOLVE_STATS.update(
        n_pad=int(n_pad), win=_geom(geom)[2], d=int(f.shape[1]),
        iters=int(it_h), cc_rounds=int(ccr_h), energy=float(e_h),
    )

    _, first_pos, invc = np.unique(comp, return_index=True, return_inverse=True)
    order = np.argsort(np.argsort(first_pos))
    in_comp = order[invc]

    if merge:
        from .cutpursuit import merge_regions

        in_comp = merge_regions(
            f, nw_h, in_comp, src, tgt, w, float(reg_strength)
        )

    if cutoff > 0:
        from .components import connected_components

        active = in_comp[src] == in_comp[tgt]
        _, in_comp = connected_components(n, src, tgt, active, cutoff)

    from .components import group_components

    components = group_components(in_comp)
    return components, in_comp.astype(np.int32)

"""Fused Pallas (Mosaic) sweeps for the block-banded cut-pursuit solver.

The XLA form of the two solver inner loops streams masked copies of the
[NB, B, WIN] edge band from HBM and re-materializes the masks every outer
iteration (`w_intra`, `same_band` — each a band-sized array), and its
connected-components loop is JACOBI: information moves one halo per sweep,
so the label-propagation while_loop runs many rounds, each paying the
overflow-hook segment ops, three pointer-jump gathers and the loop carry
overhead (~20 ms/round on the tunneled target). Profiling at n_pad 2^18
(tools/band_profile_results.json) showed those per-round fixed costs — not
the sweeps themselves — dominate the solve.

These kernels fuse the masking into the band read (nothing band-sized is
ever materialized) and keep the O(n) state resident in VMEM:

* `icm_field_pallas` — the ICM graph field: for every vertex the weighted
  sum of neighbor spins over SAME-COMPONENT band edges. One streaming pass
  over the band per sweep; the component mask is computed in-register from
  the VMEM-resident component vector ((comp_i - comp_j) == 0 — arithmetic
  compare, not a broadcast `where`, which Mosaic rejects as an i1 relayout).
  The [B, B] masked tile hits the MXU as a bf16 matvec.

* `cc_sweeps_pallas` — GAUSS-SEIDEL min-propagation: the label vector lives
  in VMEM across the whole pass (input/output aliased), each block row reads
  labels its predecessors wrote moments ago, and odd sweeps flip direction
  via the grid index map. One forward+backward pass propagates a minimum
  across the entire band, collapsing the Jacobi round count (same fixed
  point: monotone min-propagation over the same edges).

Geometry: `cutpursuit_band` stores the band with B = 1024, HALO = 1 — every
dynamic VMEM slice offset (q*B + j*B) is a multiple of 1024, the Mosaic
alignment quantum, so no pair-shifted mask layouts are needed (the round-2
`cc_pallas.py` experiment documented those constraints; this module
supersedes it). Reference semantics: the same CC labelling / ICM splits as
partition/partition.py:177's l0 cut pursuit backend.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .cutpursuit_band import B, WIN

_NCHUNK = WIN // B  # 3 column chunks of B per block row window
assert _NCHUNK == 3, "cc kernel's 0,2,1 column order assumes HALO == 1"
_BIGI = 2**30


# ---------------------------------------------------------------------------
# ICM field: field_i = sum_j band_w[i, j] * spin_j * [comp_i == comp_j]
# ---------------------------------------------------------------------------


def _icm_field_kernel(band_ref, comp_ref, spin_ref, out_ref):
    q = pl.program_id(0)
    j = pl.program_id(1)
    base = q * B  # window start of block q in padded coords (q*B - B + PAD)
    w = band_ref[0]                                  # [B, B] bf16
    comp_own = comp_ref[pl.ds(base + B, B)]          # [B] i32
    comp_win = comp_ref[pl.ds(base + j * B, B)]      # [B] i32
    spin_win = spin_ref[pl.ds(base + j * B, B)]      # [B] bf16
    # same-component mask via arithmetic compare (broadcast where() on a
    # [1, B] operand is an i1 relayout Mosaic refuses)
    m = (comp_own[:, None] - comp_win[None, :]) == 0
    wm = w * m.astype(jnp.bfloat16)
    # bf16 products (exact: spin is +-1/0), f32 row-sum accumulation. A
    # dot_general matvec here trips a Mosaic verifier bug (bf16->f32
    # vector.broadcast); the op is band-read bandwidth-bound either way.
    f = jnp.sum(
        (wm * spin_win[None, :]).astype(jnp.float32), axis=1, keepdims=True
    )                                                # [B, 1] f32

    @pl.when(j == 0)
    def _():
        out_ref[:] = f

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + f


@partial(jax.jit, static_argnames=("interpret",))
def icm_field_pallas(band_w, comp, spin, *, interpret: bool = False):
    """Same-component band field for every vertex.

    band_w: [NB, B, WIN] bf16; comp: [n] int32; spin: [n] bf16 (+1/-1, 0 on
    pads). Returns [n] f32 = sum over in-band same-comp neighbors of
    w * spin (the masked matvec `split_once` needs per ICM sweep)."""
    n = comp.shape[0]
    nb = n // B
    ghost_i = jnp.full((B,), -1, jnp.int32)          # never equals a comp id
    ghost_s = jnp.zeros((B,), jnp.bfloat16)
    comp_p = jnp.concatenate([ghost_i, comp, ghost_i])
    spin_p = jnp.concatenate([ghost_s, spin.astype(jnp.bfloat16), ghost_s])
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        vspec = pl.BlockSpec(comp_p.shape, lambda q, j: (0,))
    out = pl.pallas_call(
        _icm_field_kernel,
        grid=(nb, _NCHUNK),
        in_specs=[
            pl.BlockSpec((1, B, B), lambda q, j: (q, 0, j)),
            vspec,
            vspec,
        ],
        out_specs=pl.BlockSpec((B, 1), lambda q, j: (q, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(band_w, comp_p, spin_p)
    return out[:, 0]


# ---------------------------------------------------------------------------
# Gauss-Seidel CC min-propagation
# ---------------------------------------------------------------------------


def _cc_gs_kernel(adj_ref, key_ref, _lab_in, lab_ref, acc_ref, *, nb: int,
                  inner: int):
    d = pl.program_id(0)
    q = pl.program_id(1)
    j = pl.program_id(2)
    qq = jnp.where(d % 2 == 0, q, nb - 1 - q)        # direction flip
    base = qq * B
    # column chunks visit order 0, 2, 1: the DIAGONAL tile comes last so the
    # `inner` local min-propagation iterations below run while it is still
    # VMEM-resident (intra-block label chains advance one hop per plain
    # sweep — the local iterations close `inner` hops per band read, which
    # is what collapses the outer CC round count)
    col = (2 * j) % 3
    # adjacency streamed as int8 — HALF the bytes of the bf16 band (the
    # sweep is HBM-bound; the key mask is computed in-register, so the
    # band input is loop-invariant across all CC calls of a solve)
    adj = adj_ref[0].astype(jnp.int32)               # [B, B] 0/1
    key_own = key_ref[pl.ds(base + B, B)]
    key_win = key_ref[pl.ds(base + col * B, B)]
    lab_win = lab_ref[pl.ds(base + col * B, B)]
    mi = ((key_own[:, None] - key_win[None, :]) == 0).astype(jnp.int32) * adj
    # arithmetic select: cand = BIG + m*(lab - BIG) == lab where m else BIG
    cand = jnp.int32(_BIGI) + mi * (lab_win[None, :] - jnp.int32(_BIGI))
    rowmin = jnp.min(cand, axis=1)                   # [B]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = rowmin

    @pl.when(j == 1)
    def _():
        acc_ref[:] = jnp.minimum(acc_ref[:], rowmin)

    @pl.when(j == _NCHUNK - 1)
    def _():
        own = lab_ref[pl.ds(base + B, B)]
        lab = jnp.minimum(jnp.minimum(own, acc_ref[:]), rowmin)
        # local Gauss-Seidel closure over the diagonal tile (mi is the
        # diagonal mask here — col == HALO on the last visit)
        for _ in range(inner):
            c2 = jnp.int32(_BIGI) + mi * (lab[None, :] - jnp.int32(_BIGI))
            lab = jnp.minimum(lab, jnp.min(c2, axis=1))
        lab_ref[pl.ds(base + B, B)] = lab


@jax.jit
def band_adjacency_i8(band_w):
    """[NB, B, WIN] bf16 band -> int8 0/1 adjacency (the CC sweeps' input:
    half the HBM bytes per sweep, built once per solve)."""
    return (band_w > jnp.bfloat16(0.0)).astype(jnp.int8)


@partial(jax.jit, static_argnames=("n_sweeps", "inner", "interpret"))
def cc_sweeps_pallas(lab, adj8, key, n_sweeps: int = 2, inner: int = 8,
                     interpret: bool = False):
    """`n_sweeps` alternating-direction Gauss-Seidel min-propagation sweeps
    over the band (labels resident in VMEM, updated in place), each with
    `inner` extra local closure iterations on the diagonal tile.

    lab: [n] int32; adj8: [NB, B, WIN] int8 0/1 (from `band_adjacency_i8`);
    key: [n] int32 — vertices are connected iff the band adjacency is set
    AND their keys match (the caller encodes (component, split side) as
    comp*2 + b). Same fixed point as the Jacobi `cc_band_sweeps` (both are
    monotone relaxations of the same edge set)."""
    n = lab.shape[0]
    nb = n // B
    ghost_k = jnp.full((B,), -1, jnp.int32)
    ghost_l = jnp.full((B,), _BIGI, jnp.int32)
    key_p = jnp.concatenate([ghost_k, key, ghost_k])
    lab_p = jnp.concatenate([ghost_l, lab, ghost_l])
    kernel = partial(_cc_gs_kernel, nb=nb, inner=inner)
    from jax.experimental.pallas import tpu as pltpu

    scratch = [pltpu.VMEM((B,), jnp.int32)]
    if not interpret:
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        vspec = pl.BlockSpec(lab_p.shape, lambda d, q, j: (0,))
    out = pl.pallas_call(
        kernel,
        grid=(n_sweeps, nb, _NCHUNK),
        in_specs=[
            pl.BlockSpec(
                (1, B, B),
                # column visit order 0, 2, 1 — diagonal last (see kernel)
                lambda d, q, j: (
                    jnp.where(d % 2 == 0, q, nb - 1 - q), 0, (2 * j) % 3
                ),
            ),
            vspec,
            vspec,
        ],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct(lab_p.shape, jnp.int32),
        input_output_aliases={2: 0},
        scratch_shapes=scratch,
        interpret=interpret,
    )(adj8, key_p, lab_p)
    return out[B : B + n]

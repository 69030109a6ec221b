"""Pallas Gauss-Seidel connected-components sweeps over the banded graph.

The XLA form (`ops.cutpursuit_band.cc_band_sweeps`) is JACOBI: every block
row reads the previous sweep's labels, so information moves at most HALO
blocks per sweep and the label-propagation loop needs many rounds. This
kernel runs the same min-propagation mostly GAUSS-SEIDEL: the TPU grid
executes sequentially and the label vector stays resident in VMEM across the
whole pass (input/output aliased), so each step reads the labels earlier
steps wrote moments ago — one forward pass pushes a minimum arbitrarily far
down the band, one backward pass (odd sweeps flip direction via the index
map) pushes it back up. Two sweeps typically replace a dozen Jacobi rounds.

Mosaic shapes the design: dynamic VMEM loads/stores must be 1024-aligned
(one (8,128) i32 tile) and mid-tile static slices/1D rolls are unsupported.
So each grid step processes a PAIR of band block rows (1024 points), and the
mask arrives in PAIR-RELATIVE columns (`_pair_mask`: odd rows pre-shifted by
B, width 3*_PAD) so both rows read the same aligned [base, base+3072) label
window with offset-0 slices only. Rows within a pair update Jacobi-style;
freshness flows across pairs.

Same fixed point as the Jacobi form (monotone min-propagation over the same
edges), verified in tests/test_pallas.py — and verified bit-identical
end-to-end inside `_solve_band` on the real chip (ncomp/energy/labels all
equal). MEASURED OUTCOME on v5e (60k room, whole solver): 0.28 s with the
GS kernel vs 0.26 s Jacobi — the per-CC pair-mask materialization (~200 MB)
cancels the fewer-rounds win, so the XLA Jacobi form stays the default and
this kernel is an opt-in (`use_pallas_cc=True`). Kept as the working
reference for banded Gauss-Seidel propagation in Pallas (the Mosaic
constraints it navigates are documented below). Reference semantics:
connected_components.cpp:17-110 (the component labelling the reference does
with Boost on the host).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .cutpursuit_band import B, HALO, WIN

_PAD = HALO * B          # 1024 — the alignment quantum
_W = 3 * _PAD            # pair window width (covers both rows' columns)
_BIGI = 2**30


def _pair_mask(same_band):
    """[NB, B, WIN] row-relative mask -> [NB, B, _W] pair-relative int8.

    Row q's column c addresses padded label position q*B + c; pair-relative
    columns address base + c with base = (q // 2) * 2B, so even rows keep
    their columns and odd rows shift right by B."""
    even = jnp.pad(same_band, ((0, 0), (0, 0), (0, _W - WIN)))
    odd = jnp.pad(same_band, ((0, 0), (0, 0), (B, _W - WIN - B)))
    nb = same_band.shape[0]
    parity = (jnp.arange(nb) % 2).astype(bool)[:, None, None]
    out = jnp.where(parity, odd, even).astype(jnp.int8)
    # pair-major layout [NB2, 2B, _W]: the kernel block is one pair and the
    # row merge happens here, not as an in-kernel relayout
    return out.reshape(nb // 2, 2 * B, _W)


def _cc_gs_kernel(same_ref, _lab_in, lab_ref, *, nb2: int):
    import jax.experimental.pallas as pl

    d = pl.program_id(0)
    p = pl.program_id(1)
    pp = jnp.where(d % 2 == 0, p, nb2 - 1 - p)   # pair index (direction flip)
    base = pp * (2 * B)                           # padded coords, % 1024 == 0
    w = lab_ref[pl.ds(base, _W)]                  # [3072] aligned window
    own = lab_ref[pl.ds(base + _PAD, 2 * B)]      # [1024]
    same = same_ref[0]                            # [2B, _W] int8
    # arithmetic select instead of where(): the [1, _W] window operand keeps
    # a sublane-replicated layout that Mosaic cannot reconcile with an i1
    # mask ("invalid relayout"); plain int math has no such constraint.
    # mask in {0,1}: cand = BIG + m*(w - BIG) == w where m else BIG
    w2 = w[None, :]
    cand = jnp.int32(_BIGI) + same.astype(jnp.int32) * (
        w2 - jnp.int32(_BIGI)
    )
    new = jnp.minimum(own, jnp.min(cand, axis=1))
    lab_ref[pl.ds(base + _PAD, 2 * B)] = new


@partial(jax.jit, static_argnames=("n_sweeps", "interpret"))
def cc_band_sweeps_gs(lab, pair_mask, n_sweeps: int = 2,
                      interpret: bool = False):
    """Gauss-Seidel-across-pairs replacement for `cc_band_sweeps` (same
    fixed point).

    lab: [n] int32 labels (n a multiple of 2*B); pair_mask: [NB2, 2B, _W]
    int8 from `_pair_mask`. Returns labels after `n_sweeps` alternating-
    direction passes."""
    import jax.experimental.pallas as pl

    n = lab.shape[0]
    nb = n // B
    assert nb % 2 == 0, "caller pads block count to a power of two >= 2"
    nb2 = nb // 2
    ghost = jnp.full((_PAD,), _BIGI, jnp.int32)
    lab_p = jnp.concatenate([ghost, lab.astype(jnp.int32), ghost])

    kernel = partial(_cc_gs_kernel, nb2=nb2)
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        label_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        label_spec = pl.BlockSpec(lab_p.shape, lambda d, p: (0,))
    out = pl.pallas_call(
        kernel,
        grid=(n_sweeps, nb2),
        in_specs=[
            pl.BlockSpec(
                (1, 2 * B, _W),
                lambda d, p: (jnp.where(d % 2 == 0, p, nb2 - 1 - p), 0, 0),
            ),
            label_spec,
        ],
        out_specs=label_spec,
        out_shape=jax.ShapeDtypeStruct(lab_p.shape, jnp.int32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(pair_mask, lab_p)
    return out[_PAD : _PAD + n]

"""Graph coarsening pooling (mean/max) over node maps.

Reference parity: learning/ecc/GraphPoolModule.py + GraphPoolInfo.py — part of
the ECC library surface (not used by the SPG pipeline itself, SURVEY.md §2.2).
The reference streams edges in shards with custom fw/bw CUDA kernels
(maxpool_fw/bw, avgpool); here pooling is one masked segment reduction whose
backward falls out of jax.grad (mean scatters evenly, max routes to the
argmax — exactly what the hand-written kernels did).

The pooling map is a flat edge list (child node -> coarse node), the
static-shape analogue of GraphPoolInfo's per-node child lists.
"""
from __future__ import annotations

import jax

from ..ops.segment import segment_max, segment_mean


def graph_pool(
    h: jax.Array,
    child: jax.Array,
    parent: jax.Array,
    n_coarse: int,
    mask: jax.Array | None = None,
    aggr: str = "mean",
) -> jax.Array:
    """Pool node features onto a coarsened graph.

    Args:
      h: [N, C] fine-node features.
      child/parent: [M] int32 pooling map entries (fine idx -> coarse idx).
      n_coarse: static coarse-node capacity.
      mask: [M] bool validity of map entries (padding).
      aggr: 'mean' | 'max' (GraphPoolModule avg/max variants).

    Returns [n_coarse, C]; coarse nodes with no children are zero (parity with
    the CUDA kernels' degree-0 handling).
    """
    hc = h[child]
    if aggr == "mean":
        return segment_mean(hc, parent, n_coarse, mask)
    if aggr == "max":
        return segment_max(hc, parent, n_coarse, mask)
    raise ValueError(f"unknown aggr {aggr!r}")


def graph_unpool(
    h_coarse: jax.Array, parent_of: jax.Array
) -> jax.Array:
    """Inverse map: broadcast coarse features back to fine nodes
    (parent_of: [N] coarse index per fine node)."""
    return h_coarse[parent_of]

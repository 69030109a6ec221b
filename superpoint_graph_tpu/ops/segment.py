"""Masked segment reductions — the workhorse replacing the reference's CUDA
segment kernels (learning/ecc/cuda_kernels.py: conv_aggregate_fw/bw, maxpool,
avgpool) and its C++ accumulation loops.

All helpers take a `num_segments` static bound and an optional validity mask so
padded elements are exact no-ops; XLA lowers them to efficient sorted-scatter
code on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -3.4e38


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Mean of `data` rows per segment; empty segments yield 0 (reference
    conv_aggregate_fw zero-fills nodes with degree 0, cuda_kernels.py:75-86)."""
    if mask is not None:
        data = jnp.where(mask[..., None] if data.ndim > 1 else mask, data, 0)
        ones = mask.astype(data.dtype)
    else:
        ones = jnp.ones(data.shape[0], data.dtype)
    tot = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    cnt = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(cnt, 1.0)
    return tot / (denom[..., None] if data.ndim > 1 else denom)


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Max per segment; empty segments yield 0 (matching maxpool_fw's handling
    of degree-0 nodes, cuda_kernels.py:160-168)."""
    if mask is not None:
        m = mask[..., None] if data.ndim > 1 else mask
        data = jnp.where(m, data, _NEG)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(out <= _NEG / 2, 0.0, out)


def segment_sum(data, segment_ids, num_segments, mask=None):
    if mask is not None:
        data = jnp.where(mask[..., None] if data.ndim > 1 else mask, data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids, num_segments, mask=None):
    ones = jnp.ones(segment_ids.shape[0], jnp.int32)
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)

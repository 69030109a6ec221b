"""Edge-conditioned convolution as one fused gather → (batched) matmul →
masked segment-mean.

Replaces the reference's ECC runtime: custom autograd op + NVRTC CUDA segment
kernels + edge-shard streaming (learning/ecc/GraphConvModule.py:44-152,
cuda_kernels.py:55-139, utils.py:56-69). On TPU none of that machinery is
needed: the gather and per-edge product are one XLA fusion, the mean-aggregation
is a `segment_sum`, memory is bounded by the static padded edge count, and the
backward pass falls out of `jax.grad` (the hand-written backward of the
reference is exactly the transpose XLA derives).

Semantics (GraphConvModule.py:34-41,63-93): for every edge e = (src, tgt),
message = W_e @ h[src] (matrix mode, W_e in R^{in x out}) or w_e * h[src]
(vector mode); node output = mean over *incoming* edges (grouped by tgt);
nodes with no incoming edge output zeros.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ecc_conv(
    h: jax.Array,
    weights: jax.Array,
    src: jax.Array,
    tgt: jax.Array,
    edge_mask: jax.Array,
    n_nodes: int,
    attention: bool = False,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Edge-conditioned convolution over a padded edge list.

    Args:
      h: [N, C] node features (padded; invalid nodes are zeros).
      weights: [E, C] (vector mode) or [E, C, C_out] (matrix mode) per-edge
        filters from the filter-generating network.
      src/tgt: [E] int32 edge endpoints; padding edges may point anywhere.
      edge_mask: [E] bool, False for padding edges.
      n_nodes: static node-capacity N.
      attention: edge-softmax filters (reference local NNConv `softmax` mode,
        learning/modules.py:104-116): leaky-relu the filters, then per-channel
        softmax over each target node's incoming edges.

    Returns [N, C_out] aggregated node features.
    """
    if attention:
        w = jax.nn.leaky_relu(weights, negative_slope)
        flat = w.reshape(w.shape[0], -1)
        flat = jnp.where(edge_mask[:, None], flat, -1e30)
        mx = jax.ops.segment_max(flat, tgt, num_segments=n_nodes)
        ex = jnp.exp(flat - mx[tgt])
        ex = jnp.where(edge_mask[:, None], ex, 0.0)
        den = jax.ops.segment_sum(ex, tgt, num_segments=n_nodes)
        weights = (ex / jnp.maximum(den[tgt], 1e-20)).reshape(w.shape)

    hs = h[src]  # [E, C]
    if weights.ndim == 2:
        msg = hs * weights
    else:
        # batched per-edge matmul: MXU work at bf16-friendly shapes
        msg = jnp.einsum(
            "ec,eco->eo", hs, weights, preferred_element_type=jnp.float32
        )
    m = edge_mask.astype(msg.dtype)[:, None]
    msg = msg * m
    tot = jax.ops.segment_sum(msg, tgt, num_segments=n_nodes)
    cnt = jax.ops.segment_sum(
        edge_mask.astype(msg.dtype), tgt, num_segments=n_nodes
    )
    return tot / jnp.maximum(cnt, 1.0)[:, None]

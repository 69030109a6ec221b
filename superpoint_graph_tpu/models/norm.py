"""Normalization layers with padding-mask support.

The reference batches variable numbers of superpoints; its BatchNorm sees only
valid rows because invalid superpoints are filtered out before the net
(pointnet.py:147-158 CloudEmbedder). Our TPU batches are padded to static
shapes, so the norms here take an explicit row mask and compute statistics over
valid rows only — making padding exactly invisible (the padding-invariance test
is the moral equivalent of the reference's edge_mem_limit shard-consistency
test, SURVEY.md §4).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d-equivalent over rows [N, C] (or [N, P, C] treating N*P as the
    batch) with an optional validity mask of shape [N]."""

    use_running_average: bool = False
    momentum: float = 0.9  # torch BatchNorm momentum 0.1 == 0.9 decay here
    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is not None:
                m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)).astype(
                    x.dtype
                )
                cnt = jnp.maximum(jnp.sum(m) * (x.size / (c * mask.size)), 1.0)
                mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / cnt
                var = (
                    jnp.sum(((x - mean) ** 2) * m, axis=tuple(range(x.ndim - 1)))
                    / cnt
                )
            else:
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(x, axis=axes)
                var = jnp.var(x, axis=axes)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        if mask is not None:
            m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
            y = jnp.where(m, y, 0.0)
        return y


class GroupNormRow(nn.Module):
    """GroupNorm over the channel axis per row (reference 'layer'/'group' norm
    modes, pointnet.py:30-36). num_groups=1 == LayerNorm-without-bias-scale
    semantics of nn.GroupNorm(1, C)."""

    num_groups: int = 1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        g = self.num_groups
        shape = x.shape[:-1] + (g, c // g)
        xg = x.reshape(shape)
        mean = jnp.mean(xg, axis=-1, keepdims=True)
        var = jnp.var(xg, axis=-1, keepdims=True)
        y = ((xg - mean) / jnp.sqrt(var + self.epsilon)).reshape(x.shape)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale + bias


def instance_norm_row(x, eps: float = 1e-5):
    """InstanceNorm1d(1, affine=False) on rows: normalize each row over its full
    feature axis (reference GRUCellEx 'ini'/'inh', modules.py:212-222)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)

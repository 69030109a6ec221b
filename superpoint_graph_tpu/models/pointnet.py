"""PointNet superpoint embedder + spatial transformer (flax.linen).

Behavioral spec from reference learning/pointnet.py:
  * STNkD (16-61): per-point 1x1-conv stack -> max-pool over points -> fc stack
    -> zero-init projection to a KxK matrix + I. Default K=2: an xy-plane
    transform only.
  * PointNet (63-133): STN on the first `nfeat_stn` channels, the predicted T
    applied to the first two (xy) coordinate channels (121-124), then the conv
    stack, max-pool over points, concat of "global" features (superpoint
    diameter etc.), fc head with optional pre-last dropout.
  * CloudEmbedder (138-158): superpoints below `ptn_minpts` get zero
    embeddings. The reference gathers valid clouds then index-copies back; our
    padded batches just multiply by the validity mask — same result, static
    shapes, and the "memory monger" manual re-forward (160-180) is replaced by
    `jax.checkpoint` at the train-step level.

Layout: clouds are [n_sp, n_pts, C] (feature-last: lanes = channels on TPU).
1x1 Conv1d == Dense applied per point.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .norm import GroupNormRow, MaskedBatchNorm


class _NormAct(nn.Module):
    norm: str = "batch"
    n_group: int = 1
    train: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        if self.norm == "batch":
            x = MaskedBatchNorm(use_running_average=not self.train)(x, mask)
        elif self.norm == "layer":
            x = GroupNormRow(num_groups=1)(x)
        elif self.norm == "group":
            x = GroupNormRow(num_groups=self.n_group)(x)
        return nn.relu(x)


class STNkD(nn.Module):
    """Spatial transformer producing a per-superpoint KxK matrix."""

    nf_conv: Sequence[int]
    nf_fc: Sequence[int]
    k: int = 2
    norm: str = "batch"
    n_group: int = 1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        # x: [n_sp, n_pts, c_stn]
        for w in self.nf_conv:
            x = nn.Dense(w)(x)
            x = _NormAct(self.norm, self.n_group, train)(x, mask)
        x = jnp.max(x, axis=1)  # max-pool over points
        for w in self.nf_fc:
            x = nn.Dense(w)(x)
            x = _NormAct(self.norm, self.n_group, train)(x, mask)
        proj = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(x)
        eye = jnp.eye(self.k, dtype=x.dtype)
        return proj.reshape(-1, self.k, self.k) + eye[None]


class PointNet(nn.Module):
    """Superpoint embedder (reference pointnet.py:63-133)."""

    nf_conv: Sequence[int]
    nf_fc: Sequence[int]
    nf_conv_stn: Sequence[int]
    nf_fc_stn: Sequence[int]
    nfeat: int
    nfeat_stn: int = 2
    nfeat_global: int = 1
    prelast_do: float = 0.5
    last_ac: bool = False
    is_res: bool = False
    norm: str = "batch"
    n_group: int = 1

    @nn.compact
    def __call__(self, clouds, clouds_global, mask=None, train: bool = True):
        """clouds: [n_sp, n_pts, C]; clouds_global: [n_sp, G]; mask: [n_sp]."""
        x = clouds
        if self.nfeat_stn > 0:
            t = STNkD(
                self.nf_conv_stn, self.nf_fc_stn, k=2, norm=self.norm,
                n_group=self.n_group, name="stn",
            )(x[..., : self.nfeat_stn], mask, train)
            # xy' = xy @ T (reference: bmm(input[:, :2, :].T, T), pointnet.py:123)
            xy = jnp.einsum("npk,nkj->npj", x[..., :2], t)
            x = jnp.concatenate([xy, x[..., 2:]], axis=-1)

        for w in self.nf_conv:
            x = nn.Dense(w)(x)
            x = _NormAct(self.norm, self.n_group, train)(x, mask)
        x = jnp.max(x, axis=1)  # [n_sp, C]

        if clouds_global is not None:
            g = clouds_global
            if g.ndim == 1:
                g = g[:, None]
            x = jnp.concatenate([x, g], axis=-1)

        n_fc = len(self.nf_fc)
        for i, w in enumerate(self.nf_fc):
            dense = nn.Dense(
                w,
                kernel_init=(
                    nn.initializers.normal(1e-2)
                    if (self.is_res and i == n_fc - 1)
                    else nn.initializers.lecun_normal()
                ),
            )
            x = dense(x)
            if i < n_fc - 1 or self.last_ac:
                x = _NormAct(self.norm, self.n_group, train)(x, mask)
            if i == n_fc - 2 and self.prelast_do > 0:
                x = nn.Dropout(self.prelast_do, deterministic=not train)(x)

        if mask is not None:
            x = jnp.where(mask[:, None], x, 0.0)  # CloudEmbedder zero-fill
        return x

"""The flagship SPG segmentation model: PointNet superpoint embedder feeding
the ECC-GRU graph network (reference create_model, learning/main.py:414-431:
`model.ptn` + `model.ecc`).

Batches are a single padded disconnected union of superpoint graphs (the
reference's GraphConvInfo union, learning/ecc/GraphConvInfo.py:33-69, made
static-shape).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from .graphnet import GraphNetwork
from .pointnet import PointNet


@flax.struct.dataclass
class SpgBatch:
    """Padded batch of superpoint graphs (one disconnected union)."""

    clouds: jax.Array          # [n_sp, n_pts, C] sampled superpoint point sets
    clouds_global: jax.Array   # [n_sp, G] global features (diameter, ...)
    cloud_mask: jax.Array      # [n_sp] bool: embeddable (>= ptn_minpts points)
    node_mask: jax.Array       # [n_sp] bool: real superpoint (vs padding)
    targets: jax.Array         # [n_sp] int32 class, -100 = ignore
    target_size: jax.Array     # [n_sp, n_classes+1] soft GT histogram
    src: jax.Array             # [n_edges] int32 superedge source node
    tgt: jax.Array             # [n_edges] int32 superedge target node
    edge_feats: jax.Array      # [n_edges, F]
    edge_mask: jax.Array       # [n_edges] bool
    # edge-feature compaction (reference ecc/utils.py:44-48 unique_rows +
    # GraphConvModule.py:40-41 idxe): the fnet is evaluated once per UNIQUE
    # edge-feature row, then gathered back per edge. Optional — None disables.
    edge_feat_uniq: jax.Array | None = None  # [n_uniq, F] unique rows (padded)
    edge_feat_idx: jax.Array | None = None   # [n_edges] int32 -> uniq row
    edge_uniq_mask: jax.Array | None = None  # [n_uniq] bool (real rows)


class SpgModel(nn.Module):
    """ptn + ecc, with the same hyper-parameter surface as the reference CLI."""

    n_classes: int
    model_config: str = "gru_10_0,f_13"
    ptn_widths: Sequence[Sequence[int]] = ((64, 64, 128, 128, 256), (256, 64, 32))
    ptn_widths_stn: Sequence[Sequence[int]] = ((64, 64, 128), (128, 64))
    ptn_nfeat: int = 11
    ptn_nfeat_stn: int = 11
    ptn_nfeat_global: int = 1
    ptn_prelast_do: float = 0.0
    fnet_widths: Sequence[int] = (13, 32, 128, 64)  # [edge_feats] + hidden
    fnet_orthoinit: bool = True
    fnet_llbias: bool = False
    fnet_bnidx: int = 2

    def setup(self):
        self.ptn = PointNet(
            nf_conv=tuple(self.ptn_widths[0]),
            nf_fc=tuple(self.ptn_widths[1]),
            nf_conv_stn=tuple(self.ptn_widths_stn[0]),
            nf_fc_stn=tuple(self.ptn_widths_stn[1]),
            nfeat=self.ptn_nfeat,
            nfeat_stn=self.ptn_nfeat_stn,
            nfeat_global=self.ptn_nfeat_global,
            prelast_do=self.ptn_prelast_do,
        )
        self.ecc = GraphNetwork(
            config=self.model_config,
            nfeat=int(self.ptn_widths[1][-1]),
            fnet_widths=tuple(self.fnet_widths),
            fnet_orthoinit=self.fnet_orthoinit,
            fnet_llbias=self.fnet_llbias,
            fnet_bnidx=self.fnet_bnidx,
        )

    def __call__(self, batch: SpgBatch, train: bool = True) -> jax.Array:
        emb = self.ptn(
            batch.clouds, batch.clouds_global, batch.cloud_mask, train=train
        )
        emb = jnp.where(batch.cloud_mask[:, None], emb, 0.0)
        if batch.edge_feat_uniq is not None:
            ef, idx, fnet_mask = (
                batch.edge_feat_uniq, batch.edge_feat_idx, batch.edge_uniq_mask
            )
        else:
            ef, idx, fnet_mask = batch.edge_feats, None, batch.edge_mask
        logits = self.ecc(
            emb,
            ef,
            batch.src,
            batch.tgt,
            batch.edge_mask,
            node_mask=batch.node_mask,
            train=train,
            edge_feat_idx=idx,
            fnet_mask=fnet_mask,
        )
        return logits

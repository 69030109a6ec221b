"""GraphNetwork: the ECC-GNN assembled from the reference's layer-config DSL.

Behavioral spec from reference learning/graphnet.py:17-99 and modules.py:
  * config tokens (comma-separated): `f_K` linear, `b[_na]` batchnorm,
    `r` relu, `d_p` dropout, `crf_N` ECC-CRF,
    `gru_N[_vv[_ln[_ingate[_cat]]]]` / `lstm_...` recurrent ECC where N is the
    number of message-passing iterations, vv=0 selects matrix (nfeat^2) edge
    filters, and cat (default 1) concatenates all N+1 states for the head.
  * filter-generating net (create_fnet, graphnet.py:17-34): MLP over edge
    features, ReLU between layers, optional interior batchnorm at `bnidx`,
    orthogonal init (gain sqrt(2) on hidden, 1 on last), last-layer bias
    optional.
  * RNNGraphConvModule (modules.py:128-183): fnet evaluated ONCE per batch,
    weights shared across iterations; each iteration is ecc_conv then the
    GRU/LSTM cell; states concatenated when cat_all.

Graph structure (edge list + masks) is passed to `__call__` — static padded
shapes, one XLA program, no GraphConvInfo/set_info machinery.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .cells import GRUCellEx, LSTMCellEx
from .ecc import ecc_conv
from .norm import MaskedBatchNorm


class FNet(nn.Module):
    """Filter-generating MLP (reference create_fnet)."""

    widths: Sequence[int]  # [edge_feats, hidden...]
    out: int
    orthoinit: bool = True
    llbias: bool = True
    bnidx: int = -1

    @nn.compact
    def __call__(self, e, edge_mask=None, train: bool = True):
        relu_gain = jnp.sqrt(2.0)
        ws = list(self.widths)
        for k in range(len(ws) - 1):
            init = (
                nn.initializers.orthogonal(scale=relu_gain)
                if self.orthoinit
                else nn.initializers.lecun_normal()
            )
            e = nn.Dense(ws[k + 1], kernel_init=init)(e)
            if self.bnidx == k:
                e = MaskedBatchNorm(use_running_average=not train)(e, edge_mask)
            e = nn.relu(e)
        init = (
            nn.initializers.orthogonal()
            if self.orthoinit
            else nn.initializers.lecun_normal()
        )
        e = nn.Dense(self.out, use_bias=self.llbias, kernel_init=init)(e)
        return e


class GraphNetwork(nn.Module):
    config: str
    nfeat: int
    fnet_widths: Sequence[int]  # [edge_feats] + hidden widths
    fnet_orthoinit: bool = True
    fnet_llbias: bool = True
    fnet_bnidx: int = -1

    @nn.compact
    def __call__(
        self,
        h,
        edge_feats,
        src,
        tgt,
        edge_mask,
        node_mask=None,
        train: bool = True,
        edge_feat_idx=None,
        fnet_mask=None,
    ):
        """With edge_feat_idx set, `edge_feats` holds UNIQUE feature rows and
        the fnet output is gathered back per edge (reference edge-feature
        compaction, ecc/utils.py:44-48 + GraphConvModule.py:40-41 — saves
        nfeat^2-sized fnet evaluations on duplicate rows). `fnet_mask` masks
        the fnet's interior batchnorm rows (defaults to edge_mask)."""
        n_nodes = h.shape[0]
        nfeat = self.nfeat
        if fnet_mask is None:
            fnet_mask = edge_mask

        def expand(weights):
            return weights if edge_feat_idx is None else weights[edge_feat_idx]
        for d, conf in enumerate(self.config.split(",")):
            parts = conf.strip().split("_")
            t = parts[0]
            if t == "f":
                h = nn.Dense(int(parts[1]), name=f"{d}_fc")(h)
                nfeat = int(parts[1])
            elif t == "b":
                h = MaskedBatchNorm(
                    use_running_average=not train,
                    affine=len(parts) == 1,
                    name=f"{d}_bn",
                )(h, node_mask)
            elif t == "r":
                h = nn.relu(h)
            elif t == "d":
                h = nn.Dropout(float(parts[1]), deterministic=not train)(h)
            elif t in ("gru", "lstm"):
                nrepeats = int(parts[1])
                vv = bool(int(parts[2])) if len(parts) > 2 else True
                layernorm = bool(int(parts[3])) if len(parts) > 3 else True
                ingate = bool(int(parts[4])) if len(parts) > 4 else True
                cat_all = bool(int(parts[5])) if len(parts) > 5 else True

                fnet = FNet(
                    self.fnet_widths,
                    nfeat if vv else nfeat * nfeat,
                    orthoinit=self.fnet_orthoinit,
                    llbias=self.fnet_llbias,
                    bnidx=self.fnet_bnidx,
                    name=f"{d}_fnet",
                )
                weights = expand(fnet(edge_feats, fnet_mask, train))
                if not vv:
                    weights = weights.reshape(-1, nfeat, nfeat)

                if t == "gru":
                    cell = GRUCellEx(
                        nfeat, layernorm=layernorm, ingate=ingate, name=f"{d}_cell"
                    )
                else:
                    cell = LSTMCellEx(
                        nfeat, layernorm=layernorm, ingate=ingate, name=f"{d}_cell"
                    )
                hxs = [h]
                cx = jnp.zeros_like(h)
                for _ in range(nrepeats):
                    inp = ecc_conv(h, weights, src, tgt, edge_mask, n_nodes)
                    if t == "gru":
                        h = cell(inp, h)
                    else:
                        h, cx = cell(inp, (h, cx))
                    hxs.append(h)
                if cat_all:
                    h = jnp.concatenate(hxs, axis=1)
                    nfeat *= nrepeats + 1
            elif t == "crf":
                nrepeats = int(parts[1])
                fnet = FNet(
                    self.fnet_widths,
                    nfeat * nfeat,
                    orthoinit=self.fnet_orthoinit,
                    llbias=self.fnet_llbias,
                    bnidx=self.fnet_bnidx,
                    name=f"{d}_fnet",
                )
                weights = expand(
                    fnet(edge_feats, fnet_mask, train)
                ).reshape(-1, nfeat, nfeat)
                # CRF-as-RNN (modules.py:185-202): Q softmaxed, propagated,
                # subtracted from the unaries; final softmax folds into the loss
                q = nn.softmax(h)
                for i in range(nrepeats):
                    q = ecc_conv(q, weights, src, tgt, edge_mask, n_nodes)
                    q = h - q
                    if i < nrepeats - 1:
                        q = nn.softmax(q)
                h = q
            elif len(t) > 0:
                raise NotImplementedError(f"Unknown module: {t}")
        return h

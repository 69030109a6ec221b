"""Per-point local embedder for the supervised partition (SSP).

Behavioral spec:
  * model (reference supervized_partition.py:411-434): an STNkD over the first
    `ptn_nfeat_stn` channels of each point's local neighborhood cloud + a
    PointNet with no internal STN whose global features are
    [diameter, (optional elevation/rgb/XY/xy), (optional flattened 2x2 T)];
    output L2-normalized (pointnet.py:207).
  * LocalCloudEmbedder (pointnet.py:182-218): the reference chunks at 2^16-1
    rows for cudnn; a single static padded batch replaces the chunking.
  * training step (supervized_partition.py:218-236): embeddings -> per-edge
    distances -> host cross-partition weights (cut pursuit in the loop) ->
    graph-structured loss, x1000 precision factor, elementwise grad clamp.

TPU design note: the in-loop cut pursuit needs embeddings on host, but the
backward pass must not recompute the PointNet forward. `jax.vjp` keeps the
forward residuals alive on device while the host computes the weights, so each
step runs exactly ONE forward and one backward (the reference holds the
autograd graph the same way).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.pointnet import PointNet, STNkD
from .losses import SspLossConfig, compute_dist, compute_loss, compute_weight_loss


@dataclasses.dataclass
class SspModelConfig:
    ptn_widths: Sequence[Sequence[int]] = ((32, 128), (34, 32, 32, 4))
    ptn_widths_stn: Sequence[Sequence[int]] = ((16, 64), (32, 16))
    ptn_nfeat_stn: int = 2
    use_rgb: bool = True
    global_feat: str = "eXYrgb"
    stn_as_global: bool = True
    ptn_norm: str = "batch"
    ptn_prelast_do: float = 0.0

    @property
    def n_feat(self) -> int:
        return 3 + 3 * int(self.use_rgb)

    @property
    def nfeat_global(self) -> int:
        n = 1  # diameter always
        if "e" in self.global_feat.replace("rgb", ""):
            n += 1
        if "rgb" in self.global_feat:
            n += 3
        if "XY" in self.global_feat:
            n += 2
        if "xy" in self.global_feat.replace("XY", ""):
            n += 2
        return n + 4 * int(self.stn_as_global)

    @property
    def n_embed(self) -> int:
        return int(self.ptn_widths[1][-1])


class LocalEmbedder(nn.Module):
    """stn + per-point PointNet -> L2-normalized embeddings."""

    cfg: SspModelConfig

    @nn.compact
    def __call__(self, clouds, clouds_global, mask=None, train: bool = True):
        """clouds [n, k_local, C] (xyz normalized + rgb), clouds_global [n, G0]
        (without the stn T columns — appended here)."""
        c = self.cfg
        x = clouds
        if c.ptn_nfeat_stn > 0:
            t = STNkD(
                tuple(c.ptn_widths_stn[0]), tuple(c.ptn_widths_stn[1]),
                k=2, norm=c.ptn_norm, name="stn",
            )(x[..., : c.ptn_nfeat_stn], mask, train)
            xy = jnp.einsum("npk,nkj->npj", x[..., :2], t)
            x = jnp.concatenate([xy, x[..., 2:]], axis=-1)
            if c.stn_as_global:
                clouds_global = jnp.concatenate(
                    [clouds_global, t.reshape(-1, 4)], axis=1
                )
        emb = PointNet(
            nf_conv=tuple(c.ptn_widths[0]),
            nf_fc=tuple(c.ptn_widths[1]),
            nf_conv_stn=(),
            nf_fc_stn=(),
            nfeat=c.n_feat,
            nfeat_stn=0,
            nfeat_global=c.nfeat_global,
            prelast_do=c.ptn_prelast_do,
            norm=c.ptn_norm,
            name="ptn",
        )(x, clouds_global, mask, train)
        norm = jnp.sqrt(jnp.sum(emb * emb, axis=1, keepdims=True) + 1e-12)
        return emb / norm


class SspTrainer:
    """One-forward-per-step SSP training with in-loop host cut pursuit."""

    def __init__(self, model_cfg: SspModelConfig, loss_cfg: SspLossConfig,
                 lr: float = 1e-2, grad_clip: float = 1.0):
        self.model = LocalEmbedder(model_cfg)
        self.loss_cfg = loss_cfg
        txs = []
        if grad_clip > 0:
            # reference clamps at grad_clip*factor with loss scaled by factor;
            # equivalent to clamping the unscaled gradient at grad_clip
            txs.append(optax.clip(grad_clip))
        txs.append(optax.inject_hyperparams(optax.adam)(learning_rate=lr))
        self.tx = optax.chain(*txs)
        self._emb_grad = jax.jit(self._emb_grad_fn)
        self._embed_jit = jax.jit(
            lambda params, batch_stats, clouds, glob: self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                clouds, glob, None, train=False,
            )
        )

    def init(self, rng, clouds, clouds_global, mask=None):
        variables = self.model.init(rng, clouds, clouds_global, mask, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": self.tx.init(params),
        }

    # --- jitted pieces ---------------------------------------------------
    def _emb_grad_fn(self, emb, edg_source, edg_target, is_transition, weights):
        def loss_fn(e):
            diff = compute_dist(e, edg_source, edg_target, self.loss_cfg.dist_type)
            l1, l2 = compute_loss(self.loss_cfg, diff, is_transition, weights)
            return (l1 + l2) / weights.shape[0]

        loss, de = jax.value_and_grad(loss_fn)(emb)
        return loss, de

    # --- public step -----------------------------------------------------
    def train_step(self, state, batch):
        """batch: dict with clouds, clouds_global, mask(None ok), edg_source,
        edg_target, is_transition, objects, xyz (host arrays)."""
        es = jnp.asarray(batch["edg_source"], jnp.int32)
        et = jnp.asarray(batch["edg_target"], jnp.int32)

        def fwd(p):
            emb, mut = self.model.apply(
                {"params": p, "batch_stats": state["batch_stats"]},
                jnp.asarray(batch["clouds"]),
                jnp.asarray(batch["clouds_global"]),
                None, train=True, mutable=["batch_stats"],
            )
            return emb, mut["batch_stats"]

        (emb, new_bs), vjp_fn = jax.vjp(fwd, state["params"])

        # host: cross-partition weights (cut pursuit on current embeddings)
        weights, pred_comp, pred_in_comp = compute_weight_loss(
            self.loss_cfg, np.asarray(emb), batch["objects"],
            batch["edg_source"], batch["edg_target"], batch["is_transition"],
            np.asarray(compute_dist(emb, es, et, self.loss_cfg.dist_type)),
            True, batch.get("xyz"),
        )

        loss, de = self._emb_grad(
            emb, es, et,
            jnp.asarray(batch["is_transition"], jnp.int32),
            jnp.asarray(weights, jnp.float32),
        )
        (grads,) = vjp_fn((de, jax.tree.map(jnp.zeros_like, new_bs)))
        updates, new_opt = self.tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": new_params,
            "batch_stats": new_bs,
            "opt_state": new_opt,
        }
        return new_state, float(loss), pred_comp, pred_in_comp

    def embed(self, state, clouds, clouds_global, train=False):
        return self._embed_jit(
            state["params"], state["batch_stats"],
            jnp.asarray(clouds), jnp.asarray(clouds_global),
        )

    def embed_chunked(self, state, clouds, clouds_global, chunk: int = 65536):
        """Chunked inference for huge clouds (the reference's run_batch /
        run_batch_cpu 2^16-row batching, pointnet.py:189-218): pads the tail
        chunk so every chunk hits one cached executable, streams results to
        host."""
        import numpy as np

        n = clouds.shape[0]
        out = []
        for i in range(0, n, chunk):
            c = np.asarray(clouds[i : i + chunk])
            g = np.asarray(clouds_global[i : i + chunk])
            m = len(c)
            if m < chunk:
                c = np.concatenate(
                    [c, np.zeros((chunk - m,) + c.shape[1:], c.dtype)]
                )
                g = np.concatenate(
                    [g, np.zeros((chunk - m,) + g.shape[1:], g.dtype)]
                )
            out.append(np.asarray(self.embed(state, c, g))[:m])
        return np.concatenate(out) if out else np.zeros((0,))

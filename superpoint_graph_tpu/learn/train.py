"""Jitted train/eval steps for the SPG segmentation model.

Reference parity (learning/main.py):
  * weighted cross-entropy ignoring -100 targets (main.py:205, filter_valid
    447-452) — here a mask instead of row filtering (static shapes)
  * element-wise gradient clamp to ±grad_clip (main.py:210-212) -> optax.clip
  * sgd(momentum)/adam + MultiStepLR(lr_steps, lr_decay) (main.py:172,433-437)
  * the PointNet "memory monger" (recompute in backward, pointnet.py:160-180)
    -> jax.checkpoint on the embedder apply
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import flax
import jax
import jax.numpy as jnp
import optax

from ..models.spgmodel import SpgBatch, SpgModel


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(lr: float, lr_steps: Sequence[int], lr_decay: float):
    """MultiStepLR: multiply by lr_decay at each epoch in lr_steps. The
    returned schedule maps *epoch* -> lr; the caller scales per-epoch
    (reference semantics: scheduler.step() per epoch, main.py:341)."""
    if not lr_steps:
        return lambda epoch: lr
    boundaries = {int(s): lr_decay for s in lr_steps}

    def schedule(epoch):
        factor = 1.0
        for s, d in sorted(boundaries.items()):
            factor = jnp.where(epoch >= s, factor * d, factor)
        return lr * factor

    return schedule


def make_optimizer(optim: str, lr: float, momentum: float, wd: float, grad_clip: float):
    """Build the optax chain; lr is injected per-step via inject_hyperparams so
    the MultiStep schedule (per-epoch) composes."""
    txs = []
    if grad_clip > 0:
        txs.append(optax.clip(grad_clip))  # element-wise clamp, main.py:210-212
    if optim == "sgd":
        base = optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr, momentum=momentum
        )
    elif optim == "adam":
        base = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    else:
        raise ValueError(f"unknown optimizer {optim!r}")
    if wd > 0:
        txs.append(optax.add_decayed_weights(wd))
    txs.append(base)
    return optax.chain(*txs)


def weighted_ce_loss(logits, targets, class_weights=None):
    """Cross entropy with -100 ignore semantics and optional per-class weights
    (torch F.cross_entropy(weight=...) normalizes by the sum of sample
    weights)."""
    valid = targets != -100
    t = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, t[:, None], axis=1)[:, 0]
    if class_weights is not None:
        w = class_weights[t]
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


class Trainer:
    """Owns the jitted step functions for one model/optimizer configuration."""

    def __init__(
        self,
        model: SpgModel,
        optim: str = "adam",
        lr: float = 1e-2,
        lr_steps: Sequence[int] = (),
        lr_decay: float = 0.7,
        momentum: float = 0.9,
        wd: float = 0.0,
        grad_clip: float = 1.0,
        class_weights=None,
        checkpoint_ptn: bool = True,
    ):
        self.model = model
        self.lr_schedule = make_lr_schedule(lr, lr_steps, lr_decay)
        self.tx = make_optimizer(optim, lr, momentum, wd, grad_clip)
        self.class_weights = (
            None if class_weights is None else jnp.asarray(class_weights)
        )
        self.checkpoint_ptn = checkpoint_ptn
        self._train_step = jax.jit(self._train_step_fn)
        self._eval_step = jax.jit(self._eval_step_fn)

    def init(self, rng, batch: SpgBatch) -> TrainState:
        variables = self.model.init(rng, batch, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )

    def set_epoch_lr(self, state: TrainState, epoch: int) -> TrainState:
        """Apply the MultiStepLR factor for this epoch (scheduler.step parity)."""
        lr = self.lr_schedule(epoch)
        opt_state = state.opt_state
        # the injected-hyperparams state is the last element of the chain state
        new_inner = opt_state[-1]._replace(
            hyperparams={**opt_state[-1].hyperparams, "learning_rate": jnp.asarray(lr)}
        )
        return state.replace(opt_state=opt_state[:-1] + (new_inner,))

    # --- step functions -------------------------------------------------
    def _apply(self, params, batch_stats, batch, train, rngs=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mut = self.model.apply(
                variables, batch, train=True, mutable=["batch_stats"], rngs=rngs
            )
            return out, mut["batch_stats"]
        out = self.model.apply(variables, batch, train=False)
        return out, batch_stats

    def _train_step_fn(self, state: TrainState, batch: SpgBatch, rng):
        def loss_fn(params):
            fwd = functools.partial(
                self._apply, rngs={"dropout": rng}
            )
            if self.checkpoint_ptn:
                # rematerialize activations in backward (memory-monger parity)
                fwd = jax.checkpoint(fwd, static_argnums=(3,))
            logits, new_bs = fwd(params, state.batch_stats, batch, True)
            loss = weighted_ce_loss(logits, batch.targets, self.class_weights)
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, loss, logits

    def _eval_step_fn(self, state: TrainState, batch: SpgBatch):
        logits, _ = self._apply(state.params, state.batch_stats, batch, False)
        loss = weighted_ce_loss(logits, batch.targets, self.class_weights)
        return loss, logits

    # --- public API -----------------------------------------------------
    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    def eval_step(self, state, batch):
        return self._eval_step(state, batch)

    def train_steps(self, state, batches: Sequence, rng):
        """K optimizer steps in ONE dispatch: lax.scan over a leaf-stacked
        batch pytree (all batches must share one padding-bucket shape).

        Removes host->device dispatch from the step loop entirely — the
        right shape for deployments where dispatch latency is real. On THIS
        tunneled single-chip box it measured ~1.8x SLOWER per step than
        queue-fed sequential dispatch (BENCH r5 scan8 keys; async dispatch
        already hides the tunnel), so it is not the default anywhere.
        Same optimizer math as K sequential steps (tested); only the
        dropout rng stream differs. Returns (state, losses [K],
        logits [K, n_sp, C])."""
        k = len(batches)
        if k == 1:
            state, loss, logits = self._train_step(state, batches[0], rng)
            return state, jnp.asarray(loss)[None], logits[None]
        shapes = {
            tuple(
                (f.name, None if getattr(b, f.name) is None
                 else tuple(getattr(b, f.name).shape))
                for f in dataclasses.fields(b)
            )
            for b in batches
        }
        if len(shapes) != 1:
            raise ValueError(
                "train_steps requires one padding bucket; got "
                f"{len(shapes)} distinct batch shapes"
            )
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        return self._train_steps(state, stacked, rng)

    @functools.partial(jax.jit, static_argnums=0)
    def _train_steps(self, state, stacked, rng):
        def step(carry, xs):
            st, r = carry
            batch, = xs
            r, r_step = jax.random.split(r)
            st, loss, logits = self._train_step_fn(st, batch, r_step)
            return (st, r), (loss, logits)

        (state, _), (losses, logits) = jax.lax.scan(
            step, (state, rng), (stacked,)
        )
        return state, losses, logits

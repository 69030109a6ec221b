"""Data-parallel training: one padded SPG union per device, replicated params,
psum gradient reduction over the ICI mesh.

The union graphs are self-contained per device (edges never cross devices), so
the ONLY collectives are the gradient/batch-stat pmeans — the layout the
scaling-book recipe prescribes for replicated small models with sharded data.
Batch leaves carry a leading device axis: [n_dev, per_dev_capacity, ...].
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..learn.train import TrainState, weighted_ce_loss
from ..models.spgmodel import SpgBatch


def stack_device_batches(batches) -> SpgBatch:
    """Stack per-device SpgBatches (identical shapes) along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def shard_batch(batch: SpgBatch, mesh: Mesh, axis: str = "dp") -> SpgBatch:
    """Place a stacked batch so the leading axis is split across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_dp_train_step(trainer, mesh: Mesh, axis: str = "dp"):
    """shard_map'd train step: per-device forward/backward on its local union,
    pmean of loss/grads/batch-stats, replicated optimizer update."""
    model = trainer.model
    tx = trainer.tx
    class_weights = trainer.class_weights

    def local_step(state: TrainState, batch: SpgBatch, rng):
        local = jax.tree.map(lambda x: x[0], batch)  # [1, ...] -> [...]
        dev_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mut = model.apply(
                variables, local, train=True, mutable=["batch_stats"],
                rngs={"dropout": dev_rng},
            )
            loss = weighted_ce_loss(logits, local.targets, class_weights)
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        new_bs = jax.lax.pmean(new_bs, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, loss, logits[None]

    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P(), P(axis)),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_dp_eval_step(trainer, mesh: Mesh, axis: str = "dp"):
    model = trainer.model
    class_weights = trainer.class_weights

    def local_step(state: TrainState, batch: SpgBatch):
        local = jax.tree.map(lambda x: x[0], batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = model.apply(variables, local, train=False)
        loss = jax.lax.pmean(
            weighted_ce_loss(logits, local.targets, class_weights), axis
        )
        return loss, logits[None]

    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )
    return jax.jit(mapped)

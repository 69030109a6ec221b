"""Trainer: loss decreases on a learnable synthetic task, checkpoint roundtrip,
metrics parity with a loop oracle."""
import jax
import numpy as np

from superpoint_graph_tpu.data.synthetic import random_spg_batch
from superpoint_graph_tpu.learn import metrics
from superpoint_graph_tpu.learn.checkpoint import (
    load_checkpoint,
    read_checkpoint_args,
    save_checkpoint,
)
from superpoint_graph_tpu.learn.train import Trainer, weighted_ce_loss
from superpoint_graph_tpu.models import SpgModel


def small_model():
    return SpgModel(
        n_classes=6,
        model_config="gru_2,f_6",
        ptn_widths=((16, 32), (32, 16)),
        ptn_widths_stn=((8, 16), (16, 8)),
        fnet_widths=(13, 16, 16),
    )


class TestTrainer:
    def test_loss_decreases(self, rng):
        batch = random_spg_batch(rng)
        model = small_model()
        trainer = Trainer(model, lr=3e-3, checkpoint_ptn=False)
        state = trainer.init(jax.random.PRNGKey(0), batch)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(30):
            key, sub = jax.random.split(key)
            state, loss, _ = trainer.train_step(state, batch, sub)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]

    def test_train_steps_matches_sequential(self, rng):
        """K steps per dispatch (lax.scan) must apply the same optimizer
        math as K sequential train_step calls with the same per-step rng
        derivation (split parent, fold per step)."""
        batch = random_spg_batch(rng)
        model = small_model()
        trainer = Trainer(model, lr=3e-3, checkpoint_ptn=False)
        state0 = trainer.init(jax.random.PRNGKey(0), batch)
        parent = jax.random.PRNGKey(7)

        k = 4
        state_scan, losses, logits = trainer.train_steps(
            state0, [batch] * k, parent
        )
        assert losses.shape == (k,)
        assert logits.shape[0] == k

        state_seq = state0
        r = parent
        seq_losses = []
        for _ in range(k):
            r, r_step = jax.random.split(r)
            state_seq, loss, _ = trainer.train_step(state_seq, batch, r_step)
            seq_losses.append(float(loss))
        np.testing.assert_allclose(
            np.asarray(losses), np.asarray(seq_losses), rtol=1e-5, atol=1e-6
        )
        flat_a = jax.tree_util.tree_leaves(state_scan.params)
        flat_b = jax.tree_util.tree_leaves(state_seq.params)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_train_steps_rejects_mixed_buckets(self, rng):
        import dataclasses

        import pytest

        batch = random_spg_batch(rng)
        other = dataclasses.replace(
            batch,
            src=np.concatenate([np.asarray(batch.src)] * 2),
            tgt=np.concatenate([np.asarray(batch.tgt)] * 2),
            edge_feats=np.concatenate([np.asarray(batch.edge_feats)] * 2),
            edge_mask=np.concatenate([np.asarray(batch.edge_mask)] * 2),
        )
        model = small_model()
        trainer = Trainer(model, checkpoint_ptn=False)
        state = trainer.init(jax.random.PRNGKey(0), batch)
        with pytest.raises(ValueError, match="padding bucket"):
            trainer.train_steps(state, [batch, other], jax.random.PRNGKey(1))

    def test_ignore_label_masking(self, rng):
        import jax.numpy as jnp

        logits = jnp.asarray(rng.randn(6, 4).astype(np.float32))
        targets = jnp.asarray(np.array([0, 1, -100, 2, -100, 3]))
        l_all = weighted_ce_loss(logits, targets)
        # changing logits of ignored rows must not change the loss
        logits2 = np.asarray(logits).copy()
        logits2[2] = 100.0
        l_changed = weighted_ce_loss(jnp.asarray(logits2), targets)
        np.testing.assert_allclose(float(l_all), float(l_changed), rtol=1e-6)

    def test_class_weights(self, rng):
        import jax.numpy as jnp

        logits = jnp.asarray(rng.randn(4, 3).astype(np.float32))
        targets = jnp.asarray(np.array([0, 1, 2, 0]))
        w = jnp.asarray(np.array([1.0, 2.0, 0.5], np.float32))
        got = float(weighted_ce_loss(logits, targets, w))
        logp = np.log(
            np.exp(np.asarray(logits))
            / np.exp(np.asarray(logits)).sum(1, keepdims=True)
        )
        t = np.asarray(targets)
        wi = np.asarray(w)[t]
        want = -(logp[np.arange(4), t] * wi).sum() / wi.sum()
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_checkpoint_roundtrip(self, rng, tmp_path):
        batch = random_spg_batch(rng)
        model = small_model()
        trainer = Trainer(model, checkpoint_ptn=False)
        state = trainer.init(jax.random.PRNGKey(0), batch)
        state, _, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
        path = str(tmp_path / "model.ckpt")
        args = {"model_config": "gru_2,f_6", "seed": 1}
        scaler = {"mean": np.zeros(13), "scale": np.ones(13)}
        save_checkpoint(path, state, epoch=3, args=args, scaler=scaler)

        template = trainer.init(jax.random.PRNGKey(42), batch)
        loaded, epoch, args2, scaler2 = load_checkpoint(path, template)
        assert epoch == 3 and args2 == args
        np.testing.assert_allclose(scaler2["scale"], scaler["scale"])
        l0, _ = trainer.eval_step(state, batch)
        l1, _ = trainer.eval_step(loaded, batch)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        assert read_checkpoint_args(path) == args

    def test_lr_schedule(self):
        from superpoint_graph_tpu.learn.train import make_lr_schedule

        sched = make_lr_schedule(0.01, [10, 20], 0.7)
        assert abs(float(sched(0)) - 0.01) < 1e-9
        assert abs(float(sched(10)) - 0.007) < 1e-9
        assert abs(float(sched(25)) - 0.0049) < 1e-9


class TestMetrics:
    def test_confusion_soft_batch(self, rng):
        cm = metrics.ConfusionMatrix(4)
        gt_vec = rng.rand(10, 4)
        pred = rng.randint(0, 4, 10)
        cm.count_predicted_batch(gt_vec, pred)
        want = np.zeros((4, 4))
        for i in range(10):
            want[:, pred[i]] += gt_vec[i]
        np.testing.assert_allclose(cm.confusion_matrix, want)

    def test_iou_oa(self):
        cm = metrics.ConfusionMatrix(3)
        cm.confusion_matrix = np.array(
            [[5.0, 1, 0], [2, 7, 1], [0, 0, 4]]
        )
        ious = cm.get_intersection_union_per_class()
        np.testing.assert_allclose(ious[0], 5 / (5 + 1 + 2))
        np.testing.assert_allclose(cm.get_overall_accuracy(), 16 / 20)

    def test_miou_seen_classes_only(self):
        cm = metrics.ConfusionMatrix(3)
        cm.confusion_matrix = np.array([[4.0, 0, 0], [0, 6, 0], [0, 0, 0]])
        np.testing.assert_allclose(cm.get_average_intersection_union(), 1.0)

    def test_boundary_metrics(self):
        is_tr = np.array([1, 1, 0, 0, 1], bool)
        pred = np.array([1, 0, 0, 1, 1], bool)
        br = metrics.compute_boundary_recall(is_tr, pred)
        bp = metrics.compute_boundary_precision(is_tr, pred)
        np.testing.assert_allclose(br, 100 * 2 / 3)
        np.testing.assert_allclose(bp, 100 * 2 / 3)

    def test_ooa_perfect_prediction(self, rng):
        # histogram convention: column 0 counts unlabeled points
        hard = rng.randint(0, 4, 50)
        labels = np.eye(5)[hard + 1]
        comps = [np.arange(0, 25), np.arange(25, 50)]
        pp = metrics.perfect_prediction(comps, labels)
        # per-component majority of the hard labels
        for comp in comps:
            maj = np.bincount(hard[comp]).argmax()
            assert (pp[comp] == maj).all()
        ooa = metrics.compute_OOA(comps, labels[:, 1:])
        acc = 100.0 * (pp == hard).mean()
        np.testing.assert_allclose(ooa, acc)

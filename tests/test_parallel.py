"""Multi-chip data parallelism on the 8-device virtual CPU mesh: the dp step
must run, reduce gradients, and match a single-device step on replicated data."""
import jax
import numpy as np

from superpoint_graph_tpu.data.synthetic import random_spg_batch
from superpoint_graph_tpu.learn.train import Trainer
from superpoint_graph_tpu.models import SpgModel
from superpoint_graph_tpu.parallel import (
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    shard_batch,
    stack_device_batches,
)


def small_model():
    return SpgModel(
        n_classes=6,
        model_config="gru_2,f_6",
        ptn_widths=((16, 32), (32, 16)),
        ptn_widths_stn=((8, 16), (16, 8)),
        fnet_widths=(13, 16, 16),
        ptn_prelast_do=0.0,
    )


class TestDataParallel:
    def test_dp_step_runs_8dev(self, rng):
        assert len(jax.devices()) >= 8
        mesh = make_mesh(8)
        model = small_model()
        trainer = Trainer(model, checkpoint_ptn=False)
        batches = [random_spg_batch(np.random.RandomState(i)) for i in range(8)]
        stacked = stack_device_batches(batches)
        sharded = shard_batch(stacked, mesh)
        state = trainer.init(jax.random.PRNGKey(0), batches[0])
        dp_step = make_dp_train_step(trainer, mesh)
        new_state, loss, logits = dp_step(state, sharded, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert logits.shape[0] == 8
        # params must have actually moved
        delta = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            state.params, new_state.params,
        )
        assert max(jax.tree.leaves(delta)) > 0

        ev = make_dp_eval_step(trainer, mesh)
        eloss, elogits = ev(new_state, sharded)
        assert np.isfinite(float(eloss))

    def test_dp_matches_single_device_on_replicated_data(self, rng):
        """Same batch on every device -> pmean(grads) == single-device grads,
        so one dp step must equal one local step."""
        mesh = make_mesh(8)
        model = small_model()
        trainer = Trainer(model, checkpoint_ptn=False)
        batch = random_spg_batch(np.random.RandomState(3))
        stacked = stack_device_batches([batch] * 8)
        sharded = shard_batch(stacked, mesh)
        state = trainer.init(jax.random.PRNGKey(0), batch)
        dp_step = make_dp_train_step(trainer, mesh)

        # dropout rngs differ per device; use a model without dropout (set above)
        s_dp, loss_dp, _ = dp_step(state, sharded, jax.random.PRNGKey(9))
        s_1, loss_1, _ = trainer.train_step(state, batch, jax.random.PRNGKey(9))
        np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-5)
        a = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(s_dp.params)])
        b = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(s_1.params)])
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


class TestShardedPartitionFeatures:
    def test_matches_single_device(self, rng):
        """kNN+geof sharded over the 8-dev mesh must match the single-device
        pipeline (documented: approx_min_k ties may swap boundary ranks)."""
        import numpy as np

        from superpoint_graph_tpu.data.synthetic import synthetic_room
        from superpoint_graph_tpu.parallel.mesh import make_mesh
        from superpoint_graph_tpu.parallel.partition_dp import (
            sharded_partition_features,
        )
        from superpoint_graph_tpu.pipeline import PartitionConfig, partition_features

        xyz, _, _, _ = synthetic_room(np.random.RandomState(2), n_points=3000)
        mesh = make_mesh(8)
        g_sh, geof_sh = sharded_partition_features(xyz, 5, 12, mesh)
        cfg = PartitionConfig(k_nn_adj=5, k_nn_geof=12)
        g_1, geof_1 = partition_features(xyz, cfg)
        # neighbor agreement high; geof close wherever neighborhoods agree
        same = (
            g_sh["target"].reshape(-1, 5) == g_1["target"].reshape(-1, 5)
        ).all(1)
        assert same.mean() > 0.95
        np.testing.assert_allclose(
            geof_sh[same], geof_1[same], rtol=5e-2, atol=5e-2
        )


class TestKnnVsDb:
    def test_matches_self_knn(self, rng):
        import jax.numpy as jnp
        import numpy as np

        from superpoint_graph_tpu.ops.knn import knn, knn_vs_db

        xyz = rng.rand(512, 3).astype(np.float32)
        i1, d1 = knn(jnp.asarray(xyz), 6, block_q=128, block_db=512)
        i2, d2 = knn_vs_db(
            jnp.asarray(xyz), jnp.asarray(xyz), 6, self_offset=0, block_q=128
        )
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-6)

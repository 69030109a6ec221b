"""Supervised-partition path: losses, weights, embedder training, evaluation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superpoint_graph_tpu.data.synthetic import N_CLASSES, synthetic_room
from superpoint_graph_tpu.ssp import graph_processing as gp
from superpoint_graph_tpu.ssp.embed import LocalEmbedder, SspModelConfig, SspTrainer
from superpoint_graph_tpu.ssp.evaluate import FinalEvaluator, aggregate_results
from superpoint_graph_tpu.ssp.losses import (
    SspLossConfig,
    compute_dist,
    compute_loss,
    compute_weight_loss,
    relax_edge_binary,
)


@pytest.fixture(scope="module")
def structure(tmp_path_factory):
    root = tmp_path_factory.mktemp("ssp")
    rng = np.random.RandomState(3)
    xyz, rgb, labels, objects = synthetic_room(rng, n_points=4000)
    cfg = gp.SspPreprocessConfig(voxel_width=0.08, dataset="s3dis",
                                 plane_model=False)
    s = gp.build_supervision_structure(
        xyz, rgb, labels + 1, objects + 1, cfg, N_CLASSES
    )
    path = str(root / "cloud.h5")
    gp.write_structure(path, s)
    return path, s


class TestPreprocess:
    def test_structure_roundtrip(self, structure):
        path, s = structure
        (xyz, rgb, es, et, is_tr, lg, labels, objects, elev, xyn) = (
            gp.read_structure(path)
        )
        assert xyz.shape == s["xyz"].shape
        np.testing.assert_array_equal(es, s["graph_nn"]["source"])
        assert lg.shape[1] == 20
        assert is_tr.dtype == np.uint8
        # transitions exist between objects
        assert 0 < is_tr.sum() < len(is_tr)

    def test_geof_scaled_verticality(self, structure):
        _, s = structure
        assert s["geof"].shape[1] == 4
        assert s["geof"][:, 3].max() <= 2.0 + 1e-5

    def test_vkitti_transitions_from_components(self, rng):
        xyz = rng.rand(300, 3).astype(np.float32)
        labels_h = np.eye(4, dtype=np.int32)[rng.randint(0, 4, 300)]
        graph_nn = {
            "source": np.repeat(np.arange(300), 3).astype(np.uint32),
            "target": rng.randint(0, 300, 900).astype(np.uint32),
        }
        is_tr, objects = gp.compute_transitions(
            "vkitti", None, labels_h, graph_nn, 300
        )
        # objects constant within non-transition components
        assert (objects[graph_nn["source"]][~is_tr]
                == objects[graph_nn["target"]][~is_tr]).all()


class TestLosses:
    def test_dist_types(self, rng):
        emb = jnp.asarray(rng.randn(20, 4).astype(np.float32))
        emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
        es = jnp.asarray(rng.randint(0, 20, 30))
        et = jnp.asarray(rng.randint(0, 20, 30))
        d_e = compute_dist(emb, es, et, "euclidian")
        d_i = compute_dist(emb, es, et, "intrinsic")
        d_s = compute_dist(emb, es, et, "scalar")
        assert np.all(np.asarray(d_e) >= 0)
        assert np.all(np.isfinite(np.asarray(d_i)))
        assert d_s.shape == (30,)

    def test_loss_pulls_and_pushes(self, rng):
        cfg = SspLossConfig(loss="TVH_zhang")
        diff = jnp.asarray(np.array([0.01, 2.0], np.float32))
        is_tr = jnp.asarray(np.array([0, 1], np.int32))
        w = jnp.ones(2)
        l1, l2 = compute_loss(cfg, diff, is_tr, w)
        # intra: small diff -> small loss; inter: large diff -> small push loss
        assert float(l1) < 0.1
        l1b, l2b = compute_loss(cfg, jnp.asarray([2.0, 0.01]), is_tr, w)
        assert float(l1b) > float(l1)
        assert float(l2b) > float(l2)

    def test_crosspartition_weights(self, rng):
        n = 60
        es = np.repeat(np.arange(n), 2)
        et = (es + rng.randint(1, 3, len(es))) % n
        emb = rng.randn(n, 4).astype(np.float32)
        objects = (np.arange(n) // 20).astype(np.int64)
        is_tr = (objects[es] != objects[et]).astype(np.int32)
        cfg = SspLossConfig(loss_weight="crosspartition", CP_cutoff=0,
                            spatial_emb=0)
        diff = np.asarray(
            compute_dist(jnp.asarray(emb), jnp.asarray(es), jnp.asarray(et),
                         "euclidian")
        )
        w, comps, in_comp = compute_weight_loss(
            cfg, emb, objects, es, et, is_tr, diff, True
        )
        assert w.shape == (len(es),)
        assert (w >= 1).all()
        assert (w[is_tr == 1] > 1).any()  # transition edges boosted

    def test_relax_edge_binary(self):
        es = np.array([0, 1, 2, 3])
        et = np.array([1, 2, 3, 4])
        mask = np.array([0, 1, 0, 0], bool)
        r1 = relax_edge_binary(mask, es, et, 5, 1)
        assert r1.sum() > mask.sum()


class TestEmbedTraining:
    def test_loss_decreases_and_partition_improves(self, structure):
        path, _ = structure
        lcfg = gp.SspLoaderConfig(max_ver_train=800, k_nn_local=20)
        rs = np.random.RandomState(0)
        sample = gp.graph_loader(path, train=True, cfg=lcfg, rs=rs)
        batch = gp.graph_collate([sample])

        mcfg = SspModelConfig(
            ptn_widths=((16, 32), (18, 16, 4)),
            ptn_widths_stn=((8, 16), (16, 8)),
        )
        losscfg = SspLossConfig(
            reg_strength=0.8, CP_cutoff=5, loss_weight="crosspartition",
            cp_backend="exact",
        )
        trainer = SspTrainer(mcfg, losscfg, lr=5e-3)
        state = trainer.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["clouds"]),
            jnp.asarray(batch["clouds_global"]),
        )
        losses = []
        for i in range(5):
            state, loss, comps, in_comp = trainer.train_step(state, batch)
            losses.append(loss)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 1.5  # moves, does not blow up

    def test_final_evaluator_and_aggregation(self, structure, tmp_path):
        path, _ = structure
        lcfg = gp.SspLoaderConfig(max_ver_train=0)
        sample = gp.graph_loader(path, train=False, cfg=lcfg)
        batch = gp.graph_collate([sample])
        mcfg = SspModelConfig(
            ptn_widths=((16, 32), (18, 16, 4)),
            ptn_widths_stn=((8, 16), (16, 8)),
        )
        losscfg = SspLossConfig(CP_cutoff=5, cp_backend="exact")
        trainer = SspTrainer(mcfg, losscfg)
        state = trainer.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["clouds"]),
            jnp.asarray(batch["clouds_global"]),
        )
        emb = np.asarray(trainer.embed(state, batch["clouds"], batch["clouds_global"]))
        diff = np.asarray(
            compute_dist(jnp.asarray(emb),
                         jnp.asarray(batch["edg_source"], jnp.int32),
                         jnp.asarray(batch["edg_target"], jnp.int32),
                         losscfg.dist_type)
        )
        # labels histogram for ASA (CM over the N real classes; column 0 of the
        # histogram is the unlabeled count, stripped by labels[:, 1:])
        ev = FinalEvaluator(N_CLASSES)
        spg_path = str(tmp_path / "spg" / "cloud.h5")
        res = ev.add_cloud(losscfg, emb, diff, batch, spg_out_path=spg_path)
        assert res["n_clusters"] >= 1
        res_path = str(tmp_path / "res.h5")
        ev.write_res(res_path)
        agg = aggregate_results([res_path])
        assert 0 <= agg["ASA"] <= 100
        assert agg["n_sp"] >= 1
        import os
        assert os.path.exists(spg_path)


class TestEmbedVariants:
    def test_chunked_matches_unchunked(self, rng):
        mcfg = SspModelConfig(
            ptn_widths=((16, 32), (18, 16, 4)),
            ptn_widths_stn=((8, 16), (16, 8)),
        )
        trainer = SspTrainer(mcfg, SspLossConfig())
        clouds = rng.randn(300, 20, 6).astype(np.float32)
        glob = rng.rand(300, mcfg.nfeat_global - 4).astype(np.float32)
        state = trainer.init(jax.random.PRNGKey(0), jnp.asarray(clouds),
                             jnp.asarray(glob))
        full = np.asarray(trainer.embed(state, clouds, glob))
        chunked = trainer.embed_chunked(state, clouds, glob, chunk=128)
        np.testing.assert_allclose(full, chunked, rtol=2e-4, atol=2e-5)

    def test_layer_norm_model(self, rng):
        mcfg = SspModelConfig(
            ptn_widths=((16, 32), (18, 16, 4)),
            ptn_widths_stn=((8, 16), (16, 8)),
            ptn_norm="layer",
        )
        trainer = SspTrainer(mcfg, SspLossConfig())
        clouds = rng.randn(50, 20, 6).astype(np.float32)
        glob = rng.rand(50, mcfg.nfeat_global - 4).astype(np.float32)
        state = trainer.init(jax.random.PRNGKey(0), jnp.asarray(clouds),
                             jnp.asarray(glob))
        emb = np.asarray(trainer.embed(state, clouds, glob))
        assert np.all(np.isfinite(emb))
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)

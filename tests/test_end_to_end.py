"""End-to-end slice: synthetic room -> partition -> h5 caches -> SPG loader ->
padded batch -> SpgModel train/eval. The integration coverage the reference
lacks (SURVEY.md §4)."""
import jax
import numpy as np
import pytest

from superpoint_graph_tpu.data import parsed as parsed_mod
from superpoint_graph_tpu.data.loader import (
    LoaderConfig,
    collate_spg,
    load_spg_sample,
    pc_attrib_dims,
)
from superpoint_graph_tpu.data.spg_io import scaler01, spg_reader
from superpoint_graph_tpu.data.synthetic import N_CLASSES, synthetic_room
from superpoint_graph_tpu.learn.train import Trainer
from superpoint_graph_tpu.models import SpgModel
from superpoint_graph_tpu.pipeline import PartitionConfig, partition_cloud
from superpoint_graph_tpu.utils import h5io

EDGE_ATTRIBS = "delta_avg,delta_std,nlength/ld,surface/ld,volume/ld,size/ld,xyz/d"


@pytest.fixture(scope="module")
def room_caches(tmp_path_factory):
    """Partition two synthetic rooms and write features/spg/parsed caches."""
    root = tmp_path_factory.mktemp("dataset")
    rng = np.random.RandomState(7)
    cfg = PartitionConfig(
        voxel_width=0.06,
        reg_strength=0.05,
        k_nn_geof=20,
        k_nn_adj=5,
        cp_backend="tpu",
        spg_adjacency="delaunay",
    )
    names = []
    for i in range(2):
        xyz, rgb, labels, objects = synthetic_room(rng, n_points=6000)
        # labels in h5 contract are 0=unlabeled, 1..C → shift
        res = partition_cloud(
            xyz, rgb, labels + 1, None, n_labels=N_CLASSES, cfg=cfg
        )
        name = f"room_{i}"
        (root / "superpoint_graphs").mkdir(exist_ok=True)
        (root / "features").mkdir(exist_ok=True)
        (root / "parsed").mkdir(exist_ok=True)
        h5io.write_features(
            str(root / "features" / f"{name}.h5"),
            res.geof, res.xyz, res.rgb, res.graph_nn, res.labels,
        )
        h5io.write_spg(
            str(root / "superpoint_graphs" / f"{name}.h5"),
            res.graph_sp, res.components, res.in_component,
        )
        P = parsed_mod.build_point_matrix(res.xyz, res.rgb, res.geof, "s3dis")
        parsed_mod.write_parsed(
            str(root / "parsed" / f"{name}.h5"), P, res.components
        )
        names.append(name)
    return root, names


class TestEndToEnd:
    def test_partition_sanity(self, room_caches):
        root, names = room_caches
        g, comps, in_comp = h5io.read_spg(str(root / "superpoint_graphs" / f"{names[0]}.h5"))
        n_com = len(comps)
        assert 4 <= n_com <= 2000
        assert g["source"].size > 0  # superedges exist
        # partition should be vastly smaller than the cloud
        assert n_com < len(in_comp) / 2

    def test_reader_and_loader(self, room_caches):
        root, names = room_caches
        entries = [
            spg_reader(str(root / "superpoint_graphs" / f"{n}.h5"), EDGE_ATTRIBS)
            for n in names
        ]
        assert entries[0][3].shape[1] == 13  # edge feature dim of default DSL
        train, test, _, scaler = scaler01(entries, entries[1:])
        # scaled train features ~ zero mean unit var
        allf = np.concatenate([t[3] for t in train])
        np.testing.assert_allclose(allf.mean(0), 0, atol=1e-4)

        cfg = LoaderConfig(ptn_minpts=5, spg_augm_nneigh=30, spg_augm_hardcutoff=100)
        rs = np.random.RandomState(0)
        sample = load_spg_sample(
            train[0], str(root / "parsed" / f"{names[0]}.h5"), cfg, train=True, rs=rs
        )
        assert sample is not None
        n_ch = pc_attrib_dims(cfg.pc_attribs)
        assert sample["clouds"].shape[1:] == (cfg.ptn_npts, n_ch)
        assert (sample["cloud_flag"] == 0).sum() > 0

        batch = collate_spg([sample], cfg, N_CLASSES, n_ch)
        assert batch.clouds.shape[0] % cfg.n_sp_bucket == 0
        assert bool(batch.edge_mask.sum()) and bool(batch.node_mask.sum())

    def test_train_eval_loop(self, room_caches):
        root, names = room_caches
        entries = [
            spg_reader(str(root / "superpoint_graphs" / f"{n}.h5"), EDGE_ATTRIBS)
            for n in names
        ]
        train_l, test_l, _, scaler = scaler01(entries, entries[1:])
        cfg = LoaderConfig(
            ptn_minpts=5, spg_augm_nneigh=30, spg_augm_hardcutoff=100,
            n_sp_bucket=256, n_edge_bucket=2048,
        )
        n_ch = pc_attrib_dims(cfg.pc_attribs)
        model = SpgModel(
            n_classes=N_CLASSES,
            model_config="gru_3,f_6",
            ptn_widths=((16, 32), (32, 16)),
            ptn_widths_stn=((8, 16), (16, 8)),
            fnet_widths=(13, 16, 16),
            ptn_nfeat=n_ch,
        )
        trainer = Trainer(model, lr=1e-2, checkpoint_ptn=False)
        rs = np.random.RandomState(0)
        samples = [
            load_spg_sample(e, str(root / "parsed" / f"{nm}.h5"), cfg, True, rs=rs)
            for e, nm in zip(train_l, names)
        ]
        batch = collate_spg([s for s in samples if s], cfg, N_CLASSES, n_ch)
        state = trainer.init(jax.random.PRNGKey(0), batch)
        key = jax.random.PRNGKey(1)
        first = None
        for i in range(12):
            key, sub = jax.random.split(key)
            state, loss, logits = trainer.train_step(state, batch, sub)
            if first is None:
                first = float(loss)
        assert float(loss) < first

        # eval pass on the full (un-subsampled) graph
        s_eval = load_spg_sample(
            test_l[0], str(root / "parsed" / f"{names[1]}.h5"), cfg, False
        )
        ebatch = collate_spg([s_eval], cfg, N_CLASSES, n_ch)
        eloss, elogits = trainer.eval_step(state, ebatch)
        assert np.isfinite(float(eloss))
        pred = np.asarray(elogits).argmax(1)
        assert pred.shape[0] == ebatch.clouds.shape[0]


class TestPartitionClouds:
    def test_pipelined_matches_serial(self, rng):
        """partition_clouds (2-stage pipeline) must produce the same
        partitions as per-cloud partition_cloud calls."""
        from superpoint_graph_tpu.data.synthetic import synthetic_room
        from superpoint_graph_tpu.pipeline import (
            PartitionConfig,
            partition_cloud,
            partition_clouds,
        )

        cfg = PartitionConfig(
            voxel_width=0.07, reg_strength=0.05, k_nn_geof=15, k_nn_adj=5,
            cp_backend="tpu", spg_adjacency="knn",
        )
        clouds = []
        for i in range(2):
            xyz, rgb, _, _ = synthetic_room(np.random.RandomState(40 + i), n_points=4000)
            clouds.append((xyz, rgb, None, None))
        rs = partition_clouds(clouds, cfg)
        assert len(rs) == 2
        for c, r in zip(clouds, rs):
            r1 = partition_cloud(*c, n_labels=0, cfg=cfg)
            np.testing.assert_array_equal(r.in_component, r1.in_component)
            assert len(r.components) == len(r1.components)

"""Extra CLI coverage: vKITTI partition path, Semantic3D submission export."""
import os

import numpy as np
import pytest


class TestVkittiPartitionCli:
    def test_partition_and_preprocess(self, tmp_path, rng):
        from superpoint_graph_tpu.cli import partition as cli_partition
        from superpoint_graph_tpu.data.parsed import preprocess_pointclouds
        from superpoint_graph_tpu.data.synthetic import synthetic_room

        root = str(tmp_path)
        for fold in ("01", "02"):
            os.makedirs(f"{root}/data/{fold}", exist_ok=True)
            xyz, rgb, labels, _ = synthetic_room(rng, n_points=2000)
            # vkitti rows: [xyz rgb label] with stored label = raw (0..12)
            rows = np.hstack([
                xyz, rgb.astype(np.float64),
                labels[:, None].astype(np.float64),
            ])
            np.save(f"{root}/data/{fold}/0001_00000.npy", rows)
        cli_partition.main([
            "--ROOT_PATH", root, "--dataset", "vkitti",
            "--voxel_width", "0.08", "--reg_strength", "0.05",
            "--k_nn_geof", "15", "--k_nn_adj", "5",
            "--spg_adjacency", "knn", "--cp_backend", "tpu",
        ])
        assert os.path.isfile(f"{root}/superpoint_graphs/01/0001_00000.h5")
        preprocess_pointclouds(root, "vkitti", 13)
        assert os.path.isfile(f"{root}/parsed/class_count.h5")
        assert os.path.isfile(f"{root}/parsed/01/0001_00000.h5")


class TestSemantic3dExport:
    def test_labels_submission(self, tmp_path, rng):
        import h5py

        from superpoint_graph_tpu.cli import partition as cli_partition
        from superpoint_graph_tpu.cli import write_semantic3d
        from superpoint_graph_tpu.data.synthetic import synthetic_room

        root = str(tmp_path / "sema3d")
        os.makedirs(f"{root}/data/test_reduced", exist_ok=True)
        xyz, rgb, _, _ = synthetic_room(rng, n_points=3000)
        intensity = rng.randint(0, 255, (3000, 1))
        rows = np.hstack([xyz, intensity, rgb.astype(np.float64)])
        np.savetxt(f"{root}/data/test_reduced/stationA.txt", rows,
                   fmt="%.4f %.4f %.4f %d %d %d %d")
        cli_partition.main([
            "--ROOT_PATH", root, "--dataset", "sema3d",
            "--voxel_width", "0.1", "--reg_strength", "0.1",
            "--k_nn_geof", "15", "--k_nn_adj", "5",
            "--spg_adjacency", "knn", "--cp_backend", "tpu",
            "--ver_batch", "1200",
        ])
        spg_path = f"{root}/superpoint_graphs/test_reduced/stationA.h5"
        assert os.path.isfile(spg_path)

        # fabricate superpoint predictions for the exporter
        from superpoint_graph_tpu.utils.h5io import read_spg

        _, comps, _ = read_spg(spg_path)
        odir = str(tmp_path / "results")
        os.makedirs(odir, exist_ok=True)
        with h5py.File(f"{odir}/predictions_testred.h5", "w") as f:
            f.create_dataset(
                "test_reduced__stationA",
                data=rng.randint(0, 8, len(comps)).astype(np.int32),
            )
        write_semantic3d.main([
            "--SEMA3D_PATH", root, "--odir", odir,
            "--db_test_name", "testred", "--ver_batch", "1500",
        ])
        out = f"{odir}/submission/stationA.labels"
        assert os.path.isfile(out)
        labels = np.loadtxt(out, dtype=np.int64)
        assert len(labels) == 3000  # one label per RAW point
        assert labels.min() >= 1 and labels.max() <= 8

"""SSP CLI workflow on a synthetic S3DIS tree:
ssp_preprocess -> ssp_train -> ssp_generate -> ssp_evaluate."""
import json
import os

import numpy as np
import pytest

from tests.test_cli import write_s3dis_room


@pytest.fixture(scope="module")
def ssp_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ssp_s3dis"))
    rng = np.random.RandomState(21)
    for area in ("Area_1", "Area_2"):
        write_s3dis_room(root, area, "room_0", rng, n_points=2200)
    return root


class TestSspCli:
    def test_preprocess(self, ssp_tree):
        from superpoint_graph_tpu.cli import ssp_preprocess

        ssp_preprocess.main([
            "--ROOT_PATH", ssp_tree, "--dataset", "s3dis",
            "--voxel_width", "0.08", "--k_nn_adj", "5", "--k_nn_local", "10",
            "--plane_model", "0",
        ])
        for area in ("Area_1", "Area_2"):
            assert os.path.isfile(
                os.path.join(ssp_tree, "features_supervision", area, "room_0.h5")
            )

    def test_train_and_res(self, ssp_tree):
        from superpoint_graph_tpu.cli import ssp_train

        odir = os.path.join(ssp_tree, "results_partition")
        ssp_train.main([
            "--ROOT_PATH", ssp_tree, "--dataset", "s3dis", "--cvfold", "2",
            "--odir", odir, "--epochs", "2", "--batch_size", "1",
            "--ptn_widths", "[[16,32],[18,16,4]]",
            "--ptn_widths_stn", "[[8,16],[16,8]]",
            "--k_nn_local", "10", "--max_ver_train", "600",
            "--CP_cutoff", "5", "--reg_strength", "0.8",
        ])
        assert os.path.isfile(os.path.join(odir, "cv2", "res.h5"))
        assert os.path.isfile(os.path.join(odir, "cv2", "model.ckpt"))
        log = json.load(open(os.path.join(odir, "cv2", "trainlog.json")))
        assert len(log) == 2 and np.isfinite(log[-1]["loss"])
        # spg written into dataset root for the downstream stage
        assert os.path.isfile(
            os.path.join(ssp_tree, "superpoint_graphs", "Area_2", "room_0.h5")
        )

    def test_generate(self, ssp_tree):
        from superpoint_graph_tpu.cli import ssp_generate

        ssp_generate.main([
            "--ROOT_PATH", ssp_tree, "--dataset", "s3dis",
            "--model_path",
            os.path.join(ssp_tree, "results_partition", "cv2", "model.ckpt"),
            "--folder", "Area_1", "--overwrite", "1",
        ])
        path = os.path.join(ssp_tree, "superpoint_graphs", "Area_1", "room_0.h5")
        assert os.path.isfile(path)
        from superpoint_graph_tpu.utils.h5io import read_spg

        g, comps, in_comp = read_spg(path)
        assert len(comps) >= 1

    def test_evaluate(self, ssp_tree, capsys):
        from superpoint_graph_tpu.cli import ssp_evaluate

        ssp_evaluate.main([
            "--odir", os.path.join(ssp_tree, "results_partition"),
            "--cvfold", "2",
        ])
        out = capsys.readouterr().out
        assert "ASA" in out
        assert os.path.isfile(
            os.path.join(ssp_tree, "results_partition", "results.txt")
        )

    def test_geof_passthrough_mode(self, ssp_tree):
        """spatialEmbedder parity: handcrafted geof features as embeddings."""
        from superpoint_graph_tpu.cli import ssp_train

        odir = os.path.join(ssp_tree, "results_partition_geof")
        ssp_train.main([
            "--ROOT_PATH", ssp_tree, "--dataset", "s3dis", "--cvfold", "2",
            "--odir", odir, "--ver_value", "geof",
            "--CP_cutoff", "5", "--reg_strength", "0.1", "--spatial_emb", "0",
        ])
        assert os.path.isfile(os.path.join(odir, "cv2", "res.h5"))

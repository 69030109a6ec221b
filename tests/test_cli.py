"""Full CLI workflow on a synthetic S3DIS-layout dataset tree:
partition CLI -> parsed preprocessing -> training CLI -> visualize CLI."""
import json
import os

import numpy as np
import pytest

from superpoint_graph_tpu.data.synthetic import synthetic_room


def write_s3dis_room(root, area, room, rng, n_points=2500):
    """Emit the raw S3DIS file layout: room txt + Annotations/*.txt."""
    xyz, rgb, labels, objects = synthetic_room(rng, n_points=n_points)
    room_dir = os.path.join(root, "data", area, room)
    ann = os.path.join(room_dir, "Annotations")
    os.makedirs(ann, exist_ok=True)
    rows = np.hstack([xyz, rgb.astype(np.float64)])
    np.savetxt(os.path.join(room_dir, room + ".txt"), rows, fmt="%.4f")
    class_names = {0: "floor", 1: "ceiling", 2: "wall", 3: "table", 4: "clutter", 5: "beam"}
    for obj in np.unique(objects):
        m = objects == obj
        cname = class_names[int(labels[m][0])]
        np.savetxt(
            os.path.join(ann, f"{cname}_{obj + 1}.txt"),
            np.hstack([xyz[m], rgb[m].astype(np.float64)]), fmt="%.4f",
        )


@pytest.fixture(scope="module")
def dataset_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("s3dis"))
    rng = np.random.RandomState(11)
    for area in ("Area_1", "Area_2"):
        write_s3dis_room(root, area, "room_0", rng)
    return root


class TestCliWorkflow:
    def test_partition_cli(self, dataset_tree):
        from superpoint_graph_tpu.cli import partition as cli_partition

        cli_partition.main([
            "--ROOT_PATH", dataset_tree, "--dataset", "s3dis",
            "--voxel_width", "0.07", "--reg_strength", "0.05",
            "--k_nn_geof", "20", "--k_nn_adj", "5",
            "--spg_adjacency", "knn", "--cp_backend", "tpu",
        ])
        for area in ("Area_1", "Area_2"):
            assert os.path.isfile(
                os.path.join(dataset_tree, "features", area, "room_0.h5")
            )
            assert os.path.isfile(
                os.path.join(dataset_tree, "superpoint_graphs", area, "room_0.h5")
            )
        # idempotency: second run skips
        cli_partition.main([
            "--ROOT_PATH", dataset_tree, "--dataset", "s3dis",
        ])

    def test_preprocess_and_train_cli(self, dataset_tree):
        from superpoint_graph_tpu.cli import train as cli_train
        from superpoint_graph_tpu.data.parsed import preprocess_pointclouds

        preprocess_pointclouds(dataset_tree, "s3dis", 13)
        assert os.path.isfile(
            os.path.join(dataset_tree, "parsed", "class_count.h5")
        )
        odir = os.path.join(dataset_tree, "results")
        cli_train.main([
            "--dataset", "s3dis", "--S3DIS_PATH", dataset_tree,
            "--cvfold", "2", "--odir", odir, "--epochs", "2",
            "--model_config", "gru_2,f_13",
            "--ptn_widths", "[[16,32],[32,16]]",
            "--ptn_widths_stn", "[[8,16],[16,8]]",
            "--fnet_widths", "[16,16]",
            "--ptn_minpts", "6", "--ptn_npts", "32",
            "--spg_augm_nneigh", "20", "--spg_augm_hardcutoff", "64",
            "--test_multisamp_n", "2", "--loss_weights", "proportional",
        ])
        assert os.path.isfile(os.path.join(odir, "model.ckpt"))
        assert os.path.isfile(os.path.join(odir, "trainlog.json"))
        scores = json.load(open(os.path.join(odir, "scores_test.json")))
        assert 0.0 <= scores["oacc"] <= 1.0
        assert os.path.isfile(os.path.join(odir, "pointwise_cm.npy"))
        assert os.path.isfile(os.path.join(odir, "predictions_test.h5"))

    def test_resume(self, dataset_tree):
        from superpoint_graph_tpu.cli import train as cli_train

        # Architecture flags below CONFLICT with the checkpoint on purpose:
        # resume must rebuild the model from the checkpoint's own saved args
        # (reference main.py:398 "architecture can't change"), so the run
        # only succeeds if these are ignored in favor of the saved ones.
        odir = os.path.join(dataset_tree, "results")
        cli_train.main([
            "--dataset", "s3dis", "--S3DIS_PATH", dataset_tree,
            "--cvfold", "2", "--odir", odir, "--epochs", "3",
            "--resume", "RESUME",
            "--model_config", "gru_4,f_13",
            "--ptn_widths", "[[8,24],[24,16]]",
            "--ptn_widths_stn", "[[8,16],[16,8]]",
            "--fnet_widths", "[24,16]",
            "--ptn_minpts", "6", "--ptn_npts", "32",
            "--spg_augm_nneigh", "20", "--spg_augm_hardcutoff", "64",
            "--test_multisamp_n", "1", "--loss_weights", "proportional",
        ])
        log = json.load(open(os.path.join(odir, "trainlog.json")))
        assert log[-1]["epoch"] == 2  # resumed from epoch 2 and ran one more

    def test_visualize_cli(self, dataset_tree):
        from superpoint_graph_tpu.cli import visualize as cli_vis

        cli_vis.main([
            "--dataset", "s3dis", "--ROOT_PATH", dataset_tree,
            "--file_path", "Area_2/room_0",
            "--res_file", os.path.join(dataset_tree, "results", "predictions_test"),
            "--output_type", "igfprs",
        ])
        clouds = os.path.join(dataset_tree, "clouds", "Area_2")
        made = os.listdir(clouds)
        for suffix in ("_rgb.ply", "_GT.ply", "_geof.ply", "_partition.ply",
                       "_pred.ply", "_spg.ply"):
            assert f"room_0{suffix}" in made

    def test_evaluate_cli(self, dataset_tree, capsys):
        from superpoint_graph_tpu.cli import evaluate as cli_eval

        # fold layout: copy results into cv2
        import shutil

        odir = os.path.join(dataset_tree, "results")
        cv2 = os.path.join(dataset_tree, "agg", "cv2")
        os.makedirs(cv2, exist_ok=True)
        shutil.copy(os.path.join(odir, "pointwise_cm.npy"), cv2)
        cli_eval.main([
            "--odir", os.path.join(dataset_tree, "agg"),
            "--dataset", "s3dis", "--cvfold", "2",
        ])
        out = capsys.readouterr().out
        assert "overall" in out and "mIoU" in out

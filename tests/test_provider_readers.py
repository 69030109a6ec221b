"""Dataset reader tests: S3DIS txt, vKITTI npy, Semantic3D chunked."""
import numpy as np
import pytest

from superpoint_graph_tpu.data import provider


class TestS3disReader:
    def test_roundtrip(self, rng, tmp_path):
        from tests.test_cli import write_s3dis_room

        root = str(tmp_path)
        write_s3dis_room(root, "Area_1", "room_0", rng, n_points=500)
        path = f"{root}/data/Area_1/room_0/room_0.txt"
        xyz, rgb, labels, objects = provider.read_s3dis_format(path)
        assert xyz.shape == (500, 3) and rgb.dtype == np.uint8
        assert labels.max() <= 13 and (objects > 0).any()

    def test_no_labels(self, rng, tmp_path):
        from tests.test_cli import write_s3dis_room

        root = str(tmp_path)
        write_s3dis_room(root, "Area_1", "room_0", rng, n_points=300)
        xyz, rgb = provider.read_s3dis_format(
            f"{root}/data/Area_1/room_0/room_0.txt", label_out=False
        )
        assert xyz.shape == (300, 3)


class TestVkittiReader:
    def test_label_remap(self, tmp_path, rng):
        n = 200
        data = np.zeros((n, 7), np.float32)
        data[:, :3] = rng.rand(n, 3)
        data[:, 3:6] = rng.rand(n, 3)
        data[:, 6] = rng.randint(0, 14, n)  # raw labels 0..13
        path = str(tmp_path / "scene.npy")
        np.save(path, data)
        xyz, rgb, labels = provider.read_vkitti_format(path)
        # stored label 13 -> 14 -> remapped to 0 ('don't care')
        assert 14 not in labels
        assert labels.min() >= 0


class TestSema3dReader:
    def _write(self, tmp_path, rng, n=4000, labeled=True):
        xyz = (rng.rand(n, 3) * 5).astype(np.float32)
        intensity = rng.randint(0, 255, (n, 1))
        rgb = rng.randint(0, 255, (n, 3))
        rows = np.hstack([xyz, intensity, rgb])
        data = str(tmp_path / "station.txt")
        np.savetxt(data, rows, fmt="%.4f %.4f %.4f %d %d %d %d")
        lab = str(tmp_path / "station.labels")
        if labeled:
            np.savetxt(lab, rng.randint(0, 9, n), fmt="%d")
        return data, lab

    def test_chunked_labeled(self, tmp_path, rng):
        data, lab = self._write(tmp_path, rng)
        xyz, rgb, labels = provider.read_semantic3d_format(
            data, 8, lab, voxel_width=0.5, ver_batch=1500
        )
        assert len(xyz) < 4000  # pruned
        assert labels.shape[1] == 9  # histogram with unlabeled column
        assert labels.sum() == 4000  # every point counted
        assert rgb.dtype == np.uint8

    def test_chunked_unlabeled(self, tmp_path, rng):
        data, _ = self._write(tmp_path, rng, labeled=False)
        xyz, rgb = provider.read_semantic3d_format(
            data, 0, "", voxel_width=0.5, ver_batch=1500
        )
        assert len(xyz) < 4000 and len(xyz) == len(rgb)

    def test_unchunked(self, tmp_path, rng):
        data, lab = self._write(tmp_path, rng, n=1000)
        xyz, rgb, labels = provider.read_semantic3d_format(
            data, 8, lab, voxel_width=0.5, ver_batch=0
        )
        assert len(xyz) == len(labels)

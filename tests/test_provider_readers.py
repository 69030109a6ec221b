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


class TestPcdReader:
    def test_ascii_roundtrip(self, tmp_path, rng):
        n = 150
        xyz = rng.rand(n, 3).astype(np.float32)
        labels = rng.randint(0, 9, n)
        path = str(tmp_path / "cloud.pcd")
        provider.write_pcd(path, xyz, labels)
        xyz2, labels2 = provider.read_pcd(path)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-5)
        np.testing.assert_array_equal(labels2, labels)

    def test_ascii_no_label(self, tmp_path, rng):
        xyz = rng.rand(40, 3).astype(np.float32)
        path = str(tmp_path / "cloud.pcd")
        provider.write_pcd(path, xyz)
        xyz2, labels2 = provider.read_pcd(path)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-5)
        assert labels2.size == 0

    def test_binary(self, tmp_path, rng):
        # hand-rolled binary PCD with an extra intensity field to exercise
        # field skipping
        n = 64
        rec = np.zeros(
            n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                      ("intensity", "<f4"), ("label", "<u4")]
        )
        for k in "xyz":
            rec[k] = rng.rand(n).astype(np.float32)
        rec["label"] = rng.randint(0, 5, n)
        path = str(tmp_path / "cloud_bin.pcd")
        with open(path, "wb") as f:
            f.write(
                b"VERSION 0.7\nFIELDS x y z intensity label\n"
                b"SIZE 4 4 4 4 4\nTYPE F F F F U\nCOUNT 1 1 1 1 1\n"
                + f"WIDTH {n}\nHEIGHT 1\nPOINTS {n}\nDATA binary\n".encode()
            )
            f.write(rec.tobytes())
        xyz, labels = provider.read_pcd(path)
        np.testing.assert_allclose(xyz[:, 0], rec["x"])
        np.testing.assert_array_equal(labels, rec["label"])


class TestSpgPly:
    def test_edge_segments(self, tmp_path, rng):
        from superpoint_graph_tpu.utils.plyio import read_ply_elements

        cent = rng.rand(10, 3).astype(np.float32)
        src = rng.randint(0, 10, 25)
        tgt = rng.randint(0, 10, 25)
        path = str(tmp_path / "spg.ply")
        provider.spg2ply(
            path,
            {"sp_centroids": cent, "source": src, "target": tgt},
        )
        elems = read_ply_elements(path)
        assert set(elems) == {"vertex", "edge"}
        np.testing.assert_allclose(elems["vertex"]["x"], cent[:, 0], atol=1e-5)
        np.testing.assert_array_equal(elems["edge"]["vertex1"], src)
        np.testing.assert_array_equal(elems["edge"]["vertex2"], tgt)


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


class TestLasReader:
    """Self-contained .las binary reader (reference provider.py:420-437 uses
    laspy; the rebuild parses the public layout directly)."""

    def _write_las(self, path, xyz, version=(1, 2), point_format=1,
                   rec_len=28):
        import struct

        scale = np.array([0.001, 0.001, 0.001])
        offset = np.array([100.0, -50.0, 3.0])
        n = len(xyz)
        header_size = 227
        head = bytearray(header_size)
        head[0:4] = b"LASF"
        head[24] = version[0]
        head[25] = version[1]
        struct.pack_into("<H", head, 94, header_size)
        struct.pack_into("<I", head, 96, header_size)
        head[104] = point_format
        struct.pack_into("<H", head, 105, rec_len)
        struct.pack_into("<I", head, 107, n)
        struct.pack_into("<3d", head, 131, *scale)
        struct.pack_into("<3d", head, 155, *offset)
        ints = np.round((xyz - offset) / scale).astype(np.int32)
        rec = np.zeros((n, rec_len), np.uint8)
        rec[:, :12] = ints.astype("<i4").view(np.uint8).reshape(n, 12)
        with open(path, "wb") as f:
            f.write(bytes(head))
            f.write(rec.tobytes())
        return ints * scale + offset

    def test_roundtrip(self, tmp_path):
        from superpoint_graph_tpu.data.provider import read_las

        rs = np.random.RandomState(0)
        xyz = rs.rand(257, 3) * 80 + [80.0, -90.0, 0.0]
        p = str(tmp_path / "cloud.las")
        exact = self._write_las(p, xyz)
        got = read_las(p)
        assert got.shape == (257, 3)
        np.testing.assert_allclose(got, exact.astype(np.float32), atol=1e-4)

    def test_formats_and_14(self, tmp_path):
        from superpoint_graph_tpu.data.provider import read_las

        rs = np.random.RandomState(1)
        xyz = rs.rand(31, 3) * 5
        # format 3 (with RGB fields) and a longer record
        p = str(tmp_path / "f3.las")
        exact = self._write_las(p, xyz, point_format=3, rec_len=34)
        np.testing.assert_allclose(
            read_las(p), exact.astype(np.float32), atol=1e-4
        )

    def test_bad_signature(self, tmp_path):
        import pytest

        from superpoint_graph_tpu.data.provider import read_las

        p = str(tmp_path / "bad.las")
        with open(p, "wb") as f:
            f.write(b"NOPE" + b"\x00" * 300)
        with pytest.raises(ValueError):
            read_las(p)

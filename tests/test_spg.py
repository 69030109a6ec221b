"""SPG builder vs a direct loop oracle mirroring reference graphs.py:75-210."""
import numpy as np
import numpy.linalg as LA
from scipy.spatial import Delaunay

from superpoint_graph_tpu.graph.spg import compute_sp_graph
from superpoint_graph_tpu.utils import h5io


def oracle_sp_graph(xyz, d_max, in_component, components, labels, n_labels):
    """Straight transcription of the reference algorithm as loops (test-only)."""
    n_com = max(in_component) + 1
    in_component = np.array(in_component)
    tri = Delaunay(xyz)
    cols = []
    for a in range(4):
        for b in range(a + 1, 4):
            u, v = tri.simplices[:, a], tri.simplices[:, b]
            m = in_component[u] != in_component[v]
            cols.append(np.stack([u[m], v[m]]))
            cols.append(np.stack([v[m], u[m]]))
    edges = np.unique(np.concatenate(cols, 1), axis=1)
    if d_max > 0:
        dist = np.sqrt(((xyz[edges[0]] - xyz[edges[1]]) ** 2).sum(1))
        edges = edges[:, dist < d_max]
    ec = in_component[edges]
    keyi = n_com * ec[0] + ec[1]
    order = np.argsort(keyi)
    edges, ec, keyi = edges[:, order], ec[:, order], keyi[order]
    jump = np.concatenate([[0], np.flatnonzero(np.diff(keyi)) + 1, [edges.shape[1]]])
    n_sedg = len(jump) - 1

    g = {}
    g["sp_centroids"] = np.zeros((n_com, 3), "f4")
    g["sp_length"] = np.zeros((n_com, 1), "f4")
    g["sp_surface"] = np.zeros((n_com, 1), "f4")
    g["sp_volume"] = np.zeros((n_com, 1), "f4")
    g["sp_point_count"] = np.zeros((n_com, 1), "u8")
    for c in range(n_com):
        comp = components[c]
        g["sp_point_count"][c] = len(comp)
        xs = np.unique(xyz[comp], axis=0)
        if len(xs) == 1:
            g["sp_centroids"][c] = xs
        elif len(xs) == 2:
            g["sp_centroids"][c] = xs.mean(0)
            g["sp_length"][c] = np.sqrt(np.sum(np.var(xs, axis=0)))
        else:
            ev = -np.sort(-LA.eig(np.cov(xs.T))[0].real)
            g["sp_centroids"][c] = xs.mean(0)
            g["sp_length"][c] = ev[0]
            g["sp_surface"][c] = np.sqrt(ev[0] * ev[1] + 1e-10)
            g["sp_volume"][c] = np.sqrt(max(ev[0] * ev[1] * ev[2], 0) + 1e-10)
    for k in ("source", "target"):
        g[k] = np.zeros((n_sedg, 1), "u4")
    g["se_delta_mean"] = np.zeros((n_sedg, 3), "f4")
    g["se_delta_std"] = np.zeros((n_sedg, 3), "f4")
    g["se_delta_norm"] = np.zeros((n_sedg, 1), "f4")
    g["se_delta_centroid"] = np.zeros((n_sedg, 3), "f4")
    for k in ("se_length_ratio", "se_surface_ratio", "se_volume_ratio", "se_point_count_ratio"):
        g[k] = np.zeros((n_sedg, 1), "f4")
    for s in range(n_sedg):
        lo, hi = jump[s], jump[s + 1]
        cs, ct = ec[0, lo], ec[1, lo]
        g["source"][s], g["target"][s] = cs, ct
        delta = xyz[edges[0, lo:hi]] - xyz[edges[1, lo:hi]]
        g["se_delta_centroid"][s] = g["sp_centroids"][cs] - g["sp_centroids"][ct]
        g["se_length_ratio"][s] = g["sp_length"][cs] / (g["sp_length"][ct] + 1e-6)
        g["se_surface_ratio"][s] = g["sp_surface"][cs] / (g["sp_surface"][ct] + 1e-6)
        g["se_volume_ratio"][s] = g["sp_volume"][cs] / (g["sp_volume"][ct] + 1e-6)
        g["se_point_count_ratio"][s] = g["sp_point_count"][cs] / (
            g["sp_point_count"][ct] + 1e-6
        )
        if len(delta) > 1:
            g["se_delta_mean"][s] = delta.mean(0)
            g["se_delta_std"][s] = delta.std(0)
            g["se_delta_norm"][s] = np.sqrt((delta**2).sum(1)).mean()
        else:
            g["se_delta_mean"][s] = delta
            g["se_delta_norm"][s] = np.sqrt((delta**2).sum())
    return g


def make_partitioned_cloud(rng, n=400, n_labels=5):
    xyz = rng.rand(n, 3).astype(np.float32)
    in_comp = (
        (xyz[:, 0] > 0.5).astype(np.int64) * 2 + (xyz[:, 1] > 0.5).astype(np.int64)
    )
    components = [np.flatnonzero(in_comp == c).astype(np.uint32) for c in range(4)]
    labels = rng.randint(0, n_labels + 1, n)
    return xyz, in_comp, components, labels


class TestComputeSpGraph:
    def test_matches_oracle(self, rng):
        xyz, in_comp, components, labels = make_partitioned_cloud(rng)
        got = compute_sp_graph(xyz, 0, in_comp, components, labels, 5)
        want = oracle_sp_graph(xyz, 0, in_comp, components, labels, 5)
        assert got["source"].shape == want["source"].shape
        np.testing.assert_array_equal(got["source"], want["source"])
        np.testing.assert_array_equal(got["target"], want["target"])
        for k in (
            "sp_centroids",
            "sp_length",
            "sp_surface",
            "sp_volume",
            "se_delta_mean",
            "se_delta_std",
            "se_delta_norm",
            "se_delta_centroid",
            "se_length_ratio",
            "se_surface_ratio",
            "se_volume_ratio",
            "se_point_count_ratio",
        ):
            np.testing.assert_allclose(got[k], want[k], rtol=2e-3, atol=2e-3, err_msg=k)
        np.testing.assert_array_equal(
            got["sp_point_count"].ravel(), want["sp_point_count"].ravel()
        )

    def test_label_histogram(self, rng):
        xyz, in_comp, components, labels = make_partitioned_cloud(rng)
        g = compute_sp_graph(xyz, 0, in_comp, components, labels, 5)
        assert g["sp_labels"].shape == (4, 6)
        assert g["sp_labels"].sum() == len(xyz)
        # histogram-form labels accumulate too
        hist = np.eye(6, dtype=np.uint32)[labels]
        g2 = compute_sp_graph(xyz, 0, in_comp, components, hist, 5)
        np.testing.assert_array_equal(g["sp_labels"], g2["sp_labels"])

    def test_d_max_filter(self, rng):
        xyz, in_comp, components, labels = make_partitioned_cloud(rng)
        g_all = compute_sp_graph(xyz, 0, in_comp, components, labels, 5)
        g_cut = compute_sp_graph(xyz, 0.05, in_comp, components, labels, 5)
        assert g_cut["se_delta_norm"].size <= g_all["se_delta_norm"].size

    def test_knn_adjacency_mode(self, rng):
        xyz, in_comp, components, labels = make_partitioned_cloud(rng)
        g = compute_sp_graph(xyz, 0, in_comp, components, labels, 5, adjacency="knn")
        # same component adjacency structure as delaunay on this dense cloud
        pairs = set(zip(g["source"].ravel().tolist(), g["target"].ravel().tolist()))
        assert len(pairs) >= 4  # the four quadrants touch

    def test_h5_roundtrip(self, rng, tmp_path):
        xyz, in_comp, components, labels = make_partitioned_cloud(rng)
        g = compute_sp_graph(xyz, 0, in_comp, components, labels, 5)
        path = str(tmp_path / "spg.h5")
        h5io.write_spg(path, g, components, in_comp)
        g2, comps2, in_comp2 = h5io.read_spg(path)
        np.testing.assert_array_equal(in_comp2, in_comp.astype(np.uint32))
        np.testing.assert_allclose(g2["se_delta_mean"], g["se_delta_mean"])
        assert len(comps2) == len(components)
        np.testing.assert_array_equal(comps2[1], components[1])

    def test_features_h5_roundtrip(self, rng, tmp_path):
        n = 100
        xyz = rng.rand(n, 3).astype(np.float32)
        geof = rng.rand(n, 4).astype(np.float32)
        rgb = (rng.rand(n, 3) * 255).astype(np.uint8)
        graph_nn = {
            "source": np.repeat(np.arange(n, dtype=np.uint32), 3),
            "target": rng.randint(0, n, 3 * n).astype(np.uint32),
            "distances": rng.rand(3 * n).astype(np.float32),
        }
        labels = rng.randint(0, 6, n).astype(np.uint8)
        path = str(tmp_path / "feat.h5")
        h5io.write_features(path, geof, xyz, rgb, graph_nn, labels)
        geof2, xyz2, rgb2, g2, labels2 = h5io.read_features(path)
        np.testing.assert_allclose(geof2, geof)
        np.testing.assert_array_equal(labels2, labels)
        np.testing.assert_array_equal(g2["source"], graph_nn["source"])


class TestComputeSpGraphDevice:
    """Device SPG builder vs the host builder in kNN-adjacency mode
    (VERDICT r2 item 4 — segment reductions on device for the big path)."""

    def _knn_edges(self, xyz, k=8):
        d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        idx = np.argsort(d2, axis=1)[:, :k]
        src = np.repeat(np.arange(len(xyz)), k)
        return src, idx.reshape(-1), idx

    def _compare(self, g_host, g_dev, n_com):
        assert g_dev["source"].shape == g_host["source"].shape
        np.testing.assert_array_equal(g_dev["source"], g_host["source"])
        np.testing.assert_array_equal(g_dev["target"], g_host["target"])
        np.testing.assert_allclose(
            g_dev["sp_centroids"], g_host["sp_centroids"], atol=1e-5
        )
        for key in ("sp_length", "sp_surface", "sp_volume"):
            np.testing.assert_allclose(
                g_dev[key], g_host[key], rtol=2e-2, atol=1e-4
            )
        np.testing.assert_array_equal(
            g_dev["sp_point_count"], g_host["sp_point_count"]
        )
        for key in ("se_delta_mean", "se_delta_std", "se_delta_norm",
                    "se_delta_centroid", "se_point_count_ratio"):
            np.testing.assert_allclose(
                g_dev[key], g_host[key], rtol=1e-3, atol=1e-4
            )
        for key in ("se_length_ratio", "se_surface_ratio",
                    "se_volume_ratio"):
            np.testing.assert_allclose(
                g_dev[key], g_host[key], rtol=5e-2, atol=1e-3
            )

    def test_matches_host_knn_mode(self, rng):
        from superpoint_graph_tpu.graph.spg_device import (
            compute_sp_graph_device,
        )

        xyz, in_comp, components, labels = make_partitioned_cloud(rng, n=500)
        src, tgt, idx = self._knn_edges(xyz)
        g_host = compute_sp_graph(
            xyz, 0, in_comp, components, labels, 5,
            adjacency="knn", knn_edges=(src, tgt),
        )
        g_dev = compute_sp_graph_device(
            xyz, 0, in_comp, components, labels, 5, idx_adj=idx
        )
        self._compare(g_host, g_dev, 4)
        np.testing.assert_array_equal(g_dev["sp_labels"], g_host["sp_labels"])

    def test_matches_host_with_dmax_and_hist_labels(self, rng):
        from superpoint_graph_tpu.graph.spg_device import (
            compute_sp_graph_device,
        )

        xyz, in_comp, components, labels = make_partitioned_cloud(rng, n=400)
        hist = np.zeros((len(xyz), 6), np.uint32)
        hist[np.arange(len(xyz)), labels] = rng.randint(1, 5, len(xyz))
        src, tgt, idx = self._knn_edges(xyz, k=6)
        g_host = compute_sp_graph(
            xyz, 0.4, in_comp, components, hist, 5,
            adjacency="knn", knn_edges=(src, tgt),
        )
        g_dev = compute_sp_graph_device(
            xyz, 0.4, in_comp, components, hist, 5, idx_adj=idx
        )
        self._compare(g_host, g_dev, 4)
        np.testing.assert_array_equal(g_dev["sp_labels"], g_host["sp_labels"])

    def test_duplicate_points_and_tiny_components(self, rng):
        """Exercises the dedup path (repeated coordinates) and the 1-/2-point
        degenerate size rules."""
        from superpoint_graph_tpu.graph.spg_device import (
            compute_sp_graph_device,
        )

        xyz = rng.rand(64, 3).astype(np.float32)
        xyz[10] = xyz[11] = xyz[12]      # exact duplicates inside comp 0
        in_comp = np.zeros(64, np.int64)
        in_comp[60] = 1                  # 1-point component
        in_comp[61:63] = 2               # 2-point component
        in_comp[63] = 3
        components = [np.flatnonzero(in_comp == c).astype(np.uint32)
                      for c in range(4)]
        labels = rng.randint(0, 6, 64)
        src, tgt, idx = self._knn_edges(xyz, k=5)
        g_host = compute_sp_graph(
            xyz, 0, in_comp, components, labels, 5,
            adjacency="knn", knn_edges=(src, tgt),
        )
        g_dev = compute_sp_graph_device(
            xyz, 0, in_comp, components, labels, 5, idx_adj=idx
        )
        self._compare(g_host, g_dev, 4)

"""Golden tests for eigen3 / geof / knn / voxel ops against numpy/sklearn oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from superpoint_graph_tpu.ops import eigen3, geof, knn, voxel


class TestEigh3x3:
    def test_matches_numpy_eigh(self, rng):
        a = rng.randn(500, 3, 3).astype(np.float32)
        cov = a @ np.transpose(a, (0, 2, 1))
        lams, vecs = eigen3.eigh3x3(jnp.asarray(cov))
        lams = np.asarray(lams)
        vecs = np.asarray(vecs)
        ref = np.linalg.eigvalsh(cov)[:, ::-1]
        np.testing.assert_allclose(lams, ref, rtol=2e-4, atol=2e-4)
        # eigenvector property: ||A v - lam v|| small, unit norm
        for i in range(3):
            res = np.einsum("nij,nj->ni", cov, vecs[:, :, i]) - lams[:, i : i + 1] * vecs[:, :, i]
            scale = np.abs(lams[:, 0:1]) + 1.0
            assert np.max(np.linalg.norm(res, axis=1) / scale.squeeze(-1)) < 5e-3
        np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5)

    def test_degenerate_isotropic(self):
        cov = np.stack([np.eye(3, dtype=np.float32) * 2.0, np.zeros((3, 3), np.float32)])
        lams, vecs = eigen3.eigh3x3(jnp.asarray(cov))
        np.testing.assert_allclose(np.asarray(lams)[0], [2, 2, 2], atol=1e-5)
        np.testing.assert_allclose(np.asarray(lams)[1], [0, 0, 0], atol=1e-5)
        assert np.all(np.isfinite(np.asarray(vecs)))

    def test_planar_degenerate(self):
        # two equal large eigenvalues (a plane): still finite, ordered
        cov = np.diag([1.0, 1.0, 0.01]).astype(np.float32)[None]
        lams, _ = eigen3.eigh3x3(jnp.asarray(cov))
        np.testing.assert_allclose(np.asarray(lams)[0], [1, 1, 0.01], atol=1e-3)


class TestGeof:
    def test_matches_oracle(self, rng):
        n, k = 200, 12
        xyz = rng.randn(n, 3).astype(np.float32)
        nbrs = np.stack(
            [rng.choice(np.delete(np.arange(n), i), k, replace=False) for i in range(n)]
        ).astype(np.int32)
        got = np.asarray(geof.compute_geof(jnp.asarray(xyz), jnp.asarray(nbrs)))
        want = geof.compute_geof_numpy(xyz, nbrs)
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)

    def test_feature_semantics(self, rng):
        # points on a line -> linearity ~1; on a plane -> planarity high;
        # vertical line -> verticality ~1
        t = np.linspace(0, 1, 32).astype(np.float32)
        line = np.stack([np.zeros_like(t), np.zeros_like(t), t], 1)
        line += rng.randn(*line.shape).astype(np.float32) * 1e-4
        nbrs = np.stack([np.delete(np.arange(32), i)[:10] for i in range(32)]).astype(np.int32)
        f = np.asarray(geof.compute_geof(jnp.asarray(line), jnp.asarray(nbrs)))
        assert f[:, 0].mean() > 0.95  # linearity
        assert f[:, 3].mean() > 0.95  # verticality (vertical line)

        g = rng.rand(64, 3).astype(np.float32)
        g[:, 2] = 0.0
        nbrs = np.stack([np.delete(np.arange(64), i)[:10] for i in range(64)]).astype(np.int32)
        f = np.asarray(geof.compute_geof(jnp.asarray(g), jnp.asarray(nbrs)))
        assert f[:, 1].mean() > 0.3  # planarity dominates ...
        assert f[:, 2].mean() < 0.1  # ... and scattering vanishes for a plane


class TestKnn:
    def test_matches_sklearn(self, rng):
        from sklearn.neighbors import NearestNeighbors

        n, k = 777, 10
        xyz = rng.rand(n, 3).astype(np.float32)
        idx, d2 = knn.knn(jnp.asarray(xyz), k, block_q=128, block_db=256)
        nn = NearestNeighbors(n_neighbors=k + 1).fit(xyz)
        dist, ref_idx = nn.kneighbors(xyz)
        ref_idx, dist = ref_idx[:, 1:], dist[:, 1:]
        # distances must match exactly-ish; indices may differ under ties
        np.testing.assert_allclose(
            np.sqrt(np.maximum(np.asarray(d2), 0)), dist, rtol=1e-3, atol=1e-4
        )
        agree = (np.asarray(idx) == ref_idx).mean()
        assert agree > 0.99

    def test_compute_graph_nn_2(self, rng):
        n = 300
        xyz = rng.rand(n, 3).astype(np.float32)
        graph, target_geof = knn.compute_graph_nn_2(xyz, 5, 20)
        assert graph["source"].shape == (n * 5,)
        assert graph["target"].shape == (n * 5,)
        assert target_geof.shape == (n, 20)
        # no self edges
        assert np.all(graph["source"] != graph["target"])

    def test_defer_fetch_matches_blocking(self, rng):
        """defer_fetch + materialize must produce the identical graph the
        blocking path produces (the async copy only changes timing)."""
        n = 300
        xyz = rng.rand(n, 3).astype(np.float32)
        graph_b, tg_b = knn.compute_graph_nn_2(xyz, 5, 20)
        graph_d, tg_d, dev = knn.compute_graph_nn_2(
            xyz, 5, 20, return_device=True, defer_fetch=True
        )
        assert "_deferred" in graph_d
        graph_d = knn.materialize_graph_nn(graph_d)
        assert "_deferred" not in graph_d
        np.testing.assert_array_equal(graph_b["source"], graph_d["source"])
        np.testing.assert_array_equal(graph_b["target"], graph_d["target"])
        np.testing.assert_allclose(
            graph_b["distances"], graph_d["distances"], rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(tg_b), np.asarray(tg_d))
        # idempotent
        assert knn.materialize_graph_nn(graph_d) is graph_d


class TestVoxelPrune:
    def _oracle(self, xyz, voxel_size, rgb, labels, n_labels):
        mins = xyz.min(0)
        bins = np.floor((xyz - mins) / voxel_size).astype(np.int64)
        seen = {}
        order = []
        for i, b in enumerate(map(tuple, bins)):
            if b not in seen:
                seen[b] = len(seen)
                order.append(b)
        m = len(seen)
        sxyz = np.zeros((m, 3))
        srgb = np.zeros((m, 3))
        cnt = np.zeros(m)
        hist = np.zeros((m, n_labels + 1), np.int64)
        for i, b in enumerate(map(tuple, bins)):
            j = seen[b]
            sxyz[j] += xyz[i]
            srgb[j] += rgb[i]
            cnt[j] += 1
            hist[j, labels[i]] += 1
        return sxyz / cnt[:, None], (srgb / cnt[:, None]).astype(np.uint8), hist

    def test_matches_oracle(self, rng):
        n, n_labels = 1000, 4
        xyz = (rng.rand(n, 3) * 2).astype(np.float32)
        rgb = (rng.rand(n, 3) * 255).astype(np.uint8)
        labels = rng.randint(0, n_labels + 1, n).astype(np.int32)
        got_xyz, got_rgb, got_hist, _ = voxel.prune(
            xyz, 0.25, rgb, labels, None, n_labels, 0
        )
        want_xyz, want_rgb, want_hist = self._oracle(xyz, 0.25, rgb, labels, n_labels)
        assert got_xyz.shape == want_xyz.shape
        np.testing.assert_allclose(got_xyz, want_xyz, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(got_hist, want_hist)
        assert np.abs(got_rgb.astype(int) - want_rgb.astype(int)).max() <= 1

    def test_single_voxel(self):
        xyz = np.zeros((5, 3), np.float32)
        rgb = np.full((5, 3), 100, np.uint8)
        px, pr, ph, po = voxel.prune(xyz, 0.1, rgb, None, None, 0, 0)
        assert px.shape == (1, 3)
        np.testing.assert_allclose(px[0], 0.0, atol=1e-6)

    def test_fine_pitch_no_collisions(self, rng):
        """Regression: with a non-power-of-two cloud (padding in play) and a
        fine pitch, the flat int32 voxel key used to collide and silently
        over-merge (6000 pts -> 763 voxels instead of ~5994)."""
        n = 6000
        xyz = (rng.rand(n, 3) * [4, 3, 2.5]).astype(np.float32)
        bins = np.floor((xyz - xyz.min(0)) / 0.02).astype(np.int64)
        expected = len(np.unique(bins, axis=0))
        px, _, _, _ = voxel.prune(
            xyz, 0.02, np.zeros((n, 3), np.uint8), None, None, 0, 0
        )
        assert len(px) == expected

    def test_host_prune_matches_device(self, rng):
        """prune_host (the giant-cloud dispatch target) must agree with the
        device path bit-for-bit on order, counts, and histograms."""
        n, n_labels, n_obj = 5000, 5, 7
        xyz = (rng.rand(n, 3) * [6, 5, 3]).astype(np.float32)
        rgb = (rng.rand(n, 3) * 255).astype(np.uint8)
        labels = rng.randint(0, n_labels + 1, n).astype(np.int32)
        objects = rng.randint(0, n_obj + 1, n).astype(np.int32)
        dx, dr, dh, do = voxel.prune(
            xyz, 0.05, rgb, labels, objects, n_labels, n_obj
        )
        hx, hr, hh, ho = voxel.prune_host(
            xyz, 0.05, rgb, labels, objects, n_labels, n_obj
        )
        assert hx.shape == dx.shape
        np.testing.assert_allclose(hx, dx, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(hh, dh)
        np.testing.assert_array_equal(ho, do)
        assert np.abs(hr.astype(int) - dr.astype(int)).max() <= 1

    def test_large_extent_scene(self, rng):
        """Regression: a 220 m scene at 0.1 m pitch has ~2200^3 grid cells —
        far past int32 for any flattened key (this build truncates jnp int64
        to int32 silently)."""
        n = 20000
        xyz = (rng.rand(n, 3) * [220, 220, 30]).astype(np.float32)
        bins = np.floor((xyz - xyz.min(0)) / 0.1).astype(np.int64)
        expected = len(np.unique(bins, axis=0))
        px, _, _, _ = voxel.prune(
            xyz, 0.1, np.zeros((n, 3), np.uint8), None, None, 0, 0
        )
        assert len(px) == expected

"""Giant-cloud partition: chunked band cut pursuit + boundary heal
(pipeline_big.py — the single-chip path for clouds past band-memory reach)."""
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _knn_edges(xyz, k):
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    idx = np.argsort(d2, axis=1)[:, :k]
    src = np.repeat(np.arange(len(xyz)), k)
    tgt = idx.reshape(-1)
    dist = np.sqrt(d2[src, tgt])
    w = (1.0 / (1.0 + dist / dist.mean())).astype(np.float32)
    return src, tgt, w


class TestChunkedCutPursuit:
    def test_matches_unchunked_on_room(self, rng):
        """Chunked solve + heal must land in the same quality class as the
        monolithic band solve: l0 objective no worse than ~10% above it (in
        practice the chunked result lands BELOW — smaller subproblems find
        finer, lower-energy optima: 462 vs 612 measured on this room — so
        this bound documents the worst case, not the typical one)."""
        from superpoint_graph_tpu.data.synthetic import synthetic_room
        from superpoint_graph_tpu.ops.cutpursuit_band import cutpursuit_band
        from superpoint_graph_tpu.pipeline_big import chunked_cutpursuit

        xyz, rgb, labels, objects = synthetic_room(rng, n_points=6000)
        src, tgt, w = _knn_edges(xyz, 5)
        feats = np.concatenate(
            [xyz, rgb.astype(np.float32) / 255.0], axis=1
        ).astype(np.float32)

        def energy(ic, reg=0.1):
            ic = np.asarray(ic, np.int64)
            nc = ic.max() + 1
            S = np.zeros((nc, feats.shape[1]))
            np.add.at(S, ic, feats.astype(np.float64))
            m = np.bincount(ic, minlength=nc).astype(np.float64)
            fid = (feats.astype(np.float64) ** 2).sum() - (
                (S**2).sum(1)[m > 0] / m[m > 0]
            ).sum()
            return fid + reg * w[ic[src] != ic[tgt]].sum()

        comps_m, ic_m = cutpursuit_band(feats, src, tgt, w, 0.1, xyz=xyz)
        comps_c, ic_c = chunked_cutpursuit(
            feats, xyz, src, tgt, w, 0.1, chunk_points=2000
        )
        assert ic_c.shape == ic_m.shape
        assert energy(ic_c) <= energy(ic_m) * 1.1, (
            energy(ic_c), energy(ic_m), len(comps_c), len(comps_m),
        )

    def test_heal_merges_plane_across_chunks(self, rng):
        """A single flat plane split across many Morton chunks must come
        back as ~one region after the heal (the merge step's job)."""
        from superpoint_graph_tpu.pipeline_big import chunked_cutpursuit

        n = 4000
        xyz = np.zeros((n, 3), np.float32)
        xyz[:, 0] = rng.rand(n) * 10
        xyz[:, 1] = rng.rand(n) * 10
        feats = np.full((n, 2), 0.5, np.float32)  # constant features
        src, tgt, w = _knn_edges(xyz, 5)
        comps, ic = chunked_cutpursuit(
            feats, xyz, src, tgt, w, 0.05, chunk_points=500
        )
        assert len(comps) <= 3, f"plane fragmented into {len(comps)} regions"

    def test_cutoff_applies(self, rng):
        from superpoint_graph_tpu.pipeline_big import chunked_cutpursuit

        n = 1500
        xyz = rng.rand(n, 3).astype(np.float32)
        feats = rng.rand(n, 4).astype(np.float32)
        src, tgt, w = _knn_edges(xyz, 4)
        comps, ic = chunked_cutpursuit(
            feats, xyz, src, tgt, w, 0.5, cutoff=5, chunk_points=600
        )
        sizes = np.bincount(ic)
        assert sizes[sizes > 0].min() >= 5 or len(comps) == 1


class TestPartitionCloudBig:
    def test_end_to_end_small(self, rng):
        """Full big-cloud path on a small room (chunking forced small) —
        result contract identical to partition_cloud's."""
        from superpoint_graph_tpu.data.synthetic import synthetic_room
        from superpoint_graph_tpu.pipeline import PartitionConfig
        from superpoint_graph_tpu.pipeline_big import partition_cloud_big

        xyz, rgb, labels, objects = synthetic_room(rng, n_points=5000)
        cfg = PartitionConfig(
            voxel_width=0.0, k_nn_geof=12, k_nn_adj=5, reg_strength=0.1,
            spg_adjacency="knn",
        )
        res = partition_cloud_big(
            xyz, rgb, labels, objects, n_labels=13, cfg=cfg,
            chunk_points=2000, geof_chunk=1500,
        )
        n = len(res.xyz)
        assert res.in_component.shape == (n,)
        assert res.geof.shape == (n, 4)
        assert len(res.components) == res.in_component.max() + 1
        assert res.graph_sp["sp_centroids"].shape[0] == len(res.components)
        # geof values match the unchunked op
        from superpoint_graph_tpu.ops.geof import compute_geof
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.knn import knn_bigcloud

        bi, _, _ = knn_bigcloud(np.asarray(xyz, np.float32), 12)
        ref = np.asarray(compute_geof(jnp.asarray(xyz), bi))
        np.testing.assert_allclose(res.geof, ref, rtol=1e-4, atol=1e-5)


class TestMortonPermDevice:
    def test_valid_permutation_and_locality(self, rng):
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.cutpursuit_band import (
            morton_order, morton_perm_device,
        )

        xyz = (rng.rand(4096, 3) * [4, 3, 2.5]).astype(np.float32)
        perm_d = np.asarray(morton_perm_device(jnp.asarray(xyz)))
        assert sorted(perm_d.tolist()) == list(range(4096))

        # same locality as the host Morton order: measure the fraction of
        # 8-NN edges that land within a +-512 index band
        def band_frac(perm):
            inv = np.empty(len(perm), np.int64)
            inv[perm] = np.arange(len(perm))
            d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
            np.fill_diagonal(d2, np.inf)
            idx = np.argsort(d2, axis=1)[:, :8]
            src = inv[np.repeat(np.arange(len(perm)), 8)]
            tgt = inv[idx.reshape(-1)]
            return np.mean(np.abs(src - tgt) <= 512)

        fd, fh = band_frac(perm_d), band_frac(morton_order(xyz))
        assert fd > 0.85 * fh, (fd, fh)


class TestChunkedCutPursuitDevice:
    """Device-resident chunked solver (chunked_cutpursuit_device) — same
    quality contract as the host-fed chunked path, nothing big on host."""

    def _device_args(self, feats, xyz, k):
        import jax.numpy as jnp

        d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        idx = np.argsort(d2, axis=1)[:, :k]
        d2k = np.take_along_axis(d2, idx, axis=1)
        return (
            jnp.asarray(feats), jnp.asarray(idx.astype(np.int32)),
            jnp.asarray(d2k.astype(np.float32)),
        )

    def test_matches_host_chunked_on_room(self, rng):
        from superpoint_graph_tpu.data.synthetic import synthetic_room
        from superpoint_graph_tpu.pipeline_big import (
            chunked_cutpursuit, chunked_cutpursuit_device,
        )

        xyz, rgb, labels, objects = synthetic_room(rng, n_points=6000)
        src, tgt, w = _knn_edges(xyz, 5)
        feats = np.concatenate(
            [xyz, rgb.astype(np.float32) / 255.0], axis=1
        ).astype(np.float32)

        def energy(ic, reg=0.1):
            ic = np.asarray(ic, np.int64)
            nc = ic.max() + 1
            S = np.zeros((nc, feats.shape[1]))
            np.add.at(S, ic, feats.astype(np.float64))
            m = np.bincount(ic, minlength=nc).astype(np.float64)
            fid = (feats.astype(np.float64) ** 2).sum() - (
                (S**2).sum(1)[m > 0] / m[m > 0]
            ).sum()
            return fid + reg * w[ic[src] != ic[tgt]].sum()

        f_dev, idx_dev, d2_dev = self._device_args(feats, xyz, 5)
        comps_h, ic_h = chunked_cutpursuit(
            feats, xyz, src, tgt, w, 0.1, chunk_points=2000
        )
        comps_d, ic_d = chunked_cutpursuit_device(
            f_dev, idx_dev, d2_dev, xyz, 0.1, chunk_points=2000
        )
        assert ic_d.shape == ic_h.shape
        assert energy(ic_d) <= energy(ic_h) * 1.1, (
            energy(ic_d), energy(ic_h), len(comps_d), len(comps_h),
        )

    def test_heal_merges_plane_across_chunks(self, rng):
        from superpoint_graph_tpu.pipeline_big import chunked_cutpursuit_device

        n = 4000
        xyz = np.zeros((n, 3), np.float32)
        xyz[:, 0] = rng.rand(n) * 10
        xyz[:, 1] = rng.rand(n) * 10
        feats = np.full((n, 2), 0.5, np.float32)
        f_dev, idx_dev, d2_dev = self._device_args(feats, xyz, 5)
        comps, ic = chunked_cutpursuit_device(
            f_dev, idx_dev, d2_dev, xyz, 0.05, chunk_points=512
        )
        assert len(comps) <= 3, f"plane fragmented into {len(comps)} regions"

    def test_cutoff_applies(self, rng):
        from superpoint_graph_tpu.pipeline_big import chunked_cutpursuit_device

        n = 1500
        xyz = rng.rand(n, 3).astype(np.float32)
        feats = rng.rand(n, 4).astype(np.float32)
        f_dev, idx_dev, d2_dev = self._device_args(feats, xyz, 4)
        comps, ic = chunked_cutpursuit_device(
            f_dev, idx_dev, d2_dev, xyz, 0.5, cutoff=5, chunk_points=600
        )
        sizes = np.bincount(ic)
        assert sizes[sizes > 0].min() >= 5 or len(comps) == 1


class TestConnectivityContract:
    """A component's vertex set must be ONE connected component of the
    adjacency graph (reference contract:
    partition/ply_c/connected_components.cpp:17-110 — components ARE graph
    CCs). The chunked paths can violate it at chunk-core boundaries (a label
    connected only through halo vertices); ops.components.relabel_connected
    enforces it. disconnected_labels must be 0 at every scale."""

    @staticmethod
    def _count_disconnected(ic, src, tgt):
        import scipy.sparse as sp
        from scipy.sparse.csgraph import connected_components as scipy_cc

        n = len(ic)
        same = ic[src] == ic[tgt]
        adj = sp.csr_matrix(
            (np.ones(same.sum(), np.int8), (src[same], tgt[same])),
            shape=(n, n),
        )
        n_cc, _ = scipy_cc(adj, directed=False)
        return n_cc - (ic.max() + 1)

    def test_chunked_labels_are_connected(self, rng):
        from superpoint_graph_tpu.data.synthetic import synthetic_room
        from superpoint_graph_tpu.pipeline_big import chunked_cutpursuit

        xyz, rgb, labels, objects = synthetic_room(rng, n_points=6000)
        src, tgt, w = _knn_edges(xyz, 5)
        feats = np.concatenate(
            [xyz, rgb.astype(np.float32) / 255.0], axis=1
        ).astype(np.float32)
        _, ic = chunked_cutpursuit(
            feats, xyz, src, tgt, w, 0.1, chunk_points=2000
        )
        assert self._count_disconnected(ic, src, tgt) == 0

    def test_relabel_connected_splits_and_fuses(self):
        from superpoint_graph_tpu.ops.components import relabel_connected

        # path graph 0-1-2-3-4-5; label 0 covers {0,1, 4,5} (disconnected),
        # label 1 covers {2,3}
        src = np.arange(5, dtype=np.int64)
        tgt = np.arange(1, 6, dtype=np.int64)
        ic = np.array([0, 0, 1, 1, 0, 0])
        comps, out = relabel_connected(6, src, tgt, ic, cutoff=0)
        assert len(comps) == 3
        assert out[0] == out[1] and out[4] == out[5] and out[0] != out[4]
        assert out[2] == out[3]
        # with cutoff=3 the 2-vertex pieces fuse into a neighbor through
        # inactive edges — and stay connected
        comps2, out2 = relabel_connected(6, src, tgt, ic, cutoff=3)
        assert self._count_disconnected(out2, src, tgt) == 0

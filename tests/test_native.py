"""C++ parity library vs the Python/JAX implementations (golden tests)."""
import numpy as np
import pytest

from superpoint_graph_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


class TestNativePrune:
    def test_matches_jax_prune(self, rng):
        from superpoint_graph_tpu.ops import voxel

        n, n_labels = 800, 4
        xyz = (rng.rand(n, 3) * 2).astype(np.float32)
        rgb = (rng.rand(n, 3) * 255).astype(np.uint8)
        labels = rng.randint(0, n_labels + 1, n).astype(np.int32)
        nx, nr, nh, _ = native.prune(xyz, 0.25, rgb, labels, None, n_labels, 0)
        jx, jr, jh, _ = voxel.prune(xyz, 0.25, rgb, labels, None, n_labels, 0)
        assert nx.shape == jx.shape
        np.testing.assert_allclose(nx, jx, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(nh, jh)
        assert np.abs(nr.astype(int) - jr.astype(int)).max() <= 1


class TestNativeGeof:
    def test_matches_jax_geof(self, rng):
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops import geof

        n, k = 300, 15
        xyz = rng.randn(n, 3).astype(np.float32)
        nbrs = np.stack(
            [rng.choice(np.delete(np.arange(n), i), k, replace=False)
             for i in range(n)]
        ).astype(np.uint32)
        got = native.compute_geof(xyz, nbrs, k)
        want = np.asarray(
            geof.compute_geof(jnp.asarray(xyz), jnp.asarray(nbrs.astype(np.int32)))
        )
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


class TestNativeComponents:
    def test_matches_host(self, rng):
        from superpoint_graph_tpu.ops.components import connected_components

        n = 150
        src = rng.randint(0, n, 300).astype(np.uint32)
        tgt = rng.randint(0, n, 300).astype(np.uint32)
        active = (rng.rand(300) > 0.5).astype(np.uint8)
        ncomps, nic = native.connected_comp(n, src, tgt, active, 0)
        hcomps, hic = connected_components(n, src, tgt, active, 0)
        np.testing.assert_array_equal(nic, hic)

    def test_cutoff(self, rng):
        src = np.array([0, 1], np.uint32)
        tgt = np.array([1, 2], np.uint32)
        comps, ic = native.connected_comp(3, src, tgt, np.array([1, 0], np.uint8), 2)
        assert len(comps) == 1


class TestNativeSubgraph:
    def test_sizes(self, rng):
        n = 400
        src = rng.randint(0, n, 1200).astype(np.uint32)
        tgt = rng.randint(0, n, 1200).astype(np.uint32)
        esel, vsel = native.random_subgraph(n, src, tgt, 100, seed=1)
        assert vsel.sum() == 100
        assert (esel == (vsel[src] & vsel[tgt])).all()

    def test_small_graph_pass_through(self):
        src = np.array([0], np.uint32)
        tgt = np.array([1], np.uint32)
        esel, vsel = native.random_subgraph(2, src, tgt, 10)
        assert vsel.all() and esel.all()


class TestNativeCutPursuit:
    def test_two_clusters(self, rng):
        from tests.test_cutpursuit import grid_graph

        h, w = 8, 12
        src, tgt = grid_graph(h, w)
        f = np.zeros((h * w, 2), np.float32)
        gt = (np.arange(h * w).reshape(h, w) % w >= w // 2).ravel()
        f[gt] = [1.0, 0.5]
        f += rng.randn(h * w, 2).astype(np.float32) * 0.02
        comps, ic = native.cutpursuit(f, src, tgt, np.ones(len(src), np.float32), 0.1)
        assert len(comps) == 2
        side = ic == ic[np.flatnonzero(gt)[0]]
        assert np.array_equal(side, gt)

    def test_energy_close_to_python_oracle(self, rng):
        from tests.test_cutpursuit import grid_graph, partition_energy

        h, w = 10, 10
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        f = rng.rand(h * w, 4).astype(np.float32)
        band = ((np.arange(h * w).reshape(h, w) % w) // 4).ravel()
        f += np.eye(4, dtype=np.float32)[np.minimum(band, 3)] * 1.5
        from superpoint_graph_tpu.ops.cutpursuit import cutpursuit as py_cp

        _, ic_py = py_cp(f, src, tgt, ew, 0.3)
        _, ic_na = native.cutpursuit(f, src, tgt, ew.astype(np.float32), 0.3)
        e_py = partition_energy(f, ic_py, src, tgt, ew, 0.3)
        e_na = partition_energy(f, ic_na, src, tgt, ew, 0.3)
        assert e_na <= e_py * 1.05

    def test_cutoff_fuses(self, rng):
        from tests.test_cutpursuit import grid_graph

        src, tgt = grid_graph(6, 6)
        f = rng.randn(36, 2).astype(np.float32) * 0.01
        f[0] += 100.0
        _, ic = native.cutpursuit(f, src, tgt, np.ones(len(src), np.float32),
                                  0.05, cutoff=3)
        assert np.bincount(ic).min() >= 3

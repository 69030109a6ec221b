"""Tests for the host-exact l0 cut-pursuit solver (parity oracle for libcp)."""
import numpy as np
import pytest

from superpoint_graph_tpu.ops import cutpursuit as cp
from superpoint_graph_tpu.ops.components import connected_components


def grid_graph(h, w):
    """4-neighborhood grid, each undirected edge listed once."""
    idx = np.arange(h * w).reshape(h, w)
    src = np.concatenate([idx[:, :-1].ravel(), idx[:-1, :].ravel()])
    tgt = np.concatenate([idx[:, 1:].ravel(), idx[1:, :].ravel()])
    return src.astype(np.int64), tgt.astype(np.int64)


def partition_energy(f, in_comp, src, tgt, w, reg):
    e, _ = cp._energy(
        f.astype(np.float64), np.ones(len(f)), in_comp.astype(np.int64), src, tgt, w, reg
    )
    return e


class TestCutPursuit:
    def test_two_clusters_recovered(self, rng):
        h, w = 8, 12
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        f = np.zeros((h * w, 2), np.float32)
        gt = (np.arange(h * w).reshape(h, w) % w >= w // 2).ravel()
        f[gt] = [1.0, 0.5]
        f += rng.randn(h * w, 2).astype(np.float32) * 0.02
        comps, in_comp = cp.cutpursuit(f, src, tgt, ew, reg_strength=0.1)
        assert len(comps) == 2
        # components must coincide with ground truth
        side = in_comp == in_comp[np.flatnonzero(gt)[0]]
        assert np.array_equal(side, gt)

    def test_huge_reg_single_component(self, rng):
        src, tgt = grid_graph(6, 6)
        f = rng.randn(36, 3).astype(np.float32)
        comps, in_comp = cp.cutpursuit(f, src, tgt, np.ones(len(src)), 1e6)
        assert len(comps) == 1

    def test_zero_reg_splits_everything_distinct(self, rng):
        src, tgt = grid_graph(4, 4)
        f = (np.arange(16, dtype=np.float32)[:, None]) * 10
        comps, in_comp = cp.cutpursuit(f, src, tgt, np.ones(len(src)), 1e-6)
        assert len(comps) == 16

    def test_energy_beats_trivial_partitions(self, rng):
        h, w = 6, 10
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        f = rng.rand(h * w, 3).astype(np.float32)
        f[: h * w // 2] += 2.0
        reg = 0.3
        _, in_comp = cp.cutpursuit(f, src, tgt, ew, reg)
        e = partition_energy(f, in_comp, src, tgt, ew, reg)
        e_single = partition_energy(f, np.zeros(h * w, np.int64), src, tgt, ew, reg)
        e_all = partition_energy(f, np.arange(h * w), src, tgt, ew, reg)
        assert e <= e_single + 1e-9
        assert e <= e_all + 1e-9

    def test_cutoff_fuses_small_regions(self, rng):
        src, tgt = grid_graph(6, 6)
        f = rng.randn(36, 2).astype(np.float32) * 0.01
        f[0] += 100.0  # one outlier vertex would become its own region
        _, in_comp_nocut = cp.cutpursuit(f, src, tgt, np.ones(len(src)), 0.05)
        sizes = np.bincount(in_comp_nocut)
        assert sizes.min() == 1
        _, in_comp = cp.cutpursuit(f, src, tgt, np.ones(len(src)), 0.05, cutoff=3)
        assert np.bincount(in_comp).min() >= 3

    def test_cutpursuit2_inpainting(self, rng):
        # scalar labels with unlabeled nodes (weight 0) get filled from region
        src, tgt = grid_graph(5, 8)
        n = 40
        vals = np.zeros(n, np.float32)
        gt = (np.arange(n).reshape(5, 8) % 8 >= 4).ravel()
        vals[gt] = 1.0
        nw = (rng.rand(n) > 0.4).astype(np.float64)  # ~60% labeled
        vals_obs = vals * (nw > 0)
        vr, in_comp = cp.cutpursuit2(vals_obs, src, tgt, np.ones(len(src)), nw, 0.2)
        assert vr.shape == (n,)
        # regions respect the labeled structure: labeled nodes keep their value
        lab = nw > 0
        assert np.abs(vr[lab] - vals[lab]).mean() < 0.3


class TestConnectedComponents:
    def test_simple(self):
        src = np.array([0, 1, 3])
        tgt = np.array([1, 2, 4])
        comps, in_comp = connected_components(5, src, tgt, np.array([1, 1, 1]), 0)
        assert len(comps) == 2
        assert in_comp.tolist() == [0, 0, 0, 1, 1]

    def test_active_mask(self):
        src = np.array([0, 1])
        tgt = np.array([1, 2])
        comps, in_comp = connected_components(3, src, tgt, np.array([1, 0]), 0)
        assert len(comps) == 2
        assert in_comp.tolist() == [0, 0, 1]

    def test_cutoff_fuse(self):
        # 0-1 big comp, 2 singleton adjacent via inactive edge
        src = np.array([0, 1])
        tgt = np.array([1, 2])
        comps, in_comp = connected_components(3, src, tgt, np.array([1, 0]), 2)
        assert len(comps) == 1

    def test_jax_matches_host(self, rng):
        import jax.numpy as jnp
        from superpoint_graph_tpu.ops.components import connected_components_jax

        n = 200
        src = rng.randint(0, n, 400)
        tgt = rng.randint(0, n, 400)
        active = rng.rand(400) > 0.6
        _, host = connected_components(n, src, tgt, active, 0)
        roots = np.asarray(
            connected_components_jax(
                jnp.asarray(src, jnp.int32),
                jnp.asarray(tgt, jnp.int32),
                jnp.asarray(active),
                n,
            )
        )
        # same partition: roots must be constant exactly on host components
        for c in range(host.max() + 1):
            assert len(np.unique(roots[host == c])) == 1
        assert len(np.unique(roots)) == host.max() + 1


class TestMergeRegions:
    def test_merge_lowers_energy(self, rng):
        """Over-fragmented partitions must merge back; energy never rises."""
        from superpoint_graph_tpu.ops.cutpursuit import merge_regions

        h, w = 8, 12
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        f = rng.randn(h * w, 3).astype(np.float32) * 0.05  # near-constant field
        # fragment artificially into 8 column bands
        frag = ((np.arange(h * w).reshape(h, w) % w) // 2).ravel().astype(np.int64)
        reg = 0.5
        e_before = partition_energy(f, frag, src, tgt, ew, reg)
        merged = merge_regions(f, np.ones(h * w), frag, src, tgt, ew, reg)
        e_after = partition_energy(f, merged, src, tgt, ew, reg)
        assert e_after < e_before
        assert merged.max() < frag.max()  # actually merged something

    def test_no_merge_when_separated(self, rng):
        from superpoint_graph_tpu.ops.cutpursuit import merge_regions

        h, w = 6, 8
        src, tgt = grid_graph(h, w)
        f = np.zeros((h * w, 2), np.float32)
        gt = (np.arange(h * w).reshape(h, w) % w >= w // 2).ravel()
        f[gt] = [5.0, 5.0]  # huge separation
        merged = merge_regions(f, np.ones(h * w), gt.astype(np.int64),
                               src, tgt, np.ones(len(src)), 0.1)
        assert merged.max() == 1  # both regions survive


class TestMergeDevice:
    """Device edge->region reduction (ops.merge_device) vs the host oracle."""

    def test_pair_stats_match_host(self, rng):
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.merge_device import pair_stats

        h, w = 16, 24
        src, tgt = grid_graph(h, w)
        n = h * w
        ew = rng.rand(len(src)).astype(np.float32) + 0.1
        f = rng.randn(n, 3).astype(np.float32)
        comp = ((np.arange(n).reshape(h, w) % w) // 3).ravel().astype(np.int64)
        n_comp = int(comp.max()) + 1

        S, m, pa, pb, pw = pair_stats(
            jnp.asarray(f), jnp.ones(n, jnp.float32),
            jnp.asarray(comp, jnp.int32),
            jnp.asarray(src, jnp.int32), jnp.asarray(tgt, jnp.int32),
            jnp.asarray(ew), n_comp,
        )
        # host oracle reduction (the exact code path of merge_regions)
        S_h = np.zeros((n_comp, 3))
        np.add.at(S_h, comp, f.astype(np.float64))
        m_h = np.zeros(n_comp)
        np.add.at(m_h, comp, 1.0)
        ca, cb = comp[src], comp[tgt]
        cross = ca != cb
        lo = np.minimum(ca[cross], cb[cross])
        hi = np.maximum(ca[cross], cb[cross])
        key, inv = np.unique(lo * n_comp + hi, return_inverse=True)
        pw_h = np.zeros(len(key))
        np.add.at(pw_h, inv, ew[cross].astype(np.float64))

        np.testing.assert_allclose(S, S_h, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(m, m_h, rtol=1e-6)
        assert len(pa) == len(key)
        np.testing.assert_array_equal(pa, key // n_comp)
        np.testing.assert_array_equal(pb, key % n_comp)
        np.testing.assert_allclose(pw, pw_h, rtol=1e-5)

    def test_merge_device_matches_merge_regions(self, rng):
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.cutpursuit import (
            _densify_first_occurrence, merge_regions,
        )
        from superpoint_graph_tpu.ops.merge_device import merge_regions_device

        h, w = 12, 18
        src, tgt = grid_graph(h, w)
        n = h * w
        ew = np.ones(len(src), np.float32)
        f = rng.randn(n, 3).astype(np.float32) * 0.05
        frag = ((np.arange(n).reshape(h, w) % w) // 2).ravel().astype(np.int64)
        reg = 0.5

        host = merge_regions(f, np.ones(n), frag, src, tgt, ew, reg)
        label = merge_regions_device(
            jnp.asarray(f), jnp.ones(n, jnp.float32),
            jnp.asarray(frag, jnp.int32),
            jnp.asarray(src, jnp.int32), jnp.asarray(tgt, jnp.int32),
            jnp.asarray(ew), int(frag.max()) + 1, reg,
        )
        dev = _densify_first_occurrence(label[frag])
        np.testing.assert_array_equal(dev, host)

    def test_padded_edges_invariant(self, rng):
        """Zero-weight padding edges must not change the result."""
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.merge_device import pair_stats

        h, w = 6, 9
        src, tgt = grid_graph(h, w)
        n = h * w
        ew = rng.rand(len(src)).astype(np.float32) + 0.1
        f = rng.randn(n, 2).astype(np.float32)
        comp = (np.arange(n) % 5).astype(np.int64)

        args = lambda s, t, e: (
            jnp.asarray(f), jnp.ones(n, jnp.float32),
            jnp.asarray(comp, jnp.int32),
            jnp.asarray(s, jnp.int32), jnp.asarray(t, jnp.int32),
            jnp.asarray(e, jnp.float32), 5,
        )
        base = pair_stats(*args(src, tgt, ew))
        pad = 37
        s2 = np.concatenate([src, np.zeros(pad, np.int64)])
        t2 = np.concatenate([tgt, np.full(pad, n - 1, np.int64)])
        e2 = np.concatenate([ew, np.zeros(pad, np.float32)])
        padded = pair_stats(*args(s2, t2, e2))
        for a, b in zip(base, padded):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestGreedyMatchingAndDensify:
    """Round-3 host-speed paths: C++ greedy matching == python fallback;
    O(n) dense densify == np.unique oracle."""

    def test_native_matching_matches_python(self):
        from superpoint_graph_tpu import native
        from superpoint_graph_tpu.ops.cutpursuit import _greedy_matching

        if not native.available():
            import pytest

            pytest.skip("native lib unavailable")
        rs = np.random.RandomState(3)
        for trial in range(5):
            n_comp = rs.randint(10, 400)
            p = rs.randint(1, 800)
            a = rs.randint(0, n_comp, p).astype(np.int64)
            b = (a + 1 + rs.randint(0, max(n_comp - 1, 1), p)) % n_comp
            keep = a != b
            a, b = a[keep], b[keep]
            used = np.zeros(n_comp, bool)
            ref = np.zeros(len(a), bool)
            for i, (x, y) in enumerate(zip(a, b)):
                if used[x] or used[y]:
                    continue
                used[x] = used[y] = True
                ref[i] = True
            got = native.greedy_matching(a, b, n_comp)
            np.testing.assert_array_equal(got, ref)
            # module-level entry must agree too
            np.testing.assert_array_equal(_greedy_matching(a, b, n_comp), ref)

    def test_densify_dense_vs_unique(self):
        from superpoint_graph_tpu.ops.cutpursuit import (
            _densify_first_occurrence,
        )

        rs = np.random.RandomState(4)
        for n, hi in [(1, 1), (50, 3), (4000, 4000), (20000, 17)]:
            lab = rs.randint(0, hi, n)
            u, fp, inv = np.unique(
                lab, return_index=True, return_inverse=True
            )
            ref = np.argsort(np.argsort(fp))[inv].astype(np.int32)
            np.testing.assert_array_equal(
                _densify_first_occurrence(lab), ref
            )


class TestPairStatsCompactPath:
    def test_compact_path_matches_plain(self, rng):
        """pair_stats' cross-edge compaction (the >= COMPACT_THRESHOLD heal
        path) must reproduce the plain full-sort reduction exactly,
        including the spill-retry when the initial cap is too small."""
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops import merge_device as md

        h, w = 16, 24
        src, tgt = grid_graph(h, w)
        n = h * w
        ew = rng.rand(len(src)).astype(np.float32) + 0.1
        f = rng.randn(n, 3).astype(np.float32)
        # fine-grained comps -> MOST edges are cross-region, so the initial
        # cap (e // 8) always spills and the retry path runs too
        comp = (np.arange(n) % 97).astype(np.int64)
        n_comp = int(comp.max()) + 1
        args = (
            jnp.asarray(f), jnp.ones(n, jnp.float32),
            jnp.asarray(comp, jnp.int32),
            jnp.asarray(src, jnp.int32), jnp.asarray(tgt, jnp.int32),
            jnp.asarray(ew), n_comp,
        )
        plain = md.pair_stats(*args)
        old = md.COMPACT_THRESHOLD
        md.COMPACT_THRESHOLD = 1
        try:
            compact = md.pair_stats(*args)
        finally:
            md.COMPACT_THRESHOLD = old
        for a, b in zip(plain, compact):
            np.testing.assert_allclose(a, b, rtol=1e-6)

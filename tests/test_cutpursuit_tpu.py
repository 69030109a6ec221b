"""The TPU cut-pursuit must statistically match the host-exact oracle."""
import numpy as np

from superpoint_graph_tpu.ops import cutpursuit as cp_host
from superpoint_graph_tpu.ops import cutpursuit_jax as cp_tpu
from superpoint_graph_tpu.ops.cutpursuit_band import cutpursuit_band, morton_order
from tests.test_cutpursuit import grid_graph, partition_energy


class TestCutPursuitTPU:
    def test_two_clusters_recovered(self, rng):
        h, w = 8, 12
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        f = np.zeros((h * w, 2), np.float32)
        gt = (np.arange(h * w).reshape(h, w) % w >= w // 2).ravel()
        f[gt] = [1.0, 0.5]
        f += rng.randn(h * w, 2).astype(np.float32) * 0.02
        comps, in_comp = cp_tpu.cutpursuit_tpu(f, src, tgt, ew, reg_strength=0.1)
        assert len(comps) == 2
        side = in_comp == in_comp[np.flatnonzero(gt)[0]]
        assert np.array_equal(side, gt)

    def test_huge_reg_single_component(self, rng):
        src, tgt = grid_graph(6, 6)
        f = rng.randn(36, 3).astype(np.float32)
        comps, _ = cp_tpu.cutpursuit_tpu(f, src, tgt, np.ones(len(src)), 1e6)
        assert len(comps) == 1

    def test_energy_close_to_exact(self, rng):
        """Parallel-ICM splits must land within 10% of the max-flow oracle's
        energy on random piecewise fields (statistical validation per
        SURVEY.md 7.2 milestone B)."""
        h, w = 10, 10
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        ratios = []
        for trial in range(5):
            r = np.random.RandomState(trial)
            f = r.rand(h * w, 4).astype(np.float32)
            # plant 3 vertical bands
            band = ((np.arange(h * w).reshape(h, w) % w) // (w // 3 + 1)).ravel()
            f += np.stack([band == i for i in range(4)], 1).astype(np.float32) * 1.5
            reg = 0.3
            _, ic_host = cp_host.cutpursuit(f, src, tgt, ew, reg)
            _, ic_tpu = cp_tpu.cutpursuit_tpu(f, src, tgt, ew, reg)
            e_host = partition_energy(f, ic_host, src, tgt, ew, reg)
            e_tpu = partition_energy(f, ic_tpu, src, tgt, ew, reg)
            ratios.append(e_tpu / max(e_host, 1e-9))
        assert np.mean(ratios) < 1.10, ratios

    def test_weight_decay_honored(self, rng):
        """weight_decay gates the alternation count per outer iteration (host
        schedule: steps = round(flow_steps*wd^it+.5)). wd=1.0 must equal the
        ungated solver; a strongly decayed run still yields a valid partition
        with energy in the oracle's ballpark."""
        h, w = 10, 10
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        f = rng.rand(h * w, 3).astype(np.float32)
        band = ((np.arange(h * w).reshape(h, w) % w) // 4).ravel()
        f += np.stack([band == i for i in range(3)], 1).astype(np.float32) * 2.0
        reg = 0.3
        _, ic_full = cp_tpu.cutpursuit_tpu(
            f, src, tgt, ew, reg, weight_decay=1.0, flow_steps=3)
        _, ic_decay = cp_tpu.cutpursuit_tpu(
            f, src, tgt, ew, reg, weight_decay=0.3, flow_steps=3)
        e_full = partition_energy(f, ic_full, src, tgt, ew, reg)
        e_decay = partition_energy(f, ic_decay, src, tgt, ew, reg)
        e_single = partition_energy(
            f, np.zeros(h * w, np.int64), src, tgt, ew, reg)
        assert e_decay < e_single  # still a useful partition
        assert e_decay < e_full * 1.5

    def test_cutoff(self, rng):
        src, tgt = grid_graph(6, 6)
        f = rng.randn(36, 2).astype(np.float32) * 0.01
        f[0] += 100.0
        _, in_comp = cp_tpu.cutpursuit_tpu(f, src, tgt, np.ones(len(src)), 0.05, cutoff=3)
        assert np.bincount(in_comp).min() >= 3


class TestCutPursuitBand:
    """Block-banded solver (the large-cloud fast path): must match the
    oracle's energy class on small graphs regardless of band placement."""

    def test_two_clusters_recovered(self, rng):
        h, w = 8, 12
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        f = np.zeros((h * w, 2), np.float32)
        gt = (np.arange(h * w).reshape(h, w) % w >= w // 2).ravel()
        f[gt] = [1.0, 0.5]
        f += rng.randn(h * w, 2).astype(np.float32) * 0.02
        comps, in_comp = cutpursuit_band(f, src, tgt, ew, reg_strength=0.1)
        assert len(comps) == 2
        side = in_comp == in_comp[np.flatnonzero(gt)[0]]
        assert np.array_equal(side, gt)

    def test_energy_close_to_exact(self, rng):
        h, w = 10, 10
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        ratios = []
        for trial in range(3):
            r = np.random.RandomState(trial)
            f = r.rand(h * w, 4).astype(np.float32)
            band = ((np.arange(h * w).reshape(h, w) % w) // (w // 3 + 1)).ravel()
            f += np.stack([band == i for i in range(4)], 1).astype(np.float32) * 1.5
            _, ic_h = cp_host.cutpursuit(f, src, tgt, ew, 0.3)
            _, ic_b = cutpursuit_band(f, src, tgt, ew, 0.3)
            e_h = partition_energy(f, ic_h, src, tgt, ew, 0.3)
            e_b = partition_energy(f, ic_b, src, tgt, ew, 0.3)
            ratios.append(e_b / max(e_h, 1e-9))
        assert np.mean(ratios) < 1.10, ratios

    def test_overflow_edges_exact(self, rng):
        """Edges far outside the band (long-range connections) must still be
        honored: connect two distant identical clusters with heavy edges —
        CC and the cut cost must see them through the overflow path."""
        n = 1200  # > 2 blocks after padding so cross-block edges overflow
        f = np.zeros((n, 2), np.float32)
        # chain graph along indices + heavy long-range ties between ends
        src = np.arange(n - 1)
        tgt = np.arange(1, n)
        lsrc = np.zeros(8, np.int64)
        ltgt = np.full(8, n - 1, np.int64)
        src = np.concatenate([src, lsrc])
        tgt = np.concatenate([tgt, ltgt])
        ew = np.ones(len(src))
        # all features identical -> single region expected; the long edges
        # only matter if the overflow path is wired (they cross > WIN here
        # only when n is large; with padding n_pad=1024*? keep modest check)
        comps, in_comp = cutpursuit_band(f, src, tgt, ew, reg_strength=0.5)
        assert len(comps) == 1

    def test_morton_order_is_permutation(self, rng):
        xyz = rng.rand(500, 3).astype(np.float32)
        p = morton_order(xyz)
        assert np.array_equal(np.sort(p), np.arange(500))
        # locality: mean index distance of 1-NN pairs shrinks vs random order
        from scipy.spatial import cKDTree

        t = cKDTree(xyz)
        _, nn = t.query(xyz, k=2)
        inv = np.empty(500, np.int64)
        inv[p] = np.arange(500)
        d_sorted = np.abs(inv[nn[:, 1]] - inv[np.arange(500)]).mean()
        d_orig = np.abs(nn[:, 1] - np.arange(500)).mean()
        assert d_sorted < d_orig

    def test_weight_decay_and_cutoff(self, rng):
        src, tgt = grid_graph(6, 6)
        f = rng.randn(36, 2).astype(np.float32) * 0.01
        f[0] += 100.0
        _, in_comp = cutpursuit_band(
            f, src, tgt, np.ones(len(src)), 0.05, cutoff=3, weight_decay=0.7
        )
        assert np.bincount(in_comp).min() >= 3


class TestOverflowDedup:
    def test_dedup_of_device_matches_numpy(self):
        """_dedup_of (device 2-key sort + run compaction) vs a numpy oracle:
        unique directed pairs with summed weights, padding inert."""
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.cutpursuit_band import _dedup_of

        rng = np.random.RandomState(0)
        cap = 256
        n_real = 200
        src = rng.randint(0, 40, n_real).astype(np.int32)
        tgt = rng.randint(0, 40, n_real).astype(np.int32)
        w = rng.rand(n_real).astype(np.float32) + 0.1
        src_p = np.zeros(cap, np.int32)
        tgt_p = np.zeros(cap, np.int32)
        w_p = np.zeros(cap, np.float32)
        src_p[:n_real], tgt_p[:n_real], w_p[:n_real] = src, tgt, w
        s2, t2, w2, nu = _dedup_of(
            jnp.asarray(src_p), jnp.asarray(tgt_p), jnp.asarray(w_p), cap
        )
        s2, t2, w2, nu = map(np.asarray, (s2, t2, w2, nu))
        # oracle: sum weights per unique (src, tgt), plus the inert (0, 0)
        # padding run
        key = src.astype(np.int64) * 1000 + tgt
        uniq, inverse = np.unique(key, return_inverse=True)
        w_ref = np.zeros(len(uniq), np.float64)
        np.add.at(w_ref, inverse, w)
        got = {}
        for i in range(int(nu)):
            got[(int(s2[i]), int(t2[i]))] = float(w2[i])
        for u, wv in zip(uniq, w_ref):
            assert np.isclose(got[(int(u // 1000), int(u % 1000))], wv,
                              rtol=1e-5), (u, wv)
        # every entry past the unique count carries zero weight
        assert np.all(w2[int(nu):] == 0.0)
        # sorted-of contract: the whole list (BIG-sentinel tail included) is
        # ascending by src — _solve_band passes indices_are_sorted=True
        assert np.all(np.diff(s2.astype(np.int64)) >= 0)

    def test_band_solver_invariant_to_duplicate_edges(self, rng):
        """Feeding the same undirected edge twice (mutual-kNN shape) must
        give the same partition as feeding it once with doubled weight —
        the dedup path sums duplicates exactly like the band scatter."""
        h, w = 10, 14
        src, tgt = grid_graph(h, w)
        f = np.zeros((h * w, 2), np.float32)
        f[:, 0] = (np.arange(h * w) % w >= w // 2).astype(np.float32)
        f += 0.05 * rng.randn(h * w, 2).astype(np.float32)
        ew = np.ones(len(src), np.float32)
        # duplicate every edge (the symmetrization inside the solver then
        # sees each direction twice)
        src2 = np.concatenate([src, src])
        tgt2 = np.concatenate([tgt, tgt])
        ew2 = np.concatenate([ew * 0.5, ew * 0.5])
        _, ic_a = cutpursuit_band(f, src, tgt, ew, 0.3)
        _, ic_b = cutpursuit_band(f, src2, tgt2, ew2, 0.3)
        e_a = partition_energy(f, ic_a, src, tgt, ew, 0.3)
        e_b = partition_energy(f, ic_b, src, tgt, ew, 0.3)
        assert abs(e_a - e_b) <= 1e-3 * max(abs(e_a), 1.0)


class TestRegionAccept:
    """Per-region split accept (accept='region') — the chunked giant-path
    default (pipeline_big). Oracle checks for the separable per-region
    energy-delta tracking in ops/cutpursuit_band._solve_band (the running
    energy is energy0 + sum of accepted per-region deltas; a sign or
    attribution bug there would silently degrade partitions)."""

    def _solve(self, f, src, tgt, ew, reg, accept, **kw):
        from superpoint_graph_tpu.ops.cutpursuit_band import LAST_SOLVE_STATS

        _, ic = cutpursuit_band(
            f, src, tgt, ew, reg, merge=False, accept=accept, **kw
        )
        return ic, LAST_SOLVE_STATS["energy"]

    def test_tracked_energy_matches_recomputed(self):
        """The tracked running energy (energy0 + accepted deltas) must equal
        the final partition's true l0 energy recomputed from scratch (the
        band is bf16, so a small quantization tolerance applies)."""
        h, w = 16, 16
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src), np.float32)
        for trial in range(4):
            r = np.random.RandomState(trial)
            f = r.rand(h * w, 3).astype(np.float32)
            band = ((np.arange(h * w).reshape(h, w) % w) // 5).ravel()
            f += np.stack([band == i for i in range(3)], 1).astype(
                np.float32
            ) * 1.2
            ic, e_tracked = self._solve(f, src, tgt, ew, 0.2, "region")
            e_true = partition_energy(f, ic, src, tgt, ew, 0.2)
            assert abs(e_tracked - e_true) <= 0.02 * max(e_true, 1e-9) + 1e-4, (
                trial, e_tracked, e_true,
            )

    def test_region_not_worse_than_global(self):
        """Global accept rejects a whole outer iteration whenever ANY region's
        ICM split worsened energy (and then ends the loop); region accept
        keeps the good regions' splits. Across random piecewise fields the
        region-accept final energy must never be materially worse, and must
        win on average."""
        h, w = 14, 14
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src), np.float32)
        ratios = []
        for trial in range(6):
            r = np.random.RandomState(100 + trial)
            f = r.rand(h * w, 4).astype(np.float32)
            band = ((np.arange(h * w).reshape(h, w) % w) // 4).ravel()
            f += np.stack([band == i for i in range(4)], 1).astype(
                np.float32
            ) * 1.5
            ic_r, _ = self._solve(f, src, tgt, ew, 0.3, "region", max_iter=16)
            ic_g, _ = self._solve(f, src, tgt, ew, 0.3, "global")
            e_r = partition_energy(f, ic_r, src, tgt, ew, 0.3)
            e_g = partition_energy(f, ic_g, src, tgt, ew, 0.3)
            ratios.append(e_r / max(e_g, 1e-9))
        assert max(ratios) < 1.05, ratios
        assert np.mean(ratios) <= 1.0 + 1e-6, ratios

    def test_two_clusters_recovered(self, rng):
        h, w = 8, 12
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        f = np.zeros((h * w, 2), np.float32)
        gt = (np.arange(h * w).reshape(h, w) % w >= w // 2).ravel()
        f[gt] = [1.0, 0.5]
        f += rng.randn(h * w, 2).astype(np.float32) * 0.02
        comps, in_comp = cutpursuit_band(
            f, src, tgt, ew, reg_strength=0.1, accept="region", max_iter=16
        )
        assert len(comps) == 2
        side = in_comp == in_comp[np.flatnonzero(gt)[0]]
        assert np.array_equal(side, gt)

    def test_stop_tol_zero_matches_default(self):
        """stop_tol=0 must reproduce the 'any region accepted' continuation
        exactly (every accepted region's delta is < 0, so the summed drop is
        < 0 iff any region accepted): identical labels and energy."""
        h, w = 12, 12
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src), np.float32)
        r = np.random.RandomState(7)
        f = r.rand(h * w, 3).astype(np.float32)
        band = ((np.arange(h * w).reshape(h, w) % w) // 4).ravel()
        f += np.stack([band == i for i in range(3)], 1).astype(np.float32)
        ic_a, e_a = self._solve(f, src, tgt, ew, 0.25, "region", max_iter=16)
        ic_b, e_b = self._solve(
            f, src, tgt, ew, 0.25, "region", max_iter=16, stop_tol=0.0
        )
        assert np.array_equal(ic_a, ic_b)
        assert e_a == e_b

    def test_stop_tol_keeps_energy_class(self):
        """The chunked-path default stop_tol=1e-4 may stop a few iterations
        early but must not materially change the final energy (at 656k
        voxels iterations past ~5 moved energy by ~4e-6/iter —
        tools/atscale_knobs_results.json), and the tracked energy must stay
        consistent with the returned labels."""
        h, w = 14, 14
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src), np.float32)
        for trial in range(3):
            r = np.random.RandomState(40 + trial)
            f = r.rand(h * w, 4).astype(np.float32)
            band = ((np.arange(h * w).reshape(h, w) % w) // 4).ravel()
            f += np.stack([band == i for i in range(4)], 1).astype(
                np.float32
            ) * 1.4
            ic_t, e_t = self._solve(
                f, src, tgt, ew, 0.3, "region", max_iter=16, stop_tol=1e-4
            )
            ic_0, e_0 = self._solve(
                f, src, tgt, ew, 0.3, "region", max_iter=16, stop_tol=0.0
            )
            e_true = partition_energy(f, ic_t, src, tgt, ew, 0.3)
            assert abs(e_t - e_true) <= 0.02 * max(e_true, 1e-9) + 1e-4
            # early stop may only leave microscopic improvements on the table
            assert e_t <= e_0 * (1.0 + 5e-3) + 1e-6, (trial, e_t, e_0)

    def test_energy_close_to_exact(self):
        """Region accept must stay within the max-flow oracle's energy class
        (same statistical bound as the global-accept solver)."""
        h, w = 10, 10
        src, tgt = grid_graph(h, w)
        ew = np.ones(len(src))
        ratios = []
        for trial in range(3):
            r = np.random.RandomState(trial)
            f = r.rand(h * w, 4).astype(np.float32)
            band = ((np.arange(h * w).reshape(h, w) % w) // (w // 3 + 1)).ravel()
            f += np.stack([band == i for i in range(4)], 1).astype(
                np.float32
            ) * 1.5
            _, ic_h = cp_host.cutpursuit(f, src, tgt, ew, 0.3)
            _, ic_b = cutpursuit_band(
                f, src, tgt, ew, 0.3, accept="region", max_iter=16
            )
            e_h = partition_energy(f, ic_h, src, tgt, ew, 0.3)
            e_b = partition_energy(f, ic_b, src, tgt, ew, 0.3)
            ratios.append(e_b / max(e_h, 1e-9))
        assert np.mean(ratios) < 1.10, ratios

    def test_padding_invariance(self):
        """The per-region accept's segment reductions run over PADDED arrays
        (pad nodes carry nw=0 and share label 0 with real nodes): solving the
        same real graph at two pad sizes must give identical real labels."""
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.cutpursuit_band import (
            B, _build_band, _solve_band, split_band_edges,
        )

        r = np.random.RandomState(3)
        n = 700
        f = r.rand(n, 3).astype(np.float32)
        f[: n // 2] += 1.0
        src = np.arange(n - 1, dtype=np.int64)
        tgt = np.arange(1, n, dtype=np.int64)
        w = np.ones(n - 1, np.float32)
        labels = []
        for n_pad in (max(B, 1024), max(2 * B, 2048)):
            f_p = np.zeros((n_pad, 3), np.float32)
            f_p[:n] = f
            nw = np.zeros(n_pad, np.float32)
            nw[:n] = 1.0
            ds = np.concatenate([src, tgt]).astype(np.int32)
            dt = np.concatenate([tgt, src]).astype(np.int32)
            dw = np.concatenate([w, w])
            flat, fw, os_, ot_, ow_ = split_band_edges(n_pad, ds, dt, dw)
            from superpoint_graph_tpu.ops import cutpursuit_band as cb
            from superpoint_graph_tpu.ops.cutpursuit_band import (
                BIG, dedup_of_host,
            )

            row = (flat // cb.WIN).astype(np.int32)
            col = (flat % cb.WIN).astype(np.int32)
            band = _build_band(
                n_pad, jnp.asarray(row), jnp.asarray(col), jnp.asarray(fw)
            )
            # _solve_band's sorted-of contract: ascending src, BIG-id tail
            os_, ot_, ow_ = dedup_of_host(os_, ot_, ow_, n_pad)
            e_of = max(16, len(os_))
            osp = np.full(e_of, int(BIG), np.int32)
            otp = np.full(e_of, int(BIG), np.int32)
            owp = np.zeros(e_of, np.float32)
            osp[: len(os_)], otp[: len(ot_)], owp[: len(ow_)] = os_, ot_, ow_
            comp, _, _, _ = _solve_band(
                jnp.asarray(f_p), band, jnp.asarray(osp), jnp.asarray(otp),
                jnp.asarray(owp), jnp.asarray(nw), jnp.float32(0.2),
                accept="region", max_iter=16,
            )
            lab = np.asarray(comp)[:n]
            # canonical first-occurrence renumbering
            _, first, inv = np.unique(lab, return_index=True, return_inverse=True)
            labels.append(np.argsort(np.argsort(first))[inv])
        np.testing.assert_array_equal(labels[0], labels[1])

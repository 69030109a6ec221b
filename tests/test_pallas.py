"""Pallas kernel + banded-sweep tests (interpret/CPU on the test mesh)."""
import numpy as np

from superpoint_graph_tpu.ops.nn1_pallas import nn1


class TestNN1Pallas:
    def test_exact_vs_sklearn(self, rng):
        from sklearn.neighbors import NearestNeighbors

        db = rng.rand(700, 3).astype(np.float32)
        q = rng.rand(900, 3).astype(np.float32)
        idx = nn1(db, q, block_q=128, tile=256)
        ref = NearestNeighbors(n_neighbors=1).fit(db).kneighbors(q)[1][:, 0]
        # ties can differ; distances must match exactly
        d_got = ((q - db[idx]) ** 2).sum(1)
        d_ref = ((q - db[ref]) ** 2).sum(1)
        np.testing.assert_allclose(d_got, d_ref, rtol=1e-4, atol=1e-6)
        assert (idx == ref).mean() > 0.99

    def test_padding_sizes(self, rng):
        db = rng.rand(300, 3).astype(np.float32)  # not a tile multiple
        q = rng.rand(77, 3).astype(np.float32)    # not a block multiple
        idx = nn1(db, q, block_q=128, tile=256)
        assert idx.shape == (77,)
        assert idx.max() < 300

    def test_empty(self):
        assert nn1(np.zeros((0, 3)), np.zeros((5, 3))).shape == (0,)


def _random_band(rng, n, weighted=True):
    """Random symmetric banded graph: [NB, B, WIN] bf16 weights + the edge
    list it encodes (for oracles). Uses the production geometry: edge (i, j)
    is in-band iff BOTH directions land in their source's window
    [p*B - PAD, p*B + B + PAD)."""
    import jax.numpy as jnp

    from superpoint_graph_tpu.ops.cutpursuit_band import B, PAD, WIN

    nb = n // B
    band = np.zeros((nb, B, WIN), np.float32)
    edges = []
    for _ in range(3 * n):
        i = rng.randint(n)
        j = i + rng.randint(-PAD + 1, PAD)
        if 0 <= j < n and j != i:
            w = rng.rand() + 0.5 if weighted else 1.0
            ok = True
            for a, bb in ((i, j), (j, i)):
                p, r = divmod(a, B)
                c = bb - p * B + PAD
                if not (0 <= c < WIN):
                    ok = False
            if not ok:
                continue
            for a, bb in ((i, j), (j, i)):
                p, r = divmod(a, B)
                c = bb - p * B + PAD
                band[p, r, c] = w
            edges.append((i, j))
    return jnp.asarray(band, jnp.bfloat16), edges


class TestBandWindows:
    def test_matches_direct_index(self, rng):
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.cutpursuit_band import (
            B, PAD, WIN, band_windows,
        )

        n = 3 * B
        v = rng.randint(0, 1000, n).astype(np.int32)
        w = np.asarray(band_windows(jnp.asarray(v), jnp.int32(-7)))
        assert w.shape == (n // B, WIN)
        for q in [0, 1, 2]:
            for c in [0, 1, PAD - 1, PAD, WIN // 2, WIN - 1]:
                j = q * B - PAD + c
                want = v[j] if 0 <= j < n else -7
                assert w[q, c] == want, (q, c)


class TestCcSweepsKey:
    """The fused same-key CC sweep (cc_band_sweeps_key) vs the materialized
    same_band form (cc_band_sweeps): identical per-sweep results."""

    def test_matches_same_band_form(self, rng):
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.cutpursuit_band import (
            B, band_windows, cc_band_sweeps, cc_band_sweeps_key,
        )

        n = 4 * B
        nb = n // B
        band, _ = _random_band(rng, n)
        adj = band > jnp.bfloat16(0.0)
        key = jnp.asarray(rng.randint(0, 3, n).astype(np.int32))
        keyw = band_windows(key, jnp.int32(-1))
        key2 = key.reshape(nb, B)[:, :, None]
        same = np.asarray(adj) & (
            np.asarray(keyw)[:, None, :] == np.asarray(key2)
        )
        lab0 = jnp.arange(n, dtype=jnp.int32)
        for sweeps in (1, 4):
            a = cc_band_sweeps(lab0, jnp.asarray(same), sweeps)
            b = cc_band_sweeps_key(lab0, adj, keyw, key2, sweeps)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fixed_point_is_components(self, rng):
        """Iterated sweeps converge to the connected components of the
        same-key in-band graph (scipy oracle)."""
        import jax.numpy as jnp
        import scipy.sparse as sp
        import scipy.sparse.csgraph as csg

        from superpoint_graph_tpu.ops.cutpursuit_band import (
            B, band_windows, cc_band_sweeps_key,
        )

        n = 2 * B
        nb = n // B
        band, edges = _random_band(rng, n)
        adj = band > jnp.bfloat16(0.0)
        key = jnp.asarray(rng.randint(0, 2, n).astype(np.int32))
        keyn = np.asarray(key)
        keyw = band_windows(key, jnp.int32(-1))
        key2 = key.reshape(nb, B)[:, :, None]
        lab = jnp.arange(n, dtype=jnp.int32)
        for _ in range(60):
            lab = cc_band_sweeps_key(lab, adj, keyw, key2, 4)
        got = np.asarray(lab)

        es = [(i, j) for i, j in edges if keyn[i] == keyn[j]]
        rows = [i for i, _ in es] + [j for _, j in es]
        cols = [j for _, j in es] + [i for i, _ in es]
        g = sp.coo_matrix(
            (np.ones(len(rows)), (rows, cols)), shape=(n, n)
        )
        _, comp = csg.connected_components(g, directed=False)
        # same partition: the min label within each oracle component, and
        # labels must be constant per component
        for c in np.unique(comp):
            m = comp == c
            assert len(np.unique(got[m])) == 1
        # distinct components keep distinct labels
        lab_of = {c: got[comp == c][0] for c in np.unique(comp)}
        assert len(set(lab_of.values())) == len(lab_of)

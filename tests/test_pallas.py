"""Pallas kernel tests (interpret mode on the CPU test mesh)."""
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
    list it encodes (for oracles)."""
    import jax.numpy as jnp

    from superpoint_graph_tpu.ops.cutpursuit_band import B, HALO, WIN

    nb = n // B
    band = np.zeros((nb, B, WIN), np.float32)
    edges = []
    for _ in range(3 * n):
        i = rng.randint(n)
        j = i + rng.randint(-HALO * B + 1, HALO * B)
        if 0 <= j < n and j != i:
            w = rng.rand() + 0.5 if weighted else 1.0
            ok = True
            for a, bb in ((i, j), (j, i)):
                p, r = divmod(a, B)
                c = bb - (p - HALO) * B
                if not (0 <= c < WIN):
                    ok = False
            if not ok:
                continue
            for a, bb in ((i, j), (j, i)):
                p, r = divmod(a, B)
                c = bb - (p - HALO) * B
                band[p, r, c] = w
            edges.append((i, j))
    return jnp.asarray(band, jnp.bfloat16), edges


class TestCcSweepsPallas:
    """Gauss-Seidel banded CC sweeps (ops/band_pallas.py, interpret mode)."""

    def test_same_fixed_point_as_jacobi(self, rng):
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.band_pallas import (
            band_adjacency_i8, cc_sweeps_pallas,
        )
        from superpoint_graph_tpu.ops.cutpursuit_band import B, cc_band_sweeps

        n = 4 * B
        band, _ = _random_band(rng, n)
        same = np.asarray(band, np.float32) > 0.0
        key = jnp.asarray((rng.rand(n) < 0.5).astype(np.int32))
        # restrict the Jacobi mask to same-key pairs for the oracle
        from superpoint_graph_tpu.ops.cutpursuit_band import (
            HALO, WIN, band_windows,
        )

        keyw = np.asarray(band_windows(key, jnp.int32(-1)))
        same_j = jnp.asarray(
            same
            & (keyw[:, None, :] == np.asarray(key).reshape(-1, B)[
                np.arange(n // B)][:, :, None])
        )
        lab0 = jnp.arange(n, dtype=jnp.int32)
        lab_j = lab0
        for _ in range(40):
            lab_j = cc_band_sweeps(lab_j, same_j, 4)
        lab_g = lab0
        for _ in range(10):
            adj8 = band_adjacency_i8(band)
            lab_g = cc_sweeps_pallas(lab_g, adj8, key, 2, interpret=True)
        np.testing.assert_array_equal(np.asarray(lab_j), np.asarray(lab_g))

    def test_gs_dominates_jacobi(self, rng):
        """After equal sweep counts GS labels are pointwise <= Jacobi's
        (GS uses fresher values; both are monotone min-propagations)."""
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.band_pallas import (
            band_adjacency_i8, cc_sweeps_pallas,
        )
        from superpoint_graph_tpu.ops.cutpursuit_band import B, cc_band_sweeps

        n = 4 * B
        band, _ = _random_band(rng, n)
        same = jnp.asarray(np.asarray(band, np.float32) > 0.0)
        key = jnp.zeros(n, jnp.int32)
        lab0 = jnp.arange(n, dtype=jnp.int32)
        g = cc_sweeps_pallas(lab0, band_adjacency_i8(band), key, 2,
                             interpret=True)
        j = cc_band_sweeps(lab0, same, 2)
        assert (np.asarray(g) <= np.asarray(j)).all()
        assert (np.asarray(g) < np.asarray(j)).any()


class TestIcmFieldPallas:
    def test_matches_dense_oracle(self, rng):
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.band_pallas import icm_field_pallas
        from superpoint_graph_tpu.ops.cutpursuit_band import B

        n = 2 * B
        band, _ = _random_band(rng, n)
        comp = jnp.asarray(rng.randint(0, 5, n).astype(np.int32))
        b = rng.rand(n) < 0.5
        spin = jnp.asarray((1.0 - 2.0 * b).astype(np.float32)).astype(
            jnp.bfloat16
        )
        got = np.asarray(icm_field_pallas(band, comp, spin, interpret=True))

        # vectorized numpy oracle from the band itself
        from superpoint_graph_tpu.ops.cutpursuit_band import HALO, WIN

        bandf = np.asarray(band, np.float32)          # [nb, B, WIN]
        compn = np.asarray(comp)
        spinn = np.asarray(spin, np.float32)
        nb = n // B
        jcol = (
            (np.arange(nb)[:, None, None] - HALO) * B
            + np.arange(WIN)[None, None, :]
        )                                             # [nb, 1, WIN]
        jcol = np.broadcast_to(jcol, (nb, B, WIN))
        valid = (jcol >= 0) & (jcol < n)
        jc = np.clip(jcol, 0, n - 1)
        same = compn[jc] == compn.reshape(nb, B)[:, :, None]
        contrib = np.where(
            valid & same & (bandf > 0), bandf * spinn[jc], 0.0
        )
        want = contrib.sum(axis=2).reshape(-1)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)

    def test_solver_pallas_matches_xla(self, rng):
        """_solve_band with use_pallas=True (interpret) must reach the same
        partition as the XLA form on a structured cloud."""
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.cutpursuit_band import cutpursuit_band

        n = 900
        xyz = rng.rand(n, 3).astype(np.float32)
        xyz[: n // 2, 2] *= 0.05
        f = np.concatenate([xyz, (xyz[:, :1] > 0.5).astype(np.float32)], 1)
        d2 = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        idx = np.argsort(d2, 1)[:, :5]
        src = np.repeat(np.arange(n), 5)
        tgt = idx.reshape(-1)
        d = np.sqrt(d2[src, tgt])
        w = (1.0 / (1.0 + d / d.mean())).astype(np.float32)

        _, ic_x = cutpursuit_band(
            f, src, tgt, w, 0.03, xyz=xyz, use_pallas=False
        )
        _, ic_p = cutpursuit_band(
            f, src, tgt, w, 0.03, xyz=xyz, use_pallas=True
        )
        # same fixed point: identical partitions (label ids both densified
        # in first-occurrence order)
        np.testing.assert_array_equal(ic_x, ic_p)

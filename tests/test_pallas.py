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


class TestCcGaussSeidel:
    """Gauss-Seidel banded CC sweeps (ops/cc_pallas.py, interpret mode)."""

    def _random_band(self, rng, n):
        from superpoint_graph_tpu.ops.cutpursuit_band import B, HALO, WIN

        nb = n // B
        same = np.zeros((nb, B, WIN), bool)
        for _ in range(3 * n):
            i = rng.randint(n)
            j = i + rng.randint(-HALO * B + 1, HALO * B)
            if 0 <= j < n and j != i:
                p, b = divmod(i, B)
                c = j - (p - HALO) * B
                if 0 <= c < WIN:
                    same[p, b, c] = True
                p, b = divmod(j, B)
                c = i - (p - HALO) * B
                if 0 <= c < WIN:
                    same[p, b, c] = True
        return same

    def test_same_fixed_point_as_jacobi(self, rng):
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.cc_pallas import (
            _pair_mask, cc_band_sweeps_gs,
        )
        from superpoint_graph_tpu.ops.cutpursuit_band import (
            B, cc_band_sweeps,
        )

        n = 4 * B
        same = jnp.asarray(self._random_band(rng, n))
        pm = _pair_mask(same)
        lab0 = jnp.arange(n, dtype=jnp.int32)
        lab_j = lab0
        for _ in range(40):
            lab_j = cc_band_sweeps(lab_j, same, 4)
        lab_g = lab0
        for _ in range(10):
            lab_g = cc_band_sweeps_gs(lab_g, pm, 2, interpret=True)
        np.testing.assert_array_equal(np.asarray(lab_j), np.asarray(lab_g))

    def test_gs_dominates_jacobi(self, rng):
        """After equal sweep counts GS labels are pointwise <= Jacobi's
        (GS uses fresher values; both are monotone min-propagations)."""
        import jax.numpy as jnp

        from superpoint_graph_tpu.ops.cc_pallas import (
            _pair_mask, cc_band_sweeps_gs,
        )
        from superpoint_graph_tpu.ops.cutpursuit_band import (
            B, cc_band_sweeps,
        )

        n = 4 * B
        same = jnp.asarray(self._random_band(rng, n))
        lab0 = jnp.arange(n, dtype=jnp.int32)
        g = cc_band_sweeps_gs(lab0, _pair_mask(same), 2, interpret=True)
        j = cc_band_sweeps(lab0, same, 2)
        assert (np.asarray(g) <= np.asarray(j)).all()
        assert (np.asarray(g) < np.asarray(j)).any()

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

"""Big-cloud kNN (sorted-cell contiguous-slice search) vs the exact solver.

The reference handles large clouds with a host KD-tree (graphs.py:26-73); the
TPU path must match its results. These tests verify exactness on surface
clouds, the fallback path on pathological geometry, and the
compute_graph_nn_2 wiring above the size threshold.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from superpoint_graph_tpu.data.synthetic import synthetic_room
from superpoint_graph_tpu.ops.knn import knn, knn_bigcloud


def _exact(xyz, k):
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def _set_agreement(a, b):
    return np.mean(
        [len(np.intersect1d(a[i], b[i])) / a.shape[1] for i in range(len(a))]
    )


def test_bigcloud_matches_exact_on_surface_cloud(rng):
    xyz, _, _, _ = synthetic_room(rng, n_points=5000)
    k = 8
    ei, ed = _exact(xyz, k)
    bi, bd, info = knn_bigcloud(xyz, k)
    bi, bd = np.asarray(bi), np.asarray(bd)
    assert _set_agreement(ei, bi) > 0.995
    np.testing.assert_allclose(
        np.sort(bd, 1), np.sort(ed, 1), rtol=1e-4, atol=1e-6
    )


def test_bigcloud_k45_interface_parity(rng):
    """The partition uses k_nn_geof=45; distances must be ascending and match
    the brute-force path's metric exactly on the agreed rows."""
    xyz, _, _, _ = synthetic_room(rng, n_points=4000)
    k = 45
    ri, rd = knn(jnp.asarray(xyz), k)
    bi, bd, _ = knn_bigcloud(xyz, k)
    bi, bd = np.asarray(bi), np.asarray(bd)
    assert _set_agreement(np.asarray(ri), bi) > 0.99
    assert np.all(np.diff(bd, axis=1) >= -1e-7)  # ascending


def test_bigcloud_fallback_on_sparse_outliers(rng):
    """Isolated far points violate r_k <= h and must be re-solved exactly."""
    xyz, _, _, _ = synthetic_room(rng, n_points=3000)
    outliers = rng.rand(20, 3).astype(np.float32) * 50.0 + 10.0
    xyz = np.concatenate([xyz, outliers]).astype(np.float32)
    k = 6
    ei, ed = _exact(xyz, k)
    bi, bd, info = knn_bigcloud(xyz, k)
    # the level-0 certificate must fail for the outliers, routing them to a
    # coarser level or the exact fallback
    assert info["levels"][0]["bad"] > 0
    bi = np.asarray(bi)
    # the outliers themselves (rows beyond 3000) must be exact
    assert _set_agreement(ei[3000:], bi[3000:]) == 1.0
    assert _set_agreement(ei, bi) > 0.995


def test_bigcloud_fallback_chunked_queries(rng, monkeypatch):
    """The straggler fallback dispatches BOUNDED query slices (one program
    over tens of thousands of stragglers x a >10M-row db tripped the
    tunneled TPU worker's watchdog — BASELINE.md r5). With the chunk size
    forced below the straggler count, the multi-slice loop must still be
    exact for every straggler."""
    import superpoint_graph_tpu.ops.knn as knn_mod

    xyz, _, _, _ = synthetic_room(rng, n_points=3000)
    outliers = rng.rand(40, 3).astype(np.float32) * 60.0 + 12.0
    xyz = np.concatenate([xyz, outliers]).astype(np.float32)
    k = 6
    monkeypatch.setattr(knn_mod, "FALLBACK_QUERY_CHUNK", 16)
    ei, ed = _exact(xyz, k)
    bi, bd, info = knn_bigcloud(xyz, k)
    assert info["n_fallback"] > 16  # the loop really ran >1 slice
    bi = np.asarray(bi)
    assert _set_agreement(ei[3000:], bi[3000:]) == 1.0


def test_bigcloud_duplicate_points(rng):
    """Zero-distance duplicates must not be matched to themselves."""
    base = rng.rand(500, 3).astype(np.float32)
    xyz = np.concatenate([base, base[:50]])
    bi, bd, _ = knn_bigcloud(xyz, 4)
    bi = np.asarray(bi)
    self_match = bi == np.arange(len(xyz))[:, None]
    assert not self_match.any()


def test_compute_graph_nn_2_bigcloud_threshold(rng):
    """Above the threshold compute_graph_nn_2 must route to the big-cloud
    path and produce the same contract (source/target/distances + geof table)
    as the brute-force path."""
    from superpoint_graph_tpu.ops.knn import compute_graph_nn_2

    xyz, _, _, _ = synthetic_room(rng, n_points=4000)
    g_ref, t_ref = compute_graph_nn_2(xyz, 5, 10, bigcloud_threshold=1 << 60)
    g_big, t_big = compute_graph_nn_2(xyz, 5, 10, bigcloud_threshold=100)
    assert g_big["source"].dtype == g_ref["source"].dtype
    assert g_big["target"].shape == g_ref["target"].shape
    agree = np.mean(
        np.sort(np.asarray(t_big), 1) == np.sort(np.asarray(t_ref), 1)
    )
    assert agree > 0.99
    np.testing.assert_allclose(
        np.sort(g_big["distances"]), np.sort(g_ref["distances"]),
        rtol=1e-4, atol=1e-6,
    )

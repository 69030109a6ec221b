"""Multi-host input pipeline: per-host file-list sharding + DCN-combined
edge scaler (process-count-aware, SURVEY.md §2.7)."""
import numpy as np

from superpoint_graph_tpu.data.spg_io import EdgeFeatScaler
from superpoint_graph_tpu.parallel.multihost import (
    global_edge_scaler,
    shard_files_by_process,
)


class TestShardFiles:
    def test_partition_covers_all_and_balances(self):
        files = [f"Area_{a}/room_{r}" for a in range(5) for r in range(7)]
        pc = 4
        shards = [shard_files_by_process(files, pi, pc) for pi in range(pc)]
        lengths = {len(s) for s in shards}
        assert lengths == {-(-len(files) // pc)}  # equal steps per epoch
        union = set()
        for s in shards:
            union.update(s)
        assert union == set(files)

    def test_single_process_identity(self):
        files = ["a", "b", "c"]
        assert shard_files_by_process(files, 0, 1) == files

    def test_wraps_when_not_divisible(self):
        files = list("abcde")
        shards = [shard_files_by_process(files, pi, 4) for pi in range(4)]
        assert all(len(s) == 2 for s in shards)
        # wrapped entries are duplicates of real files, never padding
        for s in shards:
            assert set(s) <= set(files)

    def test_round_robin_mixes_areas(self):
        files = [f"A{a}/r{r}" for a in range(2) for r in range(8)]
        s0 = shard_files_by_process(files, 0, 2)
        areas = {f.split("/")[0] for f in s0}
        assert areas == {"A0", "A1"}


class TestGlobalScaler:
    def _entries(self, rng, n_graphs, rows=20, d=5):
        out = []
        for _ in range(n_graphs):
            ef = rng.randn(rows, d).astype(np.float32) * 3 + 1
            out.append((None, None, None, ef, None))
        return out

    def test_single_process_matches_local_fit(self, rng):
        entries = self._entries(rng, 4)
        s_global = global_edge_scaler(entries, process_count=1)
        s_local = EdgeFeatScaler().fit(entries)
        np.testing.assert_allclose(s_global.mean, s_local.mean, rtol=1e-5)
        np.testing.assert_allclose(s_global.scale, s_local.scale, rtol=1e-5)

    def test_combined_moments_equal_whole_set(self, rng, monkeypatch):
        """Two hosts' packed moments must combine to the whole-set scaler."""
        all_entries = self._entries(rng, 6)
        shard_a, shard_b = all_entries[0::2], all_entries[1::2]

        packs = []
        for shard in (shard_a, shard_b):
            feats = np.concatenate([g[3] for g in shard], 0)
            cnt = np.asarray([feats.shape[0]], np.float64)
            s1 = feats.sum(0, dtype=np.float64)
            s2 = (feats.astype(np.float64) ** 2).sum(0)
            packs.append(np.concatenate([cnt, s1, s2]))

        from jax.experimental import multihost_utils

        monkeypatch.setattr(
            multihost_utils, "process_allgather",
            lambda x: np.stack(packs),
        )
        s_combined = global_edge_scaler(shard_a, process_count=2)
        s_whole = EdgeFeatScaler().fit(all_entries)
        np.testing.assert_allclose(s_combined.mean, s_whole.mean, rtol=1e-5)
        np.testing.assert_allclose(
            s_combined.scale, s_whole.scale, rtol=1e-4
        )

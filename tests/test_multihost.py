"""Multi-host input pipeline: per-host file-list sharding + DCN-combined
edge scaler (process-count-aware, SURVEY.md §2.7)."""
import json
import os
import subprocess
import sys

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


_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=n, process_id=pid)
import numpy as np
from superpoint_graph_tpu.parallel.multihost import global_edge_scaler

rng = np.random.RandomState(0)
all_entries = [
    (None, None, None, rng.randn(20, 5).astype(np.float32) * 3 + 1, None)
    for _ in range(6)
]
shard = all_entries[pid::n]
# no process_count passed: exercises the REAL jax.process_count() +
# multihost_utils.process_allgather path over the Gloo backend
scaler = global_edge_scaler(shard)
print(json.dumps({"pid": pid,
                  "mean": scaler.mean.tolist(),
                  "scale": scaler.scale.tolist()}))
"""


class TestTwoProcessScaler:
    def test_real_allgather_two_processes(self, tmp_path, rng):
        """Launch TWO actual jax processes (Gloo CPU collectives) and check
        the DCN scaler path end-to-end — no monkeypatching (each worker fits
        on its own shard; both must produce the whole-set scaler)."""
        port = str(29000 + os.getpid() % 1000)
        worker = tmp_path / "worker.py"
        worker.write_text(_WORKER)
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
        )
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), "2", port],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, env=env,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            stdout, stderr = p.communicate(timeout=180)
            assert p.returncode == 0, f"worker failed:\n{stderr[-2000:]}"
            # Gloo prints connection banners on stdout; take the JSON line
            line = [l for l in stdout.splitlines()
                    if l.startswith('{"pid"')][-1]
            outs.append(json.loads(line))

        # both hosts computed identical scalers...
        np.testing.assert_allclose(outs[0]["mean"], outs[1]["mean"])
        np.testing.assert_allclose(outs[0]["scale"], outs[1]["scale"])
        # ...equal to the whole-set fit
        rs = np.random.RandomState(0)
        all_entries = [
            (None, None, None, rs.randn(20, 5).astype(np.float32) * 3 + 1,
             None)
            for _ in range(6)
        ]
        s_whole = EdgeFeatScaler().fit(all_entries)
        np.testing.assert_allclose(outs[0]["mean"], s_whole.mean, rtol=1e-5)
        np.testing.assert_allclose(outs[0]["scale"], s_whole.scale,
                                   rtol=1e-4)

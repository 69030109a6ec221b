"""Multi-host input pipeline: per-host sharding of the training file list
over DCN (SURVEY.md §2.7 — the reference is strictly single-process;
DataLoader workers, main.py:180, are its only input concurrency).

Design (the scaling-book recipe for data-parallel input):
  * every host derives the SAME globally-ordered file list, then takes a
    deterministic round-robin slice — no coordinator, no communication;
  * slices are equalized by cyclic wrap so every host runs the same number
    of steps per epoch (collectives would deadlock otherwise);
  * the edge-feature StandardScaler (spg.py:51-64 semantics) must be
    identical on all hosts even though each host only reads its shard:
    per-host moment sums combine over DCN with `process_allgather`, falling
    back to local fitting in single-process runs.
"""
from __future__ import annotations

import numpy as np


def process_info():
    import jax

    return jax.process_index(), jax.process_count()


def shard_files_by_process(
    files, process_index: int | None = None, process_count: int | None = None
):
    """Round-robin slice of a globally-ordered file list, wrapped cyclically
    so all hosts receive exactly ceil(n / process_count) entries.

    Round-robin (not contiguous blocks) so each host sees a balanced mix of
    areas/folds — the reference's file lists are grouped by area
    (s3dis_dataset.py:23-63)."""
    if process_index is None or process_count is None:
        process_index, process_count = process_info()
    files = list(files)
    if process_count <= 1 or not files:
        return files
    per_host = -(-len(files) // process_count)
    out = []
    for j in range(per_host):
        out.append(files[(process_index + j * process_count) % len(files)])
    return out


def global_edge_scaler(local_train_entries, process_count: int | None = None):
    """EdgeFeatScaler fit on the UNION of all hosts' train shards.

    Combines per-host (count, sum, sum of squares) moments via
    `multihost_utils.process_allgather`; identical-by-construction on every
    host. Single-process: equivalent to EdgeFeatScaler.fit."""
    from ..data.spg_io import EdgeFeatScaler

    feats = (
        np.concatenate([g[3] for g in local_train_entries], 0)
        if local_train_entries
        else np.zeros((0, 1), np.float64)
    )
    cnt = np.asarray([feats.shape[0]], np.float64)
    s1 = feats.sum(0, dtype=np.float64)
    s2 = (feats.astype(np.float64) ** 2).sum(0)

    if process_count is None:
        _, process_count = process_info()
    if process_count > 1:
        from jax.experimental import multihost_utils

        packed = np.concatenate([cnt, s1, s2])
        allp = np.asarray(multihost_utils.process_allgather(packed))
        cnt = allp[:, :1].sum(0)
        d = s1.shape[0]
        s1 = allp[:, 1 : 1 + d].sum(0)
        s2 = allp[:, 1 + d :].sum(0)

    n = max(float(cnt[0]), 1.0)
    mean = s1 / n
    var = np.maximum(s2 / n - mean**2, 0.0)
    std = np.sqrt(var)
    scale = np.where(std == 0, 1.0, std)
    return EdgeFeatScaler(mean.astype(np.float32), scale.astype(np.float32))


def get_datasets_multihost(
    dataset: str, root: str, edge_attribs: str, **kw
):
    """data.datasets.get_datasets with the TRAIN list sharded per host and a
    DCN-combined scaler. Test/validation stay replicated (every host
    evaluates the full sets, as eval metrics are host-local)."""
    from ..data.datasets import split_names
    from ..data.spg_io import spg_reader
    import os

    pi, pc = process_info()
    spg_attribs01 = kw.pop("spg_attribs01", True)
    train_f, test_f, valid_f = split_names(
        dataset, root,
        kw.pop("cvfold", 0), kw.pop("use_val_set", False),
        kw.pop("db_train_name", "train"), kw.pop("db_test_name", "test"),
    )
    cutoff = kw.pop("spg_superedge_cutoff", -1)
    read = lambda rel: spg_reader(
        os.path.join(root, "superpoint_graphs", rel), edge_attribs,
        cutoff, incl_dir_in_name=True,
    )
    train_local = [read(f) for f in shard_files_by_process(train_f, pi, pc)]
    testlist = [read(f) for f in test_f]
    validlist = [read(f) for f in valid_f]
    scaler = None
    if spg_attribs01 and train_local:
        scaler = global_edge_scaler(train_local, pc)
        apply = lambda lst: [
            (g[0], g[1], g[2], scaler.transform(g[3]), *g[4:]) for g in lst
        ]
        train_local = apply(train_local)
        testlist = apply(testlist)
        validlist = apply(validlist)
    return train_local, testlist, validlist, scaler

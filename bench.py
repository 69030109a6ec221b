"""Benchmark: end-to-end partition + inference throughput (Mpts/sec) on TPU.

Measures the BASELINE.json north-star metric — the reference's two headline
stages chained: the geometric partition (partition/partition.py:113-189:
kNN graphs + geometric features + l0 cut pursuit + SPG build) followed by
steady-state semantic inference with the flagship ECC-GRU model
(learning/main.py:267-311 eval path, gru_10_0,f_13 over full-room SPGs),
on synthetic S3DIS-like rooms, after compile, on the real device.

`vs_baseline` compares against a host-CPU implementation of the same
pipeline built from the reference's ingredient choices: sklearn KD-tree kNN
(graphs.py:26) + the C++ parity kernels (native/spgt_native.cpp:
compute_geof, l0 cut pursuit with Dinic max-flow) + the same model evaluated
on the host CPU backend in a subprocess (the reference's own binaries are
not buildable here — its cut-pursuit submodule is absent upstream; see
BASELINE.md).

Prints ONE json line:
{"metric", "value", "unit", "vs_baseline"} plus per-leg breakdown keys.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _enable_compile_cache():
    import jax

    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_spgt"
    )
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

N_POINTS = 60000
N_REPEATS = 3

# flagship S3DIS model (reference S3DIS.md:24 recipe)
MODEL_KW = dict(
    model_config="gru_10_0,f_13",
    ptn_widths=((64, 64, 128, 128, 256), (256, 64, 32)),
    ptn_widths_stn=((64, 64, 128), (128, 64)),
    fnet_widths=(13, 32, 128, 64),
    fnet_llbias=False,
    fnet_bnidx=2,
)


def make_clouds():
    from superpoint_graph_tpu.data.synthetic import synthetic_room

    rng = np.random.RandomState(0)
    clouds = []
    for _ in range(N_REPEATS + 1):
        xyz, rgb, labels, objects = synthetic_room(
            rng, n_points=N_POINTS, noise=0.008
        )
        clouds.append((xyz, rgb, labels, objects))
    return clouds


def tpu_partition(clouds, cfg):
    """(mean seconds per cloud, results) through the 2-stage pipeline."""
    from superpoint_graph_tpu.pipeline import partition_cloud, partition_clouds

    xyz0, rgb0, lab0, obj0 = clouds[0]
    partition_cloud(xyz0, rgb0, lab0, obj0, n_labels=13, cfg=cfg)  # warm
    t0 = time.perf_counter()
    results = partition_clouds(clouds, cfg, n_labels=13)
    return (time.perf_counter() - t0) / len(clouds), results


def build_eval_batches(results, tmpdir):
    """Run the real parsed/SPG dataset machinery over the partition results
    and collate one full-room eval batch per cloud (main.py eval path)."""
    import superpoint_graph_tpu.data.spg_io as spg_io
    from superpoint_graph_tpu.data.loader import (
        LoaderConfig, collate_spg, load_spg_sample, pc_attrib_dims,
    )
    from superpoint_graph_tpu.data.parsed import preprocess_pointclouds
    from superpoint_graph_tpu.utils.h5io import write_features, write_spg

    os.makedirs(os.path.join(tmpdir, "features", "Area_1"), exist_ok=True)
    os.makedirs(
        os.path.join(tmpdir, "superpoint_graphs", "Area_1"), exist_ok=True
    )
    for i, res in enumerate(results):
        write_features(
            os.path.join(tmpdir, "features", "Area_1", f"room_{i}.h5"),
            res.geof, res.xyz, res.rgb, res.graph_nn, res.labels,
        )
        write_spg(
            os.path.join(tmpdir, "superpoint_graphs", "Area_1", f"room_{i}.h5"),
            res.graph_sp, res.components, res.in_component,
        )
    preprocess_pointclouds(tmpdir, "s3dis", 13)

    edge_attribs = (
        "delta_avg,delta_std,nlength/ld,surface/ld,volume/ld,size/ld,xyz/d"
    )
    cfg = LoaderConfig()
    n_ch = pc_attrib_dims(cfg.pc_attribs)
    entries = []
    for i in range(len(results)):
        spg_file = os.path.join(
            tmpdir, "superpoint_graphs", "Area_1", f"room_{i}.h5"
        )
        entries.append(
            spg_io.spg_reader(spg_file, edge_attribs, incl_dir_in_name=True)
        )
    scaler = spg_io.EdgeFeatScaler().fit(entries)
    batches = []
    for i, e in enumerate(entries):
        e = (e[0], e[1], e[2], scaler.transform(e[3]), e[4])
        s = load_spg_sample(
            e, os.path.join(tmpdir, "parsed", "Area_1", f"room_{i}.h5"),
            cfg, train=False,
        )
        batches.append(collate_spg([s], cfg, 13, n_ch))
    return batches


def tpu_inference(batches):
    """Steady-state eval-step seconds per cloud for the flagship model."""
    import jax

    from superpoint_graph_tpu.learn.train import Trainer
    from superpoint_graph_tpu.models import SpgModel

    model = SpgModel(n_classes=13, **MODEL_KW)
    trainer = Trainer(model, checkpoint_ptn=False)
    state = trainer.init(jax.random.PRNGKey(0), batches[0])
    for b in batches:  # warm every padding bucket
        trainer.eval_step(state, b)
    reps = 3  # repeat passes so per-call dispatch noise averages out
    t0 = time.perf_counter()
    for _ in range(reps):
        for b in batches:
            loss, logits = trainer.eval_step(state, b)
    logits.block_until_ready()
    return (time.perf_counter() - t0) / (len(batches) * reps)


def host_partition(xyz, rgb, cfg):
    """Reference-architecture host partition: KD-tree kNN (graphs.py:26) +
    C++ native kernels (compute_geof, Dinic-max-flow cut pursuit) + the
    vectorized SPG builder, on the local CPU."""
    from sklearn.neighbors import NearestNeighbors

    from superpoint_graph_tpu import native
    from superpoint_graph_tpu.graph.spg import compute_sp_graph

    if native.available():
        geof_fn = lambda x, i: native.compute_geof(x, i, i.shape[1])
        cp_fn = lambda f, s, t, w, reg: native.cutpursuit(
            f, s, t, w, reg, max_iter=6
        )
    else:
        from superpoint_graph_tpu.ops.cutpursuit import cutpursuit
        from superpoint_graph_tpu.ops.geof import compute_geof_numpy

        geof_fn = compute_geof_numpy
        cp_fn = lambda f, s, t, w, reg: cutpursuit(f, s, t, w, reg, max_iter=6)

    t0 = time.perf_counter()
    nn = NearestNeighbors(
        n_neighbors=cfg.k_nn_geof + 1, algorithm="kd_tree"
    ).fit(xyz)
    dist, idx = nn.kneighbors(xyz)
    idx, dist = idx[:, 1:].astype(np.uint32), dist[:, 1:]
    geof = geof_fn(xyz, idx)
    src = np.repeat(np.arange(len(xyz)), cfg.k_nn_adj)
    tgt = idx[:, : cfg.k_nn_adj].reshape(-1)
    d = dist[:, : cfg.k_nn_adj].reshape(-1)
    w = (1.0 / (cfg.lambda_edge_weight + d / d.mean())).astype(np.float32)
    feats = np.hstack([geof, rgb / 255.0]).astype(np.float32)
    feats[:, 3] *= 2.0
    comps, in_comp = cp_fn(feats, src, tgt, w, cfg.reg_strength)
    compute_sp_graph(xyz, cfg.d_se_max, in_comp, comps, None, 0,
                     adjacency=cfg.spg_adjacency)
    return time.perf_counter() - t0


_HOST_INF_SNIPPET = r"""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, {repo!r})
import pickle
batches = pickle.load(open({pkl!r}, "rb"))
import jax.numpy as jnp
from superpoint_graph_tpu.models.spgmodel import SpgBatch
from superpoint_graph_tpu.models import SpgModel
from superpoint_graph_tpu.learn.train import Trainer
batches = [SpgBatch(**{{k: (None if v is None else jnp.asarray(v))
                       for k, v in b.items()}}) for b in batches]
model = SpgModel(n_classes=13, **{model_kw})
trainer = Trainer(model, checkpoint_ptn=False)
state = trainer.init(jax.random.PRNGKey(0), batches[0])
for b in batches:
    trainer.eval_step(state, b)
t0 = time.perf_counter()
for b in batches:
    loss, logits = trainer.eval_step(state, b)
logits.block_until_ready()
print(json.dumps({{"sec_per_cloud": (time.perf_counter() - t0) / len(batches)}}))
"""


def host_inference(batches, tmpdir):
    """Same flagship model evaluated on the host CPU backend (subprocess —
    the axon TPU plugin pins the in-process backend)."""
    import dataclasses
    import pickle

    pkl = os.path.join(tmpdir, "batches.pkl")
    plain = [
        {k: (None if v is None else np.asarray(v))
         for k, v in dataclasses.asdict(b).items()}
        for b in batches
    ]
    with open(pkl, "wb") as f:
        pickle.dump(plain, f)
    code = _HOST_INF_SNIPPET.format(
        repo=os.path.dirname(os.path.abspath(__file__)),
        pkl=pkl,
        model_kw=repr(MODEL_KW),
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["sec_per_cloud"]


def main():
    import tempfile

    from superpoint_graph_tpu.pipeline import PartitionConfig

    clouds = make_clouds()
    cfg = PartitionConfig(
        voxel_width=0.0,
        k_nn_geof=45,
        k_nn_adj=10,
        reg_strength=0.1,
        cp_backend="tpu",
        spg_adjacency="knn",
    )

    t_part, results = tpu_partition(clouds, cfg)
    tmpdir = tempfile.mkdtemp(prefix="spgt_bench_")
    batches = build_eval_batches(results[: N_REPEATS], tmpdir)
    t_inf = tpu_inference(batches)

    part_mpts = N_POINTS / t_part / 1e6
    inf_mpts = N_POINTS / t_inf / 1e6
    e2e_mpts = N_POINTS / (t_part + t_inf) / 1e6

    try:
        t_part_host = host_partition(clouds[0][0], clouds[0][1], cfg)
        vs_part = t_part_host / t_part
    except Exception:
        t_part_host, vs_part = float("nan"), float("nan")
    try:
        t_inf_host = host_inference(batches, tmpdir)
        vs_inf = t_inf_host / t_inf
    except Exception:
        t_inf_host, vs_inf = float("nan"), float("nan")
    vs_e2e = (t_part_host + t_inf_host) / (t_part + t_inf)

    print(
        json.dumps(
            {
                "metric": "partition_plus_inference_throughput",
                "value": round(e2e_mpts, 4),
                "unit": "Mpts/sec",
                "vs_baseline": round(vs_e2e, 3),
                "partition_mpts": round(part_mpts, 4),
                "inference_mpts": round(inf_mpts, 4),
                "partition_vs_baseline": round(vs_part, 3),
                "inference_vs_baseline": round(vs_inf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

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
{"metric", "value", "unit", "vs_baseline"} plus per-leg breakdown keys,
`train_steps_per_sec`, and absolute-efficiency accounting (`mfu_*`,
`hbm_util_cp`): analytic FLOPs/bytes of each stage's dominant kernels
divided by measured time and the device's peak (VERDICT r2 items 5-6).

Every TPU leg is measured best-of-N (N=3): run-to-run wall clock on the
tunneled host varies up to 4x (BASELINE.md), so the minimum — not a single
draw — is the stable statistic the driver records.
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
        # cache sub-second compiles too: ~80 eager-op executables x ~0.5 s
        # each re-compiled per process under the default 1.0 s threshold
        # (tools/cache_diag_results.json)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


_enable_compile_cache()

N_POINTS = 60000
N_REPEATS = 3
N_BEST = 3  # best-of-N per TPU leg (4x run-to-run variance, BASELINE.md)


def device_peaks():
    """(device_kind, bf16 peak FLOP/s, HBM bytes/s) of device 0. Values from
    public TPU spec sheets; unknown kinds assume v5e (the bench target)."""
    import jax

    kind = jax.devices()[0].device_kind
    table = {
        "v5 lite": (197e12, 819e9),   # v5e
        "v5e": (197e12, 819e9),
        "v5p": (459e12, 2765e9),
        "v4": (275e12, 1228e9),
        "v6": (918e12, 1640e9),       # Trillium
    }
    low = kind.lower()
    for k, v in table.items():
        if k in low:
            return kind, v[0], v[1]
    return kind, 197e12, 819e9

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
    """(best-of-N mean seconds per cloud, results) through the 2-stage
    pipeline."""
    from superpoint_graph_tpu.pipeline import partition_cloud, partition_clouds

    xyz0, rgb0, lab0, obj0 = clouds[0]
    partition_cloud(xyz0, rgb0, lab0, obj0, n_labels=13, cfg=cfg)  # warm
    best = float("inf")
    for _ in range(N_BEST):
        t0 = time.perf_counter()
        results = partition_clouds(clouds, cfg, n_labels=13)
        best = min(best, (time.perf_counter() - t0) / len(clouds))
    return best, results


def tpu_stage_roofline(cloud, cfg):
    """Best-of-N per-stage times for the two FLOP-dominant partition stages
    (kNN distance matmuls, band cut-pursuit ICM sweeps) on one room, plus the
    analytic FLOP/byte counts of their dominant kernels."""
    import jax
    import jax.numpy as jnp

    from superpoint_graph_tpu.ops import cutpursuit_band as cpb
    from superpoint_graph_tpu.ops import geof as geof_ops
    from superpoint_graph_tpu.ops.knn import compute_graph_nn_2
    from superpoint_graph_tpu.pipeline import _assemble_features_device

    xyz, rgb, _, _ = cloud
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    out = {}

    t_knn, t_cp = float("inf"), float("inf")
    for _ in range(N_BEST + 1):  # first pass warms, then best-of-N
        t0 = time.perf_counter()
        graph_nn, target_geof, dev = compute_graph_nn_2(
            xyz, cfg.k_nn_adj, cfg.k_nn_geof, return_device=True
        )
        # sync via a small fetch (block_until_ready can lie on the tunnel)
        float(jnp.sum(dev["d2"][:4, 0]))
        t_knn = min(t_knn, time.perf_counter() - t0)

        n_pad = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
        xyz_d = jnp.pad(jnp.asarray(xyz), ((0, n_pad - n), (0, 0)))
        tg = jnp.pad(target_geof, ((0, n_pad - n), (0, 0)))
        dev["geof"] = geof_ops.compute_geof(xyz_d, tg)
        rgb_p = np.zeros((n_pad, 3), np.uint8)
        rgb_p[:n] = np.asarray(rgb, np.uint8)
        f_dev = _assemble_features_device(dev["geof"], jnp.asarray(rgb_p))
        float(jnp.sum(f_dev[:4, 0]))

        t0 = time.perf_counter()
        cpb.cutpursuit_band_device(
            f_dev, dev["idx"][:, : cfg.k_nn_adj], dev["d2"][:, : cfg.k_nn_adj],
            xyz, n, cfg.reg_strength,
            lambda_edge_weight=cfg.lambda_edge_weight,
        )
        t_cp = min(t_cp, time.perf_counter() - t0)

    # kNN: blocked [n,3]x[3,n] distance matmul = 2*3*n^2 useful FLOPs
    # (selection/approx_min_k excluded — MFU counts algorithmic work)
    out["t_knn"] = t_knn
    out["flops_knn"] = 2.0 * 3.0 * float(n) * float(n)

    # band CP: the hot kernel is the [NB,B,WIN]x[NB,WIN] ICM matvec —
    # flow_steps * 2*icm_sweeps sweeps per EXECUTED outer iteration
    # (LAST_SOLVE_STATS carries the real trip count), 2*n_pad*WIN FLOPs and
    # n_pad*WIN*2 bytes (bf16 band read) per sweep. CC propagation sweeps
    # (compare ops, not FLOPs) excluded -> both are lower bounds.
    st = cpb.LAST_SOLVE_STATS
    sweeps = st["iters"] * 2 * 2 * 3  # flow_steps=2, icm_sweeps=3
    out["t_cp"] = t_cp
    out["cp_outer_iters"] = st["iters"]
    out["flops_cp"] = sweeps * 2.0 * st["n_pad"] * st["win"]
    out["bytes_cp"] = sweeps * 2.0 * st["n_pad"] * st["win"]
    return out


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
    batches, samples = [], []
    for i, e in enumerate(entries):
        e = (e[0], e[1], e[2], scaler.transform(e[3]), e[4])
        s = load_spg_sample(
            e, os.path.join(tmpdir, "parsed", "Area_1", f"room_{i}.h5"),
            cfg, train=False,
        )
        samples.append(s)
        batches.append(collate_spg([s], cfg, 13, n_ch))
    # multi-room batches (reference trains batched, main.py:40 batch_size 2
    # default): 4- and 16-room unions for the batched-training MFU legs. The
    # b4 step is mostly fixed per-step cost (dispatch + small-op overhead at
    # ~7 ms/step), so the 16-room union amortizes it 4x further — the
    # VERDICT r3-#9/r4-#8 train-efficiency lever.
    def rep_batch(k):
        reps = -(-k // len(samples))
        return collate_spg((samples * reps)[:k], cfg, 13, n_ch)

    return batches, rep_batch(4), rep_batch(16)


def tpu_inference(batches):
    """Steady-state eval-step (sec/cloud, flops/cloud) for the flagship
    model; best-of-N passes, XLA-cost-analysis FLOPs."""
    import jax
    import jax.numpy as jnp

    from superpoint_graph_tpu.learn.train import Trainer
    from superpoint_graph_tpu.models import SpgModel

    model = SpgModel(n_classes=13, **MODEL_KW)
    trainer = Trainer(model, checkpoint_ptn=False)
    state = trainer.init(jax.random.PRNGKey(0), batches[0])
    flops = 0.0
    for b in batches:  # warm every padding bucket + XLA's own FLOP count
        trainer.eval_step(state, b)
        ca = trainer._eval_step.lower(state, b).compile().cost_analysis()
        flops += float((ca[0] if isinstance(ca, list) else ca)["flops"])
    reps = 3  # inner reps amortize per-call dispatch noise
    best = float("inf")
    for _ in range(N_BEST):
        t0 = time.perf_counter()
        for _ in range(reps):
            for b in batches:
                loss, logits = trainer.eval_step(state, b)
        float(jnp.sum(logits))  # tunnel-safe sync
        best = min(best, (time.perf_counter() - t0) / (len(batches) * reps))
    return best, flops / len(batches)


def tpu_train(batches, batch4=None, batch16=None):
    """Steady-state train-step throughput on the flagship config — the
    reference's other headline loop (main.py:176-226). Measures single-room
    steps (batch 1, the eval-batch shapes) and, when given, 4-room and
    16-room unions per step (the reference's documented batched training,
    main.py:40). Returns (steps/sec b1, flops/step b1, steps/sec b4,
    flops/step b4, steps/sec b16, flops/step b16)."""
    import jax
    import jax.numpy as jnp

    from superpoint_graph_tpu.learn.train import Trainer
    from superpoint_graph_tpu.models import SpgModel

    model = SpgModel(n_classes=13, **MODEL_KW)
    trainer = Trainer(model, checkpoint_ptn=False)
    state = trainer.init(jax.random.PRNGKey(0), batches[0])
    rng = jax.random.PRNGKey(1)
    flops = 0.0
    for b in batches:  # warm every padding bucket
        state, loss, _ = trainer.train_step(state, b, rng)
        ca = trainer._train_step.lower(state, b, rng).compile().cost_analysis()
        flops += float((ca[0] if isinstance(ca, list) else ca)["flops"])
    reps = 3
    best = float("inf")
    for _ in range(N_BEST):
        t0 = time.perf_counter()
        for _ in range(reps):
            for b in batches:
                state, loss, _ = trainer.train_step(state, b, rng)
        float(loss)  # tunnel-safe sync
        best = min(best, (time.perf_counter() - t0) / (len(batches) * reps))
    if batch4 is None:
        return (1.0 / best, flops / len(batches), float("nan"), float("nan"),
                float("nan"), float("nan"))

    def batched_leg(bk, scan_k=8):
        state_k = trainer.init(jax.random.PRNGKey(0), bk)
        state_k, loss_k, _ = trainer.train_step(state_k, bk, rng)
        ca = trainer._train_step.lower(state_k, bk, rng).compile()
        ca = ca.cost_analysis()
        flops_k = float((ca[0] if isinstance(ca, list) else ca)["flops"])
        best_k = float("inf")
        for _ in range(N_BEST):
            t0 = time.perf_counter()
            for _ in range(3 * reps):
                state_k, loss_k, _ = trainer.train_step(state_k, bk, rng)
            float(loss_k)
            best_k = min(best_k, (time.perf_counter() - t0) / (3 * reps))
        # multi-step dispatch (Trainer.train_steps / cli.train
        # --steps_per_dispatch). Measured NEGATIVE on this target: the scan
        # form is ~1.8x slower per step than queue-fed sequential dispatch
        # (84.8 vs 154.1 steps/s at b4) — kept as the honest receipt that
        # the dispatch path is NOT the train bottleneck (ROADMAP r5 dead
        # ends)
        group = [bk] * scan_k
        state_s, loss_s, _ = trainer.train_steps(state_k, group, rng)
        best_s = float("inf")
        for _ in range(N_BEST):
            t0 = time.perf_counter()
            for _ in range(reps):
                state_s, loss_s, _ = trainer.train_steps(state_s, group, rng)
            float(loss_s[-1])
            best_s = min(
                best_s, (time.perf_counter() - t0) / (reps * scan_k)
            )
        return 1.0 / best_k, flops_k, 1.0 / best_s

    steps4, flops4, steps4_scan = batched_leg(batch4)
    if batch16 is None:
        steps16, flops16, steps16_scan = (
            float("nan"), float("nan"), float("nan")
        )
    else:
        steps16, flops16, steps16_scan = batched_leg(batch16)
    return (1.0 / best, flops / len(batches), steps4, flops4, steps16,
            flops16, steps4_scan, steps16_scan)


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

    # best-of-N like every TPU leg: the 1-core box has up to 4x run-to-run
    # variance (BASELINE.md), and a single draw made `vs_baseline` noise
    # (19.9x -> 42.3x -> 16.8x across rounds on identical code)
    best = float("inf")
    for _ in range(N_BEST):
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
        best = min(best, time.perf_counter() - t0)
    return best


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
best = float("inf")
for _ in range(3):  # best-of-N, matching every other leg
    t0 = time.perf_counter()
    for b in batches:
        loss, logits = trainer.eval_step(state, b)
    logits.block_until_ready()
    best = min(best, (time.perf_counter() - t0) / len(batches))
print(json.dumps({{"sec_per_cloud": best}}))
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


def bigcloud_leg(n=2_000_000):
    """Giant-cloud partition throughput (the pipeline_big path, VERDICT r3
    item 5): one cold run (whatever the persistent cache doesn't serve) and
    one warm run on the same 2e6-point scene. Returns (warm_s, cold_s)."""
    from superpoint_graph_tpu.data.synthetic import big_scene
    from superpoint_graph_tpu.pipeline import PartitionConfig
    from superpoint_graph_tpu.pipeline_big import partition_cloud_big

    xyz = big_scene(n)
    rgb = np.full((len(xyz), 3), 127, np.uint8)
    cfg = PartitionConfig(
        voxel_width=0.0, k_nn_geof=45, k_nn_adj=10, reg_strength=0.1,
        spg_adjacency="knn",
    )
    t0 = time.perf_counter()
    partition_cloud_big(xyz, rgb, cfg=cfg)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    partition_cloud_big(xyz, rgb, cfg=cfg)
    warm = time.perf_counter() - t0
    return warm, cold


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
    batches, batch4, batch16 = build_eval_batches(results[: N_REPEATS], tmpdir)
    t_inf, flops_inf = tpu_inference(batches)
    (steps_per_sec, flops_train, steps4, flops4, steps16, flops16,
     steps4_scan, steps16_scan) = tpu_train(batches, batch4, batch16)
    roof = tpu_stage_roofline(clouds[0], cfg)
    kind, peak_flops, peak_bw = device_peaks()

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

    try:
        big_warm, big_cold = bigcloud_leg()
        big_keys = {
            "bigcloud_2e6_mpts": round(2.0 / big_warm, 4),
            "bigcloud_2e6_warm_sec": round(big_warm, 1),
            "bigcloud_2e6_cold_sec": round(big_cold, 1),
        }
    except Exception:
        big_keys = {}

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
                "train_steps_per_sec": round(steps_per_sec, 3),
                # absolute efficiency vs device peak (lower bounds: dominant
                # kernels only; see tpu_stage_roofline docstring)
                "device_kind": kind,
                "mfu_knn": round(roof["flops_knn"] / roof["t_knn"]
                                 / peak_flops, 4),
                "mfu_cp": round(roof["flops_cp"] / roof["t_cp"]
                                / peak_flops, 4),
                "hbm_util_cp": round(roof["bytes_cp"] / roof["t_cp"]
                                     / peak_bw, 4),
                "mfu_inference": round(flops_inf / t_inf / peak_flops, 4),
                "mfu_train": round(flops_train / (1.0 / steps_per_sec)
                                   / peak_flops, 4),
                # 4-/16-room batched training (reference main.py:40 batch
                # mode; b16 amortizes the ~7 ms fixed per-step cost)
                "train_b4_steps_per_sec": round(steps4, 3),
                "mfu_train_b4": round(flops4 * steps4 / peak_flops, 4),
                "train_b16_steps_per_sec": round(steps16, 3),
                "mfu_train_b16": round(flops16 * steps16 / peak_flops, 4),
                # scan8 = 8 steps per dispatch (Trainer.train_steps /
                # cli.train --steps_per_dispatch): the device-throughput
                # number without the ~5 ms/dispatch tunnel floor
                "train_b4_scan8_steps_per_sec": round(steps4_scan, 3),
                "mfu_train_b4_scan8": round(
                    flops4 * steps4_scan / peak_flops, 4
                ),
                "train_b16_scan8_steps_per_sec": round(steps16_scan, 3),
                "mfu_train_b16_scan8": round(
                    flops16 * steps16_scan / peak_flops, 4
                ),
                "t_knn_sec": round(roof["t_knn"], 4),
                "t_cp_sec": round(roof["t_cp"], 4),
                "cp_outer_iters": roof["cp_outer_iters"],
                "best_of": N_BEST,
                **big_keys,
            }
        )
    )


if __name__ == "__main__":
    main()

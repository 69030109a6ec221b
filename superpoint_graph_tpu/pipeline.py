"""End-to-end geometric partition of one point cloud, TPU-first.

Orchestrates the reference partition CLI's per-file pipeline
(partition/partition.py:113-189): prune -> kNN graphs -> geometric features ->
edge weights -> l0 cut pursuit -> superpoint graph, with the same three timing
buckets (features / partition / SPG). All array-heavy stages run as jitted XLA
programs; cut pursuit selects between the device solver (default) and the
host-exact oracle (`cp_backend='exact'`).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .graph.spg import compute_sp_graph
from .ops import geof as geof_ops
from .ops import voxel
from .ops.cutpursuit import cutpursuit as cutpursuit_exact
from .ops.cutpursuit_band import cutpursuit_band
from .ops.knn import compute_graph_nn_2, materialize_graph_nn


@dataclasses.dataclass
class PartitionConfig:
    """Mirrors the reference partition CLI flags (partition.py:20-31)."""

    k_nn_geof: int = 45
    k_nn_adj: int = 10
    lambda_edge_weight: float = 1.0
    reg_strength: float = 0.03
    d_se_max: float = 0.0
    voxel_width: float = 0.03
    dataset: str = "s3dis"  # controls partition feature assembly
    cp_backend: str = "tpu"  # 'tpu' | 'exact'
    cp_cutoff: int = 0
    spg_adjacency: str = "delaunay"  # 'delaunay' | 'knn'


@dataclasses.dataclass
class PartitionResult:
    xyz: np.ndarray
    rgb: np.ndarray
    labels: np.ndarray  # per-voxel label histogram (or raw labels)
    geof: np.ndarray
    graph_nn: dict
    components: list
    in_component: np.ndarray
    graph_sp: dict
    times: dict  # features / partition / spg seconds


def partition_features(xyz: np.ndarray, cfg: PartitionConfig,
                       return_device: bool = False):
    """kNN graphs + geometric features (the 'features' timing bucket).

    The geof neighbor table flows device-to-device from the kNN into the
    feature kernel — only the small adjacency graph and the 4-channel features
    are fetched to host. With return_device the un-sliced device handles
    (geof / adjacency kNN) are returned too, feeding the one-program
    cut-pursuit path without re-uploading anything."""
    out = compute_graph_nn_2(
        xyz, cfg.k_nn_adj, cfg.k_nn_geof, return_device=return_device,
        defer_fetch=return_device,
    )
    graph_nn, target_geof = out[0], out[1]
    # bucket to a power of two so geof shares one executable across clouds
    n = len(xyz)
    n_pad = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
    xyz_d = jnp.asarray(xyz, jnp.float32)
    if n_pad > n:
        xyz_d = jnp.pad(xyz_d, ((0, n_pad - n), (0, 0)))
        target_geof = jnp.pad(target_geof, ((0, n_pad - n), (0, 0)))
    geof_dev = geof_ops.compute_geof(xyz_d, target_geof)
    # the ~5 MB adjacency fetch (started async inside compute_graph_nn_2)
    # completes here, under the geof dispatch, instead of blocking before it
    graph_nn = materialize_graph_nn(graph_nn)
    geof = np.asarray(geof_dev[:n])
    if return_device:
        dev = out[2]
        dev["geof"] = geof_dev
        return graph_nn, geof, dev
    return graph_nn, geof


@jax.jit
def _assemble_features_device(geof, rgb):
    """Device analogue of assemble_partition_features (s3dis flavor)."""
    g = geof * jnp.asarray([1.0, 1.0, 1.0, 2.0], geof.dtype)
    return jnp.concatenate([g, rgb.astype(jnp.float32) / 255.0], axis=1)


@jax.jit
def _assemble_features_device_nocolor(geof):
    g = geof * jnp.asarray([1.0, 1.0, 1.0, 2.0], geof.dtype)
    return g


def _cutpursuit_device_path(xyz, rgb, graph_nn, dev, cfg: PartitionConfig):
    """One-program cut pursuit: band build + solve from device-resident kNN
    output; host does only the Morton sort, the merge step, and densify."""
    from .ops.cutpursuit import merge_regions
    from .ops.cutpursuit_band import cutpursuit_band_device
    from .ops.components import connected_components, group_components

    n = len(xyz)
    n_pad = dev["n_pad"]
    use_color = cfg.dataset == "s3dis" and rgb is not None and len(rgb) > 0
    if use_color:
        rgb_p = np.zeros((n_pad, 3), np.uint8)
        rgb_p[:n] = np.asarray(rgb, np.uint8)
        f_dev = _assemble_features_device(dev["geof"], jnp.asarray(rgb_p))
    else:
        f_dev = _assemble_features_device_nocolor(dev["geof"])
    in_comp = cutpursuit_band_device(
        f_dev,
        dev["idx"][:, : cfg.k_nn_adj],
        dev["d2"][:, : cfg.k_nn_adj],
        np.asarray(xyz, np.float32),
        n,
        cfg.reg_strength,
        lambda_edge_weight=cfg.lambda_edge_weight,
    )
    # host backward (merge) step + cutoff over the already-fetched edge list
    geof_host = np.asarray(dev["geof"][:n])
    features = assemble_partition_features(geof_host, rgb if use_color else None, cfg)
    src = np.asarray(graph_nn["source"], np.int64)
    tgt = np.asarray(graph_nn["target"], np.int64)
    w = edge_weights(graph_nn["distances"], cfg.lambda_edge_weight)
    in_comp = merge_regions(
        features, np.ones(n), in_comp, src, tgt, w, float(cfg.reg_strength)
    )
    if cfg.cp_cutoff > 0:
        active = in_comp[src] == in_comp[tgt]
        from . import native

        if native.available():  # same contract, ~3x the scipy path
            _, in_comp = native.connected_comp(
                n, src, tgt, active, cfg.cp_cutoff
            )
        else:
            _, in_comp = connected_components(
                n, src, tgt, active, cfg.cp_cutoff
            )
    return group_components(in_comp), in_comp.astype(np.int32)


def assemble_partition_features(geof: np.ndarray, rgb, cfg: PartitionConfig):
    """Dataset-dependent feature vector for cut pursuit
    (partition.py:164-173: s3dis appends rgb/255; verticality doubled)."""
    g = geof.copy()
    g[:, 3] *= 2.0
    if cfg.dataset == "s3dis" and rgb is not None and len(rgb) > 0:
        return np.hstack([g, np.asarray(rgb, np.float32) / 255.0]).astype(np.float32)
    return g.astype(np.float32)


def edge_weights(distances: np.ndarray, lambda_edge_weight: float) -> np.ndarray:
    """w = 1 / (lambda + d / mean(d))  (partition.py:175)."""
    return np.asarray(
        1.0 / (lambda_edge_weight + distances / distances.mean()), dtype=np.float32
    )


def partition_cloud(
    xyz: np.ndarray,
    rgb: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    objects: Optional[np.ndarray] = None,
    n_labels: int = 0,
    cfg: PartitionConfig = PartitionConfig(),
) -> PartitionResult:
    times = {}
    t0 = time.perf_counter()
    if cfg.voxel_width > 0:
        n_obj = int(objects.max()) + 1 if objects is not None and np.size(objects) else 0
        xyz, rgb, labels, _ = voxel.prune(
            xyz,
            cfg.voxel_width,
            rgb if rgb is not None else np.zeros((len(xyz), 3), np.uint8),
            labels,
            objects,
            n_labels,
            n_obj,
        )
    if cfg.cp_backend == "tpu":
        from .pipeline_big import CHUNKED_CP_THRESHOLD, partition_cloud_big

        if len(xyz) > CHUNKED_CP_THRESHOLD:
            # giant cloud: every stage memory-bounded (band chunks + heal)
            big_cfg = dataclasses.replace(cfg, voxel_width=0.0)
            return partition_cloud_big(
                xyz, rgb, labels, objects, n_labels=n_labels, cfg=big_cfg
            )
    device_cp = cfg.cp_backend == "tpu" and len(xyz) >= 16384
    if device_cp:
        graph_nn, geof, dev = partition_features(
            np.asarray(xyz, np.float32), cfg, return_device=True
        )
    else:
        graph_nn, geof = partition_features(np.asarray(xyz, np.float32), cfg)
    times["features"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    features = assemble_partition_features(geof, rgb, cfg)
    w = edge_weights(graph_nn["distances"], cfg.lambda_edge_weight)
    if device_cp:
        components, in_component = _cutpursuit_device_path(
            xyz, rgb, graph_nn, dev, cfg
        )
    elif cfg.cp_backend == "exact":
        components, in_component = cutpursuit_exact(
            features, graph_nn["source"], graph_nn["target"], w,
            cfg.reg_strength, cutoff=cfg.cp_cutoff,
        )
    else:
        # small-cloud device path: the band solver beats both the dense-K
        # solver and the host oracle at these shapes
        # (tools/ssp_inloop_results.json)
        components, in_component = cutpursuit_band(
            features, graph_nn["source"], graph_nn["target"], w,
            cfg.reg_strength, cutoff=cfg.cp_cutoff,
            xyz=np.asarray(xyz, np.float32),
        )
    times["partition"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    # (the device SPG builder was A/B'd here in round 5 and LOST at room
    # scale — 0.18 vs 0.12 s host in the same run: its scalar syncs + small
    # kernels are tunnel-RPC-bound below ~10^5 points. It remains the giant
    # path's builder, where the host pass is the one that doesn't scale —
    # tools/partition_profile_results.json spg vs spg_host.)
    graph_sp = compute_sp_graph(
        xyz,
        cfg.d_se_max,
        in_component,
        components,
        labels,
        n_labels,
        adjacency=cfg.spg_adjacency,
        # 'knn' mode reuses the partition's adjacency edges as superedge
        # support instead of a second kNN search
        knn_edges=(
            (graph_nn["source"], graph_nn["target"])
            if cfg.spg_adjacency == "knn"
            else None
        ),
    )
    times["spg"] = time.perf_counter() - t0

    return PartitionResult(
        xyz=np.asarray(xyz),
        rgb=np.asarray(rgb) if rgb is not None else np.zeros((len(xyz), 3), np.uint8),
        labels=np.asarray(labels) if labels is not None else np.zeros(0),
        geof=geof,
        graph_nn=graph_nn,
        components=components,
        in_component=in_component,
        graph_sp=graph_sp,
        times=times,
    )


def partition_clouds(
    clouds,
    cfg: PartitionConfig = PartitionConfig(),
    n_labels: int = 0,
):
    """Partition a sequence of clouds with a 2-stage software pipeline: the
    (device-heavy) feature stage of cloud i+1 overlaps the (host-heavy)
    cut-pursuit post-processing and SPG build of cloud i. The reference
    processes files strictly serially (partition.py:57-113).

    `clouds` yields (xyz, rgb, labels, objects) tuples; returns a list of
    PartitionResult.
    """
    from concurrent.futures import ThreadPoolExecutor

    clouds = list(clouds)
    results = []

    def stage_a(args):
        xyz, rgb, labels, objects = args
        if cfg.voxel_width > 0:
            n_obj = (
                int(objects.max()) + 1
                if objects is not None and np.size(objects)
                else 0
            )
            xyz, rgb, labels, _ = voxel.prune(
                xyz, cfg.voxel_width,
                rgb if rgb is not None else np.zeros((len(xyz), 3), np.uint8),
                labels, objects, n_labels, n_obj,
            )
        device_cp = cfg.cp_backend == "tpu" and len(xyz) >= 16384
        if device_cp:
            graph_nn, geof, dev = partition_features(
                np.asarray(xyz, np.float32), cfg, return_device=True
            )
        else:
            graph_nn, geof = partition_features(np.asarray(xyz, np.float32), cfg)
            dev = None
        return xyz, rgb, labels, graph_nn, geof, dev

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(stage_a, clouds[0])
        for i in range(len(clouds)):
            xyz, rgb, labels, graph_nn, geof, dev = fut.result()
            if i + 1 < len(clouds):
                fut = pool.submit(stage_a, clouds[i + 1])
            t0 = time.perf_counter()
            features = assemble_partition_features(geof, rgb, cfg)
            w = edge_weights(graph_nn["distances"], cfg.lambda_edge_weight)
            if dev is not None:
                components, in_component = _cutpursuit_device_path(
                    xyz, rgb, graph_nn, dev, cfg
                )
            elif cfg.cp_backend == "exact":
                components, in_component = cutpursuit_exact(
                    features, graph_nn["source"], graph_nn["target"], w,
                    cfg.reg_strength, cutoff=cfg.cp_cutoff,
                )
            else:
                components, in_component = cutpursuit_band(
                    features, graph_nn["source"], graph_nn["target"], w,
                    cfg.reg_strength, cutoff=cfg.cp_cutoff,
                    xyz=np.asarray(xyz, np.float32),
                )
            t_part = time.perf_counter() - t0
            t0 = time.perf_counter()
            graph_sp = compute_sp_graph(
                xyz, cfg.d_se_max, in_component, components, labels, n_labels,
                adjacency=cfg.spg_adjacency,
                knn_edges=(
                    (graph_nn["source"], graph_nn["target"])
                    if cfg.spg_adjacency == "knn"
                    else None
                ),
            )
            results.append(
                PartitionResult(
                    xyz=np.asarray(xyz),
                    rgb=np.asarray(rgb)
                    if rgb is not None
                    else np.zeros((len(xyz), 3), np.uint8),
                    labels=np.asarray(labels) if labels is not None else np.zeros(0),
                    geof=geof,
                    graph_nn=graph_nn,
                    components=components,
                    in_component=in_component,
                    graph_sp=graph_sp,
                    times={
                        "features": 0.0,  # overlapped with the previous cloud
                        "partition": t_part,
                        "spg": time.perf_counter() - t0,
                    },
                )
            )
    return results

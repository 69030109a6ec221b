"""SSP preprocessing: features_supervision/ caches, graph loading, collation.

Behavioral spec from reference supervized_partition/graph_processing.py:
  * build (110-193): read raw (+prune with object histograms for S3DIS),
    compute_graph_nn_2(k_adj, k_local), ground-truth transition edges —
    s3dis: object id mismatch; sema3d: cut-pursuit label inpainting with zero
    node weight on unlabeled; vkitti: connected components of constant label;
    geof with doubled verticality; elevation (RANSAC plane or z - zmin);
    normalized xy.
  * write/read_structure (198-247): the features_supervision h5 contract.
  * graph_loader (347-436): whole-cloud augmentation, BFS random-subgraph
    subsampling to max_ver_train with index remapping, per-point local clouds
    xyz[nei] normalized by sqrt(sum var) + rgb, global feature assembly.
  * graph_collate (439-472): concatenation with cumulative index offsets.
"""
from __future__ import annotations

import dataclasses
import math

import h5py
import numpy as np

from ..ops.components import connected_components
from ..ops.cutpursuit import cutpursuit2
from ..ops.knn import compute_graph_nn_2
from ..ops.subgraph import random_subgraph
from ..ops import geof as geof_ops
from ..ops import voxel as voxel_ops


@dataclasses.dataclass
class SspPreprocessConfig:
    k_nn_adj: int = 5
    k_nn_local: int = 20
    voxel_width: float = 0.03
    compute_geof: bool = True
    plane_model: bool = True
    use_voronoi: float = 0.0  # >0: Delaunay adjacency with sq-length cutoff
    dataset: str = "s3dis"


def compute_transitions(dataset, objects, labels, graph_nn, n_ver):
    """GT transition edges + objects per dataset (graph_processing.py:148-173)."""
    src, tgt = graph_nn["source"], graph_nn["target"]
    if dataset == "s3dis":
        is_transition = objects[src] != objects[tgt]
        return is_transition, objects
    if dataset == "sema3d":
        # label inpainting (151-165): cut pursuit on hard labels restricted to
        # non-transition edges, zero fidelity on unlabeled points
        hard = np.argmax(labels[:, 1:], 1) + 1
        no_lab = np.flatnonzero(labels[:, 1:].sum(1) == 0)
        hard[no_lab] = 0
        is_transition = (
            (hard[src] != hard[tgt]) & (hard[src] != 0) & (hard[tgt] != 0)
        )
        keep = ~is_transition
        node_weight = np.ones(n_ver, np.float32)
        node_weight[no_lab] = 0
        _, objects = cutpursuit2(
            hard.astype(np.float32),
            src[keep].astype(np.int64),
            tgt[keep].astype(np.int64),
            np.ones(keep.sum(), np.float32),
            node_weight,
            0.01,
        )
        is_transition = objects[src] != objects[tgt]
        return is_transition, objects.astype(np.uint32)
    if dataset == "vkitti":
        hard = np.argmax(labels, 1)
        is_transition = hard[src] != hard[tgt]
        _, objects = connected_components(
            n_ver, src.astype(np.int64), tgt.astype(np.int64),
            (~is_transition).astype(np.uint8), 0,
        )
        return is_transition, objects.astype(np.uint32)
    raise ValueError(f"unknown dataset {dataset!r}")


def build_supervision_structure(
    xyz, rgb, labels, objects, cfg: SspPreprocessConfig, n_labels: int
):
    """Full preprocessing of one cloud -> dict matching the structure h5."""
    import jax.numpy as jnp

    if cfg.voxel_width > 0:
        if cfg.dataset == "s3dis":
            n_objects = int(objects.max()) + 1
            xyz, rgb, labels, obj_hist = voxel_ops.prune(
                xyz, cfg.voxel_width, rgb, labels, objects, n_labels, n_objects
            )
            objects = obj_hist[:, 1:].argmax(1) + 1
        else:
            xyz, rgb, labels, _ = voxel_ops.prune(
                xyz, cfg.voxel_width, rgb, labels, None, n_labels, 0
            )
            objects = np.zeros(len(xyz), np.uint32)
    n_ver = len(xyz)
    graph_nn, local_neighbors_dev = compute_graph_nn_2(
        xyz, cfg.k_nn_adj, cfg.k_nn_local, voronoi=float(cfg.use_voronoi)
    )
    local_neighbors = np.asarray(local_neighbors_dev).astype(np.uint32)
    is_transition, objects = compute_transitions(
        cfg.dataset, objects, labels, graph_nn, n_ver
    )
    if cfg.compute_geof:
        geof = np.array(
            geof_ops.compute_geof(jnp.asarray(xyz, jnp.float32), local_neighbors_dev)
        )
        geof[:, 3] *= 2.0
    else:
        geof = np.zeros(0)
    if cfg.plane_model:
        from sklearn.linear_model import RANSACRegressor

        low = np.flatnonzero(xyz[:, 2] - xyz[:, 2].min() < 0.5)
        reg = RANSACRegressor(random_state=0).fit(xyz[low, :2], xyz[low, 2])
        elevation = xyz[:, 2] - reg.predict(xyz[:, :2])
    else:
        elevation = xyz[:, 2] - xyz[:, 2].min()
    ma = xyz[:, :2].max(0, keepdims=True)
    mi = xyz[:, :2].min(0, keepdims=True)
    xyn = (xyz[:, :2] - mi) / (ma - mi + 1e-8)
    return {
        "xyz": np.asarray(xyz, np.float32),
        "rgb": np.asarray(rgb, np.float32),
        "graph_nn": graph_nn,
        "target_local_geometry": local_neighbors.reshape(n_ver, cfg.k_nn_local),
        "is_transition": np.asarray(is_transition, np.uint8),
        "labels": labels,
        "objects": np.asarray(objects, np.uint32),
        "geof": geof,
        "elevation": np.asarray(elevation, np.float32),
        "xyn": np.asarray(xyn, np.float32),
    }


def write_structure(file_name, s):
    """features_supervision h5 contract (graph_processing.py:198-221)."""
    with h5py.File(file_name, "w") as f:
        f.create_dataset("xyz", data=s["xyz"], dtype="float32")
        f.create_dataset("rgb", data=s["rgb"], dtype="float32")
        f.create_dataset("elevation", data=s["elevation"], dtype="float32")
        f.create_dataset("xyn", data=s["xyn"], dtype="float32")
        f.create_dataset("source", data=s["graph_nn"]["source"], dtype="int")
        f.create_dataset("target", data=s["graph_nn"]["target"], dtype="int")
        f.create_dataset("is_transition", data=s["is_transition"], dtype="uint8")
        f.create_dataset(
            "target_local_geometry", data=s["target_local_geometry"], dtype="uint32"
        )
        f.create_dataset("objects", data=s["objects"], dtype="uint32")
        if np.size(s["geof"]) > 0:
            f.create_dataset("geof", data=s["geof"], dtype="float32")
        labels = s["labels"]
        if np.size(labels) > 0 and np.ndim(labels) > 1 and np.shape(labels)[1] > 1:
            f.create_dataset("labels", data=labels, dtype="int32")
        else:
            f.create_dataset("labels", data=labels, dtype="uint8")


def read_structure(file_name, read_geof=False):
    """graph_processing.py:224-247."""
    with h5py.File(file_name, "r") as f:
        xyz = np.array(f["xyz"], dtype="float32")
        rgb = np.array(f["rgb"], dtype="float32")
        elevation = np.array(f["elevation"], dtype="float32")
        xyn = np.array(f["xyn"], dtype="float32")
        edg_source = np.array(f["source"], dtype="int64").squeeze()
        edg_target = np.array(f["target"], dtype="int64").squeeze()
        is_transition = np.array(f["is_transition"])
        objects = np.array(f["objects"][()])
        labels = np.array(f["labels"]).squeeze()
        if labels.ndim == 0:
            labels = np.array([0])
        if is_transition.ndim == 0:
            is_transition = np.array([0])
        local_geometry = np.array(
            f["geof"] if read_geof else f["target_local_geometry"]
        )
    return (xyz, rgb, edg_source, edg_target, is_transition, local_geometry,
            labels, objects, elevation, xyn)


def augment_cloud_whole(xyz, rgb, rot: bool, jitter: bool, use_rgb: bool,
                        rs: np.random.RandomState):
    """Rotate the whole cloud about a random point + jitter
    (graph_processing.py:534-546)."""
    if rot:
        ref = xyz[rs.randint(len(xyz)), :3].copy()
        ref[2] = 0
        a = rs.uniform(0, 2 * math.pi)
        c, s = math.cos(a), math.sin(a)
        M = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        xyz = (xyz[:, :3] - ref) @ M + ref
    if jitter:
        sigma, clip = 0.002, 0.005
        xyz = xyz + np.clip(sigma * rs.standard_normal(xyz.shape), -clip, clip).astype(
            np.float32
        )
        if use_rgb:
            rgb = np.clip(
                rgb + np.clip(sigma * rs.standard_normal(rgb.shape), -clip, clip),
                -1, 1,
            ).astype(np.float32)
    return xyz.astype(np.float32), rgb


@dataclasses.dataclass
class SspLoaderConfig:
    k_nn_local: int = 20
    max_ver_train: int = 10000
    use_rgb: bool = True
    global_feat: str = "eXYrgb"
    pc_augm_rot: bool = True
    pc_augm_jitter: bool = True
    learned_embeddings: bool = True
    ver_value: str = "ptn"  # 'ptn' | 'geof' | 'geofrgb'


def graph_loader(structure_file: str, train: bool, cfg: SspLoaderConfig,
                 rs: np.random.RandomState | None = None):
    """Load one cloud's training sample (graph_processing.py:347-436)."""
    rs = rs or np.random.RandomState()
    (xyz, rgb, edg_source, edg_target, is_transition, local_geometry, labels,
     objects, elevation, xyn) = read_structure(
        structure_file, "geof" in cfg.ver_value
    )
    rgb = rgb / 255.0
    n_ver = xyz.shape[0]

    if train:
        xyz, rgb = augment_cloud_whole(
            xyz, rgb, cfg.pc_augm_rot, cfg.pc_augm_jitter, cfg.use_rgb, rs
        )

    selected_ver = np.ones(n_ver, bool)
    if train and 0 < cfg.max_ver_train < n_ver:
        selected_edg, selected_ver = random_subgraph(
            n_ver, edg_source, edg_target, int(cfg.max_ver_train), rs
        )
        new_index = -np.ones(n_ver, np.int64)
        new_index[selected_ver] = np.arange(selected_ver.sum())
        edg_source = new_index[edg_source[selected_edg]]
        edg_target = new_index[edg_target[selected_edg]]
        is_transition = is_transition[selected_edg]
        labels = labels[selected_ver] if labels.ndim else labels
        objects = objects[selected_ver]
        elevation = elevation[selected_ver]
        xyn = xyn[selected_ver]

    if cfg.learned_embeddings and cfg.ver_value == "ptn":
        nei = local_geometry[selected_ver, : cfg.k_nn_local].astype(np.int64)
        clouds = xyz[nei]  # [n, k, 3] (pre-subsample coordinates)
        diameters = np.sqrt(clouds.var(1).sum(1))
        clouds = (clouds - xyz[selected_ver, None, :]) / (
            diameters[:, None, None] + 1e-10
        )
        if cfg.use_rgb:
            clouds = np.concatenate([clouds, rgb[nei]], axis=2)
        clouds_global = diameters[:, None]
        gf = cfg.global_feat
        if "e" in gf.replace("rgb", ""):
            clouds_global = np.hstack([clouds_global, elevation[:, None]])
        if "rgb" in gf:
            clouds_global = np.hstack([clouds_global, rgb[selected_ver]])
        if "XY" in gf:
            clouds_global = np.hstack([clouds_global, xyn])
        if "xy" in gf.replace("XY", ""):
            clouds_global = np.hstack([clouds_global, xyz[selected_ver, :2]])
    elif cfg.ver_value == "geofrgb":
        clouds = np.concatenate([local_geometry, rgb[selected_ver]], axis=1)
        clouds_global = np.zeros((1,), np.float32)
    else:  # 'geof'
        clouds = local_geometry
        clouds_global = np.zeros((1,), np.float32)

    return {
        "edg_source": edg_source.astype(np.int64),
        "edg_target": edg_target.astype(np.int64),
        "is_transition": np.asarray(is_transition).astype(np.int32),
        "labels": labels,
        "objects": objects.astype(np.int64),
        "clouds": clouds.astype(np.float32),
        "clouds_global": clouds_global.astype(np.float32),
        "xyz": xyz[selected_ver].astype(np.float32),
    }


def graph_collate(samples):
    """Concatenate per-cloud samples, offsetting edge indices
    (graph_processing.py:439-472)."""
    out = {}
    v_off = 0
    srcs, tgts = [], []
    for s in samples:
        srcs.append(s["edg_source"] + v_off)
        tgts.append(s["edg_target"] + v_off)
        v_off += len(s["xyz"])
    out["edg_source"] = np.concatenate(srcs)
    out["edg_target"] = np.concatenate(tgts)
    for k in ("is_transition", "objects", "clouds", "clouds_global", "xyz"):
        out[k] = np.concatenate([s[k] for s in samples])
    labs = [np.atleast_1d(s["labels"]) for s in samples]
    try:
        out["labels"] = np.concatenate(labs)
    except ValueError:
        out["labels"] = labs[0]
    return out

"""Parsed-superpoint cache builder (`parsed/<name>.h5`).

Behavioral spec from reference learning/s3dis_dataset.py:93-162 (and the
sema3d/vkitti variants): per cloud, assemble the per-point feature matrix

  s3dis (15 cols):  [xyz, rgb/255-0.5, elevation, lpsv-0.5, xyzn, dist-to-center]
  sema3d (11 cols): [xyz, rgb/255-0.5, elevation, lpsv-0.5]
  vkitti (14 cols): [xyz, rgb/255-0.5, elevation, zeros(4), xyzn]

then split rows by superpoint component (trimmed to <= 10k rows per component)
into one h5 dataset per component, plus a 'centroid'; accumulate the per-class
point counts into parsed/class_count.h5.
"""
from __future__ import annotations

import os
import random

import h5py
import numpy as np


def elevation_simple(xyz: np.ndarray) -> np.ndarray:
    """z/4 - 0.5 rough room elevation (s3dis_dataset.py:135-136)."""
    return xyz[:, 2] / 4.0 - 0.5


def elevation_plane(xyz: np.ndarray) -> np.ndarray:
    """RANSAC ground-plane elevation (s3dis_dataset.py:127-133)."""
    from sklearn.linear_model import RANSACRegressor

    low = np.flatnonzero(xyz[:, 2] - xyz[:, 2].min() < 0.5)
    reg = RANSACRegressor(random_state=0).fit(xyz[low, :2], xyz[low, 2])
    return xyz[:, 2] - reg.predict(xyz[:, :2])


def build_point_matrix(
    xyz: np.ndarray,
    rgb: np.ndarray,
    geof: np.ndarray,
    style: str = "s3dis",
    plane_elevation: bool = False,
    elevation: np.ndarray | None = None,
) -> np.ndarray:
    """The parsed per-point row matrix (column layout in loader.py)."""
    xyz = np.asarray(xyz, np.float32)
    rgbn = np.asarray(rgb, np.float32) / 255.0 - 0.5
    if elevation is None:
        elevation = (
            elevation_plane(xyz) if plane_elevation else elevation_simple(xyz)
        )
    e = elevation[:, None].astype(np.float32)
    if style == "sema3d":
        lpsv = geof.astype(np.float32) - 0.5
        return np.concatenate([xyz, rgbn, e, lpsv], axis=1).astype(np.float32)

    if style == "vkitti":
        lpsv = np.zeros((len(xyz), 4), np.float32)
    else:
        lpsv = geof.astype(np.float32) - 0.5
    room_center = xyz[:, :2].mean(0)
    d = np.sqrt(((xyz[:, :2] - room_center) ** 2).sum(1))
    d = (d - d.mean()) / (d.std() + 1e-10)
    mi, ma = xyz.min(0, keepdims=True), xyz.max(0, keepdims=True)
    xyzn = (xyz - mi) / (ma - mi + 1e-8)
    cols = [xyz, rgbn, e, lpsv, xyzn]
    if style == "s3dis":
        cols.append(d[:, None])
    return np.concatenate(cols, axis=1).astype(np.float32)


def write_parsed(
    path: str,
    P: np.ndarray,
    components,
    centroid=None,
    max_pts: int = 10000,
    seed: int = 0,
):
    """Write parsed/<name>.h5: one dataset per component (<= max_pts rows)."""
    rnd = random.Random(seed)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as hf:
        hf.create_dataset(
            "centroid", data=P[:, :3].mean(0) if centroid is None else centroid
        )
        for c, idx in enumerate(components):
            idx = np.asarray(idx).ravel()
            if idx.size > max_pts:
                idx = idx[rnd.sample(range(idx.size), k=max_pts)]
            hf.create_dataset(str(c), data=P[idx, :])


def write_class_count(path: str, class_count: np.ndarray):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("class_count", data=class_count, dtype="int")


def read_class_count(path: str) -> np.ndarray:
    with h5py.File(path, "r") as f:
        return f["class_count"][:]


def preprocess_pointclouds(
    root: str,
    dataset: str = "s3dis",
    n_classes: int = 13,
    supervized: bool = False,
    plane_elevation: bool = False,
):
    """Walk <root>/superpoint_graphs/*, build parsed/ caches + class_count.h5
    (reference s3dis_dataset.py:93-162 and the sema3d/vkitti variants)."""
    import h5py

    spg_root = os.path.join(root, "superpoint_graphs")
    feat_dirname = "features_supervision" if supervized else "features"
    folders = sorted(
        d for d in os.listdir(spg_root)
        if os.path.isdir(os.path.join(spg_root, d))
    )
    n_folds = max(len(folders), 1)
    class_count = np.zeros((n_classes, n_folds), dtype="int64")
    for fi, folder in enumerate(folders):
        out_dir = os.path.join(root, "parsed", folder)
        os.makedirs(out_dir, exist_ok=True)
        for fname in sorted(os.listdir(os.path.join(spg_root, folder))):
            if not fname.endswith(".h5"):
                continue
            feat_path = os.path.join(root, feat_dirname, folder, fname)
            with h5py.File(feat_path, "r") as f:
                xyz = f["xyz"][:]
                rgb = f["rgb"][:].astype(np.float64)
                labels = f["labels"][:]
                if supervized:
                    geof = f["geof"][:]
                    elevation = f["elevation"][:]
                else:
                    geof = f["geof"][:]
                    elevation = None
            if labels.ndim > 1 and labels.shape[1] > 1:
                hard = np.argmax(labels[:, 1:], 1)
            else:
                hard = np.maximum(labels.astype(np.int64) - 1, 0)
            class_count[:, fi] += np.bincount(hard, minlength=n_classes)[:n_classes]

            P = build_point_matrix(
                xyz, rgb, geof, style=dataset,
                plane_elevation=plane_elevation, elevation=elevation,
            )
            with h5py.File(os.path.join(spg_root, folder, fname), "r") as f:
                numc = len(f["components"].keys())
                comps = [f[f"components/{c}"][:].ravel() for c in range(numc)]
            write_parsed(os.path.join(out_dir, fname), P, comps)
    write_class_count(
        os.path.join(root, "parsed", "class_count.h5"),
        class_count if n_folds > 1 else class_count[:, 0],
    )


def class_weights(class_count: np.ndarray, mode: str, fold_cols=None) -> np.ndarray:
    """none/proportional/sqrt weighting (s3dis_dataset.py:72-81)."""
    n_classes = class_count.shape[0]
    if mode == "none":
        return np.ones(n_classes, np.float32)
    counts = class_count
    if counts.ndim > 1:
        if fold_cols is not None:
            fold_cols = [c for c in fold_cols if c < counts.shape[1]]
            counts = counts[:, fold_cols]
        counts = counts.sum(1)
    w = counts.mean() / np.maximum(counts, 1)
    if mode == "sqrt":
        w = np.sqrt(w)
    return w.astype(np.float32)

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


def class_weights(class_count: np.ndarray, mode: str, fold_cols=None) -> np.ndarray:
    """none/proportional/sqrt weighting (s3dis_dataset.py:72-81)."""
    n_classes = class_count.shape[0]
    if mode == "none":
        return np.ones(n_classes, np.float32)
    counts = class_count
    if counts.ndim > 1:
        if fold_cols is not None:
            counts = counts[:, fold_cols]
        counts = counts.sum(1)
    w = counts.mean() / np.maximum(counts, 1)
    if mode == "sqrt":
        w = np.sqrt(w)
    return w.astype(np.float32)

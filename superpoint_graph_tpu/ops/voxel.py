"""Voxel-grid pruning of raw point clouds, TPU-first.

Behavioral spec from the reference C++ kernel `libply_c.prune`
(partition/ply_c/ply_c.cpp:288-380): bin points into a regular grid anchored at
the cloud min corner, then per non-empty voxel output the mean xyz (float), the
mean rgb truncated to uint8, the (n_labels+1)-bin label histogram and the
(n_objects+1)-bin object histogram. Voxel output order is the order in which a
voxel is *first touched* by the point scan (ply_c.cpp:172-183: indices handed
out on first insertion while iterating points in order).

TPU-first design: no hash map. Per-point int64 voxel keys → stable sort →
segment boundaries → dense segment ids → `segment_sum` accumulation, with a
final rank-by-first-point-index permutation to reproduce the reference's
first-occurrence ordering exactly. Everything is static-shape: the caller fixes
`max_voxels` and gets (padded arrays, n_voxels).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_voxels", "n_labels", "n_objects"))
def voxel_prune(
    xyz: jax.Array,
    voxel_size: float,
    rgb: jax.Array,
    labels: jax.Array,
    objects: jax.Array,
    *,
    max_voxels: int,
    n_labels: int,
    n_objects: int,
):
    """Prune a cloud to its occupied-voxel means.

    Args:
      xyz: [n, 3] float32. rgb: [n, 3] uint8 (or float). labels: [n] int32
        (pass zeros when n_labels == 0). objects: [n] int32 likewise.
      voxel_size: grid pitch (reference `--voxel_width`, default 0.03).
      max_voxels: static upper bound on occupied voxels (<= n).
      n_labels / n_objects: histogram sizes; 0 disables that histogram
        (zeros returned).

    Returns dict with:
      xyz [max_voxels, 3] f32, rgb [max_voxels, 3] f32 (mean, un-truncated),
      label_hist [max_voxels, n_labels+1] i32, object_hist [.., n_objects+1] i32,
      counts [max_voxels] i32, n_voxels () i32, point_voxel [n] i32 (the voxel id
      of each input point — used for label upsampling, something the reference
      recomputes by 1-NN search; keeping it is free here).
    """
    n = xyz.shape[0]
    mins = jnp.min(xyz, axis=0)
    # per-axis int32 bins + 3-key sort: a flattened key overflows int32 (this
    # jax build has no x64 — jnp "int64" silently truncates) already at a
    # 220 m scene with 0.1 m pitch (2200^3 keys), which collided voxels and
    # silently over-merged the prune
    bins = jnp.floor((xyz - mins[None, :]) / voxel_size).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    b0s, b1s, b2s, order = jax.lax.sort(
        (bins[:, 0], bins[:, 1], bins[:, 2], iota), num_keys=3
    )
    head = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            ((b0s[1:] != b0s[:-1]) | (b1s[1:] != b1s[:-1])
             | (b2s[1:] != b2s[:-1])).astype(jnp.int32),
        ]
    )
    seg_sorted = jnp.cumsum(head) - 1  # dense id in key order
    n_voxels = seg_sorted[-1] + 1
    # per-point (original order) key-ordered voxel id
    seg = jnp.zeros((n,), jnp.int32).at[order].set(seg_sorted.astype(jnp.int32))

    # reproduce first-occurrence ordering: rank key-ordered voxels by the min
    # original point index that touches them
    first_idx = jax.ops.segment_min(
        jnp.arange(n, dtype=jnp.int32), seg, num_segments=max_voxels
    )  # padding segments get int32 max
    occ_rank_perm = jnp.argsort(first_idx)  # occurrence-order -> key-order id
    inv = jnp.zeros((max_voxels,), jnp.int32).at[occ_rank_perm].set(
        jnp.arange(max_voxels, dtype=jnp.int32)
    )  # key-order id -> occurrence-order id
    vox = inv[seg]  # final per-point voxel id, first-occurrence ordering

    ones = jnp.ones((n,), jnp.int32)
    counts = jax.ops.segment_sum(ones, vox, num_segments=max_voxels)
    cnt_f = jnp.maximum(counts, 1).astype(jnp.float32)[:, None]
    sum_xyz = jax.ops.segment_sum(xyz, vox, num_segments=max_voxels)
    sum_rgb = jax.ops.segment_sum(
        rgb.astype(jnp.float32), vox, num_segments=max_voxels
    )

    if n_labels > 0:
        lab_oh = jax.nn.one_hot(labels, n_labels + 1, dtype=jnp.int32)
        label_hist = jax.ops.segment_sum(lab_oh, vox, num_segments=max_voxels)
    else:
        label_hist = jnp.zeros((max_voxels, 1), jnp.int32)
    if n_objects > 0:
        obj_oh = jax.nn.one_hot(objects, n_objects + 1, dtype=jnp.int32)
        object_hist = jax.ops.segment_sum(obj_oh, vox, num_segments=max_voxels)
    else:
        object_hist = jnp.zeros((max_voxels, 1), jnp.int32)

    return {
        "xyz": sum_xyz / cnt_f,
        "rgb": sum_rgb / cnt_f,
        "label_hist": label_hist,
        "object_hist": object_hist,
        "counts": counts,
        "n_voxels": n_voxels,
        "point_voxel": vox,
    }


# above this row count the device prune's sort transients crowd HBM (a ~5e7
# global re-prune OOMed a 16 GB chip) — and the padded upload over the
# tunneled TPU costs more than a host radix sort anyway
PRUNE_DEVICE_MAX = 20_000_000


def prune_host(xyz, voxel_size, rgb, labels, objects, n_labels, n_objects):
    """Host numpy prune with the same contract/semantics as `prune`
    (first-occurrence voxel order, mean xyz, truncated mean rgb, label and
    object histograms; reference libply_c.prune, ply_c.cpp:288-380).

    numpy int64 keys never overflow (the device path needs per-axis int32
    keys, CLAUDE.md); one flat-key argsort + sorted reduceat. Used for
    giant concatenated clouds (the 1e8-raw Semantic3D chain's global
    re-prune) where the device path cannot stage the sort."""
    xyz = np.ascontiguousarray(xyz, np.float64)
    n = len(xyz)
    mins = xyz.min(0)
    bins = np.floor((xyz - mins) / float(voxel_size)).astype(np.int64)
    dims = bins.max(0) + 1
    key = (bins[:, 0] * dims[1] + bins[:, 1]) * dims[2] + bins[:, 2]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    head = np.empty(n, bool)
    head[0] = True
    np.not_equal(key_s[1:], key_s[:-1], out=head[1:])
    starts = np.flatnonzero(head)
    m = len(starts)
    counts = np.diff(np.append(starts, n))
    # first-occurrence order: stable sort => the first row of each segment
    # holds that voxel's smallest original index
    first_idx = order[starts]
    rank = np.argsort(np.argsort(first_idx, kind="stable"), kind="stable")

    def seg_mean(a):
        s = np.add.reduceat(a[order], starts, axis=0)
        return s / counts[:, None]

    out_xyz = np.empty((m, 3), np.float32)
    out_xyz[rank] = seg_mean(xyz).astype(np.float32)
    if rgb is None or np.size(rgb) == 0:
        rgb = np.zeros((n, 3), np.float64)
    rgb = np.asarray(rgb, np.float64)
    out_rgb = np.empty((m, 3), np.uint8)
    out_rgb[rank] = seg_mean(rgb).astype(np.uint8)  # trunc like C++ cast

    seg_of_point = np.empty(n, np.int64)
    seg_of_point[order] = rank[np.cumsum(head) - 1]
    # histogram width follows n_labels like the device and native paths:
    # labels None just counts everything into class 0 (width n_labels+1,
    # NOT (m, 1) — the h5 schema width is part of the byte-compat contract)
    if n_labels > 0:
        hist = np.zeros((m, n_labels + 1), np.uint32)
        lab = (
            np.asarray(labels, np.int64)
            if labels is not None and np.size(labels)
            else np.zeros(n, np.int64)
        )
        np.add.at(hist, (seg_of_point, lab), 1)
    else:
        hist = np.zeros((m, 1), np.uint32)
    if n_objects > 0:
        ohist = np.zeros((m, n_objects + 1), np.uint32)
        obj = (
            np.asarray(objects, np.int64)
            if objects is not None and np.size(objects)
            else np.zeros(n, np.int64)
        )
        np.add.at(ohist, (seg_of_point, obj), 1)
    else:
        ohist = np.zeros((m, 1), np.uint32)
    return out_xyz, out_rgb, hist, ohist


def prune(xyz, voxel_size, rgb, labels, objects, n_labels, n_objects):
    """Host-convenience wrapper with the reference `libply_c.prune` signature
    (ply_c.cpp:497-505): returns trimmed numpy (xyz f32, rgb u8, label_hist u32,
    object_hist u32) in first-occurrence voxel order.

    The cloud is padded to a power-of-two bucket so differently-sized clouds
    share one compiled executable: all pad points sit at one far coordinate,
    forming exactly one trailing voxel (first-occurrence order puts it last)
    that is sliced away."""
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    n = xyz.shape[0]
    if n > PRUNE_DEVICE_MAX:
        # beyond the device path: the C++ hash-grid prune (native, OpenMP-free
        # single pass) is ~11x the numpy argsort path at 5e6 rows (2.4 s vs
        # 27 s measured) — the 1e8-raw headline chain's prune budget
        from .. import native

        if native.available():
            return native.prune(
                xyz, voxel_size, rgb, labels, objects, n_labels, n_objects
            )
        return prune_host(
            xyz, voxel_size, rgb, labels, objects, n_labels, n_objects
        )
    if labels is None or np.size(labels) == 0:
        labels = np.zeros((n,), np.int32)
    if objects is None or np.size(objects) == 0:
        objects = np.zeros((n,), np.int32)
    rgb = np.asarray(rgb)
    labels = np.asarray(labels).astype(np.int32)
    objects = np.asarray(objects).astype(np.int32)
    n_pad = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
    pad = n_pad - n
    if pad:
        # pad just beyond the real max so the grid extent (and the f32->i32
        # bin cast) stays small — a 1e8 sentinel blew the bin range past
        # int32 and collided real voxels
        far = float(xyz.max()) + 2.0 * float(voxel_size)
        xyz = np.concatenate([xyz, np.full((pad, 3), far, np.float32)])
        rgb = np.concatenate([rgb, np.zeros((pad, 3), rgb.dtype)])
        labels = np.concatenate([labels, np.zeros(pad, np.int32)])
        objects = np.concatenate([objects, np.zeros(pad, np.int32)])
    out = voxel_prune(
        jnp.asarray(xyz),
        float(voxel_size),
        jnp.asarray(rgb),
        jnp.asarray(labels, dtype=jnp.int32),
        jnp.asarray(objects, dtype=jnp.int32),
        max_voxels=n_pad,
        n_labels=int(n_labels),
        n_objects=int(n_objects),
    )
    m = int(out["n_voxels"]) - (1 if pad else 0)
    pruned_xyz = np.asarray(out["xyz"])[:m]
    pruned_rgb = np.asarray(out["rgb"])[:m].astype(np.uint8)  # trunc like C++ cast
    label_hist = np.asarray(out["label_hist"])[:m].astype(np.uint32)
    object_hist = np.asarray(out["object_hist"])[:m].astype(np.uint32)
    return pruned_xyz, pruned_rgb, label_hist, object_hist

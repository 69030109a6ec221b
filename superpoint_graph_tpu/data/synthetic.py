"""Synthetic indoor-scene point clouds and SPG batches.

No datasets ship with either repo; the reference's de-facto integration test is
running real S3DIS recipes (SURVEY.md §4). For hermetic tests and benchmarks we
generate S3DIS-like rooms: floor/ceiling/wall planes, box 'furniture' and
scattered 'clutter', with per-object labels — enough geometric structure that
the partition stage produces meaningful superpoints.
"""
from __future__ import annotations

import numpy as np

N_CLASSES = 6  # floor, ceiling, wall, box, clutter, beam


def synthetic_room(
    rng: np.random.RandomState,
    n_points: int = 20000,
    size=(4.0, 3.0, 2.5),
    noise: float = 0.01,
    clutter_blobs: bool = False,
):
    """Returns (xyz f32 [n,3], rgb u8 [n,3], labels i32 [n], objects i32 [n]).

    labels are semantic class ids in [0, N_CLASSES) shifted by +1 on return=no;
    here: raw class ids 0..N_CLASSES-1 (callers add the reference's 0=unlabeled
    shift where the h5 contract needs it). objects are instance ids >= 0.
    """
    sx, sy, sz = size
    parts = []

    def plane(n, fixed_axis, fixed_val, label, obj):
        p = rng.rand(n, 3)
        p[:, 0] *= sx
        p[:, 1] *= sy
        p[:, 2] *= sz
        p[:, fixed_axis] = fixed_val
        return p, np.full(n, label), np.full(n, obj)

    budget = n_points
    # floor, ceiling, 4 walls
    specs = [
        (0.22, 2, 0.0, 0, 0),
        (0.18, 2, sz, 1, 1),
        (0.1, 0, 0.0, 2, 2),
        (0.1, 0, sx, 2, 3),
        (0.1, 1, 0.0, 2, 4),
        (0.1, 1, sy, 2, 5),
    ]
    obj_id = 6
    for frac, ax, val, lab, obj in specs:
        n = int(n_points * frac)
        parts.append(plane(n, ax, val, lab, obj))
        budget -= n

    # boxes (furniture)
    n_boxes = 3
    for b in range(n_boxes):
        n = budget // (n_boxes + 1)
        cx, cy = rng.rand() * (sx - 1) + 0.5, rng.rand() * (sy - 1) + 0.5
        w, d, h = 0.3 + rng.rand() * 0.5, 0.3 + rng.rand() * 0.5, 0.3 + rng.rand() * 0.8
        p = rng.rand(n, 3) - 0.5
        # project onto box surface: pick a face per point
        face = rng.randint(0, 6, n)
        for f in range(6):
            m = face == f
            p[m, f // 2] = 0.5 * (1 if f % 2 else -1)
        p *= [w, d, h]
        p += [cx, cy, h / 2]
        parts.append((p, np.full(n, 3), np.full(n, obj_id)))
        obj_id += 1
        budget -= n

    # clutter: uniform volumetric fill by default (historic behavior — it
    # interleaves with every surface, capping the per-voxel ASA oracle at
    # ~55%); clutter_blobs=True clusters it into compact instances like real
    # S3DIS clutter, for harnesses that measure partition quality (ASA/BR)
    if clutter_blobs:
        n_blobs = max(1, budget // 150)
        centers = rng.rand(n_blobs, 3) * [sx, sy, sz * 0.5]
        asg = rng.randint(0, n_blobs, budget)
        p = centers[asg] + rng.randn(budget, 3) * 0.08
        parts.append((p, np.full(budget, 4), obj_id + asg))
        obj_id += n_blobs
    else:
        p = rng.rand(budget, 3) * [sx, sy, sz * 0.5]
        parts.append((p, np.full(budget, 4), np.full(budget, obj_id)))

    xyz = np.concatenate([p for p, _, _ in parts]).astype(np.float32)
    labels = np.concatenate([l for _, l, _ in parts]).astype(np.int32)
    objects = np.concatenate([o for _, _, o in parts]).astype(np.int32)
    xyz += rng.randn(*xyz.shape).astype(np.float32) * noise
    # colors correlated with labels + noise
    palette = (np.array(
        [[200, 180, 160], [220, 220, 220], [170, 170, 190],
         [140, 100, 60], [90, 140, 90], [120, 120, 200]]
    ))
    rgb = palette[labels] + rng.randn(len(labels), 3) * 12
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    perm = rng.permutation(len(xyz))
    return xyz[perm], rgb[perm], labels[perm], objects[perm]


def random_spg_batch(
    rng: np.random.RandomState,
    n_sp: int = 32,
    n_sp_pad: int = 40,
    n_pts: int = 128,
    n_ch: int = 11,
    n_edges: int = 96,
    n_edges_pad: int = 128,
    n_classes: int = N_CLASSES,
    edge_feats_dim: int = 13,
):
    """A random padded SpgBatch (numpy) for model/trainer tests."""
    import jax.numpy as jnp

    from ..models.spgmodel import SpgBatch

    clouds = rng.randn(n_sp_pad, n_pts, n_ch).astype(np.float32)
    clouds_global = rng.rand(n_sp_pad, 1).astype(np.float32)
    cloud_mask = np.zeros(n_sp_pad, bool)
    cloud_mask[:n_sp] = rng.rand(n_sp) > 0.1  # some too-small superpoints
    node_mask = np.zeros(n_sp_pad, bool)
    node_mask[:n_sp] = True
    targets = np.full(n_sp_pad, -100, np.int32)
    targets[:n_sp] = rng.randint(0, n_classes, n_sp)
    tsize = np.zeros((n_sp_pad, n_classes + 1), np.int32)
    tsize[np.arange(n_sp), targets[:n_sp] + 1] = rng.randint(1, 50, n_sp)
    src = np.zeros(n_edges_pad, np.int32)
    tgt = np.zeros(n_edges_pad, np.int32)
    src[:n_edges] = rng.randint(0, n_sp, n_edges)
    tgt[:n_edges] = rng.randint(0, n_sp, n_edges)
    edge_feats = np.zeros((n_edges_pad, edge_feats_dim), np.float32)
    edge_feats[:n_edges] = rng.randn(n_edges, edge_feats_dim)
    edge_mask = np.zeros(n_edges_pad, bool)
    edge_mask[:n_edges] = True
    return SpgBatch(
        clouds=jnp.asarray(clouds),
        clouds_global=jnp.asarray(clouds_global),
        cloud_mask=jnp.asarray(cloud_mask),
        node_mask=jnp.asarray(node_mask),
        targets=jnp.asarray(targets),
        target_size=jnp.asarray(tsize),
        src=jnp.asarray(src),
        tgt=jnp.asarray(tgt),
        edge_feats=jnp.asarray(edge_feats),
        edge_mask=jnp.asarray(edge_mask),
    )


def big_scene(n_points: int, seed: int = 0) -> np.ndarray:
    """Semantic3D-scale synthetic scan: a grid of `synthetic_room` tiles
    (surface geometry, non-uniform density), ~n_points total. The shared
    generator behind the giant-cloud tools and bench.py's big-path leg."""
    xyz, _, _ = big_scene_labeled(n_points, seed)
    return xyz


def big_scene_labeled(n_points: int, seed: int = 0):
    """`big_scene` with per-point semantic labels and GLOBAL instance ids
    (object ids offset per room tile) — the ground truth the at-scale
    partition-quality receipts (OOA/BR/BP) need."""
    rng = np.random.RandomState(seed)
    per_room = 250_000
    n_rooms = max(1, n_points // per_room)
    side = int(np.ceil(np.sqrt(n_rooms)))
    parts, labs, objs = [], [], []
    obj_base = 0
    for r in range(n_rooms):
        xyz, _, lab, obj = synthetic_room(
            rng, n_points=min(per_room, n_points - r * per_room)
        )
        off = np.array(
            [(r % side) * 4.5, (r // side) * 3.5, 0.0], np.float32
        )
        parts.append(xyz + off)
        labs.append(lab)
        objs.append(obj + obj_base)
        obj_base += int(obj.max()) + 1
    return (
        np.concatenate(parts).astype(np.float32),
        np.concatenate(labs).astype(np.int32),
        np.concatenate(objs).astype(np.int32),
    )

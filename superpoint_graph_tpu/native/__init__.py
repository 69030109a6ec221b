"""ctypes bindings for the C++ parity library (native/spgt_native.cpp).

Drop-in equivalents of the reference's native layer:
  prune            <- libply_c.prune          (ply_c.cpp:497-505)
  compute_geof     <- libply_c.compute_geof
  connected_comp   <- libply_c.connected_comp
  random_subgraph  <- libply_c.random_subgraph
  cutpursuit       <- libcp.cutpursuit

The library is built on first use (`make -C native/`) if the .so is missing;
`available()` reports whether the toolchain produced it. The JAX ops remain
the production TPU path; this is the exact oracle / CPU fallback the
reference's users expect to exist natively.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libspgt_native.so"))
_LIB = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
        return os.path.isfile(_SO_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.isfile(_SO_PATH) and not _build():
        raise RuntimeError("native library unavailable (build failed)")
    lib = ctypes.CDLL(_SO_PATH)
    u64, i64, i32, f32 = (ctypes.c_uint64, ctypes.c_int64, ctypes.c_int32,
                          ctypes.c_float)
    P = ctypes.POINTER
    lib.spgt_prune.restype = u64
    lib.spgt_prune.argtypes = [
        P(f32), u64, f32, P(ctypes.c_uint8), P(i32), P(i32), i32, i32,
        P(f32), P(f32), P(ctypes.c_uint32), P(ctypes.c_uint32),
        P(ctypes.c_uint32), P(i32),
    ]
    lib.spgt_compute_geof.restype = None
    lib.spgt_compute_geof.argtypes = [P(f32), P(ctypes.c_uint32), u64, i32, P(f32)]
    lib.spgt_connected_comp.restype = i64
    lib.spgt_connected_comp.argtypes = [
        i64, i64, P(ctypes.c_uint32), P(ctypes.c_uint32), P(ctypes.c_uint8),
        i32, P(i32),
    ]
    lib.spgt_random_subgraph.restype = None
    lib.spgt_random_subgraph.argtypes = [
        i64, i64, P(ctypes.c_uint32), P(ctypes.c_uint32), i64,
        ctypes.c_uint32, P(ctypes.c_uint8), P(ctypes.c_uint8),
    ]
    lib.spgt_cutpursuit.restype = i64
    lib.spgt_cutpursuit.argtypes = [
        P(f32), i64, i32, i64, P(ctypes.c_uint32), P(ctypes.c_uint32),
        P(f32), P(f32), f32, i32, i32, i32, P(i32),
    ]
    lib.spgt_greedy_matching.restype = u64
    lib.spgt_greedy_matching.argtypes = [
        P(i64), P(i64), u64, u64, P(ctypes.c_uint8),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except RuntimeError:
        return False


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def prune(xyz, voxel_size, rgb, labels, objects, n_labels, n_objects):
    """libply_c.prune parity: (xyz f32, rgb u8, label_hist u32, obj_hist u32)."""
    lib = _lib()
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    rgb = np.ascontiguousarray(
        rgb if rgb is not None else np.zeros((n, 3)), np.uint8
    )
    labels = np.ascontiguousarray(
        labels if labels is not None and np.size(labels) else np.zeros(n),
        np.int32,
    )
    objects = np.ascontiguousarray(
        objects if objects is not None and np.size(objects) else np.zeros(n),
        np.int32,
    )
    out_xyz = np.zeros((n, 3), np.float32)
    out_rgb = np.zeros((n, 3), np.float32)
    lh = np.zeros((n, n_labels + 1), np.uint32)
    oh = np.zeros((n, n_objects + 1), np.uint32)
    counts = np.zeros(n, np.uint32)
    pv = np.zeros(n, np.int32)
    m = lib.spgt_prune(
        _ptr(xyz, ctypes.c_float), n, voxel_size, _ptr(rgb, ctypes.c_uint8),
        _ptr(labels, ctypes.c_int32), _ptr(objects, ctypes.c_int32),
        n_labels, n_objects, _ptr(out_xyz, ctypes.c_float),
        _ptr(out_rgb, ctypes.c_float), _ptr(lh, ctypes.c_uint32),
        _ptr(oh, ctypes.c_uint32), _ptr(counts, ctypes.c_uint32),
        _ptr(pv, ctypes.c_int32),
    )
    return (out_xyz[:m], out_rgb[:m].astype(np.uint8), lh[:m], oh[:m])


def compute_geof(xyz, neighbors, k_nn):
    lib = _lib()
    xyz = np.ascontiguousarray(xyz, np.float32)
    nbrs = np.ascontiguousarray(np.asarray(neighbors).reshape(len(xyz), k_nn),
                                np.uint32)
    out = np.zeros((len(xyz), 4), np.float32)
    lib.spgt_compute_geof(
        _ptr(xyz, ctypes.c_float), _ptr(nbrs, ctypes.c_uint32), len(xyz),
        k_nn, _ptr(out, ctypes.c_float),
    )
    return out


def connected_comp(n_ver, source, target, active_edge, cutoff):
    lib = _lib()
    src = np.ascontiguousarray(source, np.uint32)
    tgt = np.ascontiguousarray(target, np.uint32)
    act = np.ascontiguousarray(active_edge, np.uint8)
    out = np.zeros(n_ver, np.int32)
    n_comp = lib.spgt_connected_comp(
        n_ver, len(src), _ptr(src, ctypes.c_uint32), _ptr(tgt, ctypes.c_uint32),
        _ptr(act, ctypes.c_uint8), cutoff, _ptr(out, ctypes.c_int32),
    )
    from ..ops.components import group_components

    return group_components(out, n_comp), out


def random_subgraph(n_ver, source, target, subgraph_size, seed=0):
    lib = _lib()
    src = np.ascontiguousarray(source, np.uint32)
    tgt = np.ascontiguousarray(target, np.uint32)
    edge_sel = np.zeros(len(src), np.uint8)
    ver_sel = np.zeros(n_ver, np.uint8)
    lib.spgt_random_subgraph(
        n_ver, len(src), _ptr(src, ctypes.c_uint32), _ptr(tgt, ctypes.c_uint32),
        subgraph_size, seed, _ptr(edge_sel, ctypes.c_uint8),
        _ptr(ver_sel, ctypes.c_uint8),
    )
    return edge_sel.astype(bool), ver_sel.astype(bool)


def cutpursuit(features, source, target, edge_weight, reg_strength,
               cutoff=0, spatial=False, weight_decay=0.7, node_weight=None,
               max_iter=10, flow_steps=3):
    """libcp.cutpursuit parity: (components, in_component)."""
    del spatial, weight_decay
    lib = _lib()
    f = np.ascontiguousarray(features, np.float32)
    if f.ndim == 1:
        f = f[:, None]
    n, d = f.shape
    src = np.ascontiguousarray(source, np.uint32)
    tgt = np.ascontiguousarray(target, np.uint32)
    ew = np.ascontiguousarray(edge_weight, np.float32)
    nw = np.ascontiguousarray(
        node_weight if node_weight is not None else np.ones(n), np.float32
    )
    out = np.zeros(n, np.int32)
    n_comp = lib.spgt_cutpursuit(
        _ptr(f, ctypes.c_float), n, d, len(src), _ptr(src, ctypes.c_uint32),
        _ptr(tgt, ctypes.c_uint32), _ptr(ew, ctypes.c_float),
        _ptr(nw, ctypes.c_float), reg_strength, cutoff, max_iter, flow_steps,
        _ptr(out, ctypes.c_int32),
    )
    from ..ops.components import group_components

    return group_components(out, n_comp), out


def greedy_matching(a, b, n_comp):
    """Accept mask for ordered merge candidates: candidate i is accepted iff
    neither region a[i] nor b[i] was touched by an earlier accepted one
    (the merge_rounds conflict rule, ops/cutpursuit.py)."""
    lib = _lib()
    a = np.ascontiguousarray(a, np.int64)
    b = np.ascontiguousarray(b, np.int64)
    accept = np.zeros(len(a), np.uint8)
    lib.spgt_greedy_matching(
        _ptr(a, ctypes.c_int64), _ptr(b, ctypes.c_int64), len(a),
        int(n_comp), _ptr(accept, ctypes.c_uint8),
    )
    return accept.astype(bool)

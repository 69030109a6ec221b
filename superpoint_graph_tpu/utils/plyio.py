"""Minimal self-contained PLY I/O (no external plyfile dependency).

Supports ASCII and binary_little_endian vertex-only files with
float/uchar/int properties — everything the visualization exporters and the
custom-dataset reader need.
"""
from __future__ import annotations

import numpy as np

_PLY_TO_NP = {
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
}
_NP_TO_PLY = {"f4": "float", "f8": "double", "u1": "uchar", "i1": "char",
              "i2": "short", "u2": "ushort", "i4": "int", "u4": "uint"}


def _to_rec(arrays: dict):
    names = list(arrays)
    n = len(arrays[names[0]])
    cols = {k: np.asarray(v) for k, v in arrays.items()}
    dtype = [(k, cols[k].dtype.str.lstrip("<>|")) for k in names]
    rec = np.zeros(n, dtype=dtype)
    for k in names:
        rec[k] = cols[k]
    return rec, dtype


def _ascii_lines(rec, dtype):
    out = []
    for k, d in dtype:
        col = rec[k]
        out.append(
            np.char.mod("%d", col)
            if d.startswith(("u", "i"))
            else np.char.mod("%.6g", col)
        )
    lines = out[0]
    for c in out[1:]:
        lines = np.char.add(np.char.add(lines, " "), c)
    return lines


def write_ply_elements(filename: str, elements: dict, text: bool = True):
    """Write a multi-element ply, e.g.
    write_ply_elements(f, {"vertex": {"x": ..}, "edge": {"vertex1": ..}}).
    Element order follows dict order (reference spg2ply writes vertex then
    edge, provider.py:100-122)."""
    recs = {name: _to_rec(arrays) for name, arrays in elements.items()}
    fmt = "ascii" if text else "binary_little_endian"
    header = ["ply", f"format {fmt} 1.0"]
    for name, (rec, dtype) in recs.items():
        header.append(f"element {name} {len(rec)}")
        for k, d in dtype:
            header.append(f"property {_NP_TO_PLY[d]} {k}")
    header.append("end_header")
    with open(filename, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        for name, (rec, dtype) in recs.items():
            if text:
                lines = _ascii_lines(rec, dtype)
                if len(lines):
                    f.write(("\n".join(lines) + "\n").encode())
            else:
                f.write(rec.tobytes())


def write_ply(filename: str, arrays: dict, text: bool = True):
    """Write named per-vertex properties, e.g.
    write_ply(f, {"x": ..., "y": ..., "z": ..., "red": ...})."""
    write_ply_elements(filename, {"vertex": arrays}, text=text)


def read_ply_elements(filename: str) -> dict:
    """Read all elements: {element_name: {prop_name: array}}."""
    with open(filename, "rb") as f:
        line = f.readline().decode().strip()
        if line != "ply":
            raise ValueError(f"{filename} is not a ply file")
        fmt = None
        order = []  # (name, count, [(pname, np_dtype)])
        while True:
            line = f.readline().decode().strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                order.append((name, int(cnt), []))
            elif line.startswith("property"):
                _, t, pname = line.split()
                order[-1][2].append((pname, _PLY_TO_NP[t]))
            elif line == "end_header":
                break
        result = {}
        if fmt == "ascii":
            lines = f.read().decode().splitlines()
            row = 0
            for name, n, props in order:
                rec = np.zeros(n, dtype=np.dtype(props))
                if n:
                    data = np.atleast_2d(
                        np.loadtxt(lines[row : row + n], dtype=np.float64,
                                   ndmin=2)
                    )
                    for i, (pname, _) in enumerate(props):
                        rec[pname] = data[:, i]
                row += n
                result[name] = {
                    pname: np.array(rec[pname]) for pname, _ in props
                }
        else:
            for name, n, props in order:
                dtype = np.dtype(props)
                rec = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype)
                result[name] = {
                    pname: np.array(rec[pname]) for pname, _ in props
                }
        return result


def read_ply(filename: str) -> dict:
    """Read vertex properties into a dict of numpy arrays."""
    return read_ply_elements(filename)["vertex"]

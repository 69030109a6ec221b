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


def write_ply(filename: str, arrays: dict, text: bool = True):
    """Write named per-vertex properties, e.g.
    write_ply(f, {"x": ..., "y": ..., "z": ..., "red": ...})."""
    names = list(arrays)
    n = len(arrays[names[0]])
    cols = {k: np.asarray(v) for k, v in arrays.items()}
    dtype = [(k, cols[k].dtype.str.lstrip("<>|")) for k in names]
    rec = np.zeros(n, dtype=dtype)
    for k in names:
        rec[k] = cols[k]
    fmt = "ascii" if text else "binary_little_endian"
    header = ["ply", f"format {fmt} 1.0", f"element vertex {n}"]
    for k, d in dtype:
        header.append(f"property {_NP_TO_PLY[d]} {k}")
    header.append("end_header")
    with open(filename, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if text:
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
            f.write(("\n".join(lines) + "\n").encode())
        else:
            f.write(rec.tobytes())


def read_ply(filename: str) -> dict:
    """Read vertex properties into a dict of numpy arrays."""
    with open(filename, "rb") as f:
        line = f.readline().decode().strip()
        if line != "ply":
            raise ValueError(f"{filename} is not a ply file")
        fmt = None
        n = 0
        props = []
        in_vertex = False
        while True:
            line = f.readline().decode().strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                in_vertex = name == "vertex"
                if in_vertex:
                    n = int(cnt)
            elif line.startswith("property") and in_vertex:
                _, t, pname = line.split()
                props.append((pname, _PLY_TO_NP[t]))
            elif line == "end_header":
                break
        dtype = np.dtype(props)
        if fmt == "ascii":
            data = np.loadtxt(f, dtype=np.float64, max_rows=n)
            data = np.atleast_2d(data)
            rec = np.zeros(n, dtype=dtype)
            for i, (pname, _) in enumerate(props):
                rec[pname] = data[:, i]
        else:
            rec = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype)
        return {pname: np.array(rec[pname]) for pname, _ in props}

"""SPG h5 loading + edge-feature assembly + scaling.

Behavioral spec from reference learning/spg.py:
  * spg_reader (66-103): node GT = argmax of the label histogram's labeled
    columns with -100 for all-unlabeled superpoints; nlength clamped >= 0;
    surface/volume are SQUARED then clamped (81-84 — the h5 stores sqrt'd
    values); optional spg_superedge_cutoff filter on |delta_avg|.
  * spg_edge_features (23-49): token DSL over --edge_attribs with /d
    (difference), /ld (log-ratio), /r (ratio) modifiers.
  * scaler01 (51-64): StandardScaler fit on train edge features, applied
    everywhere, checkpointed for inference.
"""
from __future__ import annotations

import os

import h5py
import numpy as np


def spg_edge_features(edges, node_att, edge_att, edge_attribs: str):
    columns = []
    for attrib in edge_attribs.split(","):
        parts = attrib.split("/")
        a = parts[0]
        opt = parts[1].lower() if len(parts) == 2 else ""
        if a in ("delta_avg", "delta_std"):
            columns.append(edge_att[a])
        elif a == "constant":
            columns.append(np.ones((edges.shape[0], 1), dtype=np.float32))
        elif a in ("nlength", "surface", "volume", "size", "xyz"):
            attr = node_att[a]
            if opt == "d":
                attr = attr[edges[:, 0], :] - attr[edges[:, 1], :]
            elif opt == "ld":
                attr = np.log(attr + 1e-10)
                attr = attr[edges[:, 0], :] - attr[edges[:, 1], :]
            elif opt == "r":
                attr = attr[edges[:, 0], :] / (attr[edges[:, 1], :] + 1e-10)
            else:
                raise NotImplementedError(f"missing modifier on {attrib}")
            columns.append(attr)
        else:
            raise NotImplementedError(f"unknown edge attribute {a}")
    return np.concatenate(columns, axis=1).astype(np.float32)


def spg_reader(fname: str, edge_attribs: str, spg_superedge_cutoff: float = -1,
               incl_dir_in_name: bool = False):
    """Load a superpoint graph from h5; returns
    (node_gt [n,1], node_gt_size [n,C+1], edges [E,2], edge_feats [E,F], name)."""
    with h5py.File(fname, "r") as f:
        if f["sp_labels"].size > 0:
            node_gt_size = f["sp_labels"][:].astype(np.int64)
            node_gt = np.argmax(node_gt_size[:, 1:], 1)[:, None]
            node_gt[node_gt_size[:, 1:].sum(1) == 0, :] = -100
        else:
            n = f["sp_point_count"].shape[0]
            node_gt_size = np.concatenate(
                [f["sp_point_count"][:].astype(np.int64).reshape(n, 1),
                 np.zeros((n, 8), dtype=np.int64)], 1
            )
            node_gt = np.zeros((n, 1), dtype=np.int64)

        node_att = {
            "xyz": f["sp_centroids"][:],
            "nlength": np.maximum(0, f["sp_length"][:]),
            "volume": np.maximum(0, f["sp_volume"][:] ** 2),
            "surface": np.maximum(0, f["sp_surface"][:] ** 2),
            "size": f["sp_point_count"][:].astype(np.float32).reshape(-1, 1),
        }
        edges = np.concatenate([f["source"][:], f["target"][:]], axis=1).astype(
            np.int64
        )
        edge_att = {
            "delta_avg": f["se_delta_mean"][:],
            "delta_std": f["se_delta_std"][:],
        }

    if spg_superedge_cutoff > 0:
        keep = np.linalg.norm(edge_att["delta_avg"], axis=1) < spg_superedge_cutoff
        edges = edges[keep, :]
        edge_att = {k: v[keep, :] for k, v in edge_att.items()}

    edge_feats = spg_edge_features(edges, node_att, edge_att, edge_attribs)
    name = os.path.basename(fname)[: -len(".h5")]
    if incl_dir_in_name:
        name = os.path.basename(os.path.dirname(fname)) + "/" + name
    return node_gt, node_gt_size, edges, edge_feats, name


class EdgeFeatScaler:
    """StandardScaler over edge features (spg.py:51-64), checkpointable."""

    def __init__(self, mean=None, scale=None):
        self.mean = mean
        self.scale = scale

    def fit(self, graph_list):
        feats = np.concatenate([g[3] for g in graph_list], 0)
        self.mean = feats.mean(0)
        std = feats.std(0)
        self.scale = np.where(std == 0, 1.0, std)
        return self

    def transform(self, edge_feats):
        return ((edge_feats - self.mean) / self.scale).astype(np.float32)

    def state_dict(self):
        return {"mean": self.mean, "scale": self.scale}

    @classmethod
    def from_state(cls, state):
        return cls(np.asarray(state["mean"]), np.asarray(state["scale"]))


def scaler01(trainlist, testlist, transform_train=True, validlist=()):
    """Fit on train, transform all splits in place (tuple index 3)."""
    scaler = EdgeFeatScaler().fit(trainlist)

    def apply(lst):
        return [
            (g[0], g[1], g[2], scaler.transform(g[3]), *g[4:]) for g in lst
        ]

    out_train = apply(trainlist) if transform_train else trainlist
    return out_train, apply(testlist), apply(list(validlist)), scaler

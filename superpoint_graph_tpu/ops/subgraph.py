"""Random BFS subgraph sampling for SSP training.

Behavioral spec from reference `libply_c.random_subgraph`
(partition/ply_c/random_subgraph.cpp:22-98): grow a BFS forest from random
seeds until `subgraph_size` vertices are selected; return vertex and edge
masks, an edge selected iff both endpoints are (the reference's small-graph
early-out also had an off-by-one OOB write, random_subgraph.cpp:35 — behavior
inherited, bug not).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def random_subgraph(
    n_ver: int,
    edg_source: np.ndarray,
    edg_target: np.ndarray,
    subgraph_size: int,
    rng: np.random.RandomState | None = None,
):
    """Returns (selected_edges: bool [E], selected_vertices: bool [n])."""
    rng = rng or np.random.RandomState()
    if n_ver <= subgraph_size:
        return (
            np.ones(len(edg_source), bool),
            np.ones(n_ver, bool),
        )
    adj = sp.csr_matrix(
        (
            np.ones(2 * len(edg_source), np.int8),
            (
                np.concatenate([edg_source, edg_target]),
                np.concatenate([edg_target, edg_source]),
            ),
        ),
        shape=(n_ver, n_ver),
    )
    selected = np.zeros(n_ver, bool)
    n_sel = 0
    while n_sel < subgraph_size:
        seed = rng.randint(n_ver)
        if selected[seed]:
            continue
        # BFS from seed, level by level, until budget is filled
        frontier = np.zeros(n_ver, bool)
        frontier[seed] = True
        while frontier.any() and n_sel < subgraph_size:
            new = frontier & ~selected
            idx = np.flatnonzero(new)
            room = subgraph_size - n_sel
            if len(idx) > room:
                idx = idx[:room]
            selected[idx] = True
            n_sel += len(idx)
            frontier = (adj @ selected) > 0
            frontier &= ~selected
            frontier = frontier.astype(bool)
            if not frontier.any():
                break
    sel_edges = selected[edg_source] & selected[edg_target]
    return sel_edges, selected

"""TPU-native compute ops replacing the reference's C++/CUDA kernels.

Module map (reference parity targets in parentheses):
  eigen3      — analytic symmetric 3x3 eigendecomposition (Eigen::EigenSolver)
  geof        — local geometric features (libply_c.compute_geof, ply_c.cpp:384)
  knn         — blocked brute-force kNN graphs (sklearn KD-tree, graphs.py:26)
  voxel       — voxel-grid pruning (libply_c.prune, ply_c.cpp:288)
  components  — connected components with small-region fusing
                (libply_c.connected_comp, connected_components.cpp:17)
  subgraph    — random BFS subgraph sampling (libply_c.random_subgraph)
  cutpursuit  — l0 cut-pursuit solver (libcp.cutpursuit / cutpursuit2)
  segment     — masked segment reductions shared by the GNN and SPG builder
"""
from . import (  # noqa: F401
    components,
    cutpursuit,
    cutpursuit_jax,
    eigen3,
    geof,
    knn,
    segment,
    subgraph,
    voxel,
)

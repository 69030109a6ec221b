"""Superpoint-graph construction (reference parity: partition/graphs.py)."""
from .spg import compute_sp_graph  # noqa: F401

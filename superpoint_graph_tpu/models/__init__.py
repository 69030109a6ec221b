"""Model families: PointNet embedders, ECC graph networks, recurrent cells.

Reference parity: learning/pointnet.py, learning/graphnet.py,
learning/modules.py, learning/ecc/ (the ECC runtime collapses into ops here).
"""
from .cells import GRUCellEx, LSTMCellEx  # noqa: F401
from .ecc import ecc_conv  # noqa: F401
from .graphnet import FNet, GraphNetwork  # noqa: F401
from .pointnet import PointNet, STNkD  # noqa: F401
from .spgmodel import SpgBatch, SpgModel  # noqa: F401

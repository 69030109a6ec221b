"""Supervised (learned) partition path — "SSP" (CVPR2019, arXiv 1904.02113).

Reference parity: supervized_partition/ — graph-structured contrastive losses
with cross-partition weighting, per-point PointNet embeddings, cut pursuit on
learned embeddings, partition generation and ASA/BR/BP evaluation.
"""

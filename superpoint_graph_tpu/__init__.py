"""superpoint_graph_tpu — a TPU-native (JAX/XLA/Pallas) framework for large-scale 3D
point-cloud semantic segmentation with the capabilities of `loicland/superpoint_graph`.

Three stages, re-designed TPU-first (see SURVEY.md for the blueprint):

1. Geometric partition (``superpoint_graph_tpu.ops`` + ``superpoint_graph_tpu.graph``):
   voxel pruning, kNN adjacency, local-PCA geometric features and the l0 cut-pursuit
   partition, expressed as batched XLA ops over fixed-size padded tensors
   (reference: partition/partition.py, partition/ply_c/, partition/cut-pursuit).
2. Contextual segmentation (``superpoint_graph_tpu.models`` + ``.learn``): PointNet
   superpoint embeddings + an edge-conditioned-convolution GRU network over the
   superpoint graph (reference: learning/).
3. Supervised partition (``superpoint_graph_tpu.ssp``): learned per-point embeddings
   trained with the graph-structured contrastive loss (reference: supervized_partition/).

Distribution is first-class here (the reference is single-GPU): data-parallel and
graph-sharded execution over a ``jax.sharding.Mesh`` lives in ``.parallel``.
"""

__version__ = "0.1.0"

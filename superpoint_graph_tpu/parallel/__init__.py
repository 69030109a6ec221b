"""Distribution layer — NEW relative to the reference, which is strictly
single-process/single-GPU (SURVEY.md §2.7). Data parallelism maps clouds/rooms
per chip over a `jax.sharding.Mesh` with psum gradient reduction riding ICI.
"""
from .dp import make_dp_eval_step, make_dp_train_step, shard_batch, stack_device_batches  # noqa: F401
from .mesh import make_mesh  # noqa: F401

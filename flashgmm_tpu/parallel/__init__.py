from .mesh import make_mesh, shard_batch
from .train import data_parallel_train_step, make_train_state

__all__ = [
    "make_mesh",
    "shard_batch",
    "make_train_state",
    "data_parallel_train_step",
]

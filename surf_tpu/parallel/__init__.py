from .mesh import (make_mesh, make_dp_train_step, stack_batches, shard_batch,
                   make_global_batch, process_slice)

__all__ = ["make_mesh", "make_dp_train_step", "stack_batches", "shard_batch",
           "make_global_batch", "process_slice"]

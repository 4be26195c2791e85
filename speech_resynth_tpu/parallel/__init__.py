"""Parallelism surface: mesh axes + sharding rules.

The reference's only distribution strategy is DDP data parallelism
(SURVEY.md §2.4: torchrun NCCL for the speech LM, mp.spawn for HiFi-GAN).
Here the equivalent is a named (data, model) ``jax.sharding.Mesh``:

* DP — batches sharded on ``data``; params replicated; XLA inserts the
  gradient all-reduce over ICI (no DDP wrapper, no DistributedSampler —
  iterators shard by process index, core/mesh.py:local_batch_slice).
* TP — the reserved ``model`` axis; ``tensor_parallel_rules`` shards Llama
  attention/MLP kernels column/row-parallel (train/speechlm.py) so larger
  speech LMs scale past DP without API changes.
* Multi-host — ``distributed_init`` + the same mesh spanning processes;
  collectives ride ICI within a slice, DCN across slices.
"""

from ..core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharded,
    distributed_init,
    local_batch_slice,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .sharding import fsdp_rules, tensor_parallel_rules

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharded",
    "distributed_init",
    "fsdp_rules",
    "local_batch_slice",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "tensor_parallel_rules",
]

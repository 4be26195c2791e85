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
* FSDP — ``fsdp_rules`` ZeRO-3-shards params over ``data`` (composes with
  TP) for models whose optimizer state outgrows a chip.
* SP — ``SpeechLMTrainerConfig(sequence_parallel=True)`` keeps hidden states
  sequence-sharded over ``model`` between layers (Megatron-SP via GSPMD).
* PP — ``pipeline.spmd_pipeline``: differentiable GPipe microbatch pipeline
  over ``model`` (shard_map + ppermute; neighbour-only ICI transfers).
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
from .pipeline import pipelined_llama_loss_fn, pp_param_shardings, spmd_pipeline
from .sharding import fsdp_rules, tensor_parallel_rules

__all__ = [
    "pipelined_llama_loss_fn",
    "pp_param_shardings",
    "spmd_pipeline",
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

"""Device mesh + sharding runtime.

The reference does distributed training through torch.distributed/NCCL DDP
(/root/reference/src/speechlm/train.py:75-78, src/hifigan/train.py:26-31).
TPU-native equivalent: a ``jax.sharding.Mesh`` with named axes and
``NamedSharding`` rules; XLA inserts the gradient all-reduces over ICI.

Axis names:
  data   — batch sharding (DDP equivalent; capability bar of the reference)
  model  — reserved tensor-parallel axis so larger speech LMs can enable TP
           without API changes (SURVEY.md §2.4).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def distributed_init() -> None:
    """Multi-host runtime init (maps the reference's init_process_group).

    Safe to call unconditionally: no-ops for single-process runs unless the
    standard JAX coordination env vars are present.
    """
    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data=None`` uses every device not consumed by the model axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays on-device with batch-dim sharding.

    Multi-host: each host holds only its 1/process_count slice of the global
    batch (pipeline/data._global_batch_plan), so the global jax.Array is
    assembled from process-local shards."""

    def _put(x):
        x = np.asarray(x)
        sharding = data_sharded(mesh, x.ndim)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(partial(jax.device_put, device=replicated(mesh)), tree)


def dp_mesh_for_batch(batch_size: int) -> tuple[Mesh, int]:
    """Data-parallel mesh + adjusted global batch for an arbitrary batch size.

    The reference's batch sizes (2700, 44, 64 …) are not device-count
    multiples; XLA sharding requires divisibility.  Policy: round the batch
    down to a device multiple when batch >= devices (drops <1 device's worth
    of examples); otherwise shrink the data axis to gcd(batch, devices).
    """
    import math

    n = len(jax.devices())
    if batch_size >= n:
        return make_mesh(), (batch_size // n) * n
    return make_mesh(data=math.gcd(batch_size, n)), batch_size


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's shard of a globally-indexed batch.

    Replaces the reference's DistributedSampler (speechlm/train.py:96): data
    iterators slice by process index instead of wrapping a sampler object.
    """
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def host_local_copy(tree):
    """Host-local numpy copy of a pytree of (possibly multi-host global)
    jax.Arrays — for rank-gated eager work (validation, HF export) that
    cannot touch non-fully-addressable arrays.

    Fully-addressable and fully-replicated arrays read their local shard /
    replica without communication; cross-host *sharded* arrays are
    all-gathered, which is a COLLECTIVE — call this symmetrically on every
    process, then gate the file writes / eager compute on rank 0.
    """

    def one(a):
        if not isinstance(a, jax.Array):
            return np.asarray(a)
        if a.is_fully_addressable:
            return np.asarray(a)
        if not a.is_fully_replicated:
            # reshard to replicated (XLA all-gather; correct for ANY layout,
            # unlike process_allgather's axis-0 concatenation)
            a = jax.jit(lambda x: x, out_shardings=NamedSharding(a.sharding.mesh, P()))(a)
        return np.asarray(a.addressable_data(0))

    return jax.tree_util.tree_map(one, tree)

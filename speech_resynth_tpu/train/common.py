"""Shared training infrastructure.

Maps the reference's torch training idioms onto TPU-native equivalents:
  * warmup->linear-decay LR (utils/misc.py:19-33, duplicated speechlm/utils.py)
  * AdamW + global-norm clipping (flow_matching/train.py:153,183-185)
  * AMP GradScaler -> nothing: params are f32, compute bf16 (core/precision.py)
  * DDP -> pjit over a (data, model) mesh; gradients all-reduce over ICI
    automatically via sharding propagation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS


def warmup_linear_decay(total_steps: int, warmup_steps: int, base_lr: float, min_lr: float) -> Callable:
    """Exact schedule of utils/misc.py:19-33: ramp min->base over warmup, then
    linear base->min over the remaining steps."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = min_lr + (base_lr - min_lr) * step / max(warmup_steps, 1)
        progress = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        decay = min_lr + (base_lr - min_lr) * (1 - progress)
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def make_optimizer(
    schedule: Callable,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-9,
    max_norm: Optional[float] = 0.1,
    weight_decay: float = 0.01,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW matching torch.optim.AdamW defaults (weight_decay 0.01) with the
    reference's betas/eps and clip-by-global-norm.

    ``accum_steps > 1`` wraps the chain in optax.MultiSteps: gradients are
    averaged over N micro-batch steps before one real update — the effective
    batch is N x the per-step batch without N x the activation HBM (pairs
    with the ``remat`` flag for memory-bound scales).  Clipping and the LR
    schedule both see the ACCUMULATED update (MultiSteps advances the inner
    optimizer only on emit steps), matching a true N x batch run whose
    ``total_steps`` counts real updates.
    """
    chain = []
    if max_norm is not None:
        chain.append(optax.clip_by_global_norm(max_norm))
    chain.append(optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    extra: Any = None  # model-specific state (buffers, EMA, …)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, extra=None):
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), extra=extra)


def replicated_state_sharding(mesh: Mesh, state) -> Any:
    """DP: every leaf of the train state replicated over the mesh."""
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), state)


def batch_sharding(mesh: Mesh, batch) -> Any:
    """Shard batch leaves along their leading axis over the data axis."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))), batch
    )


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)

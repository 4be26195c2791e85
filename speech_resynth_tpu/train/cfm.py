"""Conditional flow matching trainer (data-parallel pjit).

Semantics parity with /root/reference/src/flow_matching/train.py:102-220:
AdamW(lr, betas=(0.9, 0.98), eps=1e-9), warmup->linear-decay LR, grad-norm
clip 0.1, frozen k-means unit embedding, per-epoch loop with periodic
validation/checkpointing.  TPU replacements: bf16 autocast + GradScaler ->
f32-params/bf16-compute policy; single-GPU loop -> pjit over the data axis
(the reference is single-device here; ours scales to a mesh for free).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from ..core.precision import Policy, DEFAULT
from ..models.cfm import CFMConfig, ConditionalFlowMatchingModel
from .common import TrainState, make_optimizer, warmup_linear_decay


def build_model(
    config: CFMConfig,
    embedding_table: Optional[np.ndarray] = None,
    policy: Policy = DEFAULT,
    seed: int = 0,
) -> Tuple[ConditionalFlowMatchingModel, dict]:
    """Init model; optionally install the frozen k-means embedding
    (train.py:146-151 passes utils/textless.py:24-34's table)."""
    model = ConditionalFlowMatchingModel(config, policy=policy)
    ids = jnp.ones((1, 8), jnp.int32)
    mels = jnp.zeros((1, 8, config.dim_in), jnp.float32)
    durs = jnp.ones((1, 8), jnp.int32)
    from ..core.flaxinit import jitted_init

    variables = jitted_init(
        model, {"params": jax.random.key(seed)}, ids, mels, durs, rng=jax.random.key(seed + 1)
    )
    if embedding_table is not None:
        params = dict(variables["params"])
        params["to_cond_emb"] = {"embedding": jnp.asarray(embedding_table, jnp.float32)}
        variables = {**variables, "params": params}
    return model, variables


def make_train_step(
    model: ConditionalFlowMatchingModel,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    freeze_embedding: bool = True,
    donate: bool = True,
):
    """jitted DP train step: (state, batch, rng) -> (state, metrics).

    ``freeze_embedding`` replicates the reference's frozen unit embedding
    (nn.Embedding.from_pretrained(freeze=True), utils/textless.py:34) by
    zeroing its gradient.
    """

    def step(state: TrainState, batch, rng):
        buffers = state.extra
        # the torch reference trains in model.train() mode — dropout active
        # (modules.py FeedForward dropout); deterministic=True here would
        # silently ignore configured ff/attn dropout rates
        k_noise, k_drop = jax.random.split(rng)

        def loss_fn(params):
            loss, aux = model.apply(
                {"params": params, "buffers": buffers},
                batch["input_ids"],
                batch["spectrogram_labels"],
                batch.get("duration_labels"),
                rng=k_noise,
                deterministic=False,
                rngs={"dropout": k_drop},
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if freeze_embedding:
            grads = {**grads, "to_cond_emb": jax.tree_util.tree_map(jnp.zeros_like, grads["to_cond_emb"])}
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if freeze_embedding:
            # AdamW's decoupled weight decay would still shrink a zero-grad
            # param; hard-restore to match torch's requires_grad=False
            # semantics (utils/textless.py:34 freeze=True)
            params = {**params, "to_cond_emb": state.params["to_cond_emb"]}
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = {"loss": loss, "mse": aux["mse"], "duration_loss": aux["duration_loss"], "grad_norm": grad_norm}
        return new_state, metrics

    replicated = NamedSharding(mesh, P())
    data_first = lambda x: NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
    return jax.jit(
        step,
        donate_argnums=(0,) if donate else (),
        out_shardings=(None, None),
    ), data_first


@dataclasses.dataclass
class CFMTrainerConfig:
    batch_size: int = 2700
    frames_per_seg: Optional[int] = 100
    epoch: int = 100
    warmup_steps: int = 1000
    lr: float = 1e-3
    lr_min: float = 1e-4
    max_norm: float = 0.1
    summary_interval: int = 100
    save_interval_epoch: int = 20
    dt: float = 0.0625
    truncation_value: float = 1.0
    seed: int = 0
    # gradient accumulation (optax.MultiSteps): N micro-batches per real
    # update — effective batch N x batch_size at constant activation HBM
    accum_steps: int = 1


def make_trainer(
    model_config: CFMConfig,
    trainer_config: CFMTrainerConfig,
    mesh: Mesh,
    total_steps: int,
    embedding_table: Optional[np.ndarray] = None,
    policy: Policy = DEFAULT,
):
    """Build (model, state, jitted step, shard_fn) for the CFM task."""
    model, variables = build_model(model_config, embedding_table, policy, trainer_config.seed)
    schedule = warmup_linear_decay(total_steps, trainer_config.warmup_steps, trainer_config.lr, trainer_config.lr_min)
    tx = make_optimizer(
        schedule, b1=0.9, b2=0.98, eps=1e-9, max_norm=trainer_config.max_norm,
        accum_steps=trainer_config.accum_steps,
    )
    state = TrainState.create(variables["params"], tx, extra=variables.get("buffers", {}))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step_fn, data_shard = make_train_step(model, tx, mesh)
    return model, state, step_fn, data_shard

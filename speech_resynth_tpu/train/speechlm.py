"""Speech-LM (Llama) trainer: data-parallel pjit with full resume.

Semantics parity with /root/reference/src/speechlm/train.py:74-215: AdamW
(betas from config, defaults 0.9/0.98), warmup->linear-decay LR, grad clip
1.0, causal-LM loss with -100-masked pad labels, full training-state resume
(model/optimizer/schedule/step/epoch — train.py:139-153).

TPU-native: torchrun+NCCL DDP -> the (data, model) mesh.  The model axis
carries optional tensor parallelism for larger speech LMs (the reference
caps at ~100M params where DP suffices; TP shards the Dense kernels via
sharding constraints when mesh model dim > 1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import MODEL_AXIS
from ..core.precision import Policy, DEFAULT
from ..models.llama import LlamaConfig, LlamaLM, causal_lm_loss
from .common import TrainState, make_optimizer, warmup_linear_decay


@dataclasses.dataclass
class SpeechLMTrainerConfig:
    batch_size_per_device: int = 96
    units_per_sample: int = 128
    epoch: int = 3
    warmup_steps: int = 100
    lr: float = 2e-4
    lr_min: float = 2e-5
    beta1: float = 0.9
    beta2: float = 0.98
    max_norm: float = 1.0
    summary_interval: int = 100
    seed: int = 0
    # sequence parallelism: constrain hidden states to P(data, model, None)
    # so long sequences shard over the model axis between layers (GSPMD
    # inserts the collectives); numerics are unchanged — layout only
    sequence_parallel: bool = False
    # "xla" by measurement (whole-train-step A/B, bench_train.py --ab):
    # XLA's fused fwd+bwd beats flash-fwd + recompute-bwd at 96x128 on v5e.
    # Set "auto" to re-run the A/B through attention_implementation().
    attn_implementation: str = "xla"
    # activation checkpointing (LlamaLM.remat): recompute layers in the
    # backward pass — enables longer sequences / bigger per-device batches
    # when activations, not params, bound HBM
    remat: bool = False
    # gradient accumulation (optax.MultiSteps): N micro-batches per update
    accum_steps: int = 1


# TP layout lives with the rest of the parallelism logic; kept as
# ``param_shardings`` here for backward compatibility.
from ..parallel.sharding import tensor_parallel_rules as param_shardings  # noqa: E402


def make_speechlm_trainer(
    model_config: LlamaConfig,
    trainer_config: SpeechLMTrainerConfig,
    mesh: Mesh,
    total_steps: int,
    policy: Policy = DEFAULT,
) -> Tuple[LlamaLM, TrainState, Any, Any]:
    hidden_sharding = None
    if trainer_config.sequence_parallel:
        from ..core.mesh import DATA_AXIS

        hidden_sharding = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
    # training pins XLA attention by default: the whole-train-step A/B at the
    # shipped shape (96x128, benchmarks/bench_train.py --ab, v5e) measured
    # XLA 110 ms vs pallas 121 ms — the flash fwd + recompute backward loses
    # to XLA's fused fwd+bwd here, while INFERENCE scoring at the same shape
    # keeps the pallas win (+7%, bench_lm.py); same shape, opposite
    # in-context verdicts
    model = LlamaLM(
        model_config,
        policy=policy,
        hidden_sharding=hidden_sharding,
        attn_implementation=trainer_config.attn_implementation,
        remat=trainer_config.remat,
    )
    # init with an unconstrained twin: the eager init batch (1, 8) need not
    # be divisible by the mesh; the param tree is identical either way
    from ..core.flaxinit import jitted_init

    variables = jitted_init(
        LlamaLM(model_config, policy=policy), jax.random.key(trainer_config.seed), jnp.ones((1, 8), jnp.int32)
    )

    schedule = warmup_linear_decay(total_steps, trainer_config.warmup_steps, trainer_config.lr, trainer_config.lr_min)
    tx = make_optimizer(
        schedule,
        b1=trainer_config.beta1,
        b2=trainer_config.beta2,
        eps=1e-8,  # torch AdamW default (speechlm passes no eps)
        max_norm=trainer_config.max_norm,
        accum_steps=trainer_config.accum_steps,
    )

    p_shard = param_shardings(mesh, variables["params"])
    params = jax.tree_util.tree_map(jax.device_put, variables["params"], p_shard)
    # jit the state init so optimizer moments inherit the param shardings
    # (GSPMD propagation) and scalars land replicated on the same mesh
    state = jax.jit(lambda p: TrainState.create(p, tx))(params)

    def step_fn(state: TrainState, batch, dropout_rng=None):
        def loss_fn(params):
            logits, _ = model.apply({"params": params}, batch["input_ids"], batch["attention_mask"])
            return causal_lm_loss(logits, batch["labels"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return model, state, jax.jit(step_fn, donate_argnums=(0,)), p_shard

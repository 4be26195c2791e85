"""Pipeline parallelism: GPipe-style SPMD microbatch pipeline over the
``model`` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.4 — its largest model
is the ~100 M-param speech LM, trained DDP-only); this is forward-looking
capacity for speech LMs that outgrow a chip even with FSDP.  TPU-native
design, following the scaling-book recipe rather than torch's stage-process
model:

* The transformer layer stack lives STACKED (the scan-layers layout of
  models/llama.py) with the leading layer axis sharded over ``model`` — each
  device materializes only ``L/S`` layers, like FSDP but without per-step
  regathering.
* One ``shard_map`` + ``lax.scan`` over ``M + S - 1`` ticks implements the
  pipeline: at every tick each stage applies its local layers to its current
  microbatch and ships the activations to the next stage with a single
  ``ppermute`` hop over ICI (neighbour transfers only — no all-to-all).
* The whole schedule is differentiable: ``jax.grad`` through the scan
  transposes every ``ppermute`` into the reverse hop, yielding the backward
  pipeline automatically — no hand-written stage backprop.
* Bubble fraction is the classic (S-1)/(M+S-1); pick ``num_microbatches``
  ≳ 4·S to amortize.

``spmd_pipeline`` is the generic schedule; ``pipelined_llama_loss_fn`` wires
it to our Llama (embedding + head replicated, layer stack pipelined) so a
PP×DP training step is one jitted program (exercised by
tests/test_pipeline_parallel.py and __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

try:  # jax >= 0.8 promotes shard_map out of experimental (check_rep -> check_vma)
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _legacy_shard_map

    def shard_map(f, *, check_vma=True, **kw):
        return _legacy_shard_map(f, check_rep=check_vma, **kw)
from jax.sharding import Mesh, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS


def spmd_pipeline(stage_fn: Callable, stage_params, xs, extras, axis_name: str = MODEL_AXIS):
    """Run microbatches through a pipeline of stages laid out over
    ``axis_name``.  Call INSIDE ``shard_map``.

    stage_fn(stage_params, x, extra) -> y with ``y.shape == x.shape`` —
    applies this device's layer block to one microbatch.
    stage_params: this stage's slice of the stacked layer params (leading
    layer axis already divided by shard_map).
    xs: (M, ...) microbatched activations entering stage 0.
    extras: pytree of per-microbatch side inputs with leading axis M (e.g.
    attention masks) — indexed, not piped: the microbatch at stage ``s`` on
    tick ``t`` is ``t - s``, so each stage gathers its own slice.

    Returns (M, ...) outputs of the LAST stage, broadcast to every stage (so
    replicated downstream compute stays SPMD-consistent).
    """
    S = lax.psum(1, axis_name)
    stage = lax.axis_index(axis_name)
    M = xs.shape[0]
    T = M + S - 1
    perm = [(i, (i + 1) % S) for i in range(S)]

    def tick(carry, t):
        state, outputs = carry
        in_idx = jnp.clip(t, 0, M - 1)
        first = lax.dynamic_index_in_dim(xs, in_idx, 0, keepdims=False)
        x = jnp.where(stage == 0, first, state)
        mb_idx = jnp.clip(t - stage, 0, M - 1)
        extra = jax.tree_util.tree_map(
            lambda a: lax.dynamic_index_in_dim(a, mb_idx, 0, keepdims=False), extras
        )
        y = stage_fn(stage_params, x, extra)
        out_idx = jnp.clip(t - (S - 1), 0, M - 1)
        write = jnp.logical_and(stage == S - 1, t >= S - 1)
        cur = lax.dynamic_index_in_dim(outputs, out_idx, 0, keepdims=False)
        outputs = lax.dynamic_update_index_in_dim(outputs, jnp.where(write, y, cur), out_idx, 0)
        state = lax.ppermute(y, axis_name, perm)
        return (state, outputs), None

    init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
    (_, outputs), _ = lax.scan(tick, init, jnp.arange(T))
    # broadcast the last stage's outputs to all stages (masked psum)
    return lax.psum(jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs)), axis_name)


def pipelined_llama_loss_fn(config, mesh: Mesh, num_microbatches: int, policy=None, attn_implementation: str = "xla"):
    """Build ``loss_fn(params, batch) -> loss`` running the Llama layer stack
    as a pipeline over ``mesh``'s model axis (PP) with the batch sharded over
    its data axis (DP).

    ``params`` must be in the scan-layers layout (stacked ``layers``
    collection — convert.stack_llama_layers); place them with
    ``pp_param_shardings`` so each stage holds only its layers.  Embedding,
    final norm and LM head are replicated (they are <10% of Llama weights at
    reference sizes).  ``num_hidden_layers`` must divide evenly by the model
    axis size, batch by num_microbatches, and microbatches by the data axis.
    """
    from ..core.precision import DEFAULT
    from ..models.llama import LlamaLayer, LlamaRMSNorm, _rope_tables, causal_lm_loss

    policy = policy or DEFAULT
    layer_mod = LlamaLayer(config, policy, attn_implementation)
    S = mesh.shape[MODEL_AXIS]
    if config.num_hidden_layers % S != 0:
        raise ValueError(f"{config.num_hidden_layers} layers not divisible into {S} stages")

    def loss_fn(params, batch):
        ids = batch["input_ids"]
        B, L = ids.shape
        M = num_microbatches
        if B % M:
            raise ValueError(f"batch {B} not divisible by num_microbatches={M}")
        emb = params["embed_tokens"]["embedding"]
        x = jnp.take(emb, ids, axis=0).astype(policy.compute_dtype)
        rope = _rope_tables(jnp.arange(L)[None], config.head_dim, config.rope_theta)[:, None]
        mask = batch.get("attention_mask")
        mask = jnp.ones((B, L), bool) if mask is None else mask.astype(bool)

        xs = x.reshape(M, B // M, L, -1)
        masks = mask.reshape(M, B // M, L)

        def pipe(layer_params, xs, masks, rope):
            def stage_fn(lp, x, m):
                def body(h, p1):
                    h, _ = layer_mod.apply({"params": p1}, h, rope, m)
                    return h, None

                h, _ = lax.scan(body, x, lp)
                return h

            return spmd_pipeline(stage_fn, layer_params, xs, masks, MODEL_AXIS)

        y = shard_map(
            pipe,
            mesh=mesh,
            in_specs=(P(MODEL_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS), P()),
            out_specs=P(None, DATA_AXIS),
            check_vma=False,  # pre-0.8 name: check_rep
        )(params["layers"], xs, masks, rope)
        y = y.reshape(B, L, -1)

        y = LlamaRMSNorm(config.hidden_size, config.rms_norm_eps, policy, name="final_norm").apply(
            {"params": params["final_norm"]}, y
        )
        logits = y.astype(jnp.float32) @ params["lm_head"]["kernel"].astype(jnp.float32)
        return causal_lm_loss(logits, batch["labels"])

    return loss_fn


def pp_param_shardings(mesh: Mesh, params):
    """NamedShardings placing scan-layout Llama params for the pipeline:
    the stacked ``layers`` collection sharded on its leading (layer) axis
    over ``model``; everything else replicated."""
    from jax.sharding import NamedSharding

    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "layers" in names:
            return NamedSharding(mesh, P(MODEL_AXIS, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)

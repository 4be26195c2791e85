"""Activation checkpointing (remat) leaves params, loss, and grads unchanged.

``TransformerConfig.remat`` / ``LlamaLM.remat`` recompute block internals in
the backward pass (jax.checkpoint via nn.remat) — a memory/FLOPs trade only.
These tests lock the contract: identical param trees, identical forward
values, and grads equal to the non-remat program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models.cfm import CFMConfig, ConditionalFlowMatchingModel
from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM, causal_lm_loss


def _cfm(remat: bool) -> ConditionalFlowMatchingModel:
    cfg = CFMConfig(
        vocab_size=11,
        dim_in=6,
        dim_cond_emb=12,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
        ff_dropout=0.1,  # exercise the static `deterministic` under nn.remat
        remat=remat,
    )
    return ConditionalFlowMatchingModel(cfg, policy=FLOAT32)


def test_cfm_remat_same_params_loss_grads():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 11, (2, 9)), jnp.int32)
    labels = jnp.asarray(rng.standard_normal((2, 9, 6)), jnp.float32)

    base, rem = _cfm(False), _cfm(True)
    v0 = base.init(jax.random.key(0), ids, labels, rng=jax.random.key(1))
    v1 = rem.init(jax.random.key(0), ids, labels, rng=jax.random.key(1))
    # identical param tree: same structure AND same values from the same seed
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), v0, v1)

    def loss_of(model, variables):
        def f(params):
            loss, _ = model.apply(
                {**variables, "params": params},
                ids,
                labels,
                rng=jax.random.key(2),
                deterministic=False,
                rngs={"dropout": jax.random.key(3)},
            )
            return loss

        return jax.jit(jax.value_and_grad(f))(variables["params"])

    l0, g0 = loss_of(base, v0)
    l1, g1 = loss_of(rem, v1)
    assert np.allclose(l0, l1, rtol=1e-6, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1
    )


@pytest.mark.parametrize("scan_layers", [False, True])
def test_llama_remat_same_grads(scan_layers):
    cfg = LlamaConfig(
        vocab_size=17, hidden_size=16, intermediate_size=32, num_hidden_layers=2, num_attention_heads=2
    )
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 17, (2, 10)), jnp.int32)

    base = LlamaLM(cfg, policy=FLOAT32, scan_layers=scan_layers)
    rem = LlamaLM(cfg, policy=FLOAT32, scan_layers=scan_layers, remat=True)
    variables = base.init(jax.random.key(0), ids)

    def grads_of(model):
        def f(params):
            logits, _ = model.apply({"params": params}, ids)
            return causal_lm_loss(logits, ids)

        return jax.jit(jax.value_and_grad(f))(variables["params"])

    l0, g0 = grads_of(base)
    l1, g1 = grads_of(rem)
    assert np.allclose(l0, l1, rtol=1e-6, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1
    )


def test_llama_remat_decode_cache_path():
    """remat must not break the KV-cache decode path (forward-only)."""
    cfg = LlamaConfig(
        vocab_size=17, hidden_size=16, intermediate_size=32, num_hidden_layers=2, num_attention_heads=2
    )
    ids = jnp.asarray(np.random.default_rng(2).integers(1, 17, (1, 4)), jnp.int32)
    base = LlamaLM(cfg, policy=FLOAT32, scan_layers=True)
    rem = LlamaLM(cfg, policy=FLOAT32, scan_layers=True, remat=True)
    variables = base.init(jax.random.key(0), ids)
    cache = base.init_cache(1, 8)
    out0, c0 = base.apply(variables, ids, cache=cache, cache_index=jnp.int32(0))
    out1, c1 = rem.apply(variables, ids, cache=cache, cache_index=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=1e-6, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6), c0, c1
    )

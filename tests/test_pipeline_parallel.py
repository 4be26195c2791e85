"""Pipeline parallelism: the GPipe-style SPMD pipeline must be numerically
invisible — same loss AND same gradients as the plain (unpipelined) model —
on a (data, model) mesh, for both 1 and 2 layers per stage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_resynth_tpu.core.mesh import make_mesh, shard_batch
from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM, causal_lm_loss
from speech_resynth_tpu.parallel.pipeline import pipelined_llama_loss_fn, pp_param_shardings


def _setup(num_layers, batch=8):
    cfg = LlamaConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=num_layers, num_attention_heads=2
    )
    model = LlamaLM(cfg, policy=FLOAT32, attn_implementation="xla", scan_layers=True)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 32, (batch, 16)).astype(np.int32)
    labels = np.where(rng.random((batch, 16)) < 0.1, -100, ids).astype(np.int32)
    batch = {
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
        "labels": labels,
    }
    variables = model.init(jax.random.key(0), jnp.asarray(ids[:1]))
    return cfg, model, variables["params"], batch


def _plain_loss(model):
    def loss_fn(params, batch):
        logits, _ = model.apply({"params": params}, batch["input_ids"], batch["attention_mask"])
        return causal_lm_loss(logits, batch["labels"])

    return loss_fn


@pytest.mark.parametrize("num_layers,microbatches,batch", [(4, 4, 8), (8, 8, 16)])
def test_pipelined_loss_and_grads_match_plain(num_layers, microbatches, batch):
    mesh = make_mesh(data=2, model=4)
    cfg, model, params, batch = _setup(num_layers, batch)

    pp_params = jax.device_put(params, pp_param_shardings(mesh, params))
    dev_batch = shard_batch(batch, mesh)

    pp_loss = pipelined_llama_loss_fn(cfg, mesh, num_microbatches=microbatches, policy=FLOAT32)
    plain_loss = _plain_loss(model)

    with mesh:
        l_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss))(pp_params, dev_batch)
        l_ref, g_ref = jax.jit(jax.value_and_grad(plain_loss))(params, batch)

    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-5)
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_ref = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    assert flat_pp and len(flat_pp) == len(flat_ref)
    for k, v in flat_pp:
        ref = flat_ref[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref), rtol=2e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_pipeline_rejects_indivisible_stages():
    mesh = make_mesh(data=2, model=4)
    cfg = LlamaConfig(vocab_size=8, hidden_size=8, intermediate_size=16, num_hidden_layers=6, num_attention_heads=2)
    with pytest.raises(ValueError):
        pipelined_llama_loss_fn(cfg, mesh, num_microbatches=2)


def test_sequence_parallel_step_matches_dp():
    """sequence_parallel=True only changes activation layout (GSPMD inserts
    the collectives); the training-step loss must match plain DP x TP."""
    from speech_resynth_tpu.train.speechlm import SpeechLMTrainerConfig, make_speechlm_trainer

    mesh = make_mesh(data=2, model=4)
    cfg = LlamaConfig(vocab_size=64, hidden_size=16, intermediate_size=32, num_hidden_layers=2, num_attention_heads=2)
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 64, (8, 16)).astype(np.int32)
    batch = {"input_ids": ids, "attention_mask": np.ones_like(ids), "labels": ids.astype(np.int32)}

    losses = {}
    for name, tcfg in [("dp", SpeechLMTrainerConfig()), ("sp", SpeechLMTrainerConfig(sequence_parallel=True))]:
        _, state, step_fn, _ = make_speechlm_trainer(cfg, tcfg, mesh, total_steps=10, policy=FLOAT32)
        with mesh:
            _, metrics = step_fn(state, shard_batch(batch, mesh))
        losses[name] = float(metrics["loss"])
    np.testing.assert_allclose(losses["sp"], losses["dp"], rtol=1e-4)

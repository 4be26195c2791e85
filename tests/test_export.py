"""Round-trip export tests: our params -> HF state dict -> our params, and
composite save_pretrained -> from_pretrained equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models import export as E
from speech_resynth_tpu.models.cfm import CFMConfig, ConditionalFlowMatchingModel
from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
from speech_resynth_tpu.models.convert import cfm_model_params, hifigan_generator_params, llama_params
from speech_resynth_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator
from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7)


def test_hifigan_roundtrip():
    cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    gen = HifiGanGenerator(cfg, policy=FLOAT32)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 6, 8)))
    sd = E.hifigan_generator_state_dict(variables["params"])
    back = hifigan_generator_params(sd)
    _trees_equal(variables["params"], back)


def test_cfm_roundtrip():
    cfg = CFMConfig(
        vocab_size=9,
        dim_in=8,
        dim_cond_emb=12,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
        predict_duration=True,
    )
    model = ConditionalFlowMatchingModel(cfg, policy=FLOAT32)
    ids = jnp.ones((1, 6), jnp.int32)
    mels = jnp.zeros((1, 12, 8))
    durs = jnp.full((1, 6), 2, jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, ids, mels, durs, rng=jax.random.key(1))

    sd = E.cfm_state_dict(variables)
    back = cfm_model_params(sd)
    _trees_equal(variables["params"], back["params"])
    _trees_equal(variables["buffers"], back["buffers"])


def test_llama_roundtrip():
    cfg = LlamaConfig(vocab_size=20, hidden_size=16, intermediate_size=32, num_hidden_layers=2, num_attention_heads=2)
    model = LlamaLM(cfg, policy=FLOAT32)
    variables = model.init(jax.random.key(0), jnp.ones((1, 4), jnp.int32))
    sd = E.llama_state_dict(variables["params"])
    back = llama_params(sd)
    _trees_equal(variables["params"], back)


def test_composite_save_and_load(tmp_path):
    cfm_cfg = CFMConfig(
        vocab_size=9,
        dim_in=8,
        dim_cond_emb=12,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
    )
    voc_cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    dec = ConditionalFlowMatchingWithHifiGan.from_config(cfm_cfg, voc_cfg, policy=FLOAT32)
    E.save_composite_pretrained(
        tmp_path / "composite", dec.model_variables, cfm_cfg, dec.vocoder_variables["params"], voc_cfg
    )

    dec2 = ConditionalFlowMatchingWithHifiGan.from_pretrained(tmp_path / "composite", policy=FLOAT32)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 10, (1, 6)), jnp.int32)
    w1, l1 = dec.synthesize(ids, dt=0.5, rng=jax.random.key(7))
    w2, l2 = dec2.synthesize(ids, dt=0.5, rng=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-5, atol=1e-6)


def test_from_pretrained_param_dtype_follows_policy(tmp_path):
    """Loaded checkpoints must store params in policy.param_dtype, exactly as
    from_config's init does — under BF16_INFERENCE f32 storage would double
    the weight bytes the 16-step ODE scan re-reads from HBM every step (and
    compile a different program than the init path).  Buffers stay f32."""
    from speech_resynth_tpu.core.precision import BF16_INFERENCE

    cfm_cfg = CFMConfig(
        vocab_size=9,
        dim_in=8,
        dim_cond_emb=12,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
    )
    voc_cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        normalize_before=True,
    )
    dec = ConditionalFlowMatchingWithHifiGan.from_config(cfm_cfg, voc_cfg, policy=FLOAT32)
    E.save_composite_pretrained(
        tmp_path / "c", dec.model_variables, cfm_cfg, dec.vocoder_variables, voc_cfg
    )

    bf = ConditionalFlowMatchingWithHifiGan.from_pretrained(tmp_path / "c", policy=BF16_INFERENCE)
    for leaf in jax.tree_util.tree_leaves(bf.model_variables) + jax.tree_util.tree_leaves(
        bf.vocoder_variables["params"]
    ):
        assert leaf.dtype == jnp.bfloat16, leaf.dtype
    for leaf in jax.tree_util.tree_leaves(bf.vocoder_variables["buffers"]):
        assert leaf.dtype == jnp.float32, leaf.dtype

    f32 = ConditionalFlowMatchingWithHifiGan.from_pretrained(tmp_path / "c", policy=FLOAT32)
    for leaf in jax.tree_util.tree_leaves(f32.model_variables):
        assert leaf.dtype == jnp.float32, leaf.dtype


def test_composite_normalize_before_buffers_roundtrip(tmp_path):
    # normalize_before=True vocoders carry mean/scale buffers (HF config
    # default); export must persist the real stats and from_pretrained must
    # thread them back into the buffers collection.
    cfm_cfg = CFMConfig(
        vocab_size=9,
        dim_in=8,
        dim_cond_emb=12,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
    )
    voc_cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        normalize_before=True,
    )
    dec = ConditionalFlowMatchingWithHifiGan.from_config(cfm_cfg, voc_cfg, policy=FLOAT32)
    rng = np.random.default_rng(3)
    dec.vocoder_variables["buffers"] = {
        "mean": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
        "scale": jnp.asarray(rng.uniform(0.5, 2.0, size=(8,)), jnp.float32),
    }
    E.save_composite_pretrained(
        tmp_path / "composite_nb", dec.model_variables, cfm_cfg, dec.vocoder_variables, voc_cfg
    )

    dec2 = ConditionalFlowMatchingWithHifiGan.from_pretrained(tmp_path / "composite_nb", policy=FLOAT32)
    np.testing.assert_allclose(
        np.asarray(dec2.vocoder_variables["buffers"]["mean"]),
        np.asarray(dec.vocoder_variables["buffers"]["mean"]),
        rtol=1e-6,
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 10, (1, 6)), jnp.int32)
    w1, l1 = dec.synthesize(ids, dt=0.5, rng=jax.random.key(7))
    w2, l2 = dec2.synthesize(ids, dt=0.5, rng=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-5, atol=1e-6)

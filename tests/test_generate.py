"""End-to-end textless generation: units -> BPE -> LM sampling -> units -> wav."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM
from speech_resynth_tpu.pipeline.generate import (
    continue_speech,
    generate_unit_continuation,
    synthesize_units,
)
from speech_resynth_tpu.text.units import units_to_unicode
from speech_resynth_tpu.tokenizers.bpe import BpeTokenizer

N_UNITS = 8  # unit vocabulary for the tiny setup


@pytest.fixture(scope="module")
def tokenizer():
    rng = np.random.default_rng(0)
    lines = [units_to_unicode(rng.integers(0, N_UNITS, 20)) for _ in range(50)]
    alphabet = units_to_unicode(range(N_UNITS))
    return BpeTokenizer.train(lines, vocab_size=N_UNITS + 8, initial_alphabet=alphabet)


@pytest.fixture(scope="module")
def lm(tokenizer):
    cfg = LlamaConfig(
        vocab_size=tokenizer.vocab_size + 2,
        hidden_size=16,
        intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        eos_token_id=1,
    )
    model = LlamaLM(cfg, policy=FLOAT32)
    variables = model.init(jax.random.key(0), jnp.ones((1, 4), jnp.int32))
    return model, variables


@pytest.fixture(scope="module")
def decoder():
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
    from speech_resynth_tpu.models.hifigan import HifiGanConfig

    cfm = CFMConfig(
        vocab_size=N_UNITS,  # decoder ids are units + 1 (pad 0)
        dim_in=8,
        dim_cond_emb=12,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
    )
    voc = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    return ConditionalFlowMatchingWithHifiGan.from_config(cfm, voc, policy=FLOAT32)


def test_generate_unit_continuation_valid_and_reproducible(lm, tokenizer):
    model, variables = lm
    prompt_units = [0, 3, 5, 2, 7, 1]
    kw = dict(max_new_tokens=8, temperature=1.1, top_k=6, rng=jax.random.key(4))
    a = generate_unit_continuation(prompt_units, tokenizer, model, variables, **kw)
    b = generate_unit_continuation(prompt_units, tokenizer, model, variables, **kw)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int32
    assert ((a >= 0) & (a < N_UNITS)).all()  # round-trips through the unit alphabet


def test_generate_empty_prompt_raises(lm, tokenizer):
    model, variables = lm
    with pytest.raises(ValueError, match="no BPE tokens"):
        generate_unit_continuation([], tokenizer, model, variables)


def test_continue_speech_end_to_end(lm, tokenizer, decoder):
    model, variables = lm
    prompt_units = [1, 4, 6, 2]
    out = continue_speech(
        prompt_units,
        tokenizer,
        model,
        variables,
        decoder,
        max_new_tokens=6,
        temperature=0.9,
        rng=jax.random.key(1),
    )
    np.testing.assert_array_equal(out["units"][: len(prompt_units)], prompt_units)
    assert len(out["units"]) == len(prompt_units) + len(out["generated_units"])
    wav = out["waveform"]
    assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()
    # waveform length obeys the HiFi-GAN length invariant for the unit count
    expect = decoder.vocoder.config.waveform_lengths(jnp.asarray([len(out["units"])]))
    assert wav.size == int(expect[0])


def test_synthesize_units_trims(decoder):
    wav = synthesize_units(decoder, [2, 5, 1])
    assert wav.ndim == 1 and np.isfinite(wav).all()

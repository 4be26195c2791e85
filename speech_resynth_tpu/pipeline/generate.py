"""Textless speech continuation: units -> LM sampling -> units -> waveform.

GSLM-style generation composed from the existing stack: deduplicated unit
ids map to printable unicode (text/units.py, reference utils.py:28-46
parity), BPE-encode to LM tokens (+num_special_tokens shift, the
UnitTextDataset convention), continue with the KV-cached speculative
decoders (``lookup_decode`` greedy / ``lookup_sample_decode`` with
temperature / top-k / nucleus — exactly ``sample_decode``'s distribution),
then invert the mapping and optionally vocode through the
duration-predicting CFM+HiFi-GAN decoder.

Beyond the reference capability set — its speech LM only *scores*
sWUGGY/sBLIMP pairs (/root/reference/src/speechlm/eval.py); it never
generates.  This is the natural serving-side completion of that stack.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np

from ..models.llama import LlamaLM, greedy_decode, lookup_decode, lookup_sample_decode, sample_decode
from ..text.units import unicode_to_units, units_to_unicode


def generate_unit_continuation(
    units: Sequence[int],
    tokenizer,
    model: LlamaLM,
    variables,
    *,
    max_new_tokens: int = 64,
    eos_token_id: int = 1,
    num_special_tokens: int = 2,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    rng: Optional[jax.Array] = None,
    speculative: bool = False,
) -> np.ndarray:
    """Continue a deduplicated unit sequence; returns the GENERATED units.

    ``units`` are raw 0-based unit ids as produced by ``SpeechEncoder``
    (deduplicate=True).  The prompt maps exactly like training data:
    unicode -> BPE -> +num_special_tokens (pipeline/data.py:454).  Sampled
    ids are cut at EOS, un-shifted, and mapped back through the BPE token
    strings to unit ids.
    """
    unicodes = units_to_unicode([int(u) for u in units])
    bpe_ids = tokenizer.encode(unicodes)
    if not bpe_ids:
        raise ValueError("prompt produced no BPE tokens (empty unit sequence?)")
    prompt = np.asarray([[t + num_special_tokens for t in bpe_ids]], np.int32)

    # Routing measured on v5e (benchmarks/bench_lm.py, PARITY.md round-5
    # speculative-decode table): at the measured unit-grammar acceptance
    # (1.5-1.6 tokens/iteration, B=1) the speculative verify block's ~2x
    # per-iteration cost makes lookup decoding ~0.8x plain KV decode for
    # every draft size tried — so plain decode is the DEFAULT and the
    # speculative paths (bit-exact greedy / exact-distribution sampling,
    # both test-locked) are opt-in for streams repetitive enough to clear
    # the ~2 tokens/iteration break-even.
    if speculative:
        if temperature == 0.0:
            seq = lookup_decode(model, variables, prompt, max_new_tokens=max_new_tokens, eos_token_id=eos_token_id)
        else:
            seq = lookup_sample_decode(
                model,
                variables,
                prompt,
                max_new_tokens=max_new_tokens,
                eos_token_id=eos_token_id,
                rng=rng,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
            )
    elif temperature == 0.0:
        seq = greedy_decode(model, variables, prompt, max_new_tokens=max_new_tokens, eos_token_id=eos_token_id)
    else:
        seq = sample_decode(
            model,
            variables,
            prompt,
            max_new_tokens=max_new_tokens,
            eos_token_id=eos_token_id,
            rng=rng,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
        )
    seq = np.asarray(seq)[0, prompt.shape[1] :]

    hits = np.where(seq == eos_token_id)[0]
    if hits.size:
        seq = seq[: hits[0]]
    # un-shift to BPE ids; drop stray special ids (pad/bos) and any ids past
    # the tokenizer vocabulary (the LM head may be padded wider) defensively
    vocab = tokenizer.vocab_size
    gen_bpe = [
        int(t) - num_special_tokens
        for t in seq
        if num_special_tokens <= int(t) < vocab + num_special_tokens
    ]
    text = "".join(tokenizer.token(t) for t in gen_bpe)
    return np.asarray(unicode_to_units(text), np.int32)


def synthesize_units(decoder, units: Sequence[int], *, dt: float = 0.0625, truncation_value: float = 1.0, rng=None):
    """Vocode a raw unit sequence through the composite decoder.

    Applies the +1 decoder vocabulary shift (pad is 0 — README quickstart /
    reference textless convention) and returns the trimmed 1-D waveform.
    """
    ids = np.asarray(units, np.int32)[None, :] + 1
    wavs = decoder(ids, dt=dt, truncation_value=truncation_value, rng=rng)
    return wavs[0][0]  # decoder returns a list of (1, T_i) rows


def continue_speech(
    units: Sequence[int],
    tokenizer,
    model: LlamaLM,
    variables,
    decoder,
    *,
    include_prompt: bool = True,
    **sample_kwargs,
) -> dict:
    """units -> LM continuation -> waveform, in one call.

    Returns {"units": full unit sequence, "generated_units": ...,
    "waveform": trimmed 1-D float32}.  ``sample_kwargs`` forward to
    ``generate_unit_continuation`` (max_new_tokens, temperature, top_k,
    top_p, rng, ...).
    """
    gen = generate_unit_continuation(units, tokenizer, model, variables, **sample_kwargs)
    full = np.concatenate([np.asarray(units, np.int32), gen]) if include_prompt else gen
    if full.size == 0:
        raise ValueError("nothing to synthesize: empty continuation and include_prompt=False")
    wav = synthesize_units(decoder, full)
    return {"units": full, "generated_units": gen, "waveform": wav}

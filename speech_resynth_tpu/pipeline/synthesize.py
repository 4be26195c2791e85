"""Batch resynthesis: wav tree -> units -> decoder -> wav tree.

Stage parity with /root/reference/src/flow_matching/synthesize.py:13-54:
encode each source waveform to units (+1 shift, 0 = pad), run the composite
decoder, write 16 kHz wavs mirroring the source tree.  Batched: the C++
loader fills padded wav batches; the encoder and the decoder each run as one
jitted program per bucket.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..dsp import audio_io
from ..models.composite import ConditionalFlowMatchingWithHifiGan
from ..models.speech_encoder import SpeechEncoder
from .data import SpeechDataset


def synthesize(config, encoder: Optional[SpeechEncoder] = None, decoder=None) -> None:
    dataset = SpeechDataset(
        config.synthesis.src_dir,
        split=config.synthesis.split,
        ext_audio=config.synthesis.ext_audio,
    )
    if encoder is None:
        encoder = SpeechEncoder.by_name(
            config.flow_matching.dense_model_name,
            config.flow_matching.quantizer_model_name,
            config.flow_matching.vocab_size,
            deduplicate=bool(config.flow_matching.get("predict_duration", False)),
        )
    if decoder is None:
        from .evaluate import _load_decoder

        decoder = _load_decoder(config)

    tgt_dir = Path(config.synthesis.tgt_dir)
    dt = float(config.flow_matching.dt)
    trunc = config.flow_matching.get("truncation_value")
    batch_size = int(config.flow_matching_with_hifigan.batch_size)

    rng = jax.random.key(int(config.get("common", {}).get("seed", 0) or 0))
    for batch in dataset.batches(batch_size):
        valid = batch["wavs_len"] >= 0
        enc = encoder(batch["input_values"], lengths=np.maximum(batch["wavs_len"], 0))
        units = np.asarray(enc["units"]) + 1  # 0: pad (synthesize.py:40)
        counts = np.asarray(enc["num_units"])
        # zero out positions past each utterance's unit count
        pos = np.arange(units.shape[1])[None, :]
        input_ids = np.where(pos < counts[:, None], units, 0).astype(np.int32)

        rng, sub = jax.random.split(rng)
        wavs, lengths = decoder.synthesize(input_ids, dt=dt, truncation_value=trunc, rng=sub)
        wavs = np.asarray(wavs)
        lengths = np.asarray(lengths)

        for name, wav, n, ok in zip(batch["names"], wavs, lengths, valid):
            if not ok:
                continue
            out = (tgt_dir / name).with_suffix(config.synthesis.ext_audio)
            audio_io.write(out, wav[: int(n)], 16000)

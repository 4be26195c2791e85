"""Resynthesis evaluation harness: WER/CER/MOS for hyp and ref -> CSV.

Stage parity with /root/reference/src/flow_matching/eval.py:22-96: batch
resynthesis through the composite decoder, MOS on both hypothesis and
reference audio, ASR transcription of both, corpus WER/CER with the
reference's normalization pipelines, and the six-row CSV
(WER/CER/MOS x hyp/ref).  ASR/MOS backends are pluggable
(pipeline/scorers.py) since Whisper/UTMOS are host-side torch models.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np
import pandas as pd

from ..models.composite import ConditionalFlowMatchingWithHifiGan
from ..text.normalize import cer, wer
from .data import UnitDataset
from .scorers import ASRScorer, MOSScorer, default_asr, default_mos


def _load_decoder(config) -> ConditionalFlowMatchingWithHifiGan:
    """Composite checkpoint when present (eval.py:32 semantics) — a local
    directory or an org/name hub id, both resolved by ``from_pretrained``
    (models/hub.py) — else the two training-export dirs (load_pretrained,
    models.py:200-209)."""
    name = None
    try:
        name = config.flow_matching_with_hifigan.get("name")
    except Exception:
        pass
    name_error = None
    if name:
        try:
            return ConditionalFlowMatchingWithHifiGan.from_pretrained(str(name))
        except FileNotFoundError as exc:  # fall back to the training exports
            name_error = str(exc)
    fm_dir = Path(str(config.flow_matching.path)) / "hf"
    voc_dir = Path(str(config.hifigan.path))
    if (fm_dir / "config.json").is_file() and (voc_dir / "config.json").is_file():
        return ConditionalFlowMatchingWithHifiGan.load_pretrained(str(fm_dir), str(voc_dir))
    raise FileNotFoundError(
        "no decoder checkpoint found: flow_matching_with_hifigan.name "
        f"({name!r}) did not resolve"
        + (f" ({name_error})" if name_error else "")
        + f" and the training-export dirs are incomplete ({fm_dir}/config.json "
        f"and {voc_dir}/config.json must both exist — run train_flow_matching "
        "and train_hifigan first, or point flow_matching_with_hifigan.name at "
        "a composite export dir or hub id)"
    )


def evaluate(
    config,
    decoder: Optional[ConditionalFlowMatchingWithHifiGan] = None,
    asr: Optional[ASRScorer] = None,
    mos: Optional[MOSScorer] = None,
) -> pd.DataFrame:
    dataset = UnitDataset(
        config.dataset.test_file,
        wav_dir=config.dataset.wav_dir,
        ext_audio=config.dataset.ext_audio,
    )
    if decoder is None:
        decoder = _load_decoder(config)
    asr = asr if asr is not None else default_asr(config)
    mos = mos if mos is not None else default_mos(config)

    dt = float(config.flow_matching.dt)
    trunc = config.flow_matching.get("truncation_value")
    batch_size = int(config.flow_matching_with_hifigan.batch_size)

    transcripts, hyps, refs, hyp_scores, ref_scores = [], [], [], [], []
    rng = jax.random.key(0)

    for batch in dataset.batches(batch_size, shuffle=False, drop_last=False):
        rng, sub = jax.random.split(rng)
        wavs, lengths = decoder.synthesize(batch["input_ids"], dt=dt, truncation_value=trunc, rng=sub)
        wavs, lengths = np.asarray(wavs), np.asarray(lengths)
        ref_wavs, ref_lengths = dataset.wav_batch(batch["names"])

        hyp_list = [w[: int(n)] for w, n in zip(wavs, lengths)]
        ref_list = [w[: int(max(n, 0))] for w, n in zip(ref_wavs, ref_lengths)]

        hyp_scores += [mos.score(w) for w in hyp_list]
        ref_scores += [mos.score(w) for w in ref_list]
        hyps += asr.transcribe(hyp_list)
        refs += asr.transcribe(ref_list)
        transcripts += batch["transcripts"]

    # scorer provenance travels with every score: a smoke run through
    # NullASR/EnergyMOS must never be mistaken for a NativeWhisperASR/
    # NativeUTMOS result (WER==1.0 from NullASR looks like a catastrophic
    # real score otherwise)
    asr_name, mos_name = type(asr).__name__, type(mos).__name__
    df = pd.DataFrame(
        {
            "score": [
                wer(transcripts, hyps),
                cer(transcripts, hyps),
                float(np.mean(hyp_scores)) if hyp_scores else float("nan"),
                wer(transcripts, refs),
                cer(transcripts, refs),
                float(np.mean(ref_scores)) if ref_scores else float("nan"),
            ],
            "scorer": [asr_name, asr_name, mos_name, asr_name, asr_name, mos_name],
        },
        index=["WER (hyp)", "CER (hyp)", "MOS (hyp)", "WER (ref)", "CER (ref)", "MOS (ref)"],
    )
    result_path = Path(config.eval.result_path)
    result_path.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(result_path)
    return df

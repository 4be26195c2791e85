"""Preprocessing stages: resample / tokenize / extract_features.

Stage parity with /root/reference/src/flow_matching/preprocess.py:14-100,
re-designed as BATCHED DEVICE-RESIDENT passes (BASELINE.json): the
reference loops file-by-file on the host with a CUDA round-trip per
utterance; here each stage reads a whole batch with the C++ threaded loader,
runs ONE jitted program per padded bucket (resample / HuBERT+kmeans / mel),
and streams results back.

Idempotence parity: extract_features skips existing outputs
(preprocess.py:87-88); features are stored as .npy (torch .pt equivalent).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from ..dsp import audio_io
from ..dsp.mel import log_mel_spectrogram
from ..dsp.resample import resample as resample_op
from ..dsp.vad import trim
from ..models.speech_encoder import SpeechEncoder
from .data import LibriTTS_R


def _bucket(n: int, sizes: Sequence[int]) -> int:
    for s in sizes:
        if n <= s:
            return s
    return sizes[-1]


def resample(config) -> None:
    """All wavs under wav_dir_orig -> 16 kHz under wav_dir
    (preprocess.py:20-40 semantics incl. optional VAD trim)."""
    wav_dir_orig = Path(config.dataset.wav_dir_orig)
    wav_dir = Path(config.dataset.wav_dir)
    ext = config.dataset.ext_audio
    vad = bool(config.dataset.get("vad", False))
    paths = sorted(wav_dir_orig.glob(f"**/*{ext}"))

    # group by source sample rate so each group is one batched device op
    by_sr: Dict[int, List[Path]] = {}
    for p in paths:
        try:
            sr, _, _ = audio_io.info(p)
        except IOError:
            continue
        by_sr.setdefault(sr, []).append(p)

    resample_jit = jax.jit(resample_op, static_argnums=(1, 2))
    batch_size = int(config.dataset.get("preprocess_batch_size", 32))
    buckets = (16000 * 5, 16000 * 10, 16000 * 20, 16000 * 40)

    for sr, group in by_sr.items():
        for i in range(0, len(group), batch_size):
            chunk = group[i : i + batch_size]
            max_len = max(audio_io.info(p)[2] for p in chunk)
            wavs, lengths, _ = audio_io.read_batch(chunk, _bucket(max_len, [int(b * sr / 16000) for b in buckets]))
            out = np.asarray(resample_jit(wavs, sr, 16000)) if sr != 16000 else wavs
            out_lengths = (lengths * 16000 + sr - 1) // sr if sr != 16000 else lengths
            for p, wav, n in zip(chunk, out, out_lengths):
                if n < 0:
                    continue
                y = wav[: int(n)]
                if vad:
                    y, _ = trim(y, top_db=20)
                audio_io.write(wav_dir / p.relative_to(wav_dir_orig), y, 16000)


def tokenize(config, encoder: Optional[SpeechEncoder] = None) -> None:
    """Speech -> unit/duration JSONs for train/dev/test
    (preprocess.py:43-76 semantics), batched through the jitted encoder."""
    if encoder is None:
        encoder = SpeechEncoder.by_name(
            config.flow_matching.dense_model_name,
            config.flow_matching.quantizer_model_name,
            config.flow_matching.vocab_size,
            deduplicate=bool(config.flow_matching.get("predict_duration", False)),
        )
    wav_dir = config.dataset.wav_dir
    ext = config.dataset.ext_audio
    splits = [
        (LibriTTS_R(wav_dir, split="train-*", ext_audio=ext), config.dataset.train_file),
        (LibriTTS_R(wav_dir, config.dataset.get("wav_dir_orig"), split="dev-clean", ext_audio=ext), config.dataset.dev_file),
        (LibriTTS_R(wav_dir, config.dataset.get("wav_dir_orig"), split="test-*", ext_audio=ext), config.dataset.test_file),
    ]
    batch_size = int(config.dataset.get("preprocess_batch_size", 16))
    for dataset, out_file in splits:
        _tokenize(encoder, out_file, dataset, batch_size)


def _tokenize(encoder: SpeechEncoder, out_file: str, dataset, batch_size: int) -> None:
    result: Dict[str, Dict] = {}
    for batch in dataset.batches(batch_size):
        valid = batch["wavs_len"] >= 0
        out = encoder(batch["input_values"], lengths=np.maximum(batch["wavs_len"], 0))
        units = np.asarray(out["units"])
        durations = np.asarray(out["durations"])
        counts = np.asarray(out["num_units"])
        for j, name in enumerate(batch["names"]):
            if not valid[j]:
                continue
            n = int(counts[j])
            result[name] = {
                "units": units[j, :n].tolist(),
                "durations": durations[j, :n].tolist(),
                "transcript": batch["transcripts"][j],
            }
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    with open(out_file, "w") as f:
        json.dump(result, f)


def extract_features(config) -> None:
    """Per-utterance log-mels cached as .npy (preprocess.py:79-100 semantics:
    peak-norm 0.95 then mel; skip existing)."""
    wav_dir = Path(config.dataset.wav_dir)
    spectrogram_dir = Path(config.dataset.spectrogram_dir)
    ext = config.dataset.ext_audio
    paths = sorted(wav_dir.glob(f"**/*{ext}"))

    mel_jit = jax.jit(lambda w: log_mel_spectrogram(w))
    batch_size = int(config.dataset.get("preprocess_batch_size", 16))
    buckets = (16000 * 5, 16000 * 10, 16000 * 20, 16000 * 40)

    todo = []
    for p in paths:
        out_path = spectrogram_dir / p.relative_to(wav_dir).with_suffix(".npy")
        if not out_path.is_file():
            todo.append((p, out_path))

    for i in range(0, len(todo), batch_size):
        chunk = todo[i : i + batch_size]
        max_len = max(audio_io.info(p)[2] for p, _ in chunk)
        bucket = _bucket(max_len, list(buckets))
        wavs, lengths, _ = audio_io.read_batch([p for p, _ in chunk], bucket)
        peaks = np.abs(wavs).max(axis=1, keepdims=True)
        wavs = wavs / np.maximum(peaks, 1e-9) * 0.95
        mels = np.asarray(mel_jit(wavs))  # (B, frames, 80)
        hop, n_fft = 320, 400
        for (p, out_path), mel, n in zip(chunk, mels, lengths):
            if n < 0:
                continue
            n_frames = max(1 + (int(n) - n_fft) // hop, 0)
            out_path.parent.mkdir(parents=True, exist_ok=True)
            np.save(out_path, mel[:n_frames])


def preprocess(config) -> None:
    """Full stage chain (preprocess.py:14-17)."""
    resample(config)
    tokenize(config)
    extract_features(config)

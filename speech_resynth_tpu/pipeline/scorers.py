"""Pluggable evaluation scorers (ASR transcriber + MOS predictor).

The reference scores synthesis with two external torch models — Whisper
large-v3 ASR (flow_matching/eval.py:34-48) and the UTMOS lightning module
(C23, cloned HF space) — neither of which runs on TPU.  SURVEY.md §7 hard
part 7's plan: put them behind interfaces so the eval HARNESS (batching,
WER/CER/MOS aggregation, CSV) is fully ours and the scorer backends are
swappable:

* ``TorchWhisperASR`` / ``TorchUTMOS`` load local HF checkpoints on the host
  CPU when available (parity scoring must use the same scorer versions).
* ``EnergyMOS`` / ``NullASR`` are dependency-free fallbacks so the pipeline
  runs end-to-end (smoke tests, CI) without the external models.
"""

from __future__ import annotations

from typing import List, Protocol, Sequence

import numpy as np


class ASRScorer(Protocol):
    def transcribe(self, wavs: Sequence[np.ndarray], sample_rate: int = 16000) -> List[str]: ...


class MOSScorer(Protocol):
    def score(self, wav: np.ndarray, sample_rate: int = 16000) -> float: ...


class NullASR:
    """Placeholder transcriber (returns empty strings).  WER against it is
    meaningless; used only to exercise the harness without Whisper."""

    def transcribe(self, wavs, sample_rate: int = 16000) -> List[str]:
        return ["" for _ in wavs]


class EnergyMOS:
    """Crude signal-statistics MOS proxy in [1, 5] — monotone in SNR-ish
    loudness/clipping heuristics.  A stand-in for UTMOS when its checkpoint
    is absent; not comparable across scorer implementations."""

    def score(self, wav, sample_rate: int = 16000) -> float:
        wav = np.asarray(wav, np.float32).reshape(-1)
        if wav.size == 0:
            return 1.0
        rms = float(np.sqrt(np.mean(wav**2)))
        clip = float(np.mean(np.abs(wav) > 0.99))
        loud = np.clip(np.interp(rms, [1e-4, 0.05, 0.3], [1.0, 4.5, 3.5]), 1.0, 5.0)
        return float(np.clip(loud - 10 * clip, 1.0, 5.0))


class TorchWhisperASR:
    """HF Whisper pipeline on host CPU from a local checkpoint dir
    (eval.py:34-48 parity: same generate kwargs)."""

    def __init__(self, model_dir: str, language: str = "english"):
        import torch
        from transformers import AutoModelForSpeechSeq2Seq, AutoProcessor, pipeline

        model = AutoModelForSpeechSeq2Seq.from_pretrained(model_dir, low_cpu_mem_usage=True, use_safetensors=True)
        processor = AutoProcessor.from_pretrained(model_dir)
        self._pipe = pipeline(
            "automatic-speech-recognition",
            model=model,
            tokenizer=processor.tokenizer,
            feature_extractor=processor.feature_extractor,
        )
        self._language = language

    def transcribe(self, wavs, sample_rate: int = 16000) -> List[str]:
        outs = self._pipe(
            [np.asarray(w, np.float32) for w in wavs],
            generate_kwargs={"language": self._language},
            return_timestamps=True,
        )
        return [o["text"] for o in outs]


class TorchUTMOS:
    """UTMOS-style MOS predictor from a local torchscript/state-dict export.

    The reference patches and wraps the sarulab-speech UTMOS demo (C23);
    here any callable torch module mapping (1, T) 16 kHz waveform -> scalar
    MOS can be loaded.
    """

    def __init__(self, ckpt_path: str):
        import torch

        self._model = torch.jit.load(ckpt_path, map_location="cpu").eval()
        self._torch = torch

    def score(self, wav, sample_rate: int = 16000) -> float:
        with self._torch.inference_mode():
            t = self._torch.from_numpy(np.asarray(wav, np.float32).reshape(1, -1))
            return float(self._model(t).reshape(()))


def default_asr(config) -> ASRScorer:
    name = None
    try:
        name = config.asr.name
    except Exception:
        pass
    if name:
        from pathlib import Path

        if Path(str(name)).exists():
            return TorchWhisperASR(str(name))
    return NullASR()


def default_mos(config) -> MOSScorer:
    path = None
    try:
        path = config.eval.get("utmos_ckpt")
    except Exception:
        pass
    if path:
        from pathlib import Path

        if Path(str(path)).exists():
            return TorchUTMOS(str(path))
    return EnergyMOS()

"""Audio I/O: C++ WAV reader/writer with threaded batch loading.

Replaces the reference's torchaudio.load/save call sites
(/root/reference/src/flow_matching/preprocess.py:29-40, data.py:39-40,
hifigan/data.py:93) with a native libwavio (csrc/wavio.cpp) exposed over
ctypes.  ``read_batch`` fills one padded (N, T) array with a C++ thread
pool — the host-side feed for the batched device-resident preprocessing
path (BASELINE.json).

FLAC decoding is not implemented in round 1: LibriSpeech/Libri-Light .flac
inputs need transcoding to wav first; ``read`` raises a clear error.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

_CSRC = Path(__file__).parent / "csrc"
_LIB_PATH = _CSRC / "libwavio.so"
_lib = None


def _load():
    global _lib
    if _lib is None:
        src = _CSRC / "wavio.cpp"
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", str(src), "-o", str(_LIB_PATH)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.wav_info.restype = ctypes.c_int
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.wav_read.restype = ctypes.c_int64
        lib.wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.wav_write.restype = ctypes.c_int
        lib.wav_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64,
            ctypes.c_uint32,
            ctypes.c_uint32,
        ]
        lib.wav_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
        ]
        _lib = lib
    return _lib


def info(path: str | Path) -> Tuple[int, int, int]:
    """(sample_rate, channels, frames)."""
    lib = _load()
    sr = ctypes.c_uint32()
    ch = ctypes.c_uint32()
    frames = ctypes.c_uint64()
    if lib.wav_info(str(path).encode(), ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(frames)) != 0:
        raise IOError(f"cannot read wav: {path}")
    return sr.value, ch.value, frames.value


def read(path: str | Path) -> Tuple[np.ndarray, int]:
    """-> (float32 (frames,) mono or (frames, channels), sample_rate)."""
    path = Path(path)
    if path.suffix.lower() == ".flac":
        raise NotImplementedError(
            "FLAC decode is not built yet; transcode to wav (see dsp/audio_io.py docstring)"
        )
    lib = _load()
    sr_, ch_, frames_ = info(path)
    buf = np.empty(frames_ * ch_, np.float32)
    sr = ctypes.c_uint32()
    ch = ctypes.c_uint32()
    n = lib.wav_read(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frames_, ctypes.byref(sr), ctypes.byref(ch)
    )
    if n < 0:
        raise IOError(f"cannot read wav: {path}")
    data = buf[: n * ch.value]
    if ch.value > 1:
        data = data.reshape(-1, ch.value)
    return data, sr.value


def write(path: str | Path, samples: np.ndarray, sample_rate: int) -> None:
    samples = np.ascontiguousarray(samples, np.float32)
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    frames = samples.shape[0]
    lib = _load()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    rc = lib.wav_write(
        str(path).encode(), samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frames, channels, sample_rate
    )
    if rc != 0:
        raise IOError(f"cannot write wav: {path}")


def read_batch(
    paths: Sequence[str | Path],
    max_frames: int,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded C++ batch load -> (wavs (N, max_frames) f32 mono padded,
    lengths (N,) int64 (-1 on failure), sample_rates (N,) uint32)."""
    lib = _load()
    n = len(paths)
    out = np.zeros((n, max_frames), np.float32)
    lengths = np.zeros(n, np.int64)
    srs = np.zeros(n, np.uint32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.wav_read_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n_threads,
    )
    return out, lengths, srs

"""Audio I/O: native WAV + FLAC readers with threaded batch loading.

Replaces the reference's torchaudio.load/save call sites
(/root/reference/src/flow_matching/preprocess.py:29-40, data.py:39-40,
hifigan/data.py:93) with a native libwavio (csrc/wavio.cpp + csrc/flac.cpp)
exposed over ctypes.  ``read_batch`` fills one padded (N, T) array with a
C++ thread pool — the host-side feed for the batched device-resident
preprocessing path (BASELINE.json) — dispatching per extension (.flac uses
the native FLAC decoder, which covers LibriSpeech/Libri-Light).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

_CSRC = Path(__file__).parent / "csrc"
_LIB_PATH = _CSRC / "libwavio.so"
_lib = None


def _load():
    global _lib
    if _lib is None:
        srcs = [_CSRC / "wavio.cpp", _CSRC / "flac.cpp"]
        if not _LIB_PATH.exists() or any(_LIB_PATH.stat().st_mtime < s.stat().st_mtime for s in srcs):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", *map(str, srcs), "-o", str(_LIB_PATH)],
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
        lib.flac_info.restype = ctypes.c_int
        lib.flac_info.argtypes = lib.wav_info.argtypes
        lib.flac_read.restype = ctypes.c_int64
        lib.flac_read.argtypes = lib.wav_read.argtypes
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
    is_flac = Path(path).suffix.lower() == ".flac"
    fn = lib.flac_info if is_flac else lib.wav_info
    sr = ctypes.c_uint32()
    ch = ctypes.c_uint32()
    frames = ctypes.c_uint64()
    if fn(str(path).encode(), ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(frames)) != 0:
        raise IOError(f"cannot read audio: {path}")
    return sr.value, ch.value, frames.value


def read(path: str | Path) -> Tuple[np.ndarray, int]:
    """-> (float32 (frames,) mono or (frames, channels), sample_rate)."""
    path = Path(path)
    lib = _load()
    is_flac = path.suffix.lower() == ".flac"
    fn = lib.flac_read if is_flac else lib.wav_read
    sr_, ch_, frames_ = info(path)
    if frames_ == 0 and is_flac:  # STREAMINFO may omit total_samples
        frames_ = sr_ * 3600  # one-hour cap
    buf = np.empty(max(frames_, 1) * ch_, np.float32)
    sr = ctypes.c_uint32()
    ch = ctypes.c_uint32()
    n = fn(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max(frames_, 1), ctypes.byref(sr), ctypes.byref(ch)
    )
    if n < 0:
        raise IOError(f"cannot read audio: {path}")
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

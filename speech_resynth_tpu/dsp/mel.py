"""Log-mel spectrogram frontend.

Numerical parity target: the reference's ``mel_spectrogram``
(/root/reference/src/hifigan/data.py:17-53): torch.stft with n_fft=400,
hop=320, periodic Hann window, center=False, one-sided, times a librosa
Slaney-scale / Slaney-normalized mel filterbank (sr=16000, 80 mels, fmin=0,
fmax=8000), then log-compression with clip 1e-5
(``dynamic_range_compression_torch``, data.py:9-10).

TPU-first formulation: the STFT is a *matmul*, not an FFT call.  Framing the
waveform into (frames, 400) windows and multiplying by a precomputed
window-folded DFT basis (400, 2*201) maps directly onto the MXU and lets XLA
fuse the magnitude + mel projection + log into one kernel; a 400-point FFT
would run on the VPU with awkward shapes.  All constant matrices are built
once in numpy at trace time.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

MEL_PAD_VALUE = float(np.log(1e-5))  # log-compression of silence; pad sentinel


def dynamic_range_compression(x: jax.Array, C: float = 1.0, clip_val: float = 1e-5) -> jax.Array:
    """log(clip(x, clip_val) * C) — parity with hifigan/data.py:9-10."""
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (np.maximum(m, min_log_mel) - min_log_mel)), freqs)
    return freqs


@lru_cache(maxsize=8)
def mel_filterbank(
    sr: int = 16000,
    n_fft: int = 400,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2+1).

    Matches ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)`` defaults
    (htk=False, norm="slaney") used at hifigan/data.py:33.
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs, dtype=np.float64)
    mel_pts = np.linspace(hz_to_mel_slaney(np.array(fmin)), hz_to_mel_slaney(np.array(fmax)), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts.reshape(-1, 1) - fft_freqs.reshape(1, -1)

    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    fb = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: each filter integrates to ~2/bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm.reshape(-1, 1)
    return fb.astype(np.float32)


@lru_cache(maxsize=8)
def _stft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Window-folded real-DFT bases, each (n_fft, n_fft//2+1)."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64).reshape(-1, 1)
    k = np.arange(n_freqs, dtype=np.float64).reshape(1, -1)
    ang = 2.0 * np.pi * n * k / n_fft
    # periodic Hann (torch.hann_window default)
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
    cos_b = (np.cos(ang) * window.reshape(-1, 1)).astype(np.float32)
    sin_b = (-np.sin(ang) * window.reshape(-1, 1)).astype(np.float32)
    return cos_b, sin_b


def frame_signal(y: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """(..., T) -> (..., n_frames, n_fft) framing with center=False."""
    T = y.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    starts = np.arange(n_frames) * hop
    idx = starts.reshape(-1, 1) + np.arange(n_fft).reshape(1, -1)
    return y[..., idx]


def stft_magnitude(y: jax.Array, n_fft: int = 400, hop: int = 320) -> jax.Array:
    """(..., T) -> (..., n_frames, n_fft//2+1) one-sided magnitude STFT."""
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop)
    cos_b, sin_b = _stft_basis(n_fft)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    return jnp.sqrt(re * re + im * im + 1e-24)


def log_mel_spectrogram(
    y: jax.Array,
    n_fft: int = 400,
    num_mels: int = 80,
    sampling_rate: int = 16000,
    hop_size: int = 320,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> jax.Array:
    """(..., T) waveform -> (..., n_frames, num_mels) log-mel features.

    Canonical time-major layout (frames on the sublane axis, mels on lanes).
    """
    mag = stft_magnitude(y, n_fft, hop_size)
    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = mag @ fb.T
    return dynamic_range_compression(mel)


def whisper_log_mel(
    y: jax.Array,
    num_mels: int = 128,
    n_fft: int = 400,
    hop_size: int = 160,
    sampling_rate: int = 16000,
) -> jax.Array:
    """Whisper's log-mel frontend: (..., T) -> (..., n_frames, num_mels).

    Parity with openai-whisper ``log_mel_spectrogram`` / HF
    WhisperFeatureExtractor: center=True reflect pad, power spectrogram with
    the last frame dropped, Slaney filters, log10 clamp 1e-10, dynamic-range
    floor at (max - 8), then (x + 4) / 4.  Same matmul-STFT formulation as
    the HiFi-GAN frontend (module docstring).  num_mels: 80 (<= large-v2) or
    128 (large-v3).
    """
    pad = n_fft // 2
    widths = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    y = jnp.pad(y.astype(jnp.float32), widths, mode="reflect")
    mag = stft_magnitude(y, n_fft, hop_size)
    power = (mag * mag)[..., :-1, :]  # whisper drops the last frame
    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, 0.0, sampling_rate / 2))
    mel = power @ fb.T
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    return (log_spec + 4.0) / 4.0


def mel_spectrogram(y: jax.Array, **kwargs) -> jax.Array:
    """Reference-layout alias: (..., T) -> (..., num_mels, n_frames).

    Signature parity with hifigan/data.py:17 (mel-bins-major output).
    """
    return jnp.swapaxes(log_mel_spectrogram(y, **kwargs), -1, -2)

"""Energy-threshold VAD trim.

Capability parity with ``librosa.effects.trim(wav, top_db=20)`` as the
reference's optional resample-stage trim
(/root/reference/src/flow_matching/preprocess.py:32-35, dataset.vad flag):
frame RMS power in dB relative to the signal peak power; leading/trailing
frames quieter than -top_db are cut.

Host-side numpy (runs in the preprocessing pipeline, where output length is
inherently data-dependent) plus a mask-producing jax variant for batched
device-resident use.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _frame_rms_db(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    n = 1 + max(len(y) - frame_length, 0) // hop_length
    if len(y) < frame_length:
        n = 1
        y = np.pad(y, (0, frame_length - len(y)))
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = y[np.minimum(idx, len(y) - 1)]
    rms = np.sqrt(np.mean(frames**2, axis=1))
    power = np.maximum(rms, 1e-10) ** 2
    ref = np.max(power)
    return 10.0 * np.log10(power / max(ref, 1e-20))


def trim(
    y: np.ndarray,
    top_db: float = 20.0,
    frame_length: int = 2048,
    hop_length: int = 512,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Trim leading/trailing silence; returns (trimmed, (start, end))."""
    y = np.asarray(y)
    mono = y if y.ndim == 1 else y.mean(axis=0)
    db = _frame_rms_db(mono.astype(np.float64), frame_length, hop_length)
    loud = np.nonzero(db > -top_db)[0]
    if len(loud) == 0:
        return y[..., :0], (0, 0)
    start = int(loud[0]) * hop_length
    end = min(int(loud[-1] + 1) * hop_length + frame_length, y.shape[-1])
    return y[..., start:end], (start, end)


def trim_mask(
    y: jax.Array,
    top_db: float = 20.0,
    frame_length: int = 2048,
    hop_length: int = 512,
) -> jax.Array:
    """Batched device variant: (B, T) -> (B, T) bool keep-mask (static shape;
    callers combine it with their padding masks instead of slicing)."""
    B, T = y.shape
    n = 1 + max(T - frame_length, 0) // hop_length
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    idx = np.minimum(idx, T - 1)
    frames = y[:, idx]  # (B, n, frame_length)
    power = jnp.mean(frames**2, axis=-1)
    power = jnp.maximum(power, 1e-20)
    db = 10.0 * jnp.log10(power / jnp.max(power, axis=1, keepdims=True))
    loud = db > -top_db  # (B, n)

    frame_pos = jnp.arange(n)
    first = jnp.min(jnp.where(loud, frame_pos, n), axis=1)  # (B,)
    last = jnp.max(jnp.where(loud, frame_pos, -1), axis=1)
    start = first * hop_length
    end = jnp.minimum((last + 1) * hop_length + frame_length, T)
    t = jnp.arange(T)[None, :]
    return (t >= start[:, None]) & (t < end[:, None]) & (last[:, None] >= 0)

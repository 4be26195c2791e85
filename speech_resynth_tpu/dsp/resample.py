"""Polyphase sinc resampler.

Capability parity with torchaudio.functional.resample as the reference uses
it (/root/reference/src/flow_matching/preprocess.py:30, data.py:40: arbitrary
rate -> 16 kHz, windowed-sinc interpolation, lowpass_filter_width 6, rolloff
0.99).

TPU-first formulation: resampling is ONE ``conv_general_dilated`` with
``lhs_dilation=L`` (upsample) and ``window_strides=M`` (downsample), so
whole batches resample on-device in a single XLA op — replacing the
reference's per-file CPU loop (preprocess.py:25-40, BASELINE.json's batched
device-resident preprocessing demand).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _sinc_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int, rolloff: float) -> np.ndarray:
    """Hann-windowed sinc low-pass at the upsampled rate; shape (K, 1, 1)."""
    g = math.gcd(orig_freq, new_freq)
    L, M = new_freq // g, orig_freq // g
    cutoff = rolloff * 0.5 / max(L, M)  # normalized to the upsampled Nyquist
    half_width = lowpass_filter_width * max(L, M)
    t = np.arange(-half_width, half_width + 1, dtype=np.float64)
    x = 2 * cutoff * t
    sinc = np.sinc(x)
    window = np.hanning(2 * half_width + 1)
    kernel = 2 * cutoff * sinc * window * L  # gain L compensates zero-stuffing
    return kernel.astype(np.float32).reshape(-1, 1, 1)


def resample(
    waveform: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """(…, T) -> (…, ceil(T * new/orig)); float32."""
    if orig_freq == new_freq:
        return jnp.asarray(waveform, jnp.float32)
    g = math.gcd(orig_freq, new_freq)
    L, M = new_freq // g, orig_freq // g
    kernel = jnp.asarray(_sinc_kernel(orig_freq, new_freq, lowpass_filter_width, rolloff))
    half_width = (kernel.shape[0] - 1) // 2

    x = jnp.asarray(waveform, jnp.float32)
    lead = x.shape[:-1]
    T = x.shape[-1]
    x = x.reshape(-1, T, 1)  # NWC

    out_len = -(-T * L // M)  # ceil
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(M,),
        padding=[(half_width, half_width + M)],
        lhs_dilation=(L,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[:, :out_len, 0]
    return out.reshape(*lead, out_len)

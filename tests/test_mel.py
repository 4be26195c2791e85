"""Mel frontend parity tests.

Golden references:
* STFT — torch.stft (the exact op the reference calls, hifigan/data.py:39-47)
* mel filterbank — transformers.audio_utils.mel_filter_bank, an independent
  librosa-compatible Slaney implementation
"""

import numpy as np
import pytest

from speech_resynth_tpu.dsp import mel as M


def test_mel_filterbank_against_transformers():
    from transformers.audio_utils import mel_filter_bank

    ours = M.mel_filterbank(16000, 400, 80, 0.0, 8000.0)
    theirs = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns (n_freqs, n_mels)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_stft_magnitude_against_torch():
    import torch

    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1

    ours = np.asarray(M.stft_magnitude(y, 400, 320))

    spec = torch.stft(
        torch.from_numpy(y),
        400,
        hop_length=320,
        window=torch.hann_window(400),
        center=False,
        onesided=True,
        return_complex=True,
    )
    theirs = spec.abs().numpy().transpose(0, 2, 1)  # (B, F, T) -> (B, T, F)

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_log_mel_end_to_end_against_torch_pipeline():
    import torch
    from transformers.audio_utils import mel_filter_bank

    rng = np.random.default_rng(1)
    y = rng.standard_normal((1, 16080)).astype(np.float32) * 0.5

    ours = np.asarray(M.log_mel_spectrogram(y))

    spec = torch.stft(
        torch.from_numpy(y),
        400,
        hop_length=320,
        window=torch.hann_window(400),
        center=False,
        onesided=True,
        return_complex=True,
    ).abs()
    fb = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).T
    melspec = torch.from_numpy(fb.astype(np.float32)) @ spec
    theirs = torch.log(torch.clamp(melspec, min=1e-5)).numpy().transpose(0, 2, 1)

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)
    # frame count convention: 1 + (T - n_fft) // hop; 16080 -> 50 frames
    assert ours.shape[1] == 50


def test_pad_sentinel_matches_reference():
    # reference pads mels with log(clamp(0, 1e-5)) = log(1e-5)
    assert np.isclose(M.MEL_PAD_VALUE, np.log(1e-5))
    assert np.isclose(float(M.dynamic_range_compression(np.zeros(()))), M.MEL_PAD_VALUE)


def test_mel_spectrogram_reference_layout():
    y = np.zeros((16080,), np.float32)
    out = M.mel_spectrogram(y)
    assert out.shape == (80, 50)


@pytest.mark.parametrize("T,expected", [(400, 1), (719, 1), (720, 2), (16080, 50)])
def test_frame_count(T, expected):
    y = np.zeros((T,), np.float32)
    assert M.stft_magnitude(y).shape[0] == expected

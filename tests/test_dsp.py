"""DSP tests: resampler, VAD trim, C++ WAV I/O."""

import numpy as np
import pytest

from speech_resynth_tpu.dsp import audio_io
from speech_resynth_tpu.dsp.resample import resample
from speech_resynth_tpu.dsp.vad import trim, trim_mask


# -- resample ----------------------------------------------------------------


def test_resample_preserves_tone():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)

    out = np.asarray(resample(tone, sr_in, sr_out))
    assert out.shape[0] == sr_out

    spec = np.abs(np.fft.rfft(out[1000:-1000] * np.hanning(len(out) - 2000)))
    freqs = np.fft.rfftfreq(len(out) - 2000, 1 / sr_out)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 1000) < 5
    # amplitude preserved within 2%
    assert abs(np.abs(out[2000:-2000]).max() - 1.0) < 0.02


def test_resample_against_scipy():
    from scipy.signal import resample_poly

    rng = np.random.default_rng(0)
    x = rng.standard_normal(24000).astype(np.float32)
    ours = np.asarray(resample(x, 24000, 16000))
    theirs = resample_poly(x, 2, 3).astype(np.float32)
    assert ours.shape == theirs.shape
    # filters differ; compare in the passband energy sense (interior samples)
    err = np.abs(ours[500:-500] - theirs[500:-500])
    assert np.percentile(err, 95) < 0.15


def test_resample_identity_and_batch():
    x = np.random.default_rng(1).standard_normal((3, 1600)).astype(np.float32)
    same = np.asarray(resample(x, 16000, 16000))
    np.testing.assert_array_equal(same, x)
    up = np.asarray(resample(x, 16000, 32000))
    assert up.shape == (3, 3200)


# -- vad ---------------------------------------------------------------------


def test_trim_removes_silence():
    sr = 16000
    sig = np.concatenate(
        [np.zeros(sr // 2), 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr), np.zeros(sr // 2)]
    ).astype(np.float32)
    trimmed, (start, end) = trim(sig, top_db=20)
    assert start > 0 and end < len(sig)
    # trimmed region contains the tone
    assert start <= sr // 2 + 1024
    assert end >= sr // 2 + sr - 1024
    assert np.abs(trimmed).max() > 0.4


def test_trim_all_silence():
    trimmed, (s, e) = trim(np.zeros(4000, np.float32) + 1e-8)
    # librosa keeps everything relative to max; uniform signal -> nothing cut
    assert (e - s) >= 0


def test_trim_mask_matches_host_trim():
    sr = 8000
    sig = np.concatenate([np.zeros(2000), 0.3 * np.random.default_rng(2).standard_normal(4000), np.zeros(2000)]).astype(
        np.float32
    )
    _, (start, end) = trim(sig, top_db=20, frame_length=512, hop_length=128)
    mask = np.asarray(trim_mask(sig[None], top_db=20, frame_length=512, hop_length=128))[0]
    m_start = int(np.argmax(mask))
    m_end = len(mask) - int(np.argmax(mask[::-1]))
    assert abs(m_start - start) <= 512
    assert abs(m_end - end) <= 512


# -- wav io ------------------------------------------------------------------


def test_wav_roundtrip(tmp_path):
    sr = 16000
    x = (0.5 * np.sin(2 * np.pi * 220 * np.arange(8000) / sr)).astype(np.float32)
    p = tmp_path / "tone.wav"
    audio_io.write(p, x, sr)

    got_sr, ch, frames = audio_io.info(p)
    assert (got_sr, ch, frames) == (sr, 1, 8000)

    y, got_sr2 = audio_io.read(p)
    assert got_sr2 == sr
    np.testing.assert_allclose(y, x, atol=1.5 / 32768)


def test_wav_reads_scipy_written_files(tmp_path):
    from scipy.io import wavfile

    rng = np.random.default_rng(3)
    x16 = (rng.uniform(-0.5, 0.5, 4000) * 32767).astype(np.int16)
    p16 = tmp_path / "pcm16.wav"
    wavfile.write(p16, 22050, x16)
    y, sr = audio_io.read(p16)
    assert sr == 22050
    np.testing.assert_allclose(y, x16 / 32768.0, atol=1e-6)

    xf = rng.uniform(-0.9, 0.9, 4000).astype(np.float32)
    pf = tmp_path / "float32.wav"
    wavfile.write(pf, 44100, xf)
    y2, sr2 = audio_io.read(pf)
    assert sr2 == 44100
    np.testing.assert_allclose(y2, xf, atol=1e-7)

    # stereo
    xs = rng.uniform(-0.5, 0.5, (2000, 2)).astype(np.float32)
    ps = tmp_path / "stereo.wav"
    wavfile.write(ps, 16000, xs)
    y3, _ = audio_io.read(ps)
    assert y3.shape == (2000, 2)


def test_wav_batch_read(tmp_path):
    sr = 16000
    paths = []
    for i, n in enumerate([1000, 2000, 1500]):
        x = np.full(n, 0.1 * (i + 1), np.float32)
        p = tmp_path / f"f{i}.wav"
        audio_io.write(p, x, sr)
        paths.append(p)
    paths.append(tmp_path / "missing.wav")

    wavs, lengths, srs = audio_io.read_batch(paths, max_frames=1800, n_threads=2)
    assert wavs.shape == (4, 1800)
    np.testing.assert_array_equal(lengths, [1000, 1800, 1500, -1])
    assert list(srs[:3]) == [sr] * 3
    np.testing.assert_allclose(wavs[0, :1000], 0.1, atol=1e-4)
    np.testing.assert_allclose(wavs[0, 1000:], 0.0)
    np.testing.assert_allclose(wavs[2, 1500:], 0.0)


def test_missing_audio_raises():
    with pytest.raises(IOError):
        audio_io.read("definitely_missing.flac")
    with pytest.raises(IOError):
        audio_io.read("definitely_missing.wav")


def test_truncated_wav_fmt_chunk_rejected(tmp_path):
    import struct

    # fmt chunk declares 16 bytes but the file is cut short mid-chunk: the
    # reader must fail cleanly instead of reading past the buffer.
    body = b"RIFF" + struct.pack("<I", 100) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x02\x00" + b"\x00" * 26
    p = tmp_path / "trunc.wav"
    p.write_bytes(body[:28])  # ends 8 bytes into the 16-byte fmt body
    from speech_resynth_tpu.dsp import audio_io

    import pytest

    with pytest.raises(IOError):
        audio_io.read(p)


def test_wav_fuzz_no_crash(tmp_path):
    """Deterministic fuzz over the C++ WAV reader: truncations, byte flips,
    and random RIFF-tagged blobs must decode or raise, never crash/overread
    (ADVICE r1: fmt-chunk bounds checks)."""
    from speech_resynth_tpu.dsp import audio_io

    rng = np.random.default_rng(1)
    sr = 16000
    wav = (rng.standard_normal(1200) * 0.2).astype(np.float32)
    p = tmp_path / "good.wav"
    audio_io.write(p, wav, sr)
    good = p.read_bytes()
    q = tmp_path / "fuzz.wav"

    cases = [good[:cut] for cut in range(1, len(good), max(1, len(good) // 37))]
    for _ in range(40):
        b = bytearray(good)
        for pos in rng.integers(0, len(b), 3):
            b[pos] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    for n in (0, 1, 8, 64, 500):
        cases.append(b"RIFF" + bytes(rng.integers(0, 256, n).tolist()))

    for blob in cases:
        q.write_bytes(blob)
        try:
            y, got_sr = audio_io.read(q)
            assert y.size <= 10 * 1200
        except (IOError, OSError):
            pass

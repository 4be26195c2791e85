"""Native FLAC decoder tests.

No FLAC encoder exists in the image, so these tests include a minimal
spec-based encoder (verbatim + fixed-predictor/rice subframes, all stereo
decorrelation modes).  Encoder and decoder are independent implementations
of the format spec, so agreement is a real cross-check.
"""

import numpy as np
import pytest

from speech_resynth_tpu.dsp import audio_io


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def encode_flac(channels_data, sample_rate=16000, bps=16, block_size=256, mode="independent", subframe="fixed2"):
    """channels_data: list of 1-D int arrays (equal length)."""
    n_ch = len(channels_data)
    total = len(channels_data[0])

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)  # min block
    si.write(block_size, 16)  # max block
    si.write(0, 24)  # min frame size (unknown)
    si.write(0, 24)  # max frame size
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.write(0, 128)  # md5
    body = si.bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    def write_subframe(w, samples, sub_bps):
        if subframe == "verbatim":
            w.write(0, 1)
            w.write(1, 6)
            w.write(0, 1)
            for s in samples:
                w.write_signed(int(s), sub_bps)
            return
        order = int(subframe[-1])  # fixed0/1/2
        w.write(0, 1)
        w.write(8 + order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write_signed(int(s), sub_bps)
        # residuals = order-th finite difference (fixed predictor)
        s = np.asarray(samples, np.int64)
        res = s.copy()
        for _ in range(order):
            res = np.diff(res)
        # rice method 0, partition order 0, param p
        p = 6
        w.write(0, 2)  # 4-bit rice
        w.write(0, 4)  # partition order 0
        w.write(p, 4)
        for r in res:
            r = int(r)
            zz = (abs(r) * 2 - 1) if r < 0 else r * 2
            w.write_unary(zz >> p)
            w.write(zz & ((1 << p) - 1), p)

    n_frames = (total + block_size - 1) // block_size
    for fi in range(n_frames):
        blk = [c[fi * block_size : (fi + 1) * block_size] for c in channels_data]
        bs = len(blk[0])
        w = BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking
        w.write(6, 4)  # block size: 8-bit at end
        w.write(5, 4)  # 16 kHz
        if mode == "independent":
            w.write(n_ch - 1, 4)
        elif mode == "left_side":
            w.write(8, 4)
        elif mode == "side_right":
            w.write(9, 4)
        elif mode == "mid_side":
            w.write(10, 4)
        w.write(4, 3)  # 16-bit
        w.write(0, 1)
        w.write(fi, 8)  # utf8 frame number (< 128)
        w.write(bs - 1, 8)
        w.write(0, 8)  # crc8 (decoder ignores)

        if mode == "independent":
            for c in blk:
                write_subframe(w, c, bps)
        else:
            left, right = np.asarray(blk[0], np.int64), np.asarray(blk[1], np.int64)
            if mode == "left_side":
                write_subframe(w, left, bps)
                write_subframe(w, left - right, bps + 1)
            elif mode == "side_right":
                write_subframe(w, left - right, bps + 1)
                write_subframe(w, right, bps)
            else:  # mid_side
                side = left - right
                mid = (left + right) >> 1
                write_subframe(w, mid, bps)
                write_subframe(w, side, bps + 1)
        w.align()
        w.write(0, 16)  # crc16 (decoder ignores)
        out += w.bytes()

    return bytes(out)


def rand_pcm(n, seed, amp=2000):
    rng = np.random.default_rng(seed)
    # smooth-ish signal so fixed predictors get small residuals
    x = np.cumsum(rng.integers(-50, 50, n))
    return np.clip(x, -amp, amp).astype(np.int64)


@pytest.mark.parametrize("subframe", ["verbatim", "fixed0", "fixed1", "fixed2"])
def test_mono_roundtrip(tmp_path, subframe):
    pcm = rand_pcm(1000, seed=1)
    data = encode_flac([pcm], subframe=subframe)
    p = tmp_path / "mono.flac"
    p.write_bytes(data)

    sr, ch, frames = audio_io.info(p)
    assert (sr, ch, frames) == (16000, 1, 1000)

    y, sr2 = audio_io.read(p)
    assert sr2 == 16000 and y.shape == (1000,)
    np.testing.assert_allclose(y, pcm / 32768.0, atol=1e-7)


@pytest.mark.parametrize("mode", ["independent", "left_side", "side_right", "mid_side"])
def test_stereo_modes(tmp_path, mode):
    left = rand_pcm(512, seed=2)
    right = rand_pcm(512, seed=3)
    data = encode_flac([left, right], mode=mode, subframe="fixed1")
    p = tmp_path / f"stereo_{mode}.flac"
    p.write_bytes(data)

    y, sr = audio_io.read(p)
    assert y.shape == (512, 2)
    np.testing.assert_allclose(y[:, 0], left / 32768.0, atol=1e-7)
    np.testing.assert_allclose(y[:, 1], right / 32768.0, atol=1e-7)


def test_flac_in_batch_reader(tmp_path):
    pcm = rand_pcm(800, seed=4)
    p1 = tmp_path / "a.flac"
    p1.write_bytes(encode_flac([pcm], subframe="fixed2"))
    p2 = tmp_path / "b.wav"
    audio_io.write(p2, (pcm / 32768.0).astype(np.float32), 16000)

    wavs, lengths, srs = audio_io.read_batch([p1, p2], max_frames=1000)
    np.testing.assert_array_equal(lengths, [800, 800])
    assert list(srs) == [16000, 16000]
    np.testing.assert_allclose(wavs[0, :800], pcm / 32768.0, atol=1e-7)
    np.testing.assert_allclose(wavs[0, :800], wavs[1, :800], atol=1.5 / 32768)


def test_corrupt_flac(tmp_path):
    p = tmp_path / "bad.flac"
    p.write_bytes(b"fLaC" + b"\x00" * 10)
    with pytest.raises(IOError):
        audio_io.read(p)


def test_truncated_flac_streaminfo_rejected(tmp_path):
    # STREAMINFO header declares 34 bytes but the file ends early: must be
    # rejected cleanly, not read past the buffer.
    p = tmp_path / "trunc.flac"
    p.write_bytes(b"fLaC" + bytes([0x80, 0, 0, 34]) + b"\x00" * 10)
    with pytest.raises(IOError):
        audio_io.read(p)


def test_flac_trailing_junk_tolerated(tmp_path):
    pcm = rand_pcm(600, seed=5)
    data = encode_flac([pcm], subframe="fixed1") + b"ID3trailing-garbage-bytes" * 4
    p = tmp_path / "junk.flac"
    p.write_bytes(data)
    y, sr = audio_io.read(p)
    assert y.shape[0] == 600
    np.testing.assert_allclose(y[:, 0] if y.ndim == 2 else y, pcm / 32768.0, atol=1e-7)


def test_flac_fuzz_no_crash(tmp_path):
    """Deterministic fuzz: truncations and byte-flips of a valid FLAC plus
    pure-random blobs must either decode or raise IOError — never crash the
    C++ extension or read out of bounds (ADVICE r1: chunk bounds checks)."""
    rng = np.random.default_rng(0)
    pcm = rand_pcm(900, seed=11)
    good = encode_flac([pcm], subframe="fixed1")
    p = tmp_path / "fuzz.flac"

    cases = []
    for cut in range(1, len(good), max(1, len(good) // 37)):  # truncations
        cases.append(good[:cut])
    for _ in range(40):  # byte flips
        b = bytearray(good)
        for pos in rng.integers(0, len(b), 3):
            b[pos] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    for n in (0, 1, 3, 16, 333):  # random blobs with a flac magic
        cases.append(b"fLaC" + bytes(rng.integers(0, 256, n).tolist()))

    for blob in cases:
        p.write_bytes(blob)
        try:
            y, sr = audio_io.read(p)
            assert y.size <= 16 * 900  # decoded something bounded
        except (IOError, OSError):
            pass

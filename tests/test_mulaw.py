"""mu-law wire format: companding math + device-side synthesize path.

The serving headline is D2H-wire-bound (PARITY.md bench methodology);
mulaw=True halves the PCM16 wire bytes.  These tests pin the continuous
G.711/torchaudio companding formula and the composite/serving plumbing.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.dsp.mulaw import MU, mulaw_decode, mulaw_encode


def test_mulaw_known_codes():
    # endpoints and zero map to the canonical uint8 codes
    codes = np.asarray(mulaw_encode(jnp.asarray([-1.0, 0.0, 1.0])))
    assert codes.tolist() == [0, 128, 255]  # round(+0.5 -> 128) at exact zero
    # torchaudio.functional.mu_law_encoding parity on a hand-checked value:
    # F(0.5) = ln(128.5)/ln(256) = 0.87570; code = round(0.93785*255) = 239
    assert int(np.asarray(mulaw_encode(jnp.asarray([0.5])))[0]) == 239


def test_mulaw_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 4096).astype(np.float32)
    y = mulaw_decode(np.asarray(mulaw_encode(jnp.asarray(x))))
    # companding quantization error: worst near |x|=1, where a half code step
    # (1/MU in F-domain) maps through dx/dF = ln(1+MU)(1+MU)/MU
    bound = np.log1p(MU) * (1 + MU) / MU**2 * 1.05
    assert np.max(np.abs(x - y)) < bound
    # near-zero signals get FINER than 8-bit-linear resolution (the point of mu-law)
    small = rng.uniform(-0.01, 0.01, 4096).astype(np.float32)
    ys = mulaw_decode(np.asarray(mulaw_encode(jnp.asarray(small))))
    assert np.max(np.abs(small - ys)) < 1e-3


def test_mulaw_snr_scale_invariant():
    # mu-law's point vs linear 8-bit: SNR is ~constant across signal level
    # (measured ~38 dB on speech-like harmonics; PARITY.md wire-format note)
    rng = np.random.default_rng(0)
    t = np.arange(32000) / 16000.0
    x = (
        np.sin(2 * np.pi * 120 * t)
        + 0.5 * np.sin(2 * np.pi * 240 * t)
        + 0.25 * np.sin(2 * np.pi * 480 * t)
    ) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)) + 0.01 * rng.standard_normal(t.size)
    x = (x / np.abs(x).max()).astype(np.float32)
    for scale in (1.0, 0.3, 0.1):
        s = x * scale
        y = mulaw_decode(np.asarray(mulaw_encode(jnp.asarray(s))))
        snr = 10 * np.log10(np.sum(s**2) / np.sum((s - y) ** 2))
        assert snr > 36.0, f"scale {scale}: SNR {snr:.1f} dB"


def test_mulaw_monotone():
    x = jnp.linspace(-1, 1, 1001)
    codes = np.asarray(mulaw_encode(x)).astype(np.int32)
    assert (np.diff(codes) >= 0).all()


@pytest.fixture(scope="module")
def decoder():
    from speech_resynth_tpu.core.precision import FLOAT32
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
    from speech_resynth_tpu.models.hifigan import HifiGanConfig

    cfm = CFMConfig(
        vocab_size=9,
        dim_in=8,
        dim_cond_emb=12,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
    )
    voc = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    return ConditionalFlowMatchingWithHifiGan.from_config(cfm, voc, policy=FLOAT32)


def test_synthesize_mulaw_matches_float_path(decoder):
    import jax

    ids = jnp.asarray(np.random.default_rng(2).integers(1, 10, (2, 6)), jnp.int32)
    rng = jax.random.key(0)
    ref, lengths = decoder.synthesize(ids, dt=0.5, rng=rng)
    codes, lengths_m = decoder.synthesize(ids, dt=0.5, rng=rng, mulaw=True)
    assert codes.dtype == jnp.uint8
    assert (np.asarray(lengths) == np.asarray(lengths_m)).all()
    dec = mulaw_decode(np.asarray(codes))
    clipped = np.clip(np.asarray(ref, np.float32), -1.0, 1.0)
    assert np.max(np.abs(dec - clipped)) < np.log1p(MU) * (1 + MU) / MU**2 * 1.05


def test_server_mulaw_wire(decoder):
    from speech_resynth_tpu.pipeline.serving import SynthesisServer

    server = SynthesisServer(decoder, batch_size=2, dt=0.5, length_multiple=8, pcm16=False, mulaw=True)
    rng = np.random.default_rng(3)
    wavs = server.synthesize_many([rng.integers(1, 10, n).astype(np.int32) for n in (5, 3, 7)])
    assert len(wavs) == 3 and all(w.dtype == np.uint8 for w in wavs)


def test_wire_formats_mutually_exclusive(decoder):
    ids = jnp.ones((2, 4), jnp.int32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        decoder.synthesize(ids, dt=0.5, pcm16=True, mulaw=True)
    # the server resolves the ambiguity: mulaw overrides the pcm16 default
    from speech_resynth_tpu.pipeline.serving import SynthesisServer

    server = SynthesisServer(decoder, batch_size=2, dt=0.5, length_multiple=8, mulaw=True)
    assert server.mulaw and not server.pcm16

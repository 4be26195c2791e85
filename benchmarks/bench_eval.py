"""Eval-stack benchmark: native UTMOS MOS scoring and Whisper ASR decode on
the chip, at published model sizes with random weights (throughput and
compile time are weight-agnostic).

Prints one JSON line per measurement:
  * UTMOS: audio-seconds scored per second (wav2vec2-base SSL + BiLSTM head,
    batch of 10 s wavs) — the reference runs this on a host GPU per utterance
    (SURVEY C23); here it is one jitted program on the TPU.
  * Whisper: greedy-decode tokens/s at a chosen size, plus the first-call
    compile time scan-layers vs unrolled (large-v3 is 32+32 layers — the
    scan layout is what keeps the first transcription usable through the
    tunneled compiler).

Usage: python benchmarks/bench_eval.py [--whisper-size {base,large-v3,none}]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench_utmos(batch=8, seconds=10, iters=10):
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.utmos import UTMOSConfig, UTMOSPredictor

    cfg = UTMOSConfig()
    model = UTMOSPredictor(cfg, policy=BF16_INFERENCE)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((batch, seconds * 16000)), jnp.float32) * 0.1
    n = jnp.full((batch,), seconds * 16000, jnp.int32)
    dom = jnp.zeros((batch,), jnp.int32)
    judge = jnp.full((batch,), cfg.default_judge_id, jnp.int32)
    variables = model.init(jax.random.key(0), wav[:1, :16000], dom[:1], judge[:1])

    @jax.jit
    def score(variables, wav, n):
        frames = model.apply(variables, wav, dom, judge, num_samples=n)
        return UTMOSPredictor.score_from_frames(frames, num_frames=cfg.ssl.num_frames(n))

    np.asarray(score(variables, wav, n))  # compile + warm (device_get syncs on axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(score(variables, wav, n))
    elapsed = time.perf_counter() - t0
    audio_sec = iters * batch * seconds
    print(
        json.dumps(
            {
                "metric": "utmos_audio_sec_scored_per_sec_per_chip",
                "value": round(audio_sec / elapsed, 2),
                "unit": "x realtime",
                "batch": batch,
            }
        ),
        flush=True,
    )


WHISPER_SIZES = {
    # (d_model, layers, heads, ffn, mels, vocab)
    "base": dict(d_model=512, layers=6, heads=8, ffn=2048, mels=80, vocab=51865),
    "large-v3": dict(d_model=1280, layers=32, heads=20, ffn=5120, mels=128, vocab=51866),
}


def bench_whisper(size="base", batch=4, max_new=32):
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models import whisper as W
    from speech_resynth_tpu.models.convert import stack_whisper_layers, unstack_llama_layers

    s = WHISPER_SIZES[size]
    cfg = W.WhisperConfig(
        vocab_size=s["vocab"],
        num_mel_bins=s["mels"],
        d_model=s["d_model"],
        encoder_layers=s["layers"],
        encoder_attention_heads=s["heads"],
        decoder_layers=s["layers"],
        decoder_attention_heads=s["heads"],
        encoder_ffn_dim=s["ffn"],
        decoder_ffn_dim=s["ffn"],
    )
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)),
        jnp.float32,
    )
    prompt = jnp.full((batch, 1), cfg.decoder_start_token_id, jnp.int32)

    scan_model = W.WhisperForASR(cfg, policy=BF16_INFERENCE, scan_layers=True)
    variables = scan_model.init(jax.random.key(0), mel[:1, :8], prompt[:1])

    t0 = time.perf_counter()
    np.asarray(W.greedy_decode(scan_model, variables, mel, max_new, prompt))
    compile_scan = time.perf_counter() - t0

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(W.greedy_decode(scan_model, variables, mel, max_new, prompt))
    elapsed = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"whisper_{size}_greedy_tokens_per_sec",
                "value": round(iters * batch * max_new / elapsed, 1),
                "unit": "tokens/s",
                "audio_sec_per_sec": round(iters * batch * 30.0 / elapsed, 1),
                "compile_s_scan": round(compile_scan, 1),
            }
        ),
        flush=True,
    )

    # unrolled compile-time comparison (params layout translated back)
    unrolled = W.WhisperForASR(cfg, policy=BF16_INFERENCE, scan_layers=False)
    uparams = {
        "encoder": unstack_llama_layers(variables["params"]["encoder"]),
        "decoder": unstack_llama_layers(variables["params"]["decoder"]),
    }
    t0 = time.perf_counter()
    np.asarray(W.greedy_decode(unrolled, {"params": uparams}, mel, max_new, prompt))
    compile_unrolled = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"whisper_{size}_first_call_compile_s",
                "scan": round(compile_scan, 1),
                "unrolled": round(compile_unrolled, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--whisper-size", default="base", choices=["base", "large-v3", "none"])
    parser.add_argument("--skip-utmos", action="store_true")
    args = parser.parse_args()
    if not args.skip_utmos:
        bench_utmos()
    if args.whisper_size != "none":
        bench_whisper(args.whisper_size)

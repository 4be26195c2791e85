"""Streaming vocoder latency: time-to-first-audio vs the batch path.

The batch path (pipeline/serving.py, bench.py) maximizes throughput but a
listener hears nothing until the WHOLE utterance is vocoded and drained.
`pipeline/streaming.py` trades a bounded amount of redundant window compute
(each window recomputes 2*ctx context frames) for first audio after
ctx+chunk mel frames.  This harness measures, for one long utterance:

- ``ttfa_batch_ms`` — full vocode + full PCM16 drain (first byte available
  only at the end);
- ``ttfa_stream_ms`` — time until the first streamed chunk is on the host;
- ``total_stream_ms`` vs ``total_batch_ms`` — the streaming overhead
  (window overlap + per-window dispatch/sync), i.e. the throughput price
  paid for the latency win.

Mel content is random (timing is content-independent); both paths run the
same production dispatch (fused/folded MRF on chip, XLA elsewhere) and the
pcm16 wire conversion.  Usage: PYTHONPATH=/root/repo python
benchmarks/bench_streaming.py (idle host, tunneled chip; --cpu --tiny for a
smoke run — CPU timings are meaningless, only the protocol is exercised).
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1, help="accepted for harness-compat; streaming is per-utterance")
    parser.add_argument("--units", type=int, default=1500, help="alias for --frames (bench convention)")
    parser.add_argument("--frames", type=int, default=None, help="mel frames of the utterance (1500 = 30 s)")
    parser.add_argument("--chunk", type=int, default=50, help="streamed chunk, mel frames (50 = 1 s of audio)")
    parser.add_argument("--iters", type=int, default=1, help="accepted for harness-compat (one utterance per trial)")
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--tiny", action="store_true", help="test-size config (smoke; timings meaningless)")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    parser.add_argument(
        "--wire",
        choices=("pcm16", "mulaw"),
        default="pcm16",
        help="device-side wire format (mulaw = 8-bit G.711-style codes, half the D2H bytes)",
    )
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_resynth_tpu.core.backend import require_backend

    require_backend(240, metric="streaming_ttfa")

    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
    from speech_resynth_tpu.pipeline.streaming import StreamingVocoder, _window_fn, context_frames_for

    if args.tiny:
        from speech_resynth_tpu.models.hifigan import HifiGanConfig

        cfm = CFMConfig(
            vocab_size=2000,
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
        decoder = ConditionalFlowMatchingWithHifiGan.from_config(cfm, voc, policy=BF16_INFERENCE)
    else:
        decoder = ConditionalFlowMatchingWithHifiGan.from_config(CFMConfig(vocab_size=2000), policy=BF16_INFERENCE)

    cfg = decoder.vocoder.config
    vvars = decoder.vocoder_variables
    policy = decoder.vocoder.policy
    fused = jax.default_backend() in ("tpu", "axon")
    hop = cfg.total_upsample
    extra = int(np.asarray(cfg.waveform_lengths(jnp.array(1))))

    frames = args.frames or args.units
    ctx = context_frames_for(cfg)
    chunk = max(1, min(args.chunk, frames))
    audio_s = ((frames - 1) * hop + extra) / SR

    print(
        json.dumps(
            {
                "device": jax.local_devices()[0].device_kind,
                "frames": frames,
                "chunk": chunk,
                "ctx": ctx,
                "window": chunk + 2 * ctx,
                "audio_s": round(audio_s, 3),
                "fused": fused,
            }
        ),
        flush=True,
    )

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((frames, cfg.model_in_dim)).astype(np.float32)
    batch_fn = _window_fn(cfg, fused, args.wire, policy)
    mel_dev = jnp.asarray(mel[None])

    def run_batch() -> float:
        t0 = time.perf_counter()
        np.asarray(batch_fn(vvars, mel_dev))  # np.asarray = real sync on the tunneled chip
        return time.perf_counter() - t0

    def run_stream():
        sv = StreamingVocoder(vvars, cfg, chunk_frames=chunk, policy=policy, fused=fused, wire=args.wire)
        t0 = time.perf_counter()
        ttfa = None
        n = 0
        for i in range(0, frames, chunk):
            out = sv.push(mel[i : i + chunk])
            n += out.size
            if ttfa is None and n > 0:
                ttfa = time.perf_counter() - t0
        n += sv.flush().size
        total = time.perf_counter() - t0
        if ttfa is None:  # short stream: first audio is the flush
            ttfa = total
        assert n == (frames - 1) * hop + extra, (n, frames)
        return ttfa, total

    run_batch()  # compile
    run_stream()  # compile window + (short-stream) shapes

    batch_ms, ttfa_ms, stream_ms = [], [], []
    for _ in range(args.trials):
        batch_ms.append(run_batch() * 1e3)
        ttfa, total = run_stream()
        ttfa_ms.append(ttfa * 1e3)
        stream_ms.append(total * 1e3)

    med = statistics.median
    result = {
        "metric": "streaming_ttfa",
        "value": round(med(ttfa_ms), 2),
        "unit": "ms_to_first_audio",
        "ttfa_batch_ms": round(med(batch_ms), 2),
        "ttfa_speedup": round(med(batch_ms) / med(ttfa_ms), 2),
        "total_batch_ms": round(med(batch_ms), 2),
        "total_stream_ms": round(med(stream_ms), 2),
        "stream_overhead": round(med(stream_ms) / med(batch_ms), 3),
        "rtf_batch": round(audio_s / (med(batch_ms) / 1e3), 1),
        "rtf_stream": round(audio_s / (med(stream_ms) / 1e3), 1),
        "wire": args.wire,
        "trials": args.trials,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

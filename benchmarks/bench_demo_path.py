#!/usr/bin/env python
"""One-number demo-path benchmark: wav -> units -> wav on-chip.

The reference README's flagship flow (/root/reference/README.md:26-55):
encode speech to discrete units (mHuBERT-147 layer-11 features + 2000-center
k-means) and resynthesize a waveform (16-step CFM ODE + HiFi-GAN), here as
ONE pipelined RTF figure instead of the separate encoder/decoder numbers.

Units stay on-device between the two jitted programs (no host round-trip);
the PCM16 output drains through the 4-thread pool (bench.py protocol).
Median-of-N trials; run on an idle host.
"""

import argparse
import json
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--seconds", type=int, default=10)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--tiny", action="store_true", help="CPU smoke sizes (timings meaningless)")
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (host sitecustomize pins jax_platforms='axon,cpu')",
    )
    args, _ = parser.parse_known_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_resynth_tpu.core.flaxinit import jitted_init
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
    from speech_resynth_tpu.models.hubert import HubertConfig, HubertEncoder
    from speech_resynth_tpu.ops.codebook import assign

    if args.tiny:
        from speech_resynth_tpu.models.hifigan import HifiGanConfig

        cfg = HubertConfig(
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            conv_dim=(16,) * 7,
        )
        cfm_cfg = CFMConfig(
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
        voc_cfg = HifiGanConfig(
            model_in_dim=8,
            upsample_initial_channel=16,
            upsample_rates=(5, 4),
            upsample_kernel_sizes=(10, 8),
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        )
        decoder = ConditionalFlowMatchingWithHifiGan.from_config(cfm_cfg, voc_cfg, policy=BF16_INFERENCE)
    else:
        cfg = HubertConfig()
        decoder = ConditionalFlowMatchingWithHifiGan.from_config(CFMConfig(vocab_size=2000), policy=BF16_INFERENCE)

    encoder = HubertEncoder(cfg, policy=BF16_INFERENCE)
    batch, seconds = args.batch, args.seconds
    rng = np.random.default_rng(0)
    wav_in = jnp.asarray(rng.standard_normal((batch, seconds * 16000)), jnp.float32) * 0.1
    enc_vars = jitted_init(encoder, jax.random.key(0), wav_in[:1, :16000])
    centers = jax.random.normal(jax.random.key(1), (2000, cfg.hidden_size), jnp.float32)

    @jax.jit
    def encode(wav):
        feats = encoder.apply(enc_vars, wav, output_layer=min(11, cfg.num_hidden_layers))
        return (assign(feats, centers) + 1).astype(jnp.int32)  # +1 shift, 0 = pad

    def full(wav, key):
        ids = encode(wav)
        return decoder.synthesize(ids, dt=0.0625, truncation_value=1.0, rng=key, pcm16=True)

    out_wav, lengths = full(wav_in, jax.random.key(0))  # compile both programs
    np.asarray(out_wav)
    audio_sec = args.iters * float(jnp.sum(lengths)) / 16000.0

    times = []
    with ThreadPoolExecutor(4) as pool:
        for t in range(args.trials):
            t0 = time.perf_counter()
            outs = [full(wav_in, jax.random.key(t * args.iters + i + 1)) for i in range(args.iters)]
            list(pool.map(lambda o: np.asarray(o[0]), outs))
            times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    print(
        json.dumps(
            {
                "metric": "demo_path_wav_units_wav_audio_sec_per_sec_per_chip",
                "value": round(audio_sec / med, 2),
                "unit": "x realtime",
                "vs_baseline": round(audio_sec / med / 50.0, 3),
                "rtf_min": round(audio_sec / max(times), 1),
                "rtf_max": round(audio_sec / min(times), 1),
                "trials": args.trials,
                "batch": batch,
            }
        )
    )


if __name__ == "__main__":
    main()

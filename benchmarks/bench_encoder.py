#!/usr/bin/env python
"""Encoder throughput: batched mHuBERT + k-means unit extraction.

BASELINE.json config 3: "mHuBERT encoder + kmeans-expresso quantization,
batched multi-utterance unit extraction".  Measures audio-seconds encoded
per wall-clock second per chip at full base-architecture size (768-d, 12
layers, 2000-center codebook through the Pallas argmin kernel).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.hubert import HubertConfig, HubertEncoder
    from speech_resynth_tpu.ops.codebook import assign

    cfg = HubertConfig()
    encoder = HubertEncoder(cfg, policy=BF16_INFERENCE)
    batch, seconds = 8, 10
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((batch, seconds * 16000)), jnp.float32) * 0.1
    variables = encoder.init(jax.random.key(0), wav[:1, : 16000])
    centers = jax.random.normal(jax.random.key(1), (2000, cfg.hidden_size), jnp.float32)

    @jax.jit
    def encode(wav):
        feats = encoder.apply(variables, wav, output_layer=11)
        return assign(feats, centers)

    np.asarray(encode(wav))  # warmup; device_get forces real sync on axon

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        units = np.asarray(encode(wav))
    elapsed = time.perf_counter() - t0

    audio_sec = iters * batch * seconds
    print(
        json.dumps(
            {
                "metric": "encoder_audio_sec_per_sec_per_chip",
                "value": round(audio_sec / elapsed, 2),
                "unit": "x realtime",
                "vs_baseline": round(audio_sec / elapsed / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training-step throughput at reference sizes (single chip).

Covers the reference's two resynthesis trainers: the CFM step at the shipped
config (h=256/d=4, crops of 100 frames — batch scaled to fit one chip's
honest measurement window) and the HiFi-GAN GAN step (G + MPD + MSD forward/
backward at segment_size 16080).  Prints one JSON line with both rates.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench_cfm(batch=512, frames=100, iters=10):
    from speech_resynth_tpu.core.mesh import make_mesh
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.train.cfm import CFMTrainerConfig, make_trainer

    mesh = make_mesh()
    cfg = CFMConfig(vocab_size=2000)
    _, state, step_fn, _ = make_trainer(cfg, CFMTrainerConfig(batch_size=batch), mesh, total_steps=1000)

    rng = np.random.default_rng(0)
    batch_data = {
        "input_ids": rng.integers(1, 2001, (batch, frames)).astype(np.int32),
        "duration_labels": np.ones((batch, frames), np.int32),
        "spectrogram_labels": rng.standard_normal((batch, frames, 80)).astype(np.float32),
    }
    state, metrics = step_fn(state, batch_data, jax.random.key(0))
    np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, batch_data, jax.random.key(i))
        np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt * 1000


def bench_gan(batch=16, iters=5):
    from speech_resynth_tpu.core.mesh import make_mesh
    from speech_resynth_tpu.models.hifigan import HifiGanConfig
    from speech_resynth_tpu.train.hifigan import HifiGanTrainerConfig, make_gan_trainer

    mesh = make_mesh()
    cfg = HifiGanConfig()
    tcfg = HifiGanTrainerConfig(batch_size=batch)
    _, state, step_fn = make_gan_trainer(cfg, tcfg, mesh)

    rng = np.random.default_rng(1)
    T = (tcfg.segment_size - tcfg.n_fft) // tcfg.hop_size + 1  # 50
    data = {
        "mel": rng.standard_normal((batch, T, 80)).astype(np.float32),
        "wav": (rng.standard_normal((batch, tcfg.segment_size)) * 0.1).astype(np.float32),
        "mel_mask": np.ones((batch, T), bool),
    }
    state, metrics = step_fn(state, data)
    np.asarray(metrics["loss_gen"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, data)
        np.asarray(metrics["loss_gen"])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt * 1000


def main():
    cfm_eps, cfm_ms = bench_cfm()
    gan_eps, gan_ms = bench_gan()
    print(
        json.dumps(
            {
                "metric": "train_step_examples_per_sec_per_chip",
                "value": round(cfm_eps, 1),
                "unit": "cfm crops/s",
                "cfm_step_ms": round(cfm_ms, 1),
                "hifigan_segments_per_sec": round(gan_eps, 1),
                "hifigan_step_ms": round(gan_ms, 1),
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()

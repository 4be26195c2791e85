#!/usr/bin/env python
"""Training-step throughput at reference sizes (single chip).

Covers the reference's two resynthesis trainers: the CFM step at the shipped
config (h=256/d=4, crops of 100 frames — batch scaled to fit one chip's
honest measurement window) and the HiFi-GAN GAN step (G + MPD + MSD forward/
backward at segment_size 16080).  Prints one JSON line with both rates.

``--ab`` instead runs the TRAINING-step attention dispatch A/B (VERDICT r2
weak #3): the whole jitted CFM train step at the reference batch (2700 crops
x 100 frames, yaml:30-31) and the speech-LM train step (96 x 128), each
compiled fresh under ``attention_implementation("pallas")`` vs ``("xla")``,
median-of-N step times.  The verdicts feed the dispatch gates in
ops/attention.py and the PARITY.md "training, in-context" rows.
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


def _median_step_ms(step, state, batch_data, *step_args, iters=8, trials=3):
    """Median step wall-time: warmup (compile) + trials of ``iters`` steps,
    syncing via host materialization of the loss each step (the tunneled
    chip's block_until_ready does not synchronize).

    The state must thread CONTINUOUSLY through every call — step fns donate
    their state argument, so re-feeding a previous state object hands the
    runtime deleted buffers (INVALID_ARGUMENT at dispatch)."""
    state, metrics = step(state, batch_data, *step_args)
    np.asarray(metrics[next(iter(metrics))])
    xs = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch_data, *step_args)
            np.asarray(metrics[next(iter(metrics))])
        xs.append((time.perf_counter() - t0) / iters)
    return statistics.median(xs) * 1000


def bench_ab(cfm_batch=2700, cfm_frames=100, lm_batch=96, lm_seq=128, steps="cfm,lm"):
    """Whole-train-step pallas-vs-XLA attention A/B at reference shapes.

    XLA runs first; each (step, impl) cell is isolated in try/except so a
    failing cell is recorded as data instead of killing the sweep.
    Measured verdicts (v5e, round 3): CFM 2700x100 xla 2022 / pallas
    1990 ms (parity — auto routes n=100 to XLA); LM 96x128 xla 110 /
    pallas 121 ms (XLA wins TRAINING while inference scoring at the same
    shape keeps the pallas win — the speechlm trainer therefore pins
    attn_implementation="xla")."""
    from speech_resynth_tpu.core.mesh import make_mesh
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.llama import LlamaConfig
    from speech_resynth_tpu.ops.attention import attention_implementation
    from speech_resynth_tpu.train.cfm import CFMTrainerConfig, make_trainer
    from speech_resynth_tpu.train.speechlm import SpeechLMTrainerConfig, make_speechlm_trainer

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    cfm_data = {
        "input_ids": rng.integers(1, 2001, (cfm_batch, cfm_frames)).astype(np.int32),
        "duration_labels": np.ones((cfm_batch, cfm_frames), np.int32),
        "spectrogram_labels": rng.standard_normal((cfm_batch, cfm_frames, 80)).astype(np.float32),
    }
    ids = rng.integers(4, 2004, (lm_batch, lm_seq)).astype(np.int32)
    lm_data = {"input_ids": ids, "attention_mask": np.ones_like(ids), "labels": ids.astype(np.int32)}

    def cfm_cell(impl):
        _, state, step_fn, _ = make_trainer(
            CFMConfig(vocab_size=2000), CFMTrainerConfig(batch_size=cfm_batch), mesh, total_steps=1000
        )
        return _median_step_ms(step_fn, state, cfm_data, jax.random.key(0))

    def lm_cell(impl):
        # shipped speech-LM size (configs/speechlm/*.yaml:26-29)
        lm_cfg = LlamaConfig(vocab_size=2004, hidden_size=768, intermediate_size=3072, num_hidden_layers=12, num_attention_heads=12)
        # attn_implementation="auto" so the attention_implementation()
        # override reaches the call sites (the trainer default pins "xla")
        _, state, step_fn, _ = make_speechlm_trainer(
            lm_cfg, SpeechLMTrainerConfig(batch_size_per_device=lm_batch, attn_implementation="auto"), mesh, total_steps=1000
        )
        return _median_step_ms(step_fn, state, lm_data)

    cells = []
    if "cfm" in steps:
        cells.append(("cfm_train", [cfm_batch, cfm_frames], cfm_cell))
    if "lm" in steps:
        cells.append(("lm_train", [lm_batch, lm_seq], lm_cell))

    rows = []
    for impl in ("xla", "pallas"):
        for name, shape, cell in cells:
            with attention_implementation(impl):
                try:
                    ms = cell(impl)
                    rows.append({"step": name, "impl": impl, "batch": shape, "step_ms": round(ms, 1)})
                except Exception as e:  # noqa: BLE001 — failures are data here
                    rows.append({"step": name, "impl": impl, "batch": shape, "error": f"{type(e).__name__}: {str(e)[:150]}"})
            print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ab", action="store_true", help="attention dispatch A/B on the train steps")
    parser.add_argument("--ab-steps", default="cfm,lm", help="comma list of cells: cfm,lm")
    args = parser.parse_args()
    if args.ab:
        bench_ab(steps=args.ab_steps)
        return
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

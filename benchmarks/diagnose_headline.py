"""Headline-bench diagnosis: where do the milliseconds per batch go?

Splits the unit->wav serving loop (bench.py protocol) into measurable parts
on the tunneled chip, where ``block_until_ready`` does NOT synchronize:

* compute-only time: materialize a 1-element slice of the LAST output —
  stream ordering means every enqueued program finished, but only ~4 bytes
  cross the tunnel.  This is the pure device throughput.
* full protocol: dispatch all, then drain every output byte (bench.py).
* dispatch-only: host cost of enqueueing N async calls (python + tracing
  cache hit + H2D of the ids).
* pure D2H: repeated materialization of one already-computed wav batch —
  tunnel transfer bandwidth.
* stage split: ODE (model.sample) vs vocoder, each compute-only.

Prints one JSON line per measurement; run on an idle host (CLAUDE.md: host
contention swings readings +-15%).
"""

import argparse
import functools
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, trials=5):
    xs = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return {"median_s": round(statistics.median(xs), 4), "min_s": round(min(xs), 4), "max_s": round(max(xs), 4)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--units", type=int, default=500)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--trials", type=int, default=5)
    args = parser.parse_args()

    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan

    decoder = ConditionalFlowMatchingWithHifiGan.from_config(CFMConfig(vocab_size=2000), policy=BF16_INFERENCE)
    B, U, iters = args.batch, args.units, args.iters
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 2001, (B, U)), jnp.int32)

    def run(i, pcm16=True):
        return decoder.synthesize(ids, dt=0.0625, truncation_value=1.0, rng=jax.random.key(i), pcm16=pcm16)

    # warmup both pcm16 variants
    wav16, lengths = run(0, True)
    np.asarray(wav16)
    wavf, _ = run(0, False)
    np.asarray(wavf)
    audio_sec = iters * float(jnp.sum(lengths)) / 16000.0
    wav_bytes = wav16.size * wav16.dtype.itemsize

    out = {"batch": B, "units": U, "iters": iters, "wav_mb_per_iter": round(wav_bytes / 1e6, 2)}
    print(json.dumps(out), flush=True)

    def emit(key, r):
        out[key] = r
        print(json.dumps({key: r}), flush=True)

    # 1. full protocol (bench.py): dispatch all, drain all bytes
    def full(pcm16):
        outs = [run(i + 1, pcm16) for i in range(iters)]
        for w, l in outs:
            np.asarray(w)

    r = timed(lambda: full(True), args.trials)
    emit("full_pcm16", {**r, "rtf": round(audio_sec / r["median_s"], 1)})
    r = timed(lambda: full(False), args.trials)
    emit("full_f32", {**r, "rtf": round(audio_sec / r["median_s"], 1)})

    # 2. compute-only: dispatch all, sync via 1-element slice of the last wav
    def compute_only():
        outs = [run(i + 1, True) for i in range(iters)]
        np.asarray(outs[-1][0][0, :1])

    r = timed(compute_only, args.trials)
    emit("compute_only", {**r, "rtf": round(audio_sec / r["median_s"], 1)})

    # 3. dispatch-only: enqueue cost (no sync at all)
    def dispatch_only():
        for i in range(iters):
            run(i + 1, True)

    emit("dispatch_only", timed(dispatch_only, args.trials))

    # 4. pure D2H: np.asarray CACHES the host copy on the Array, so each
    # trial needs fresh device arrays — a trivial jitted +1 produces them
    # (compute cost ~0, transfer dominates)
    bump16 = jax.jit(lambda x: x + 1)
    bumpf = jax.jit(lambda x: x + 1.0)
    np.asarray(bump16(wav16))
    np.asarray(bumpf(wavf))

    def d2h(bump, src):
        arrs = [bump(src) for _ in range(iters)]
        for a in arrs:
            np.asarray(a)

    r = timed(lambda: d2h(bump16, wav16), args.trials)
    emit("d2h_pcm16", {**r, "mb_per_s": round(wav_bytes * iters / 1e6 / max(r["median_s"], 1e-9), 1)})
    r = timed(lambda: d2h(bumpf, wavf), args.trials)
    emit("d2h_f32", {**r, "mb_per_s": round(2 * wav_bytes * iters / 1e6 / max(r["median_s"], 1e-9), 1)})

    # 5. stage split, compute-only: ODE alone vs full (vocoder = difference).
    # Params ride as an argument, not a closure (CLAUDE.md: closed-over trees
    # inline as HLO constants and 413 the remote-compile request at scale).
    sample = jax.jit(
        lambda variables, ids, rng: decoder.model.apply(
            variables, ids, dt=0.0625, truncation_value=1.0, rng=rng, max_frames=None, method="sample"
        )
    )
    sample = functools.partial(sample, decoder.model_variables)
    mel, fmask = sample(ids, jax.random.key(0))
    np.asarray(mel[0, :1, :1])

    def ode_only():
        outs = [sample(ids, jax.random.key(i + 1)) for i in range(iters)]
        np.asarray(outs[-1][0][0, :1, :1])

    r = timed(ode_only, args.trials)
    emit("ode_compute_only", {**r, "rtf": round(audio_sec / r["median_s"], 1)})

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

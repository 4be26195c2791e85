#!/usr/bin/env python
"""Headline batch x unit-length sweep, median-of-N (VERDICT r2 next #2).

Runs the bench.py serving protocol (async dispatch + full PCM16 drain) for
every (batch, units) combination in one process — the composite decoder's
jit cache compiles each shape once — and prints one JSON line per config
with median/min/max RTF over --trials.  Run on an IDLE host; readings swing
±15% with host contention (CLAUDE.md).

The sweep answers the round-2 open question ("batch 16 vs 32 is within
noise") with medians, and gives the per-shape table behind the default
bench.py batch choice.
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="8,16,32,64")
    parser.add_argument("--units", default="250,500,1000")
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan

    decoder = ConditionalFlowMatchingWithHifiGan.from_config(CFMConfig(vocab_size=2000), policy=BF16_INFERENCE)
    rng0 = np.random.default_rng(0)

    for units in (int(u) for u in args.units.split(",")):
        for batch in (int(b) for b in args.batches.split(",")):
            ids = jnp.asarray(rng0.integers(1, 2001, (batch, units)), jnp.int32)

            def run(i):
                return decoder.synthesize(ids, dt=0.0625, truncation_value=1.0, rng=jax.random.key(i), pcm16=True)

            wav, lengths = run(0)  # compile
            np.asarray(wav)
            audio_sec = args.iters * float(jnp.sum(lengths)) / 16000.0
            times, ctimes = [], []
            for t in range(args.trials):
                t0 = time.perf_counter()
                outs = [run(t * args.iters + i + 1) for i in range(args.iters)]
                for w, l in outs:
                    np.asarray(w)
                times.append(time.perf_counter() - t0)
            # compute-only (sync via 1-element slice): where batch/length
            # tuning actually shows — the full protocol is D2H-wire-bound
            for t in range(args.trials):
                t0 = time.perf_counter()
                outs = [run(1000 + t * args.iters + i) for i in range(args.iters)]
                np.asarray(outs[-1][0][0, :1])
                ctimes.append(time.perf_counter() - t0)
            med = statistics.median(times)
            print(
                json.dumps(
                    {
                        "batch": batch,
                        "units": units,
                        "rtf_median": round(audio_sec / med, 1),
                        "rtf_min": round(audio_sec / max(times), 1),
                        "rtf_max": round(audio_sec / min(times), 1),
                        "compute_rtf_median": round(audio_sec / statistics.median(ctimes), 1),
                        "trials": args.trials,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

"""Whole-vocoder A/B of the fused-MRF phase-fold table.

The round-2 lesson (PARITY.md): standalone kernel tables invert inside the
fused program — so the MRF_FOLD_TABLE (ops/fused_mrf.py) is calibrated here,
by timing the COMPLETE jitted vocoder (mel -> waveform, headline shapes)
under each candidate table.  Median-of-N trials; run on an idle host.

Usage: PYTHONPATH=/root/repo python benchmarks/bench_fold_ab.py
"""

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# (label, fold table, packing table, stage fusion) — packing {} means im2col
# everywhere.  Round-3 calibration kept fold3/im2col (taps lost, PARITY.md);
# round 4 adds the whole-stage-fusion axis (ops/fused_mrf.py:MRF_STAGE_FUSION).
CANDIDATES = [
    ("fold3", {16: 8, 32: 4, 64: 2}, {}, False),
    ("fold3+stage", {16: 8, 32: 4, 64: 2}, {}, True),
    ("unfolded+stage", {}, {}, True),
    ("f16:8,32:4+stage", {16: 8, 32: 4}, {}, True),
    ("f16:4,32:2+stage", {16: 4, 32: 2}, {}, True),
    # round-5 block-sparse experiment (VERDICT r4 #4): per-phase-group
    # matmuls over only the populated offset blocks of the folded weight
    ("fold3-grouped", {16: 8, 32: 4, 64: 2}, {16: "grouped", 32: "grouped", 64: "grouped"}, False),
    ("fold3-grouped16", {16: 8, 32: 4, 64: 2}, {16: "grouped"}, False),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--frames", type=int, default=500)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_resynth_tpu.core.backend import require_backend

    require_backend(240, metric="fold_ab")

    from speech_resynth_tpu.models import hifigan as HG
    from speech_resynth_tpu.ops import fused_mrf as FM

    if args.tiny:
        cfg = HG.HifiGanConfig(
            model_in_dim=8,
            upsample_initial_channel=64,
            upsample_rates=(5, 4),
            upsample_kernel_sizes=(10, 8),
            resblock_kernel_sizes=(3, 7),
            resblock_dilation_sizes=((1, 3), (1, 3)),
        )
    else:
        cfg = HG.HifiGanConfig()  # production defaults (reference parity)
    gen = HG.HifiGanGenerator(cfg)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((args.batch, args.frames, cfg.model_in_dim)), jnp.float32
    )
    params = jax.jit(gen.init)(jax.random.key(0), mel)["params"]

    print(f"backend: {jax.default_backend()}, batch {args.batch} x {args.frames} frames")
    results = {}
    for label, table, pack, stage in CANDIDATES:
        orig = dict(FM.MRF_FOLD_TABLE)
        orig_pack = dict(FM.MRF_PACK_TABLE)
        FM.MRF_FOLD_TABLE.clear()
        FM.MRF_FOLD_TABLE.update(table)
        FM.MRF_PACK_TABLE.clear()
        FM.MRF_PACK_TABLE.update(pack)
        try:
            with FM.mrf_stage_fusion(stage):
                fn = jax.jit(
                    lambda p, m: HG.generator_apply_fused(p, cfg, m, force_fused=args.cpu, interpret=args.cpu)
                )
                np.asarray(fn(params, mel)[0, :1])  # compile + sync
                meds = []
                for _ in range(args.trials):
                    t0 = time.perf_counter()
                    outs = [fn(params, mel) for _ in range(args.iters)]
                    for o in outs:
                        np.asarray(o[0, :1])
                    meds.append((time.perf_counter() - t0) / args.iters)
            med = statistics.median(meds)
            results[label] = med
            print(f"{label:20s} {med * 1e3:8.2f} ms  (min {min(meds) * 1e3:.2f}, max {max(meds) * 1e3:.2f})", flush=True)
        finally:
            FM.MRF_FOLD_TABLE.clear()
            FM.MRF_FOLD_TABLE.update(orig)
            FM.MRF_PACK_TABLE.clear()
            FM.MRF_PACK_TABLE.update(orig_pack)
    if results:
        best = min(results, key=results.get)
        print(f"best: {best} ({results[best] * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()

"""Whole-vocoder (and whole-serving) A/B of the fused-MRF dispatch tables.

The round-2 lesson (PARITY.md): standalone kernel tables invert inside the
fused program — so MRF_FOLD_TABLE / MRF_PACK_TABLE (ops/fused_mrf.py) are
calibrated here, by timing COMPLETE jitted programs under each candidate
table.  The round-5 lesson (PARITY.md fused-MRF section): sequential
candidate timing is vulnerable to tunnel weather drift (a first-candidate
fold3 read 98.65 ms in the same session where an interleaved A/B proved it
at parity) — so all candidates are compiled up front and their timing
trials are INTERLEAVED round-robin; per-candidate medians then share every
drift regime.

Modes:
  default    whole jitted vocoder (mel -> waveform) per candidate table
  --serving  the FULL decoder.synthesize program (units -> pcm16), im2col
             vs grouped packing — the bench.py compute-trial protocol

Usage: PYTHONPATH=/root/repo python benchmarks/bench_fold_ab.py (idle host).
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
# round 4 added the whole-stage-fusion axis (NEUTRAL, ships off); round 5
# added the block-sparse "grouped" packing (NEUTRAL in-context, ships off).
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


class _TableContext:
    """Install a (fold, pack, stage-fusion) candidate while tracing."""

    def __init__(self, FM, table, pack, stage):
        self.FM, self.table, self.pack, self.stage = FM, table, pack, stage

    def __enter__(self):
        FM = self.FM
        self._orig = (dict(FM.MRF_FOLD_TABLE), dict(FM.MRF_PACK_TABLE), FM.MRF_STAGE_FUSION)
        FM.MRF_FOLD_TABLE.clear(), FM.MRF_FOLD_TABLE.update(self.table)
        FM.MRF_PACK_TABLE.clear(), FM.MRF_PACK_TABLE.update(self.pack)
        FM.MRF_STAGE_FUSION = self.stage

    def __exit__(self, *exc):
        FM = self.FM
        FM.MRF_FOLD_TABLE.clear(), FM.MRF_FOLD_TABLE.update(self._orig[0])
        FM.MRF_PACK_TABLE.clear(), FM.MRF_PACK_TABLE.update(self._orig[1])
        FM.MRF_STAGE_FUSION = self._orig[2]


def _report(results: dict):
    for label, meds in results.items():
        med = statistics.median(meds)
        print(
            f"{label:20s} {med * 1e3:8.2f} ms  (min {min(meds) * 1e3:.2f}, max {max(meds) * 1e3:.2f})",
            flush=True,
        )
    best = min(results, key=lambda k: statistics.median(results[k]))
    print(f"best: {best} ({statistics.median(results[best]) * 1e3:.2f} ms)")


def run_vocoder_ab(args, FM):
    from speech_resynth_tpu.models import hifigan as HG

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
    # compile every candidate up front (tables are read at trace time; each
    # candidate owns a distinct jit object so the caches never collide)
    fns = []
    for label, table, pack, stage in CANDIDATES:
        with _TableContext(FM, table, pack, stage):
            fn = jax.jit(
                lambda p, m: HG.generator_apply_fused(p, cfg, m, force_fused=args.cpu, interpret=args.cpu)
            )
            np.asarray(fn(params, mel)[0, :1])  # compile + sync
        print(f"[compiled] {label}", flush=True)
        fns.append((label, fn))

    results = {label: [] for label, _ in fns}
    for _ in range(args.trials):
        for label, fn in fns:  # interleaved: every candidate sees every drift regime
            t0 = time.perf_counter()
            outs = [fn(params, mel) for _ in range(args.iters)]
            for o in outs:
                np.asarray(o[0, :1])
            results[label].append((time.perf_counter() - t0) / args.iters)
    _report(results)


def run_serving_ab(args, FM):
    """im2col vs grouped inside the FULL units->pcm16 synthesize program."""
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
    from speech_resynth_tpu.models.hifigan import HifiGanConfig

    if args.tiny:
        cfm = CFMConfig(
            vocab_size=2000, dim_in=8, dim_cond_emb=12, hidden_size=16, depth=2, heads=2,
            intermediate_size=24, conv_pos_embed_kernel_size=7, conv_pos_embed_groups=16,
        )
        voc = HifiGanConfig(
            model_in_dim=8, upsample_initial_channel=16, upsample_rates=(5, 4),
            upsample_kernel_sizes=(10, 8), resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        )
        base = ConditionalFlowMatchingWithHifiGan.from_config(cfm, voc, policy=BF16_INFERENCE)
    else:
        base = ConditionalFlowMatchingWithHifiGan.from_config(CFMConfig(vocab_size=2000), policy=BF16_INFERENCE)
    vocab = base.model.config.vocab_size
    ids = jnp.asarray(np.random.default_rng(0).integers(1, vocab + 1, (args.batch, args.frames)), jnp.int32)

    pairs = (("grouped", {16: "grouped", 32: "grouped", 64: "grouped"}), ("im2col", {}))
    decoders = []
    lengths = None
    for label, pack in pairs:
        with _TableContext(FM, dict(FM.MRF_FOLD_TABLE), pack, False):
            dec = ConditionalFlowMatchingWithHifiGan(
                base.model, base.model_variables, base.vocoder, base.vocoder_variables
            )
            wav, lengths = dec.synthesize(ids, dt=0.0625, truncation_value=1.0, rng=jax.random.key(0), pcm16=True)
            np.asarray(wav[0, :1])  # compile + sync
        print(f"[compiled] {label}", flush=True)
        decoders.append((label, dec))
    audio_s = args.iters * float(jnp.sum(lengths)) / 16000.0

    results = {label: [] for label, _ in decoders}
    for t in range(args.trials):
        for label, dec in decoders:
            t0 = time.perf_counter()
            outs = [
                dec.synthesize(
                    ids, dt=0.0625, truncation_value=1.0, rng=jax.random.key(100 + t * args.iters + i), pcm16=True
                )
                for i in range(args.iters)
            ]
            np.asarray(outs[-1][0][0, :1])
            dt = time.perf_counter() - t0
            results[label].append(dt / args.iters)
            print(f"trial {t} {label:8s} {dt:.3f}s  compute_rtf {audio_s / dt:.1f}x", flush=True)
    _report(results)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--frames", type=int, default=500, help="mel frames (vocoder mode) / units (serving mode)")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--serving", action="store_true", help="A/B inside the full synthesize program")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_resynth_tpu.core.backend import require_backend

    require_backend(240, metric="fold_ab")
    from speech_resynth_tpu.ops import fused_mrf as FM

    if args.serving:
        run_serving_ab(args, FM)
    else:
        run_vocoder_ab(args, FM)


if __name__ == "__main__":
    main()

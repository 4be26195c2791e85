"""Per-stage roofline attribution inside the REAL fused vocoder program.

bench_roofline.py places the whole vocoder on the chip roofline;
bench_mrf.py microbenches single branches standalone (and round 2 proved
standalone tables invert in context, PARITY.md).  This harness bridges the
two: it jits *prefixes* of ``generator_apply_fused`` (truncate after
conv_pre, each upsampler, each stage's MRF sum) at the exact headline
shapes and reports the PREFIX DELTAS — time, flops, "bytes accessed" —
so each stage's cost is measured inside the fused program XLA actually
runs, not in isolation.

Caveat: a prefix's final activations are materialized to HBM (they are the
program output), which the full program may instead fuse into the next
consumer — so deltas carry a small materialization bias; the `sum_vs_full`
row quantifies it (sum of deltas vs the untruncated program).

Usage: PYTHONPATH=/root/repo python benchmarks/bench_vocoder_stages.py
(idle host, tunneled chip; --cpu --tiny for a smoke run).
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
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--units", type=int, default=500)
    parser.add_argument("--frames", type=int, default=None, help="mel frames (default: --units, bench_mrf convention)")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--tiny", action="store_true", help="test-size config (smoke; timings meaningless)")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_resynth_tpu.core.backend import require_backend

    require_backend(240, metric="vocoder_stages")  # fail fast when the tunnel is down

    from speech_resynth_tpu.core.metrics import compiled_cost, device_peak_flops, device_peak_hbm_bw
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
    from speech_resynth_tpu.models.hifigan import generator_apply_fused

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
    cd = decoder.vocoder.policy.compute_dtype

    # headline-shape mel input (contents irrelevant for timing); default frame
    # count follows bench_mrf.py's headline-workload convention (T0 = units)
    frames = args.frames or args.units
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((args.batch, frames, cfg.model_in_dim)), jnp.float32)

    peak_flops = device_peak_flops()
    peak_bw = device_peak_hbm_bw()
    print(
        json.dumps(
            {
                "device": jax.local_devices()[0].device_kind,
                "batch": args.batch,
                "frames": frames,
                "stages": len(cfg.upsample_rates),
                "peak_tflops": peak_flops / 1e12,
                "peak_hbm_gbps": peak_bw / 1e9,
            }
        ),
        flush=True,
    )

    def make(truncate):
        def f(params, mel):
            x = mel
            if cfg.normalize_before:
                x = (x - vvars["buffers"]["mean"]) / vvars["buffers"]["scale"]
            return generator_apply_fused(params, cfg, x, compute_dtype=cd, truncate=truncate)

        return jax.jit(f)

    points = [("pre", 0)] + [(kind, i) for i in range(len(cfg.upsample_rates)) for kind in ("up", "mrf")]
    points.append(None)  # full program

    def sync1(out):
        # Materialize exactly ONE element: slice on device, THEN np.asarray.
        # (np.asarray(x).ravel()[:1] would pull the ENTIRE activation through
        # the tunnel — 80+ MB for the wide prefixes — and bury the compute
        # deltas in D2H transfer noise; block_until_ready lies on this
        # backend, see CLAUDE.md.)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1])

    def timed(fn, trials, iters):
        sync1(fn(vvars["params"], mel))  # warm
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            outs = [fn(vvars["params"], mel) for _ in range(iters)]
            sync1(outs[-1])
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) / iters

    # Pallas fused-MRF branches are invisible to XLA cost_analysis (custom
    # calls count as zero flops/bytes) — add their analytic cost to every
    # prefix that contains them, mirroring generator_apply_fused's dispatch
    # gate exactly.  Time deltas are unaffected; this fixes the flop/byte
    # attribution for the fused stages.
    from speech_resynth_tpu.ops.fused_mrf import (
        fused_branch_fits,
        mrf_fold_for_channels,
        mrf_packing_for_channels,
    )

    on_pallas = jax.default_backend() in ("tpu", "axon")
    itemsize = jnp.dtype(cd).itemsize

    def fused_stage_cost(i: int):
        """(flops, bytes) of stage i's Pallas-fused branches (0 if none fuse)."""
        channels = cfg.upsample_initial_channel // (2 ** (i + 1))
        t_stage = frames * int(np.prod(cfg.upsample_rates[: i + 1]))
        fl = by = 0.0
        for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            # mirror generator_apply_fused's dispatch: folded path when the
            # table says so and it fits VMEM, else the unfolded fused path
            fold = mrf_fold_for_channels(channels)
            pack = mrf_packing_for_channels(channels)
            fused = fused_branch_fits(
                channels, rk, len(rd), tuple(rd), itemsize, fold=fold, packing=pack
            ) or fused_branch_fits(channels, rk, len(rd), tuple(rd), itemsize)
            if on_pallas and channels <= 64 and rk % 2 == 1 and fused:
                fl += len(rd) * 2 * 2.0 * args.batch * t_stage * channels * channels * rk
                by += 2.0 * args.batch * t_stage * channels * itemsize
        return fl, by

    def fused_cost_through(pt):
        """Cumulative fused-branch cost contained in prefix ``pt``."""
        if pt == ("pre", 0):
            last = -1
        elif pt is None:
            last = len(cfg.upsample_rates) - 1
        else:
            last = pt[1] if pt[0] == "mrf" else pt[1] - 1
        costs = [fused_stage_cost(i) for i in range(last + 1)]
        return sum(c[0] for c in costs), sum(c[1] for c in costs)

    # Dispatch/sync floor: a jitted near-empty program under the SAME call +
    # 1-element-sync pattern.  Without this the first prefix delta absorbs
    # the whole per-trial floor and reads as (fake) conv_pre time — on the
    # tunneled chip that was ~2.5-3.5 ms of pure harness overhead.
    null_fn = jax.jit(lambda params, mel: mel[:1, :1, :1] * 1.0)
    floor_ms = timed(null_fn, args.trials, args.iters) * 1e3
    print(json.dumps({"stage": "null_floor", "delta_ms": round(floor_ms, 2)}), flush=True)

    rows = []
    for pt in points:
        fn = make(pt)
        compiled = fn.lower(vvars["params"], mel).compile()
        t = timed(fn, args.trials, args.iters)
        extra_fl, extra_by = fused_cost_through(pt)
        rows.append(
            {
                "prefix": "full" if pt is None else f"{pt[0]}{pt[1]}",
                "ms": t * 1e3,
                "gflops": (compiled_cost(compiled, "flops") + extra_fl) / 1e9,
                "gbytes": (compiled_cost(compiled, "bytes accessed") + extra_by) / 1e9,
            }
        )

    full = rows[-1]
    rows[-1] = dict(full, prefix="post")  # tail delta = conv_post + tanh + cast
    # seed with the measured floor so pre0's delta is compute, not harness
    prev = {"ms": floor_ms, "gflops": 0.0, "gbytes": 0.0}
    for row in rows:
        d_ms = row["ms"] - prev["ms"]
        d_fl = row["gflops"] - prev["gflops"]
        d_by = row["gbytes"] - prev["gbytes"]
        sec = d_ms / 1e3
        out = {
            "stage": row["prefix"],
            "delta_ms": round(d_ms, 2),
            "delta_gflops": round(d_fl, 1),
            "delta_gbytes": round(d_by, 3),
            "pct_full_time": round(100 * d_ms / (full["ms"] - floor_ms), 1) if full["ms"] > floor_ms else None,
            "achieved_tflops": round(d_fl / d_ms, 1) if d_ms > 0 else None,
            "achieved_gbps": round(d_by / sec, 1) if d_ms > 0 else None,
            "pct_peak_flops": round(100 * d_fl * 1e9 / sec / peak_flops, 1) if peak_flops and d_ms > 0 else None,
            "pct_peak_bw": round(100 * d_by * 1e9 / sec / peak_bw, 1) if peak_bw and d_ms > 0 else None,
        }
        print(json.dumps(out), flush=True)
        prev = row
    print(
        json.dumps(
            {
                "stage": "full",
                "ms": round(full["ms"], 2),
                "gflops": round(full["gflops"], 1),
                "gbytes": round(full["gbytes"], 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

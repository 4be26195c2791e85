"""Roofline placement of the headline compute path: is it really HBM-bound?

PARITY.md claims the remaining compute ceiling (~1390x) is "HBM-bound model
shape, not dispatch".  This harness turns that claim into a measurement:
for the full synthesize program and its two stages (16-step CFM Euler ODE,
HiFi-GAN vocoder) it reports

* flops + "bytes accessed" from XLA cost analysis of the compiled
  executable (post-fusion HLO, so bytes ~= HBM traffic between fusions —
  an upper bound that ignores VMEM reuse inside a fusion), CORRECTED for
  the two blind spots of cost_analysis (scan bodies counted once instead
  of x trip count; Pallas custom calls counted as zero) — raw values are
  kept in ``gflops_raw``/``gbytes_raw``;
* compute-only median time (1-element-slice sync: the tunneled backend's
  block_until_ready does not synchronize, see CLAUDE.md);
* achieved TFLOP/s and GB/s as fractions of the chip peaks
  (core/metrics.py tables: v5e 197 TFLOP/s bf16, 819 GB/s HBM);
* arithmetic intensity vs the chip ridge point (peak_flops / peak_bw;
  v5e ~240 flop/byte) — intensity below the ridge means the program
  CANNOT be MXU-bound no matter how it is scheduled.

The verdict line names the binding roof and the speed-of-light headroom:
``time_vs_light`` = measured time / max(flops/peak_flops, bytes/peak_bw).

Usage: PYTHONPATH=/root/repo python benchmarks/bench_roofline.py
(idle host; reference model sizes; one JSON line per program).
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--units", type=int, default=500)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument(
        "--tiny", action="store_true", help="test-size configs for a CPU smoke run (timings meaningless)"
    )
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (the host sitecustomize pins jax_platforms='axon,cpu'; "
        "env JAX_PLATFORMS alone does not stick — tests/conftest.py)",
    )
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_resynth_tpu.core.backend import require_backend

    require_backend(240, metric="roofline")  # fail fast when the tunnel is down

    from speech_resynth_tpu.core.metrics import compiled_cost, device_peak_flops, device_peak_hbm_bw
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan

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
    B, U, iters = args.batch, args.units, args.iters
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 2001, (B, U)), jnp.int32)
    rng = jax.random.key(0)

    peak_flops = device_peak_flops()
    peak_bw = device_peak_hbm_bw()
    print(
        json.dumps(
            {
                "device": jax.local_devices()[0].device_kind,
                "peak_tflops": peak_flops / 1e12,
                "peak_hbm_gbps": peak_bw / 1e9,
                "ridge_flop_per_byte": round(peak_flops / peak_bw, 1) if peak_bw else None,
                "batch": B,
                "units": U,
            }
        ),
        flush=True,
    )

    # --- the three programs, params as arguments (CLAUDE.md: no big closures) ---
    synth_kw = dict(dt=0.0625, truncation_value=1.0, max_frames=None, pcm16=True, mulaw=False)

    sample = jax.jit(
        lambda variables, ids, rng: decoder.model.apply(
            variables, ids, dt=0.0625, truncation_value=1.0, rng=rng, max_frames=None, method="sample"
        )
    )

    use_fused = decoder.fused_vocoder and jax.default_backend() in ("tpu", "axon")

    def _vocode(vvars, mel):
        # mirrors composite._synthesize's vocoder branch exactly
        if use_fused:
            from speech_resynth_tpu.models.hifigan import generator_apply_fused

            if decoder.vocoder.config.normalize_before:
                mel = (mel - vvars["buffers"]["mean"]) / vvars["buffers"]["scale"]
            return generator_apply_fused(
                vvars["params"], decoder.vocoder.config, mel, compute_dtype=decoder.vocoder.policy.compute_dtype
            )
        return decoder.vocoder.apply(vvars, mel)

    vocode = jax.jit(_vocode)

    # warmups (also the compile for the AOT cost-analysis cache hits)
    wav, _ = decoder.synthesize(ids, dt=0.0625, truncation_value=1.0, rng=rng, pcm16=True)
    np.asarray(wav[0, :1])
    mel, _ = sample(decoder.model_variables, ids, rng)
    np.asarray(mel[0, :1, :1])
    out = vocode(decoder.vocoder_variables, mel)
    np.asarray(out[0, :1])

    def timed(dispatch, sync, trials):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            outs = [dispatch(i) for i in range(iters)]
            sync(outs[-1])
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) / iters

    programs = {
        "synthesize": (
            decoder._synth.lower(ids, rng, **synth_kw).compile(),
            lambda i: decoder.synthesize(ids, dt=0.0625, truncation_value=1.0, rng=jax.random.key(i), pcm16=True),
            lambda o: np.asarray(o[0][0, :1]),
        ),
        "ode": (
            sample.lower(decoder.model_variables, ids, rng).compile(),
            lambda i: sample(decoder.model_variables, ids, jax.random.key(i)),
            lambda o: np.asarray(o[0][0, :1, :1]),
        ),
        "vocoder": (
            vocode.lower(decoder.vocoder_variables, mel).compile(),
            lambda i: vocode(decoder.vocoder_variables, mel),
            lambda o: np.asarray(o[0, :1]),
        ),
    }

    # --- XLA cost-analysis blind spots, corrected analytically --------------
    #
    # 1. ``lax.scan``/while bodies are counted ONCE, not x trip count: the
    #    raw "ode" flops on the full-size config (153.5 G) match a hand count
    #    of exactly ONE velocity evaluation, not the 16 Euler steps the
    #    program runs.  Correction: multiply the ode cost by num_steps.
    #    (That also multiplies the scan prologue/epilogue — unit embedding,
    #    x0 clip, final un-normalize, <2% of one body — documented bias
    #    toward *overstating* the roof, i.e. conservative headroom.)
    # 2. Pallas custom calls report zero flops/bytes: the flash-attention
    #    kernel and the fused MRF branches are invisible to cost_analysis.
    #    Correction: analytic counts mirroring the exact dispatch gates.
    from speech_resynth_tpu.ops.attention import auto_dispatch
    from speech_resynth_tpu.ops.fused_mrf import fused_branch_fits

    num_steps = int(np.ceil(round(1.0 / synth_kw["dt"], 9)))
    itemsize = 2  # bf16 compute path
    ccfg = decoder.model.config
    d_head = ccfg.hidden_size // ccfg.heads
    n_frames = U  # predict_duration=False: one frame per unit
    flash_flops = flash_bytes = 0.0
    if jax.default_backend() in ("tpu", "axon") and auto_dispatch(d_head, n_frames, n_frames, False, True) == "pallas":
        # per velocity eval: QK^T + PV matmuls per layer (softmax elementwise ~0)
        flash_flops = ccfg.depth * 4.0 * B * ccfg.heads * n_frames * n_frames * d_head
        flash_bytes = ccfg.depth * 4.0 * B * ccfg.heads * n_frames * d_head * itemsize  # q,k,v in + o out

    vcfg = decoder.vocoder.config
    mrf_flops = mrf_bytes = 0.0
    if use_fused:
        t_stage = n_frames
        for i, _rate in enumerate(vcfg.upsample_rates):
            channels = vcfg.upsample_initial_channel // (2 ** (i + 1))
            t_stage *= _rate
            for rk, rd in zip(vcfg.resblock_kernel_sizes, vcfg.resblock_dilation_sizes):
                if channels <= 64 and rk % 2 == 1 and fused_branch_fits(channels, rk, len(rd), tuple(rd), itemsize):
                    # len(rd) (dilated conv, dil-1 conv) pairs of CxC k-taps
                    mrf_flops += len(rd) * 2 * 2.0 * B * t_stage * channels * channels * rk
                    mrf_bytes += 2.0 * B * t_stage * channels * itemsize  # stream x in, out once

    raw = {n: (compiled_cost(c, "flops"), compiled_cost(c, "bytes accessed")) for n, (c, _, _) in programs.items()}
    ode_f, ode_b = raw["ode"]
    corrected = {
        "ode": (num_steps * (ode_f + flash_flops), num_steps * (ode_b + flash_bytes)),
        "vocoder": (raw["vocoder"][0] + mrf_flops, raw["vocoder"][1] + mrf_bytes),
        "synthesize": (
            raw["synthesize"][0] + (num_steps - 1) * ode_f + num_steps * flash_flops + mrf_flops,
            raw["synthesize"][1] + (num_steps - 1) * ode_b + num_steps * flash_bytes + mrf_bytes,
        ),
    }

    for name, (compiled, dispatch, sync) in programs.items():
        flops, bytes_ = corrected[name]
        t = timed(dispatch, sync, args.trials)
        light = max(flops / peak_flops if peak_flops else 0.0, bytes_ / peak_bw if peak_bw else 0.0)
        row = {
            "program": name,
            "ms": round(t * 1e3, 2),
            "gflops": round(flops / 1e9, 1),
            "gbytes": round(bytes_ / 1e9, 3),
            "gflops_raw": round(raw[name][0] / 1e9, 1),
            "gbytes_raw": round(raw[name][1] / 1e9, 3),
            "intensity_flop_per_byte": round(flops / bytes_, 1) if bytes_ else None,
            "achieved_tflops": round(flops / t / 1e12, 1),
            "achieved_gbps": round(bytes_ / t / 1e9, 1),
            "pct_peak_flops": round(100 * flops / (t * peak_flops), 1) if peak_flops else None,
            "pct_peak_bw": round(100 * bytes_ / (t * peak_bw), 1) if peak_bw else None,
            "bound": ("hbm" if bytes_ / peak_bw > flops / peak_flops else "mxu") if peak_bw and peak_flops else None,
            "time_vs_light": round(t / light, 1) if light else None,
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

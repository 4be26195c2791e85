"""Roofline placement of the headline compute path: is it really HBM-bound?

PARITY.md claims the remaining compute ceiling (~1390x) is "HBM-bound model
shape, not dispatch".  This harness turns that claim into a measurement:
for the full synthesize program and its two stages (16-step CFM Euler ODE,
HiFi-GAN vocoder) it reports

* flops + "bytes accessed" from XLA cost analysis of the compiled
  executable (post-fusion HLO, so bytes ~= HBM traffic between fusions —
  an upper bound that ignores VMEM reuse inside a fusion);
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

    for name, (compiled, dispatch, sync) in programs.items():
        flops = compiled_cost(compiled, "flops")
        bytes_ = compiled_cost(compiled, "bytes accessed")
        t = timed(dispatch, sync, args.trials)
        light = max(flops / peak_flops if peak_flops else 0.0, bytes_ / peak_bw if peak_bw else 0.0)
        row = {
            "program": name,
            "ms": round(t * 1e3, 2),
            "gflops": round(flops / 1e9, 1),
            "gbytes": round(bytes_ / 1e9, 3),
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

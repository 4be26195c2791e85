"""RTF benchmark: unit -> waveform resynthesis throughput per chip.

Measures the BASELINE.json headline metric — audio seconds synthesized per
wall-clock second per chip — over the full inference path: 16-step CFM Euler
ODE (reference config dt=0.0625, truncation 1.0;
configs/resynth/mhubert-expresso-2000.yaml:42-43) + HiFi-GAN x320 vocoder at
reference model sizes.  Prints one JSON line (plus MFU/throughput fields).
``vs_baseline`` is measured RTF / 50 (the >=50x-real-time-per-chip north
star).

Protocol (round 3): ``value`` is the MEDIAN RTF over ``--trials`` (default
5) independent trials of ``--iters`` (default 20) batches each — fresh RNG
keys per batch, one compiled program throughout.  ``rtf_min``/``rtf_max``
give the spread so a single noisy-neighbor reading on this contended 1-core
host can't masquerade as a regression (readings historically swing ±15%
with host CPU contention; see PARITY.md bench methodology).

``--pretrained <dir>`` benches a converted checkpoint directory (our
composite HF-format layout) instead of random weights — throughput is
weight-agnostic, but this keeps the bench honest once real weights exist.
"""

import argparse
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--pretrained",
        default=None,
        help="composite checkpoint dir (models/export.py layout); random weights if omitted",
    )
    parser.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the steady-state loop into DIR (view with tensorboard)",
    )
    parser.add_argument("--trials", type=int, default=5, help="independent timed trials; value = median RTF")
    parser.add_argument("--iters", type=int, default=20, help="batches per trial")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--units", type=int, default=500, help="units per sequence (500 = 10 s of audio at 50 Hz)")
    parser.add_argument(
        "--wire",
        choices=("pcm16", "mulaw"),
        default="pcm16",
        help="serving wire format: pcm16 (default, the cross-round headline protocol) or "
        "mulaw (8-bit G.711-style companding, half the drain bytes — dsp/mulaw.py)",
    )
    args = parser.parse_args()

    # Backend reachability probe: when the tunneled TPU is down, jax.devices()
    # blocks forever inside backend init — a hung bench is worse than a failed
    # one (core/backend.py; observed 2026-08-17 multi-hour tunnel outage).
    from speech_resynth_tpu.core.backend import require_backend

    require_backend(240, metric="resynthesis_rtf", unit="x_realtime")

    from speech_resynth_tpu.core.metrics import compiled_flops, device_peak_flops
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan

    if args.pretrained:
        decoder = ConditionalFlowMatchingWithHifiGan.from_pretrained(args.pretrained, policy=BF16_INFERENCE)
    else:
        decoder = ConditionalFlowMatchingWithHifiGan.from_config(CFMConfig(vocab_size=2000), policy=BF16_INFERENCE)

    vocab = decoder.model.config.vocab_size
    batch, units_per_seq = args.batch, args.units
    ids = jnp.asarray(np.random.default_rng(0).integers(1, vocab + 1, (batch, units_per_seq)), jnp.int32)

    pcm16, mulaw = args.wire == "pcm16", args.wire == "mulaw"

    def run(rng):
        # device-side wire-format conversion (int16 PCM or uint8 mu-law)
        return decoder.synthesize(ids, dt=0.0625, truncation_value=1.0, rng=rng, pcm16=pcm16, mulaw=mulaw)

    # warmup/compile; NOTE: on the tunneled 'axon' platform
    # block_until_ready does not actually synchronize — timing is based on
    # host materialization (device_get) of every output byte.
    wav, lengths = run(jax.random.key(0))
    np.asarray(wav)

    # FLOPs of one synthesize program (post-warmup, so the AOT compile is a
    # cache hit; 0 if the backend exposes no cost analysis)
    try:
        flops = compiled_flops(
            decoder._synth.lower(
                ids, jax.random.key(0), dt=0.0625, truncation_value=1.0, max_frames=None, pcm16=pcm16, mulaw=mulaw
            ).compile()
        )
    except Exception:
        flops = 0.0

    # steady-state serving throughput: enqueue all batches (async dispatch),
    # then drain each output fully to the host; wall time covers the last
    # byte landing host-side.  This overlaps device compute with host
    # transfer exactly the way a serving loop does; nothing is skipped.
    # Median over --trials independent repeats, fresh keys per batch.
    if args.profile:
        from speech_resynth_tpu.core.metrics import start_profiler_trace, stop_profiler_trace

        start_profiler_trace(args.profile)
    # the drain uses a small thread pool: concurrent transfers hide the
    # tunneled backend's ~25 ms per-materialization floor (measured: serial
    # 33 MB/s vs 4 threads 61 MB/s on the same link) — exactly what a real
    # serving client does with async result fetches
    from concurrent.futures import ThreadPoolExecutor

    iters = args.iters
    audio_seconds = None
    times = []
    with ThreadPoolExecutor(4) as pool:
        for t in range(max(1, args.trials)):
            start = time.perf_counter()
            outs = [run(jax.random.key(t * iters + i + 1)) for i in range(iters)]
            list(pool.map(lambda o: np.asarray(o[0]), outs))
            times.append(time.perf_counter() - start)
            if audio_seconds is None:
                audio_seconds = iters * float(jnp.sum(outs[-1][1])) / 16000.0
    if args.profile:
        stop_profiler_trace()

    elapsed = statistics.median(times)
    rtf = audio_seconds / elapsed

    # compute-only RTF: dispatch all, sync via a 1-element slice of the LAST
    # output (stream ordering => every program finished; ~4 bytes cross the
    # tunnel).  This is the chip-bound number; `value` is the wire-bound one.
    # The spread between them is the tunnel: benchmarks/diagnose_headline.py
    # measured D2H at ~30 MB/s, a hard ~930x ceiling on the full protocol
    # (PCM16 at 16 kHz is 32 KB per audio-second) that varies day to day
    # with tunnel congestion — see PARITY.md bench methodology.
    ctimes = []
    for t in range(max(1, args.trials)):
        start = time.perf_counter()
        outs = [run(jax.random.key(1000 + t * iters + i)) for i in range(iters)]
        np.asarray(outs[-1][0][0, :1])
        ctimes.append(time.perf_counter() - start)
    compute_rtf = audio_seconds / statistics.median(ctimes)

    # tunnel D2H bandwidth probe: re-materialize fresh copies of one wav
    # batch (a jitted +1 makes a new device array each time; np.asarray
    # caches host copies on the SAME array, so fresh arrays are required)
    bump = jax.jit(lambda x: x + 1)
    np.asarray(bump(wav))
    wav_bytes = wav.size * wav.dtype.itemsize
    t0 = time.perf_counter()
    arrs = [bump(wav) for _ in range(8)]
    for a in arrs:
        np.asarray(a)
    d2h_mbps = 8 * wav_bytes / 1e6 / (time.perf_counter() - t0)

    peak = device_peak_flops()
    result = {
        "metric": "audio_sec_synthesized_per_sec_per_chip",
        "value": round(rtf, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 50.0, 3),
        "trials": len(times),
        "rtf_min": round(audio_seconds / max(times), 2),
        "rtf_max": round(audio_seconds / min(times), 2),
        "units_per_sec": round(iters * batch * units_per_seq / elapsed, 1),
        "batch": batch,
        "units": units_per_seq,
        "compute_rtf": round(compute_rtf, 2),
        "d2h_mbps": round(d2h_mbps, 1),
        "weights": "pretrained" if args.pretrained else "random",
        "wire": args.wire,
    }
    if flops > 0 and peak > 0:
        result["mfu"] = round(flops * iters / (elapsed * peak), 4)
        result["mfu_compute"] = round(flops * iters / (statistics.median(ctimes) * peak), 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

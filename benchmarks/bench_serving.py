"""Serving-latency benchmark: per-request latency percentiles through the
SynthesisServer micro-batching loop (pipeline/serving.py) on the chip.

Throughput (bench.py) tells half the serving story; this measures what a
caller sees: submit-to-waveform latency for a closed-loop stream of
10 s-utterance requests at a given micro-batch size, including collation,
device dispatch, synthesis, and host drain of the PCM16 bytes.

Prints one JSON line per batch size with p50/p90/p99 latency (ms) and the
achieved throughput (x realtime).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.cfm import CFMConfig
    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
    from speech_resynth_tpu.pipeline.serving import SynthesisRequest, SynthesisServer

    decoder = ConditionalFlowMatchingWithHifiGan.from_config(CFMConfig(vocab_size=2000), policy=BF16_INFERENCE)
    rng = np.random.default_rng(0)
    n_requests = 96
    units = [rng.integers(1, 2001, 500).astype(np.int32) for _ in range(n_requests)]

    for batch_size in (8, 16):
        server = SynthesisServer(decoder, batch_size=batch_size)
        # warm the (batch, length) bucket program
        list(server.synthesize_stream(SynthesisRequest(u, i) for i, u in enumerate(units[:batch_size])))

        submit_t: dict = {}
        latencies = []
        audio_sec = 0.0

        def requests():
            for i, u in enumerate(units):
                submit_t[i] = time.perf_counter()
                yield SynthesisRequest(u, i)

        t0 = time.perf_counter()
        for rid, wav in server.synthesize_stream(requests()):
            latencies.append(time.perf_counter() - submit_t[rid])
            audio_sec += len(wav) / 16000.0
        elapsed = time.perf_counter() - t0

        lat = np.sort(np.asarray(latencies)) * 1000.0
        print(
            json.dumps(
                {
                    "metric": "serving_latency_ms",
                    "batch_size": batch_size,
                    "p50": round(float(lat[len(lat) // 2]), 1),
                    "p90": round(float(lat[int(len(lat) * 0.9)]), 1),
                    "p99": round(float(lat[min(int(len(lat) * 0.99), len(lat) - 1)]), 1),
                    "throughput_x_realtime": round(audio_sec / elapsed, 1),
                    "requests": n_requests,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

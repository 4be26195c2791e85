"""D2H drain-strategy probe for the tunneled chip.

The headline protocol is wire-bound (PARITY.md bench methodology): PCM16 at
16 kHz is 32 KB per audio-second, and the tunnel moves ~30-44 MB/s on a
single stream with a ~25 ms per-call floor.  Round 3 hid part of that with a
4-thread drain pool (measured 61 MB/s).  This probe answers the remaining
tuning questions with medians on an idle host:

1. aggregate bandwidth vs concurrent stream count (1/2/4/6/8/12);
2. per-batch transfers vs per-row-group transfers (finer granularity means
   more streams in flight for the same number of buffered batches);
3. whether device-side slicing overhead eats the gain.

Usage: PYTHONPATH=/root/repo python benchmarks/bench_d2h.py
Prints one JSON line per configuration.
"""

import json
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # Shape of one headline wav batch: 16 x ~10 s PCM16.
    batch, samples = 16, 320_192
    base = jnp.asarray(np.random.default_rng(0).integers(-32768, 32767, (batch, samples)), jnp.int16)
    bump = jax.jit(lambda x, i: x + i)
    np.asarray(bump(base, 1))  # warm compile
    nbatches = 8
    mb = nbatches * batch * samples * 2 / 1e6

    def fresh():
        # fresh device arrays each trial: np.asarray caches host copies
        arrs = [bump(base, i + 1) for i in range(nbatches)]
        np.asarray(arrs[-1][0, :1])  # sync: all transfers below hit ready buffers
        return arrs

    def timed(fn, trials=3):
        ts = []
        for _ in range(trials):
            arrs = fresh()
            t0 = time.perf_counter()
            fn(arrs)
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    # 1) whole-batch transfers, varying pool width
    for nthreads in (1, 2, 4, 6, 8, 12):
        with ThreadPoolExecutor(nthreads) as pool:
            dt = timed(lambda arrs: list(pool.map(np.asarray, arrs)))
        print(json.dumps({"strategy": "per_batch", "threads": nthreads, "mbps": round(mb / dt, 1)}))

    # 2) per-row-group transfers (split each batch into `splits` row groups
    #    host-side; each group is a separate D2H stream)
    for splits, nthreads in ((2, 8), (4, 8), (4, 16), (8, 16)):
        def drain(arrs, s=splits):
            rows = batch // s
            with ThreadPoolExecutor(nthreads) as pool:
                list(pool.map(np.asarray, [a[i * rows:(i + 1) * rows] for a in arrs for i in range(s)]))
        dt = timed(drain)
        print(json.dumps({"strategy": f"row_groups_{splits}", "threads": nthreads, "mbps": round(mb / dt, 1)}))


if __name__ == "__main__":
    main()

"""Per-stage MRF branch microbench: fused Pallas kernel vs XLA (lax reference).

VERDICT r1 #7: the fused-MRF dispatch threshold (models/hifigan.py
``generator_apply_fused(fused_max_channels=...)``) must be driven by
measurement, not assertion.  This bench times ONE residual branch per
(stage, kernel-size) at the exact (C, T) shapes the production vocoder hits
for the headline workload (batch 16 x 500 units -> x320 upsample), for both
implementations.  Correctness of the kernel vs the reference is covered by
tests/test_fused_mrf.py; numbers from this bench go into PARITY.md.

Run on the tunneled chip: `python benchmarks/bench_mrf.py`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from speech_resynth_tpu.ops.fused_mrf import mrf_branch_pallas, mrf_branch_reference

BATCH = 16
UNITS = 500
DILATIONS = (1, 3, 5)
KERNELS = (3, 7, 11)

# (channels, T) after each upsample stage for the headline workload
STAGES = [
    (256, UNITS * 5),
    (128, UNITS * 20),
    (64, UNITS * 80),
    (32, UNITS * 160),
    (16, UNITS * 320),
]

CHAIN = 8  # in-graph repeats per dispatch (amortize the ~25 ms sync floor)


def bench_branch(C, T, K, impl, iters=4, fold=1):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, T, C)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((len(DILATIONS), K, C, C)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((len(DILATIONS), K, C, C)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((len(DILATIONS), C), jnp.bfloat16)
    b2 = jnp.zeros((len(DILATIONS), C), jnp.bfloat16)

    if impl == "pallas":
        fn_one = lambda xx, *a: mrf_branch_pallas(xx, *a, fold=fold)
    else:
        fn_one = mrf_branch_reference

    def chained(x):
        def body(xx, _):
            return fn_one(xx, w1, b1, w2, b2, DILATIONS).astype(xx.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return out

    fn = jax.jit(chained)
    np.asarray(fn(x))  # compile + sync
    start = time.perf_counter()
    outs = [fn(x) for _ in range(iters)]
    for o in outs:
        np.asarray(o[0, 0])
    elapsed = time.perf_counter() - start
    calls = iters * CHAIN
    # branch FLOPs: 6 convs of K taps, each 2*C^2*T
    flops = 6 * K * 2.0 * C * C * T * BATCH
    return elapsed / calls, flops * calls / elapsed


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0].device_kind}")
    print(f"{'C':>4s} {'T':>7s} {'K':>3s} {'impl':12s} {'ms/branch':>10s} {'TFLOP/s':>9s}")
    for C, T in STAGES:
        folds = sorted({1, 2, max(1, 128 // C)}) if C <= 64 else (1,)
        for K in KERNELS:
            variants = [("xla", 1)] + [("pallas", f) for f in folds]
            for impl, fold in variants:
                label = impl if fold == 1 else f"{impl}-f{fold}"
                try:
                    t, fl = bench_branch(C, T, K, impl, fold=fold)
                    print(f"{C:4d} {T:7d} {K:3d} {label:12s} {t * 1e3:10.3f} {fl / 1e12:9.2f}", flush=True)
                except Exception as e:
                    print(f"{C:4d} {T:7d} {K:3d} {label:12s}   failed: {type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()

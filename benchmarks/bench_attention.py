"""Attention microbench: Pallas flash kernel vs XLA SDPA on the real chip.

VERDICT r1 #6: the flash kernel originally served only d_head=128 (CFM);
HuBERT/Llama have d_head=64.  This bench measures both implementations on the
three shape families the framework actually runs, so the auto dispatch
(`ops/attention.py:dot_product_attention`) is driven by data, not guesses.

Run on the tunneled chip: `python benchmarks/bench_attention.py`.
Timing: enqueue N iterations, drain every output to host (block_until_ready
does not synchronize on the tunneled platform).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from speech_resynth_tpu.ops.attention import dot_product_attention

SHAPES = [
    # (name, B, H, N, D, causal)
    ("cfm (bidir)", 16, 2, 512, 128, False),
    ("hubert (bidir)", 8, 12, 512, 64, False),
    ("llama train (causal)", 96, 12, 128, 64, True),
    ("llama long (causal)", 8, 12, 1024, 64, True),
]


CHAIN = 50  # in-graph applications per dispatch (amortizes the ~25 ms
# per-call host-sync floor of the tunneled platform out of the measurement)


def bench_one(name, b, h, n, d, causal, impl, iters=5):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    mask = jnp.ones((b, n), bool)

    def chained(q, k, v, mask):
        def body(qq, _):
            o = dot_product_attention(qq, k, v, mask, causal=causal, implementation=impl)
            return o.astype(qq.dtype), ()

        out, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return out

    fn = jax.jit(chained)
    np.asarray(fn(q, k, v, mask))  # compile + sync

    start = time.perf_counter()
    outs = [fn(q, k, v, mask) for _ in range(iters)]
    for o in outs:
        np.asarray(o[0, 0, 0])
    elapsed = time.perf_counter() - start

    calls = iters * CHAIN
    # attention FLOPs: 2*B*H*N^2*D (QK^T) + 2*B*H*N^2*D (PV); /2 if causal
    flops = 4.0 * b * h * n * n * d * (0.5 if causal else 1.0)
    return elapsed / calls, flops * calls / elapsed


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0].device_kind}")
    print(f"{'shape':24s} {'impl':8s} {'ms/call':>9s} {'TFLOP/s':>9s}")
    for name, b, h, n, d, causal in SHAPES:
        for impl in ("xla", "pallas"):
            try:
                t, fl = bench_one(name, b, h, n, d, causal, impl)
                print(f"{name:24s} {impl:8s} {t * 1e3:9.3f} {fl / 1e12:9.2f}")
            except Exception as e:  # pallas may reject a shape
                print(f"{name:24s} {impl:8s}   failed: {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()

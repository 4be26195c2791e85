"""Transposed-conv formulation A/B: zero-stuffed lhs_dilation vs sub-pixel.

The generator upsamplers (models/hifigan.py upsample_conv_transpose) can be
lowered two ways: the canonical lhs_dilation form (XLA sees a conv whose
input is (S-1)/S zeros unless it strips them) or the phase-decomposed
"sub-pixel" form (one dense (J*I, S*O) contraction + depth-to-time
interleave), which keeps the MXU on dense data by construction.

Round-2 lesson (PARITY.md): standalone kernel tables invert inside fused
programs — so this bench times BOTH the standalone per-stage transposed
conv AND the full jitted vocoder (generator_apply_fused, production
dispatch) under each formulation, at the exact headline shapes
(batch 16 x 500 mel frames -> x320).  The in-context rows decide the
default in models/hifigan.py:upsample_conv_transpose.

Run on the tunneled chip: `python benchmarks/bench_upsample.py`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from speech_resynth_tpu.models import hifigan as H

BATCH = 16
FRAMES = 500
ITERS = 8
CFG = H.HifiGanConfig()


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def bench_stage(i, impl, iters=ITERS):
    """Standalone: one upsampler stage at its production (C_in, T_in)."""
    rng = np.random.default_rng(i)
    c_in = CFG.upsample_initial_channel // (2**i)
    c_out = c_in // 2
    t_in = FRAMES * int(np.prod(CFG.upsample_rates[:i], dtype=np.int64))
    rate, kernel = CFG.upsample_rates[i], CFG.upsample_kernel_sizes[i]
    x = jnp.asarray(rng.standard_normal((BATCH, t_in, c_in)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((kernel, c_in, c_out)) * 0.02, jnp.bfloat16)
    b = jnp.zeros((c_out,), jnp.bfloat16)

    with H.upsample_implementation(impl):

        @jax.jit
        def fn(x, w, b):
            return H.upsample_conv_transpose(x, w, b, rate, (kernel - rate) // 2)

        _sync(fn(x, w, b))  # compile inside the context (trace-time dispatch)
    start = time.perf_counter()
    outs = [fn(x, w, b) for _ in range(iters)]
    for o in outs:
        _sync(o)
    t = (time.perf_counter() - start) / iters
    flops = 2.0 * kernel * c_in * c_out * t_in * BATCH  # dense-equivalent
    return (c_in, t_in, kernel, rate), t, flops / t


def bench_vocoder(impl, iters=ITERS):
    """In-context: full jitted generator_apply_fused (production dispatch)."""
    rng = np.random.default_rng(0)
    gen = H.HifiGanGenerator(CFG)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80), jnp.float32))["params"]
    mel = jnp.asarray(rng.standard_normal((BATCH, FRAMES, 80)), jnp.float32)

    with H.upsample_implementation(impl):

        @jax.jit
        def fn(params, mel):
            return H.generator_apply_fused(params, CFG, mel)

        _sync(fn(params, mel))
    start = time.perf_counter()
    outs = [fn(params, mel) for _ in range(iters)]
    for o in outs:
        _sync(o)
    return (time.perf_counter() - start) / iters


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0].device_kind}")
    print("-- standalone per-stage transposed conv --")
    print(f"{'stage':>5s} {'Cin':>4s} {'Tin':>7s} {'K':>3s} {'S':>3s} {'impl':>9s} {'ms':>9s} {'TFLOP/s':>8s}")
    for i in range(len(CFG.upsample_rates)):
        for impl in ("dilated", "subpixel"):
            (c, t_in, k, s), t, fl = bench_stage(i, impl)
            print(f"{i:5d} {c:4d} {t_in:7d} {k:3d} {s:3d} {impl:>9s} {t * 1e3:9.3f} {fl / 1e12:8.2f}", flush=True)
    print("-- in-context: full jitted vocoder (decides the default) --")
    for impl in ("dilated", "subpixel"):
        best = min(bench_vocoder(impl) for _ in range(3))
        print(f"vocoder {impl:>9s}: {best * 1e3:9.3f} ms/call (best of 3x{ITERS})", flush=True)


if __name__ == "__main__":
    main()

"""Fused MRF branch kernel: interpret-mode parity with the lax reference and
with the HifiGanGenerator ResidualBlock."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.ops import fused_mrf as FM


def make_branch(C, K, pairs=3, seed=0):
    rng = np.random.default_rng(seed)
    w1 = rng.standard_normal((pairs, K, C, C)).astype(np.float32) * 0.1
    b1 = rng.standard_normal((pairs, C)).astype(np.float32) * 0.01
    w2 = rng.standard_normal((pairs, K, C, C)).astype(np.float32) * 0.1
    b2 = rng.standard_normal((pairs, C)).astype(np.float32) * 0.01
    return map(jnp.asarray, (w1, b1, w2, b2))


@pytest.mark.parametrize("C,K,T", [(8, 3, 64), (16, 11, 100)])
def test_interpret_matches_reference(C, K, T):
    w1, b1, w2, b2 = make_branch(C, K)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, T, C)), jnp.float32) * 0.5

    ref = FM.mrf_branch_reference(x, w1, b1, w2, b2, (1, 3, 5))
    got = FM.mrf_branch_pallas(x, w1, b1, w2, b2, (1, 3, 5), t_blk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_interpret_bf16_operands():
    """Production dtype: bf16 operands run the MXU full-rate path (f32
    accumulation, f32 residual chain).  The lax reference in bf16 rounds to
    bf16 after every conv, so the kernel is slightly MORE precise — compare
    at bf16-scale tolerance."""
    C, K = 16, 11
    w1, b1, w2, b2 = make_branch(C, K)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 100, C)), jnp.float32) * 0.5
    cast = lambda a: a.astype(jnp.bfloat16)

    ref = FM.mrf_branch_reference(cast(x), cast(w1), cast(b1), cast(w2), cast(b2), (1, 3, 5))
    got = FM.mrf_branch_pallas(cast(x), cast(w1), cast(b1), cast(w2), cast(b2), (1, 3, 5), t_blk=32, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.06
    )


def test_reference_matches_residual_block_module():
    from speech_resynth_tpu.core.precision import FLOAT32
    from speech_resynth_tpu.models.hifigan import ResidualBlock

    C, K = 8, 3
    rb = ResidualBlock(C, K, (1, 3, 5), policy=FLOAT32)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 40, C)), jnp.float32)
    variables = rb.init(jax.random.key(0), x)

    ref_out = rb.apply(variables, x)

    p = variables["params"]
    w1 = jnp.stack([p[f"convs1_{j}"]["kernel"] for j in range(3)])
    b1 = jnp.stack([p[f"convs1_{j}"]["bias"] for j in range(3)])
    w2 = jnp.stack([p[f"convs2_{j}"]["kernel"] for j in range(3)])
    b2 = jnp.stack([p[f"convs2_{j}"]["bias"] for j in range(3)])
    got = FM.mrf_branch_reference(x, w1, b1, w2, b2, (1, 3, 5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_out), rtol=1e-4, atol=1e-5)


def test_generator_apply_fused_matches_module():
    from speech_resynth_tpu.core.precision import FLOAT32
    from speech_resynth_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator, generator_apply_fused

    cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    gen = HifiGanGenerator(cfg, policy=FLOAT32)
    mel = jnp.asarray(np.random.default_rng(3).standard_normal((2, 12, 8)), jnp.float32)
    variables = gen.init(jax.random.key(0), mel)

    ref = gen.apply(variables, mel)
    got = generator_apply_fused(
        variables["params"], cfg, mel, compute_dtype=jnp.float32, force_fused=True, interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_generator_apply_fused_truncate_prefixes():
    """truncate points return the right intermediate shapes and the chain of
    prefixes is consistent with the full program (bench_vocoder_stages.py)."""
    from speech_resynth_tpu.core.precision import FLOAT32
    from speech_resynth_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator, generator_apply_fused

    cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    gen = HifiGanGenerator(cfg, policy=FLOAT32)
    mel = jnp.asarray(np.random.default_rng(3).standard_normal((2, 12, 8)), jnp.float32)
    variables = gen.init(jax.random.key(0), mel)
    p = variables["params"]

    kw = dict(compute_dtype=jnp.float32)
    pre = generator_apply_fused(p, cfg, mel, truncate=("pre", 0), **kw)
    assert pre.shape == (2, 12, 16)  # conv_pre: model_in_dim -> initial channels
    # transpose conv: out = (L-1)*rate - 2*pad + K, pad = (K-rate)//2
    l0 = (12 - 1) * 5 - 2 * 2 + 10  # 61
    up0 = generator_apply_fused(p, cfg, mel, truncate=("up", 0), **kw)
    mrf0 = generator_apply_fused(p, cfg, mel, truncate=("mrf", 0), **kw)
    assert up0.shape == mrf0.shape == (2, l0, 8)  # C halved per stage
    l1 = (l0 - 1) * 4 - 2 * 2 + 8  # 244
    mrf1 = generator_apply_fused(p, cfg, mel, truncate=("mrf", 1), **kw)
    assert mrf1.shape == (2, l1, 4)
    # the full program equals the module forward (truncate=None unchanged)
    full = generator_apply_fused(p, cfg, mel, **kw)
    ref = gen.apply(variables, mel)
    assert full.shape == ref.shape == (2, l1)  # conv_post K=7 pad=3 keeps length
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_halo_math():
    assert FM.branch_halo(3, (1, 3, 5)) == (1 + 1) + (3 + 1) + (5 + 1)
    assert FM.branch_halo(11, (1, 3, 5)) == (5 + 5) + (15 + 5) + (25 + 5)

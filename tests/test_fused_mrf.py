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


def test_generator_apply_fused_folded_matches_module():
    """Stage-shared phase folding (fold once, run 3 branches prefolded,
    unfold once) must match the module forward exactly like the unfolded
    fused path does."""
    from speech_resynth_tpu.core.precision import FLOAT32
    from speech_resynth_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator, generator_apply_fused

    cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=32,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    gen = HifiGanGenerator(cfg, policy=FLOAT32)
    mel = jnp.asarray(np.random.default_rng(5).standard_normal((2, 12, 8)), jnp.float32)
    variables = gen.init(jax.random.key(0), mel)

    ref = gen.apply(variables, mel)
    got = generator_apply_fused(
        variables["params"], cfg, mel, compute_dtype=jnp.float32, force_fused=True, interpret=True, mrf_fold=4
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("fold", [1, 2, 4, 8])
def test_stage_kernel_matches_reference_mean(fold):
    """Whole-stage fusion: mrf_stage_pallas == mean of the branch references
    across heterogeneous kernel sizes (the production 3/7/11 stage shape)."""
    C, T = 16, 137
    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, T, C)), jnp.float32) * 0.5
    branches = []
    for seed, K in enumerate((3, 7, 11)):
        w1, b1, w2, b2 = make_branch(C, K, seed=seed)
        branches.append((w1, b1, w2, b2, (1, 3, 5)))

    ref = sum(FM.mrf_branch_reference(x, w1, b1, w2, b2, d) for w1, b1, w2, b2, d in branches) / 3.0
    got = FM.mrf_stage_pallas(x, branches, t_blk=128, interpret=True, fold=fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_stage_kernel_prefolded_and_bf16():
    C, T, P = 16, 100, 4
    x = jnp.asarray(np.random.default_rng(8).standard_normal((2, T, C)), jnp.float32) * 0.5
    branches = [(*make_branch(C, K, seed=K), (1, 3, 5)) for K in (3, 11)]

    ref = sum(FM.mrf_branch_reference(x, w1, b1, w2, b2, d) for w1, b1, w2, b2, d in branches) / 2.0
    xf = FM.fold_time(x, P)
    got = FM.unfold_time(
        FM.mrf_stage_pallas(xf, branches, t_blk=128, interpret=True, fold=P, prefolded_len=T), P, T
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    cast = lambda a: a.astype(jnp.bfloat16)
    bf_branches = [(cast(w1), cast(b1), cast(w2), cast(b2), d) for w1, b1, w2, b2, d in branches]
    got_bf = FM.mrf_stage_pallas(cast(x), bf_branches, t_blk=128, interpret=True, fold=P)
    assert got_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got_bf, np.float32), np.asarray(ref), rtol=0.05, atol=0.06)


def test_generator_stage_fusion_off_matches_on():
    """The stage-fusion gate is a pure perf dispatch: outputs with fusion
    forced OFF (per-branch kernels + XLA mean) must equal fusion ON."""
    from speech_resynth_tpu.core.precision import FLOAT32
    from speech_resynth_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator, generator_apply_fused

    cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=32,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    gen = HifiGanGenerator(cfg, policy=FLOAT32)
    mel = jnp.asarray(np.random.default_rng(9).standard_normal((2, 12, 8)), jnp.float32)
    variables = gen.init(jax.random.key(0), mel)

    kw = dict(compute_dtype=jnp.float32, force_fused=True, interpret=True, mrf_fold=4)
    with FM.mrf_stage_fusion(True):
        on = generator_apply_fused(variables["params"], cfg, mel, **kw)
    with FM.mrf_stage_fusion(False):
        off = generator_apply_fused(variables["params"], cfg, mel, **kw)
    ref = gen.apply(variables, mel)
    np.testing.assert_allclose(np.asarray(on), np.asarray(ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(off), np.asarray(ref), rtol=1e-4, atol=1e-5)


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


# ---------------------------------------------------------------------------
# phase-folded (block-Toeplitz) path
# ---------------------------------------------------------------------------


def test_fold_unfold_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 101, 16)), jnp.float32)
    for P in (1, 2, 4, 8):
        xf = FM.fold_time(x, P)
        assert xf.shape == (2, P * 16, -(-101 // P))
        np.testing.assert_array_equal(np.asarray(FM.unfold_time(xf, P, 101)), np.asarray(x))


def test_used_offsets_and_folded_pads():
    # fold=1: exactly the K tap positions (dilation gaps skipped)
    assert FM._used_offsets(3, 5, 1) == (-5, 0, 5)
    # fold >= d: the range [-pad, fold-1+pad] is dense
    assert FM._used_offsets(3, 1, 8) == tuple(range(-1, 9))
    # fold < d: offsets no (p, tap) reaches are skipped (here s = p + 5t - 5
    # with p in [0,4) never hits -1 or 4)
    assert FM._used_offsets(3, 5, 4) == (-5, -4, -3, -2, 0, 1, 2, 3, 5, 6, 7, 8)
    metas = FM._conv_metas(11, (1, 3, 5), 8)
    # folded per-side consumption = ceil(pad / fold)
    assert [m[1] for m in metas] == [1, 2, 4]  # pads 5, 15, 25 at fold 8
    assert metas[0][3] == 1  # conv2 pad 5 -> 1


@pytest.mark.parametrize("packing", ["im2col", "taps", "grouped"])
@pytest.mark.parametrize("P", [2, 4, 8])
@pytest.mark.parametrize("C,K,T", [(16, 3, 100), (16, 11, 137)])
def test_folded_interpret_matches_reference(P, C, K, T, packing):
    w1, b1, w2, b2 = make_branch(C, K)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, T, C)), jnp.float32) * 0.5

    ref = FM.mrf_branch_reference(x, w1, b1, w2, b2, (1, 3, 5))
    got = FM.mrf_branch_pallas(x, w1, b1, w2, b2, (1, 3, 5), t_blk=128, interpret=True, fold=P, packing=packing)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_folded_prefolded_input_matches_reference():
    """The generator folds once per stage and shares the layout across
    branches; the prefolded path must equal fold-inside-the-call."""
    C, K, T, P = 16, 7, 90, 8
    w1, b1, w2, b2 = make_branch(C, K)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, T, C)), jnp.float32) * 0.5

    ref = FM.mrf_branch_reference(x, w1, b1, w2, b2, (1, 3, 5))
    xf = FM.fold_time(x, P)
    got_f = FM.mrf_branch_pallas(
        xf, w1, b1, w2, b2, (1, 3, 5), t_blk=128, interpret=True, fold=P, prefolded_len=T
    )
    assert got_f.shape == xf.shape
    got = FM.unfold_time(got_f, P, T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_folded_bf16_operands():
    C, K, P = 16, 11, 8
    w1, b1, w2, b2 = make_branch(C, K)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 100, C)), jnp.float32) * 0.5
    cast = lambda a: a.astype(jnp.bfloat16)

    ref = FM.mrf_branch_reference(cast(x), cast(w1), cast(b1), cast(w2), cast(b2), (1, 3, 5))
    got = FM.mrf_branch_pallas(
        cast(x), cast(w1), cast(b1), cast(w2), cast(b2), (1, 3, 5), t_blk=128, interpret=True, fold=P
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.06
    )


def test_fold_weight_taps_equals_block_toeplitz_columns():
    """The taps form is the SAME block-Toeplitz matrix, sliced by folded
    column offset q: W_taps[q][p*C+co, r*C+ci] must equal the im2col form's
    entry for offset s = (q-fpad)*P + r (zeros where s is unused)."""
    K, C, P, d = 11, 4, 8, 3
    w = jnp.asarray(np.random.default_rng(9).standard_normal((K, C, C)), jnp.float32)
    pad = (K * d - d) // 2
    fpad = -(-pad // P)
    used = FM._used_offsets(K, d, P)
    w_im = np.asarray(FM._fold_weight(w, P, d, used))
    w_taps = np.asarray(FM._fold_weight_taps(w, P, d, fpad))
    assert w_taps.shape == (2 * fpad + 1, P * C, P * C)
    index = {s: i for i, s in enumerate(used)}
    for qi in range(2 * fpad + 1):
        for r in range(P):
            s = (qi - fpad) * P + r
            blk = w_taps[qi][:, r * C : (r + 1) * C]
            if s in index:
                np.testing.assert_array_equal(blk, w_im[:, index[s] * C : (index[s] + 1) * C])
            else:
                np.testing.assert_array_equal(blk, np.zeros_like(blk))


def test_generator_folded_taps_matches_module():
    """generator_apply_fused with the taps packing table patched in must
    stay waveform-exact."""
    from speech_resynth_tpu.models import hifigan as HG

    cfg = HG.HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=64,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    gen = HG.HifiGanGenerator(cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 23, 8)), jnp.float32)
    variables = gen.init(jax.random.key(0), mel)
    ref = gen.apply(variables, mel)

    orig = dict(FM.MRF_PACK_TABLE)
    FM.MRF_PACK_TABLE.update({16: "taps", 32: "taps"})
    try:
        got = HG.generator_apply_fused(
            variables["params"], cfg, mel, compute_dtype=jnp.float32, force_fused=True, interpret=True, mrf_fold=4
        )
    finally:
        FM.MRF_PACK_TABLE.clear()
        FM.MRF_PACK_TABLE.update(orig)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("K,d", [(3, 1), (11, 3), (3, 5)])
def test_fold_weight_grouped_equals_dense_slices(K, d):
    """Each group's weight must be exactly the dense block-Toeplitz matrix
    restricted to that group's phase rows and offset-block window (zeros
    elsewhere in the window) — the grouped matmuls then sum to the dense one."""
    C, P = 4, 8
    w = jnp.asarray(np.random.default_rng(3).standard_normal((K, C, C)), jnp.float32)
    used = FM._used_offsets(K, d, P)
    plan = FM._group_plan(K, d, P, used, FM.MRF_GROUPS)
    dense = np.asarray(FM._fold_weight(w, P, d, used))
    grouped = np.asarray(FM._fold_weight_grouped(w, P, d, used, plan))
    n_s = len(used)
    for g, (p0, G, lo, span) in enumerate(plan):
        assert 0 <= lo and lo + span <= n_s
        rows = dense[p0 * C : (p0 + G) * C]
        np.testing.assert_array_equal(grouped[g], rows[:, lo * C : (lo + span) * C])
        # nothing of this group's rows lives outside its window
        outside = np.concatenate([rows[:, : lo * C], rows[:, (lo + span) * C :]], axis=1)
        np.testing.assert_array_equal(outside, np.zeros_like(outside))


def test_generator_folded_grouped_matches_module():
    """generator_apply_fused with the grouped packing table patched in must
    stay waveform-exact."""
    from speech_resynth_tpu.models import hifigan as HG

    cfg = HG.HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=64,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    gen = HG.HifiGanGenerator(cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 23, 8)), jnp.float32)
    variables = gen.init(jax.random.key(0), mel)
    ref = gen.apply(variables, mel)

    orig = dict(FM.MRF_PACK_TABLE)
    FM.MRF_PACK_TABLE.update({16: "grouped", 32: "grouped"})
    try:
        got = HG.generator_apply_fused(
            variables["params"], cfg, mel, compute_dtype=jnp.float32, force_fused=True, interpret=True, mrf_fold=4
        )
    finally:
        FM.MRF_PACK_TABLE.clear()
        FM.MRF_PACK_TABLE.update(orig)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fold_weight_block_toeplitz_structure():
    """Every (phase, offset) block is either zeros or exactly one tap's
    (C_out, C_in) matrix transposed."""
    K, C, P, d = 3, 4, 2, 3
    w = jnp.asarray(np.random.default_rng(7).standard_normal((K, C, C)), jnp.float32)
    used = FM._used_offsets(K, d, P)
    wf = np.asarray(FM._fold_weight(w, P, d, used))
    assert wf.shape == (P * C, len(used) * C)
    pad = (K * d - d) // 2
    wt = np.swapaxes(np.asarray(w), 1, 2)
    for p in range(P):
        for i, s in enumerate(used):
            blk = wf[p * C : (p + 1) * C, i * C : (i + 1) * C]
            tap = (s - p + pad) / d
            if tap.is_integer() and 0 <= int(tap) < K:
                np.testing.assert_array_equal(blk, wt[int(tap)])
            else:
                np.testing.assert_array_equal(blk, np.zeros_like(blk))

"""HiFi-GAN parity tests against HF torch (random weights, converted)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models import hifigan as H
from speech_resynth_tpu.models.convert import hifigan_generator_params


def small_config():
    return H.HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )


def hf_config(cfg):
    from transformers import FastSpeech2ConformerHifiGanConfig

    return FastSpeech2ConformerHifiGanConfig(
        model_in_dim=cfg.model_in_dim,
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        normalize_before=False,
    )


def test_generator_matches_hf_torch():
    import torch
    from transformers import FastSpeech2ConformerHifiGan

    cfg = small_config()
    torch_model = FastSpeech2ConformerHifiGan(hf_config(cfg)).eval()

    mel = np.random.default_rng(0).standard_normal((2, 12, cfg.model_in_dim)).astype(np.float32)
    with torch.no_grad():
        theirs = torch_model(torch.from_numpy(mel)).numpy()

    model = H.HifiGanGenerator(cfg, policy=FLOAT32)
    params = hifigan_generator_params(torch_model.state_dict())
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(mel)))

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_waveform_length_formula():
    cfg = H.HifiGanConfig()
    lengths = jnp.asarray([1, 50, 100])
    out = np.asarray(cfg.waveform_lengths(lengths))
    # (L-1)*320 + 400 (reference models.py:240)
    np.testing.assert_array_equal(out, (np.array([1, 50, 100]) - 1) * 320 + 400)
    assert cfg.total_upsample == 320


def test_conv_transpose_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 20, 3)).astype(np.float32)  # NWC
    w = rng.standard_normal((3, 5, 10)).astype(np.float32)  # torch (I, O, K)
    b = rng.standard_normal((5,)).astype(np.float32)

    tconv = torch.nn.ConvTranspose1d(3, 5, 10, stride=4, padding=3)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        theirs = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    ours = np.asarray(H.conv_transpose1d(jnp.asarray(x), jnp.asarray(w.transpose(2, 0, 1)), jnp.asarray(b), 4, 3))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "K,S,P,I,O,L",
    [(10, 5, 2, 32, 16, 37), (9, 4, 2, 24, 12, 23), (8, 4, 2, 32, 16, 50), (4, 2, 1, 16, 8, 11), (5, 1, 2, 8, 8, 13)],
)
def test_conv_transpose_subpixel_matches_dilated(K, S, P, I, O, L):
    """Phase-decomposed (sub-pixel) transposed conv == the zero-stuffed
    lhs_dilation formulation, across the production (K, S) shapes incl. the
    K % S != 0 stage (9, 4) and the stride-1 passthrough."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, L, I)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((K, I, O)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
    ref = np.asarray(H.conv_transpose1d(x, k, b, S, P))
    got = np.asarray(H.conv_transpose1d_subpixel(x, k, b, S, P))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5 * np.abs(ref).max())


def test_discriminators_shapes_and_losses():
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((2, 800)), jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 800)), jnp.float32)

    mpd = H.MultiPeriodDiscriminator(policy=FLOAT32)
    vars_mpd = mpd.init(jax.random.key(0), y, y_hat)
    o_r, o_g, f_r, f_g = mpd.apply(vars_mpd, y, y_hat)
    assert len(o_r) == 5 and len(f_r[0]) == 6

    msd = H.MultiScaleDiscriminator(policy=FLOAT32)
    vars_msd = msd.init(jax.random.key(1), y, y_hat)
    o_r2, o_g2, f_r2, f_g2 = msd.apply(vars_msd, y, y_hat)
    assert len(o_r2) == 3 and len(f_r2[0]) == 8

    d_loss = H.discriminator_loss(o_r + o_r2, o_g + o_g2)
    g_loss = H.generator_loss(o_g + o_g2)
    fm = H.feature_loss(f_r + f_r2, f_g + f_g2)
    for v in (d_loss, g_loss, fm):
        assert np.isfinite(float(v))

    # identical inputs: fm == 0, discriminator pushed toward (1, 0) targets
    o_r3, o_g3, f_r3, f_g3 = msd.apply(vars_msd, y, y)
    assert float(H.feature_loss(f_r3, f_g3)) == 0.0


def test_avg_pool_matches_torch():
    import torch

    x = np.random.default_rng(3).standard_normal((2, 101)).astype(np.float32)
    theirs = torch.nn.AvgPool1d(4, 2, padding=2)(torch.from_numpy(x)[:, None]).numpy()[:, 0]
    ours = np.asarray(H._avg_pool_1d(jnp.asarray(x)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_spectral_norm_power_iteration_updates():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 64)), jnp.float32)
    d = H.DiscriminatorS(use_spectral_norm=True, policy=FLOAT32)
    variables = d.init(jax.random.key(0), x)
    _, new_state = d.apply(variables, x, update_stats=True, mutable=["spectral"])
    # u vectors change after one power iteration
    u_old = jax.tree_util.tree_leaves(variables["spectral"])[0]
    u_new = jax.tree_util.tree_leaves(new_state["spectral"])[0]
    assert not np.allclose(np.asarray(u_old), np.asarray(u_new))

"""Integration tests: DP train step over a fake 8-device mesh, composite
decoder, speech encoder, k-means, graft entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.core.mesh import make_mesh, shard_batch
from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models.cfm import CFMConfig
from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
from speech_resynth_tpu.models.hifigan import HifiGanConfig
from speech_resynth_tpu.models.kmeans import KMeansQuantizer, kmeans_fit
from speech_resynth_tpu.train.cfm import CFMTrainerConfig, make_trainer


def tiny_cfm(**kw):
    base = dict(
        vocab_size=32,
        dim_in=8,
        dim_cond_emb=16,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
    )
    base.update(kw)
    return CFMConfig(**base)


def test_dp_train_step_runs_on_8_device_mesh():
    assert jax.device_count() >= 8
    mesh = make_mesh(data=8)
    cfg = tiny_cfm(predict_duration=True)
    _, state, step_fn, _ = make_trainer(cfg, CFMTrainerConfig(max_norm=0.1), mesh, total_steps=10, policy=FLOAT32)

    rng = np.random.default_rng(0)
    B, L, N = 16, 8, 16
    batch = {
        "input_ids": rng.integers(1, 33, (B, L)).astype(np.int32),
        "duration_labels": np.full((B, L), 2, np.int32),
        "spectrogram_labels": rng.standard_normal((B, N, 8)).astype(np.float32),
    }
    batch = shard_batch(batch, mesh)

    losses = []
    for i in range(3):
        state, metrics = step_fn(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3


def test_frozen_embedding_stays_fixed():
    mesh = make_mesh(data=8)
    cfg = tiny_cfm()
    table = np.random.default_rng(1).standard_normal((33, 16)).astype(np.float32)
    _, state, step_fn, _ = make_trainer(
        cfg, CFMTrainerConfig(max_norm=0.1), mesh, total_steps=10, embedding_table=table, policy=FLOAT32
    )
    rng = np.random.default_rng(2)
    batch = {
        "input_ids": rng.integers(1, 33, (8, 12)).astype(np.int32),
        "duration_labels": np.ones((8, 12), np.int32),
        "spectrogram_labels": rng.standard_normal((8, 12, 8)).astype(np.float32),
    }
    batch = shard_batch(batch, mesh)
    state, _ = step_fn(state, batch, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(state.params["to_cond_emb"]["embedding"]), table)


def test_composite_decoder_end_to_end():
    cfg = tiny_cfm()
    voc = HifiGanConfig(
        model_in_dim=cfg.dim_in,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    decoder = ConditionalFlowMatchingWithHifiGan.from_config(cfg, voc, policy=FLOAT32)

    ids = np.random.default_rng(3).integers(1, 33, (2, 10)).astype(np.int32)
    ids[1, 6:] = 0  # padded row

    outs = decoder(ids, dt=0.5, truncation_value=1.0)
    assert len(outs) == 2
    # waveform length = (L-1)*20 - 2*pads + kernels per the analytic formula
    expect0 = int(voc.waveform_lengths(jnp.asarray([10]))[0])
    expect1 = int(voc.waveform_lengths(jnp.asarray([6]))[0])
    assert outs[0].shape == (1, expect0)
    assert outs[1].shape == (1, expect1)
    assert all(np.all(np.isfinite(o)) for o in outs)


def test_kmeans_fit_recovers_separated_clusters():
    rng = np.random.default_rng(4)
    centers_true = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]], np.float32)
    data = np.concatenate([centers_true[i] + 0.1 * rng.standard_normal((50, 2)) for i in range(3)]).astype(np.float32)

    centers, inertia = kmeans_fit(jax.random.key(0), jnp.asarray(data), k=3, iters=20)
    centers = np.asarray(centers)
    # every true center has a learned center within 0.5
    for c in centers_true:
        assert np.min(np.linalg.norm(centers - c, axis=1)) < 0.5
    assert float(inertia) < 10.0

    q = KMeansQuantizer(jnp.asarray(centers))
    ids = np.asarray(q(jnp.asarray(data)))
    assert len(np.unique(ids)) == 3
    table = q.embedding_table()
    assert table.shape == (4, 2)
    np.testing.assert_array_equal(table[0], 0)


def test_speech_encoder_random_init_smoke():
    from speech_resynth_tpu.models.hubert import HubertConfig
    from speech_resynth_tpu.models import speech_encoder as SE

    # shrink the tower for CPU
    SE.DENSE_MODELS["_test_tiny"] = {
        "config": HubertConfig(
            hidden_size=16,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=24,
            conv_dim=(8, 8),
            conv_kernel=(10, 4),
            conv_stride=(5, 4),
            num_conv_pos_embeddings=8,
            num_conv_pos_embedding_groups=2,
        ),
        "output_layer": 1,
    }
    enc = SE.SpeechEncoder.by_name("_test_tiny", "kmeans", 7, deduplicate=True, policy=FLOAT32)
    wav = np.random.default_rng(5).standard_normal(2000).astype(np.float32) * 0.1
    out = enc(wav)
    n = out["num_units"]
    assert n >= 1
    units = np.asarray(out["units"])
    assert np.all(units < 7) and np.all(units >= 0)
    assert np.all(np.asarray(out["durations"]) >= 1)
    # deduplicated: no consecutive repeats
    assert np.all(units[1:] != units[:-1]) if len(units) > 1 else True
    assert int(np.asarray(out["durations"]).sum()) == enc.encoder.config.num_frames(2000)


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)

"""Serving pipeline tests: bucketing, ordering, partial batches, trimming."""

import numpy as np
import pytest

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models.cfm import CFMConfig
from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
from speech_resynth_tpu.models.hifigan import HifiGanConfig
from speech_resynth_tpu.pipeline.serving import SynthesisRequest, SynthesisServer


@pytest.fixture(scope="module")
def server():
    cfm = CFMConfig(
        vocab_size=9,
        dim_in=8,
        dim_cond_emb=12,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
    )
    voc = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    decoder = ConditionalFlowMatchingWithHifiGan.from_config(cfm, voc, policy=FLOAT32)
    return SynthesisServer(decoder, batch_size=2, dt=0.5, length_multiple=8, pcm16=True)


def test_synthesize_many_orders_and_trims(server):
    rng = np.random.default_rng(0)
    seqs = [rng.integers(1, 10, n).astype(np.int32) for n in (5, 9, 3, 7, 6)]  # 5 reqs, batch 2 -> partial batch
    wavs = server.synthesize_many(seqs)
    assert len(wavs) == 5
    voc_cfg = server.decoder.vocoder.config
    import jax.numpy as jnp

    for seq, wav in zip(seqs, wavs):
        expected = int(voc_cfg.waveform_lengths(jnp.asarray([len(seq)]))[0])
        assert wav.shape == (expected,)
        assert wav.dtype == np.int16


def test_stream_returns_all_ids(server):
    rng = np.random.default_rng(1)
    reqs = [SynthesisRequest(rng.integers(1, 10, 4).astype(np.int32), request_id=100 + i) for i in range(4)]
    got = dict(server.synthesize_stream(reqs))
    assert sorted(got.keys()) == [100, 101, 102, 103]


def test_bucketing_limits_shapes(server):
    # lengths 3 and 5 both bucket to 8 -> same compiled program
    ids_a, _ = server._collate([SynthesisRequest(np.ones(3, np.int32)), SynthesisRequest(np.ones(5, np.int32))])
    ids_b, _ = server._collate([SynthesisRequest(np.ones(8, np.int32)), SynthesisRequest(np.ones(2, np.int32))])
    assert ids_a.shape == ids_b.shape == (2, 8)

"""HuBERT encoder parity test against HF torch (random weights, converted)."""

import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models import hubert as HB
from speech_resynth_tpu.models.convert import hubert_params


def tiny_cfg():
    return HB.HubertConfig(
        hidden_size=24,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=48,
        conv_dim=(12, 12, 12),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )


def hf_model(cfg):
    import torch
    from transformers import HubertConfig as HFHubertConfig, HubertModel

    torch.manual_seed(0)
    return HubertModel(
        HFHubertConfig(
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            conv_dim=list(cfg.conv_dim),
            conv_kernel=list(cfg.conv_kernel),
            conv_stride=list(cfg.conv_stride),
            num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
            feat_extract_norm="group",
            conv_bias=False,
            do_stable_layer_norm=False,
            hidden_dropout=0.0,
            attention_dropout=0.0,
            feat_proj_dropout=0.0,
            layerdrop=0.0,
            attn_implementation="eager",
        )
    ).eval()


def test_hidden_states_match_hf():
    import torch

    cfg = tiny_cfg()
    torch_model = hf_model(cfg)
    wav = np.random.default_rng(0).standard_normal((2, 400)).astype(np.float32) * 0.1

    with torch.no_grad():
        theirs = torch_model(torch.from_numpy(wav)).last_hidden_state.numpy()

    model = HB.HubertEncoder(cfg, policy=FLOAT32, attn_implementation="xla")
    params = hubert_params(torch_model.state_dict())
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(wav)))

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_intermediate_layer_output():
    cfg = tiny_cfg()
    torch_model = hf_model(cfg)
    import torch

    wav = np.random.default_rng(1).standard_normal((1, 400)).astype(np.float32) * 0.1
    with torch.no_grad():
        hs = torch_model(torch.from_numpy(wav), output_hidden_states=True).hidden_states
        theirs = hs[1].numpy()  # after layer 1 (1-indexed hidden_states[0] is input)

    model = HB.HubertEncoder(cfg, policy=FLOAT32, attn_implementation="xla")
    params = hubert_params(torch_model.state_dict())
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(wav), output_layer=1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_frame_count_math():
    cfg = HB.HubertConfig()
    assert cfg.total_stride == 320
    # 1 second of 16 kHz audio -> 49 frames (valid conv, no padding)
    assert cfg.num_frames(16000) == 49


def test_wav2vec2_checkpoints_convert_and_match():
    """HF Wav2Vec2Model (UTMOS's SSL backbone) shares HubertModel's state
    dict layout exactly — hubert_params converts its checkpoints and our
    tower reproduces its hidden states (wav2vec2-base arch = config here)."""
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = tiny_cfg()
    torch.manual_seed(3)
    torch_model = Wav2Vec2Model(
        Wav2Vec2Config(
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            conv_dim=list(cfg.conv_dim),
            conv_kernel=list(cfg.conv_kernel),
            conv_stride=list(cfg.conv_stride),
            num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
            feat_extract_norm="group",
            conv_bias=False,
            do_stable_layer_norm=False,
            hidden_dropout=0.0,
            attention_dropout=0.0,
            feat_proj_dropout=0.0,
            layerdrop=0.0,
            attn_implementation="eager",
        )
    ).eval()

    wav = np.random.default_rng(5).standard_normal((1, 400)).astype(np.float32) * 0.1
    import torch as _t

    with _t.no_grad():
        theirs = torch_model(_t.from_numpy(wav)).last_hidden_state.numpy()

    model = HB.HubertEncoder(cfg, policy=FLOAT32, attn_implementation="xla")
    params = hubert_params(torch_model.state_dict())
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(wav)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_ragged_batch_units_match_unpadded():
    """Padded-batch unit extraction with lengths equals per-row unpadded runs
    exactly (masked conv/group norms + zeroed pad features + masked
    attention in the tower)."""
    import jax
    import jax.numpy as jnp

    from speech_resynth_tpu.models.kmeans import KMeansQuantizer
    from speech_resynth_tpu.models.speech_encoder import SpeechEncoder

    cfg = tiny_cfg()
    enc = HB.HubertEncoder(cfg, policy=FLOAT32, attn_implementation="xla")
    rng = np.random.default_rng(7)
    wav_full = rng.standard_normal((2, 800)).astype(np.float32) * 0.1
    variables = enc.init(jax.random.key(0), jnp.asarray(wav_full))
    centers = rng.standard_normal((5, cfg.hidden_size)).astype(np.float32)
    se = SpeechEncoder(
        encoder=enc,
        variables=variables,
        quantizer=KMeansQuantizer(jnp.asarray(centers)),
        output_layer=cfg.num_hidden_layers,
    )

    lens = [800, 500]
    padded_out = se(wav_full, lengths=np.asarray(lens))
    for b, n in enumerate(lens):
        solo = se(wav_full[b, :n])
        k = int(solo["num_units"])
        assert int(padded_out["num_units"][b]) >= k
        np.testing.assert_array_equal(np.asarray(padded_out["units"][b, :k]), np.asarray(solo["units"]))

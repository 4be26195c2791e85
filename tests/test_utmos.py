"""Native UTMOS MOS predictor: parity vs a torch oracle of the public
strong-learner architecture (SURVEY.md C23).

The oracle is assembled in-test from the same building blocks the UTMOS-demo
space uses — an HF Wav2Vec2Model SSL backbone (state-dict-identical to the
fairseq wav2vec_small the demo loads), domain + judge nn.Embeddings, one
bidirectional nn.LSTM, and a Linear/ReLU/Dropout/Linear head — and its
weights are exported in the demo's lightning state-dict key layout so the
test exercises models/convert.py:utmos_params end-to-end (fairseq SSL key
naming included).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models import utmos as UT
from speech_resynth_tpu.models.convert import utmos_params
from speech_resynth_tpu.models.hubert import HubertConfig


def tiny_ssl_cfg():
    # hidden 64 with 1 head so config_from_params' hidden//64 inference holds
    return HubertConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=1,
        intermediate_size=128,
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )


def _hf_ssl(cfg):
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(7)
    return Wav2Vec2Model(
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


def _hf_to_fairseq_ssl_keys(sd):
    """HF Wav2Vec2Model state-dict names -> fairseq Wav2Vec2Model names (the
    layout inside the UTMOS lightning checkpoint)."""
    out = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("feature_projection.layer_norm", "layer_norm")
        nk = nk.replace("feature_projection.projection", "post_extract_proj")
        nk = nk.replace("encoder.pos_conv_embed.conv", "encoder.pos_conv.0")
        nk = nk.replace(".attention.out_proj", ".self_attn.out_proj")
        nk = nk.replace(".attention.", ".self_attn.")
        nk = nk.replace(".feed_forward.intermediate_dense", ".fc1")
        nk = nk.replace(".feed_forward.output_dense", ".fc2")
        if ".conv_layers." in nk:
            nk = nk.replace(".conv.weight", ".0.weight")
            nk = nk.replace(".layer_norm.weight", ".2.weight")
            nk = nk.replace(".layer_norm.bias", ".2.bias")
        # HF block layer_norm (post-attention) -> fairseq self_attn_layer_norm;
        # careful not to touch encoder.layer_norm / final_layer_norm
        import re

        nk = re.sub(r"(encoder\.layers\.\d+)\.layer_norm\.", r"\1.self_attn_layer_norm.", nk)
        if nk.startswith("masked_spec_embed"):
            continue
        out[nk] = v
    return out


class _TorchOracle:
    """The UTMOS strong-learner forward, composed from torch primitives."""

    def __init__(self, ssl_cfg, num_domains=3, domain_dim=8, num_judges=10, judge_dim=8, lstm_hidden=16, proj_hidden=32):
        import torch

        torch.manual_seed(11)
        self.ssl = _hf_ssl(ssl_cfg)
        d_in = ssl_cfg.hidden_size + domain_dim + judge_dim
        self.domain_embedding = torch.nn.Embedding(num_domains, domain_dim)
        self.judge_embedding = torch.nn.Embedding(num_judges, judge_dim)
        self.decoder_rnn = torch.nn.LSTM(
            input_size=d_in, hidden_size=lstm_hidden, num_layers=1, batch_first=True, bidirectional=True
        )
        self.net = torch.nn.Sequential(
            torch.nn.Linear(2 * lstm_hidden, proj_hidden),
            torch.nn.ReLU(),
            torch.nn.Dropout(0.0),
            torch.nn.Linear(proj_hidden, 1),
        )

    def score(self, wav, domain_id, judge_id):
        import torch

        with torch.no_grad():
            x = self.ssl(torch.from_numpy(wav[None])).last_hidden_state  # (1, T, H)
            T = x.shape[1]
            dom = self.domain_embedding(torch.tensor([domain_id]))[:, None, :].expand(-1, T, -1)
            judge = self.judge_embedding(torch.tensor([judge_id]))[:, None, :].expand(-1, T, -1)
            h, _ = self.decoder_rnn(torch.cat([x, dom, judge], dim=2))
            s = self.net(h)[..., 0]
            return float(s.mean() * 2 + 3)

    def lightning_state_dict(self):
        sd = {}
        for k, v in _hf_to_fairseq_ssl_keys(self.ssl.state_dict()).items():
            sd[f"model.feature_extractors.0.ssl_model.{k}"] = v
        sd["model.feature_extractors.1.embedding.weight"] = self.domain_embedding.weight.detach()
        sd["model.output_layers.0.judge_embedding.weight"] = self.judge_embedding.weight.detach()
        for k, v in self.decoder_rnn.state_dict().items():
            sd[f"model.output_layers.0.decoder_rnn.{k}"] = v
        for idx in (0, 3):
            sd[f"model.output_layers.1.net.{idx}.weight"] = self.net[idx].weight.detach()
            sd[f"model.output_layers.1.net.{idx}.bias"] = self.net[idx].bias.detach()
        return sd


def test_bilstm_matches_torch_with_lengths():
    import torch

    torch.manual_seed(3)
    B, T, D, H = 3, 12, 6, 5
    rnn = torch.nn.LSTM(input_size=D, hidden_size=H, num_layers=1, batch_first=True, bidirectional=True)
    x = np.random.default_rng(0).standard_normal((B, T, D)).astype(np.float32)
    lengths = np.array([12, 7, 1], np.int32)

    params = {}
    sd = rnn.state_dict()
    from speech_resynth_tpu.models.convert import _torch_lstm_dir

    params.update(_torch_lstm_dir(sd, "", "fwd"))
    params.update(_torch_lstm_dir(sd, "", "bwd"))
    params = {k: v for k, v in params.items()}

    model = UT.BiLSTM(H)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x), lengths=jnp.asarray(lengths)))

    # torch oracle: run each row unpadded
    for b in range(B):
        with torch.no_grad():
            theirs, _ = rnn(torch.from_numpy(x[b : b + 1, : lengths[b]]))
        np.testing.assert_allclose(ours[b, : lengths[b]], theirs[0].numpy(), rtol=1e-4, atol=1e-5)


def test_utmos_matches_torch_oracle_batched_padded():
    cfg = tiny_ssl_cfg()
    oracle = _TorchOracle(cfg)
    params = utmos_params(oracle.lightning_state_dict())
    ucfg = UT.config_from_params(params)
    assert ucfg.ssl.hidden_size == cfg.hidden_size
    assert ucfg.ssl.conv_stride == cfg.conv_stride
    assert ucfg.num_judges == 10 and ucfg.lstm_hidden == 16

    model = UT.UTMOSPredictor(ucfg, policy=FLOAT32)
    rng = np.random.default_rng(1)
    lens = [1600, 1200, 800]
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lens]
    padded = np.zeros((3, max(lens)), np.float32)
    for i, w in enumerate(wavs):
        padded[i, : len(w)] = w
    n_samples = jnp.asarray(lens, jnp.int32)
    n_frames = jnp.asarray([ucfg.ssl.num_frames(n) for n in lens], jnp.int32)
    dom = jnp.asarray([0, 1, 2], jnp.int32)
    judge = jnp.asarray([3, 0, 9], jnp.int32)

    frames = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(padded), dom, judge, num_samples=n_samples
    )
    ours = np.asarray(UT.UTMOSPredictor.score_from_frames(frames, num_frames=n_frames))

    theirs = np.array(
        [oracle.score(wavs[i], int(dom[i]), int(judge[i])) for i in range(3)], np.float32
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_native_utmos_scorer_roundtrip(tmp_path):
    """NativeUTMOS loads a lightning-format .ckpt and matches the oracle's
    demo-parity scoring call (domain 0, mean-listener judge)."""
    import torch

    cfg = tiny_ssl_cfg()
    oracle = _TorchOracle(cfg)
    ckpt = tmp_path / "utmos.ckpt"
    torch.save({"state_dict": oracle.lightning_state_dict()}, ckpt)

    from speech_resynth_tpu.pipeline.scorers import NativeUTMOS

    scorer = NativeUTMOS(str(ckpt), domain_id=0, judge_id=5, policy=FLOAT32)
    wav = np.random.default_rng(2).standard_normal(2000).astype(np.float32) * 0.1
    ours = scorer.score(wav)
    theirs = oracle.score(wav, 0, 5)
    assert abs(ours - theirs) < 2e-3


def test_default_mos_selects_native_utmos_from_config(tmp_path):
    """The evaluate stage's config path (eval.utmos_ckpt) must construct
    NativeUTMOS for a lightning .ckpt — the TPU-native scorer, not the
    torchscript fallback or EnergyMOS."""
    import torch

    from speech_resynth_tpu.core.config import config_from_dict
    from speech_resynth_tpu.pipeline.scorers import NativeUTMOS, default_mos

    oracle = _TorchOracle(tiny_ssl_cfg())
    ckpt = tmp_path / "utmos.ckpt"
    torch.save({"state_dict": oracle.lightning_state_dict()}, ckpt)

    cfg = config_from_dict({"eval": {"utmos_ckpt": str(ckpt)}})
    mos = default_mos(cfg)
    assert isinstance(mos, NativeUTMOS)
    wav = np.random.default_rng(3).standard_normal(1800).astype(np.float32) * 0.1
    s = mos.score(wav)
    assert np.isfinite(s)
    # demo-parity ids: domain 0, mean-listener judge clamped into the table
    assert mos.domain_id == 0 and mos.judge_id == 9


def test_utmos_safetensors_export_roundtrip(tmp_path):
    """The egress-host export path (scripts/convert_checkpoints.py utmos ->
    safetensors) loads through NativeUTMOS without torch unpickling and
    matches the direct-ckpt scorer."""
    import sys
    from pathlib import Path as _P

    import torch

    sys.path.insert(0, str(_P(__file__).parent.parent / "scripts"))
    from convert_checkpoints import convert_utmos

    from speech_resynth_tpu.pipeline.scorers import NativeUTMOS

    oracle = _TorchOracle(tiny_ssl_cfg())
    ckpt = tmp_path / "utmos.ckpt"
    torch.save({"state_dict": oracle.lightning_state_dict()}, ckpt)
    st = tmp_path / "utmos.safetensors"
    convert_utmos(str(ckpt), str(st))

    wav = np.random.default_rng(9).standard_normal(2400).astype(np.float32) * 0.1
    a = NativeUTMOS(str(ckpt), policy=FLOAT32).score(wav)
    b = NativeUTMOS(str(st), policy=FLOAT32).score(wav)
    assert abs(a - b) < 1e-5

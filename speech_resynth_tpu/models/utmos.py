"""TPU-native UTMOS MOS predictor (the reference's eval-only C23 component).

The reference clones the sarulab-speech UTMOS-demo HF space and calls
``Score(ckpt, 16000, device).score(wav)`` (reference
src/flow_matching/train.py:18-21, eval.py:16-19; SURVEY.md C23).  That
strong-learner architecture is public: a fairseq wav2vec2-small SSL backbone
(features_only), a data-domain embedding and a listener ("judge") embedding
concatenated onto the frame features, a single bidirectional LSTM, and a
2-layer ReLU projection head producing a per-frame score; the utterance MOS
is the frame mean mapped through ``*2 + 3`` with domain id 0 and the
mean-listener judge id 288.

TPU design notes:
  * the SSL tower is our HuBERT/wav2vec2 encoder (models/hubert.py — the two
    HF state-dict layouts are identical, locked by
    tests/test_hubert.py::test_wav2vec2_checkpoints_convert_and_match), so
    attention runs on the shared flash-kernel dispatch and the conv frontend
    on MXU convs;
  * the BiLSTM is two ``lax.scan`` passes at 50 Hz frame rate (sequential by
    nature but trivially small: 2 x T steps of (B, 1024->2048) matmuls);
    padding is handled by per-row reversal so the backward pass never leaks
    pad frames into the valid region;
  * scoring is one jitted program per padded bucket length.

Weight conversion from the published lightning checkpoint (fairseq-named SSL
keys) lives in models/convert.py:utmos_params / fairseq_wav2vec2_params.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT
from .hubert import HubertConfig, HubertEncoder


@dataclasses.dataclass(frozen=True)
class UTMOSConfig:
    ssl: HubertConfig = HubertConfig()  # wav2vec2-base == HuBERT-base layout
    num_domains: int = 3
    domain_dim: int = 128
    num_judges: int = 3280
    judge_dim: int = 128
    lstm_hidden: int = 512
    projection_hidden: int = 2048
    # score.py parity: domain 0 + mean-listener judge at inference
    default_domain_id: int = 0
    default_judge_id: int = 288


def _lstm_scan(x, w_ih, w_hh, bias, reverse_lengths=None):
    """Unidirectional LSTM over (B, T, D) with torch gate packing [i, f, g, o].

    ``reverse_lengths``: if given, each row b is reversed over its first
    ``reverse_lengths[b]`` frames before scanning and un-reversed after, so a
    backward pass over right-padded sequences starts at the true last frame.
    Pad positions produce garbage that stays in the pad region.
    """
    B, T, _ = x.shape
    H = w_hh.shape[0]

    def rev(v, lengths):
        t = jnp.arange(T)[None, :]
        idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
        return jnp.take_along_axis(v, idx[..., None], axis=1)

    if reverse_lengths is not None:
        x = rev(x, reverse_lengths)

    xw = jnp.einsum("btd,dh->bth", x, w_ih) + bias  # (B, T, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(xw, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)

    if reverse_lengths is not None:
        hs = rev(hs, reverse_lengths)
    return hs


class BiLSTM(nn.Module):
    """Bidirectional single-layer LSTM, torch nn.LSTM weight layout.

    Params per direction: ``w_ih`` (D, 4H), ``w_hh`` (H, 4H), ``bias`` (4H,)
    (torch's bias_ih + bias_hh are summed at conversion time).
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array, lengths: Optional[jax.Array] = None) -> jax.Array:
        D, H = x.shape[-1], self.hidden_size
        glorot = nn.initializers.glorot_uniform()
        zeros = nn.initializers.zeros
        fwd = _lstm_scan(
            x,
            self.param("w_ih_fwd", glorot, (D, 4 * H), jnp.float32),
            self.param("w_hh_fwd", glorot, (H, 4 * H), jnp.float32),
            self.param("bias_fwd", zeros, (4 * H,), jnp.float32),
        )
        if lengths is None:
            lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
        bwd = _lstm_scan(
            x,
            self.param("w_ih_bwd", glorot, (D, 4 * H), jnp.float32),
            self.param("w_hh_bwd", glorot, (H, 4 * H), jnp.float32),
            self.param("bias_bwd", zeros, (4 * H,), jnp.float32),
            reverse_lengths=lengths,
        )
        return jnp.concatenate([fwd, bwd], axis=-1)


class UTMOSPredictor(nn.Module):
    """wav -> per-frame quality score (pre-denormalization).

    ``score_from_frames`` turns the masked frame mean into the published MOS
    scale (*2 + 3), matching the demo's denormalization.
    """

    config: UTMOSConfig = UTMOSConfig()
    policy: Policy = DEFAULT
    attn_implementation: str = "auto"

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,
        domain_id: jax.Array,
        judge_id: jax.Array,
        num_samples: Optional[jax.Array] = None,
    ) -> jax.Array:
        """(B, T) 16 kHz waveform -> (B, T//320) frame scores.

        ``num_samples``: valid wav samples per row for right-padded batches;
        threads exact mask discipline through the SSL tower and keeps the
        backward LSTM pass off the pad frames.  Valid-frame scores equal the
        demo's per-utterance (batch-1, unpadded) scoring exactly.
        """
        cfg = self.config
        num_frames = None if num_samples is None else cfg.ssl.num_frames(num_samples)
        ssl = HubertEncoder(cfg.ssl, self.policy, self.attn_implementation, name="ssl")(
            wav, num_samples=num_samples
        )
        ssl = ssl.astype(jnp.float32)
        B, T, _ = ssl.shape

        dom = nn.Embed(cfg.num_domains, cfg.domain_dim, param_dtype=jnp.float32, name="domain_embedding")(domain_id)
        judge = nn.Embed(cfg.num_judges, cfg.judge_dim, param_dtype=jnp.float32, name="judge_embedding")(judge_id)
        x = jnp.concatenate(
            [ssl, jnp.broadcast_to(dom[:, None, :], (B, T, cfg.domain_dim)), jnp.broadcast_to(judge[:, None, :], (B, T, cfg.judge_dim))],
            axis=-1,
        )

        x = BiLSTM(cfg.lstm_hidden, name="decoder_rnn")(x, lengths=num_frames)
        x = nn.Dense(cfg.projection_hidden, param_dtype=jnp.float32, name="proj_in")(x)
        x = jax.nn.relu(x)
        x = nn.Dense(1, param_dtype=jnp.float32, name="proj_out")(x)
        return x[..., 0]

    @staticmethod
    def score_from_frames(frame_scores: jax.Array, num_frames: Optional[jax.Array] = None) -> jax.Array:
        """Masked frame mean -> MOS in [1, 5] scale (demo: mean * 2 + 3)."""
        if num_frames is None:
            mean = jnp.mean(frame_scores, axis=-1)
        else:
            T = frame_scores.shape[-1]
            mask = jnp.arange(T)[None, :] < num_frames[:, None]
            mean = jnp.sum(frame_scores * mask, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1)
        return mean * 2.0 + 3.0


def config_from_params(params, conv_stride=None) -> UTMOSConfig:
    """Infer a UTMOSConfig from a converted param tree (shapes carry every
    hyperparameter except conv strides and head count; strides default to the
    wav2vec2-base schedule, heads to hidden/64 — both true for every
    published UTMOS checkpoint)."""
    ssl = params["ssl"]
    fe = ssl["feature_extractor"]
    n_conv = len(fe)
    kernels = tuple(fe[f"conv_layers_{i}"]["kernel"].shape[0] for i in range(n_conv))
    dims = tuple(fe[f"conv_layers_{i}"]["kernel"].shape[2] for i in range(n_conv))
    if conv_stride is None:
        conv_stride = (5,) + (2,) * (n_conv - 1)
    hidden = ssl["feature_projection_dense"]["kernel"].shape[1]
    pos_k, pos_in, _ = ssl["pos_conv_kernel"].shape
    n_layers = sum(1 for k in ssl if k.startswith("layers_"))
    ssl_cfg = HubertConfig(
        hidden_size=hidden,
        num_hidden_layers=n_layers,
        num_attention_heads=max(1, hidden // 64),
        intermediate_size=ssl["layers_0"]["ff_in"]["kernel"].shape[1],
        conv_dim=dims,
        conv_kernel=kernels,
        conv_stride=tuple(conv_stride),
        num_conv_pos_embeddings=pos_k,
        num_conv_pos_embedding_groups=hidden // pos_in,
        do_normalize=False,  # wav2vec_small: normalize=False
    )
    return UTMOSConfig(
        ssl=ssl_cfg,
        num_domains=params["domain_embedding"]["embedding"].shape[0],
        domain_dim=params["domain_embedding"]["embedding"].shape[1],
        num_judges=params["judge_embedding"]["embedding"].shape[0],
        judge_dim=params["judge_embedding"]["embedding"].shape[1],
        lstm_hidden=params["decoder_rnn"]["w_hh_fwd"].shape[0],
        projection_hidden=params["proj_in"]["kernel"].shape[1],
    )

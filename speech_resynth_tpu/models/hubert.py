"""HuBERT / mHuBERT dense speech encoder.

Capability parity with the textlesslib+fairseq encoders the reference depends
on (/root/reference/src/flow_matching/utils/textless.py:9-21;
``hubert-base-ls960`` and ``mhubert-base-vp_mls_cv_8lang``): 16 kHz waveform
-> 7-layer strided conv feature extractor (x320 downsample, 50 Hz frames)
-> feature projection -> 12-layer post-LN transformer -> layer-k hidden
states (768-d) consumed by the k-means quantizer.

Architecture matches HF ``HubertModel`` base configs (group-norm on the first
conv layer, conv_bias=False, weight-normed conv positional embedding k=128
groups=16, post-layer-norm encoder blocks) so HF torch checkpoints convert
directly (models/convert.py:hubert_params).

TPU design: the conv frontend is a chain of NWC ``conv_general_dilated`` ops
(XLA maps them onto the MXU); attention uses the shared flash kernel.  The
whole tower jit-compiles to one program per padded bucket length.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT
from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    do_normalize: bool = False  # wav zero-mean/unit-var (False for base ckpts)

    @property
    def total_stride(self) -> int:
        out = 1
        for s in self.conv_stride:
            out *= s
        return out

    def num_frames(self, num_samples: int) -> int:
        n = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


class ConvFeatureExtractor(nn.Module):
    """Strided conv stack; first layer group-normed (HF 'group' norm mode).

    ``num_samples``: valid wav samples per row for right-padded ragged
    batches.  Because every conv is VALID and local, masking the group-norm
    statistics to valid frames and zeroing pad frames after each layer makes
    the valid-frame outputs EXACTLY equal to running each row unpadded —
    which is how the torch reference stacks (batch-1 loops) behave.
    """

    config: HubertConfig
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, wav: jax.Array, num_samples: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        x = wav[..., None].astype(jnp.float32)  # (B, T, 1)
        lengths = num_samples
        for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
            if lengths is not None:
                lengths = (lengths - k) // s + 1
            x = _ConvLayer(dim, k, s, use_group_norm=(i == 0), policy=self.policy, name=f"conv_layers_{i}")(
                x, lengths=lengths
            )
        return x


class _ConvLayer(nn.Module):
    features: int
    kernel_size: int
    stride: int
    use_group_norm: bool
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x, lengths=None):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (self.kernel_size, in_ch, self.features), self.policy.param_dtype
        )
        x = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            kernel.astype(jnp.float32),
            (self.stride,),
            "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        mask = None
        if lengths is not None:
            mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])[..., None]  # (B, T, 1)
        if self.use_group_norm:
            # GroupNorm(groups=C, channels=C): per-channel instance norm over time
            scale = self.param("norm_scale", nn.initializers.ones, (self.features,), self.policy.param_dtype)
            bias = self.param("norm_bias", nn.initializers.zeros, (self.features,), self.policy.param_dtype)
            if mask is None:
                mean = jnp.mean(x, axis=1, keepdims=True)
                var = jnp.var(x, axis=1, keepdims=True)
            else:
                count = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1).astype(x.dtype)
                mean = jnp.sum(x * mask, axis=1, keepdims=True) / count
                var = jnp.sum(jnp.square(x - mean) * mask, axis=1, keepdims=True) / count
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            x = x * scale + bias
        x = jax.nn.gelu(x, approximate=False)
        if mask is not None:
            x = jnp.where(mask, x, 0.0)
        return x


class HubertLayer(nn.Module):
    """Post-LN transformer block (HF do_stable_layer_norm=False)."""

    config: HubertConfig
    policy: Policy = DEFAULT
    attn_implementation: str = "auto"

    def _dense(self, features, name, dtype=None):
        return nn.Dense(
            features,
            use_bias=True,
            param_dtype=self.policy.param_dtype,
            dtype=dtype or self.policy.compute_dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.config
        b, n, _ = x.shape
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h

        residual = x
        q = self._dense(cfg.hidden_size, "q_proj")(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = self._dense(cfg.hidden_size, "k_proj")(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        v = self._dense(cfg.hidden_size, "v_proj")(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        attn = dot_product_attention(q, k, v, mask=mask, implementation=self.attn_implementation)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden_size)
        x = residual + self._dense(cfg.hidden_size, "o_proj")(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=self.policy.param_dtype, name="attn_norm")(x)

        residual = x
        hmid = jax.nn.gelu(self._dense(cfg.intermediate_size, "ff_in")(x), approximate=False)
        x = residual + self._dense(cfg.hidden_size, "ff_out")(hmid)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=self.policy.param_dtype, name="ff_norm")(x)
        return x


class HubertEncoder(nn.Module):
    config: HubertConfig = HubertConfig()
    policy: Policy = DEFAULT
    attn_implementation: str = "auto"

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,
        frame_mask: Optional[jax.Array] = None,
        output_layer: Optional[int] = None,
        num_samples: Optional[jax.Array] = None,
    ) -> jax.Array:
        """(B, T) 16 kHz waveform -> (B, T//320, 768) hidden states.

        ``output_layer``: 1-indexed transformer layer whose output to return
        (textlesslib convention, e.g. 11 for mhubert kmeans-expresso); None
        runs all layers.

        ``num_samples``: valid sample count per row for right-padded ragged
        batches.  Threads exact mask discipline end-to-end (masked wav/conv
        norms, zeroed pad features before the zero-padding positional conv,
        masked attention) so valid-frame outputs match unpadded per-row runs
        exactly; derives ``frame_mask`` when it isn't given.
        """
        cfg = self.config
        sample_mask = None
        if num_samples is not None:
            sample_mask = jnp.arange(wav.shape[-1])[None, :] < num_samples[:, None]
            if frame_mask is None:
                n_frames = cfg.num_frames(num_samples)
                frame_mask = jnp.arange(cfg.num_frames(wav.shape[-1]))[None, :] < n_frames[:, None]
        if cfg.do_normalize:
            if sample_mask is None:
                mean = jnp.mean(wav, axis=-1, keepdims=True)
                var = jnp.var(wav, axis=-1, keepdims=True)
            else:
                count = jnp.maximum(jnp.sum(sample_mask, axis=-1, keepdims=True), 1).astype(wav.dtype)
                mean = jnp.sum(wav * sample_mask, axis=-1, keepdims=True) / count
                var = jnp.sum(jnp.square(wav - mean) * sample_mask, axis=-1, keepdims=True) / count
            wav = (wav - mean) * jax.lax.rsqrt(var + 1e-7)
            if sample_mask is not None:
                wav = jnp.where(sample_mask, wav, 0.0)

        feats = ConvFeatureExtractor(cfg, self.policy, name="feature_extractor")(wav, num_samples=num_samples)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=self.policy.param_dtype, name="feature_projection_norm")(
            feats
        )
        x = nn.Dense(
            cfg.hidden_size,
            param_dtype=self.policy.param_dtype,
            dtype=jnp.float32,
            name="feature_projection_dense",
        )(x)
        if frame_mask is not None:
            # zero pad frames so the zero-padded positional conv sees exactly
            # the same neighborhood an unpadded per-row run would
            x = jnp.where(frame_mask[..., None], x, 0.0)

        # conv positional embedding: k=128 groups=16, pad 64, drop last frame
        pos_kernel = self.param(
            "pos_conv_kernel",
            nn.initializers.he_normal(),
            (cfg.num_conv_pos_embeddings, cfg.hidden_size // cfg.num_conv_pos_embedding_groups, cfg.hidden_size),
            self.policy.param_dtype,
        )
        pos_bias = self.param("pos_conv_bias", nn.initializers.zeros, (cfg.hidden_size,), self.policy.param_dtype)
        pad = cfg.num_conv_pos_embeddings // 2
        pos = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            pos_kernel.astype(jnp.float32),
            (1,),
            [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=cfg.num_conv_pos_embedding_groups,
        ) + pos_bias
        if cfg.num_conv_pos_embeddings % 2 == 0:
            pos = pos[:, :-1]
        x = x + jax.nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=self.policy.param_dtype, name="encoder_norm")(x)
        x = x.astype(self.policy.compute_dtype)

        num_layers = output_layer if output_layer is not None else cfg.num_hidden_layers
        for i in range(num_layers):
            x = HubertLayer(cfg, self.policy, self.attn_implementation, name=f"layers_{i}")(x, mask=frame_mask)
        return self.policy.cast_to_output(x)

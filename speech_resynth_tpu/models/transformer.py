"""Velocity-field transformer for conditional flow matching.

Behavior parity with the reference stack
(/root/reference/src/flow_matching/modules/transformer.py,
norm.py, fourier_embed.py, fastspeech/modules.py): rotary attention with
key-padding masks, depthwise conv positional embedding, adaptive RMSNorm
conditioned on the flow time, convolutional SiGLU feed-forward, optional
U-Net skip combiners on the back half, final RMSNorm.

TPU design: all sequence ops are mask-aware static-shape tensor ops; attention
dispatches to the Pallas flash kernel (ops/attention.py) on TPU.  Convolutions
use ``lax.conv_general_dilated`` in NTC layout which XLA tiles onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT
from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    hidden_size: int = 256
    depth: int = 4
    heads: int = 2
    intermediate_size: int = 896
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    use_unet_skip_connection: bool = False
    conv_pos_embed_kernel_size: int = 31
    conv_pos_embed_groups: int = 256
    # activation checkpointing: recompute each attention/feed-forward block
    # in the backward pass instead of saving its internals — trades ~1/3 more
    # FLOPs for O(depth) less activation HBM, buying bigger batches / longer
    # sequences at the reference's 2700-frame training batches.  Param tree
    # and numerics are unchanged (tests/test_remat.py).
    remat: bool = False


def rotary_frequencies(seq_len: int, dim: int, theta: float = 10000.0) -> jax.Array:
    """(seq_len, dim) rotary angle table; freqs duplicated across halves
    (transformer.py:59-64 convention)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


def apply_rotary(pos: jax.Array, t: jax.Array) -> jax.Array:
    """Rotate (…, N, D) by angle table (N, D); computed in f32 like the
    reference's autocast-disabled rotary (transformer.py:56,71)."""
    dtype = t.dtype
    t32 = t.astype(jnp.float32)
    d = t32.shape[-1]
    t1, t2 = t32[..., : d // 2], t32[..., d // 2 :]
    rotated = jnp.concatenate([-t2, t1], axis=-1)
    out = t32 * jnp.cos(pos) + rotated * jnp.sin(pos)
    return out.astype(dtype)


class AdaptiveRMSNorm(nn.Module):
    """L2-normalize * sqrt(d) * (W @ cond + 1); W zero-init (norm.py:30-43)."""

    hidden_size: int
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x: jax.Array, condition: jax.Array) -> jax.Array:
        w = self.param("to_weight", nn.initializers.zeros, (self.hidden_size, self.hidden_size), self.policy.param_dtype)
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + 1e-24)
        gamma = condition.astype(jnp.float32) @ w.astype(jnp.float32).T  # (B, d)
        scale = self.hidden_size**0.5
        out = normed * scale * (gamma[:, None, :] + 1.0)
        return out.astype(self.policy.compute_dtype)


class RMSNorm(nn.Module):
    """Final learned RMSNorm (transformer.py:170, torch nn.RMSNorm parity)."""

    hidden_size: int
    eps: float = 1.1920929e-07  # torch eps=None -> finfo(f32).eps
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.hidden_size,), self.policy.param_dtype)
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        return (normed * w.astype(jnp.float32)).astype(self.policy.compute_dtype)


class RandomFourierEmbed(nn.Module):
    """Frozen random Fourier features: [x, sin(2π x w), cos(2π x w)]
    (fourier_embed.py:31-40)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weights = self.variable(
            "buffers",
            "weights",
            lambda: jax.random.normal(self.make_rng("params"), (self.hidden_size // 2,), jnp.float32),
        ).value
        freqs = x[:, None].astype(jnp.float32) * weights[None, :] * 2 * jnp.pi
        return jnp.concatenate([x[:, None].astype(jnp.float32), jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class TimeConditionEmbed(nn.Module):
    """Fourier features -> Linear(d+1 -> d) -> SiLU (models.py:47-49)."""

    hidden_size: int
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, times: jax.Array) -> jax.Array:
        emb = RandomFourierEmbed(self.hidden_size, name="fourier")(times)
        emb = nn.Dense(self.hidden_size, param_dtype=self.policy.param_dtype, dtype=jnp.float32, name="proj")(emb)
        return jax.nn.silu(emb)


def _conv1d_ntc(x, kernel, bias, groups: int):
    """(B, N, C_in) conv with 'SAME' padding; kernel (K, C_in/groups, C_out)."""
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


class ConvPositionEmbed(nn.Module):
    """Depthwise conv1d k=31 + GELU, mask-aware (transformer.py:76-96)."""

    hidden_size: int
    kernel_size: int = 31
    groups: int = 256
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.hidden_size // self.groups, self.hidden_size),
            self.policy.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.hidden_size,), self.policy.param_dtype)
        out = _conv1d_ntc(
            x.astype(self.policy.compute_dtype),
            kernel.astype(self.policy.compute_dtype),
            bias.astype(self.policy.compute_dtype),
            self.groups,
        )
        out = jax.nn.gelu(out, approximate=False)
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0)
        return out


class Attention(nn.Module):
    """Fused-QKV rotary attention (transformer.py:99-130)."""

    hidden_size: int
    heads: int
    dropout: float = 0.0
    policy: Policy = DEFAULT
    attn_implementation: str = "auto"

    @nn.compact
    def __call__(self, x, mask=None, rotary_pos=None, deterministic=True):
        b, n, _ = x.shape
        d_head = self.hidden_size // self.heads
        qkv = nn.Dense(
            3 * self.hidden_size,
            use_bias=False,
            param_dtype=self.policy.param_dtype,
            dtype=self.policy.compute_dtype,
            name="to_qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(b, n, self.heads, d_head).transpose(0, 2, 1, 3) for t in (q, k, v))
        if rotary_pos is not None:
            q = apply_rotary(rotary_pos, q)
            k = apply_rotary(rotary_pos, k)
        if self.dropout > 0 and not deterministic:
            # torch SDPA's dropout_p semantics (reference transformer.py:127):
            # dropout on the softmax probabilities at train time.  Explicit
            # XLA path — the flash kernel is inference/no-dropout only.
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / (d_head**0.5)
            if mask is not None:
                s = jnp.where(mask[:, None, None, :], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            p = nn.Dropout(self.dropout, deterministic=False)(p)
            out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        else:
            out = dot_product_attention(q, k, v, mask=mask, implementation=self.attn_implementation)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden_size)
        return nn.Dense(
            self.hidden_size,
            use_bias=False,
            param_dtype=self.policy.param_dtype,
            dtype=self.policy.compute_dtype,
            name="to_out",
        )(out)


class ConvFeedForward(nn.Module):
    """Conv1d(k=3) -> SiGLU -> dropout -> Conv1d(k=3), mask-aware
    (fastspeech/modules.py:33-73).  SiGLU gate takes the *second* channel
    half (modules.py:27-30 chunks along channels: value first, gate second)."""

    hidden_size: int
    intermediate_size: int
    dropout: float = 0.0
    kernel_size: int = 3
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        cd = self.policy.compute_dtype
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0)
        k1 = self.param(
            "conv1_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.hidden_size, 2 * self.intermediate_size),
            self.policy.param_dtype,
        )
        b1 = self.param("conv1_bias", nn.initializers.zeros, (2 * self.intermediate_size,), self.policy.param_dtype)
        h = _conv1d_ntc(x.astype(cd), k1.astype(cd), b1.astype(cd), 1)
        value, gate = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(gate) * value
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        if mask is not None:
            h = jnp.where(mask[..., None], h, 0)
        k2 = self.param(
            "conv2_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.intermediate_size, self.hidden_size),
            self.policy.param_dtype,
        )
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.hidden_size,), self.policy.param_dtype)
        return _conv1d_ntc(h, k2.astype(cd), b2.astype(cd), 1)


class Transformer(nn.Module):
    """depth x (AdaRMSNorm -> Attn -> AdaRMSNorm -> ConvFF) pre-norm residual
    stack with optional U-Net skips (transformer.py:150-208)."""

    config: TransformerConfig
    policy: Policy = DEFAULT
    attn_implementation: str = "auto"

    @nn.compact
    def __call__(self, x, mask=None, time_cond=None, deterministic=True):
        cfg = self.config
        assert cfg.depth % 2 == 0
        n = x.shape[1]
        rotary_pos = rotary_frequencies(n, cfg.hidden_size // cfg.heads)

        # nn.remat counts ``self`` as argument 0, so ``deterministic`` (a
        # static python bool branching on dropout) is positional index 4/3
        attn_cls, ff_cls = Attention, ConvFeedForward
        if cfg.remat:
            attn_cls = nn.remat(Attention, static_argnums=(4,))
            ff_cls = nn.remat(ConvFeedForward, static_argnums=(3,))

        skips = []
        for ind in range(cfg.depth):
            layer = ind + 1
            has_skip = cfg.use_unet_skip_connection and layer > cfg.depth // 2
            if not has_skip:
                skips.append(x)
            else:
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = nn.Dense(
                    cfg.hidden_size,
                    use_bias=False,
                    param_dtype=self.policy.param_dtype,
                    dtype=self.policy.compute_dtype,
                    name=f"layers_{ind}_skip_combiner",
                )(x)

            attn_in = AdaptiveRMSNorm(cfg.hidden_size, self.policy, name=f"layers_{ind}_attn_norm")(x, time_cond)
            x = (
                attn_cls(
                    cfg.hidden_size,
                    cfg.heads,
                    cfg.attn_dropout,
                    self.policy,
                    self.attn_implementation,
                    name=f"layers_{ind}_attn",
                )(attn_in, mask, rotary_pos, deterministic)
                + x
            )
            ff_in = AdaptiveRMSNorm(cfg.hidden_size, self.policy, name=f"layers_{ind}_ff_norm")(x, time_cond)
            x = (
                ff_cls(
                    cfg.hidden_size,
                    cfg.intermediate_size,
                    cfg.ff_dropout,
                    policy=self.policy,
                    name=f"layers_{ind}_ff",
                )(ff_in, mask, deterministic)
                + x
            )

        return RMSNorm(cfg.hidden_size, policy=self.policy, name="final_norm")(x)

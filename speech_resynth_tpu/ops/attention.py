"""Multi-head attention: Pallas flash kernel + lax reference.

Replaces the reference's ``F.scaled_dot_product_attention`` call sites
(/root/reference/src/flow_matching/modules/transformer.py:127 and the
attention inside its HF HuBERT/Llama dependencies).

Two mask modes cover every use in the framework:
  * padding mask over keys (CFM bidirectional attention, HuBERT)
  * causal (Llama speech LM)

Design notes (TPU):
  * The Pallas kernel is a standard online-softmax flash forward: grid over
    (batch*heads, q-blocks), ``lax.fori_loop`` over k-blocks, running
    (max, sum, acc) carried in VMEM scratch.  Head dim is padded to a
    multiple of 128 lanes by the wrapper.
  * The backward pass recomputes attention with the lax reference under a
    ``jax.custom_vjp`` — at this framework's sequence lengths (<= ~2k mel
    frames / 128 LM tokens) the full score matrix fits easily, and XLA fuses
    the recompute; a dedicated Pallas backward is a later optimization.
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too, but guard anyway
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# lax reference (also the backward path)
# ---------------------------------------------------------------------------


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    """(B, H, N, D) attention. ``mask``: (B, N) True = valid key."""
    *_, q_len, d = q.shape
    k_len = k.shape[-2]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    if causal:
        causal_mask = jnp.tril(jnp.ones((q_len, k_len), bool), k_len - q_len)
        logits = jnp.where(causal_mask[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Pallas flash forward
# ---------------------------------------------------------------------------


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    mask_ref,
    o_ref,
    *,
    blk_k: int,
    k_len: int,
    scale: float,
    causal: bool,
    blk_q: int,
    causal_offset: int = 0,
):
    q = q_ref[0].astype(jnp.float32) * scale  # (blk_q, d)
    num_kb = k_len // blk_k
    qi = pl.program_id(1)

    if causal:
        # only k-blocks at or below the (offset) diagonal contribute; query i
        # may attend keys up to i + causal_offset (= k_len - q_len, the
        # reference's tril offset for cross-length causal attention)
        hi = (qi + 1) * blk_q + causal_offset
        num_kb = jnp.clip(hi // blk_k + (hi % blk_k != 0), 0, num_kb)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (blk_q, blk_k)

        kmask = mask_ref[0, 0, pl.ds(kb * blk_k, blk_k)] != 0  # (blk_k,)
        s = jnp.where(kmask[None, :], s, NEG_INF)
        if causal:
            q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            k_pos = kb * blk_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(q_pos + causal_offset >= k_pos, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((q.shape[0], d), jnp.float32)
    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    causal: bool,
    blk_q: int = 128,
    blk_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    b, h, q_len, d = q.shape
    k_len = k.shape[2]
    if causal and q_len > k_len:
        # queries beyond the last key would have zero valid keys; the online
        # softmax emits zero rows there while attention_reference yields a
        # uniform softmax over NEG_INF logits — refuse instead of diverging
        # (auto dispatch routes this shape to XLA; no call site hits it)
        raise ValueError(f"pallas flash attention requires q_len <= k_len when causal, got {q_len} > {k_len}")
    scale = 1.0 / math.sqrt(d)

    # d=64 runs natively (Mosaic packs two 64-wide rows per 128-lane tile
    # on second-minor dims; the contraction itself is half-width but avoids
    # the 2x zero-padding FLOP tax).  Anything else rounds up to 128 lanes.
    d_pad = d if d in (64, 128) else max(128, -(-d // 128) * 128)
    q_pad = -(-q_len // blk_q) * blk_q
    k_pad = -(-k_len // blk_k) * blk_k

    if mask is None:
        mask = jnp.ones((b, k_len), bool)
    mask = _pad_to(mask.astype(jnp.int32), k_pad, 1)[:, None, :]  # (b, 1, k_pad)

    qp = _pad_to(_pad_to(q, q_pad, 2), d_pad, 3)
    kp = _pad_to(_pad_to(k, k_pad, 2), d_pad, 3)
    vp = _pad_to(_pad_to(v, k_pad, 2), d_pad, 3)

    bh = b * h
    qp = qp.reshape(bh, q_pad, d_pad)
    kp = kp.reshape(bh, k_pad, d_pad)
    vp = vp.reshape(bh, k_pad, d_pad)
    mask_bh = jnp.broadcast_to(mask[:, None], (b, h, 1, k_pad)).reshape(bh, 1, k_pad)

    grid = (bh, q_pad // blk_q)
    kernel = functools.partial(
        _flash_kernel,
        blk_k=blk_k,
        k_len=k_pad,
        scale=scale,
        causal=causal,
        blk_q=blk_q,
        # reference semantics (attention_reference): query i attends keys up
        # to i + (k_len - q_len) — positions are in UNPADDED coordinates
        # (padding is appended, so padded coordinates coincide)
        causal_offset=k_len - q_len,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, k_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, k_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, k_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d_pad), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, mask_bh)

    return out.reshape(b, h, q_pad, d_pad)[:, :, :q_len, :d]


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, mask, causal):
    return _flash_forward(q, k, v, mask, causal)


def _flash_fwd(q, k, v, mask, causal):
    return _flash_forward(q, k, v, mask, causal), (q, k, v, mask)


def _flash_bwd(causal, residuals, g):
    q, k, v, mask = residuals
    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v, mask, causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


_IMPL_OVERRIDE: Optional[str] = None


@contextlib.contextmanager
def attention_implementation(impl: Optional[str]):
    """Force every ``implementation="auto"`` call site to ``impl`` while the
    context is active (trace-time decision — enter BEFORE jit-compiling the
    fn under test, and use fresh jitted fns per variant so the jit cache
    can't serve a trace made under a different override).  A/B harness for
    whole-program dispatch measurements (benchmarks/bench_train.py --ab)."""
    global _IMPL_OVERRIDE
    prev, _IMPL_OVERRIDE = _IMPL_OVERRIDE, impl
    try:
        yield
    finally:
        _IMPL_OVERRIDE = prev


def auto_dispatch(d: int, q_len: int, k_len: int, causal: bool, on_tpu: bool) -> str:
    """The ``implementation="auto"`` decision, factored out so the gate is
    directly testable on the CPU suite (where on_tpu is always False at the
    call site).

    Driven by IN-CONTEXT measurements on v5e (PARITY.md): standalone, the
    kernel beats XLA 1.6-4x on every production shape (bench_attention.py) —
    but inside a full jitted model XLA's fusion changes the verdict per
    family:
      * CFM-style d%128==0 bidir: pallas (headline bench holds ~990x)
      * Llama-style d=64 short causal: pallas (+7% LM scoring,
        bench_lm.py 186k -> 199k tok/s)
      * HuBERT/Whisper-style d=64 bidir: XLA (full-encoder A/B: XLA
        1906x vs pallas 1411x realtime) — fusion with QKV/residual wins
    """
    if not on_tpu:
        return "xla"
    if d == 64:
        shape_profits = causal and 128 <= q_len <= 512
    else:
        shape_profits = d % 128 == 0 and q_len >= 256
    if causal and q_len > k_len:
        shape_profits = False  # kernel rejects q_len > k_len causal
    return "pallas" if shape_profits else "xla"


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    implementation: str = "auto",
) -> jax.Array:
    """Attention over (B, H, N, D) tensors.

    mask: optional (B, N) bool, True where the key position is valid.
    implementation: "auto" (pallas on TPU where the shape profits, xla
    elsewhere), "pallas", "xla".
    """
    if implementation == "auto" and _IMPL_OVERRIDE is not None:
        implementation = _IMPL_OVERRIDE
    if implementation == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        implementation = auto_dispatch(q.shape[-1], q.shape[-2], k.shape[-2], causal, on_tpu)
    if implementation == "pallas":
        return _flash_attention(q, k, v, mask, causal)
    return attention_reference(q, k, v, mask, causal)

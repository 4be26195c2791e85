"""Llama-architecture causal LM for speech-unit language modeling.

Parity target: HF ``LlamaForCausalLM`` as configured by the reference
(/root/reference/src/speechlm/train.py:109-120; configs/speechlm/hubert.yaml:
vocab 16384+2 specials, hidden 768, intermediate 3072, 12 layers, 12 heads).
Architecture: RoPE (full head dim, theta 1e4), RMSNorm (eps 1e-6), SwiGLU MLP,
causal attention, untied LM head, no biases.

Beyond the reference (which only scores sequences), this module provides
KV-cached autoregressive decoding — single-token decode steps against a
static-shape cache, jit-compiled once (BASELINE.json north star).

TPU design: attention uses the shared flash kernel (ops/attention.py); the
decode path uses a dense dot against the cache (single query token — MXU-bound
matmuls, no flash needed).  Shardable over (data, model): the Dense kernels
carry logical axis metadata for TP when enabled.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT
from ..ops.attention import dot_product_attention
from .transformer import apply_rotary


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 16386
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    pad_token_id: int = 0
    bos_token_id: Optional[int] = None
    eos_token_id: Optional[int] = 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _rope_tables(positions: jax.Array, head_dim: int, theta: float) -> jax.Array:
    """(..., L) int positions -> (..., L, head_dim) angle table."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.concatenate([freqs, freqs], axis=-1)


class LlamaRMSNorm(nn.Module):
    hidden_size: int
    eps: float
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.hidden_size,), self.policy.param_dtype)
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        # HF Llama casts normed activations back before the weight multiply
        return (w.astype(jnp.float32) * normed).astype(self.policy.compute_dtype)


class LlamaLayer(nn.Module):
    config: LlamaConfig
    policy: Policy = DEFAULT
    attn_implementation: str = "auto"

    def _dense(self, features, name):
        return nn.Dense(
            features,
            use_bias=False,
            param_dtype=self.policy.param_dtype,
            dtype=self.policy.compute_dtype,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        rope: jax.Array,
        mask: Optional[jax.Array],
        cache: Optional[Dict[str, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
    ):
        cfg = self.config
        b, n, _ = x.shape
        h, d = cfg.num_attention_heads, cfg.head_dim

        residual = x
        hs = LlamaRMSNorm(cfg.hidden_size, cfg.rms_norm_eps, self.policy, name="input_norm")(x)
        q = self._dense(cfg.hidden_size, "q_proj")(hs).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = self._dense(cfg.hidden_size, "k_proj")(hs).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        v = self._dense(cfg.hidden_size, "v_proj")(hs).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        q = apply_rotary(rope, q)
        k = apply_rotary(rope, k)

        new_cache = None
        if cache is not None:
            # decode/prefill: write this chunk's k/v at cache_index, attend
            # causally relative to absolute positions
            k_cache = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, cache_index, 0))
            v_cache = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, cache_index, 0))
            new_cache = {"k": k_cache, "v": v_cache}
            max_len = k_cache.shape[2]
            q_pos = cache_index + jnp.arange(n)  # (n,)
            k_pos = jnp.arange(max_len)  # (max_len,)
            allowed = k_pos[None, :] <= q_pos[:, None]  # (n, max_len)
            scale = 1.0 / (d**0.5)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache, preferred_element_type=jnp.float32) * scale
            s = jnp.where(allowed[None, None], s, -1e30)
            p = jax.nn.softmax(s, axis=-1).astype(v_cache.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", p, v_cache)
        else:
            attn = dot_product_attention(q, k, v, mask=mask, causal=True, implementation=self.attn_implementation)

        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden_size)
        x = residual + self._dense(cfg.hidden_size, "o_proj")(attn)

        residual = x
        hs = LlamaRMSNorm(cfg.hidden_size, cfg.rms_norm_eps, self.policy, name="post_attn_norm")(x)
        gate = self._dense(cfg.intermediate_size, "gate_proj")(hs)
        up = self._dense(cfg.intermediate_size, "up_proj")(hs)
        down = self._dense(cfg.hidden_size, "down_proj")(jax.nn.silu(gate) * up)
        return residual + down, new_cache


class LlamaLM(nn.Module):
    """``scan_layers=True`` compiles ONE layer body via ``nn.scan`` instead of
    unrolling num_hidden_layers copies into the HLO — full-size (12L) compile
    drops accordingly (PARITY.md round-1 deferral).  Param layout differs:
    a single ``layers`` collection with a leading layer axis instead of
    ``layers_{i}`` subtrees; convert.stack_llama_layers/unstack_llama_layers
    translate, so both layouts load the same checkpoints."""

    config: LlamaConfig
    policy: Policy = DEFAULT
    attn_implementation: str = "auto"
    scan_layers: bool = False
    # activation checkpointing: recompute each layer in the backward pass —
    # O(num_layers) less activation HBM for ~1/3 more FLOPs.  Composes with
    # scan_layers (remat inside the scan body, the standard large-LM layout);
    # param tree and numerics unchanged (tests/test_remat.py).
    remat: bool = False
    # sequence parallelism (GSPMD): a NamedSharding for the (B, L, D) hidden
    # states, e.g. P(data, model, None) — activations between layers live
    # sequence-sharded over the model axis and XLA inserts the all-gather /
    # reduce-scatter pairs around attention/MLP automatically (the
    # Megatron-SP layout, scaling-book recipe).  None = no constraint.
    hidden_sharding: Optional[object] = None

    def _constrain(self, x):
        if self.hidden_sharding is not None:
            return jax.lax.with_sharding_constraint(x, self.hidden_sharding)
        return x

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        cache: Optional[Tuple[Dict[str, jax.Array], ...]] = None,
        cache_index: Optional[jax.Array] = None,
    ):
        """Returns (logits, new_cache).

        Training/scoring: pass (B, L) ids + optional (B, L) attention mask.
        Decode: pass 1-token ids, the cache pytree, and the write index.
        """
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=self.policy.param_dtype, name="embed_tokens")(
            input_ids
        ).astype(self.policy.compute_dtype)
        x = self._constrain(x)

        if positions is None:
            if cache_index is not None:
                positions = cache_index + jnp.arange(input_ids.shape[1])[None, :]
            else:
                positions = jnp.arange(input_ids.shape[1])[None, :]
        rope = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
        if rope.ndim == 3:  # (B, L, D) -> broadcast over heads
            rope = rope[:, None]

        mask = attention_mask.astype(bool) if attention_mask is not None else None

        if self.scan_layers:
            # one traced layer body; params carry a leading layer axis.
            # cache (if any) is a single dict stacked on axis 0.
            def body(layer, carry, layer_cache):
                y, new_c = layer(carry, rope, mask, layer_cache, cache_index)
                return self._constrain(y), new_c

            if self.remat:
                # prevent_cse=False is safe (and faster) under scan/cond
                body = nn.remat(body, prevent_cse=False)

            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=0,
                out_axes=0,
                length=cfg.num_hidden_layers,
            )
            x, stacked_cache = scanned(
                LlamaLayer(cfg, self.policy, self.attn_implementation, name="layers"), x, cache
            )
            x = LlamaRMSNorm(cfg.hidden_size, cfg.rms_norm_eps, self.policy, name="final_norm")(x)
            logits = nn.Dense(
                cfg.vocab_size,
                use_bias=False,
                param_dtype=self.policy.param_dtype,
                dtype=jnp.float32,
                name="lm_head",
            )(x)
            return logits, (stacked_cache if cache is not None else None)

        layer_cls = nn.remat(LlamaLayer) if self.remat else LlamaLayer
        new_caches = []
        for i in range(cfg.num_hidden_layers):
            layer_cache = cache[i] if cache is not None else None
            x, new_c = layer_cls(cfg, self.policy, self.attn_implementation, name=f"layers_{i}")(
                x, rope, mask, layer_cache, cache_index
            )
            x = self._constrain(x)
            new_caches.append(new_c)

        x = LlamaRMSNorm(cfg.hidden_size, cfg.rms_norm_eps, self.policy, name="final_norm")(x)
        logits = nn.Dense(
            cfg.vocab_size,
            use_bias=False,
            param_dtype=self.policy.param_dtype,
            dtype=jnp.float32,
            name="lm_head",
        )(x)
        return logits, (tuple(new_caches) if cache is not None else None)

    def init_cache(self, batch_size: int, max_len: int):
        cfg = self.config
        shape = (batch_size, cfg.num_attention_heads, max_len, cfg.head_dim)
        if self.scan_layers:
            stacked = (cfg.num_hidden_layers,) + shape
            return {
                "k": jnp.zeros(stacked, self.policy.compute_dtype),
                "v": jnp.zeros(stacked, self.policy.compute_dtype),
            }
        one = lambda: {"k": jnp.zeros(shape, self.policy.compute_dtype), "v": jnp.zeros(shape, self.policy.compute_dtype)}
        return tuple(one() for _ in range(cfg.num_hidden_layers))


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean next-token cross entropy with -100 ignore (HF ``.loss`` parity,
    speechlm/train.py:162-167)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def sequence_pseudo_log_prob(logits: jax.Array, input_ids: jax.Array, pad_id: int = 0) -> jax.Array:
    """Length-normalized pseudo-log-prob scoring (speechlm/eval.py:83-89).

    The reference computes −CE against labels padded by one (-100) and shifted,
    then sums and divides by the count of nonzero terms.
    """
    labels = jnp.where(input_ids == pad_id, -100, input_ids)
    shift_labels = jnp.concatenate([labels[:, 1:], jnp.full_like(labels[:, :1], -100)], axis=1)
    valid = shift_labels != -100
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_scores = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    tok_scores = jnp.where(valid, tok_scores, 0.0)
    # reference divides by count of *nonzero* scores (eval.py:89)
    nonzero = jnp.sum((tok_scores != 0.0).astype(jnp.float32), axis=1)
    return jnp.sum(tok_scores, axis=1) / jnp.maximum(nonzero, 1.0)


import functools


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _greedy_decode_impl(model: "LlamaLM", variables, prompt_ids, max_new_tokens: int, eos_token_id: int):
    b, p = prompt_ids.shape
    total = p + max_new_tokens
    cache = model.init_cache(b, total)

    logits, cache = model.apply(variables, prompt_ids, cache=cache, cache_index=jnp.asarray(0))
    next_tok = jnp.argmax(logits[:, -1], axis=-1).astype(prompt_ids.dtype)
    done = next_tok == eos_token_id

    def step(carry, i):
        cache, tok, done = carry
        logits, cache = model.apply(variables, tok[:, None], cache=cache, cache_index=p + i)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(tok.dtype)
        nxt = jnp.where(done, jnp.asarray(eos_token_id, tok.dtype), nxt)
        done = done | (nxt == eos_token_id)
        return (cache, nxt, done), tok

    (_, last, _), toks = jax.lax.scan(step, (cache, next_tok, done), jnp.arange(max_new_tokens - 1))
    return jnp.concatenate([prompt_ids, jnp.swapaxes(toks, 0, 1), last[:, None]], axis=1)


def greedy_decode(model: LlamaLM, variables, prompt_ids: jax.Array, max_new_tokens: int, eos_token_id: int = 1):
    """KV-cached greedy generation; returns (B, prompt+max_new) ids.

    One jitted program (prefill + scan over decode steps); params are traced
    arguments, never HLO constants.
    """
    return _greedy_decode_impl(model, variables, jnp.asarray(prompt_ids), max_new_tokens, eos_token_id)


def _propose_drafts(buf: jax.Array, n: jax.Array, *, p: int, ngram: int, spec_tokens: int) -> jax.Array:
    """(b, S) prompt-lookup draft tokens: the continuation of the LAST earlier
    occurrence of the trailing ``ngram``; falls back to repeating the last
    committed token.  ``buf`` is the (b, cap) id buffer, ``n`` the number of
    generated tokens so far (committed frontier is index ``p + n - 1``).
    Shared by the greedy (``lookup_decode``) and exact-distribution sampling
    (``lookup_sample_decode``) speculative paths."""
    b, cap = buf.shape
    S = spec_tokens
    W = cap - ngram + 1  # candidate window starts for the n-gram match
    ctx = jax.lax.dynamic_slice(buf, (0, jnp.maximum(p + n - ngram, 0)), (b, ngram))
    match = jnp.ones((b, W), bool)
    for g in range(ngram):
        match &= buf[:, g : g + W] == ctx[:, g : g + 1]
    t_idx = jnp.arange(W)
    # strictly before the trailing occurrence itself; windows past the
    # committed frontier hold stale/zero bytes and are excluded
    valid = match & (t_idx[None, :] < (p + n - ngram))
    m = jnp.max(jnp.where(valid, t_idx[None, :], -1), axis=-1)  # (b,)
    start = jnp.where(m >= 0, m + ngram, jnp.maximum(p + n - 1, 0))
    idx = jnp.clip(start[:, None] + jnp.arange(S)[None, :], 0, cap - 1)
    gathered = jnp.take_along_axis(buf, idx, axis=1)
    # positions at/past the committed frontier (p+n-1 is the last
    # committed token) hold stale/zero bytes — substitute the last token
    # so the no-match fallback and frontier-overlapping continuations
    # draft repetition instead of garbage (wasted verify slots)
    last = jax.lax.dynamic_slice(buf, (0, p + n - 1), (b, 1))
    return jnp.where(idx <= (p + n - 1), gathered, last)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def _lookup_decode_impl(
    model: "LlamaLM",
    variables,
    prompt_ids,
    max_new_tokens: int,
    eos_token_id: int,
    ngram: int,
    spec_tokens: int,
):
    """Prompt-lookup speculative greedy decode (exact greedy equivalence).

    Each device iteration verifies a block of ``1 + spec_tokens`` tokens in
    ONE forward pass: the last committed token plus S draft tokens proposed
    by matching the most recent ``ngram`` against earlier context (the
    "prompt lookup" heuristic — unit/BPE streams repeat).  Every verified
    position's argmax is compared against its draft; the longest accepted
    prefix (+1 for the always-valid first position) commits at once.  Per
    iteration the whole weight tree is read from HBM exactly once — the
    single-token decode's dominant cost — so acceptance rate a gives ~(1+a)x
    tokens per HBM sweep; at a=0 it degrades to ~greedy speed (the extra S
    verify columns ride the same weight reads).

    Rows advance in lockstep (the commit length is the MIN acceptance across
    the batch): the KV cache keeps one scalar write index, and stale cache
    entries past the committed frontier are overwritten by the next block
    before any query can attend to them (next write starts exactly at the
    frontier and spans the full block).  Returns (ids, n_generated, iters).
    """
    b, p = prompt_ids.shape
    S = int(spec_tokens)
    total = p + max_new_tokens
    cap = total + S + 1  # a commit block may overshoot max_new; sliced off below
    eos = jnp.asarray(eos_token_id, prompt_ids.dtype)
    cache = model.init_cache(b, cap)

    buf = jnp.zeros((b, cap), prompt_ids.dtype)
    buf = jax.lax.dynamic_update_slice(buf, prompt_ids, (0, 0))

    logits, cache = model.apply(variables, prompt_ids, cache=cache, cache_index=jnp.asarray(0))
    t0 = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1).astype(prompt_ids.dtype)
    buf = jax.lax.dynamic_update_slice(buf, t0[:, None], (0, p))
    done = t0 == eos_token_id

    def propose(buf, n):
        return _propose_drafts(buf, n, p=p, ngram=ngram, spec_tokens=S)

    def cond(carry):
        _, _, n, done, _ = carry
        return (n < max_new_tokens) & ~jnp.all(done)

    def body(carry):
        buf, cache, n, done, it = carry
        cur = jax.lax.dynamic_slice(buf, (0, p + n - 1), (b, 1))
        drafts = propose(buf, n)  # (b, S)
        x = jnp.concatenate([cur, drafts], axis=1)  # (b, 1+S)
        logits, cache = model.apply(variables, x, cache=cache, cache_index=p + n - 1)
        v = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(buf.dtype)  # (b, 1+S)

        # force eos from the first committed eos onward (and for done rows)
        eos_hit = v == eos
        prior_eos = jnp.cumsum(eos_hit, axis=1) - eos_hit.astype(jnp.int32) > 0
        forced = done[:, None] | prior_eos
        out = jnp.where(forced, eos, v)

        # acceptance: leading drafts that equal their verified token; done
        # rows place no constraint (their whole block is forced eos)
        ok = jnp.cumprod((drafts == out[:, :S]).astype(jnp.int32), axis=1)
        acc_row = jnp.where(done, S, jnp.sum(ok, axis=1))
        acc = jnp.min(acc_row)  # lockstep commit of acc+1 tokens

        buf = jax.lax.dynamic_update_slice(buf, out, (0, p + n))
        slot = jnp.arange(1 + S)
        done = done | jnp.any((slot[None, :] <= acc) & (out == eos), axis=1)
        return buf, cache, n + acc + 1, done, it + 1

    buf, _, n, done, iters = jax.lax.while_loop(
        cond, body, (buf, cache, jnp.asarray(1), done, jnp.asarray(0))
    )
    # all-done early exit leaves an uncommitted tail: greedy emits eos forever
    buf = jnp.where(jnp.arange(cap)[None, :] >= p + n, eos, buf)
    return buf[:, :total], n, iters


def lookup_decode(
    model: LlamaLM,
    variables,
    prompt_ids: jax.Array,
    max_new_tokens: int,
    eos_token_id: int = 1,
    ngram: int = 2,
    spec_tokens: int = 7,
    return_stats: bool = False,
):
    """Prompt-lookup speculative greedy generation — bit-identical outputs to
    ``greedy_decode`` (test-locked) in fewer sequential weight sweeps when
    the stream repeats (unit/BPE text does).  One jitted program.

    Batching caveat: rows commit in LOCKSTEP at the MIN acceptance across
    the batch, so acceptance (and the speedup) collapses as B grows — use
    this for single-stream (B=1) generation, the ``continue_speech`` case;
    measured B=1 vs B=16 rows in benchmarks/bench_lm.py (PARITY.md r5).

    ``return_stats=True`` additionally returns
    ``{"iterations", "generated", "tokens_per_iteration"}`` for acceptance
    telemetry (benchmarks/bench_lm.py A/Bs this against greedy_decode).
    """
    ids, n, iters = _lookup_decode_impl(
        model, variables, jnp.asarray(prompt_ids), max_new_tokens, eos_token_id, ngram, spec_tokens
    )
    if not return_stats:
        return ids
    # The final commit block may overshoot max_new_tokens inside the while loop
    # (the buffer slice truncates but the counter does not) — clamp so
    # tokens_per_iteration telemetry counts only emitted tokens.
    n, iters = min(int(n), max_new_tokens), int(iters)
    return ids, {
        "iterations": iters,
        "generated": n,
        "tokens_per_iteration": round(n / max(iters, 1), 3),
    }


def _filter_logits(logits: jax.Array, top_k: int, top_p: float) -> jax.Array:
    """HF-order logit filtering on (B, V) f32: top-k, then nucleus (top-p).
    Ties at either threshold are kept (same as HF's >= comparisons)."""
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_desc = -jnp.sort(-logits, axis=-1)
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix whose mass reaches top_p (always >= 1 tok,
        # even for degenerate top_p <= 0)
        k_keep = jnp.maximum(jnp.sum((cum - probs) < top_p, axis=-1, keepdims=True), 1)
        thresh = jnp.take_along_axis(sorted_desc, k_keep - 1, axis=-1)
        logits = jnp.where(logits < thresh, -jnp.inf, logits)
    return logits


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 6, 7, 8))
def _sample_decode_impl(
    model: "LlamaLM",
    variables,
    prompt_ids,
    max_new_tokens: int,
    eos_token_id: int,
    rng,
    temperature: float,
    top_k: int,
    top_p: float,
):
    b, p = prompt_ids.shape
    cache = model.init_cache(b, p + max_new_tokens)

    def select(logits, key):
        l32 = logits.astype(jnp.float32)
        if temperature == 0.0:  # static: greedy limit
            return jnp.argmax(l32, axis=-1).astype(prompt_ids.dtype)
        l32 = _filter_logits(l32 / temperature, top_k, top_p)
        return jax.random.categorical(key, l32, axis=-1).astype(prompt_ids.dtype)

    k0, rng = jax.random.split(rng)
    logits, cache = model.apply(variables, prompt_ids, cache=cache, cache_index=jnp.asarray(0))
    next_tok = select(logits[:, -1], k0)
    done = next_tok == eos_token_id

    def step(carry, i):
        cache, tok, done, rng = carry
        key, rng = jax.random.split(rng)
        logits, cache = model.apply(variables, tok[:, None], cache=cache, cache_index=p + i)
        nxt = select(logits[:, -1], key)
        nxt = jnp.where(done, jnp.asarray(eos_token_id, tok.dtype), nxt)
        done = done | (nxt == eos_token_id)
        return (cache, nxt, done, rng), tok

    (_, last, _, _), toks = jax.lax.scan(step, (cache, next_tok, done, rng), jnp.arange(max_new_tokens - 1))
    return jnp.concatenate([prompt_ids, jnp.swapaxes(toks, 0, 1), last[:, None]], axis=1)


def sample_decode(
    model: LlamaLM,
    variables,
    prompt_ids: jax.Array,
    max_new_tokens: int,
    eos_token_id: int = 1,
    rng: Optional[jax.Array] = None,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
):
    """KV-cached ancestral sampling with temperature / top-k / nucleus
    filtering (HF sampling-order semantics); returns (B, prompt+max_new) ids.

    ``temperature=0`` degenerates to greedy.  Beyond the reference's
    capability set — its speech LM only scores (speechlm/eval.py), never
    generates; this pairs with greedy_decode for unit-language generation.
    """
    if rng is None:
        rng = jax.random.key(0)
    return _sample_decode_impl(
        model, variables, jnp.asarray(prompt_ids), max_new_tokens, eos_token_id, rng, temperature, top_k, top_p
    )


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 6, 7, 8, 9, 10))
def _lookup_sample_decode_impl(
    model: "LlamaLM",
    variables,
    prompt_ids,
    max_new_tokens: int,
    eos_token_id: int,
    rng,
    temperature: float,
    top_k: int,
    top_p: float,
    ngram: int,
    spec_tokens: int,
):
    """Prompt-lookup speculative SAMPLING — exact target distribution.

    Same block structure as ``_lookup_decode_impl`` (one forward over the last
    committed token + S prompt-lookup drafts per HBM weight sweep), but the
    verify step is the deterministic-draft special case of speculative
    rejection sampling (Leviathan et al. / Chen et al.): a draft token d at a
    position with filtered target distribution p is accepted with probability
    p(d) (the proposal is a point mass, so min(1, p/q) = p(d)); on the FIRST
    rejection the replacement token is drawn from the residual p with d's mass
    removed, renormalized; if all S drafts are accepted a bonus token is drawn
    from the (S+1)-th position's full p.  Per committed position the marginal
    law is exactly p — i.e. distributionally identical to ``sample_decode``
    with the same temperature/top-k/top-p filtering (test-locked by an
    empirical total-variation check, tests/test_llama.py).

    Rows advance in lockstep (commit length = min acceptance across the
    batch, +1 for the always-fresh sample); discarding a row's accepted
    suffix beyond the global commit resamples it next iteration with fresh
    randomness, which leaves per-position marginals unchanged.  RNG
    consumption differs from ``sample_decode`` (accept/residual draws vs one
    categorical per step), so sequences for a given key differ — equality is
    in distribution, not bitwise.  Returns (ids, n_generated, iters).
    """
    b, p = prompt_ids.shape
    S = int(spec_tokens)
    total = p + max_new_tokens
    cap = total + S + 1
    eos = jnp.asarray(eos_token_id, prompt_ids.dtype)
    cache = model.init_cache(b, cap)

    buf = jnp.zeros((b, cap), prompt_ids.dtype)
    buf = jax.lax.dynamic_update_slice(buf, prompt_ids, (0, 0))

    def filtered(logits):
        """f32 filtered logits (HF order: temperature, top-k, top-p)."""
        return _filter_logits(logits.astype(jnp.float32) / temperature, top_k, top_p)

    k0, rng = jax.random.split(rng)
    logits, cache = model.apply(variables, prompt_ids, cache=cache, cache_index=jnp.asarray(0))
    t0 = jax.random.categorical(k0, filtered(logits[:, -1]), axis=-1).astype(prompt_ids.dtype)
    buf = jax.lax.dynamic_update_slice(buf, t0[:, None], (0, p))
    done = t0 == eos_token_id

    def cond(carry):
        _, _, n, done, _, _ = carry
        return (n < max_new_tokens) & ~jnp.all(done)

    def body(carry):
        buf, cache, n, done, rng, it = carry
        k_acc, k_res, rng = jax.random.split(rng, 3)
        cur = jax.lax.dynamic_slice(buf, (0, p + n - 1), (b, 1))
        drafts = _propose_drafts(buf, n, p=p, ngram=ngram, spec_tokens=S)  # (b, S)
        x = jnp.concatenate([cur, drafts], axis=1)  # (b, 1+S)
        logits, cache = model.apply(variables, x, cache=cache, cache_index=p + n - 1)
        probs = jax.nn.softmax(filtered(logits), axis=-1)  # (b, 1+S, V)

        # accept draft j (verified by position j's distribution) w.p. p_j(d_j)
        p_draft = jnp.take_along_axis(probs[:, :S], drafts[..., None], axis=-1)[..., 0]  # (b, S)
        u = jax.random.uniform(k_acc, (b, S))
        ok = jnp.cumprod((u < p_draft).astype(jnp.int32), axis=1)  # leading accepts
        acc_row = jnp.where(done, S, jnp.sum(ok, axis=1))  # (b,) in [0, S]

        # fresh sample at offset acc_row: residual (draft's mass removed) on
        # rejection, full distribution for the bonus position acc_row == S
        p_sel = jnp.take_along_axis(probs, acc_row[:, None, None], axis=1)[:, 0]  # (b, V)
        draft_at = jnp.take_along_axis(
            jnp.concatenate([drafts, drafts[:, -1:]], axis=1), acc_row[:, None], axis=1
        )  # (b, 1); value irrelevant when acc_row == S
        vocab = jnp.arange(probs.shape[-1])[None, :]
        residual = jnp.where((acc_row[:, None] < S) & (vocab == draft_at), 0.0, p_sel)
        repl = jax.random.categorical(k_res, jnp.log(residual), axis=-1).astype(buf.dtype)  # (b,)

        slot = jnp.arange(1 + S)[None, :]
        drafts_ext = jnp.concatenate([drafts, drafts[:, -1:]], axis=1)  # (b, 1+S)
        out = jnp.where(slot == acc_row[:, None], repl[:, None], drafts_ext)
        # slots < acc_row are accepted drafts; slots > acc_row are never
        # committed (global commit stops at min acceptance + 1)

        # force eos from the first committed eos onward (and for done rows)
        eos_hit = out == eos
        prior_eos = jnp.cumsum(eos_hit, axis=1) - eos_hit.astype(jnp.int32) > 0
        out = jnp.where(done[:, None] | prior_eos, eos, out)

        acc = jnp.min(acc_row)  # lockstep commit of acc+1 tokens
        buf = jax.lax.dynamic_update_slice(buf, out, (0, p + n))
        done = done | jnp.any((slot <= acc) & (out == eos), axis=1)
        return buf, cache, n + acc + 1, done, rng, it + 1

    buf, _, n, done, _, iters = jax.lax.while_loop(
        cond, body, (buf, cache, jnp.asarray(1), done, rng, jnp.asarray(0))
    )
    # all-done early exit leaves an uncommitted tail: decode emits eos forever
    buf = jnp.where(jnp.arange(cap)[None, :] >= p + n, eos, buf)
    return buf[:, :total], n, iters


def lookup_sample_decode(
    model: LlamaLM,
    variables,
    prompt_ids: jax.Array,
    max_new_tokens: int,
    eos_token_id: int = 1,
    rng: Optional[jax.Array] = None,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    ngram: int = 2,
    spec_tokens: int = 7,
    return_stats: bool = False,
):
    """Prompt-lookup speculative sampling — the sampled counterpart of
    ``lookup_decode``.  Commits multiple tokens per HBM weight sweep while
    drawing every committed token from EXACTLY the same filtered distribution
    as ``sample_decode`` (deterministic-draft rejection sampling; see
    ``_lookup_sample_decode_impl``).  ``temperature=0`` delegates to the
    greedy speculative path (bit-identical to ``greedy_decode``).

    One jitted program.  ``return_stats=True`` additionally returns
    ``{"iterations", "generated", "tokens_per_iteration"}`` acceptance
    telemetry (benchmarks/bench_lm.py A/Bs this against ``sample_decode``).
    Same batching caveat as ``lookup_decode``: lockstep MIN-acceptance
    commits make this a single-stream (B=1) tool, not a batch one.
    """
    if rng is None:
        rng = jax.random.key(0)
    if temperature == 0.0:
        ids, n, iters = _lookup_decode_impl(
            model, variables, jnp.asarray(prompt_ids), max_new_tokens, eos_token_id, ngram, spec_tokens
        )
    else:
        ids, n, iters = _lookup_sample_decode_impl(
            model,
            variables,
            jnp.asarray(prompt_ids),
            max_new_tokens,
            eos_token_id,
            rng,
            temperature,
            top_k,
            top_p,
            ngram,
            spec_tokens,
        )
    if not return_stats:
        return ids
    # Same clamp as lookup_decode: the last commit block can overshoot the cap.
    n, iters = min(int(n), max_new_tokens), int(iters)
    return ids, {
        "iterations": iters,
        "generated": n,
        "tokens_per_iteration": round(n / max(iters, 1), 3),
    }

#!/usr/bin/env python
"""Speech-LM throughput: sWUGGY/sBLIMP-style scoring + KV-cached decode.

BASELINE.json config 4: "Llama speech LM: BPE unicode-unit scoring"
(hubert.yaml sizes: 768/3072/12L/12H, vocab 16386, batch 96 x 128 tokens)
plus the tokens/sec/chip number for autoregressive generation.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.convert import stack_llama_layers
    from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM, greedy_decode, sequence_pseudo_log_prob

    cfg = LlamaConfig()
    model = LlamaLM(cfg, policy=BF16_INFERENCE)
    variables = model.init(jax.random.key(0), jnp.ones((1, 8), jnp.int32))

    B, L = 96, 128
    ids = jnp.asarray(np.random.default_rng(0).integers(2, cfg.vocab_size, (B, L)), jnp.int32)

    @jax.jit
    def score(params, ids):
        # params passed as an argument — a closure would inline 98M weights
        # as HLO constants and blow the remote-compile request limit
        logits, _ = model.apply({"params": params}, ids)
        return sequence_pseudo_log_prob(logits, ids)

    t0 = time.perf_counter()
    unrolled_warm = score(variables["params"], ids)
    np.asarray(unrolled_warm)  # warmup; device_get forces real sync on axon
    unrolled_compile_s = time.perf_counter() - t0

    score = lambda ids, _f=score, _p=variables["params"]: _f(_p, ids)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        s = np.asarray(score(ids))
    scoring_tps = iters * B * L / (time.perf_counter() - t0)

    # scan-over-layers variant: one traced layer body -> compile-time delta
    scan_model = LlamaLM(cfg, policy=BF16_INFERENCE, scan_layers=True)
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_llama_layers(variables["params"]))

    @jax.jit
    def score_scan(params, ids):
        logits, _ = scan_model.apply({"params": params}, ids)
        return sequence_pseudo_log_prob(logits, ids)

    t0 = time.perf_counter()
    np.asarray(score_scan(stacked, ids))
    scan_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(score_scan(stacked, ids))
    scan_tps = iters * B * L / (time.perf_counter() - t0)

    # decode: 32-token prompt, 96 new tokens, batch 16
    prompt = ids[:16, :32]
    np.asarray(greedy_decode(model, variables, prompt, max_new_tokens=96))
    t0 = time.perf_counter()
    for _ in range(3):
        seq = np.asarray(greedy_decode(model, variables, prompt, max_new_tokens=96))
    decode_tps = 3 * 16 * 96 / (time.perf_counter() - t0)

    # sampled decode: the top-p filter sorts (B, V) every step — quantify
    # what temperature/top-k/nucleus costs vs greedy at the same shape
    from speech_resynth_tpu.models.llama import sample_decode

    samp_kw = dict(max_new_tokens=96, temperature=0.9, top_k=64, top_p=0.95, rng=jax.random.key(0))
    np.asarray(sample_decode(model, variables, prompt, **samp_kw))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(sample_decode(model, variables, prompt, **samp_kw))
    sample_tps = 3 * 16 * 96 / (time.perf_counter() - t0)

    # prompt-lookup speculative greedy (models/llama.py:lookup_decode): one
    # verify block per iteration amortizes the per-step HBM weight sweep.
    # Case (a) random prompt = acceptance ~0 -> measures the pure overhead of
    # the S extra verify columns; case (b) self-continuation prompt (greedy
    # output fed back, which cycles for degenerate streams the way unit/BPE
    # text repeats) -> measures the win at real acceptance, with the measured
    # tokens/iteration alongside so the number explains itself.
    from speech_resynth_tpu.models.llama import lookup_decode

    lk = dict(max_new_tokens=96, eos_token_id=cfg.eos_token_id, ngram=2, spec_tokens=7)
    np.asarray(lookup_decode(model, variables, prompt, **lk))
    t0 = time.perf_counter()
    for _ in range(3):
        _, stats_rand = lookup_decode(model, variables, prompt, return_stats=True, **lk)
    lookup_rand_tps = 3 * 16 * 96 / (time.perf_counter() - t0)

    cyc_prompt = greedy_decode(model, variables, prompt[:, :16], max_new_tokens=16)
    np.asarray(lookup_decode(model, variables, cyc_prompt, **lk))
    t0 = time.perf_counter()
    for _ in range(3):
        _, stats_cyc = lookup_decode(model, variables, cyc_prompt, return_stats=True, **lk)
    lookup_cyc_tps = 3 * 16 * 96 / (time.perf_counter() - t0)

    # exact-distribution speculative SAMPLING (lookup_sample_decode): same
    # filtered target law as sample_decode, accept rate now stochastic
    # (a draft commits w.p. p(draft)), so the cyclic case shows the realistic
    # sampled-serving win rather than greedy's deterministic acceptance
    from speech_resynth_tpu.models.llama import lookup_sample_decode

    ls = dict(samp_kw, eos_token_id=cfg.eos_token_id, ngram=2, spec_tokens=7)
    np.asarray(lookup_sample_decode(model, variables, prompt, **ls))
    t0 = time.perf_counter()
    for _ in range(3):
        _, sstats_rand = lookup_sample_decode(model, variables, prompt, return_stats=True, **ls)
    lookup_samp_rand_tps = 3 * 16 * 96 / (time.perf_counter() - t0)

    np.asarray(lookup_sample_decode(model, variables, cyc_prompt, **ls))
    t0 = time.perf_counter()
    for _ in range(3):
        _, sstats_cyc = lookup_sample_decode(model, variables, cyc_prompt, return_stats=True, **ls)
    lookup_samp_cyc_tps = 3 * 16 * 96 / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "speech_lm_scoring_tokens_per_sec_per_chip",
                "value": round(scoring_tps, 0),
                "unit": "tokens/s",
                "decode_tokens_per_sec": round(decode_tps, 0),
                "sample_decode_tokens_per_sec": round(sample_tps, 0),
                "lookup_decode_random_tokens_per_sec": round(lookup_rand_tps, 0),
                "lookup_decode_random_tok_per_iter": stats_rand["tokens_per_iteration"],
                "lookup_decode_cyclic_tokens_per_sec": round(lookup_cyc_tps, 0),
                "lookup_decode_cyclic_tok_per_iter": stats_cyc["tokens_per_iteration"],
                "lookup_sample_random_tokens_per_sec": round(lookup_samp_rand_tps, 0),
                "lookup_sample_random_tok_per_iter": sstats_rand["tokens_per_iteration"],
                "lookup_sample_cyclic_tokens_per_sec": round(lookup_samp_cyc_tps, 0),
                "lookup_sample_cyclic_tok_per_iter": sstats_cyc["tokens_per_iteration"],
                "scan_layers_tokens_per_sec": round(scan_tps, 0),
                "compile_s_unrolled": round(unrolled_compile_s, 1),
                "compile_s_scan_layers": round(scan_compile_s, 1),
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()

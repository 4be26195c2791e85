#!/usr/bin/env python
"""Speech-LM throughput: sWUGGY/sBLIMP-style scoring + KV-cached decode.

BASELINE.json config 4: "Llama speech LM: BPE unicode-unit scoring"
(hubert.yaml sizes: 768/3072/12L/12H, vocab 16386, batch 96 x 128 tokens)
plus the tokens/sec/chip number for autoregressive generation.

Speculative-decode acceptance is measured on THREE prompt regimes:
random (worst case — pure verify-column overhead), cyclic
(self-continuation — deterministic best case), and GRAMMAR: the model is
briefly trained on the unit-grammar corpus (pipeline/synthetic.py:
make_unit_grammar_corpus, the native sWUGGY analog) and then continues
grammar prompts — a realistic repeating unit stream, which is the entire
value hypothesis of prompt-lookup drafting (models/llama.py:lookup_decode).
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _time_decode(fn, prompt, iters, max_new):
    np.asarray(fn(prompt))  # compile + warmup
    t0 = time.perf_counter()
    stats = None
    for _ in range(iters):
        out = fn(prompt, return_stats=True)
        _, stats = out
    dt = time.perf_counter() - t0
    return iters * prompt.shape[0] * max_new / dt, stats


def _grammar_rows(n_rows: int, row_len: int, seed: int):
    """Token rows packed from the unit-grammar corpus (ids shifted +2 past
    pad=0/eos=1), plus held-out prompt rows from the same grammar."""
    from speech_resynth_tpu.pipeline.synthetic import make_unit_grammar_corpus

    with tempfile.TemporaryDirectory() as td:
        paths = make_unit_grammar_corpus(td, n_sentences=4000, seed=seed)
        sents = [
            [int(t) + 2 for t in line.split()]
            for line in Path(paths["train_file"]).read_text().splitlines()
        ]
    stream = [t for s in sents for t in s]
    n_tok = n_rows * row_len
    reps = -(-n_tok // len(stream))
    flat = np.asarray((stream * reps)[:n_tok], np.int32)
    return flat.reshape(n_rows, row_len)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="CPU smoke sizes (timings meaningless)")
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (host sitecustomize pins jax_platforms='axon,cpu')",
    )
    parser.add_argument(
        "--grammar-steps",
        type=int,
        default=None,
        help="training steps for the grammar-acceptance section (default 400 full / 30 tiny; "
        "0 skips the section)",
    )
    parser.add_argument("--iters", type=int, default=None, help="timing iterations (scoring 10 / decode 3)")
    parser.add_argument(
        "--grammar-only",
        action="store_true",
        help="grammar section only (implies --decode-only; skips the random/cyclic suites)",
    )
    parser.add_argument(
        "--decode-only",
        action="store_true",
        help="skip the scoring/scan sections (the unrolled scoring compile alone can cost "
        "15+ min of tunnel time) — decode + grammar suites only",
    )
    args, _ = parser.parse_known_args()
    if args.grammar_only:
        args.decode_only = True

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_resynth_tpu.core.precision import BF16_INFERENCE
    from speech_resynth_tpu.models.convert import stack_llama_layers
    from speech_resynth_tpu.models.llama import (
        LlamaConfig,
        LlamaLM,
        greedy_decode,
        lookup_decode,
        lookup_sample_decode,
        sample_decode,
        sequence_pseudo_log_prob,
    )

    if args.tiny:
        cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2, num_attention_heads=2)
        B, L = 4, 32
        dec_B, dec_prompt, dec_new = 2, 16, 24
        grammar_steps = 30 if args.grammar_steps is None else args.grammar_steps
        score_iters = dec_iters = args.iters or 1
    else:
        cfg = LlamaConfig()
        B, L = 96, 128
        dec_B, dec_prompt, dec_new = 16, 32, 96
        grammar_steps = 400 if args.grammar_steps is None else args.grammar_steps
        score_iters, dec_iters = args.iters or 10, args.iters or 3

    model = LlamaLM(cfg, policy=BF16_INFERENCE)
    variables = model.init(jax.random.key(0), jnp.ones((1, 8), jnp.int32))

    ids = jnp.asarray(np.random.default_rng(0).integers(2, cfg.vocab_size, (B, L)), jnp.int32)

    scoring = {}
    if not args.decode_only:
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

        bound_score = lambda ids, _f=score, _p=variables["params"]: _f(_p, ids)
        t0 = time.perf_counter()
        for _ in range(score_iters):
            np.asarray(bound_score(ids))
        scoring_tps = score_iters * B * L / (time.perf_counter() - t0)

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
        for _ in range(score_iters):
            np.asarray(score_scan(stacked, ids))
        scan_tps = score_iters * B * L / (time.perf_counter() - t0)
        scoring = {
            "value": round(scoring_tps, 0),
            "scan_layers_tokens_per_sec": round(scan_tps, 0),
            "compile_s_unrolled": round(unrolled_compile_s, 1),
            "compile_s_scan_layers": round(scan_compile_s, 1),
        }

    prompt = ids[:dec_B, :dec_prompt]
    samp_kw = dict(max_new_tokens=dec_new, temperature=0.9, top_k=64, top_p=0.95)
    lk = dict(max_new_tokens=dec_new, eos_token_id=cfg.eos_token_id, ngram=2, spec_tokens=7)
    ls = dict(samp_kw, eos_token_id=cfg.eos_token_id, ngram=2, spec_tokens=7)

    def decode_suite(variables, prompt, tag):
        """tok/s + acceptance for plain/speculative greedy + sampled decode
        on one prompt regime; prompt-lookup drafts, so acceptance is a joint
        property of the stream AND what the model continues it with."""
        out = {}
        np.asarray(greedy_decode(model, variables, prompt, max_new_tokens=dec_new))
        t0 = time.perf_counter()
        for _ in range(dec_iters):
            np.asarray(greedy_decode(model, variables, prompt, max_new_tokens=dec_new))
        out[f"decode_{tag}_tokens_per_sec"] = round(dec_iters * prompt.shape[0] * dec_new / (time.perf_counter() - t0), 0)

        tps, st = _time_decode(
            lambda p, return_stats=False: lookup_decode(model, variables, p, return_stats=return_stats, **lk),
            prompt, dec_iters, dec_new,
        )
        out[f"lookup_decode_{tag}_tokens_per_sec"] = round(tps, 0)
        out[f"lookup_decode_{tag}_tok_per_iter"] = st["tokens_per_iteration"]

        rng = jax.random.key(0)
        np.asarray(sample_decode(model, variables, prompt, rng=rng, **samp_kw))
        t0 = time.perf_counter()
        for _ in range(dec_iters):
            np.asarray(sample_decode(model, variables, prompt, rng=rng, **samp_kw))
        out[f"sample_decode_{tag}_tokens_per_sec"] = round(dec_iters * prompt.shape[0] * dec_new / (time.perf_counter() - t0), 0)

        tps, st = _time_decode(
            lambda p, return_stats=False: lookup_sample_decode(model, variables, p, rng=rng, return_stats=return_stats, **ls),
            prompt, dec_iters, dec_new,
        )
        out[f"lookup_sample_{tag}_tokens_per_sec"] = round(tps, 0)
        out[f"lookup_sample_{tag}_tok_per_iter"] = st["tokens_per_iteration"]
        return out

    results = {}
    # (a) random prompt, random weights: acceptance ~0 — pure overhead of the
    # S extra verify columns.  (b) cyclic: self-continuation prompt (greedy
    # output fed back) — deterministic acceptance upper bound.
    if not args.grammar_only:
        results.update(decode_suite(variables, prompt, "random"))
        cyc_prompt = greedy_decode(model, variables, prompt[:, :dec_prompt // 2], max_new_tokens=dec_prompt - dec_prompt // 2)
        results.update(decode_suite(variables, cyc_prompt, "cyclic"))

    # (c) GRAMMAR: train briefly on the unit-grammar corpus, then continue
    # held-out grammar prompts — the realistic repeating-unit-stream case
    # (VERDICT r4 #1c).  Reference scoring path: speechlm/eval.py:83-89.
    grammar = {}
    if grammar_steps > 0:
        from speech_resynth_tpu.core.mesh import make_mesh
        from speech_resynth_tpu.train.speechlm import SpeechLMTrainerConfig, make_speechlm_trainer

        row_len = min(48, L)
        n_rows = 256 if not args.tiny else 16
        train_B = 32 if not args.tiny else 4
        rows = _grammar_rows(n_rows, row_len, seed=0)
        mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
        tcfg = SpeechLMTrainerConfig(batch_size_per_device=train_B, units_per_sample=row_len, warmup_steps=20)
        _, state, step_fn, _ = make_speechlm_trainer(cfg, tcfg, mesh, total_steps=grammar_steps)

        rng = np.random.default_rng(1)
        t0 = time.perf_counter()
        metrics = None
        for s in range(grammar_steps):
            rows_s = jnp.asarray(rows[rng.integers(0, n_rows, train_B)])
            batch = {
                "input_ids": rows_s,
                "attention_mask": jnp.ones_like(rows_s, jnp.bool_),
                "labels": rows_s,
            }
            state, metrics = step_fn(state, batch)
        final_loss = float(np.asarray(metrics["loss"]))
        grammar_train_s = time.perf_counter() - t0
        # params must stay DEVICE-resident: a device_get here made every
        # timed apply re-upload the full weight tree through the tunnel
        # (measured: plain decode fell 17.8k -> 134 tok/s; r5 harness fix)
        trained = {"params": state.params}
        grammar["grammar_train_steps"] = grammar_steps
        grammar["grammar_final_loss"] = round(final_loss, 3)
        grammar["grammar_train_s"] = round(grammar_train_s, 1)

        g_prompt = jnp.asarray(_grammar_rows(dec_B, dec_prompt, seed=7))
        results.update(decode_suite(trained, g_prompt, "grammar"))
        # B=1 single-stream rows: the realistic speculative regime.  The
        # batch path commits in LOCKSTEP at the MIN acceptance across rows
        # (models/llama.py:_lookup_decode_impl), so at dec_B=16 one
        # mismatching row stalls all 16 and tokens/iteration pins near 1 —
        # the serving case for speculative decode is per-stream generation
        # (pipeline/generate.py:continue_speech runs B=1).
        results.update(decode_suite(trained, g_prompt[:1], "grammar_b1"))
        # draft-block-size sweep at B=1: the verify block's per-iteration
        # cost rises with S, so the break-even acceptance does too — S is a
        # dispatch knob, measured like every other gate in this repo
        for S in (2, 3):
            tps, st = _time_decode(
                lambda p, return_stats=False, _S=S: lookup_decode(
                    model, trained, p, return_stats=return_stats,
                    max_new_tokens=dec_new, eos_token_id=cfg.eos_token_id, ngram=2, spec_tokens=_S,
                ),
                g_prompt[:1], dec_iters, dec_new,
            )
            results[f"lookup_decode_grammar_b1_s{S}_tokens_per_sec"] = round(tps, 0)
            results[f"lookup_decode_grammar_b1_s{S}_tok_per_iter"] = st["tokens_per_iteration"]

    print(
        json.dumps(
            {
                "metric": "speech_lm_scoring_tokens_per_sec_per_chip",
                "unit": "tokens/s",
                **scoring,
                **results,
                **grammar,
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()

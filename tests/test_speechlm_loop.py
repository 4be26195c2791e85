"""Speech-LM epoch loop: end-to-end tiny training with resume + eval path."""

import json
from pathlib import Path

import numpy as np
import pytest

from speech_resynth_tpu.core.config import config_from_dict


def make_cfg(tmp_path, epoch=2):
    rng = np.random.default_rng(0)
    train_file = tmp_path / "train.txt"
    with open(train_file, "w") as f:
        for _ in range(32):
            toks = rng.integers(0, 20, rng.integers(6, 20))
            f.write(" ".join(map(str, toks)) + "\n")

    # sLM21-style score inputs
    for name in ("swuggy_dev", "sblimp_dev", "swuggy_test", "sblimp_test"):
        (tmp_path / f"{name}.json").write_text(json.dumps({f"{name}_a": [1, 2, 3], f"{name}_b": [2, 3]}))

    return config_from_dict(
        {
            "dataset": {
                "train_file": str(train_file),
                "units_per_sample": 8,
                "swuggy_dev_file": str(tmp_path / "swuggy_dev.json"),
                "sblimp_dev_file": str(tmp_path / "sblimp_dev.json"),
                "swuggy_test_file": str(tmp_path / "swuggy_test.json"),
                "sblimp_test_file": str(tmp_path / "sblimp_test.json"),
                "swuggy_dir": str(tmp_path / "no_lex"),
                "sblimp_dir": str(tmp_path / "no_syn"),
                "result_dir": str(tmp_path / "results"),
            },
            "dataloader": {"batch_size_per_device": 2, "num_workers": 0},
            "model": {
                "path": str(tmp_path / "model"),
                "vocab_size": 22,
                "hidden_size": 16,
                "intermediate_size": 32,
                "num_hidden_layers": 1,
                "num_attention_heads": 2,
                "pad_token_id": 0,
                "bos_token_id": None,
                "eos_token_id": 1,
            },
            "optim": {
                "epoch": epoch,
                "warmup_steps": 2,
                "lr": 1e-3,
                "lr_min": 1e-4,
                "beta1": 0.9,
                "beta2": 0.98,
                "max_norm": 1.0,
                "summary_interval": 1,
            },
        }
    )


def test_speechlm_loop_resume_and_scores(tmp_path):
    from speech_resynth_tpu.pipeline.train_loops import train_speechlm

    cfg = make_cfg(tmp_path, epoch=1)
    train_speechlm(cfg)

    ckpt_dir = Path(cfg.model.path) / "ckpt"
    steps = sorted(int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit())
    # 32 seqs / (2 per-device * 8 devices) = 2 steps/epoch
    assert steps[-1] == 2

    # dev validation wrote pseudo-log-prob score files even though no
    # zrc/gold data exists (scoring stops at file level)
    lex = Path(cfg.dataset.result_dir) / "lexical/dev.txt"
    assert lex.is_file()
    lines = lex.read_text().splitlines()
    assert len(lines) == 2 and all(len(l.split()) == 2 for l in lines)

    # resume one more epoch
    cfg2 = make_cfg(tmp_path, epoch=2)
    train_speechlm(cfg2)
    steps2 = sorted(int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit())
    assert steps2[-1] == 4

    # eval stage: restores the checkpoint, writes test score files; with no
    # gold CSVs and no zrc installed the aggregate result is None
    from speech_resynth_tpu.pipeline.train_loops import eval_speechlm

    result = eval_speechlm(cfg2)
    assert result is None
    test_scores = Path(cfg2.dataset.result_dir) / "lexical/test.txt"
    assert test_scores.is_file()
    assert len(test_scores.read_text().splitlines()) == 2


def test_speechlm_generate_stage(tmp_path):
    """CLI 'generate': prompt wav -> units -> trained-LM sampling -> units."""
    import jax
    from speech_resynth_tpu import models as _m  # noqa: F401  (package import path)
    from speech_resynth_tpu.dsp import audio_io
    from speech_resynth_tpu.models import speech_encoder as SE
    from speech_resynth_tpu.models.hubert import HubertConfig
    from speech_resynth_tpu.pipeline.train_loops import generate_speechlm, train_speechlm
    from speech_resynth_tpu.text.units import units_to_unicode
    from speech_resynth_tpu.tokenizers.bpe import BpeTokenizer

    SE.DENSE_MODELS["_gen_tiny"] = {
        "config": HubertConfig(
            hidden_size=16,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=24,
            conv_dim=(8, 8, 8),
            conv_kernel=(10, 8, 4),
            conv_stride=(10, 8, 4),
            num_conv_pos_embeddings=8,
            num_conv_pos_embedding_groups=2,
        ),
        "output_layer": 1,
    }
    try:
        cfg_dict = dict(make_cfg(tmp_path, epoch=1))
        # BPE over the full unit alphabet, vocab matching model.vocab_size so
        # every sampled LM id maps back to a token
        rng = np.random.default_rng(3)
        lines = [units_to_unicode(rng.integers(0, 20, 16)) for _ in range(40)]
        tokenizer = BpeTokenizer.train(lines, vocab_size=22, initial_alphabet=units_to_unicode(range(20)))
        tok_path = tmp_path / "tokenizer.json"
        tokenizer.save(str(tok_path))
        cfg = config_from_dict(
            {
                **{k: dict(v) for k, v in cfg_dict.items()},
                "s2u": {
                    "dense_model_name": "_gen_tiny",
                    "quantizer_model_name": "kmeans",
                    "vocab_size": 20,
                    "tokenizer_path": str(tok_path),
                },
            }
        )
        train_speechlm(cfg)

        t = np.arange(16000) / 16000
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        wav += 0.01 * np.random.default_rng(0).standard_normal(wav.size).astype(np.float32)
        audio_io.write(tmp_path / "prompt.wav", wav, 16000)

        result = generate_speechlm(
            cfg, str(tmp_path / "prompt.wav"), max_new_tokens=6, temperature=0.8, top_k=5, seed=1
        )
        assert result["waveform"] is None  # no decoder dir given
        gen = result["generated_units"]
        assert gen.dtype == np.int32 and ((gen >= 0) & (gen < 20)).all()
        assert len(result["units"]) >= len(gen)
    finally:
        SE.DENSE_MODELS.pop("_gen_tiny", None)


def test_speechlm_hf_export_loads_in_torch(tmp_path):
    """The loop's rank-0 save_pretrained parity (speechlm/train.py:211):
    the exported directory must load with HF LlamaForCausalLM and produce
    the same logits as our model."""
    import jax
    import jax.numpy as jnp

    from speech_resynth_tpu.pipeline.train_loops import train_speechlm

    cfg = make_cfg(tmp_path, epoch=1)
    train_speechlm(cfg)

    hf_dir = Path(cfg.model.path) / "hf"
    assert (hf_dir / "model.safetensors").is_file()

    import torch
    from transformers import LlamaForCausalLM

    torch_model = LlamaForCausalLM.from_pretrained(hf_dir).eval()

    # our model from the checkpoint
    from speech_resynth_tpu.core.mesh import make_mesh
    from speech_resynth_tpu.core.checkpoint import CheckpointManager
    from speech_resynth_tpu.core.precision import FLOAT32
    from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM
    from speech_resynth_tpu.train.speechlm import SpeechLMTrainerConfig, make_speechlm_trainer

    model_config = LlamaConfig(
        vocab_size=cfg.model.vocab_size + 2,
        hidden_size=cfg.model.hidden_size,
        intermediate_size=cfg.model.intermediate_size,
        num_hidden_layers=cfg.model.num_hidden_layers,
        num_attention_heads=cfg.model.num_attention_heads,
        pad_token_id=0,
        eos_token_id=1,
    )
    _, state, _, _ = make_speechlm_trainer(
        model_config, SpeechLMTrainerConfig(batch_size_per_device=1, units_per_sample=8), make_mesh(), 10
    )
    with CheckpointManager(Path(cfg.model.path) / "ckpt") as ckpt:
        state = ckpt.restore(state)

    ids = np.random.default_rng(0).integers(2, model_config.vocab_size, (2, 8)).astype(np.int64)
    with torch.no_grad():
        theirs = torch_model(torch.from_numpy(ids)).logits.numpy()
    lm = LlamaLM(model_config, policy=FLOAT32, attn_implementation="xla")
    ours, _ = lm.apply({"params": state.params}, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-3, atol=2e-4)


def test_load_lm_from_hf_roundtrip(tmp_path):
    """Training export -> load_lm_from_hf -> identical logits (both layer
    layouts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_resynth_tpu.core.precision import FLOAT32
    from speech_resynth_tpu.models.export import llama_state_dict, save_pretrained
    from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM
    from speech_resynth_tpu.pipeline.speechlm import load_lm_from_hf

    cfg = LlamaConfig(vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=2, num_attention_heads=2)
    model = LlamaLM(cfg, policy=FLOAT32, attn_implementation="xla")
    ids = jnp.asarray(np.random.default_rng(0).integers(2, 32, (2, 8)), jnp.int32)
    variables = model.init(jax.random.key(0), ids)
    ref = np.asarray(model.apply(variables, ids)[0])

    out = tmp_path / "hf"
    save_pretrained(
        out,
        llama_state_dict(variables["params"]),
        {
            "model_type": "llama",
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_hidden_layers,
            "num_attention_heads": cfg.num_attention_heads,
            "pad_token_id": 0,
            "eos_token_id": 1,
        },
    )
    for scan in (False, True):
        m2, v2 = load_lm_from_hf(str(out), policy=FLOAT32, scan_layers=scan)
        got = np.asarray(m2.apply(v2, ids)[0])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

"""Epoch-loop integration: CFM training end-to-end on a synthetic corpus,
with checkpoint resume (capability the reference lacks, train.py:167)."""

import json
from pathlib import Path

import numpy as np
import pytest

from speech_resynth_tpu.core.config import config_from_dict
from speech_resynth_tpu.models import speech_encoder as SE
from speech_resynth_tpu.models.hubert import HubertConfig


@pytest.fixture()
def cfm_corpus(tmp_path):
    """Unit JSON + mel .npy cache for 6 tiny utterances."""
    rng = np.random.default_rng(0)
    spec_dir = tmp_path / "spec"
    units = {}
    for i in range(6):
        name = f"train/u{i}"
        T = 24
        units[name] = {
            "units": rng.integers(0, 9, T).tolist(),
            "durations": [1] * T,
            "transcript": f"utt {i}",
        }
        mel = rng.standard_normal((T, 80)).astype(np.float32)
        out = spec_dir / f"{name}.npy"
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(out, mel)
    train_file = tmp_path / "train.json"
    train_file.write_text(json.dumps(units))
    return tmp_path, train_file, spec_dir


def make_cfg(tmp_path, train_file, spec_dir, epoch=2):
    SE.DENSE_MODELS["_loops_tiny"] = {
        "config": HubertConfig(
            hidden_size=16,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=24,
            conv_dim=(8, 8),
            conv_kernel=(10, 4),
            conv_stride=(5, 4),
            num_conv_pos_embeddings=8,
            num_conv_pos_embedding_groups=2,
        ),
        "output_layer": 1,
    }
    return config_from_dict(
        {
            "common": {"seed": 0},
            "dataset": {
                "wav_dir": str(tmp_path / "none"),
                "spectrogram_dir": str(spec_dir),
                "ext_audio": ".wav",
                "train_file": str(train_file),
                "dev_file": str(tmp_path / "missing_dev.json"),
            },
            "flow_matching": {
                "path": str(tmp_path / "model"),
                "batch_size": 2,
                "frames_per_seg": 16,
                "epoch": epoch,
                "warmup_steps": 2,
                "lr": 1e-3,
                "lr_min": 1e-4,
                "max_norm": 0.1,
                "summary_interval": 1,
                "save_interval_epoch": 1,
                "dt": 0.5,
                "truncation_value": 1.0,
                "dense_model_name": "_loops_tiny",
                "quantizer_model_name": "kmeans",
                "vocab_size": 9,
                "dim_in": 80,
                "dim_cond_emb": 16,
                "hidden_size": 16,
                "depth": 2,
                "heads": 2,
                "intermediate_size": 24,
                "ff_dropout": 0.0,
                "use_unet_skip_connection": False,
                "conv_pos_embed_kernel_size": 7,
                "conv_pos_embed_groups": 16,
                "attn_dropout": 0.0,
                "mean": -5.8843,
                "std": 2.2615,
                "predict_duration": False,
            },
        }
    )


def test_cfm_training_loop_and_resume(cfm_corpus):
    from speech_resynth_tpu.pipeline.train_loops import train_flow_matching

    tmp_path, train_file, spec_dir = cfm_corpus
    cfg = make_cfg(tmp_path, train_file, spec_dir, epoch=2)
    train_flow_matching(cfg)

    ckpt_dir = Path(cfg.flow_matching.path) / "ckpt"
    steps = sorted(int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit())
    assert steps, "no checkpoints written"
    # 6 utts / batch 2 = 3 steps/epoch, 2 epochs -> step 6 saved
    assert steps[-1] == 6

    # HF-format export exists and loads back through the converter
    hf_dir = Path(cfg.flow_matching.path) / "hf"
    assert (hf_dir / "model.safetensors").is_file()
    from safetensors.numpy import load_file

    from speech_resynth_tpu.models.convert import cfm_model_params

    restored = cfm_model_params(load_file(str(hf_dir / "model.safetensors")))
    assert "to_cond_emb" in restored["params"]

    # resume: raise epochs to 3 and continue from step 6
    cfg2 = make_cfg(tmp_path, train_file, spec_dir, epoch=3)
    train_flow_matching(cfg2)
    steps2 = sorted(int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit())
    assert steps2[-1] == 9, f"resume did not continue: {steps2}"

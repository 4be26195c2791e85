"""Full CLI chain through the real dispatchers (main_resynth.py:40-45
parity): one YAML config drives resample → tokenize → extract_features →
train_hifigan → train_flow_matching → evaluate, then synthesize — exactly
`python -m speech_resynth_tpu.cli.resynth all` at toy scale."""

import json
from pathlib import Path

import numpy as np
import pytest

from speech_resynth_tpu.dsp import audio_io
from speech_resynth_tpu.models import speech_encoder as SE
from speech_resynth_tpu.models.hubert import HubertConfig


def _write_corpus(root: Path, n=6):
    rng = np.random.default_rng(0)
    orig = root / "orig"
    for i in range(n):
        split = "train-clean-100" if i < 4 else ("dev-clean" if i == 4 else "test-clean")
        d = orig / split / str(i) / "c1"
        d.mkdir(parents=True, exist_ok=True)
        t = np.arange(12000) / 24000
        wav = (0.3 * np.sin(2 * np.pi * (180 + 60 * i) * t) + 0.15 * np.sin(2 * np.pi * (900 + 200 * i) * t)).astype(
            np.float32
        )
        wav += 0.01 * rng.standard_normal(12000).astype(np.float32)
        audio_io.write(d / f"utt{i}.wav", wav, 24000)
        (d / f"utt{i}.normalized.txt").write_text(f"utterance {i}\n")


def _register_encoder():
    # x320 total stride like the real towers, so unit rate ~= mel frame rate
    SE.DENSE_MODELS["_cli_tiny"] = {
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


def _write_yaml(root: Path) -> Path:
    cfg = f"""
common:
  seed: 0
dataset:
  wav_dir: "{root}/16k"
  wav_dir_orig: "{root}/orig"
  spectrogram_dir: "{root}/spec"
  vad: false
  preprocess_batch_size: 2
  ext_audio: ".wav"
  train_file: "{root}/units/train.json"
  dev_file: "{root}/units/dev.json"
  test_file: "{root}/units/test.json"
synthesis:
  src_dir: "{root}/16k"
  tgt_dir: "{root}/resynth"
  split: "test-*"
  ext_audio: ".wav"
eval:
  result_path: "{root}/results/score.csv"
hifigan:
  path: "{root}/hifigan"
  batch_size: 2
  segment_size: 2640
  training_epochs: 1
  learning_rate: 2.0e-4
  adam_b1: 0.8
  adam_b2: 0.99
  lr_decay: 0.999
  seed: 1234
  n_fft: 400
  hop_size: 320
  upsample_rates: [5, 4, 4, 2, 2]
  upsample_kernel_sizes: [10, 9, 8, 4, 4]
  upsample_initial_channel: 64
  resblock_kernel_sizes: [3]
  resblock_dilation_sizes: [[1, 3]]
  stdout_interval: 100
  summary_interval: 100
  checkpoint_interval: 1000000000
  validation_interval: 1000000000
flow_matching:
  path: "{root}/cfm"
  batch_size: 2
  frames_per_seg: 8
  epoch: 2
  warmup_steps: 2
  lr: 1.0e-3
  lr_min: 1.0e-4
  max_norm: 0.1
  summary_interval: 10
  save_interval_epoch: 2
  dt: 0.5
  truncation_value: 1.0
  dense_model_name: "_cli_tiny"
  quantizer_model_name: "kmeans"
  vocab_size: 9
  dim_in: 80
  dim_cond_emb: 16
  hidden_size: 16
  depth: 2
  heads: 2
  intermediate_size: 24
  ff_dropout: 0.0
  use_unet_skip_connection: false
  conv_pos_embed_kernel_size: 7
  conv_pos_embed_groups: 16
  attn_dropout: 0.0
  mean: -5.8843
  std: 2.2615
  predict_duration: false
flow_matching_with_hifigan:
  name: "{root}/no_such_composite"
  batch_size: 2
"""
    path = root / "config.yaml"
    path.write_text(cfg)
    return path


@pytest.mark.slow
def test_cli_full_chain(tmp_path):
    from speech_resynth_tpu.cli.resynth import main

    _write_corpus(tmp_path)
    _register_encoder()
    cfg_path = _write_yaml(tmp_path)

    main(["all", "--config", str(cfg_path)])

    # preprocessing artifacts
    assert len(list((tmp_path / "16k").glob("**/*.wav"))) == 6
    units = json.loads((tmp_path / "units/train.json").read_text())
    assert len(units) == 4
    assert len(list((tmp_path / "spec").glob("**/*.npy"))) == 6

    # both trainers exported loadable HF-format dirs
    assert (tmp_path / "hifigan/model.safetensors").is_file()
    assert (tmp_path / "cfm/hf/model.safetensors").is_file()

    # evaluate wrote the six-row CSV through the trained exports
    csv = (tmp_path / "results/score.csv").read_text().splitlines()
    assert len(csv) == 7  # header + 6 metric rows

    main(["synthesize", "--config", str(cfg_path)])
    outs = list((tmp_path / "resynth").glob("**/*.wav"))
    assert len(outs) == 1
    wav, sr = audio_io.read(outs[0])
    assert sr == 16000 and len(wav) > 1000

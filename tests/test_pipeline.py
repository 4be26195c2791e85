"""End-to-end pipeline tests on a tiny synthetic corpus: resample ->
tokenize -> extract_features -> CFM steps -> synthesize -> evaluate, plus
the speech-LM stages (encode/tokenize/score files) and datasets."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from speech_resynth_tpu.core.config import config_from_dict
from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.dsp import audio_io
from speech_resynth_tpu.models.cfm import CFMConfig
from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
from speech_resynth_tpu.models.hifigan import HifiGanConfig
from speech_resynth_tpu.models.hubert import HubertConfig
from speech_resynth_tpu.models import speech_encoder as SE


TINY_HUBERT = {
    "config": HubertConfig(
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=24,
        conv_dim=(8, 8),
        conv_kernel=(10, 4),
        conv_stride=(5, 4),  # x20 downsample
        num_conv_pos_embeddings=8,
        num_conv_pos_embedding_groups=2,
    ),
    "output_layer": 1,
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """LibriTTS-R-shaped tree: 4 utterances at 24 kHz with transcripts."""
    root = tmp_path_factory.mktemp("corpus")
    orig = root / "orig"
    rng = np.random.default_rng(0)
    names = []
    for split, spk in [("train-clean-100", "1"), ("train-clean-100", "2"), ("dev-clean", "3"), ("test-clean", "4")]:
        d = orig / split / spk / "c1"
        d.mkdir(parents=True, exist_ok=True)
        name = f"{split}/{spk}/c1/utt{spk}"
        wav = (0.3 * np.sin(2 * np.pi * (200 + 100 * int(spk)) * np.arange(12000) / 24000)).astype(np.float32)
        wav += 0.01 * rng.standard_normal(12000).astype(np.float32)
        audio_io.write(orig / (name + ".wav"), wav, 24000)
        (orig / (name + ".normalized.txt")).write_text(f"utterance {spk}\n")
        names.append(name)
    return root, orig, names


@pytest.fixture(scope="module")
def tiny_encoder():
    SE.DENSE_MODELS["_pipeline_tiny"] = TINY_HUBERT
    return SE.SpeechEncoder.by_name("_pipeline_tiny", "kmeans", 9, deduplicate=False, policy=FLOAT32)


def make_config(root: Path):
    return config_from_dict(
        {
            "common": {"seed": 0},
            "dataset": {
                "wav_dir": str(root / "16k"),
                "wav_dir_orig": str(root / "orig"),
                "spectrogram_dir": str(root / "spec"),
                "vad": False,
                "preprocess_batch_size": 2,
                "ext_audio": ".wav",
                "train_file": str(root / "units/train.json"),
                "dev_file": str(root / "units/dev.json"),
                "test_file": str(root / "units/test.json"),
            },
            "synthesis": {
                "src_dir": str(root / "16k"),
                "tgt_dir": str(root / "resynth"),
                "split": "test-*",
                "ext_audio": ".wav",
            },
            "eval": {"result_path": str(root / "results/score.csv")},
            "flow_matching": {
                "dt": 0.5,
                "truncation_value": 1.0,
                "dense_model_name": "_pipeline_tiny",
                "quantizer_model_name": "kmeans",
                "vocab_size": 9,
                "predict_duration": False,
            },
            "flow_matching_with_hifigan": {"name": "unused", "batch_size": 2},
        }
    )


def tiny_decoder():
    cfm = CFMConfig(
        vocab_size=9,
        dim_in=8,
        dim_cond_emb=16,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
    )
    voc = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    return ConditionalFlowMatchingWithHifiGan.from_config(cfm, voc, policy=FLOAT32)


def test_preprocess_stages(corpus, tiny_encoder):
    from speech_resynth_tpu.pipeline.preprocess import extract_features, resample, tokenize

    root, orig, names = corpus
    cfg = make_config(root)

    resample(cfg)
    wav16 = root / "16k"
    resampled = sorted(wav16.glob("**/*.wav"))
    assert len(resampled) == 4
    sr, ch, frames = audio_io.info(resampled[0])
    assert sr == 16000
    assert abs(frames - 8000) <= 2  # 12000 @24k -> ~8000 @16k

    tokenize(cfg, encoder=tiny_encoder)
    with open(cfg.dataset.train_file) as f:
        train_units = json.load(f)
    assert len(train_units) == 2
    sample = next(iter(train_units.values()))
    assert len(sample["units"]) > 0
    assert len(sample["units"]) == len(sample["durations"])
    # train transcripts resolve against wav_dir (16k tree, no .txt) — empty,
    # matching the reference when wav_dir != wav_dir_orig; dev/test use
    # wav_dir_orig (preprocess.py:44-46)
    with open(cfg.dataset.dev_file) as f:
        dev_units = json.load(f)
    assert next(iter(dev_units.values()))["transcript"].startswith("utterance")

    extract_features(cfg)
    specs = sorted((root / "spec").glob("**/*.npy"))
    assert len(specs) == 4
    mel = np.load(specs[0])
    assert mel.ndim == 2 and mel.shape[1] == 80
    # idempotent: re-run skips silently
    extract_features(cfg)


def test_synthesize_and_evaluate(corpus, tiny_encoder):
    from speech_resynth_tpu.pipeline.evaluate import evaluate
    from speech_resynth_tpu.pipeline.preprocess import resample, tokenize
    from speech_resynth_tpu.pipeline.scorers import EnergyMOS, NullASR
    from speech_resynth_tpu.pipeline.synthesize import synthesize

    root, orig, names = corpus
    cfg = make_config(root)
    if not (root / "16k").exists():
        resample(cfg)
    if not Path(cfg.dataset.test_file).exists():
        tokenize(cfg, encoder=tiny_encoder)

    decoder = tiny_decoder()
    synthesize(cfg, encoder=tiny_encoder, decoder=decoder)
    outs = sorted((root / "resynth").glob("**/*.wav"))
    assert len(outs) == 1  # one test-split utterance
    wav, sr = audio_io.read(outs[0])
    assert sr == 16000 and len(wav) > 0

    # evaluate writes the six-row CSV; Null/Energy scorers keep it hermetic
    df = evaluate(cfg, decoder=decoder, asr=NullASR(), mos=EnergyMOS())
    assert list(df.index) == ["WER (hyp)", "CER (hyp)", "MOS (hyp)", "WER (ref)", "CER (ref)", "MOS (ref)"]
    assert Path(cfg.eval.result_path).is_file()
    assert 1.0 <= float(df.loc["MOS (ref)", "score"]) <= 5.0
    # scorer provenance: smoke-mode CSVs are visibly smoke-mode
    assert df.loc["WER (hyp)", "scorer"] == "NullASR"
    assert df.loc["MOS (hyp)", "scorer"] == "EnergyMOS"
    assert "scorer" in Path(cfg.eval.result_path).read_text()


def test_speechlm_stages(tmp_path, tiny_encoder):
    from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM
    from speech_resynth_tpu.pipeline.speechlm import _encode_paths, write_scores
    from speech_resynth_tpu.pipeline.data import UnitTextDataset
    from speech_resynth_tpu.text.units import shift_unit
    from speech_resynth_tpu.tokenizers.bpe import BpeTokenizer

    # encode: wavs -> unicode lines
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = wav_dir / f"u{i}.wav"
        audio_io.write(p, 0.2 * rng.standard_normal(4000).astype(np.float32), 16000)
        paths.append(p)
    unicode_file = tmp_path / "unicode_train1"
    # dedup variant of the tiny encoder
    enc = SE.SpeechEncoder.by_name("_pipeline_tiny", "kmeans", 9, deduplicate=True, policy=FLOAT32)
    _encode_paths(enc, paths, unicode_file, batch_size=2)
    lines = unicode_file.read_text().splitlines()
    assert len(lines) == 3 and all(lines)

    # tokenize: BPE train + id lines
    alphabet = [chr(shift_unit(u)) for u in range(9)]
    tok = BpeTokenizer.train(lines, 16, alphabet)
    train_file = tmp_path / "train.txt"
    with open(train_file, "w") as f:
        for l in lines:
            f.write(" ".join(map(str, tok.encode(l))) + "\n")

    ds = UnitTextDataset(train_file, units_per_sample=8)
    batch = next(ds.batches(2, seed=0))
    assert batch["input_ids"].shape == (2, 8)
    assert np.all(batch["labels"][batch["input_ids"] == 0] == -100)

    # scoring file
    slm_json = tmp_path / "dev.json"
    slm_json.write_text(json.dumps({"a": [1, 2, 3], "b": [2, 3]}))
    cfg = LlamaConfig(vocab_size=20, hidden_size=16, intermediate_size=32, num_hidden_layers=1, num_attention_heads=2)
    lm = LlamaLM(cfg, policy=FLOAT32, attn_implementation="xla")
    variables = lm.init(jax.random.key(0), np.ones((1, 4), np.int32))
    out_file = tmp_path / "scores.txt"
    write_scores(lm, variables, slm_json, out_file, batch_size=2)
    score_lines = out_file.read_text().splitlines()
    assert len(score_lines) == 2
    name, score = score_lines[0].split()
    assert name == "a" and np.isfinite(float(score))


def test_slm21_aggregation(tmp_path):
    import pandas as pd

    from speech_resynth_tpu.pipeline.speechlm import aggregate_slm21_scores

    scores = tmp_path / "scores"
    scores.mkdir()
    pd.DataFrame({"frequency": ["oov", "high"], "n": [10, 30], "score": [0.5, 0.9]}).set_index("frequency").to_csv(
        scores / "score_lexical_test_by_frequency.csv"
    )
    pd.DataFrame({"type": ["t1", "t2"], "n": [5, 15], "score": [0.6, 0.8]}).set_index("type").to_csv(
        scores / "score_syntactic_test_by_type.csv"
    )
    df = aggregate_slm21_scores(tmp_path, "test")
    assert df.loc["sWUGGY all"].iloc[0] == pytest.approx((10 * 0.5 + 30 * 0.9) / 40)
    assert df.loc["sWUGGY in-vocab"].iloc[0] == pytest.approx(0.9)
    assert df.loc["sWUGGY out-of-vocab"].iloc[0] == pytest.approx(0.5)
    assert df.loc["sBLIMP"].iloc[0] == pytest.approx((5 * 0.6 + 15 * 0.8) / 20)
    assert (tmp_path / "scores/score.csv").is_file()


def test_cli_dispatch_unknown_stage():
    from speech_resynth_tpu.cli.resynth import run_stage

    with pytest.raises(SystemExit):
        run_stage("bogus", None)


def test_global_batch_plan_multihost_consistency():
    """ADVICE r1: every host must see the same number of steps per epoch
    (len(dataset)//global_batch), drawing global_batch/P local examples per
    step, with each global batch exactly partitioned across hosts."""
    from speech_resynth_tpu.pipeline.data import _global_batch_plan

    n, global_batch, P = 37, 8, 4
    per_host = [
        list(_global_batch_plan(n, global_batch, True, seed=3, epoch=2, drop_last=True,
                                process_index=p, process_count=P))
        for p in range(P)
    ]
    expected_steps = n // global_batch
    assert all(len(plans) == expected_steps for plans in per_host)
    for b in range(expected_steps):
        gidx = per_host[0][b][0]
        # all hosts agree on the global batch
        for p in range(P):
            np.testing.assert_array_equal(per_host[p][b][0], gidx)
        # local slices partition it exactly, in order
        concat = np.concatenate([per_host[p][b][1] for p in range(P)])
        np.testing.assert_array_equal(concat, gidx)
        assert all(len(per_host[p][b][1]) == global_batch // P for p in range(P))

    # indivisible global batch is an explicit error, not silent desync
    import pytest

    with pytest.raises(ValueError):
        next(_global_batch_plan(16, 6, True, 0, 0, True, 0, 4))


def test_unit_text_dataset_multihost_batches(tmp_path):
    from speech_resynth_tpu.pipeline.data import UnitTextDataset

    train_file = tmp_path / "t.txt"
    with open(train_file, "w") as f:
        for i in range(20):
            f.write(" ".join(str((i + j) % 9) for j in range(12)) + "\n")
    ds = UnitTextDataset(train_file, units_per_sample=8)
    # two hosts, global batch 4 -> each yields 2 rows per step, 5 steps
    b0 = list(ds.batches(4, seed=1, epoch=0, process_index=0, process_count=2))
    b1 = list(ds.batches(4, seed=1, epoch=0, process_index=1, process_count=2))
    assert len(b0) == len(b1) == 5
    for a, b in zip(b0, b1):
        assert a["input_ids"].shape == b["input_ids"].shape == (2, 8)


def test_prefetch_order_and_errors():
    from speech_resynth_tpu.pipeline.prefetch import prefetch

    assert list(prefetch(range(10), transform=lambda x: x * 2, depth=3)) == [x * 2 for x in range(10)]
    assert list(prefetch(iter([]), depth=1)) == []

    def boom():
        yield 1
        raise ValueError("input pipeline died")

    out = []
    with pytest.raises(ValueError, match="input pipeline died"):
        for x in prefetch(boom()):
            out.append(x)
    assert out == [1]

    with pytest.raises(RuntimeError):
        list(prefetch(range(5), transform=lambda x: (_ for _ in ()).throw(RuntimeError("t"))))


def test_prefetch_abandoned_generator_releases_worker():
    """Closing/abandoning the generator early must not leave the worker
    thread blocked on a full queue holding prefetched batches."""
    import threading
    import time

    from speech_resynth_tpu.pipeline.prefetch import prefetch

    base = threading.active_count()
    for _ in range(5):
        it = prefetch(range(1000), transform=lambda x: x * 2, depth=2)
        assert next(it) == 0
        it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == base

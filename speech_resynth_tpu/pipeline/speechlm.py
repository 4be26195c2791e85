"""Speech-LM pipeline stages: encode / tokenize / tokenize_slm21 / evaluate.

Stage parity with /root/reference/src/speechlm/tokenize.py and eval.py:

* ``encode`` — Libri-Light shards (speaker-id glob) -> deduplicated units ->
  printable-unicode lines (tokenize.py:93-124).  Batched through the jitted
  encoder; the reference's CUDA-OOM -> CPU fallback (tokenize.py:114-120)
  maps to a long-utterance bucket retry.
* ``tokenize`` — train the C++ BPE (vocab 16384, fixed initial alphabet =
  all unit chars) and re-encode the corpus to space-joined ids
  (tokenize.py:16-35).
* ``tokenize_slm21`` — sWUGGY/sBLIMP wavs -> BPE ids JSON (tokenize.py:38-90).
* ``evaluate`` — length-normalized pseudo-log-prob files, optional external
  ``zrc`` run, sWUGGY/sBLIMP aggregation from its CSVs (eval.py:12-93).
"""

from __future__ import annotations

import glob as globmod
import json
import subprocess
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import pandas as pd

from ..models.llama import LlamaLM, sequence_pseudo_log_prob
from ..models.speech_encoder import SpeechEncoder
from ..text.units import units_to_unicode
from ..tokenizers.bpe import BpeTokenizer
from ..text.units import shift_unit
from .data import load_named_units_from_json


def _make_encoder(config) -> SpeechEncoder:
    return SpeechEncoder.by_name(
        config.s2u.dense_model_name,
        config.s2u.quantizer_model_name,
        config.s2u.vocab_size,
        deduplicate=True,
    )


def _encode_paths(encoder: SpeechEncoder, paths, out_file, batch_size: int = 8, max_seconds: float = 30.0) -> None:
    from ..dsp import audio_io

    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    paths = list(paths)
    with open(out_file, "w") as f:
        for i in range(0, len(paths), batch_size):
            chunk = paths[i : i + batch_size]
            wavs, lengths, _ = audio_io.read_batch(chunk, int(max_seconds * 16000))
            out = encoder(wavs, lengths=np.maximum(lengths, 0))
            units = np.asarray(out["units"])
            counts = np.asarray(out["num_units"])
            for j in range(len(chunk)):
                if lengths[j] < 0:
                    continue
                f.write(units_to_unicode(units[j, : int(counts[j])]) + "\n")


def encode(config, spk_ids: str = "1-9") -> None:
    """Libri-Light speaker shard -> unicode lines (tokenize.py:93-124)."""
    wav_dir = Path(config.dataset.wav_dir_train)
    paths = sorted(wav_dir.glob(f"*/[{spk_ids}]*/**/*{config.dataset.ext_audio}"))
    encoder = _make_encoder(config)
    _encode_paths(encoder, paths, str(config.dataset.unicode_train) + spk_ids)


def tokenize(config) -> None:
    """Train BPE over the unicode corpus; re-encode to id lines
    (tokenize.py:16-35)."""
    files = sorted(globmod.glob(str(config.dataset.unicode_train) + "*"))
    initial_alphabet = [chr(shift_unit(u)) for u in range(config.s2u.vocab_size)]
    tokenizer = BpeTokenizer.train_files(files, config.model.vocab_size, initial_alphabet)
    Path(config.s2u.tokenizer_path).parent.mkdir(parents=True, exist_ok=True)
    tokenizer.save(config.s2u.tokenizer_path)

    Path(config.dataset.train_file).parent.mkdir(parents=True, exist_ok=True)
    with open(config.dataset.train_file, "w") as out:
        for file in files:
            with open(file) as f:
                for line in f:
                    ids = tokenizer.encode(line.rstrip("\n"))
                    out.write(" ".join(str(u) for u in ids) + "\n")


def tokenize_slm21(config) -> None:
    """sWUGGY/sBLIMP dev+test wavs -> BPE-id JSONs (tokenize.py:38-90)."""
    encoder = _make_encoder(config)
    tokenizer = BpeTokenizer.from_file(config.s2u.tokenizer_path)

    swuggy = Path(str(config.dataset.swuggy_dir)).expanduser()
    sblimp = Path(str(config.dataset.sblimp_dir)).expanduser()
    jobs = [
        (sorted(swuggy.glob("dev/*.wav")), config.dataset.swuggy_dev_file),
        (sorted(sblimp.glob("dev/*.wav")), config.dataset.sblimp_dev_file),
        (sorted(swuggy.glob("test/*.wav")), config.dataset.swuggy_test_file),
        (sorted(sblimp.glob("test/*.wav")), config.dataset.sblimp_test_file),
    ]
    for paths, out_file in jobs:
        _tokenize_slm21(encoder, tokenizer, out_file, paths)


def _tokenize_slm21(encoder, tokenizer, out_file, paths, batch_size: int = 8) -> None:
    from ..dsp import audio_io

    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    dataset = {}
    paths = list(paths)
    for i in range(0, len(paths), batch_size):
        chunk = paths[i : i + batch_size]
        wavs, lengths, _ = audio_io.read_batch(chunk, 16000 * 20)
        out = encoder(wavs, lengths=np.maximum(lengths, 0))
        units = np.asarray(out["units"])
        counts = np.asarray(out["num_units"])
        for j, p in enumerate(chunk):
            if lengths[j] < 0:
                continue
            unicodes = units_to_unicode(units[j, : int(counts[j])])
            dataset[Path(p).stem] = tokenizer.encode(unicodes)
    with open(out_file, "w") as f:
        json.dump(dataset, f)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def write_scores(model: LlamaLM, variables, in_file, out_file, batch_size: int, num_special_tokens: int = 2) -> None:
    """Pseudo-log-prob 'name score' files (eval.py:70-93 parity)."""
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    # variables as a traced argument, not a closure: a closed-over ~100M-param
    # tree inlines as HLO constants and 413s the tunneled remote compile
    score_fn = jax.jit(lambda v, ids: sequence_pseudo_log_prob(model.apply(v, ids)[0], ids))
    with open(out_file, "w") as f:
        for batch in load_named_units_from_json(in_file, batch_size, num_special_tokens):
            scores = np.asarray(score_fn(variables, batch["input_ids"]))
            for name, score in zip(batch["names"], scores):
                f.write(f"{name} {score}\n")


def aggregate_slm21_scores(result_dir: str, split: str = "test") -> pd.DataFrame:
    """sWUGGY all/in-vocab/OOV + sBLIMP weighted means from the zrc CSVs
    (eval.py:53-67 semantics)."""
    result_dir = Path(result_dir)
    df_swuggy = pd.read_csv(result_dir / f"scores/score_lexical_{split}_by_frequency.csv", index_col=0)
    df_sblimp = pd.read_csv(result_dir / f"scores/score_syntactic_{split}_by_type.csv", index_col=0)

    swuggy_all = (df_swuggy["n"] * df_swuggy["score"]).sum() / df_swuggy["n"].sum()
    swuggy_oov = df_swuggy.loc["oov", "score"] if "oov" in df_swuggy.index else float("nan")
    df_iv = df_swuggy[df_swuggy.index != "oov"]
    swuggy_iv = (df_iv["n"] * df_iv["score"]).sum() / df_iv["n"].sum()
    sblimp = (df_sblimp["n"] * df_sblimp["score"]).sum() / df_sblimp["n"].sum()

    out = pd.DataFrame(
        [swuggy_all, swuggy_iv, swuggy_oov, sblimp],
        index=["sWUGGY all", "sWUGGY in-vocab", "sWUGGY out-of-vocab", "sBLIMP"],
    )
    out.to_csv(result_dir / "scores/score.csv")
    return out


def run_zrc(result_dir: str, sets: str = "test") -> bool:
    """Invoke the external zerospeech-benchmarks CLI if present
    (eval.py:38-51); returns False when unavailable."""
    try:
        subprocess.run(
            [
                "zrc",
                "benchmarks:run",
                "sLM21",
                str(result_dir),
                "--skip-validation",
                "--sets",
                sets,
                "--task",
                "lexical",
                "syntactic",
            ],
            check=True,
        )
        return True
    except (FileNotFoundError, subprocess.CalledProcessError):
        return False


def evaluate(config, model: LlamaLM, variables) -> Optional[pd.DataFrame]:
    """Full sLM21 test evaluation (eval.py:12-67).

    Scoring preference: the native pair scorer (pipeline/slm21_native.py)
    when the dataset gold CSVs exist, else the external zrc CLI."""
    num_special = len(
        {
            t
            for t in (
                config.model.get("pad_token_id"),
                config.model.get("bos_token_id"),
                config.model.get("eos_token_id"),
            )
            if t is not None
        }
    )
    result_dir = Path(config.dataset.result_dir)
    write_scores(
        model, variables, config.dataset.swuggy_test_file, result_dir / "lexical/test.txt",
        config.dataloader.batch_size_per_device, num_special,
    )
    write_scores(
        model, variables, config.dataset.sblimp_test_file, result_dir / "syntactic/test.txt",
        config.dataloader.batch_size_per_device, num_special,
    )
    from .slm21_native import run_native_slm21

    if run_native_slm21(
        result_dir,
        dataset_dir_lexical=Path(str(config.dataset.swuggy_dir)).expanduser(),
        dataset_dir_syntactic=Path(str(config.dataset.sblimp_dir)).expanduser(),
        split="test",
    ):
        return aggregate_slm21_scores(result_dir, "test")
    if run_zrc(result_dir, "test"):
        return aggregate_slm21_scores(result_dir, "test")
    return None


def load_lm_from_hf(model_dir: str, policy=None, scan_layers: bool = False):
    """Load an HF-format LlamaForCausalLM directory (our training export or
    any HF Llama checkpoint) back into (LlamaLM, variables).

    Completes the export/import roundtrip: train_loops._export_speechlm
    writes this layout for the torch ecosystem; this reads it back for
    TPU-side scoring/decoding without transformers.
    """
    import jax.numpy as jnp

    from ..core.precision import BF16_INFERENCE
    from ..models.convert import llama_params, stack_llama_layers
    from ..models.hub import resolve_pretrained_dir
    from ..models.llama import LlamaConfig

    model_dir = resolve_pretrained_dir(model_dir)
    with open(model_dir / "config.json") as f:
        hf = json.load(f)
    config = LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        pad_token_id=hf.get("pad_token_id") or 0,
        bos_token_id=hf.get("bos_token_id"),
        eos_token_id=hf.get("eos_token_id"),
    )
    st = model_dir / "model.safetensors"
    if st.is_file():
        from safetensors.numpy import load_file

        sd = load_file(str(st))
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(model_dir / "pytorch_model.bin", map_location="cpu").items()}
    params = llama_params(sd)
    if scan_layers:
        params = stack_llama_layers(params)
    model = LlamaLM(config, policy=policy or BF16_INFERENCE, scan_layers=scan_layers)
    variables = {"params": model.policy.cast_params(params)}
    return model, variables

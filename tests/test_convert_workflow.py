"""Checkpoint-delivery workflow: every `scripts/convert_checkpoints.py` branch
executes end-to-end on fabricated reference-format torch checkpoints.

The published weights are unreachable from this pod (zero egress — see
PARITY_EVAL.md), so C24's delivery path had only ever executed its UTMOS
branch under test (tests/test_utmos.py).  These tests close that gap the way
VERDICT r3 #5 prescribes: build the torch models the converters are written
for (the reference composite via tests/reference_oracle.py, HF Hubert/Whisper
via transformers) at tiny size with seeded random weights, save them in the
EXACT on-disk formats the published checkpoints use (`pytorch_model.bin` and
`model.safetensors` both), run the real CLI script on them, load the results
through the real `from_pretrained`/`by_name` loaders, and assert golden
equality against the torch source model.  Finally `bench.py --pretrained` is
smoked on the converted composite, proving the full weights→headline-bench
path (reference `from_pretrained` semantics: /root/reference/README.md:43).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from speech_resynth_tpu.core.precision import FLOAT32

from reference_oracle import load_reference_flow_matching, reference_available

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "convert_checkpoints.py"

pytestmark = pytest.mark.slow


def run_converter(*argv: str) -> str:
    proc = subprocess.run(
        [sys.executable, str(SCRIPT), *[str(a) for a in argv]],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, f"converter failed:\n{proc.stdout}\n{proc.stderr}"
    assert "wrote" in proc.stdout
    return proc.stdout


# ---------------------------------------------------------------- composite


TINY_MODEL_CFG = dict(
    vocab_size=40,
    dim_in=8,
    dim_cond_emb=16,
    hidden_size=32,
    depth=2,
    heads=2,
    intermediate_size=64,
    conv_pos_embed_kernel_size=7,
    conv_pos_embed_groups=16,
)
TINY_VOCODER_CFG = dict(
    model_in_dim=8,
    upsample_initial_channel=16,
    upsample_rates=[5, 4],
    upsample_kernel_sizes=[10, 8],
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3]],
)


def _fabricate_reference_composite(src: Path, fmt: str):
    """Build a tiny reference ConditionalFlowMatchingWithHifiGan and save it
    in the published checkpoint's on-disk layout (config.json + weights)."""
    import torch

    ref_models, ref_configs = load_reference_flow_matching()
    torch.manual_seed(11)
    cfg = ref_configs.ConditionalFlowMatchingWithHifiGanConfig(
        model_config=dict(TINY_MODEL_CFG), vocoder_config=dict(TINY_VOCODER_CFG)
    )
    model = ref_models.ConditionalFlowMatchingWithHifiGan(cfg).eval()

    src.mkdir(parents=True, exist_ok=True)
    config = {
        "model_config": {
            k: v
            for k, v in cfg.model_config.to_dict().items()
            if not k.startswith("_") and isinstance(v, (int, float, bool))
        },
        "vocoder_config": {
            **TINY_VOCODER_CFG,
            "leaky_relu_slope": cfg.vocoder_config.leaky_relu_slope,
            "normalize_before": cfg.vocoder_config.normalize_before,
        },
    }
    (src / "config.json").write_text(json.dumps(config))
    sd = model.state_dict()
    if fmt == "bin":
        torch.save(sd, src / "pytorch_model.bin")
    else:
        from safetensors.numpy import save_file

        save_file(
            {k: np.ascontiguousarray(v.detach().numpy()) for k, v in sd.items()},
            str(src / "model.safetensors"),
        )
    return model, cfg


@pytest.mark.parametrize("fmt", ["bin", "safetensors"])
def test_composite_converter_golden(tmp_path, fmt):
    """`convert_checkpoints.py composite` on both source weight formats →
    from_pretrained → pinned-noise mel + waveform golden vs the torch source."""
    if not reference_available():
        pytest.skip("/root/reference not mounted")
    import torch

    from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan

    src, dst = tmp_path / f"src_{fmt}", tmp_path / f"dst_{fmt}"
    torch_model, cfg = _fabricate_reference_composite(src, fmt)
    run_converter("composite", "--src", src, "--out", dst)
    assert (dst / "model.safetensors").is_file() and (dst / "config.json").is_file()

    dec = ConditionalFlowMatchingWithHifiGan.from_pretrained(dst, policy=FLOAT32)

    B, L, dt = 2, 12, 0.25
    rng = np.random.default_rng(3)
    ids = rng.integers(1, TINY_MODEL_CFG["vocab_size"] + 1, (B, L)).astype(np.int64)
    ids[1, 9:] = 0
    x0 = rng.standard_normal((B, L, TINY_MODEL_CFG["dim_in"])).astype(np.float32)

    orig_randn = torch.randn
    torch.randn = lambda *a, **k: torch.from_numpy(x0.copy())
    try:
        with torch.no_grad():
            mels_ref = torch_model.model.sample(torch.from_numpy(ids).long(), dt=dt).numpy()
            wav_ref = torch_model.vocoder(torch.from_numpy(mels_ref)).numpy()
    finally:
        torch.randn = orig_randn

    mels_ours, _ = dec.model.apply(
        dec.model_variables, jnp.asarray(ids, jnp.int32), dt=dt, x0=jnp.asarray(x0), method="sample"
    )
    np.testing.assert_allclose(np.asarray(mels_ours), mels_ref, rtol=1e-4, atol=1e-4)

    wav_ours = np.asarray(dec.vocoder.apply(dec.vocoder_variables, jnp.asarray(mels_ref)))
    wav_ref = wav_ref.reshape(wav_ours.shape[0], -1)  # HF emits (B, T)
    n = min(wav_ours.shape[1], wav_ref.shape[1])
    np.testing.assert_allclose(wav_ours[:, :n], wav_ref[:, :n], rtol=1e-4, atol=1e-4)


def test_bench_pretrained_cpu_smoke(tmp_path):
    """`bench.py --pretrained <converted dir>` completes the full headline
    protocol on the CPU backend with a converted checkpoint — the last leg of
    the weights→bench delivery workflow."""
    if not reference_available():
        pytest.skip("/root/reference not mounted")
    src, dst = tmp_path / "src", tmp_path / "dst"
    _fabricate_reference_composite(src, "bin")
    run_converter("composite", "--src", src, "--out", dst)

    env = dict(os.environ, BENCH_BUDGET_S="570")
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "bench.py"),
            "--pretrained",
            str(dst),
            "--cpu",
            "--trials",
            "1",
            "--iters",
            "2",
            "--batch",
            "2",
            "--units",
            "12",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout
    final = json.loads(lines[-1])
    assert final["weights"] == "pretrained"
    assert final["value"] > 0
    assert not final.get("provisional", False) or final.get("budget_exceeded", False)


# ------------------------------------------------------- hubert + k-means


def _tiny_hubert_pair():
    from test_hubert import hf_model, tiny_cfg  # reuse the parity pair

    cfg = tiny_cfg()
    return cfg, hf_model(cfg)


@pytest.mark.parametrize("fmt", ["bin", "safetensors"])
def test_hubert_kmeans_converter_to_encoder(tmp_path, fmt, monkeypatch):
    """hubert + kmeans converter branches feed `load_encoder` (by_name): the
    converted tower + centers must reproduce torch features and numpy-argmin
    unit ids exactly (textless.py:9-21 loading semantics)."""
    import torch

    cfg, torch_model = _tiny_hubert_pair()

    src = tmp_path / "hf_hubert"
    torch_model.save_pretrained(src, safe_serialization=(fmt == "safetensors"))
    if fmt == "bin":
        assert (src / "pytorch_model.bin").is_file()
        (src / "model.safetensors").unlink(missing_ok=True)

    enc_dir = tmp_path / "encoders"
    run_converter("hubert", "--src", src, "--name", "tiny-test", "--out", enc_dir)

    vocab, out_layer = 16, 2
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((vocab, cfg.hidden_size)).astype(np.float32)
    np.save(tmp_path / "centers.npy", centers)
    run_converter(
        "kmeans",
        "--src",
        tmp_path / "centers.npy",
        "--name",
        "tiny-test",
        "--quantizer",
        "km-test",
        "--vocab",
        vocab,
        "--out",
        enc_dir,
    )

    from speech_resynth_tpu.models import speech_encoder as SE

    monkeypatch.setitem(SE.DENSE_MODELS, "tiny-test", {"config": cfg, "output_layer": out_layer})
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any random-init fallback fails the test
        enc = SE.load_encoder(
            "tiny-test", "km-test", vocab, checkpoint_dir=str(enc_dir), policy=FLOAT32
        )

    wav = rng.standard_normal(800).astype(np.float32) * 0.1
    out = enc(wav)

    with torch.no_grad():
        feats = (
            torch_model(torch.from_numpy(wav[None]), output_hidden_states=True)
            .hidden_states[out_layer]
            .numpy()[0]
        )
    d = ((feats[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(out["units"]), d.argmin(-1))


def test_kmeans_converter_joblib_branch(tmp_path):
    """sklearn-style joblib checkpoints (objects with cluster_centers_) go
    through the same converter; npz output equals the npy branch's."""
    joblib = pytest.importorskip("joblib")

    from types import SimpleNamespace

    centers = np.random.default_rng(2).standard_normal((8, 6)).astype(np.float64)
    # a picklable stand-in for sklearn's KMeans: anything with cluster_centers_
    joblib.dump(SimpleNamespace(cluster_centers_=centers), tmp_path / "km.joblib")
    run_converter(
        "kmeans", "--src", tmp_path / "km.joblib", "--name", "n", "--quantizer", "q",
        "--vocab", 8, "--out", tmp_path / "out",
    )
    got = np.load(tmp_path / "out" / "n-q-8.npz")["centers"]
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, centers.astype(np.float32))


# ----------------------------------------------------------------- whisper


@pytest.mark.parametrize("fmt", ["bin", "safetensors"])
def test_whisper_converter_stages_checkpoint(tmp_path, fmt):
    """`convert_checkpoints.py whisper` stages an HF Whisper dir (either
    weight format) into the layout NativeWhisperASR reads; the staged weights
    reproduce the torch encoder's hidden states."""
    import torch

    from test_whisper import tiny_cfg

    from speech_resynth_tpu.models import whisper as W
    from speech_resynth_tpu.models.convert import whisper_params

    from transformers import WhisperConfig as HFWhisperConfig, WhisperForConditionalGeneration

    cfg = tiny_cfg()
    torch.manual_seed(0)
    torch_model = WhisperForConditionalGeneration(
        HFWhisperConfig(
            vocab_size=cfg.vocab_size,
            num_mel_bins=cfg.num_mel_bins,
            d_model=cfg.d_model,
            encoder_layers=cfg.encoder_layers,
            decoder_layers=cfg.decoder_layers,
            encoder_attention_heads=cfg.encoder_attention_heads,
            decoder_attention_heads=cfg.decoder_attention_heads,
            encoder_ffn_dim=cfg.encoder_ffn_dim,
            decoder_ffn_dim=cfg.decoder_ffn_dim,
            max_source_positions=cfg.max_source_positions,
            max_target_positions=cfg.max_target_positions,
            dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            attn_implementation="eager",
        )
    ).eval()

    src = tmp_path / "hf_whisper"
    torch_model.save_pretrained(src, safe_serialization=(fmt == "safetensors"))
    if fmt == "bin":
        (src / "model.safetensors").unlink(missing_ok=True)

    dst = tmp_path / "staged"
    run_converter("whisper", "--src", src, "--out", dst)
    assert (dst / "model.safetensors").is_file()
    assert (dst / "config.json").is_file()

    from safetensors.numpy import load_file

    sd = load_file(str(dst / "model.safetensors"))
    params = whisper_params(sd)
    model = W.WhisperForASR(cfg, policy=FLOAT32, attn_implementation="xla")

    mel = np.random.default_rng(0).standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(mel), method="encode"))
    with torch.no_grad():
        theirs = torch_model.model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_whisper_converter_sharded_copy(tmp_path):
    """Sharded safetensors checkpoints (index + model-*.safetensors) are
    copied through verbatim."""
    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    (src / "config.json").write_text("{}")
    (src / "model.safetensors.index.json").write_text('{"weight_map": {}}')
    (src / "model-00001-of-00002.safetensors").write_bytes(b"a")
    (src / "model-00002-of-00002.safetensors").write_bytes(b"b")
    run_converter("whisper", "--src", src, "--out", dst)
    assert (dst / "model.safetensors.index.json").is_file()
    assert (dst / "model-00001-of-00002.safetensors").read_bytes() == b"a"
    assert (dst / "model-00002-of-00002.safetensors").read_bytes() == b"b"

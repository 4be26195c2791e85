"""Full-size golden parity vs the reference torch implementation as oracle.

VERDICT r1 #1 fallback (checkpoints unreachable — see PARITY.md): build the
reference models at their FULL published configurations with seeded random
weights, convert those exact weights into our format, drive both stacks with
identical inputs and identical ODE noise, and require output agreement within
float32 tolerance.  This is the golden-waveform test of SURVEY.md §7's
minimum slice, with shared-random-seed weights standing in for the
unpublishable checkpoint values.

Covered at full size:
  * composite unit→waveform decoder (CFM h=256/depth=4 + HiFi-GAN 512ch×320up,
    reference models.py:192-256) — golden mel + golden waveform + trim lengths
  * duration-prediction variant (…-duration-prediction.yaml semantics)
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan

from reference_oracle import load_reference_flow_matching, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not mounted; oracle unavailable"
)


def _build_reference_composite(seed: int, predict_duration: bool):
    import torch

    ref_models, ref_configs = load_reference_flow_matching()
    torch.manual_seed(seed)
    cfg = ref_configs.ConditionalFlowMatchingWithHifiGanConfig(
        model_config={"predict_duration": predict_duration}
    )
    model = ref_models.ConditionalFlowMatchingWithHifiGan(cfg)
    model.eval()
    return model, cfg


def _export_for_us(torch_model, cfg, out_dir):
    """Reference state_dict -> our composite checkpoint dir (same layout)."""
    from safetensors.numpy import save_file

    sd = {k: v.detach().cpu().numpy() for k, v in torch_model.state_dict().items()}
    sd.pop("model.transformer.rotary_emb.inv_freq", None)  # derived, not a weight
    out_dir.mkdir(parents=True, exist_ok=True)
    config = {
        "model_config": {
            k: v
            for k, v in cfg.model_config.to_dict().items()
            if not k.startswith("_") and isinstance(v, (int, float, bool))
        },
        "vocoder_config": {
            "model_in_dim": cfg.vocoder_config.model_in_dim,
            "upsample_initial_channel": cfg.vocoder_config.upsample_initial_channel,
            "upsample_rates": list(cfg.vocoder_config.upsample_rates),
            "upsample_kernel_sizes": list(cfg.vocoder_config.upsample_kernel_sizes),
            "resblock_kernel_sizes": list(cfg.vocoder_config.resblock_kernel_sizes),
            "resblock_dilation_sizes": [list(d) for d in cfg.vocoder_config.resblock_dilation_sizes],
            "leaky_relu_slope": cfg.vocoder_config.leaky_relu_slope,
            "normalize_before": cfg.vocoder_config.normalize_before,
        },
    }
    with open(out_dir / "config.json", "w") as f:
        json.dump(config, f)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(out_dir / "model.safetensors"))


def _reference_sample_and_forward(torch_model, ids_np, x0_np, dt):
    """Run the oracle with pinned ODE noise; returns (mels, list-of-waveforms)."""
    import torch

    ids_t = torch.from_numpy(ids_np).long()
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: torch.from_numpy(x0_np.copy())
    try:
        with torch.no_grad():
            mels_t = torch_model.model.sample(ids_t, dt=dt)
            wavs_t = torch_model(ids_t, dt=dt)
    finally:
        torch.randn = orig_randn
    return mels_t.numpy(), [w.numpy() for w in wavs_t]


@pytest.mark.slow
def test_composite_golden_fullsize(tmp_path):
    """Full published config (vocab 2000, h=256, d=4; HiFi-GAN 512ch ×320)."""
    torch_model, cfg = _build_reference_composite(seed=0, predict_duration=False)
    _export_for_us(torch_model, cfg, tmp_path / "golden")

    B, L, dt = 2, 24, 0.25
    rng = np.random.default_rng(7)
    ids = rng.integers(1, cfg.model_config.vocab_size + 1, (B, L)).astype(np.int64)
    ids[1, 18:] = 0  # padded row
    x0 = rng.standard_normal((B, L, 80)).astype(np.float32)

    mels_ref, wavs_ref = _reference_sample_and_forward(torch_model, ids, x0, dt)

    dec = ConditionalFlowMatchingWithHifiGan.from_pretrained(tmp_path / "golden", policy=FLOAT32)
    ids_j = jnp.asarray(ids, jnp.int32)
    mels_ours, mask = dec.model.apply(
        dec.model_variables, ids_j, dt=dt, x0=jnp.asarray(x0), method="sample"
    )
    mels_ours = np.asarray(mels_ours)

    mel_err = np.max(np.abs(mels_ours - mels_ref))
    assert mel_err < 1e-4, f"golden mel mismatch: max abs err {mel_err}"
    # pad rows carry the log(1e-5) sentinel in both
    np.testing.assert_allclose(mels_ours[1, 18:], np.log(1e-5), rtol=1e-6)

    wav_ours = np.asarray(dec.vocoder.apply(dec.vocoder_variables, jnp.asarray(mels_ref)))
    lengths = np.asarray(dec.vocoder.config.waveform_lengths(jnp.asarray(mask.sum(axis=1))))
    assert [int(n) for n in lengths] == [w.shape[-1] for w in wavs_ref]
    for i, w_ref in enumerate(wavs_ref):
        err = np.max(np.abs(wav_ours[i, : w_ref.shape[-1]] - w_ref[0]))
        assert err < 1e-4, f"golden waveform mismatch row {i}: max abs err {err}"


@pytest.mark.slow
def test_composite_golden_duration_mode(tmp_path):
    """Duration-prediction variant: expansion lengths + mels must match the
    oracle exactly (reference models.py:157-164 semantics, incl. the exact
    expanded length our host pre-pass must reproduce)."""
    import torch

    torch_model, cfg = _build_reference_composite(seed=1, predict_duration=True)
    _export_for_us(torch_model, cfg, tmp_path / "golden_dur")

    B, L, dt = 1, 12, 0.5
    rng = np.random.default_rng(3)
    ids = rng.integers(1, cfg.model_config.vocab_size + 1, (B, L)).astype(np.int64)

    # oracle expansion length
    with torch.no_grad():
        mels_probe = torch_model.model.sample(torch.from_numpy(ids).long(), dt=1.0)
    total = mels_probe.shape[1]

    dec = ConditionalFlowMatchingWithHifiGan.from_pretrained(tmp_path / "golden_dur", policy=FLOAT32)
    ids_j = jnp.asarray(ids, jnp.int32)
    durs = dec.model.apply(dec.model_variables, ids_j, method="predict_durations")
    ours_total = int(np.asarray(durs.sum(axis=-1)).max())
    assert ours_total == total, f"expanded length mismatch: ours {ours_total} vs oracle {total}"

    x0 = rng.standard_normal((B, total, 80)).astype(np.float32)
    mels_ref, _ = _reference_sample_and_forward(torch_model, ids, x0, dt)
    mels_ours, mask = dec.model.apply(
        dec.model_variables, ids_j, dt=dt, x0=jnp.asarray(x0), method="sample"
    )
    assert mels_ours.shape[1] == total  # exact expansion, no 8x-bound clipping
    assert int(np.asarray(mask.sum())) == total
    err = np.max(np.abs(np.asarray(mels_ours) - mels_ref))
    assert err < 1e-4, f"duration-mode golden mel mismatch: {err}"


@pytest.mark.slow
def test_hubert_golden_fullsize():
    """Full published HuBERT-base (12L/768/12H, conv stack ×320) vs HF torch —
    the encoder tower the reference consumes via textlesslib (SURVEY §2.2)."""
    import torch
    from transformers import HubertConfig as HFHubertConfig, HubertModel

    from speech_resynth_tpu.models import hubert as HB
    from speech_resynth_tpu.models.convert import hubert_params

    cfg = HB.HubertConfig()  # full size defaults
    torch.manual_seed(0)
    torch_model = HubertModel(
        HFHubertConfig(
            hidden_dropout=0.0,
            attention_dropout=0.0,
            feat_proj_dropout=0.0,
            layerdrop=0.0,
            attn_implementation="eager",
        )
    ).eval()

    wav = (np.random.default_rng(0).standard_normal((1, 16000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = torch_model(torch.from_numpy(wav), output_hidden_states=True)
    theirs_final = out.last_hidden_state.numpy()
    theirs_l9 = out.hidden_states[9].numpy()  # the unit-extraction layer

    model = HB.HubertEncoder(cfg, policy=FLOAT32, attn_implementation="xla")
    params = hubert_params(torch_model.state_dict())
    ours_final = np.asarray(model.apply({"params": params}, jnp.asarray(wav)))
    ours_l9 = np.asarray(model.apply({"params": params}, jnp.asarray(wav), output_layer=9))

    assert ours_final.shape == theirs_final.shape  # 49 frames @ 1 s
    np.testing.assert_allclose(ours_l9, theirs_l9, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ours_final, theirs_final, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_llama_golden_fullsize():
    """Full published speech-LM config (768h/3072ffn/12L/12H, vocab 16386;
    reference speechlm/train.py:109-120, hubert.yaml:22-31) vs HF torch."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    from speech_resynth_tpu.models.convert import llama_params
    from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM, causal_lm_loss

    cfg = LlamaConfig(
        vocab_size=16386,
        hidden_size=768,
        intermediate_size=3072,
        num_hidden_layers=12,
        num_attention_heads=12,
    )
    torch.manual_seed(0)
    torch_model = LlamaForCausalLM(
        HFLlamaConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            num_key_value_heads=cfg.num_attention_heads,
            attn_implementation="eager",
            tie_word_embeddings=False,
        )
    ).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, (2, 64)).astype(np.int64)
    ids[1, 48:] = 0  # padded row
    attn = (ids != 0).astype(np.int64)
    labels = np.where(ids == 0, -100, ids)

    with torch.no_grad():
        out = torch_model(
            torch.from_numpy(ids),
            attention_mask=torch.from_numpy(attn),
            labels=torch.from_numpy(labels),
        )
    theirs_logits = out.logits.numpy()
    theirs_loss = float(out.loss)

    model = LlamaLM(cfg, policy=FLOAT32, attn_implementation="xla")
    params = llama_params(torch_model.state_dict())
    logits_j, _ = model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(attn, jnp.int32)
    )
    logits = np.asarray(logits_j)
    # compare on valid positions (pad positions are free in both)
    valid = attn.astype(bool)
    diff = np.max(np.abs(logits[valid] - theirs_logits[valid]))
    assert diff < 5e-3, f"full-size Llama logits mismatch: {diff}"

    loss = float(causal_lm_loss(logits_j, jnp.asarray(labels, jnp.int32)))
    assert abs(loss - theirs_loss) < 1e-3, (loss, theirs_loss)


@pytest.mark.slow
def test_utmos_golden_fullsize():
    """Full published UTMOS strong-learner size (wav2vec2-base SSL 95M,
    3 domains x 128, 3280 judges x 128, BiLSTM 512, projection 2048) vs the
    in-test torch oracle in the lightning key layout — the MOS scorer the
    reference clones (SURVEY §2.2 / C23)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_utmos import _TorchOracle

    from speech_resynth_tpu.models import utmos as UT
    from speech_resynth_tpu.models.convert import utmos_params
    from speech_resynth_tpu.models.hubert import HubertConfig

    ssl_cfg = HubertConfig()  # wav2vec2-base == hubert-base layout
    oracle = _TorchOracle(
        ssl_cfg, num_domains=3, domain_dim=128, num_judges=3280, judge_dim=128, lstm_hidden=512, proj_hidden=2048
    )
    params = utmos_params(oracle.lightning_state_dict())
    ucfg = UT.config_from_params(params)
    assert ucfg.ssl.hidden_size == 768 and ucfg.num_judges == 3280

    model = UT.UTMOSPredictor(ucfg, policy=FLOAT32)
    wav = (np.random.default_rng(3).standard_normal(16000) * 0.1).astype(np.float32)
    frames = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wav[None]),
        jnp.asarray([0], jnp.int32),
        jnp.asarray([288], jnp.int32),
    )
    ours = float(UT.UTMOSPredictor.score_from_frames(frames)[0])
    theirs = oracle.score(wav, 0, 288)
    assert abs(ours - theirs) < 5e-3, (ours, theirs)

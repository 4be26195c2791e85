"""Checkpoint export: our Flax param trees -> HF-format state dicts.

Inverse of models/convert.py, giving ``save_pretrained`` capability parity
(the reference saves HF checkpoints at flow_matching/train.py:210,
hifigan/train.py:199-201, speechlm/train.py:211): a directory with
``config.json`` + ``model.safetensors`` whose keys/layout match the torch
models, so reference users can load our trained weights with HF transformers
and vice versa.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _conv1d_w(k) -> np.ndarray:  # (K, I, O) -> torch (O, I, K)
    return _np(k).transpose(2, 1, 0)


def _convt1d_w(k) -> np.ndarray:  # (K, I, O) -> torch (I, O, K)
    return _np(k).transpose(1, 2, 0)


def _dense_w(k) -> np.ndarray:  # (I, O) -> torch (O, I)
    return _np(k).T


def hifigan_generator_state_dict(params: Mapping, buffers: Mapping | None = None) -> Dict[str, np.ndarray]:
    """``params`` is the generator's params collection; pass its ``buffers``
    collection too when the model was built with ``normalize_before=True`` so
    the real mean/scale normalization stats are exported (HF checkpoints with
    normalize_before carry them; zeros/ones is only correct without it)."""
    sd: Dict[str, np.ndarray] = {
        "conv_pre.weight": _conv1d_w(params["conv_pre"]["kernel"]),
        "conv_pre.bias": _np(params["conv_pre"]["bias"]),
        "conv_post.weight": _conv1d_w(params["conv_post"]["kernel"]),
        "conv_post.bias": _np(params["conv_post"]["bias"]),
    }
    i = 0
    while f"upsampler_{i}" in params:
        sd[f"upsampler.{i}.weight"] = _convt1d_w(params[f"upsampler_{i}"]["kernel"])
        sd[f"upsampler.{i}.bias"] = _np(params[f"upsampler_{i}"]["bias"])
        i += 1
    n = 0
    while f"resblocks_{n}" in params:
        block = params[f"resblocks_{n}"]
        j = 0
        while f"convs1_{j}" in block:
            sd[f"resblocks.{n}.convs1.{j}.weight"] = _conv1d_w(block[f"convs1_{j}"]["kernel"])
            sd[f"resblocks.{n}.convs1.{j}.bias"] = _np(block[f"convs1_{j}"]["bias"])
            sd[f"resblocks.{n}.convs2.{j}.weight"] = _conv1d_w(block[f"convs2_{j}"]["kernel"])
            sd[f"resblocks.{n}.convs2.{j}.bias"] = _np(block[f"convs2_{j}"]["bias"])
            j += 1
        n += 1
    if buffers and "mean" in buffers:
        sd["mean"] = _np(buffers["mean"])
        sd["scale"] = _np(buffers["scale"])
    else:
        sd["mean"] = np.zeros(sd["conv_pre.weight"].shape[1], np.float32)
        sd["scale"] = np.ones(sd["conv_pre.weight"].shape[1], np.float32)
    return sd


def cfm_state_dict(variables: Mapping) -> Dict[str, np.ndarray]:
    params = variables["params"]
    buffers = variables.get("buffers", {})
    sd: Dict[str, np.ndarray] = {
        "to_cond_emb.weight": _np(params["to_cond_emb"]["embedding"]),
        "time_cond_mlp.1.weight": _dense_w(params["time_cond_mlp"]["proj"]["kernel"]),
        "time_cond_mlp.1.bias": _np(params["time_cond_mlp"]["proj"]["bias"]),
        "to_embed.weight": _dense_w(params["to_embed"]["kernel"]),
        "to_embed.bias": _np(params["to_embed"]["bias"]),
        "conv_embed.dw_conv1d.0.weight": _conv1d_w(params["conv_embed"]["kernel"]),
        "conv_embed.dw_conv1d.0.bias": _np(params["conv_embed"]["bias"]),
        "to_pred.weight": _dense_w(params["to_pred"]["kernel"]),
    }
    if "time_cond_mlp" in buffers:
        sd["time_cond_mlp.0.weights"] = _np(buffers["time_cond_mlp"]["fourier"]["weights"])
    tr = params["transformer"]
    ind = 0
    while f"layers_{ind}_attn_norm" in tr:
        p = f"transformer.layers.{ind}"
        if f"layers_{ind}_skip_combiner" in tr:
            sd[f"{p}.0.weight"] = _dense_w(tr[f"layers_{ind}_skip_combiner"]["kernel"])
        sd[f"{p}.1.to_weight.weight"] = _np(tr[f"layers_{ind}_attn_norm"]["to_weight"])
        sd[f"{p}.2.to_qkv.weight"] = _dense_w(tr[f"layers_{ind}_attn"]["to_qkv"]["kernel"])
        sd[f"{p}.2.to_out.weight"] = _dense_w(tr[f"layers_{ind}_attn"]["to_out"]["kernel"])
        sd[f"{p}.3.to_weight.weight"] = _np(tr[f"layers_{ind}_ff_norm"]["to_weight"])
        sd[f"{p}.4.conv1.weight"] = _conv1d_w(tr[f"layers_{ind}_ff"]["conv1_kernel"])
        sd[f"{p}.4.conv1.bias"] = _np(tr[f"layers_{ind}_ff"]["conv1_bias"])
        sd[f"{p}.4.conv2.weight"] = _conv1d_w(tr[f"layers_{ind}_ff"]["conv2_kernel"])
        sd[f"{p}.4.conv2.bias"] = _np(tr[f"layers_{ind}_ff"]["conv2_bias"])
        ind += 1
    sd["transformer.final_norm.weight"] = _np(tr["final_norm"]["weight"])
    if "duration_predictor" in params:
        sd["duration_predictor.conv.weight"] = _conv1d_w(params["duration_predictor"]["kernel"])
        sd["duration_predictor.conv.bias"] = _np(params["duration_predictor"]["bias"])
    return sd


def llama_state_dict(params: Mapping) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": _np(params["embed_tokens"]["embedding"]),
        "model.norm.weight": _np(params["final_norm"]["weight"]),
        "lm_head.weight": _dense_w(params["lm_head"]["kernel"]),
    }
    i = 0
    while f"layers_{i}" in params:
        L = params[f"layers_{i}"]
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = _np(L["input_norm"]["weight"])
        sd[f"{p}.post_attention_layernorm.weight"] = _np(L["post_attn_norm"]["weight"])
        for ours, theirs in [
            ("q_proj", "self_attn.q_proj"),
            ("k_proj", "self_attn.k_proj"),
            ("v_proj", "self_attn.v_proj"),
            ("o_proj", "self_attn.o_proj"),
            ("gate_proj", "mlp.gate_proj"),
            ("up_proj", "mlp.up_proj"),
            ("down_proj", "mlp.down_proj"),
        ]:
            sd[f"{p}.{theirs}.weight"] = _dense_w(L[ours]["kernel"])
        i += 1
    return sd


def save_pretrained(model_dir: str | Path, state_dict: Dict[str, np.ndarray], config: dict) -> None:
    """Write config.json + model.safetensors in HF layout.

    Writes are atomic (temp + rename): a crash or concurrent reader mid-save
    must never observe a truncated weights file — these exports are re-read
    live by in-training validation and by the synthesis/eval stages."""
    import os

    from safetensors.numpy import save_file

    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    tmp_cfg = model_dir / "config.json.tmp"
    with open(tmp_cfg, "w") as f:
        json.dump(config, f, indent=2)
    os.replace(tmp_cfg, model_dir / "config.json")
    tmp_st = model_dir / "model.safetensors.tmp"
    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()}, str(tmp_st))
    os.replace(tmp_st, model_dir / "model.safetensors")


def save_composite_pretrained(model_dir: str | Path, cfm_variables, cfm_config, voc_variables, voc_config) -> None:
    """Composite ConditionalFlowMatchingWithHifiGan directory loadable by our
    ``from_pretrained`` (models.py:192-256 / configs.py:44-61 layout).

    ``voc_variables`` may be the full variables dict ({"params", "buffers"})
    or a bare params tree (buffers default to zeros/ones)."""
    import dataclasses

    if "params" in voc_variables:
        voc_params = voc_variables["params"]
        voc_buffers = voc_variables.get("buffers")
    else:
        voc_params, voc_buffers = voc_variables, None
    sd = {f"model.{k}": v for k, v in cfm_state_dict(cfm_variables).items()}
    sd.update({f"vocoder.{k}": v for k, v in hifigan_generator_state_dict(voc_params, voc_buffers).items()})
    config = {
        "model_config": dataclasses.asdict(cfm_config),
        "vocoder_config": {
            "model_in_dim": voc_config.model_in_dim,
            "upsample_initial_channel": voc_config.upsample_initial_channel,
            "upsample_rates": list(voc_config.upsample_rates),
            "upsample_kernel_sizes": list(voc_config.upsample_kernel_sizes),
            "resblock_kernel_sizes": list(voc_config.resblock_kernel_sizes),
            "resblock_dilation_sizes": [list(d) for d in voc_config.resblock_dilation_sizes],
            "leaky_relu_slope": voc_config.leaky_relu_slope,
            "normalize_before": voc_config.normalize_before,
        },
    }
    save_pretrained(model_dir, sd, config)

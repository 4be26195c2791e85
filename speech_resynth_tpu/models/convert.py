"""Checkpoint conversion: HF/torch state dicts -> our Flax param trees.

The reference's published checkpoints are HF-format torch weights
(README.md:43 ``ryota-komatsu/flow_matching_with_hifigan``; the vocoder is an
HF ``FastSpeech2ConformerHifiGan``; the LM an HF ``LlamaForCausalLM``).  These
functions give byte-exact weight import so our TPU models reproduce the
reference's numerics (SURVEY.md §7 hard part 4).

Layout conventions (ours):
  Conv1d kernel   (K, I, O)   — torch stores (O, I, K); transpose (2, 1, 0)
  ConvT1d kernel  (K, I, O)   — torch stores (I, O, K); transpose (2, 0, 1)
  Dense kernel    (I, O)      — torch Linear stores (O, I); transpose
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def conv1d_w(t) -> np.ndarray:
    return _np(t).transpose(2, 1, 0)


def convt1d_w(t) -> np.ndarray:
    return _np(t).transpose(2, 0, 1)


def dense_w(t) -> np.ndarray:
    return _np(t).T


def hifigan_generator_params(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """HF FastSpeech2ConformerHifiGan state_dict -> HifiGanGenerator params."""
    sd = dict(state_dict)
    params: Dict = {}

    params["conv_pre"] = {"kernel": conv1d_w(sd["conv_pre.weight"]), "bias": _np(sd["conv_pre.bias"])}
    params["conv_post"] = {"kernel": conv1d_w(sd["conv_post.weight"]), "bias": _np(sd["conv_post.bias"])}

    i = 0
    while f"upsampler.{i}.weight" in sd:
        params[f"upsampler_{i}"] = {
            "kernel": convt1d_w(sd[f"upsampler.{i}.weight"]),
            "bias": _np(sd[f"upsampler.{i}.bias"]),
        }
        i += 1

    n = 0
    while f"resblocks.{n}.convs1.0.weight" in sd:
        block: Dict = {}
        j = 0
        while f"resblocks.{n}.convs1.{j}.weight" in sd:
            block[f"convs1_{j}"] = {
                "kernel": conv1d_w(sd[f"resblocks.{n}.convs1.{j}.weight"]),
                "bias": _np(sd[f"resblocks.{n}.convs1.{j}.bias"]),
            }
            block[f"convs2_{j}"] = {
                "kernel": conv1d_w(sd[f"resblocks.{n}.convs2.{j}.weight"]),
                "bias": _np(sd[f"resblocks.{n}.convs2.{j}.bias"]),
            }
            j += 1
        params[f"resblocks_{n}"] = block
        n += 1

    return params


def hifigan_generator_buffers(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """mean/scale normalization stats (used when normalize_before=True).
    Falls back to identity stats sized from conv_pre if the checkpoint lacks
    them, so apply() never has to create the immutable buffers collection."""
    import numpy as np

    in_dim = state_dict["conv_pre.weight"].shape[1]
    out = {
        "mean": np.zeros((in_dim,), np.float32),
        "scale": np.ones((in_dim,), np.float32),
    }
    if "mean" in state_dict:
        out["mean"] = _np(state_dict["mean"])
    if "scale" in state_dict:
        out["scale"] = _np(state_dict["scale"])
    return out


def cfm_model_params(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Reference ConditionalFlowMatchingModel state_dict -> our CFM params.

    Key map derived from the reference module tree
    (src/flow_matching/models.py:46-74, modules/transformer.py:150-170).
    """
    sd = dict(state_dict)
    params: Dict = {}
    buffers: Dict = {}

    params["to_cond_emb"] = {"embedding": _np(sd["to_cond_emb.weight"])}
    # time_cond_mlp = Sequential(RandomFourierEmbed, Linear, SiLU)
    buffers["time_cond_mlp"] = {"fourier": {"weights": _np(sd["time_cond_mlp.0.weights"])}}
    params["time_cond_mlp"] = {
        "proj": {"kernel": dense_w(sd["time_cond_mlp.1.weight"]), "bias": _np(sd["time_cond_mlp.1.bias"])}
    }
    params["to_embed"] = {"kernel": dense_w(sd["to_embed.weight"]), "bias": _np(sd["to_embed.bias"])}
    params["conv_embed"] = {
        "kernel": conv1d_w(sd["conv_embed.dw_conv1d.0.weight"]),
        "bias": _np(sd["conv_embed.dw_conv1d.0.bias"]),
    }
    params["to_pred"] = {"kernel": dense_w(sd["to_pred.weight"])}

    tr: Dict = {}
    ind = 0
    while f"transformer.layers.{ind}.1.to_weight.weight" in sd:
        p = f"transformer.layers.{ind}"
        if f"{p}.0.weight" in sd:
            tr[f"layers_{ind}_skip_combiner"] = {"kernel": dense_w(sd[f"{p}.0.weight"])}
        tr[f"layers_{ind}_attn_norm"] = {"to_weight": _np(sd[f"{p}.1.to_weight.weight"])}
        tr[f"layers_{ind}_attn"] = {
            "to_qkv": {"kernel": dense_w(sd[f"{p}.2.to_qkv.weight"])},
            "to_out": {"kernel": dense_w(sd[f"{p}.2.to_out.weight"])},
        }
        tr[f"layers_{ind}_ff_norm"] = {"to_weight": _np(sd[f"{p}.3.to_weight.weight"])}
        tr[f"layers_{ind}_ff"] = {
            "conv1_kernel": conv1d_w(sd[f"{p}.4.conv1.weight"]),
            "conv1_bias": _np(sd[f"{p}.4.conv1.bias"]),
            "conv2_kernel": conv1d_w(sd[f"{p}.4.conv2.weight"]),
            "conv2_bias": _np(sd[f"{p}.4.conv2.bias"]),
        }
        ind += 1
    tr["final_norm"] = {"weight": _np(sd["transformer.final_norm.weight"])}
    params["transformer"] = tr

    if "duration_predictor.conv.weight" in sd:
        params["duration_predictor"] = {
            "kernel": conv1d_w(sd["duration_predictor.conv.weight"]),
            "bias": _np(sd["duration_predictor.conv.bias"]),
        }

    return {"params": params, "buffers": buffers}


def llama_params(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """HF LlamaForCausalLM state_dict -> our LlamaLM params."""
    sd = dict(state_dict)
    params: Dict = {
        "embed_tokens": {"embedding": _np(sd["model.embed_tokens.weight"])},
        "final_norm": {"weight": _np(sd["model.norm.weight"])},
        "lm_head": {"kernel": dense_w(sd["lm_head.weight"])},
    }
    i = 0
    while f"model.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"model.layers.{i}"
        params[f"layers_{i}"] = {
            "input_norm": {"weight": _np(sd[f"{p}.input_layernorm.weight"])},
            "post_attn_norm": {"weight": _np(sd[f"{p}.post_attention_layernorm.weight"])},
            "q_proj": {"kernel": dense_w(sd[f"{p}.self_attn.q_proj.weight"])},
            "k_proj": {"kernel": dense_w(sd[f"{p}.self_attn.k_proj.weight"])},
            "v_proj": {"kernel": dense_w(sd[f"{p}.self_attn.v_proj.weight"])},
            "o_proj": {"kernel": dense_w(sd[f"{p}.self_attn.o_proj.weight"])},
            "gate_proj": {"kernel": dense_w(sd[f"{p}.mlp.gate_proj.weight"])},
            "up_proj": {"kernel": dense_w(sd[f"{p}.mlp.up_proj.weight"])},
            "down_proj": {"kernel": dense_w(sd[f"{p}.mlp.down_proj.weight"])},
        }
        i += 1
    return params


def stack_llama_layers(params: Mapping) -> Dict:
    """Unrolled ``layers_{i}`` layout -> scan layout (one ``layers`` subtree
    with a leading layer axis).  Same checkpoints serve both
    ``LlamaLM(scan_layers=...)`` settings."""
    import numpy as np

    n = 0
    while f"layers_{n}" in params:
        n += 1
    import jax

    stacked = jax.tree_util.tree_map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *[params[f"layers_{i}"] for i in range(n)])
    out = {k: v for k, v in params.items() if not k.startswith("layers_")}
    out["layers"] = stacked
    return out


def unstack_llama_layers(params: Mapping) -> Dict:
    """Scan layout -> unrolled ``layers_{i}`` layout."""
    import jax
    import numpy as np

    out = {k: v for k, v in params.items() if k != "layers"}
    stacked = params["layers"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        out[f"layers_{i}"] = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], stacked)
    return out


def _weight_normed_conv1d(sd: Mapping, base: str) -> np.ndarray:
    """Reconstruct a torch ``weight_norm(conv, dim=2)`` Conv1d kernel from
    either the legacy ``weight_g``/``weight_v`` names or the torch>=2.1
    ``parametrizations.weight.original{0,1}`` names."""
    if f"{base}.weight_g" in sd:
        g, v = _np(sd[f"{base}.weight_g"]), _np(sd[f"{base}.weight_v"])
    else:
        g = _np(sd[f"{base}.parametrizations.weight.original0"])
        v = _np(sd[f"{base}.parametrizations.weight.original1"])
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))  # norm over (O, I) per tap
    return conv1d_w(g * v / norm)


def _post_ln_block(sd: Mapping, p: str, attn: str, attn_norm: str, ff_in: str, ff_out: str, ff_norm: str) -> Dict:
    """Shared post-LN transformer block mapping (HuBERT/wav2vec2 layouts
    differ only in torch key names)."""
    d = lambda key: {"kernel": dense_w(sd[f"{p}.{key}.weight"]), "bias": _np(sd[f"{p}.{key}.bias"])}
    ln = lambda key: {"scale": _np(sd[f"{p}.{key}.weight"]), "bias": _np(sd[f"{p}.{key}.bias"])}
    return {
        "q_proj": d(f"{attn}.q_proj"),
        "k_proj": d(f"{attn}.k_proj"),
        "v_proj": d(f"{attn}.v_proj"),
        "o_proj": d(f"{attn}.out_proj"),
        "attn_norm": ln(attn_norm),
        "ff_in": d(ff_in),
        "ff_out": d(ff_out),
        "ff_norm": ln(ff_norm),
    }


def hubert_params(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """HF HubertModel state_dict -> our HubertEncoder params.

    Covers the base architecture (group-norm first conv, layer-norm-less
    conv stack, conv positional embedding with weight_norm, post-LN
    transformer) used by hubert-base-ls960 / mhubert-base.
    """
    sd = dict(state_dict)
    params: Dict = {}

    # conv feature extractor: 7 layers, layer 0 has group norm
    fe: Dict = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in sd:
        layer = {"kernel": conv1d_w(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])}
        if f"feature_extractor.conv_layers.{i}.layer_norm.weight" in sd:
            layer["norm_scale"] = _np(sd[f"feature_extractor.conv_layers.{i}.layer_norm.weight"])
            layer["norm_bias"] = _np(sd[f"feature_extractor.conv_layers.{i}.layer_norm.bias"])
        fe[f"conv_layers_{i}"] = layer
        i += 1
    params["feature_extractor"] = fe

    params["feature_projection_norm"] = {
        "scale": _np(sd["feature_projection.layer_norm.weight"]),
        "bias": _np(sd["feature_projection.layer_norm.bias"]),
    }
    params["feature_projection_dense"] = {
        "kernel": dense_w(sd["feature_projection.projection.weight"]),
        "bias": _np(sd["feature_projection.projection.bias"]),
    }

    # conv positional embedding (weight_norm'd conv, groups=16, dim=2)
    params["pos_conv_kernel"] = _weight_normed_conv1d(sd, "encoder.pos_conv_embed.conv")
    params["pos_conv_bias"] = _np(sd["encoder.pos_conv_embed.conv.bias"])
    params["encoder_norm"] = {
        "scale": _np(sd["encoder.layer_norm.weight"]),
        "bias": _np(sd["encoder.layer_norm.bias"]),
    }

    i = 0
    while f"encoder.layers.{i}.attention.q_proj.weight" in sd:
        params[f"layers_{i}"] = _post_ln_block(
            sd,
            f"encoder.layers.{i}",
            attn="attention",
            attn_norm="layer_norm",
            ff_in="feed_forward.intermediate_dense",
            ff_out="feed_forward.output_dense",
            ff_norm="final_layer_norm",
        )
        i += 1

    return params


def whisper_params(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """HF WhisperForConditionalGeneration state_dict -> our WhisperForASR
    params (models/whisper.py).  Conv weights (O, I, K) -> (K, I, O); Dense
    kernels transposed; flax LayerNorm uses scale/bias."""
    sd = dict(state_dict)

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}

    def attn(prefix):
        out = {
            "q_proj": {"kernel": dense_w(sd[f"{prefix}.q_proj.weight"]), "bias": _np(sd[f"{prefix}.q_proj.bias"])},
            "k_proj": {"kernel": dense_w(sd[f"{prefix}.k_proj.weight"])},
            "v_proj": {"kernel": dense_w(sd[f"{prefix}.v_proj.weight"]), "bias": _np(sd[f"{prefix}.v_proj.bias"])},
            "out_proj": {"kernel": dense_w(sd[f"{prefix}.out_proj.weight"]), "bias": _np(sd[f"{prefix}.out_proj.bias"])},
        }
        return out

    enc: Dict = {
        "conv1_kernel": _np(sd["model.encoder.conv1.weight"]).transpose(2, 1, 0),
        "conv1_bias": _np(sd["model.encoder.conv1.bias"]),
        "conv2_kernel": _np(sd["model.encoder.conv2.weight"]).transpose(2, 1, 0),
        "conv2_bias": _np(sd["model.encoder.conv2.bias"]),
        "embed_positions": _np(sd["model.encoder.embed_positions.weight"]),
        "layer_norm": ln("model.encoder.layer_norm"),
    }
    i = 0
    while f"model.encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"model.encoder.layers.{i}"
        enc[f"layers_{i}"] = {
            "self_attn": attn(f"{p}.self_attn"),
            "self_attn_layer_norm": ln(f"{p}.self_attn_layer_norm"),
            "final_layer_norm": ln(f"{p}.final_layer_norm"),
            "mlp": {
                "fc1": {"kernel": dense_w(sd[f"{p}.fc1.weight"]), "bias": _np(sd[f"{p}.fc1.bias"])},
                "fc2": {"kernel": dense_w(sd[f"{p}.fc2.weight"]), "bias": _np(sd[f"{p}.fc2.bias"])},
            },
        }
        i += 1

    dec: Dict = {
        "embed_tokens": {"embedding": _np(sd["model.decoder.embed_tokens.weight"])},
        "embed_positions": _np(sd["model.decoder.embed_positions.weight"]),
        "layer_norm": ln("model.decoder.layer_norm"),
        # proj_out is tied to the decoder embedding in HF Whisper; safetensors
        # exports drop the tied duplicate, so fall back to embed_tokens
        "proj_out": {
            "kernel": dense_w(sd["proj_out.weight"] if "proj_out.weight" in sd else sd["model.decoder.embed_tokens.weight"])
        },
    }
    i = 0
    while f"model.decoder.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"model.decoder.layers.{i}"
        dec[f"layers_{i}"] = {
            "self_attn": attn(f"{p}.self_attn"),
            "encoder_attn": attn(f"{p}.encoder_attn"),
            "self_attn_layer_norm": ln(f"{p}.self_attn_layer_norm"),
            "encoder_attn_layer_norm": ln(f"{p}.encoder_attn_layer_norm"),
            "final_layer_norm": ln(f"{p}.final_layer_norm"),
            "mlp": {
                "fc1": {"kernel": dense_w(sd[f"{p}.fc1.weight"]), "bias": _np(sd[f"{p}.fc1.bias"])},
                "fc2": {"kernel": dense_w(sd[f"{p}.fc2.weight"]), "bias": _np(sd[f"{p}.fc2.bias"])},
            },
        }
        i += 1

    return {"encoder": enc, "decoder": dec}


def fairseq_wav2vec2_params(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """fairseq Wav2Vec2Model (wav2vec_small) state_dict -> our HubertEncoder
    params.

    The UTMOS checkpoint embeds its SSL backbone with fairseq key names
    (SURVEY.md C23: the demo space loads ``wav2vec_small.pt`` through
    fairseq).  The base architecture is identical to HF wav2vec2-base /
    HuBERT-base: group-norm on conv layer 0 only, conv_bias=False, post-LN
    encoder blocks, weight-normed conv positional embedding (dim=2).
    """
    sd = dict(state_dict)
    params: Dict = {}

    # conv feature extractor: fairseq blocks are Sequential(conv, dropout,
    # [GroupNorm], GELU) -> conv at index 0, group norm (layer 0) at index 2
    fe: Dict = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.0.weight" in sd:
        layer = {"kernel": conv1d_w(sd[f"feature_extractor.conv_layers.{i}.0.weight"])}
        if f"feature_extractor.conv_layers.{i}.2.weight" in sd:
            layer["norm_scale"] = _np(sd[f"feature_extractor.conv_layers.{i}.2.weight"])
            layer["norm_bias"] = _np(sd[f"feature_extractor.conv_layers.{i}.2.bias"])
        fe[f"conv_layers_{i}"] = layer
        i += 1
    params["feature_extractor"] = fe

    # feature layer norm then post_extract_proj (512 -> 768)
    params["feature_projection_norm"] = {
        "scale": _np(sd["layer_norm.weight"]),
        "bias": _np(sd["layer_norm.bias"]),
    }
    params["feature_projection_dense"] = {
        "kernel": dense_w(sd["post_extract_proj.weight"]),
        "bias": _np(sd["post_extract_proj.bias"]),
    }

    # conv positional embedding: Sequential(weight_norm conv, SamePad, GELU)
    params["pos_conv_kernel"] = _weight_normed_conv1d(sd, "encoder.pos_conv.0")
    params["pos_conv_bias"] = _np(sd["encoder.pos_conv.0.bias"])
    params["encoder_norm"] = {
        "scale": _np(sd["encoder.layer_norm.weight"]),
        "bias": _np(sd["encoder.layer_norm.bias"]),
    }

    i = 0
    while f"encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        params[f"layers_{i}"] = _post_ln_block(
            sd,
            f"encoder.layers.{i}",
            attn="self_attn",
            attn_norm="self_attn_layer_norm",
            ff_in="fc1",
            ff_out="fc2",
            ff_norm="final_layer_norm",
        )
        i += 1

    return params


def _torch_lstm_dir(sd: Mapping, prefix: str, suffix: str) -> Dict:
    """torch nn.LSTM one-direction weights -> our BiLSTM params.

    torch packs gates [i, f, g, o] along 4H in weight_ih (4H, D) /
    weight_hh (4H, H) with two bias vectors (summed here — the cell only
    ever uses their sum)."""
    p = f"{prefix}." if prefix else ""
    rev = "_reverse" if suffix == "bwd" else ""
    return {
        f"w_ih_{suffix}": dense_w(sd[f"{p}weight_ih_l0{rev}"]),
        f"w_hh_{suffix}": dense_w(sd[f"{p}weight_hh_l0{rev}"]),
        f"bias_{suffix}": _np(sd[f"{p}bias_ih_l0{rev}"]) + _np(sd[f"{p}bias_hh_l0{rev}"]),
    }


def utmos_params(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """UTMOS-demo lightning checkpoint state_dict -> our UTMOSPredictor params.

    Expected key layout (the public strong-learner module tree, SURVEY.md
    C23): ``model.feature_extractors.0.ssl_model.*`` (fairseq wav2vec2),
    ``model.feature_extractors.1.embedding`` (domain),
    ``model.output_layers.0.{judge_embedding,decoder_rnn}`` (LDConditioner),
    ``model.output_layers.1.net.{0,3}`` (projection Sequential: Linear,
    ReLU, Dropout, Linear).  A leading ``model.`` prefix is optional.
    """
    sd = {}
    for k, v in dict(state_dict).items():
        sd[k[len("model.") :] if k.startswith("model.") else k] = v

    ssl_sd = {k[len("feature_extractors.0.ssl_model.") :]: v for k, v in sd.items() if k.startswith("feature_extractors.0.ssl_model.")}
    rnn = "output_layers.0.decoder_rnn"
    params: Dict = {
        "ssl": fairseq_wav2vec2_params(ssl_sd),
        "domain_embedding": {"embedding": _np(sd["feature_extractors.1.embedding.weight"])},
        "judge_embedding": {"embedding": _np(sd["output_layers.0.judge_embedding.weight"])},
        "decoder_rnn": {**_torch_lstm_dir(sd, rnn, "fwd"), **_torch_lstm_dir(sd, rnn, "bwd")},
        "proj_in": {"kernel": dense_w(sd["output_layers.1.net.0.weight"]), "bias": _np(sd["output_layers.1.net.0.bias"])},
        "proj_out": {"kernel": dense_w(sd["output_layers.1.net.3.weight"]), "bias": _np(sd["output_layers.1.net.3.bias"])},
    }
    return params


def stack_whisper_layers(params: Mapping) -> Dict:
    """Unrolled Whisper params -> scan layout: the encoder's and decoder's
    ``layers_{i}`` subtrees each become one stacked ``layers`` collection
    (same mechanics as stack_llama_layers)."""
    return {
        "encoder": stack_llama_layers(params["encoder"]),
        "decoder": stack_llama_layers(params["decoder"]),
    }

"""ConditionalFlowMatchingWithHifiGan — the unit-to-waveform decoder.

API parity with the reference composite model
(/root/reference/src/flow_matching/models.py:192-256): ``from_pretrained`` /
``load_pretrained`` construction, ``__call__(input_ids, dt, truncation_value)``
returning per-utterance trimmed waveforms; pad-frame detection by the
log(1e-5) sentinel (models.py:245-247) and analytic ConvTranspose length
propagation (models.py:211-221, net (L-1)*320+400).

TPU design: the whole path — 16-step Euler ODE (lax.scan) + vocoder — is one
jitted program per padded shape.  Trimming is data-dependent, so the jitted
function returns (waveforms, lengths) and hosts slice afterwards; a
``__call__`` wrapper reproduces the reference's list-of-trimmed-arrays return.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Policy, BF16_INFERENCE
from .cfm import CFMConfig, ConditionalFlowMatchingModel
from .hifigan import HifiGanConfig, HifiGanGenerator


def _load_state_dict(model_dir: Path) -> dict:
    """Read an HF checkpoint dir (safetensors preferred, torch bin fallback)."""
    st = model_dir / "model.safetensors"
    if st.is_file():
        from safetensors.numpy import load_file

        return load_file(str(st))
    bin_path = model_dir / "pytorch_model.bin"
    if bin_path.is_file():
        import torch

        return {k: v.numpy() for k, v in torch.load(bin_path, map_location="cpu", weights_only=True).items()}
    raise FileNotFoundError(f"no model weights in {model_dir}")


@dataclasses.dataclass
class ConditionalFlowMatchingWithHifiGan:
    model: ConditionalFlowMatchingModel
    model_variables: dict
    vocoder: HifiGanGenerator
    vocoder_variables: dict
    fused_vocoder: bool = True  # Pallas MRF kernels on narrow stages (TPU)

    def __post_init__(self):
        self._synth = jax.jit(
            self._synthesize,
            static_argnames=("dt", "truncation_value", "max_frames", "pcm16", "mulaw", "ode_method"),
        )
        self._predict_durations = jax.jit(
            lambda ids: self.model.apply(self.model_variables, ids, method="predict_durations")
        )

    def _duration_bound(self, input_ids: jax.Array) -> int:
        """Host-side duration pre-pass: exact expanded length for this batch,
        bucketed (multiple of 64) to bound the number of jitted shapes.

        Replaces the old silent ``8 * input_len`` truncation bound — the
        reference computes exact expanded lengths (models.py:157-164)."""
        durations = self._predict_durations(jnp.asarray(input_ids))
        needed = int(np.asarray(jnp.sum(durations, axis=-1)).max())
        return max(64, -(-max(needed, 1) // 64) * 64)

    # -- construction ----------------------------------------------------------

    @classmethod
    def from_config(
        cls,
        model_config: CFMConfig,
        vocoder_config: HifiGanConfig = HifiGanConfig(),
        policy: Policy = BF16_INFERENCE,
        rng_seed: int = 0,
    ) -> "ConditionalFlowMatchingWithHifiGan":
        from ..core.flaxinit import jitted_init

        model = ConditionalFlowMatchingModel(model_config, policy=policy)
        ids = jnp.ones((1, 8), jnp.int32)
        mels = jnp.zeros((1, 8, model_config.dim_in), jnp.float32)
        durs = jnp.ones((1, 8), jnp.int32)
        mvars = jitted_init(
            model, {"params": jax.random.key(rng_seed)}, ids, mels, durs, rng=jax.random.key(1)
        )

        vocoder = HifiGanGenerator(vocoder_config, policy=policy)
        vvars = jitted_init(vocoder, jax.random.key(rng_seed + 2), mels)
        return cls(model, mvars, vocoder, vvars)

    @classmethod
    def from_pretrained(cls, model_dir: str, policy: Policy = BF16_INFERENCE) -> "ConditionalFlowMatchingWithHifiGan":
        """Load a local HF-format composite checkpoint directory.

        Mirrors README.md:43's
        ``ConditionalFlowMatchingWithHifiGan.from_pretrained(...)``: accepts a
        directory containing config.json + weights (the composite config holds
        ``model_config`` and ``vocoder_config`` sub-dicts, configs.py:44-61)
        or an ``org/name`` hub id resolved through the HF cache (models/hub.py).
        """
        from .convert import cfm_model_params, hifigan_generator_buffers, hifigan_generator_params
        from .hub import resolve_pretrained_dir

        model_dir = resolve_pretrained_dir(model_dir)
        with open(model_dir / "config.json") as f:
            cfg = json.load(f)

        m = cfg["model_config"]
        model_config = CFMConfig(
            **{k: m[k] for k in dataclasses.asdict(CFMConfig()).keys() if k in m}
        )
        vocoder_config = HifiGanConfig.from_dict(cfg["vocoder_config"])

        sd = _load_state_dict(model_dir)
        model_sd = {k[len("model.") :]: v for k, v in sd.items() if k.startswith("model.")}
        voc_sd = {k[len("vocoder.") :]: v for k, v in sd.items() if k.startswith("vocoder.")}

        # params per policy.param_dtype (Policy.cast_params); buffers stay
        # f32, exactly as HifiGanGenerator declares them
        model = ConditionalFlowMatchingModel(model_config, policy=policy)
        mvars = policy.cast_params(cfm_model_params(model_sd))
        vocoder = HifiGanGenerator(vocoder_config, policy=policy)
        vvars = {"params": policy.cast_params(hifigan_generator_params(voc_sd))}
        if vocoder_config.normalize_before:
            # normalize_before vocoders carry mean/scale stats; apply() would
            # otherwise try to create the immutable "buffers" collection.
            vvars["buffers"] = jax.tree_util.tree_map(jnp.asarray, hifigan_generator_buffers(voc_sd))
        return cls(model, mvars, vocoder, vvars)

    @classmethod
    def load_pretrained(cls, model_path: str, vocoder_path: str, policy: Policy = BF16_INFERENCE):
        """Two-directory variant (models.py:200-209 parity)."""
        from .convert import cfm_model_params, hifigan_generator_buffers, hifigan_generator_params
        from .hub import resolve_pretrained_dir

        model_dir, voc_dir = resolve_pretrained_dir(model_path), resolve_pretrained_dir(vocoder_path)
        with open(model_dir / "config.json") as f:
            m = json.load(f)
        model_config = CFMConfig(**{k: m[k] for k in dataclasses.asdict(CFMConfig()).keys() if k in m})
        with open(voc_dir / "config.json") as f:
            vocoder_config = HifiGanConfig.from_dict(json.load(f))

        model = ConditionalFlowMatchingModel(model_config, policy=policy)
        mvars = policy.cast_params(cfm_model_params(_load_state_dict(model_dir)))
        vocoder = HifiGanGenerator(vocoder_config, policy=policy)
        voc_sd = _load_state_dict(voc_dir)
        vvars = {"params": policy.cast_params(hifigan_generator_params(voc_sd))}
        if vocoder_config.normalize_before:
            vvars["buffers"] = jax.tree_util.tree_map(jnp.asarray, hifigan_generator_buffers(voc_sd))
        return cls(model, mvars, vocoder, vvars)

    # -- inference --------------------------------------------------------------

    def _synthesize(
        self,
        input_ids: jax.Array,
        rng: jax.Array,
        dt: float,
        truncation_value: Optional[float],
        max_frames: Optional[int],
        pcm16: bool = False,
        mulaw: bool = False,
        ode_method: str = "euler",
    ) -> Tuple[jax.Array, jax.Array]:
        if pcm16 and mulaw:
            # both are static args, so this raises at trace time, not per call
            raise ValueError("pcm16 and mulaw are mutually exclusive wire formats")
        spectrogram, frame_mask = self.model.apply(
            self.model_variables,
            input_ids,
            dt=dt,
            truncation_value=truncation_value,
            rng=rng,
            max_frames=max_frames,
            ode_method=ode_method,
            method="sample",
        )
        spectrogram_lengths = jnp.sum(frame_mask.astype(jnp.int32), axis=1)
        waveform_lengths = self.vocoder.config.waveform_lengths(spectrogram_lengths)
        if self.fused_vocoder and jax.default_backend() in ("tpu", "axon"):
            from .hifigan import generator_apply_fused

            spec_in = spectrogram
            if self.vocoder.config.normalize_before:
                # the fused path bypasses HifiGanGenerator.apply, so apply the
                # input normalization (hifigan.py normalize_before) here
                buf = self.vocoder_variables["buffers"]
                spec_in = (spectrogram - buf["mean"]) / buf["scale"]
            waveform = generator_apply_fused(
                self.vocoder_variables["params"],
                self.vocoder.config,
                spec_in,
                compute_dtype=self.vocoder.policy.compute_dtype,
            )
        else:
            waveform = self.vocoder.apply(self.vocoder_variables, spectrogram)
        if mulaw:
            # device-side 8-bit mu-law companding: quarter of the f32 host
            # transfer (wire-bound serving option; dsp/mulaw.py decodes)
            from ..dsp.mulaw import mulaw_encode

            waveform = mulaw_encode(waveform)
        elif pcm16:
            # device-side PCM16 conversion: half the host transfer, and it is
            # the wire/file format anyway (dsp/audio_io.py writes PCM16)
            waveform = jnp.round(jnp.clip(waveform, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        return waveform, waveform_lengths

    def synthesize(
        self,
        input_ids: jax.Array,
        dt: float = 0.1,
        truncation_value: Optional[float] = None,
        rng: Optional[jax.Array] = None,
        max_frames: Optional[int] = None,
        pcm16: bool = False,
        mulaw: bool = False,
        ode_method: str = "euler",
    ) -> Tuple[jax.Array, jax.Array]:
        """Batched jitted path: (padded waveforms (B, Tmax), lengths (B,)).

        ``pcm16=True`` returns int16 samples; ``mulaw=True`` returns uint8
        mu-law codes (both device-side conversions — see dsp/mulaw.py).
        ``ode_method="midpoint"`` integrates the flow second-order (half the
        velocity evals for matched accuracy — see CFMConfig.sample)."""
        if rng is None:
            rng = jax.random.key(0)
        if max_frames is None and self.model.config.predict_duration:
            max_frames = self._duration_bound(input_ids)
        return self._synth(
            jnp.asarray(input_ids),
            rng,
            dt=dt,
            truncation_value=truncation_value,
            max_frames=max_frames,
            pcm16=pcm16,
            mulaw=mulaw,
            ode_method=ode_method,
        )

    def __call__(
        self,
        input_ids,
        dt: float = 0.1,
        truncation_value: Optional[float] = None,
        rng: Optional[jax.Array] = None,
        max_frames: Optional[int] = None,
        ode_method: str = "euler",
    ) -> List[np.ndarray]:
        """Reference-signature path (models.py:223-256): list of (1, T_i)
        trimmed waveforms."""
        waveform, lengths = self.synthesize(input_ids, dt, truncation_value, rng, max_frames, ode_method=ode_method)
        waveform = np.asarray(waveform)
        lengths = np.asarray(lengths)
        return [w[None, :l] for w, l in zip(waveform, lengths)]

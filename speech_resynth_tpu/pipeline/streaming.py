"""Exact streaming vocoder: chunked mel -> waveform, byte-equal to batch.

Beyond-reference serving capability.  The reference synthesizes whole
utterances only (/root/reference/src/flow_matching/models.py:223-256 runs the
vocoder once over the full mel), so time-to-first-audio grows with utterance
length.  The HiFi-GAN stack is a finite-receptive-field convnet, which makes
exact incremental synthesis possible: feed overlapping mel windows, keep only
the output samples whose receptive field lies entirely inside the window, and
pin the first/last windows to the true utterance edges so the layers' own
zero padding matches the monolithic run.  The concatenated stream is then
EXACTLY the full-utterance waveform — no crossfades, no approximation
(tests/test_streaming.py locks equality against ``HifiGanGenerator.apply``).

The context size is derived analytically from the config
(``receptive_field_samples``): a conservative per-layer walk of contamination
radii.  For the production vocoder (hop 320, rates 5/4/4/2/2, MRF k<=11
d<=5) it comes to ~7k samples = 22 mel frames of context per side, so with
``chunk_frames=50`` (1 s of audio) each window is 94 frames and first audio
leaves the device after ~72 frames of mel instead of after the whole
utterance.

TPU notes: one window shape -> one compiled program for the entire stream
(static shapes; XLA compiles the window fn once).  On chip the window runs
through the fused/folded Pallas MRF path (``generator_apply_fused``), same
dispatch as batch synthesis.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import DEFAULT, Policy
from ..models.hifigan import HifiGanConfig, HifiGanGenerator, generator_apply_fused

__all__ = ["receptive_field_samples", "context_frames_for", "StreamingVocoder", "stream_waveform"]


def receptive_field_samples(config: HifiGanConfig) -> int:
    """Conservative one-sided contamination radius, in OUTPUT samples.

    Walks the generator: a stride-1 conv of half-width h grows the radius by
    h in its own domain; a transposed conv (stride S, kernel K) maps radius r
    to at most r*S + K; parallel MRF branches take the max.  Any output
    sample further than this from a window edge is provably independent of
    everything outside the window.
    """
    r = 3  # conv_pre k=7
    for rate, kernel in zip(config.upsample_rates, config.upsample_kernel_sizes):
        r = r * rate + kernel
        mrf = 0
        for rk, rd in zip(config.resblock_kernel_sizes, config.resblock_dilation_sizes):
            half = (rk - 1) // 2
            mrf = max(mrf, sum(half * d + half for d in rd))
        r += mrf
    return r + 3  # conv_post k=7


def context_frames_for(config: HifiGanConfig) -> int:
    """Mel frames of one-sided context that cover the receptive field."""
    return -(-receptive_field_samples(config) // config.total_upsample)


@functools.lru_cache(maxsize=None)
def _window_fn(config: HifiGanConfig, fused: bool, wire: str, policy: Policy):
    """One jitted pure window function per (config, fused, wire, policy).

    Module-level cache so every stream of the same shape shares ONE compiled
    program — a per-instance closure would retrace per utterance, and
    params-as-arguments keeps the param tree out of the HLO (CLAUDE.md: big
    closed-over trees 413 the tunneled remote compile)."""

    def _forward(variables: dict, mel: jax.Array) -> jax.Array:
        if fused:
            spec = mel
            if config.normalize_before:
                buf = variables["buffers"]
                spec = (mel - buf["mean"]) / buf["scale"]
            wav = generator_apply_fused(
                variables["params"], config, spec, compute_dtype=policy.compute_dtype
            )
        else:
            wav = HifiGanGenerator(config, policy=policy).apply(variables, mel)
        if wire == "pcm16":
            wav = jnp.round(jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        elif wire == "mulaw":
            from ..dsp.mulaw import mulaw_encode

            wav = mulaw_encode(wav)
        return wav

    return jax.jit(_forward)


class StreamingVocoder:
    """Incremental mel -> waveform for ONE utterance, exact vs batch apply.

    >>> sv = StreamingVocoder(variables, config)
    >>> for mel_chunk in frames:          # (t, model_in_dim) arrays
    ...     play(sv.push(mel_chunk))      # f32 samples, possibly empty
    >>> play(sv.flush())                  # tail; stream is then finished

    ``wire`` selects the device-side output conversion, mirroring
    ``CompositeModel.synthesize``: "f32" (default), "pcm16" (int16), or
    "mulaw" (uint8 G.711-style codes, dsp/mulaw.py) for wire-bound serving.
    """

    def __init__(
        self,
        variables: dict,
        config: HifiGanConfig,
        chunk_frames: int = 50,
        context_frames: Optional[int] = None,
        policy: Policy = DEFAULT,
        fused: Optional[bool] = None,
        wire: str = "f32",
    ):
        if wire not in ("f32", "pcm16", "mulaw"):
            raise ValueError(f"wire must be f32|pcm16|mulaw, got {wire!r}")
        self._wire = wire
        self.config = config
        self.hop = config.total_upsample
        # output samples past (L-1)*hop: the conv-transpose kernel tail
        # ((L-1)*320 + 400 for the production config; hifigan.py:71-77)
        self.extra = int(np.asarray(config.waveform_lengths(jnp.array(1))))
        self.ctx = context_frames_for(config) if context_frames is None else int(context_frames)
        self.chunk = int(chunk_frames)
        if self.chunk < 1:
            raise ValueError("chunk_frames must be >= 1")
        self.window = self.chunk + 2 * self.ctx

        if fused is None:
            fused = jax.default_backend() in ("tpu", "axon")

        # Shared across streams: one static window shape -> one compiled
        # program for EVERY utterance with this (config, wire, policy).
        self._fn = _window_fn(config, bool(fused), wire, policy)
        self._variables = variables
        self._mel: List[np.ndarray] = []  # buffered frames, each (model_in_dim,)
        self._emitted = 0  # mel frames whose samples have been emitted
        self._finished = False

    # -- internals ----------------------------------------------------------

    def _run_window(self, start: int) -> np.ndarray:
        mel = np.stack(self._mel[start : start + self.window])[None].astype(np.float32)
        return np.asarray(self._fn(self._variables, jnp.asarray(mel)))[0]

    def _drain_ready(self) -> List[np.ndarray]:
        out: List[np.ndarray] = []
        # to emit frames [E, E+chunk) we need right context through E+chunk+ctx;
        # additionally wait for a FULL window so every interior call has the one
        # static shape (early windows start at frame 0, where the margin past
        # the emit region is > ctx — harmless, still exact)
        while True:
            start = max(0, self._emitted - self.ctx)
            need = max(self._emitted + self.chunk + self.ctx, start + self.window)
            if len(self._mel) < need:
                break
            wav = self._run_window(start)
            lo = (self._emitted - start) * self.hop
            out.append(wav[lo : lo + self.chunk * self.hop])
            self._emitted += self.chunk
        return out

    # -- public -------------------------------------------------------------

    def push(self, mel_frames: np.ndarray) -> np.ndarray:
        """Feed (t, model_in_dim) mel frames; returns ready samples (may be
        empty).  Output dtype follows ``wire``."""
        if self._finished:
            raise RuntimeError("stream already flushed")
        mel_frames = np.asarray(mel_frames)
        if mel_frames.ndim != 2 or mel_frames.shape[1] != self.config.model_in_dim:
            raise ValueError(f"expected (t, {self.config.model_in_dim}) mel frames, got {mel_frames.shape}")
        self._mel.extend(mel_frames)
        chunks = self._drain_ready()
        return np.concatenate(chunks) if chunks else np.zeros((0,), self._out_dtype)

    def flush(self) -> np.ndarray:
        """Emit the tail (the frames held back for right context) and finish.
        After this, the concatenation of every push()/flush() return equals
        the monolithic ``generator.apply`` output exactly."""
        if self._finished:
            raise RuntimeError("stream already flushed")
        self._finished = True
        total = len(self._mel)
        if total == 0:
            return np.zeros((0,), self._out_dtype)
        full_len = (total - 1) * self.hop + self.extra
        if total <= self.window:
            # short stream: one full pass at the stream's own length — both
            # edges are true (same shared jit cache, keyed by shape)
            mel = np.stack(self._mel)[None].astype(np.float32)
            wav = np.asarray(self._fn(self._variables, jnp.asarray(mel)))[0]
            return wav[self._emitted * self.hop : full_len]
        start = total - self.window  # right edge == true end: tail padding matches
        wav = self._run_window(start)
        lo = (self._emitted - start) * self.hop
        return wav[lo : full_len - start * self.hop]

    @property
    def _out_dtype(self):
        return {"f32": np.float32, "pcm16": np.int16, "mulaw": np.uint8}[self._wire]


def stream_waveform(
    variables: dict,
    config: HifiGanConfig,
    mel: np.ndarray,
    chunk_frames: int = 50,
    **kwargs,
) -> np.ndarray:
    """Convenience: run a whole (T, D) mel through the streaming path and
    return the concatenated waveform (equals the batch apply output)."""
    sv = StreamingVocoder(variables, config, chunk_frames=chunk_frames, **kwargs)
    parts = [sv.push(mel)]
    parts.append(sv.flush())
    return np.concatenate(parts)

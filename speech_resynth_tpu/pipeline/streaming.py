"""Exact streaming vocoder: chunked mel -> waveform, sample-for-sample equal
to the monolithic batch apply (up to floating-point accumulation order — the
window-shaped and full-shaped compiled programs may fuse differently; the f32
CPU tests lock bitwise equality, the int16 wire test tolerates ±1 LSB).

Beyond-reference serving capability.  The reference synthesizes whole
utterances only (/root/reference/src/flow_matching/models.py:223-256 runs the
vocoder once over the full mel), so time-to-first-audio grows with utterance
length.  The HiFi-GAN stack is a finite-receptive-field convnet, which makes
exact incremental synthesis possible: feed overlapping mel windows, keep only
the output samples whose receptive field lies entirely inside the window, and
pin the first/last windows to the true utterance edges so the layers' own
zero padding matches the monolithic run.  No crossfades, no approximation
(tests/test_streaming.py locks equality against ``HifiGanGenerator.apply``).

The context size is derived analytically from the config
(``receptive_field_samples``): a conservative per-layer walk of contamination
radii.  For the production vocoder (hop 320, rates 5/4/4/2/2, MRF k<=11
d<=5) it comes to ~7k samples = 22 mel frames of context per side.

Window shapes (static — each is ONE compiled program shared by every stream):

* first window, ``chunk + ctx`` frames, pinned to the true left edge: emits
  the first ``chunk`` frames of audio as soon as ``chunk + ctx`` mel frames
  (72 at chunk 50 / ctx 22, ~1.44 s of mel) have arrived — the left context
  is the edge itself, so only right context is needed;
* interior window, ``chunk + 2*ctx`` frames (94): the steady-state shape.
  While the stream is still within ``ctx`` of the left edge (only possible
  when ``chunk < ctx``), a left-pinned interior window emits EVERY ready
  frame in one call rather than re-running the same window per chunk.

The mel buffer is bounded: frames more than one window behind the emission
frontier can never be needed again (the flush tail window starts at
``total - window >= emitted - window``) and are dropped, so memory is
O(window), not O(utterance).

TPU notes: on chip the window runs through the fused/folded Pallas MRF path
(``generator_apply_fused``), same dispatch as batch synthesis.
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
    """Incremental mel -> waveform for ONE utterance, exact vs batch apply
    (exactness caveat: floating-point accumulation order; see module doc).

    >>> sv = StreamingVocoder(variables, config)
    >>> for mel_chunk in frames:          # (t, model_in_dim) arrays
    ...     play(sv.push(mel_chunk))      # f32 samples, possibly empty
    >>> play(sv.flush())                  # tail; stream is then finished

    ``wire`` selects the device-side output conversion, mirroring
    ``CompositeModel.synthesize``: "f32" (default), "pcm16" (int16), or
    "mulaw" (uint8 G.711-style codes, dsp/mulaw.py) for wire-bound serving.

    ``device_calls`` counts window invocations — serving telemetry, and the
    efficiency contract under test (no window is ever run twice).
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
        # left-pinned first window: the true edge IS the left context, so
        # first audio needs only chunk+ctx frames (one extra static shape)
        self.first_window = self.chunk + self.ctx
        self.device_calls = 0

        if fused is None:
            fused = jax.default_backend() in ("tpu", "axon")

        # Shared across streams: one static window shape -> one compiled
        # program for EVERY utterance with this (config, wire, policy).
        self._fn = _window_fn(config, bool(fused), wire, policy)
        self._variables = variables
        self._mel: List[np.ndarray] = []  # retained frames [base, total)
        self._base = 0  # absolute index of _mel[0] (earlier frames dropped)
        self._emitted = 0  # mel frames whose samples have been emitted
        self._finished = False

    # -- internals ----------------------------------------------------------

    def _total(self) -> int:
        return self._base + len(self._mel)

    def _run_window(self, start: int, length: int) -> np.ndarray:
        i = start - self._base
        assert i >= 0, "window reaches below the retained buffer"
        mel = np.stack(self._mel[i : i + length])[None].astype(np.float32)
        self.device_calls += 1
        return np.asarray(self._fn(self._variables, jnp.asarray(mel)))[0]

    def _drain_ready(self) -> List[np.ndarray]:
        out: List[np.ndarray] = []
        # a window [start, start+w) emits every frame in
        # [emitted, start+w-ctx): right context through +ctx is in-window,
        # and the left context is either in-window (start = emitted-ctx) or
        # the true utterance edge (start = 0, zero padding == monolithic)
        while True:
            if self._emitted == 0:
                start, w = 0, self.first_window
            else:
                start, w = max(0, self._emitted - self.ctx), self.window
            if self._total() < start + w:
                break
            wav = self._run_window(start, w)
            lo = (self._emitted - start) * self.hop
            out.append(wav[lo : (w - self.ctx) * self.hop])
            self._emitted = start + w - self.ctx
        # frames more than one window behind the frontier are dead: even the
        # flush tail window starts at total-window >= emitted-window
        keep_from = max(0, self._emitted - self.window)
        if keep_from > self._base:
            del self._mel[: keep_from - self._base]
            self._base = keep_from
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
        the monolithic ``generator.apply`` output (module-doc exactness)."""
        if self._finished:
            raise RuntimeError("stream already flushed")
        self._finished = True
        total = self._total()
        if total == 0:
            return np.zeros((0,), self._out_dtype)
        full_len = (total - 1) * self.hop + self.extra
        if total <= self.window:
            # short stream: one full pass at the stream's own length — both
            # edges are true (same shared jit cache, keyed by shape); the
            # buffer is intact (keep_from = emitted-window <= total-window <= 0)
            wav = self._run_window(0, total)
            return wav[self._emitted * self.hop : full_len]
        start = total - self.window  # right edge == true end: tail padding matches
        wav = self._run_window(start, self.window)
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

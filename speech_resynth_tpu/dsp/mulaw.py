"""mu-law 8-bit companding for the serving wire format.

PCM16 is 32 KB per audio-second at 16 kHz and the serving headline is
wire-bound on this host (PARITY.md bench methodology); G.711-style mu-law
halves the wire bytes at telephony-grade quality.  The continuous companding
formula (same as torchaudio.transforms.MuLawEncoding, mu = 255):

    F(x)  = sign(x) * log(1 + mu*|x|) / log(1 + mu)        x in [-1, 1]
    code  = round((F(x) + 1) / 2 * mu)                     uint8 in [0, 255]

``mulaw_encode`` is jax (runs device-side inside the jitted synthesize
program, so only 1 byte/sample crosses the link); ``mulaw_decode`` is the
host/client-side numpy inverse.  Reference has no serving layer (its
inference is a batch eval script, src/flow_matching/eval.py); this is part
of the beyond-reference serving surface (pipeline/serving.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MU = 255.0


def mulaw_encode(waveform: jnp.ndarray) -> jnp.ndarray:
    """float waveform in [-1, 1] -> uint8 mu-law codes (jax, device-side)."""
    x = jnp.clip(waveform.astype(jnp.float32), -1.0, 1.0)
    f = jnp.sign(x) * jnp.log1p(MU * jnp.abs(x)) / np.log1p(MU)
    return jnp.round((f + 1.0) / 2.0 * MU).astype(jnp.uint8)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> float32 waveform in [-1, 1] (numpy, host-side)."""
    f = np.asarray(codes, np.float32) * (2.0 / MU) - 1.0
    return np.sign(f) * (np.expm1(np.abs(f) * np.log1p(MU))) / MU

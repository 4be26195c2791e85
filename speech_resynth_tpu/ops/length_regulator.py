"""Duration-based length regulation (FastSpeech-style repeat).

Replaces the HF ``length_regulator`` the reference imports at
/root/reference/src/flow_matching/models.py:31 and calls at models.py:110,161.

TPU-first formulation: repetition is *data-dependent scatter* in torch; here
it becomes a static-shape **cumsum + searchsorted gather** (SURVEY.md §7 hard
part 3).  For output frame t, the source token is the first index whose
cumulative duration exceeds t.  Frames past the total duration gather token 0
and are masked out.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def regulate_length(
    hidden_states: jax.Array,
    durations: jax.Array,
    out_len: int,
) -> Tuple[jax.Array, jax.Array]:
    """Expand (B, L, D) by integer durations (B, L) to (B, out_len, D).

    ``out_len`` is a static bound (>= max total duration to avoid truncation).
    Returns (expanded, frame_mask) where frame_mask (B, out_len) marks frames
    inside each utterance's total duration.
    """
    durations = durations.astype(jnp.int32)
    ends = jnp.cumsum(durations, axis=-1)  # (B, L)
    total = ends[:, -1:]  # (B, 1)

    t = jnp.arange(out_len, dtype=jnp.int32)[None, :]  # (1, out_len)
    # searchsorted per batch row: index of first end > t
    src = jax.vmap(lambda e, tt: jnp.searchsorted(e, tt, side="right"))(
        ends, jnp.broadcast_to(t, (ends.shape[0], out_len))
    )
    src = jnp.minimum(src, hidden_states.shape[1] - 1)
    expanded = jnp.take_along_axis(hidden_states, src[..., None], axis=1)
    mask = t < total
    expanded = jnp.where(mask[..., None], expanded, 0)
    return expanded, mask


def regulated_lengths(durations: jax.Array, token_mask: Optional[jax.Array] = None) -> jax.Array:
    """Total expanded length per utterance, (B,)."""
    durations = durations.astype(jnp.int32)
    if token_mask is not None:
        durations = jnp.where(token_mask, durations, 0)
    return jnp.sum(durations, axis=-1)

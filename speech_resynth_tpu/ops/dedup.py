"""Run-length deduplication of unit sequences.

Capability parity with textlesslib's ``deduplicate`` option consumed by the
reference (/root/reference/src/flow_matching/utils/textless.py:13-21 with
deduplicate=True for the LM/duration paths; preprocess.py:68-72 stores
``units`` + ``durations``).

TPU-first formulation: torch would use ``unique_consecutive`` (dynamic output
shape).  Here the op is a fixed-shape segment pass — boundary mask, cumsum
ranks, one scatter — so it jit-compiles and batches (SURVEY.md §7 hard part 6).
Outputs keep the input's static length; ``num_units`` gives the valid prefix.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def deduplicate(
    units: jax.Array,
    length: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run-length encode a 1-D unit sequence.

    Args:
      units: (T,) int array.
      length: optional scalar valid length (<= T); positions beyond it are
        ignored (padding from batched encoders).

    Returns:
      (deduped, durations, num_units): (T,)-shaped outputs zero-padded past
      ``num_units``.
    """
    T = units.shape[0]
    pos = jnp.arange(T, dtype=jnp.int32)
    valid = pos < (length if length is not None else T)

    prev = jnp.concatenate([jnp.full((1,), -1, units.dtype), units[:-1]])
    is_start = (units != prev) & valid  # first frame of each run

    rank = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # run index per frame
    num_units = jnp.sum(is_start.astype(jnp.int32))

    scatter_idx = jnp.where(is_start, rank, T)  # dumps non-starts into an overflow slot
    deduped = jnp.zeros((T + 1,), units.dtype).at[scatter_idx].set(jnp.where(valid, units, 0))[:T]

    # duration of run r = (start of run r+1) - (start of run r)
    starts = jnp.zeros((T + 1,), jnp.int32).at[scatter_idx].set(pos)[:T]
    total = jnp.sum(valid.astype(jnp.int32))
    next_starts = jnp.concatenate([starts[1:], jnp.zeros((1,), jnp.int32)])
    run_slot = jnp.arange(T, dtype=jnp.int32)
    last_run = num_units - 1
    durations = jnp.where(
        run_slot < num_units,
        jnp.where(run_slot == last_run, total - starts, next_starts - starts),
        0,
    )
    return deduped, durations, num_units


def deduplicate_batch(units: jax.Array, lengths: jax.Array):
    """vmapped deduplicate over (B, T) with per-row lengths (B,)."""
    return jax.vmap(deduplicate)(units, lengths)

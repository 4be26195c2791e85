"""Deterministic RNG threading.

Replaces the reference's global-seed approach (utils/misc.py:10-16 seeds
python/torch/numpy globally).  Here a single root ``jax.random.key`` is split
functionally; every stochastic site receives an explicit key, so runs are
reproducible across restarts and host counts.
"""

from __future__ import annotations

import jax


class RngStream:
    """A stateful convenience wrapper over functional key splitting.

    Used only at the top of training loops (host side); everything inside a
    jitted step receives keys explicitly.
    """

    def __init__(self, seed: int, process_unique: bool = False):
        key = jax.random.key(seed)
        if process_unique:
            key = jax.random.fold_in(key, jax.process_index())
        self._key = key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def fold_in(self, data: int) -> jax.Array:
        """Derive a key deterministically from (seed, data), e.g. step number."""
        return jax.random.fold_in(self._key, data)

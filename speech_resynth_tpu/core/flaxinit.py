"""Jitted Flax init: one compiled program instead of per-op dispatch.

Eager ``module.init`` runs the init trace op-by-op; on the tunneled axon
backend every dispatch pays a ~25 ms sync floor, so a full-size composite
init costs 222 s eager vs 37 s as jitted programs (measured 2026-08-19;
PARITY.md "Acted on (jitted model init)").  Every init site in the package
routes through :func:`jitted_init` so the fast path is the default and the
rationale lives in one place.
"""

from __future__ import annotations

import jax


def jitted_init(module, rngs, *args, **kwargs):
    """``module.init(rngs, *args, **kwargs)`` under ``jax.jit``.

    ``rngs`` (a PRNG key or dict of keys) and any ``jax.Array`` kwarg (e.g.
    a passed-through sampling ``rng=``) are traced arguments; dummy example
    inputs in ``args`` are closed over as constants — the exact pattern the
    222 s → 37 s probe measured.  Called once per model construction, so the
    fresh-lambda recompile per call is irrelevant.
    """
    traced_kw = {k: v for k, v in kwargs.items() if isinstance(v, jax.Array)}
    static_kw = {k: v for k, v in kwargs.items() if k not in traced_kw}

    def init_fn(r, tkw):
        return module.init(r, *args, **static_kw, **tkw)

    return jax.jit(init_fn)(rngs, traced_kw)

"""Mixed-precision policy.

The reference trains with torch AMP bf16 autocast + GradScaler(init_scale=1e24)
(flow_matching/train.py:164,174; speechlm/train.py:134,162).  On TPU the
idiomatic equivalent is params-in-f32 / compute-in-bf16 with no loss scaling:
bf16 shares float32's exponent range so underflow scaling is unnecessary.
This module centralizes that policy so every model takes a ``Policy``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)

    def cast_to_param(self, x):
        return jnp.asarray(x, self.param_dtype)

    def cast_params(self, tree):
        """Tree-cast loaded checkpoint params to ``param_dtype`` — keeps
        every loader dtype-identical to what ``module.init`` produces (under
        BF16_INFERENCE f32 storage would double the weight bytes streamed
        from HBM per step AND compile a different program than init)."""
        import jax

        return jax.tree_util.tree_map(self.cast_to_param, tree)


# Default training policy: bf16 matmuls on the MXU, f32 master params.
DEFAULT = Policy()

# Full f32 (numerics tests, golden comparisons against torch CPU).
FLOAT32 = Policy(compute_dtype=jnp.float32)

# Pure bf16 inference (weights cast once; halves HBM traffic on the RTF path).
BF16_INFERENCE = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16, output_dtype=jnp.float32)

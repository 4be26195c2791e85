"""Parameter sharding rules: tensor parallelism + FSDP.

The reference's only strategy is DDP (SURVEY.md §2.4); these rules extend
the same (data, model) mesh to larger speech LMs without API changes:

* ``tensor_parallel_rules`` — Megatron-style column/row parallel Llama
  kernels over the ``model`` axis (attention/MLP pairs chosen so each
  transformer block needs exactly one all-reduce per projection pair,
  inserted automatically by GSPMD).
* ``fsdp_rules`` — ZeRO-3-style: every large parameter sharded on its
  biggest divisible dim over the ``data`` axis; XLA inserts all-gathers on
  use and reduce-scatters on gradients.  Composes with TP (a leaf already
  sharded on ``model`` gets its remaining large dim sharded on ``data``).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS


def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def tensor_parallel_rules(mesh: Mesh, params) -> Any:
    """TP layout over the ``model`` axis when it is >1: shard attention/MLP
    Dense kernels on their output (or input, for down/o projections) dim;
    replicate everything else.  With model=1 this degrades to pure DP.
    Handles both Llama param layouts (unrolled ``layers_{i}`` subtrees and
    the scan_layers stacked layout with a leading layer axis)."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)

    def spec_for(path, leaf):
        joined = _path_str(path)
        # scan_layers layout stacks kernels with a leading layer axis (ndim 3)
        lead = (None,) if leaf.ndim == 3 else ()
        if leaf.ndim in (2, 3) and any(k in joined for k in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")):
            return NamedSharding(mesh, P(*lead, None, MODEL_AXIS))  # column parallel
        if leaf.ndim in (2, 3) and any(k in joined for k in ("o_proj", "down_proj")):
            return NamedSharding(mesh, P(*lead, MODEL_AXIS, None))  # row parallel
        if leaf.ndim == 2 and ("embed_tokens" in joined or "lm_head" in joined):
            return NamedSharding(mesh, P(None, MODEL_AXIS) if "lm_head" in joined else P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def fsdp_rules(mesh: Mesh, params, min_size: int = 2**16, tp: bool = False) -> Any:
    """ZeRO-3-style parameter sharding over the ``data`` axis.

    Each leaf >= ``min_size`` elements is sharded along its largest
    data-divisible dim; small leaves stay replicated.  With ``tp=True`` the
    TP rules apply first and FSDP claims a remaining (un-sharded) dim.
    """
    n_data = mesh.shape[DATA_AXIS]
    flat_base = {}
    if tp:
        base = tensor_parallel_rules(mesh, params)
        flat_base = dict(jax.tree_util.tree_flatten_with_path(base)[0])

    def _sharding(prior):
        while prior and prior[-1] is None:  # canonical: no trailing Nones
            prior.pop()
        return NamedSharding(mesh, P(*prior))

    def spec_for(path, leaf):
        spec = list(flat_base[path].spec) if path in flat_base else []
        prior = spec + [None] * (leaf.ndim - len(spec))
        if n_data == 1 or leaf.size < min_size:
            return _sharding(prior)
        # largest dim not already taken by TP and divisible by the data axis
        order = sorted(range(leaf.ndim), key=lambda i: -leaf.shape[i])
        for i in order:
            if prior[i] is None and leaf.shape[i] % n_data == 0:
                prior[i] = DATA_AXIS
                break
        return _sharding(prior)

    return jax.tree_util.tree_map_with_path(spec_for, params)

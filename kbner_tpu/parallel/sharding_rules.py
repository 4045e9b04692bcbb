"""Parameter sharding rules: tensor parallelism over the 'model' mesh axis.

Megatron-style layout for the XLM-R encoder under GSPMD — annotate the
params, let XLA insert the collectives (no hand-written all-reduces):

  - QKV and MLP-in kernels split their OUTPUT dim over 'model'
    (column-parallel); their biases follow,
  - attention-out and MLP-out kernels split their INPUT dim (row-parallel),
    producing partial sums that XLA all-reduces into the residual stream,
  - embeddings split the hidden dim; layer norms, the emission head and CRF
    transitions are replicated (tiny).

The batch axis of activations is sharded over 'data' by the caller.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _spec_for(path_keys, leaf) -> P:
    path = "/".join(path_keys)
    ndim = getattr(leaf, "ndim", 0)
    if "encoder" not in path:
        return P()  # heads, transitions, stack members: replicated
    if "embeddings" in path and path.endswith("embedding"):
        return P(None, MODEL_AXIS)  # [V, H] hidden sharded
    if any(f"/{qkv}/" in path for qkv in ("query", "key", "value")):
        return P(None, MODEL_AXIS) if ndim == 2 else P(MODEL_AXIS)
    if "/intermediate/" in path:
        return P(None, MODEL_AXIS) if ndim == 2 else P(MODEL_AXIS)
    if "/attention/out/" in path or "/output/" in path:
        # row-parallel: input dim sharded, bias replicated
        return P(MODEL_AXIS, None) if ndim == 2 else P()
    return P()  # layer norms etc.


def tagger_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching ``params`` for a (data, model) mesh."""

    def fn(path, leaf):
        keys = [str(getattr(k, "key", k)) for k in path]
        return NamedSharding(mesh, _spec_for(keys, leaf))

    return jax.tree_util.tree_map_with_path(fn, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, tagger_param_shardings(params, mesh))

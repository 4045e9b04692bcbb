"""Parameter sharding rules: tensor parallelism over the 'model' mesh axis,
optionally FSDP weight sharding over 'data'.

Megatron-style layout for the XLM-R encoder under GSPMD — annotate the
params, let XLA insert the collectives (no hand-written all-reduces):

  - QKV and MLP-in kernels split their OUTPUT dim over 'model'
    (column-parallel); their biases follow,
  - attention-out and MLP-out kernels split their INPUT dim (row-parallel),
    producing partial sums that XLA all-reduces into the residual stream,
  - embeddings split the hidden dim; layer norms, the emission head and CRF
    transitions are replicated (tiny).

With ``fsdp=True`` the free axis of every 2-D encoder kernel (and the
vocab axis of the embedding table) additionally shards over 'data' —
ZeRO-3-style: each DP replica holds 1/data of the weights and optimizer
state, and GSPMD all-gathers a layer's weights just before use (the
scaling-book fsdp recipe, no hand-written gather).

The batch axis of activations is sharded over 'data' by the caller.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _spec_for(path_keys, leaf, fsdp: bool = False) -> P:
    path = "/".join(path_keys)
    ndim = getattr(leaf, "ndim", 0)
    data = DATA_AXIS if fsdp else None
    if "encoder" not in path:
        return P()  # heads, transitions, stack members: replicated
    if "embeddings" in path and path.endswith("embedding"):
        return P(data, MODEL_AXIS)  # [V, H] hidden sharded (+V over data)
    if any(f"/{qkv}/" in path for qkv in ("query", "key", "value")):
        return P(data, MODEL_AXIS) if ndim == 2 else P(MODEL_AXIS)
    if "/intermediate/" in path:
        return P(data, MODEL_AXIS) if ndim == 2 else P(MODEL_AXIS)
    if "/attention/out/" in path or "/output/" in path:
        # row-parallel: input dim sharded; bias replicated (tiny)
        return P(MODEL_AXIS, data) if ndim == 2 else P()
    return P()  # layer norms etc.


def tagger_param_shardings(params: Any, mesh: Mesh,
                           fsdp: bool = False) -> Any:
    """NamedSharding pytree matching ``params`` for a (data, model) mesh."""

    def fn(path, leaf):
        keys = [str(getattr(k, "key", k)) for k in path]
        spec = _spec_for(keys, leaf, fsdp)
        if fsdp:
            # FSDP needs the sharded dims to divide; fall back to the
            # TP-only spec for odd-shaped leaves rather than failing
            shape = getattr(leaf, "shape", ())
            for dim, axis in zip(shape, spec):
                if axis is None:
                    continue
                if dim % mesh.shape[axis]:
                    spec = _spec_for(keys, leaf, False)
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(fn, params)


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    return jax.device_put(params, tagger_param_shardings(params, mesh, fsdp))

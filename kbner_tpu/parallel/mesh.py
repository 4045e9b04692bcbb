"""Device mesh construction and sharding rules.

The reference is strictly single-process single-GPU (SURVEY.md §2.7); all
scaling here is new capability, built the TPU way: one ``jax.sharding.Mesh``
with named axes and NamedSharding annotations — XLA inserts the collectives.

Axes:
  data   — batch dimension of training/eval/query batches (DP)
  model  — hidden/tagset dimensions of large layers (TP), and the document
           axis of the retrieval index (index sharding)

On a v5e-8 slice a (data=8, model=1) or (data=4, model=2) mesh both ride ICI.
Tests use 8 virtual CPU devices (tests/conftest.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Device-put a host batch with the batch axis sharded over 'data'.

    The host batch size must be divisible by the data-axis size; batching
    code pads batches to that multiple.
    """
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def pad_batch_for_mesh(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, np.ndarray]:
    """Pad the batch axis up to a multiple of the data-axis size with zero
    rows (zero attention/word masks make padding sentences inert)."""
    n_data = mesh.shape[DATA_AXIS]
    b = next(iter(batch.values())).shape[0]
    rem = (-b) % n_data
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        pad_width = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad_width)
    return out

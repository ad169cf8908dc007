"""Mesh construction and sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel``
(``train.py:220-223``).  The TPU-native replacement (SURVEY.md §2.2) is
GSPMD data parallelism: build a ``Mesh`` over the visible devices with a
``data`` axis, shard every batch tensor on that axis, replicate parameters
and optimizer state, and let XLA emit the gradient all-reduce over ICI
(and DCN across hosts — the same jitted program covers multi-host pod
slices after ``jax.distributed.initialize``).

The model itself is small (a few M params), so DP is the scaling axis; the
edge-partitioned giant-batch path lives in
:mod:`druggen_tpu.parallel.edge_partition`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 0, devices=None) -> Mesh:
    """1-D mesh over ``data``.  ``n_data=0`` uses every visible device."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(f"requested {n_data} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_data]), axis_names=("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, *arrays):
    """device_put each [B, ...] array batch-sharded over the mesh."""
    return tuple(jax.device_put(a, batch_sharding(mesh, np.ndim(a)))
                 for a in arrays)


def shard_state(mesh: Mesh, state):
    """Replicate a parameter/optimizer pytree over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)

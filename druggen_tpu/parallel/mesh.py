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


def init_distributed(coordinator_address: str = "", num_processes: int = 0,
                     process_id: int = -1) -> tuple[int, int]:
    """Multi-host initialization (SURVEY.md §2.2 multi-host row).

    On TPU pods with default env-based discovery every argument can be
    empty; explicit values support manual bring-up.  Returns
    (process_index, process_count)."""
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def global_batch_from_local(mesh: Mesh, *arrays):
    """Assemble globally-sharded batch arrays from per-host local shards.

    Single-process: plain sharded device_put.  Multi-process: each host
    contributes its local slice of the global batch
    (``jax.make_array_from_process_local_data``); the same jitted SPMD
    train step then runs unchanged — XLA routes the gradient all-reduce
    over ICI within a slice and DCN across hosts."""
    if jax.process_count() == 1:
        return shard_batch(mesh, *arrays)
    out = []
    for a in arrays:
        sh = batch_sharding(mesh, np.ndim(a))
        out.append(jax.make_array_from_process_local_data(sh, np.asarray(a)))
    return tuple(out)

"""Edge-partitioned giant-batch attention (explicit shard_map collectives).

The DrugGEN family's analogue of sequence/context parallelism (SURVEY.md §5
long-context row, BASELINE config 5): the memory hog is the
``[B, N, N, dim]`` edge stream, so for giant batches we shard it — batch on
the ``data`` axis, and the *query-vertex* (first N) axis on a ``node``
axis.  Each device then holds a ``[B/dp, N/np, N, dim]`` edge block and the
matching ``[B/dp, N/np, dim]`` query-node rows, and needs the **full** key/
value node rows: a single ``all_gather`` over the ``node`` axis (riding
ICI) supplies them, after which the fused attention math is local.  The
output node rows and edge blocks land already-sharded, so no further
communication is needed until the (replicated-weight) projections' gradient
all-reduce, which ``shard_map``'s psum handles.

This module provides the sharded attention core plus a loss-and-grad
wrapper used by the scaling harness (scripts/scaling_bench.py) to measure
edges/s efficiency vs the single-device path.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_edge_mesh(dp: int, np_axis: int, devices=None) -> Mesh:
    """2-D mesh: ('data', 'node')."""
    devices = list(devices if devices is not None else jax.devices())
    need = dp * np_axis
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{np_axis} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:need]).reshape(dp, np_axis)
    return Mesh(arr, axis_names=("data", "node"))


def _local_attention(q, k, v, e, dk: int):
    """Reference attention math on local blocks.

    q: [b, ni, h*dk] (local query rows), k/v: [b, n, h*dk] (full),
    e: [b, ni, n, h*dk] (local edge block).
    Returns edge_pre [b, ni, n, d], node_agg [b, ni, d]."""
    t = (q[:, :, None, :] * k[:, None, :, :]) / math.sqrt(dk)
    t = t * (e + 1.0) * e
    s = jax.nn.softmax(t, axis=2)
    node_agg = (s * v[:, None, :, :]).sum(axis=2)
    return t, node_agg


def edge_partitioned_attention(mesh: Mesh, q, k, v, e, dk: int):
    """Sharded edge-modulated attention.

    Global shapes: q/k/v [B, N, D]; e [B, N, N, D].  Sharding: B on 'data';
    q and e's first N axis on 'node'; k/v replicated-after-gather.
    Returns (edge_pre [B, N, N, D] sharded the same way, node_agg [B, N, D]).
    """

    def body(q_blk, k_blk, v_blk, e_blk):
        # k/v arrive sharded on 'node' along their N axis; gather full rows
        k_full = jax.lax.all_gather(k_blk, "node", axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_blk, "node", axis=1, tiled=True)
        return _local_attention(q_blk, k_full, v_full, e_blk, dk)

    spec_q = P("data", "node", None)
    spec_e = P("data", "node", None, None)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec_q, spec_q, spec_q, spec_e),
                   out_specs=(spec_e, spec_q))
    return fn(q, k, v, e)


def reference_unsharded(q, k, v, e, dk: int):
    return _local_attention(q, k, v, e, dk)


def make_sharded_loss_grad(mesh: Mesh, dk: int):
    """loss = sum of squares of both outputs; returns jitted value-and-grad
    with the edge-partitioned forward, for scaling measurements (the
    backward's collectives — reduce_scatter duals of the all_gathers — are
    emitted automatically by shard_map's transpose)."""

    def loss(q, k, v, e):
        ep, na = edge_partitioned_attention(mesh, q, k, v, e, dk)
        return jnp.sum(ep * ep) + jnp.sum(na * na)

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))


def shard_inputs(mesh: Mesh, q, k, v, e):
    """device_put the global arrays with the edge-partition shardings."""
    sq = NamedSharding(mesh, P("data", "node", None))
    se = NamedSharding(mesh, P("data", "node", None, None))
    return (jax.device_put(q, sq), jax.device_put(k, sq),
            jax.device_put(v, sq), jax.device_put(e, se))

"""Edge-partitioned giant-batch training (explicit shard_map collectives).

The DrugGEN family's analogue of sequence/context parallelism (SURVEY.md §5
long-context row, BASELINE config 5): the memory hog is the
``[B, N, N, dim]`` edge stream, so for giant batches we shard it — batch on
the ``data`` axis, and the *query-vertex* (first N) axis on a ``node``
axis.  Each device then holds a ``[B/dp, N/np, N, dim]`` edge block and the
matching ``[B/dp, N/np, dim]`` query-node rows.  Communication, all riding
ICI, touches only the small node stream plus one edge all_to_all:

- attention ``all_gather``s k/v rows (:class:`druggen_tpu.models.GraphMHA`
  with ``node_axis`` set),
- the trunk's symmetrization does one distributed transpose of the edge
  block (``all_to_all``, :func:`druggen_tpu.models.layers.distributed_edge_transpose`),
- the critic head ``all_gather``s the final node rows,
- gradients/psums close the loop (emitted by shard_map's transposes).

This module provides (a) the sharded attention core used by the scaling
harness and (b) :func:`make_sharded_train_step` — the COMPLETE WGAN-GP
iteration (both trunks, all critic passes, the double-backward gradient
penalty, both optimizer updates) under one ``shard_map`` on the
``('data', 'node')`` mesh, numerically matching the single-device step
(tests/test_edge_partition_full.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map


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


# ---------------------------------------------------------------------------
# Full-model edge-partitioned WGAN-GP training
# ---------------------------------------------------------------------------
#
# AD structure: parameter gradients are taken THROUGH the shard_map boundary
# (jax.value_and_grad of a function whose body is a shard_map returning the
# psum'ed global loss).  shard_map is a differentiable primitive, so the
# boundary transpose — including the bookkeeping for values that are
# replicated over 'node' after the critic head's all_gather — is exact by
# construction; no manual gradient scaling is needed at the outer level.
#
# The models' node-axis gathers use the *invariant* all_gather
# (layers.gather_node_rows): its output is replication-tagged over 'node'
# and its transpose is a slice of the replicated cotangent, so both the
# gradient penalty's INNER jax.grad (inside the body) and the outer
# boundary differentiation come out exact with no manual scaling.  (With
# plain all_gather, every device's independently-seeded cotangent for the
# node-replicated critic value would be summed by the psum-scatter
# transpose — k-fold-inflated gradients, verified while building this.)


def _slice_by_axis_index(full, axis_name: str, local: int):
    """Slice a per-GLOBAL-batch array down to this device's batch shard."""
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(full, idx * local, local)


def _sharded_gradient_penalty(critic, real_node, real_edge, fake_node,
                              fake_edge, key, b_glob: int, cast_dtype=None):
    """Global gradient-penalty value computed on local shards (inside a
    shard_map body over ('data','node')).

    Mirrors losses.gradient_penalty (reference loss.py:4-49) including the
    eps draw: eps is sampled for the FULL global batch from the same key and
    sliced per data shard, so values match the unsharded step bit-for-bit.
    Returns the global scalar (replicated on every device).

    ``cast_dtype``: cast the interpolants before differentiation (the
    gp_f32 path — pass a critic whose apply is f32 alongside it; see
    losses.gradient_penalty)."""
    b_loc = real_node.shape[0]
    k_node, k_edge = jax.random.split(key)
    eps_node = _slice_by_axis_index(
        jax.random.uniform(k_node, (b_glob, 1, 1), real_node.dtype),
        "data", b_loc)
    eps_edge = _slice_by_axis_index(
        jax.random.uniform(k_edge, (b_glob, 1, 1, 1), real_edge.dtype),
        "data", b_loc)

    int_node = eps_node * real_node + (1.0 - eps_node) * fake_node
    int_edge = eps_edge * real_edge + (1.0 - eps_edge) * fake_edge
    if cast_dtype is not None:
        int_node = int_node.astype(cast_dtype)
        int_edge = int_edge.astype(cast_dtype)

    def critic_sum(node, edge):
        # the critic's value is replicated over 'node' via the invariant
        # gather in its head, whose slice-transpose makes this inner grad
        # exact without manual scaling (see layers.gather_node_rows)
        return jnp.sum(critic(edge, node))

    g_node, g_edge = jax.grad(critic_sum, argnums=(0, 1))(int_node,
                                                          int_edge)
    # norm/penalty reduction in f32 regardless of compute dtype (matches
    # losses.gradient_penalty: under bf16 the squared-sum/sqrt chain is
    # the numerically sensitive part of the whole step)
    sq = (jnp.sum(g_node.reshape(b_loc, -1).astype(jnp.float32) ** 2,
                  axis=1)
          + jnp.sum(g_edge.reshape(b_loc, -1).astype(jnp.float32) ** 2,
                    axis=1))
    sq = jax.lax.psum(sq, "node")          # full per-sample squared norms
    norms = jnp.sqrt(sq + 1e-12)
    return jax.lax.psum(jnp.sum((norms - 1.0) ** 2), "data") / b_glob


def make_sharded_train_step(g_model, d_model, g_opt, d_opt, mesh: Mesh, *,
                            lambda_gp: float, m_dim: int, b_dim: int,
                            submodel: str = "DrugGEN",
                            compute_dtype=jnp.float32, donate: bool = True,
                            gp_f32: bool = False, f32_stats: bool = False):
    """The complete WGAN-GP train step sharded over a ('data','node') mesh.

    Same signature and semantics as train.step.make_train_step's product:
    ``step(state, key, x [B,N] int, a [B,N,N] int, drug_x, drug_a) ->
    (new_state, {d_loss, g_loss}, (node_logits, edge_logits))`` — but the
    batch axis is sharded over 'data' and the first vertex axis over
    'node', so the [B, N, N, dim] edge streams never exist whole on any
    device: giant-batch configs whose edge stream exceeds one chip's HBM
    become trainable.  Parameters/optimizer state are replicated; output
    logits land sharded.

    Constraints: dropout must be 0 (the reference default — sharded dropout
    masks would differ from the unsharded draw), vertexes % node_k == 0
    (pad the dataset to e.g. 48 otherwise), and label (not dense-feature)
    node inputs.  PRNG use matches train.step exactly, so losses and
    updated parameters match the single-device step
    (tests/test_edge_partition_full.py)."""
    assert getattr(g_model, "dropout", 0.0) == 0.0, \
        "edge-partitioned training requires dropout=0"
    assert getattr(d_model, "dropout", 0.0) == 0.0, \
        "edge-partitioned training requires dropout=0"
    node_k = mesh.shape["node"]
    data_k = mesh.shape["data"]
    if f32_stats and compute_dtype != jnp.float32:
        # tier-2 numerics (see train.step.make_train_step): f32 LN/softmax
        # reductions; the fused kernels (bf16-internal) drop out with it
        g_model = g_model.clone(f32_stats=True, use_pallas=False,
                                fused_mlp=False)
        d_model = d_model.clone(f32_stats=True, use_pallas=False,
                                fused_mlp=False)
    g_sh = g_model.clone(node_axis="node")
    d_sh = d_model.clone(node_axis="node")
    # gp_f32: f32 critic clone for the GP pass + f32 interpolant cast
    # (same escalation the single-device step got in round 4 — the bf16
    # GP double-backward destabilizes once critic weights grow)
    use_gp32 = gp_f32 and compute_dtype != jnp.float32
    d_gp_sh = d_sh.clone(dtype=None) if use_gp32 else d_sh
    gp_cast = jnp.float32 if use_gp32 else None

    rep = P()
    spec_n3 = P("data", "node", None)            # [B, N, m] blocks
    spec_e4 = P("data", "node", None, None)      # [B, N, N, b] blocks

    def g_fwd_body(g_params, e, n):
        _, _, node_logits, edge_logits = g_sh.apply(g_params, e, n,
                                                    deterministic=True)
        return node_logits, edge_logits

    g_forward = shard_map(g_fwd_body, mesh=mesh,
                          in_specs=(rep, spec_e4, spec_n3),
                          out_specs=(spec_n3, spec_e4))

    def step_fn(state, key, x_labels, a_labels, drug_x_labels,
                drug_a_labels):
        b_glob = x_labels.shape[0]
        step_key = jax.random.fold_in(key, state.step)
        # same split layout as train.step (the dropout keys are unused —
        # dropout is asserted 0 in this mode)
        k_gp, _, _, _, _ = jax.random.split(step_key, 5)

        # one-hot outside the shard_maps: GSPMD keeps the label sharding
        x = jax.nn.one_hot(x_labels, m_dim, dtype=compute_dtype)
        a = jax.nn.one_hot(a_labels, b_dim, dtype=compute_dtype)
        if submodel == "NoTarget":
            disc_x, disc_a = x, a
        else:
            disc_x = jax.nn.one_hot(drug_x_labels, m_dim,
                                    dtype=compute_dtype)
            disc_a = jax.nn.one_hot(drug_a_labels, b_dim,
                                    dtype=compute_dtype)

        # fake logits (reference loss.py:60; detached for the D step)
        node_logits, edge_logits = g_forward(state.g_params, a, x)
        fake_node = jax.lax.stop_gradient(node_logits)
        fake_edge = jax.lax.stop_gradient(edge_logits)

        # ---- D update (reference train.py:352-368, loss.py:52-72)
        def d_body(d_params, gp_key, disc_a_, disc_x_, fe, fn_):
            critic = lambda e, n: d_sh.apply(d_params, e, n,  # noqa: E731
                                             deterministic=True)
            critic_gp = (lambda e, n: d_gp_sh.apply(  # noqa: E731
                d_params, e.astype(jnp.float32), n.astype(jnp.float32),
                deterministic=True)) if use_gp32 else critic
            lr = jax.lax.psum(jnp.sum(critic(disc_a_, disc_x_)),
                              "data") / b_glob
            lf = jax.lax.psum(jnp.sum(critic(fe, fn_)), "data") / b_glob
            gp = _sharded_gradient_penalty(critic_gp, disc_x_, disc_a_, fn_,
                                           fe, gp_key, b_glob,
                                           cast_dtype=gp_cast)
            return lf - lr + lambda_gp * gp

        def d_loss_fn(d_params):
            fn = shard_map(
                d_body, mesh=mesh,
                in_specs=(rep, rep, spec_e4, spec_n3, spec_e4, spec_n3),
                out_specs=rep)
            return fn(d_params, k_gp, disc_a, disc_x, fake_edge, fake_node)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state,
                                              state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G update against the updated critic (train.py:370-384)
        def g_body(g_params, d_params_, a_, x_):
            _, _, n_logits, e_logits = g_sh.apply(g_params, a_, x_,
                                                  deterministic=True)
            logits = d_sh.apply(d_params_, e_logits, n_logits,
                                deterministic=True)
            return -jax.lax.psum(jnp.sum(logits), "data") / b_glob

        def g_loss_fn(g_params):
            fn = shard_map(g_body, mesh=mesh,
                           in_specs=(rep, rep, spec_e4, spec_n3),
                           out_specs=rep)
            return fn(g_params, d_params, a, x)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        from druggen_tpu.train.step import GANState

        new_state = GANState(g_params, d_params, g_opt_state, d_opt_state,
                             state.step + 1)
        metrics = {"d_loss": d_loss, "g_loss": g_loss}
        return new_state, metrics, (node_logits, edge_logits)

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def shard_train_inputs(mesh: Mesh, *arrays):
    """Place label batches with the ('data','node') shardings
    (x [B,N] -> P('data','node'); a [B,N,N] -> P('data','node',None)).

    Single-process: plain sharded device_put.  Multi-process (multi-host
    composition, SURVEY §2.2): each host passes its LOCAL batch slice (the
    per-host shard the :class:`druggen_tpu.data.dataset.BatchIterator`
    yields) and the global array is assembled without any cross-host data
    movement — each host's devices must own whole 'data' rows of the mesh
    (``node`` axis local to a host), which :class:`Trainer` guards."""
    multiproc = jax.process_count() > 1
    out = []
    for arr in arrays:
        spec = (P("data", "node") if np.ndim(arr) == 2
                else P("data", "node", None))
        sh = NamedSharding(mesh, spec)
        if multiproc:
            out.append(jax.make_array_from_process_local_data(
                sh, np.asarray(arr)))
        else:
            out.append(jax.device_put(arr, sh))
    return tuple(out)

"""Tensor parallelism (demonstration axis).

The reference has no TP (SURVEY.md §2.2); at dim=128 the model doesn't
*need* it — but the framework supports sharding the attention/MLP weight
matrices over a ``model`` mesh axis so the same program scales to wide
configurations (dim 1024+, depth 8 — BASELINE config 4).

Implementation: GSPMD param-sharding rules.  Dense kernels whose OUTPUT
feeds the per-head attention math shard their output feature axis on
``model`` (head-parallel q/k/v/e); the out-projections shard their INPUT
axis (row-parallel, XLA inserts the psum); MLP fc1/fc2 follow the standard
Megatron column/row pattern.  Everything else (LayerNorms, readouts,
biases of row-parallel layers) is replicated.  Activations are left to
GSPMD propagation — with batch sharded on ``data`` the compiler keeps the
``[B,N,N,dim]`` edge stream sharded over both axes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_tp_mesh(dp: int, tp: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices")
    arr = np.array(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


# param-path suffix -> (kernel spec, bias spec)
_COLUMN = (P(None, "model"), P("model"))      # shard output features
_ROW = (P("model", None), P())                # shard input features
_REPL = (P(), P())

_RULES = (
    ("attn/q", _COLUMN),
    ("attn/k", _COLUMN),
    ("attn/v", _COLUMN),
    ("attn/e", _COLUMN),
    ("attn/out_e", _ROW),
    ("attn/out_n", _ROW),
    ("mlp/fc1", _COLUMN),
    ("mlp/fc2", _ROW),
    ("mlp2/fc1", _COLUMN),
    ("mlp2/fc2", _ROW),
)


def _spec_for(path: str, is_kernel: bool):
    for suffix, (kspec, bspec) in _RULES:
        if suffix in path:
            return kspec if is_kernel else bspec
    return P()


def tp_param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for a Generator/Discriminator param tree."""

    def one(path_tuple, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        is_kernel = path.endswith("kernel")
        spec = _spec_for(path, is_kernel)
        # biases of column-parallel layers shard only if divisible
        if spec != P() and leaf.ndim == 1:
            ax = spec[0] if len(spec) else None
            if ax is None or leaf.shape[0] % mesh.shape.get("model", 1) != 0:
                spec = P()
        if spec != P() and leaf.ndim >= 2:
            # verify divisibility; fall back to replication otherwise
            dims = list(spec)
            for d, name in enumerate(dims):
                if name == "model" and leaf.shape[d] % mesh.shape["model"] != 0:
                    spec = P()
                    break
        return NamedSharding(mesh, spec)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {path: one(path, leaf) for path, leaf in flat}
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [specs[p] for p, _ in flat])


def shard_params_tp(mesh: Mesh, params):
    """device_put the param tree with TP shardings."""
    sh = tp_param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def shard_gan_state_tp(mesh: Mesh, state):
    """Apply TP shardings to a full ``GANState`` (params + optimizer states).

    Optimizer states (optax adamw) are tuples/namedtuples whose mu/nu
    members are param-shaped pytrees: any subtree whose structure equals
    the corresponding param tree gets the same TP shardings; scalar leaves
    (Adam count, schedule state) are replicated.  This keeps the momentum
    buffers co-located with their weights — no per-step resharding."""
    g_sh = tp_param_shardings(mesh, state.g_params)
    d_sh = tp_param_shardings(mesh, state.d_params)
    repl = NamedSharding(mesh, P())

    def shard_like(tree, shardings, treedef):
        def rec(node):
            try:
                if jax.tree_util.tree_structure(node) == treedef:
                    return jax.tree_util.tree_map(jax.device_put, node,
                                                  shardings)
            except Exception:
                pass
            if isinstance(node, tuple):
                vals = [rec(v) for v in node]
                try:
                    return type(node)(*vals)
                except TypeError:
                    return tuple(vals)
            if isinstance(node, dict):
                return {k: rec(v) for k, v in node.items()}
            return jax.device_put(node, repl)

        return rec(tree)

    g_def = jax.tree_util.tree_structure(state.g_params)
    d_def = jax.tree_util.tree_structure(state.d_params)
    return state._replace(
        g_params=jax.tree_util.tree_map(jax.device_put, state.g_params, g_sh),
        d_params=jax.tree_util.tree_map(jax.device_put, state.d_params, d_sh),
        g_opt_state=shard_like(state.g_opt_state, g_sh, g_def),
        d_opt_state=shard_like(state.d_opt_state, d_sh, d_def),
        step=jax.device_put(state.step, repl))

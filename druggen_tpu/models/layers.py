"""Graph-transformer building blocks.

Functional re-implementation of the reference's layer math
(``src/model/layers.py``).  The attention here is intentionally **not**
standard dot-product attention — the reference uses an idiosyncratic
edge-modulated, per-channel construction (``layers.py:108-137``) and the
whole model family (checkpoints, training dynamics, metrics) depends on it:

    q, k, v : [B, N, H, Dk]      e : [B, N, N, H, Dk]
    attn    = (q_i ⊙ k_j) / sqrt(Dk)          # ELEMENT-WISE, per channel
    attn    = attn * (e + 1) * e              # edge modulation
    edge'   = out_e(flatten(attn))            # PRE-softmax edge readout
    attn    = softmax(attn, axis=j)           # per channel (H, Dk)!
    node'   = out_n(flatten(Σ_j attn ⊙ v_j))

TPU notes: all heavy compute is the six Dense projections — batched
[B*N*N, D] x [D, D] matmuls that XLA tiles onto the MXU.  The elementwise
modulate/softmax chain over the [B, N, N, D] edge stream is the
bandwidth-bound part; :mod:`druggen_tpu.ops.fused_attention` provides a
fused Pallas kernel for it, which these modules use when enabled.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# Torch-style Linear initialization (kaiming_uniform(a=sqrt(5)) for the
# kernel, uniform(+-1/sqrt(fan_in)) for the bias) so training dynamics match
# the reference's nn.Linear defaults.
def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dense(features: int, fan_in: int, dtype=None, name: str | None = None) -> nn.Dense:
    return nn.Dense(features, dtype=dtype, name=name,
                    kernel_init=torch_linear_kernel_init,
                    bias_init=torch_linear_bias_init(fan_in))


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference models.py:39-46: relu/leaky/sigmoid/
    tanh)."""
    acts = {
        "relu": nn.relu,
        "leaky": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "sigmoid": nn.sigmoid,
        "tanh": nn.tanh,
    }
    if name not in acts:
        raise ValueError(f"unsupported activation {name!r}")
    return acts[name]


class MLP(nn.Module):
    """Two-layer ReLU MLP with output dropout (reference layers.py:7-54)."""

    in_feat: int
    hid_feat: int | None = None
    out_feat: int | None = None
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hid = self.hid_feat or self.in_feat
        out = self.out_feat or self.in_feat
        x = _dense(hid, self.in_feat, self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = _dense(out, hid, self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


try:  # public from jax 0.10; private location in 0.9
    from jax.lax import all_gather_invariant as _all_gather_invariant
except ImportError:  # pragma: no cover
    from jax._src.lax.parallel import (
        all_gather_invariant as _all_gather_invariant,
    )


def gather_node_rows(x, axis_name: str, axis: int = 1):
    """all_gather node rows sharded over ``axis_name`` into the full array.

    Uses the *invariant* gather: its output is replication-tagged over the
    axis (each device provably holds identical values) and its AD transpose
    is a slice of the replicated cotangent — the correct semantics for
    "gather then compute a replicated result", and the reason the whole
    sharded WGAN-GP step differentiates exactly through the shard_map
    boundary (plain ``all_gather``'s psum-scatter transpose would k-fold
    the cotangents of the replicated critic head)."""
    return _all_gather_invariant(x, axis_name, axis=axis, tiled=True)


def distributed_edge_transpose(e, axis_name: str):
    """Transpose axes (1, 2) of a globally-[B, N, N, D] edge tensor whose
    first N axis is sharded over ``axis_name`` (shard_map context).

    One tiled ``all_to_all`` — the distributed-transpose collective — turns
    the local ``[B, n_loc, N, D]`` row block into the column block
    ``[B, N, n_loc, D]``; a local axis swap finishes the transpose.  Its AD
    transpose is itself an all_to_all (self-dual), so this composes with
    the WGAN-GP double backward."""
    z = jax.lax.all_to_all(e, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)
    return z.transpose(0, 2, 1, 3)


class GraphMHA(nn.Module):
    """Edge-modulated multi-head attention (reference MHA, layers.py:56-137).

    Returns (node_out [B,N,D], edge_out [B,N,N,D]).

    ``node_axis``: name of a mesh axis the *query-vertex* (first N) axis is
    sharded over — the edge-partitioned giant-batch mode
    (:mod:`druggen_tpu.parallel.edge_partition`), valid only inside
    ``shard_map``.  Inputs are then local blocks (node ``[B, n_loc, D]``,
    edge ``[B, n_loc, N, D]``); k/v are projected on local rows and
    ``all_gather``ed over the axis (the only communication — it rides ICI
    and moves the small [B,N,D] node stream, never the edge stream)."""

    dim: int
    heads: int
    dtype: Any = None
    use_pallas: bool = False
    node_axis: str | None = None
    # f32_stats: compute the per-channel softmax in f32 (cast back to the
    # compute dtype for the V aggregation).  The bf16-forward stability
    # escalation tier (PERF.md round 4: "tracked for a future
    # f32-LN/softmax option"); the reference's own numerics are all-f32.
    f32_stats: bool = False

    @nn.compact
    def __call__(self, node, edge, tail=None):
        assert self.dim % self.heads == 0
        assert not (self.use_pallas and self.node_axis), \
            "fused attention kernel does not support the node-sharded mode"
        assert not (self.use_pallas and self.f32_stats), \
            "f32_stats requires the XLA attention path (kernels are bf16)"
        b, n, c = node.shape
        h = self.heads
        dk = c // h

        q3 = _dense(c, c, self.dtype, name="q")(node)
        q = q3.reshape(b, n, h, dk)
        k = _dense(c, c, self.dtype, name="k")(node)
        v = _dense(c, c, self.dtype, name="v")(node)

        if tail is not None:
            # v5 megablock (ops/fused_block.py): the entire edge stream of
            # this encoder block — e-projection, modulate, out_e readout,
            # per-channel softmax aggregation, residual, LN4 -> MLP2 -> LN6
            # tail — in one Pallas residency.  ``tail`` carries the
            # EncoderBlock-scope tail parameters.
            assert self.node_axis is None and not self.use_pallas
            e_dense = _dense(c, c, self.dtype, name="e")
            out_e = _dense(c, c, self.dtype, name="out_e")
            _ = e_dense(edge[:, :1, :1, :])      # create params with the
            _ = out_e(edge[:, :1, :1, :])        # standard names
            pe = e_dense.variables["params"]
            poe = out_e.variables["params"]
            from druggen_tpu.ops.fused_block import fused_block_edge_stream

            y_out, node_agg = fused_block_edge_stream(
                q3, k, v, edge,
                pe["kernel"], pe["bias"], poe["kernel"], poe["bias"],
                *tail, heads=h)
            node_out = _dense(c, c, self.dtype, name="out_n")(node_agg)
            return node_out, y_out
        if self.node_axis:
            k = gather_node_rows(k, self.node_axis)
            v = gather_node_rows(v, self.node_axis)
        nk = k.shape[1]
        k = k.reshape(b, nk, h, dk)
        v = v.reshape(b, nk, h, dk)

        e_dense = _dense(c, c, self.dtype, name="e")
        out_e = _dense(c, c, self.dtype, name="out_e")
        out_n = _dense(c, c, self.dtype, name="out_n")

        if self.use_pallas:
            # Fully-fused path: the e and out_e projections run INSIDE the
            # Pallas kernel (druggen_tpu/ops/fused_attention.py v3).  Touch
            # both Dense modules on a dummy row so their parameters exist
            # with the standard names (checkpoint-compatible with the XLA
            # path), then hand the raw weights to the kernel.
            _ = e_dense(edge[:, :1, :1, :])
            _ = out_e(edge[:, :1, :1, :])
            we = e_dense.variables["params"]["kernel"]
            be = e_dense.variables["params"]["bias"]
            woe = out_e.variables["params"]["kernel"]
            boe = out_e.variables["params"]["bias"]
            from druggen_tpu.ops.fused_attention import (
                edge_modulated_attention_proj,
            )

            edge_out, node_agg = edge_modulated_attention_proj(
                q, k, v, edge, we, be, woe, boe)
            node_out = out_n(node_agg)
            return node_out, edge_out

        e = e_dense(edge).reshape(b, n, nk, h, dk)
        # attn[b,i,j,h,dk] = q_i * k_j / sqrt(dk) * (e_ij + 1) * e_ij
        attn = q[:, :, None] * k[:, None, :, :, :]      # [b,n,nk,h,dk]
        attn = attn / math.sqrt(dk)
        attn = attn * (e + 1.0) * e
        edge_pre = attn.reshape(b, n, nk, c)
        if self.f32_stats:
            # f32 softmax reduction, bf16 V-aggregation (escalation tier)
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=2).astype(v.dtype)
        else:
            attn = jax.nn.softmax(attn, axis=2)         # over keys j,
        # independently per channel (h, dk) — reference layers.py:130
        node_agg = (attn * v[:, None, :, :, :]).sum(axis=2)  # [b,n,h,dk]
        node_agg = node_agg.reshape(b, n, c)

        edge_out = out_e(edge_pre)
        node_out = out_n(node_agg)
        return node_out, edge_out


class EncoderBlock(nn.Module):
    """Pre-LN attention + dual residual MLPs for node and edge streams
    (reference Encoder_Block, layers.py:139-193).

    ``fused_mlp=True`` computes the edge-stream tail
    ``ln6(ln4(y+y1) + mlp2(ln4(y+y1)))`` with the fused Pallas row kernel
    (:mod:`druggen_tpu.ops.fused_mlp`): one HBM read + one write instead
    of ~13 row-traversals of the [B,N,N,dim] stream.  First-order AD only
    — keep it off for the gradient-penalty critic pass."""

    dim: int
    heads: int
    mlp_ratio: int = 4
    drop_rate: float = 0.0
    dtype: Any = None
    use_pallas: bool = False
    fused_mlp: bool = False
    node_axis: str | None = None
    # f32_stats: run all six LayerNorms (and the attention softmax) in f32,
    # casting back to the compute dtype so the matmuls stay on the bf16 MXU
    # path.  Escalation tier for bf16-forward overflow (PERF.md round 4);
    # disables the fused Pallas tails (their LN math is bf16-internal).
    f32_stats: bool = False

    @nn.compact
    def __call__(self, x, y, deterministic: bool = True):
        if self.f32_stats:
            def ln(name):
                inner = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                     name=name)
                return lambda t: inner(t).astype(self.dtype or t.dtype)
        else:
            ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,  # noqa: E731
                                           name=name)
        x1 = ln("ln1")(x)

        fuse_block = (self.fused_mlp == "block"
                      and (self.drop_rate == 0.0 or deterministic)
                      and not self.use_pallas and self.node_axis is None
                      and not self.f32_stats)
        if fuse_block:
            # fused_mlp="block": the v5 megablock kernel runs this block's
            # WHOLE edge stream (attention + tail) in one Pallas residency;
            # only the small node stream stays on XLA.  Touch the tail
            # modules on a dummy row so their params keep the standard
            # names (checkpoint-compatible), then hand raw weights down.
            ln4 = ln("ln4")
            ln6 = ln("ln6")
            mlp2 = MLP(self.dim, self.dim * self.mlp_ratio, self.dim,
                       self.drop_rate, self.dtype, name="mlp2")
            dummy = y[:1, :1, :1, :]
            _ = ln6(ln4(dummy) + mlp2(ln4(dummy), True))
            p4 = ln4.variables["params"]
            p6 = ln6.variables["params"]
            pm = mlp2.variables["params"]
            tail = (p4["scale"], p4["bias"],
                    pm["fc1"]["kernel"], pm["fc1"]["bias"],
                    pm["fc2"]["kernel"], pm["fc2"]["bias"],
                    p6["scale"], p6["bias"])
            x2, y = GraphMHA(self.dim, self.heads, self.dtype,
                             False, None, name="attn")(x1, y, tail=tail)
            x2 = x1 + x2
            x2 = ln("ln3")(x2)
            x = ln("ln5")(x2 + MLP(self.dim, self.dim * self.mlp_ratio,
                                   self.dim, self.drop_rate, self.dtype,
                                   name="mlp")(x2, deterministic))
            return x, y

        x2, y1 = GraphMHA(self.dim, self.heads, self.dtype,
                          self.use_pallas, self.node_axis,
                          f32_stats=self.f32_stats, name="attn")(x1, y)
        x2 = x1 + x2            # residual vs the *normed* input (sic,
        # reference layers.py:187: x2 = x1 + x2)
        x2 = ln("ln3")(x2)
        x = ln("ln5")(x2 + MLP(self.dim, self.dim * self.mlp_ratio, self.dim,
                               self.drop_rate, self.dtype, name="mlp")(
                                   x2, deterministic))

        ln4 = ln("ln4")
        ln6 = ln("ln6")
        mlp2 = MLP(self.dim, self.dim * self.mlp_ratio, self.dim,
                   self.drop_rate, self.dtype, name="mlp2")
        # dropout inside mlp2 breaks the fused tail's determinism contract
        fuse = (self.fused_mlp and (self.drop_rate == 0.0 or deterministic)
                and not self.f32_stats)
        if not fuse:
            y2 = ln4(y + y1)
            y = ln6(y2 + mlp2(y2, deterministic))
            return x, y

        # Touch the submodules on a dummy row so their parameters exist
        # under the standard names (checkpoint-compatible with the XLA
        # path), then hand the raw weights to the kernel.
        dummy = y[:1, :1, :1, :]
        _ = ln6(ln4(dummy) + mlp2(ln4(dummy), True))
        p4 = ln4.variables["params"]
        p6 = ln6.variables["params"]
        pm = mlp2.variables["params"]
        from druggen_tpu.ops.fused_mlp import fused_ln_mlp_ln

        y = fused_ln_mlp_ln(
            y + y1,
            p4["scale"], p4["bias"],
            pm["fc1"]["kernel"], pm["fc1"]["bias"],
            pm["fc2"]["kernel"], pm["fc2"]["bias"],
            p6["scale"], p6["bias"],
            # fused_mlp="jvp" selects the higher-order-differentiable
            # variant (Pallas forward, jnp-math derivatives) — usable
            # inside the WGAN-GP double-backward
            grad_mode="jvp" if self.fused_mlp == "jvp" else "vjp")
        return x, y


class _ScanBlock(nn.Module):
    """Carry-signature adapter so :class:`EncoderBlock` can run under
    ``flax.linen.scan`` (``__call__(carry, _) -> (carry, None)``)."""

    dim: int
    heads: int
    mlp_ratio: int
    drop_rate: float
    dtype: Any
    use_pallas: bool
    fused_mlp: bool
    deterministic: bool
    remat: bool
    node_axis: str | None = None
    f32_stats: bool = False

    @nn.compact
    def __call__(self, carry, _):
        x, y = carry
        block_cls = EncoderBlock
        if self.remat:
            block_cls = nn.remat(EncoderBlock, static_argnums=(3,))
        x, y = block_cls(self.dim, self.heads, self.mlp_ratio,
                         self.drop_rate, self.dtype, self.use_pallas,
                         self.fused_mlp, self.node_axis, self.f32_stats,
                         name="block")(x, y, self.deterministic)
        return (x, y), None


class TransformerEncoder(nn.Module):
    """Stack of encoder blocks (reference layers.py:195-234).

    ``remat=True`` wraps each block in :func:`flax.linen.remat`
    (``jax.checkpoint``): the backward pass recomputes the block's
    [B,N,N,*] edge-stream intermediates from its inputs instead of
    storing them in HBM during the forward.  The WGAN-GP step is
    HBM-bandwidth-bound while its FLOPs are ~2% of the MXU roofline
    (PERF.md), so trading recompute for residual traffic is the right
    direction on TPU; remat composes with the gradient-penalty
    double-backward (``jax.checkpoint`` supports higher-order AD).

    ``scan_layers=True`` runs the stack as one ``lax.scan`` over stacked
    per-block parameters instead of unrolling ``depth`` copies of the
    block into the HLO.  XLA then compiles the block body ONCE, so
    compile time and program size become depth-independent — the enabler
    for deep configs (BASELINE config 4) whose unrolled programs blow the
    compile budget.  Numerics are identical to the unrolled stack
    (tests/test_scan_layers.py); only the parameter *layout* differs
    (``blocks/block`` with a leading depth axis instead of ``block_i`` —
    convert with :func:`stack_block_params` / :func:`unstack_block_params`).
    Composes with ``remat`` (the canonical scan-of-remat-block pattern)."""

    dim: int
    depth: int
    heads: int
    mlp_ratio: int = 4
    drop_rate: float = 0.0
    dtype: Any = None
    use_pallas: bool = False
    remat: bool = False
    fused_mlp: bool = False
    scan_layers: bool = False
    node_axis: str | None = None
    f32_stats: bool = False

    @nn.compact
    def __call__(self, x, y, deterministic: bool = True):
        if self.scan_layers:
            scanned = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth)
            (x, y), _ = scanned(self.dim, self.heads, self.mlp_ratio,
                                self.drop_rate, self.dtype, self.use_pallas,
                                self.fused_mlp, deterministic, self.remat,
                                self.node_axis, self.f32_stats,
                                name="blocks")((x, y), None)
            return x, y
        block_cls = EncoderBlock
        if self.remat:
            # arg 3 of EncoderBlock.__call__ (after self, x, y) is the
            # python-bool `deterministic` -> static under checkpoint
            block_cls = nn.remat(EncoderBlock, static_argnums=(3,))
        for i in range(self.depth):
            x, y = block_cls(self.dim, self.heads, self.mlp_ratio,
                             self.drop_rate, self.dtype, self.use_pallas,
                             self.fused_mlp, self.node_axis, self.f32_stats,
                             name=f"block_{i}")(x, y, deterministic)
        return x, y


def stack_block_params(params):
    """Convert an unrolled encoder param tree to the ``scan_layers`` layout.

    Finds every subtree of the form ``{'block_0': …, …, 'block_{d-1}': …}``
    (the unrolled :class:`TransformerEncoder` layout) anywhere in ``params``
    and replaces it with ``{'blocks': {'block': stacked}}`` where each leaf
    gains a leading depth axis.  Checkpoints saved by either layout can be
    loaded into the other via these two functions."""
    import numpy as np

    def rec(tree):
        if not isinstance(tree, dict):
            return tree
        keys = sorted(k for k in tree if k.startswith("block_")
                      and k[6:].isdigit())
        if keys and len(keys) == len(tree):
            keys.sort(key=lambda k: int(k[6:]))
            subs = [rec(tree[k]) for k in keys]
            stacked = jax.tree_util.tree_map(
                lambda *leaves: np.stack([np.asarray(l) for l in leaves]),
                *subs)
            return {"blocks": {"block": stacked}}
        return {k: rec(v) for k, v in tree.items()}

    return rec(params)


def unstack_block_params(params):
    """Inverse of :func:`stack_block_params` (scan layout -> unrolled)."""
    import numpy as np

    def rec(tree):
        if not isinstance(tree, dict):
            return tree
        if set(tree) == {"blocks"} and isinstance(tree["blocks"], dict) \
                and set(tree["blocks"]) == {"block"}:
            stacked = tree["blocks"]["block"]
            depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
            return {f"block_{i}": jax.tree_util.tree_map(
                lambda l, i=i: np.asarray(l)[i], stacked)
                for i in range(depth)}
        return {k: rec(v) for k, v in tree.items()}

    return rec(params)

"""Generator / Discriminator / SimpleDisc.

Re-implements the reference model heads (``src/model/models.py``) on top of
:mod:`druggen_tpu.models.layers`.  Identical topology:

- Generator (``models.py:5-103``): node MLP (m_dim->64->dim, act after each
  Dense) + edge MLP (b_dim->64->dim), edge symmetrization (e+e^T)/2,
  transformer stack, readouts dim->m_dim (nodes) and dim->b_dim (edges).
  Returns ``(node, edge, node_logits, edge_logits)``.
- Discriminator (``models.py:106-209``): same trunk with its own weights,
  then nodes flattened to [B, N*dim] -> MLP 64->32->16->1 scalar critic.
- SimpleDisc (``models.py:212-269``): flat-feature MLP critic over
  [B, N*m_dim + N*N*b_dim] (the reference's NoTarget variant).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from druggen_tpu.models.layers import (
    MLP,  # noqa: F401  (re-exported for parity tests)
    TransformerEncoder,
    _dense,
    get_activation,
)


class _Trunk(nn.Module):
    """Shared Generator/Discriminator front: per-stream input MLPs, edge
    symmetrization, transformer encoder.

    ``node_axis``: run in the edge-partitioned (node-sharded) mode — inputs
    are local blocks of a ``shard_map`` over that mesh axis; the
    symmetrization's transpose becomes a distributed transpose
    (:func:`druggen_tpu.models.layers.distributed_edge_transpose`) and
    attention gathers k/v (see :class:`GraphMHA`).  Parameter shapes and
    names are identical to the unsharded model — checkpoints interchange."""

    act: str
    edges: int      # b_dim
    nodes: int      # m_dim
    dropout: float
    dim: int
    depth: int
    heads: int
    mlp_ratio: int
    dtype: Any = None
    use_pallas: bool = False
    remat: bool = False
    fused_mlp: bool = False
    scan_layers: bool = False
    node_axis: str | None = None
    # f32 LayerNorm/softmax escalation tier (see layers.EncoderBlock)
    f32_stats: bool = False

    @nn.compact
    def __call__(self, z_e, z_n, deterministic: bool = True):
        act = get_activation(self.act)
        # node_layers: Linear(nodes,64) act Linear(64,dim) act Dropout
        node = _dense(64, self.nodes, self.dtype, name="node_fc1")(z_n)
        node = act(node)
        node = _dense(self.dim, 64, self.dtype, name="node_fc2")(node)
        node = act(node)
        node = nn.Dropout(self.dropout, deterministic=deterministic)(node)
        # edge_layers: Linear(edges,64) act Linear(64,dim) act Dropout
        edge = _dense(64, self.edges, self.dtype, name="edge_fc1")(z_e)
        edge = act(edge)
        edge = _dense(self.dim, 64, self.dtype, name="edge_fc2")(edge)
        edge = act(edge)
        edge = nn.Dropout(self.dropout, deterministic=deterministic)(edge)
        # symmetrize over the two vertex axes (reference models.py:94);
        # node-sharded mode: distributed transpose (one all_to_all)
        if self.node_axis:
            from druggen_tpu.models.layers import distributed_edge_transpose

            edge = (edge + distributed_edge_transpose(
                edge, self.node_axis)) / 2.0
        else:
            edge = (edge + edge.transpose(0, 2, 1, 3)) / 2.0

        node, edge = TransformerEncoder(
            self.dim, self.depth, self.heads, self.mlp_ratio, self.dropout,
            self.dtype, self.use_pallas, self.remat, self.fused_mlp,
            self.scan_layers, self.node_axis, self.f32_stats,
            name="encoder")(
                node, edge, deterministic)
        return node, edge


class Generator(nn.Module):
    """Graph-transformer generator (reference models.py:5-103).

    ``__call__(z_e [B,N,N,b_dim], z_n [B,N,m_dim])`` ->
    ``(node [B,N,dim], edge [B,N,N,dim],
       node_logits [B,N,m_dim], edge_logits [B,N,N,b_dim])``."""

    act: str
    vertexes: int
    edges: int
    nodes: int
    dropout: float
    dim: int
    depth: int
    heads: int
    mlp_ratio: int
    dtype: Any = None
    use_pallas: bool = False
    remat: bool = False
    fused_mlp: bool = False
    scan_layers: bool = False
    node_axis: str | None = None
    f32_stats: bool = False

    @nn.compact
    def __call__(self, z_e, z_n, deterministic: bool = True):
        node, edge = _Trunk(self.act, self.edges, self.nodes, self.dropout,
                            self.dim, self.depth, self.heads, self.mlp_ratio,
                            self.dtype, self.use_pallas, self.remat,
                            self.fused_mlp, self.scan_layers, self.node_axis,
                            self.f32_stats,
                            name="trunk")(z_e, z_n, deterministic)
        node_logits = _dense(self.nodes, self.dim, self.dtype,
                             name="readout_n")(node)
        edge_logits = _dense(self.edges, self.dim, self.dtype,
                             name="readout_e")(edge)
        return node, edge, node_logits, edge_logits


class Discriminator(nn.Module):
    """Graph-transformer critic (reference models.py:106-209).

    ``__call__(z_e, z_n)`` -> scalar logits [B, 1]."""

    act: str
    vertexes: int
    edges: int
    nodes: int
    dropout: float
    dim: int
    depth: int
    heads: int
    mlp_ratio: int
    dtype: Any = None
    use_pallas: bool = False
    remat: bool = False
    fused_mlp: bool = False
    scan_layers: bool = False
    node_axis: str | None = None
    f32_stats: bool = False
    # head_mult widens the critic head (64/32/16 -> 64m/32m/16m) for the
    # oscillation-ablation study ONLY; 1 is the reference topology
    # (models.py:180-209) and the checkpoint-interop contract.
    head_mult: int = 1

    @nn.compact
    def __call__(self, z_e, z_n, deterministic: bool = True):
        act = get_activation(self.act)
        node, _ = _Trunk(self.act, self.edges, self.nodes, self.dropout,
                         self.dim, self.depth, self.heads, self.mlp_ratio,
                         self.dtype, self.use_pallas, self.remat,
                         self.fused_mlp, self.scan_layers, self.node_axis,
                         self.f32_stats,
                         name="trunk")(z_e, z_n, deterministic)
        if self.node_axis:
            # critic head needs every node row of the sample; gather the
            # small [B, N, dim] node stream (edge stream stays sharded)
            from druggen_tpu.models.layers import gather_node_rows

            node = gather_node_rows(node, self.node_axis)
        b = node.shape[0]
        m = self.head_mult
        flat = node.reshape(b, -1)            # [B, N*dim]
        h = _dense(64 * m, self.vertexes * self.dim, self.dtype,
                   name="mlp_fc1")(flat)
        h = act(h)
        h = _dense(32 * m, 64 * m, self.dtype, name="mlp_fc2")(h)
        h = act(h)
        h = _dense(16 * m, 32 * m, self.dtype, name="mlp_fc3")(h)
        h = act(h)
        return _dense(1, 16 * m, self.dtype, name="mlp_fc4")(h)


class SimpleDisc(nn.Module):
    """Flat-feature MLP critic (reference simple_disc, models.py:212-269).

    ``__call__(x [B, N*m_dim + N*N*b_dim])`` -> [B, 1]."""

    act: str
    m_dim: int
    vertexes: int
    b_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act)
        feats = self.vertexes * self.m_dim + self.vertexes ** 2 * self.b_dim
        widths = [256, 128, 64, 32, 16]
        fan_in = feats
        h = x
        for i, w in enumerate(widths):
            h = _dense(w, fan_in, self.dtype, name=f"fc{i + 1}")(h)
            h = act(h)
            fan_in = w
        return _dense(1, fan_in, self.dtype, name=f"fc{len(widths) + 1}")(h)

"""Fully-fused Generator forward (Pallas TPU kernel, "v4").

Motivation (PERF.md): the XLA inference path materializes ~10 edge-stream
``[B, N, N, dim]`` tensors in HBM per forward (input embed, e-projection,
modulated scores, out_e, MLP2 hidden at 3*dim, LayerNorms...).  At N=45,
dim=128 each is ~0.5 GB f32 per 512-graph batch — the forward is
bandwidth-bound.  This kernel runs the ENTIRE generator (reference
``src/model/models.py:71-103`` + ``src/model/layers.py:108-193``) for one
graph per grid step inside VMEM: HBM traffic collapses to one read of the
one-hot inputs and one write of the logits.

Layout tricks that make it compile cleanly on TPU:

- the edge stream is kept ``[N, NPAD, dim]`` with the *key* axis padded
  45 -> 48 (a multiple of the 8-row sublane tile), so the 2D<->3D
  reshapes between matmul form ``[N*NPAD, dim]`` and softmax form
  ``[N, NPAD, dim]`` are tile-aligned (no relayout);
- all heavy matmuls run in 2D ``[N*NPAD, dim] x [dim, X]`` at full MXU
  row utilization;
- ``q_i (elementwise) k_j`` needs no transpose or gather: ``q[:, None, :]``
  broadcasts over the sublane (key) axis and ``k_pad[None, :, :]`` over the
  untiled (query) axis;
- padded key rows are masked to -inf before the per-channel softmax
  (reference ``layers.py:130`` semantics) and excluded from the V
  aggregation by construction (their softmax weight is exactly 0).

PRECONDITION: ``z_e`` must be symmetric in its two vertex axes.  The
reference symmetrizes the edge *embedding* ((e + e^T)/2, models.py:94);
for a symmetric input the pointwise input MLP commutes with the
symmetrization, so the kernel can skip the (layout-hostile) transpose.
One-hot adjacency tensors of real molecules — the only inference-time
input — are symmetric by construction (``chem/codec.py:mol_to_matrices``).
The wrapper checks this under ``debug=True``.

Training still uses the XLA path: the WGAN-GP double-backward cannot flow
through a ``custom_vjp`` kernel (see ops/fused_attention.py), and the
D-step differentiates through G's continuous (non-symmetric) logits.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 8

# Ordered weight-key layout handed to the kernel.  Non-block weights first,
# then per-depth stacked block weights, then readouts.
_PRE_KEYS = ("node_fc1/kernel", "node_fc1/bias", "node_fc2/kernel",
             "node_fc2/bias", "edge_fc1/kernel", "edge_fc1/bias",
             "edge_fc2/kernel", "edge_fc2/bias")
_BLOCK_KEYS = (
    "ln1/scale", "ln1/bias",
    "attn/q/kernel", "attn/q/bias", "attn/k/kernel", "attn/k/bias",
    "attn/v/kernel", "attn/v/bias", "attn/e/kernel", "attn/e/bias",
    "attn/out_e/kernel", "attn/out_e/bias",
    "attn/out_n/kernel", "attn/out_n/bias",
    "ln3/scale", "ln3/bias", "ln4/scale", "ln4/bias",
    "mlp/fc1/kernel", "mlp/fc1/bias", "mlp/fc2/kernel", "mlp/fc2/bias",
    "ln5/scale", "ln5/bias",
    "mlp2/fc1/kernel", "mlp2/fc1/bias", "mlp2/fc2/kernel", "mlp2/fc2/bias",
    "ln6/scale", "ln6/bias",
)
_POST_KEYS = ("readout_n/kernel", "readout_n/bias",
              "readout_e/kernel", "readout_e/bias")


def _get(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def extract_generator_weights(variables) -> tuple[list[jnp.ndarray], int]:
    """Flatten a flax ``Generator`` param pytree into the kernel's ordered
    weight list.  Per-block weights are stacked on a leading depth axis;
    1-D vectors (biases, LN scale/bias) become ``[1, F]`` / ``[depth, 1, F]``
    so every VMEM ref is >= 2-D.  Returns (weights, depth)."""
    p = variables["params"] if "params" in variables else variables
    trunk = p["trunk"]
    enc = trunk["encoder"]
    depth = len([k for k in enc if k.startswith("block_")])

    def vec(a):
        return a[None, :] if a.ndim == 1 else a

    ws = [vec(_get(trunk, k)) for k in _PRE_KEYS]
    for key in _BLOCK_KEYS:
        stacked = jnp.stack([_get(enc[f"block_{d}"], key)
                             for d in range(depth)])
        if stacked.ndim == 2:        # [depth, F] vectors
            stacked = stacked[:, None, :]
        ws.append(stacked)
    ws += [vec(_get(p, k)) for k in _POST_KEYS]
    return ws, depth


def _layernorm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _mm(a, b, bias=None):
    out = jnp.dot(a, b.astype(a.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(a.dtype)


def _kernel(n: int, npad: int, dim: int, dk: int, depth: int, *refs):
    nw = len(_PRE_KEYS) + len(_BLOCK_KEYS) + len(_POST_KEYS)
    zn_ref, ze_ref = refs[0], refs[1]
    w = list(refs[2:2 + nw])
    out_n_ref, out_e_ref = refs[2 + nw], refs[3 + nw]

    (w_nf1, b_nf1, w_nf2, b_nf2, w_ef1, b_ef1, w_ef2, b_ef2) = w[:8]
    blocks = w[8:8 + len(_BLOCK_KEYS)]
    w_rn, b_rn, w_re, b_re = w[8 + len(_BLOCK_KEYS):]

    rows = n * npad
    zn = zn_ref[0]                       # [n, m_dim]
    ze = ze_ref[0].reshape(rows, -1)     # [n, npad, b_dim] -> tile-aligned

    # ---- input MLPs (reference models.py:76-94; symmetrization is a no-op
    # for symmetric z_e, see module docstring)
    x = jnp.maximum(_mm(zn, w_nf1[...], b_nf1[...]), 0)
    x = jnp.maximum(_mm(x, w_nf2[...], b_nf2[...]), 0)       # [n, dim]
    y = jnp.maximum(_mm(ze, w_ef1[...], b_ef1[...]), 0)
    y = jnp.maximum(_mm(y, w_ef2[...], b_ef2[...]), 0)       # [rows, dim]

    inv_sqrt_dk = 1.0 / math.sqrt(dk)
    # key-axis validity mask [n, npad, 1] and zero-padded V rows
    jmask = jax.lax.broadcasted_iota(jnp.int32, (n, npad, 1), 1) < n

    def B(i):      # block weight i, depth-sliced inside the loop
        return blocks[i]

    for d in range(depth):
        (s_ln1, b_ln1, wq, bq, wk, bk, wv, bv, we, be, woe, boe, won, bon,
         s_ln3, b_ln3, s_ln4, b_ln4, wm1, bm1, wm2, bm2, s_ln5, b_ln5,
         wp1, bp1, wp2, bp2, s_ln6, b_ln6) = (B(i)[d] for i in
                                              range(len(_BLOCK_KEYS)))
        x1 = _layernorm(x, s_ln1, b_ln1)
        q = _mm(x1, wq, bq)                                  # [n, dim]
        k = _mm(x1, wk, bk)
        v = _mm(x1, wv, bv)
        e = _mm(y, we, be)                                   # [rows, dim]
        e3 = e.reshape(n, npad, dim)

        # pad k, v on the key axis (rows n..npad-1)
        kpad = jnp.concatenate(
            [k, jnp.zeros((npad - n, dim), k.dtype)], axis=0)
        vpad = jnp.concatenate(
            [v, jnp.zeros((npad - n, dim), v.dtype)], axis=0)

        # attn[i,j,c] = q_i * k_j / sqrt(dk) * (e+1) * e   (layers.py:108-128)
        att3 = (q[:, None, :] * kpad[None, :, :]) * inv_sqrt_dk
        att3 = att3 * (e3 + 1.0) * e3                        # [n, npad, dim]

        # pre-softmax edge readout (layers.py:129: out_e BEFORE softmax)
        y1 = _mm(att3.reshape(rows, dim), woe, boe)

        # per-channel softmax over keys j + V aggregation (layers.py:130-134)
        af = att3.astype(jnp.float32)
        af = jnp.where(jmask, af, -1e30)
        amax = jnp.max(af, axis=1, keepdims=True)
        p = jnp.exp(af - amax)                               # pad rows -> 0
        ssum = jnp.sum(p, axis=1, keepdims=True)
        agg = jnp.sum(p * vpad[None, :, :].astype(jnp.float32), axis=1)
        agg = (agg / ssum[:, 0, :]).astype(x.dtype)          # [n, dim]

        node_mha = _mm(agg, won, bon)
        x2 = x1 + node_mha            # residual vs the NORMED input (sic,
        y2 = y + y1                   # reference layers.py:187)
        x2 = _layernorm(x2, s_ln3, b_ln3)
        y2 = _layernorm(y2, s_ln4, b_ln4)

        xh = jnp.maximum(_mm(x2, wm1, bm1), 0)
        x = _layernorm(x2 + _mm(xh, wm2, bm2), s_ln5, b_ln5)
        yh = jnp.maximum(_mm(y2, wp1, bp1), 0)               # [rows, 3*dim]
        y = _layernorm(y2 + _mm(yh, wp2, bp2), s_ln6, b_ln6)

    out_n_ref[0] = _mm(x, w_rn[...], b_rn[...])              # [n, m_dim]
    eo = _mm(y, w_re[...], b_re[...])                        # [rows, b_dim]
    out_e_ref[0] = eo.reshape(n, npad, -1)


def fused_generator_logits(variables, z_e, z_n, *, heads: int,
                           interpret: bool = False, debug: bool = False):
    """Run the whole Generator forward as one Pallas kernel.

    ``z_e [B,N,N,b_dim]`` one-hot adjacency (MUST be vertex-symmetric),
    ``z_n [B,N,m_dim]`` one-hot annotations.  Returns
    ``(node_logits [B,N,m_dim], edge_logits [B,N,N,b_dim])`` matching
    ``Generator.__call__(...)[2:4]`` (deterministic mode) up to dtype
    rounding."""
    if debug:
        asym = jnp.max(jnp.abs(z_e - z_e.transpose(0, 2, 1, 3)))
        assert float(asym) == 0.0, "fused generator requires symmetric z_e"
    # Mosaic compiles on TPU only; elsewhere (CPU tests/dev) run the
    # same kernel through the Pallas interpreter.
    interpret = interpret or jax.default_backend() != "tpu"

    b, n, _, b_dim = z_e.shape
    m_dim = z_n.shape[-1]
    ws, depth = extract_generator_weights(variables)
    dim = ws[2].shape[-1]                 # node_fc2 kernel [64, dim]
    assert dim % heads == 0
    dk = dim // heads
    npad = -(-n // _SUBLANE) * _SUBLANE   # key axis to a sublane multiple

    dtype = z_e.dtype
    ws = [w.astype(dtype) if w.dtype != dtype else w for w in ws]
    ze_pad = jnp.pad(z_e, ((0, 0), (0, 0), (0, npad - n), (0, 0)))

    grid = (b,)
    data_specs = [
        pl.BlockSpec((1, n, m_dim), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, npad, b_dim), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    weight_specs = [
        pl.BlockSpec(w.shape, functools.partial(lambda nd, i: (0,) * nd,
                                                w.ndim),
                     memory_space=pltpu.VMEM)
        for w in ws
    ]
    out_specs = [
        pl.BlockSpec((1, n, m_dim), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, npad, b_dim), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, m_dim), dtype),
        jax.ShapeDtypeStruct((b, n, npad, b_dim), dtype),
    ]
    rows = n * npad
    flops_per_graph = 2 * rows * dim * (3 * dim + 2 * 3 * dim) + \
        2 * rows * (b_dim * 64 + 64 * dim)
    cost = pl.CostEstimate(
        flops=b * flops_per_graph,
        bytes_accessed=(ze_pad.size + z_n.size) * dtype.itemsize * 2,
        transcendentals=b * rows * dim,
    )
    node_logits, edge_pad = pl.pallas_call(
        functools.partial(_kernel, n, npad, dim, dk, depth),
        grid=grid,
        in_specs=data_specs + weight_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(z_n.astype(dtype), ze_pad, *ws)
    return node_logits, edge_pad[:, :, :n, :]

"""Fused edge-modulated attention (Pallas TPU kernel).

The reference attention (``src/model/layers.py:108-137``) materializes the
``[B, N, N, H, dk]`` modulated-score tensor several times on its way through
modulate -> pre-softmax edge readout -> per-channel softmax -> weighted V
aggregation.  At dim=128, batch 128, N=45 that tensor is ~130 MB in f32 —
the chain is HBM-bandwidth-bound (SURVEY.md §7 step 7).

This kernel fuses the whole post-projection chain in VMEM.  Per grid step
(one batch element x one block of BI query rows) it:

1. forms ``t[i,j,d] = q[i,d] * k[j,d] / sqrt(dk) * (e[i,j,d]+1) * e[i,j,d]``,
2. writes ``t`` once as the pre-softmax edge output,
3. computes the per-channel softmax over the key axis j with padded keys
   masked to -inf (padding changes nothing vs the reference's unpadded N),
4. accumulates ``node_agg[i,d] = sum_j softmax(t)[i,j,d] * v[j,d]``.

HBM traffic drops from ~5 passes over the big tensor (XLA's fusion still
splits the chain around the softmax reductions and the two consumers) to
exactly one write + one read.

Gradients: a custom VJP with a Pallas backward kernel that recomputes
``t``/softmax on the fly (flash-attention-style rematerialization) and
accumulates dk/dv across query blocks in VMEM.  NOTE custom_vjp does not
support second-order AD, so the Discriminator under the WGAN-GP
double-backward (``loss.py:32-38``) must use the unfused XLA path — the
model modules wire ``use_pallas`` accordingly.

Small-dim fallback: the kernel requires the channel dim to be a multiple of
128 lanes; other dims route to the identical-math jnp implementation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

# Pallas is TPU-only at compile time; import lazily so the CPU test paths
# (interpret mode) still work.
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too; guards belt-and-braces
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

def _block_rows(dtype) -> int:
    """Query-row block: sublane-aligned per dtype (f32: 8, bf16: 16)."""
    return 16 if dtype == jnp.bfloat16 else 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def reference_attention(q, k, v, e):
    """Unfused jnp implementation (identical math; used as fallback and as
    the second-order-differentiable path)."""
    b, n, h, dk = q.shape
    d = h * dk
    attn = q[:, :, None] * k[:, None, :, :, :]
    attn = attn / math.sqrt(dk)
    attn = attn * (e + 1.0) * e
    edge_pre = attn.reshape(b, n, n, d)
    s = jax.nn.softmax(attn, axis=2)
    node_agg = (s * v[:, None, :, :, :]).sum(axis=2).reshape(b, n, d)
    return edge_pre, node_agg


# ---------------------------------------------------------------- forward

def _fwd_kernel(n_real: int, inv_sqrt_dk: float, q_ref, k_ref, v_ref, e_ref,
                edge_ref, node_ref):
    # compute in f32 regardless of storage dtype (bf16 softmax would lose
    # too much precision for gradient-parity with the XLA path)
    q = q_ref[0].astype(jnp.float32)            # [BI, D]
    k = k_ref[0].astype(jnp.float32)            # [Np, D]
    v = v_ref[0].astype(jnp.float32)            # [Np, D]
    e = e_ref[0].astype(jnp.float32)            # [BI, Np, D]

    t = (q[:, None, :] * k[None, :, :]) * inv_sqrt_dk
    t = t * (e + 1.0) * e
    edge_ref[0] = t.astype(edge_ref.dtype)

    np_ = k.shape[0]
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (1, np_, 1), 1)
    masked = jnp.where(j_ids < n_real, t, -jnp.inf)
    m = jnp.max(masked, axis=1, keepdims=True)
    ex = jnp.exp(masked - m)
    s = ex / jnp.sum(ex, axis=1, keepdims=True)
    node_ref[0] = jnp.sum(s * v[None, :, :], axis=1).astype(node_ref.dtype)


def _fwd_pallas(q3, k3, v3, e4, n_real: int, dk: int, interpret: bool):
    """q3,k3,v3: [B, Np, D]; e4: [B, Np, Np, D] (already padded)."""
    b, np_, d = q3.shape
    bi = _block_rows(q3.dtype)
    grid = (b, np_ // bi)
    kern = functools.partial(_fwd_kernel, n_real, 1.0 / math.sqrt(dk))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bi, d), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, np_, d), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((1, np_, d), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((1, bi, np_, d), lambda bb, ii: (bb, ii, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bi, np_, d), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, bi, d), lambda bb, ii: (bb, ii, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, np_, d), q3.dtype),
            jax.ShapeDtypeStruct((b, np_, d), q3.dtype),
        ],
        interpret=interpret,
    )(q3, k3, v3, e4)


# ---------------------------------------------------------------- backward

def _bwd_kernel(n_real: int, inv_sqrt_dk: float, q_ref, k_ref, v_ref, e_ref,
                ge_ref, gn_ref, dq_ref, dk_ref, dv_ref, de_ref):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    e = e_ref[0].astype(jnp.float32)
    ge = ge_ref[0].astype(jnp.float32)  # [BI, Np, D] grad wrt edge_pre
    gn = gn_ref[0].astype(jnp.float32)  # [BI, D]    grad wrt node_agg

    np_ = k.shape[0]
    base = (q[:, None, :] * k[None, :, :]) * inv_sqrt_dk
    mod = (e + 1.0) * e
    t = base * mod

    j_ids = jax.lax.broadcasted_iota(jnp.int32, (1, np_, 1), 1)
    in_range = j_ids < n_real
    masked = jnp.where(in_range, t, -jnp.inf)
    m = jnp.max(masked, axis=1, keepdims=True)
    ex = jnp.exp(masked - m)
    s = ex / jnp.sum(ex, axis=1, keepdims=True)

    # softmax backward: ds_in = gn_i * v_j ; dt = s * (ds_in - sum_j s*ds_in)
    ds_in = gn[:, None, :] * v[None, :, :]
    dot = jnp.sum(s * ds_in, axis=1, keepdims=True)
    dt_soft = s * (ds_in - dot)
    dt = ge + dt_soft

    dbase = dt * mod
    de_ref[0] = (dt * base * (2.0 * e + 1.0)).astype(de_ref.dtype)
    dq_ref[0] = (jnp.sum(dbase * k[None, :, :], axis=1)
                 * inv_sqrt_dk).astype(dq_ref.dtype)

    # accumulate dk/dv over query blocks (grid dim 1 is innermost, so the
    # same (b) output block stays resident across the i sweep)
    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += (jnp.sum(dbase * q[:, None, :], axis=0)
                  * inv_sqrt_dk).astype(dk_ref.dtype)
    dv_ref[0] += jnp.sum(s * gn[:, None, :], axis=0).astype(dv_ref.dtype)


def _bwd_pallas(q3, k3, v3, e4, ge, gn, n_real: int, dk: int,
                interpret: bool):
    b, np_, d = q3.shape
    bi = _block_rows(q3.dtype)
    grid = (b, np_ // bi)
    kern = functools.partial(_bwd_kernel, n_real, 1.0 / math.sqrt(dk))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bi, d), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, np_, d), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((1, np_, d), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((1, bi, np_, d), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, bi, np_, d), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, bi, d), lambda bb, ii: (bb, ii, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bi, d), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, np_, d), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((1, np_, d), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((1, bi, np_, d), lambda bb, ii: (bb, ii, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, d), q3.dtype),      # dq
            jax.ShapeDtypeStruct((b, np_, d), q3.dtype),      # dk
            jax.ShapeDtypeStruct((b, np_, d), q3.dtype),      # dv
            jax.ShapeDtypeStruct((b, np_, np_, d), q3.dtype),  # de
        ],
        interpret=interpret,
    )(q3, k3, v3, e4, ge, gn)


# ---------------------------------------------------------------- public op

@functools.lru_cache(maxsize=64)
def _make_op(n: int, h: int, dk: int, interpret: bool, dtype_name: str):
    d = h * dk
    np_ = _round_up(n, 16 if dtype_name == "bfloat16" else 8)

    @jax.custom_vjp
    def op(q3, k3, v3, e4):
        edge_p, node_p = _fwd_pallas(q3, k3, v3, e4, n, dk, interpret)
        return edge_p, node_p

    def fwd(q3, k3, v3, e4):
        out = op(q3, k3, v3, e4)
        return out, (q3, k3, v3, e4)

    def bwd(res, grads):
        q3, k3, v3, e4 = res
        ge, gn = grads
        dq, dkk, dv, de = _bwd_pallas(q3, k3, v3, e4, ge, gn, n, dk,
                                      interpret)
        return dq, dkk, dv, de

    op.defvjp(fwd, bwd)
    return op, np_, d


def edge_modulated_attention(q, k, v, e, *, interpret: bool | None = None):
    """Fused modulate+softmax+aggregate.

    Args: q, k, v [B, N, H, dk]; e [B, N, N, H, dk].
    Returns: (edge_pre [B, N, N, H*dk], node_agg [B, N, H*dk]) — exactly
    ``reference_attention``'s outputs.

    Routes to the jnp path when the channel dim is not lane-aligned or when
    running on a non-TPU backend without ``interpret``."""
    b, n, h, dk = q.shape
    d = h * dk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if d % 128 != 0:
        return reference_attention(q, k, v, e)

    op, np_, _ = _make_op(n, h, dk, interpret, jnp.dtype(q.dtype).name)
    pad_n = np_ - n
    q3 = jnp.pad(q.reshape(b, n, d), ((0, 0), (0, pad_n), (0, 0)))
    k3 = jnp.pad(k.reshape(b, n, d), ((0, 0), (0, pad_n), (0, 0)))
    v3 = jnp.pad(v.reshape(b, n, d), ((0, 0), (0, pad_n), (0, 0)))
    e4 = jnp.pad(e.reshape(b, n, n, d),
                 ((0, 0), (0, pad_n), (0, pad_n), (0, 0)))
    edge_p, node_p = op(q3, k3, v3, e4)
    return edge_p[:, :n, :n, :], node_p[:, :n, :]

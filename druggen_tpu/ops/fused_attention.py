"""Fused edge-modulated attention (Pallas TPU kernel).

The reference attention (``src/model/layers.py:108-137``) materializes the
``[B, N, N, H, dk]`` modulated-score tensor several times on its way through
modulate -> pre-softmax edge readout -> per-channel softmax -> weighted V
aggregation.  At dim=128, batch 512, N=45 that tensor is ~0.5 GB in f32 --
the chain is HBM-bandwidth-bound (SURVEY.md section 7 step 7; XLA reports
~147 GB of HBM traffic for one full WGAN-GP step at batch 512).

Kernel layout: **one grid step per batch element**, whole-graph blocks.
DrugGEN graphs are tiny (N<=45), so a full ``[N, N, D]`` edge block plus
scratch is only a few MB -- far under the ~16 MB VMEM budget -- and the
whole modulate/softmax/aggregate chain runs in one VMEM residency with
exactly one HBM write + one read for the big tensor.  No padding host-side:
blocks use the raw N (Mosaic masks the sublane remainder internally), which
avoids the pad/slice copies that would otherwise re-stream the edge tensor.

Gradients: custom VJP with a Pallas backward kernel that recomputes
``t``/softmax on the fly (flash-attention-style rematerialization).  NOTE
custom_vjp does not support second-order AD, so the Discriminator under the
WGAN-GP double-backward (``loss.py:32-38``) must use the unfused XLA path --
the model modules wire ``use_pallas`` accordingly.

Fallbacks: channel dim must be a multiple of 128 lanes and the per-graph
block must fit VMEM; anything else routes to the identical-math jnp
implementation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl


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

def _fwd_kernel(inv_sqrt_dk: float, q_ref, k_ref, v_ref, e_ref,
                edge_ref, node_ref):
    # compute in f32 regardless of storage dtype
    q = q_ref[0].astype(jnp.float32)            # [N, D]
    k = k_ref[0].astype(jnp.float32)            # [N, D]
    v = v_ref[0].astype(jnp.float32)            # [N, D]
    e = e_ref[0].astype(jnp.float32)            # [N, N, D]

    t = (q[:, None, :] * k[None, :, :]) * inv_sqrt_dk
    t = t * (e + 1.0) * e
    edge_ref[0] = t.astype(edge_ref.dtype)

    m = jnp.max(t, axis=1, keepdims=True)
    ex = jnp.exp(t - m)
    s = ex / jnp.sum(ex, axis=1, keepdims=True)
    node_ref[0] = jnp.sum(s * v[None, :, :], axis=1).astype(node_ref.dtype)


def _fwd_pallas(q3, k3, v3, e4, dk: int, interpret: bool):
    """q3,k3,v3: [B, N, D]; e4: [B, N, N, D] -- unpadded."""
    b, n, d = q3.shape
    kern = functools.partial(_fwd_kernel, 1.0 / math.sqrt(dk))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, n, n, d), lambda bb: (bb, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, n, d), lambda bb: (bb, 0, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, n, d), q3.dtype),
            jax.ShapeDtypeStruct((b, n, d), q3.dtype),
        ],
        interpret=interpret,
    )(q3, k3, v3, e4)


# ---------------------------------------------------------------- backward

def _bwd_kernel(inv_sqrt_dk: float, q_ref, k_ref, v_ref, e_ref,
                ge_ref, gn_ref, dq_ref, dk_ref, dv_ref, de_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    e = e_ref[0].astype(jnp.float32)
    ge = ge_ref[0].astype(jnp.float32)  # [N, N, D] grad wrt edge_pre
    gn = gn_ref[0].astype(jnp.float32)  # [N, D]    grad wrt node_agg

    base = (q[:, None, :] * k[None, :, :]) * inv_sqrt_dk
    mod = (e + 1.0) * e
    t = base * mod

    m = jnp.max(t, axis=1, keepdims=True)
    ex = jnp.exp(t - m)
    s = ex / jnp.sum(ex, axis=1, keepdims=True)

    # softmax backward: ds_in = gn_i * v_j ; dt = s * (ds_in - sum_j s*ds_in)
    ds_in = gn[:, None, :] * v[None, :, :]
    dot = jnp.sum(s * ds_in, axis=1, keepdims=True)
    dt = ge + s * (ds_in - dot)

    dbase = dt * mod
    de_ref[0] = (dt * base * (2.0 * e + 1.0)).astype(de_ref.dtype)
    dq_ref[0] = (jnp.sum(dbase * k[None, :, :], axis=1)
                 * inv_sqrt_dk).astype(dq_ref.dtype)
    dk_ref[0] = (jnp.sum(dbase * q[:, None, :], axis=0)
                 * inv_sqrt_dk).astype(dk_ref.dtype)
    dv_ref[0] = jnp.sum(s * gn[:, None, :], axis=0).astype(dv_ref.dtype)


def _bwd_pallas(q3, k3, v3, e4, ge, gn, dk: int, interpret: bool):
    b, n, d = q3.shape
    kern = functools.partial(_bwd_kernel, 1.0 / math.sqrt(dk))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, n, n, d), lambda bb: (bb, 0, 0, 0)),
            pl.BlockSpec((1, n, n, d), lambda bb: (bb, 0, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, n, n, d), lambda bb: (bb, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), q3.dtype),      # dq
            jax.ShapeDtypeStruct((b, n, d), q3.dtype),      # dk
            jax.ShapeDtypeStruct((b, n, d), q3.dtype),      # dv
            jax.ShapeDtypeStruct((b, n, n, d), q3.dtype),   # de
        ],
        interpret=interpret,
    )(q3, k3, v3, e4, ge, gn)


# ---------------------------------------------------------------- public op

@functools.lru_cache(maxsize=64)
def _make_op(n: int, h: int, dk: int, interpret: bool, dtype_name: str):
    @jax.custom_vjp
    def op(q3, k3, v3, e4):
        return _fwd_pallas(q3, k3, v3, e4, dk, interpret)

    def fwd(q3, k3, v3, e4):
        return op(q3, k3, v3, e4), (q3, k3, v3, e4)

    def bwd(res, grads):
        q3, k3, v3, e4 = res
        ge, gn = grads
        return _bwd_pallas(q3, k3, v3, e4, ge, gn, dk, interpret)

    op.defvjp(fwd, bwd)
    return op


def _vmem_estimate_bytes(n: int, d: int, itemsize: int) -> int:
    # e block + f32 working copy + t + outputs + vectors, with slack
    return n * n * d * (itemsize + 4 + itemsize) + 8 * n * d * 4


def edge_modulated_attention(q, k, v, e, *, interpret: bool | None = None):
    """Fused modulate+softmax+aggregate.

    Args: q, k, v [B, N, H, dk]; e [B, N, N, H, dk].
    Returns: (edge_pre [B, N, N, H*dk], node_agg [B, N, H*dk]) -- exactly
    ``reference_attention``'s outputs.

    Routes to the jnp path when the channel dim is not lane-aligned, when
    the per-graph block would overflow VMEM, or on non-TPU backends without
    ``interpret``."""
    b, n, h, dk = q.shape
    d = h * dk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    itemsize = jnp.dtype(q.dtype).itemsize
    if d % 128 != 0 or _vmem_estimate_bytes(n, d, itemsize) > 12 * 2 ** 20:
        return reference_attention(q, k, v, e)

    op = _make_op(n, h, dk, interpret, jnp.dtype(q.dtype).name)
    edge_p, node_p = op(q.reshape(b, n, d), k.reshape(b, n, d),
                        v.reshape(b, n, d), e.reshape(b, n, n, d))
    return edge_p, node_p


# ------------------------------------------------- fully-fused (v3): edge
# projections inside the kernel.
#
# XLA already duplicates the cheap elementwise modulate chain into both of
# its consumers, so fusing only modulate+softmax (the op above) roughly
# ties with XLA (~3 big-tensor passes either way).  The remaining traffic
# is the two [D, D] edge projections around the chain:
#     e = edge_raw @ We + be ; ... ; edge_out = t @ Woe + boe
# Pulling them into the kernel (MXU matmuls over the [N*N, D] block) cuts
# the per-MHA big-tensor traffic to: read edge_raw, write edge_out, write
# + read the t residual -- ~4 passes total across fwd+bwd vs XLA's ~8.
# Weight gradients accumulate across the batch grid in VMEM.

def _fwd3_kernel(inv_sqrt_dk: float, q_ref, k_ref, v_ref, eraw_ref,
                 we_ref, be_ref, woe_ref, boe_ref,
                 edge_ref, node_ref, t_ref):
    q = q_ref[0].astype(jnp.float32)                  # [N, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    eraw = eraw_ref[0].astype(jnp.float32)            # [N, N, D]
    n, _, d = eraw.shape

    e = jax.lax.dot_general(
        eraw.reshape(n * n, d), we_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(n, n, d)
    e = e + be_ref[...].astype(jnp.float32)

    t = (q[:, None, :] * k[None, :, :]) * inv_sqrt_dk
    t = t * (e + 1.0) * e
    t_ref[0] = t.astype(t_ref.dtype)                  # residual for bwd

    out = jax.lax.dot_general(
        t.reshape(n * n, d), woe_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(n, n, d)
    edge_ref[0] = (out + boe_ref[...].astype(jnp.float32)).astype(
        edge_ref.dtype)

    m = jnp.max(t, axis=1, keepdims=True)
    ex = jnp.exp(t - m)
    s = ex / jnp.sum(ex, axis=1, keepdims=True)
    node_ref[0] = jnp.sum(s * v[None, :, :], axis=1).astype(node_ref.dtype)


def _bwd3_kernel(inv_sqrt_dk: float, chunk: int,
                 q_ref, k_ref, v_ref, eraw_ref,
                 we_ref, be_ref, woe_ref, t_ref, ge_ref, gn_ref,
                 dq_ref, dk_ref, dv_ref, deraw_ref,
                 dwe_ref, dbe_ref, dwoe_ref, dboe_ref):
    """Chunked over query rows to bound live VMEM temporaries: every
    quantity except dk/dv and the weight grads is row-independent, so the
    big [N, N, D] intermediates only ever exist as [CH, N, D] slices."""
    bidx = pl.program_id(0)
    k = k_ref[0].astype(jnp.float32)              # [N, D]
    v = v_ref[0].astype(jnp.float32)
    we = we_ref[...].astype(jnp.float32)
    woe = woe_ref[...].astype(jnp.float32)
    be = be_ref[...].astype(jnp.float32)
    n = k.shape[0]
    d = k.shape[1]

    @pl.when(bidx == 0)
    def _():
        dwe_ref[...] = jnp.zeros_like(dwe_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dwoe_ref[...] = jnp.zeros_like(dwoe_ref)
        dboe_ref[...] = jnp.zeros_like(dboe_ref)

    dk_acc = jnp.zeros((n, d), jnp.float32)
    dv_acc = jnp.zeros((n, d), jnp.float32)
    dwe_acc = jnp.zeros((d, d), jnp.float32)
    dbe_acc = jnp.zeros((d,), jnp.float32)
    dwoe_acc = jnp.zeros((d, d), jnp.float32)
    dboe_acc = jnp.zeros((d,), jnp.float32)

    def body(ci, carry):
        dk_acc, dv_acc, dwe_acc, dbe_acc, dwoe_acc, dboe_acc = carry
        r0 = ci * chunk
        rows = pl.ds(r0, chunk)
        q_c = q_ref[0, rows, :].astype(jnp.float32)       # [CH, D]
        eraw_c = eraw_ref[0, rows, :, :].astype(jnp.float32)  # [CH, N, D]
        t_c = t_ref[0, rows, :, :].astype(jnp.float32)
        ge_c = ge_ref[0, rows, :, :].astype(jnp.float32)
        gn_c = gn_ref[0, rows, :].astype(jnp.float32)     # [CH, D]

        e_c = jax.lax.dot_general(
            eraw_c.reshape(chunk * n, d), we, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(chunk, n, d) + be

        m = jnp.max(t_c, axis=1, keepdims=True)
        ex = jnp.exp(t_c - m)
        s_c = ex / jnp.sum(ex, axis=1, keepdims=True)

        ge_flat = ge_c.reshape(chunk * n, d)
        dwoe_acc = dwoe_acc + jax.lax.dot_general(
            t_c.reshape(chunk * n, d), ge_flat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dboe_acc = dboe_acc + jnp.sum(ge_flat, axis=0)

        dt = jax.lax.dot_general(ge_flat, woe, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).reshape(chunk, n, d)
        ds_in = gn_c[:, None, :] * v[None, :, :]
        dot = jnp.sum(s_c * ds_in, axis=1, keepdims=True)
        dt = dt + s_c * (ds_in - dot)

        base = (q_c[:, None, :] * k[None, :, :]) * inv_sqrt_dk
        mod = (e_c + 1.0) * e_c
        dbase = dt * mod
        de = dt * base * (2.0 * e_c + 1.0)

        de_flat = de.reshape(chunk * n, d)
        dwe_acc = dwe_acc + jax.lax.dot_general(
            eraw_c.reshape(chunk * n, d), de_flat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbe_acc = dbe_acc + jnp.sum(de_flat, axis=0)
        deraw_ref[0, rows, :, :] = jax.lax.dot_general(
            de_flat, we, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(chunk, n, d).astype(
                deraw_ref.dtype)

        dq_ref[0, rows, :] = (jnp.sum(dbase * k[None, :, :], axis=1)
                              * inv_sqrt_dk).astype(dq_ref.dtype)
        dk_acc = dk_acc + jnp.sum(dbase * q_c[:, None, :], axis=0) \
            * inv_sqrt_dk
        dv_acc = dv_acc + jnp.sum(s_c * gn_c[:, None, :], axis=0)
        return (dk_acc, dv_acc, dwe_acc, dbe_acc, dwoe_acc, dboe_acc)

    carry = (dk_acc, dv_acc, dwe_acc, dbe_acc, dwoe_acc, dboe_acc)
    carry = jax.lax.fori_loop(0, n // chunk, body, carry)
    dk_acc, dv_acc, dwe_acc, dbe_acc, dwoe_acc, dboe_acc = carry

    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)
    dwe_ref[...] += dwe_acc.astype(dwe_ref.dtype)
    dbe_ref[...] += dbe_acc.astype(dbe_ref.dtype)
    dwoe_ref[...] += dwoe_acc.astype(dwoe_ref.dtype)
    dboe_ref[...] += dboe_acc.astype(dboe_ref.dtype)


def _fwd3_pallas(q3, k3, v3, eraw, we, be, woe, boe, dk: int,
                 interpret: bool):
    b, n, d = q3.shape
    kern = functools.partial(_fwd3_kernel, 1.0 / math.sqrt(dk))
    vec = pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0))
    mat = pl.BlockSpec((1, n, n, d), lambda bb: (bb, 0, 0, 0))
    w = pl.BlockSpec((d, d), lambda bb: (0, 0))
    bvec = pl.BlockSpec((d,), lambda bb: (0,))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[vec, vec, vec, mat, w, bvec, w, bvec],
        out_specs=[mat, vec, mat],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, n, d), q3.dtype),  # edge_out
            jax.ShapeDtypeStruct((b, n, d), q3.dtype),     # node_agg
            jax.ShapeDtypeStruct((b, n, n, d), q3.dtype),  # t residual
        ],
        interpret=interpret,
    )(q3, k3, v3, eraw, we, be, woe, boe)


def _chunk_for(n: int) -> int:
    # largest divisor of n that keeps [CH, N, D] temporaries small
    for ch in (9, 8, 5, 15, 3, 1):
        if n % ch == 0 and ch <= n:
            return ch
    return 1


def _bwd3_pallas(q3, k3, v3, eraw, we, be, woe, t_res, ge, gn, dk: int,
                 interpret: bool):
    b, n, d = q3.shape
    kern = functools.partial(_bwd3_kernel, 1.0 / math.sqrt(dk),
                             _chunk_for(n))
    vec = pl.BlockSpec((1, n, d), lambda bb: (bb, 0, 0))
    mat = pl.BlockSpec((1, n, n, d), lambda bb: (bb, 0, 0, 0))
    w = pl.BlockSpec((d, d), lambda bb: (0, 0))
    bvec = pl.BlockSpec((d,), lambda bb: (0,))
    f32 = jnp.float32
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[vec, vec, vec, mat, w, bvec, w, mat, mat, vec],
        out_specs=[vec, vec, vec, mat, w, bvec, w, bvec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), q3.dtype),     # dq
            jax.ShapeDtypeStruct((b, n, d), q3.dtype),     # dk
            jax.ShapeDtypeStruct((b, n, d), q3.dtype),     # dv
            jax.ShapeDtypeStruct((b, n, n, d), q3.dtype),  # d_edge_raw
            jax.ShapeDtypeStruct((d, d), f32),             # dWe
            jax.ShapeDtypeStruct((d,), f32),               # dbe
            jax.ShapeDtypeStruct((d, d), f32),             # dWoe
            jax.ShapeDtypeStruct((d,), f32),               # dboe
        ],
        interpret=interpret,
    )(q3, k3, v3, eraw, we, be, woe, t_res, ge, gn)


@functools.lru_cache(maxsize=64)
def _make_proj_op(n: int, h: int, dk: int, interpret: bool,
                  dtype_name: str):
    @jax.custom_vjp
    def op(q3, k3, v3, eraw, we, be, woe, boe):
        edge_out, node_agg, _ = _fwd3_pallas(q3, k3, v3, eraw, we, be,
                                             woe, boe, dk, interpret)
        return edge_out, node_agg

    def fwd(q3, k3, v3, eraw, we, be, woe, boe):
        edge_out, node_agg, t_res = _fwd3_pallas(q3, k3, v3, eraw, we, be,
                                                 woe, boe, dk, interpret)
        return (edge_out, node_agg), (q3, k3, v3, eraw, we, be, woe, t_res)

    def bwd(res, grads):
        q3, k3, v3, eraw, we, be, woe, t_res = res
        ge, gn = grads
        dq, dkk, dv, deraw, dwe, dbe, dwoe, dboe = _bwd3_pallas(
            q3, k3, v3, eraw, we, be, woe, t_res, ge, gn, dk, interpret)
        return (dq, dkk, dv, deraw, dwe.astype(we.dtype),
                dbe.astype(be.dtype), dwoe.astype(woe.dtype),
                dboe.astype(be.dtype))

    op.defvjp(fwd, bwd)
    return op


def reference_attention_proj(q, k, v, edge_raw, we, be, woe, boe):
    """Unfused math for the projection-fused op (fallback + test oracle)."""
    b, n, h, dk = q.shape
    d = h * dk
    e = edge_raw.reshape(b, n, n, d) @ we + be
    ep, na = reference_attention(q, k, v, e.reshape(b, n, n, h, dk))
    edge_out = ep @ woe + boe
    return edge_out, na


def edge_modulated_attention_proj(q, k, v, edge_raw, we, be, woe, boe, *,
                                  interpret: bool | None = None):
    """Fully-fused edge attention: e-projection + modulate + softmax +
    aggregate + out_e projection in one kernel.

    Args: q, k, v [B, N, H, dk]; edge_raw [B, N, N, H*dk] (the edge stream
    *before* the ``e`` Dense); we/be, woe/boe the ``e`` and ``out_e``
    Dense parameters.  Returns (edge_out [B,N,N,D] == out_e(attn),
    node_agg [B,N,D] pre-out_n aggregation)."""
    b, n, h, dk = q.shape
    d = h * dk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    itemsize = jnp.dtype(q.dtype).itemsize
    if d % 128 != 0 or _vmem_estimate_bytes(n, d, itemsize) > 10 * 2 ** 20:
        return reference_attention_proj(q, k, v, edge_raw, we, be, woe, boe)
    op = _make_proj_op(n, h, dk, interpret, jnp.dtype(q.dtype).name)
    return op(q.reshape(b, n, d), k.reshape(b, n, d), v.reshape(b, n, d),
              edge_raw, we, be, woe, boe)

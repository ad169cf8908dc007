"""Fused encoder-block edge stream (Pallas TPU kernel, v5 "megablock").

One encoder block touches the ``[B, N, N, D]`` edge stream many times
(reference layers.py:108-137 attention + 174-193 tails; our
models/layers.py ``EncoderBlock``):

    e         = y @ We + be                       (edge projection)
    t         = (q_i (.) k_j)/sqrt(dk) * (e+1)*e  (modulated scores)
    y1        = t @ Woe + boe                     (pre-softmax edge readout)
    node_agg  = sum_j softmax_j(t) (.) v_j        (per-channel attention)
    u         = LN4(y + y1)
    y_out     = LN6(u + MLP2(u))                  (edge-stream tail)

The WGAN-GP step is HBM-bandwidth-bound (PERF.md); this kernel runs the
*entire* chain in one VMEM residency: **one HBM read of y, one write of
y_out** per block, nothing else edge-sized moves.  Compared to round 1's
kernels it adds the three fixes PERF.md's conclusion called for:

- **multi-graph tiles**: G graphs per grid step (per-graph grids ran 512
  tiny sequential programs; Pallas double-buffers the [G,N,N,D] blocks
  across grid steps, overlapping DMA with compute),
- **no residual write**: the backward recomputes e/t/softmax/tail from y
  (v3 wrote a [B,N,N,D] ``t`` residual — a full extra edge-stream
  round-trip),
- **fused tail**: the LN4 -> MLP2 -> LN6 tail (previously a second kernel
  reading/writing the stream again) happens in the same residency.

Per-channel subtlety (reference layers.py:108-130): the element-wise
q(.)k product and the softmax-over-keys are independent per channel, so
the math never needs the [H, dk] split — everything stays [N, N, D] with
the single scalar 1/sqrt(dk) (tests/test_models.py guards this equality).

First-order AD only (``jax.custom_vjp``): used on the Generator and on
the critic's non-GP passes; the gradient-penalty pass stays on the
twice-differentiable XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


# ===================================================================== math

def jnp_block_edge_stream(q, k, v, y, we, be, woe, boe,
                          g4, b4, w1, b1, w2, b2, g6, b6, *, heads: int):
    """Unfused jnp oracle with explicit head count."""
    bsz, n, d = q.shape
    f32 = jnp.float32
    inv = 1.0 / math.sqrt(d // heads)
    qf, kf, vf, yf = (a.astype(f32) for a in (q, k, v, y))
    e = yf @ we.astype(f32) + be.astype(f32)
    t = (qf[:, :, None, :] * kf[:, None, :, :]) * inv
    t = t * (e + 1.0) * e
    y1 = t @ woe.astype(f32) + boe.astype(f32)
    s = jax.nn.softmax(t, axis=2)
    node_agg = jnp.sum(s * vf[:, None, :, :], axis=2)
    tt = yf + y1
    u = _ln(tt, g4.astype(f32), b4.astype(f32))
    h = jnp.maximum(u @ w1.astype(f32) + b1.astype(f32), 0.0)
    m = h @ w2.astype(f32) + b2.astype(f32)
    y_out = _ln(u + m, g6.astype(f32), b6.astype(f32))
    return y_out.astype(y.dtype), node_agg.astype(q.dtype)


def _ln(x, g, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _EPS) * g + b


# ================================================================= forward

def _fwd_kernel(inv_sqrt_dk: float, gpb: int, n_real: int,
                q_ref, k_ref, v_ref, y_ref,
                we_ref, be_ref, woe_ref, boe_ref,
                g4_ref, b4_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g6_ref, b6_ref,
                yout_ref, node_ref):
    f32 = jnp.float32
    we = we_ref[...].astype(f32)
    woe = woe_ref[...].astype(f32)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    be, boe = be_ref[...].astype(f32), boe_ref[...].astype(f32)
    g4, b4 = g4_ref[...].astype(f32), b4_ref[...].astype(f32)
    b1, b2 = b1_ref[...].astype(f32), b2_ref[...].astype(f32)
    g6, b6 = g6_ref[...].astype(f32), b6_ref[...].astype(f32)

    for g in range(gpb):                      # static unroll over the tile
        q = q_ref[g].astype(f32)              # [N, D]
        k = k_ref[g].astype(f32)
        v = v_ref[g].astype(f32)
        y = y_ref[g].astype(f32)              # [N, N, D]
        n, _, d = y.shape

        e = jax.lax.dot_general(
            y.reshape(n * n, d), we, (((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(n, n, d) + be
        t = (q[:, None, :] * k[None, :, :]) * inv_sqrt_dk
        t = t * (e + 1.0) * e

        y1 = jax.lax.dot_general(
            t.reshape(n * n, d), woe, (((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(n, n, d) + boe

        # the key axis may be zero-padded to the sublane alignment; padded
        # keys are excluded from the softmax (n_real is static)
        if n_real < n:
            jmask = jax.lax.broadcasted_iota(
                jnp.int32, (1, n, 1), 1) < n_real
            t_sm = jnp.where(jmask, t, -1e30)
        else:
            t_sm = t
        mx = jnp.max(t_sm, axis=1, keepdims=True)
        ex = jnp.exp(t_sm - mx)
        s = ex / jnp.sum(ex, axis=1, keepdims=True)
        node_ref[g] = jnp.sum(s * v[None, :, :], axis=1).astype(
            node_ref.dtype)

        tt = (y + y1).reshape(n * n, d)
        u = _ln(tt, g4, b4)
        h = jnp.maximum(
            jax.lax.dot_general(u.astype(w1.dtype), w1,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32) + b1, 0.0)
        m = jax.lax.dot_general(h.astype(w2.dtype), w2,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32) + b2
        yout_ref[g] = _ln(u + m, g6, b6).reshape(n, n, d).astype(
            yout_ref.dtype)


# ================================================================ backward

def _bwd_kernel(inv_sqrt_dk: float, gpb: int, chunk: int, n_real: int,
                q_ref, k_ref, v_ref, y_ref,
                we_ref, be_ref, woe_ref, boe_ref,
                g4_ref, b4_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g6_ref, b6_ref,
                gy_ref, gn_ref,
                dq_ref, dk_ref, dv_ref, dy_ref,
                dwe_ref, dbe_ref, dwoe_ref, dboe_ref,
                dg4_ref, db4_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dg6_ref, db6_ref):
    """Recompute-from-y backward, chunked over query rows per graph.

    Every edge-sized quantity is recomputed in [chunk, N, D] slices; only
    dk/dv ([N, D]) and the parameter grads accumulate across chunks, and
    the parameter grads additionally accumulate across grid steps."""
    f32 = jnp.float32
    bidx = pl.program_id(0)
    we = we_ref[...].astype(f32)
    woe = woe_ref[...].astype(f32)
    w1 = w1_ref[...].astype(f32)
    w2 = w2_ref[...].astype(f32)
    be, boe = be_ref[...].astype(f32), boe_ref[...].astype(f32)
    g4 = g4_ref[...].astype(f32)
    b4 = b4_ref[...].astype(f32)
    g6 = g6_ref[...].astype(f32)
    b1, b2 = b1_ref[...].astype(f32), b2_ref[...].astype(f32)

    @pl.when(bidx == 0)
    def _():
        for r in (dwe_ref, dbe_ref, dwoe_ref, dboe_ref, dg4_ref, db4_ref,
                  dw1_ref, db1_ref, dw2_ref, db2_ref, dg6_ref, db6_ref):
            r[...] = jnp.zeros_like(r)

    d = we.shape[0]
    hid = w1.shape[1]

    for g in range(gpb):
        q = q_ref[g].astype(f32)                    # [N, D]
        k = k_ref[g].astype(f32)
        v = v_ref[g].astype(f32)
        n = q.shape[0]

        # --- pass 1 (cheap, node-sized): softmax denominators need full
        # rows, but t is row-local in i, so the softmax is computed inside
        # each chunk; only dk/dv need cross-chunk accumulation.
        dk_acc = jnp.zeros((n, d), f32)
        dv_acc = jnp.zeros((n, d), f32)
        dwe_acc = jnp.zeros((d, d), f32)
        dbe_acc = jnp.zeros((1, d), f32)
        dwoe_acc = jnp.zeros((d, d), f32)
        dboe_acc = jnp.zeros((1, d), f32)
        dg4_acc = jnp.zeros((1, d), f32)
        db4_acc = jnp.zeros((1, d), f32)
        dw1_acc = jnp.zeros((d, hid), f32)
        db1_acc = jnp.zeros((1, hid), f32)
        dw2_acc = jnp.zeros((hid, d), f32)
        db2_acc = jnp.zeros((1, d), f32)
        dg6_acc = jnp.zeros((1, d), f32)
        db6_acc = jnp.zeros((1, d), f32)

        n_chunks = pl.cdiv(n, chunk)

        def body(ci, carry):
            (dk_acc, dv_acc, dwe_acc, dbe_acc, dwoe_acc, dboe_acc,
             dg4_acc, db4_acc, dw1_acc, db1_acc, dw2_acc, db2_acc,
             dg6_acc, db6_acc) = carry
            r0 = ci * chunk
            rows = pl.ds(r0, chunk)
            q_c = q_ref[g, rows, :].astype(f32)         # [CH, D]
            y_c = y_ref[g, rows, :, :].astype(f32)      # [CH, N, D]
            gy_c = gy_ref[g, rows, :, :].astype(f32)
            gn_c = gn_ref[g, rows, :].astype(f32)

            # ---- recompute forward for these rows
            e_c = jax.lax.dot_general(
                y_c.reshape(chunk * n, d), we, (((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(chunk, n, d) + be
            p_c = (q_c[:, None, :] * k[None, :, :]) * inv_sqrt_dk
            t_c = p_c * (e_c + 1.0) * e_c
            y1_c = jax.lax.dot_general(
                t_c.reshape(chunk * n, d), woe, (((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(chunk, n, d) + boe
            if n_real < n:
                jmask = jax.lax.broadcasted_iota(
                    jnp.int32, (1, n, 1), 1) < n_real
                t_sm = jnp.where(jmask, t_c, -1e30)
            else:
                t_sm = t_c
            mx = jnp.max(t_sm, axis=1, keepdims=True)
            ex = jnp.exp(t_sm - mx)
            ssum = jnp.sum(ex, axis=1, keepdims=True)
            s_c = ex / ssum

            tt = (y_c + y1_c).reshape(chunk * n, d)
            mu4 = jnp.mean(tt, axis=-1, keepdims=True)
            var4 = jnp.mean(jnp.square(tt - mu4), axis=-1, keepdims=True)
            rstd4 = jax.lax.rsqrt(var4 + _EPS)
            xhat4 = (tt - mu4) * rstd4
            u = xhat4 * g4 + b4
            hpre = jax.lax.dot_general(
                u, w1, (((1,), (0,)), ((), ())),
                preferred_element_type=f32) + b1
            h = jnp.maximum(hpre, 0.0)
            m = jax.lax.dot_general(
                h, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=f32) + b2
            r = u + m
            mu6 = jnp.mean(r, axis=-1, keepdims=True)
            var6 = jnp.mean(jnp.square(r - mu6), axis=-1, keepdims=True)
            rstd6 = jax.lax.rsqrt(var6 + _EPS)
            xhat6 = (r - mu6) * rstd6

            # ---- tail backward (rows independent)
            go = gy_c.reshape(chunk * n, d)
            dg6_acc = dg6_acc + jnp.sum(go * xhat6, axis=0, keepdims=True)
            db6_acc = db6_acc + jnp.sum(go, axis=0, keepdims=True)
            dxh6 = go * g6
            dr = (dxh6 - jnp.mean(dxh6, axis=-1, keepdims=True)
                  - xhat6 * jnp.mean(dxh6 * xhat6, axis=-1,
                                     keepdims=True)) * rstd6
            # r = u + m
            dm = dr
            dw2_acc = dw2_acc + jax.lax.dot_general(
                h, dm, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            db2_acc = db2_acc + jnp.sum(dm, axis=0, keepdims=True)
            dh = jax.lax.dot_general(
                dm, w2, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dhpre = jnp.where(hpre > 0.0, dh, 0.0)
            dw1_acc = dw1_acc + jax.lax.dot_general(
                u, dhpre, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            db1_acc = db1_acc + jnp.sum(dhpre, axis=0, keepdims=True)
            du = dr + jax.lax.dot_general(
                dhpre, w1, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dg4_acc = dg4_acc + jnp.sum(du * xhat4, axis=0, keepdims=True)
            db4_acc = db4_acc + jnp.sum(du, axis=0, keepdims=True)
            dxh4 = du * g4
            dtt = (dxh4 - jnp.mean(dxh4, axis=-1, keepdims=True)
                   - xhat4 * jnp.mean(dxh4 * xhat4, axis=-1,
                                      keepdims=True)) * rstd4
            dtt = dtt.reshape(chunk, n, d)          # = d(y)+d(y1) paths

            # ---- y1 backward
            dy1 = dtt
            dwoe_acc = dwoe_acc + jax.lax.dot_general(
                t_c.reshape(chunk * n, d), dy1.reshape(chunk * n, d),
                (((0,), (0,)), ((), ())), preferred_element_type=f32)
            dboe_acc = dboe_acc + jnp.sum(dy1.reshape(chunk * n, d),
                                          axis=0, keepdims=True)
            dt = jax.lax.dot_general(
                dy1.reshape(chunk * n, d), woe, (((1,), (1,)), ((), ())),
                preferred_element_type=f32).reshape(chunk, n, d)

            # ---- softmax / aggregation backward
            ds = gn_c[:, None, :] * v[None, :, :]       # [CH, N, D]
            dv_acc = dv_acc + jnp.sum(
                s_c * gn_c[:, None, :], axis=0)
            dt = dt + s_c * (ds - jnp.sum(ds * s_c, axis=1, keepdims=True))

            # ---- modulate backward
            dp = dt * (e_c + 1.0) * e_c
            de = dt * p_c * (2.0 * e_c + 1.0)
            dq_c = jnp.sum(dp * k[None, :, :], axis=1) * inv_sqrt_dk
            dk_acc = dk_acc + jnp.sum(
                dp * q_c[:, None, :], axis=0) * inv_sqrt_dk

            # ---- edge projection backward
            dwe_acc = dwe_acc + jax.lax.dot_general(
                y_c.reshape(chunk * n, d), de.reshape(chunk * n, d),
                (((0,), (0,)), ((), ())), preferred_element_type=f32)
            dbe_acc = dbe_acc + jnp.sum(de.reshape(chunk * n, d),
                                        axis=0, keepdims=True)
            dy_c = dtt + jax.lax.dot_general(
                de.reshape(chunk * n, d), we, (((1,), (1,)), ((), ())),
                preferred_element_type=f32).reshape(chunk, n, d)

            dy_ref[g, rows, :, :] = dy_c.astype(dy_ref.dtype)
            dq_ref[g, rows, :] = dq_c.astype(dq_ref.dtype)
            return (dk_acc, dv_acc, dwe_acc, dbe_acc, dwoe_acc, dboe_acc,
                    dg4_acc, db4_acc, dw1_acc, db1_acc, dw2_acc, db2_acc,
                    dg6_acc, db6_acc)

        (dk_acc, dv_acc, dwe_acc, dbe_acc, dwoe_acc, dboe_acc,
         dg4_acc, db4_acc, dw1_acc, db1_acc, dw2_acc, db2_acc,
         dg6_acc, db6_acc) = jax.lax.fori_loop(
            0, n_chunks, body,
            (dk_acc, dv_acc, dwe_acc, dbe_acc, dwoe_acc, dboe_acc,
             dg4_acc, db4_acc, dw1_acc, db1_acc, dw2_acc, db2_acc,
             dg6_acc, db6_acc))

        dk_ref[g] = dk_acc.astype(dk_ref.dtype)
        dv_ref[g] = dv_acc.astype(dv_ref.dtype)
        dwe_ref[...] += dwe_acc
        dbe_ref[...] += dbe_acc
        dwoe_ref[...] += dwoe_acc
        dboe_ref[...] += dboe_acc
        dg4_ref[...] += dg4_acc
        db4_ref[...] += db4_acc
        dw1_ref[...] += dw1_acc
        db1_ref[...] += db1_acc
        dw2_ref[...] += dw2_acc
        db2_ref[...] += db2_acc
        dg6_ref[...] += dg6_acc
        db6_ref[...] += db6_acc


# ============================================================== dispatch

def _graphs_per_block(n: int, d: int, itemsize: int) -> int:
    """Pick the graph-tile size: in+out blocks are double-buffered by the
    Pallas pipeline, intermediates are per-graph (sequential loop).

    $DRUGGEN_FUSED_BLOCK_GPB overrides — the axon relay's remote-compile
    helper is OOM-killed on the g>=2 unrolled program (PERF.md), while
    g=1 compiles and runs; on hardware with a local compiler the larger
    tile is preferred."""
    import os

    env = os.environ.get("DRUGGEN_FUSED_BLOCK_GPB")
    if env:
        return max(1, int(env))
    block_bytes = n * n * d * itemsize * 2 * 2   # in+out, x2 pipeline
    budget = 6 * 1024 * 1024                     # leave ~10MB for temps
    g = max(1, budget // max(block_bytes, 1))
    return int(min(g, 8))


def _row_chunk(n_pad: int) -> int:
    """Query-row chunk for the backward: ~15 chunk-sized [CH, N, D] f32
    intermediates are live at once, so a whole-graph chunk (n=45 ->
    ~60 MB) blows the 16 MB VMEM budget.  The vertex axis is padded to a
    multiple of 16 (`_pad_vertices`), so a 16-row chunk both divides it
    and keeps every dynamic-slice start sublane-aligned (Mosaic requires
    statically-provable alignment; unaligned starts fail to compile)."""
    return min(16, n_pad)


_VERTEX_ALIGN = 16  # bf16 sublane tile; also satisfies f32's 8


def _pad_vertices(q, k, v, y, gy=None, gn=None):
    """Zero-pad the vertex axes to the sublane alignment.  Padded KEYS are
    masked out of the softmax inside the kernels (n_real); padded QUERY
    rows only produce padded outputs, which the callers slice off (their
    cotangents are correspondingly zero)."""
    n = q.shape[1]
    np_ = -(-n // _VERTEX_ALIGN) * _VERTEX_ALIGN
    if np_ == n:
        return q, k, v, y, gy, gn
    p = np_ - n
    pad3 = ((0, 0), (0, p), (0, 0))
    q, k, v = (jnp.pad(a, pad3) for a in (q, k, v))
    y = jnp.pad(y, ((0, 0), (0, p), (0, p), (0, 0)))
    if gy is not None:
        gy = jnp.pad(gy, ((0, 0), (0, p), (0, p), (0, 0)))
    if gn is not None:
        gn = jnp.pad(gn, pad3)
    return q, k, v, y, gy, gn


def _pad_batch(a, b_pad):
    pad = b_pad - a.shape[0]
    if pad == 0:
        return a
    return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))


def _param_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, (lambda i: (0,) * nd),
                        memory_space=pltpu.VMEM)


def _run_fwd(q, k, v, y, params, heads: int, interpret: bool):
    (we, be, woe, boe, g4, b4, w1, b1, w2, b2, g6, b6) = params
    bsz, n_real, d = q.shape
    hid = w1.shape[1]
    inv = 1.0 / math.sqrt(d // heads)
    q, k, v, y, _, _ = _pad_vertices(q, k, v, y)
    n = q.shape[1]
    gpb = _graphs_per_block(n, d, jnp.dtype(y.dtype).itemsize)
    bp = -(-bsz // gpb) * gpb
    q, k, v, y = (_pad_batch(a, bp) for a in (q, k, v, y))
    cdt = y.dtype
    we_c, woe_c = we.astype(cdt), woe.astype(cdt)
    w1_c, w2_c = w1.astype(cdt), w2.astype(cdt)

    def node_spec():
        return pl.BlockSpec((gpb, n, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def edge_spec():
        return pl.BlockSpec((gpb, n, n, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    pvecs = [be.reshape(1, d), boe.reshape(1, d), g4.reshape(1, d),
             b4.reshape(1, d), b1.reshape(1, hid), b2.reshape(1, d),
             g6.reshape(1, d), b6.reshape(1, d)]
    yout, node = pl.pallas_call(
        functools.partial(_fwd_kernel, inv, gpb, n_real),
        grid=(bp // gpb,),
        in_specs=[node_spec(), node_spec(), node_spec(), edge_spec(),
                  _param_spec((d, d)), _param_spec((1, d)),
                  _param_spec((d, d)), _param_spec((1, d)),
                  _param_spec((1, d)), _param_spec((1, d)),
                  _param_spec((d, hid)), _param_spec((1, hid)),
                  _param_spec((hid, d)), _param_spec((1, d)),
                  _param_spec((1, d)), _param_spec((1, d))],
        out_specs=[edge_spec(), node_spec()],
        out_shape=[jax.ShapeDtypeStruct((bp, n, n, d), y.dtype),
                   jax.ShapeDtypeStruct((bp, n, d), q.dtype)],
        interpret=interpret,
    )(q, k, v, y, we_c, pvecs[0], woe_c, pvecs[1], pvecs[2], pvecs[3],
      w1_c, pvecs[4], w2_c, pvecs[5], pvecs[6], pvecs[7])
    return yout[:bsz, :n_real, :n_real], node[:bsz, :n_real]


def _run_bwd(q, k, v, y, params, gy, gn, heads: int, interpret: bool):
    (we, be, woe, boe, g4, b4, w1, b1, w2, b2, g6, b6) = params
    bsz, n_real, d = q.shape
    hid = w1.shape[1]
    inv = 1.0 / math.sqrt(d // heads)
    q, k, v, y, gy, gn = _pad_vertices(q, k, v, y, gy, gn)
    n = q.shape[1]
    gpb = _graphs_per_block(n, d, jnp.dtype(y.dtype).itemsize)
    bp = -(-bsz // gpb) * gpb
    q, k, v, y, gy, gn = (_pad_batch(a, bp)
                          for a in (q, k, v, y, gy, gn))
    cdt = y.dtype
    f32 = jnp.float32
    chunk = _row_chunk(n)

    def node_spec():
        return pl.BlockSpec((gpb, n, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def edge_spec():
        return pl.BlockSpec((gpb, n, n, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    pvecs = [be.reshape(1, d), boe.reshape(1, d), g4.reshape(1, d),
             b4.reshape(1, d), b1.reshape(1, hid), b2.reshape(1, d),
             g6.reshape(1, d), b6.reshape(1, d)]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, inv, gpb, chunk, n_real),
        grid=(bp // gpb,),
        in_specs=[node_spec(), node_spec(), node_spec(), edge_spec(),
                  _param_spec((d, d)), _param_spec((1, d)),
                  _param_spec((d, d)), _param_spec((1, d)),
                  _param_spec((1, d)), _param_spec((1, d)),
                  _param_spec((d, hid)), _param_spec((1, hid)),
                  _param_spec((hid, d)), _param_spec((1, d)),
                  _param_spec((1, d)), _param_spec((1, d)),
                  edge_spec(), node_spec()],
        out_specs=[node_spec(), node_spec(), node_spec(), edge_spec(),
                   _param_spec((d, d)), _param_spec((1, d)),
                   _param_spec((d, d)), _param_spec((1, d)),
                   _param_spec((1, d)), _param_spec((1, d)),
                   _param_spec((d, hid)), _param_spec((1, hid)),
                   _param_spec((hid, d)), _param_spec((1, d)),
                   _param_spec((1, d)), _param_spec((1, d))],
        out_shape=[jax.ShapeDtypeStruct((bp, n, d), q.dtype),
                   jax.ShapeDtypeStruct((bp, n, d), k.dtype),
                   jax.ShapeDtypeStruct((bp, n, d), v.dtype),
                   jax.ShapeDtypeStruct((bp, n, n, d), y.dtype),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, hid), f32),
                   jax.ShapeDtypeStruct((1, hid), f32),
                   jax.ShapeDtypeStruct((hid, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)],
        interpret=interpret,
    )(q, k, v, y, we.astype(cdt), pvecs[0], woe.astype(cdt), pvecs[1],
      pvecs[2], pvecs[3], w1.astype(cdt), pvecs[4], w2.astype(cdt),
      pvecs[5], pvecs[6], pvecs[7], gy, gn)
    (dq, dk, dv, dy, dwe, dbe, dwoe, dboe, dg4, db4, dw1, db1, dw2, db2,
     dg6, db6) = outs
    dq, dk, dv = (a[:bsz, :n_real] for a in (dq, dk, dv))
    dy = dy[:bsz, :n_real, :n_real]
    return (dq, dk, dv, dy,
            dwe.astype(we.dtype), dbe.reshape(d).astype(be.dtype),
            dwoe.astype(woe.dtype), dboe.reshape(d).astype(boe.dtype),
            dg4.reshape(d).astype(g4.dtype), db4.reshape(d).astype(b4.dtype),
            dw1.astype(w1.dtype), db1.reshape(hid).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(d).astype(b2.dtype),
            dg6.reshape(d).astype(g6.dtype), db6.reshape(d).astype(b6.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def _fused_block_op(q, k, v, y, we, be, woe, boe, g4, b4, w1, b1, w2, b2,
                    g6, b6, heads, interpret):
    return _run_fwd(q, k, v, y,
                    (we, be, woe, boe, g4, b4, w1, b1, w2, b2, g6, b6),
                    heads, interpret)


def _op_fwd(q, k, v, y, we, be, woe, boe, g4, b4, w1, b1, w2, b2, g6, b6,
            heads, interpret):
    out = _run_fwd(q, k, v, y,
                   (we, be, woe, boe, g4, b4, w1, b1, w2, b2, g6, b6),
                   heads, interpret)
    return out, (q, k, v, y, we, be, woe, boe, g4, b4, w1, b1, w2, b2,
                 g6, b6)


def _op_bwd(heads, interpret, res, grads):
    (q, k, v, y, we, be, woe, boe, g4, b4, w1, b1, w2, b2, g6, b6) = res
    gy, gn = grads
    return _run_bwd(q, k, v, y,
                    (we, be, woe, boe, g4, b4, w1, b1, w2, b2, g6, b6),
                    gy, gn, heads, interpret)


_fused_block_op.defvjp(_op_fwd, _op_bwd)


def fused_block_edge_stream(q, k, v, y, we, be, woe, boe,
                            g4, b4, w1, b1, w2, b2, g6, b6, *,
                            heads: int, interpret: bool | None = None):
    """Fused edge-stream encoder block (see module docstring).

    q/k/v ``[B,N,D]``, y ``[B,N,N,D]`` -> (y_out ``[B,N,N,D]``,
    node_agg ``[B,N,D]``).  Falls back to the identical-math jnp path off
    TPU or when the channel dim isn't lane-aligned."""
    d = q.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if d % 128 != 0 and not interpret:
        return jnp_block_edge_stream(q, k, v, y, we, be, woe, boe, g4, b4,
                                     w1, b1, w2, b2, g6, b6, heads=heads)
    return _fused_block_op(q, k, v, y, we, be, woe, boe, g4, b4, w1, b1,
                           w2, b2, g6, b6, heads, interpret)

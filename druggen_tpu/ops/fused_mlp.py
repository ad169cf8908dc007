"""Fused LN -> MLP -> residual -> LN row kernel (the edge-stream tail).

Each encoder block ends its edge stream with (reference layers.py:190-192;
our models/layers.py EncoderBlock):

    y2  = LN4(y + y1)
    y   = LN6(y2 + MLP2(y2))        # MLP2 = fc1 -> relu -> fc2

On the XLA path this chain round-trips the [B, N, N, C] edge stream and
its 3C-wide MLP hidden through HBM ~13 row-traversals per forward (the
hidden alone is 796 MB at batch 512 bf16).  The WGAN-GP step is
HBM-bandwidth-bound (PERF.md), so this kernel computes the whole tail in
VMEM per row tile: 1 read of the summed input + 1 write of the output.

The backward is a second Pallas kernel that *recomputes* the forward from
the saved input tile (FLOPs are ~free on this workload) and accumulates
the parameter gradients across sequential grid steps.

Both directions are first-order only (``jax.custom_vjp``), so the op is
used on paths differentiated at most once: the Generator everywhere, and
the Discriminator outside the gradient-penalty interpolation (which needs
double-backward and stays on the XLA path).  Note at depth 1 the
Discriminator's edge tail is dead code XLA already eliminates — the win
here is the Generator path and any depth>1 configuration.

Rows are padded to the tile size with zeros; LayerNorm of a zero row is
finite (eps) and padded cotangent rows are zero, so the padding
contributes nothing to any gradient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
def _tile_rows(dtype) -> int:
    """Rows per grid step.  256 rows suits bf16 (16-sublane tiles); f32
    doubles the per-row bytes, so halve the tile to keep the same VMEM
    footprint and twice the grid-level pipelining (round-1's f32 slowdown
    came from running f32 through bf16-sized tiles)."""
    return 256 if jnp.dtype(dtype).itemsize == 2 else 128


def _ln_fwd(s, gamma, beta):
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (s - mu) * rstd
    return xhat * gamma + beta, xhat, rstd


def _ln_bwd_input(dx, xhat, rstd, gamma):
    """d(input) of y = gamma*xhat + beta given upstream dx."""
    dxhat = dx * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return (dxhat - m1 - xhat * m2) * rstd


def _mxu_precision(dtype):
    """f32 streams keep full-precision MXU passes (the step is
    bandwidth-bound, extra matmul passes are ~free); bf16 uses default."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)


def _fwd_kernel(s_ref, g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g2_ref, bl2_ref, out_ref):
    prec = _mxu_precision(s_ref.dtype)
    s = s_ref[:].astype(jnp.float32)
    x, _, _ = _ln_fwd(s, g1_ref[:].astype(jnp.float32),
                      bl1_ref[:].astype(jnp.float32))
    h = jnp.maximum(
        jnp.dot(x.astype(s_ref.dtype), w1_ref[:],
                preferred_element_type=jnp.float32, precision=prec)
        + b1_ref[:].astype(jnp.float32), 0.0)
    m = jnp.dot(h.astype(s_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32, precision=prec) \
        + b2_ref[:].astype(jnp.float32)
    r = x + m
    out, _, _ = _ln_fwd(r, g2_ref[:].astype(jnp.float32),
                        bl2_ref[:].astype(jnp.float32))
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(s_ref, g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g2_ref, bl2_ref, dout_ref,
                ds_ref, dg1_ref, dbl1_ref, dw1_ref, db1_ref, dw2_ref,
                db2_ref, dg2_ref, dbl2_ref):
    f32 = jnp.float32
    cdt = s_ref.dtype
    prec = _mxu_precision(cdt)
    s = s_ref[:].astype(f32)
    g1 = g1_ref[:].astype(f32)
    g2 = g2_ref[:].astype(f32)
    # ---- recompute forward
    x, xhat1, rstd1 = _ln_fwd(s, g1, bl1_ref[:].astype(f32))
    h_pre = jnp.dot(x.astype(cdt), w1_ref[:], precision=prec,
                    preferred_element_type=f32) + b1_ref[:].astype(f32)
    h = jnp.maximum(h_pre, 0.0)
    m = jnp.dot(h.astype(cdt), w2_ref[:], precision=prec,
                preferred_element_type=f32) + b2_ref[:].astype(f32)
    r = x + m
    mu2 = jnp.mean(r, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(r - mu2), axis=-1, keepdims=True)
    rstd2 = jax.lax.rsqrt(var2 + _EPS)
    rhat = (r - mu2) * rstd2
    # ---- backward
    dout = dout_ref[:].astype(f32)
    dr = _ln_bwd_input(dout, rhat, rstd2, g2)
    dm = dr
    dh = jnp.dot(dm.astype(cdt), w2_ref[:].T, precision=prec,
                 preferred_element_type=f32) * (h_pre > 0.0)
    dx = dr + jnp.dot(dh.astype(cdt), w1_ref[:].T, precision=prec,
                      preferred_element_type=f32)
    ds = _ln_bwd_input(dx, xhat1, rstd1, g1)
    ds_ref[:] = ds.astype(ds_ref.dtype)

    # ---- parameter-gradient accumulation across sequential grid steps
    dg2_t = jnp.sum(dout * rhat, axis=0, keepdims=True)
    dbl2_t = jnp.sum(dout, axis=0, keepdims=True)
    dw2_t = jnp.dot(h.astype(cdt).T, dm.astype(cdt), precision=prec,
                    preferred_element_type=f32)
    db2_t = jnp.sum(dm, axis=0, keepdims=True)
    dw1_t = jnp.dot(x.astype(cdt).T, dh.astype(cdt), precision=prec,
                    preferred_element_type=f32)
    db1_t = jnp.sum(dh, axis=0, keepdims=True)
    dg1_t = jnp.sum(dx * xhat1, axis=0, keepdims=True)
    dbl1_t = jnp.sum(dx, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg1_ref[:] = dg1_t
        dbl1_ref[:] = dbl1_t
        dw1_ref[:] = dw1_t
        db1_ref[:] = db1_t
        dw2_ref[:] = dw2_t
        db2_ref[:] = db2_t
        dg2_ref[:] = dg2_t
        dbl2_ref[:] = dbl2_t

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dg1_ref[:] += dg1_t
        dbl1_ref[:] += dbl1_t
        dw1_ref[:] += dw1_t
        db1_ref[:] += db1_t
        dw2_ref[:] += dw2_t
        db2_ref[:] += db2_t
        dg2_ref[:] += dg2_t
        dbl2_ref[:] += dbl2_t


def _row_spec(c, tile):
    return pl.BlockSpec((tile, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _param_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, (lambda i: (0,) * nd),
                        memory_space=pltpu.VMEM)


def _pad_rows(a, rows_padded):
    pad = rows_padded - a.shape[0]
    if pad == 0:
        return a
    return jnp.pad(a, ((0, pad), (0, 0)))


def _fwd_pallas(s, g1, bl1, w1, b1, w2, b2, g2, bl2, interpret: bool):
    rows, c = s.shape
    hid = w1.shape[1]
    tile = _tile_rows(s.dtype)
    rp = -(-rows // tile) * tile
    sp = _pad_rows(s, rp)
    w1, w2 = w1.astype(s.dtype), w2.astype(s.dtype)  # keep the MXU in
    # the stream's compute dtype (bf16 weights for a bf16 stream)
    g1r, bl1r = g1.reshape(1, c), bl1.reshape(1, c)
    g2r, bl2r = g2.reshape(1, c), bl2.reshape(1, c)
    b1r, b2r = b1.reshape(1, hid), b2.reshape(1, c)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(rp // tile,),
        in_specs=[_row_spec(c, tile), _param_spec((1, c)), _param_spec((1, c)),
                  _param_spec((c, hid)), _param_spec((1, hid)),
                  _param_spec((hid, c)), _param_spec((1, c)),
                  _param_spec((1, c)), _param_spec((1, c))],
        out_specs=_row_spec(c, tile),
        out_shape=jax.ShapeDtypeStruct((rp, c), s.dtype),
        interpret=interpret,
    )(sp, g1r, bl1r, w1, b1r, w2, b2r, g2r, bl2r)
    return out[:rows]


def _bwd_pallas(s, g1, bl1, w1, b1, w2, b2, g2, bl2, dout, interpret: bool):
    rows, c = s.shape
    hid = w1.shape[1]
    tile = _tile_rows(s.dtype)
    rp = -(-rows // tile) * tile
    sp = _pad_rows(s, rp)
    doutp = _pad_rows(dout, rp)
    w1_dt, w2_dt = w1.dtype, w2.dtype
    w1, w2 = w1.astype(s.dtype), w2.astype(s.dtype)
    g1r, bl1r = g1.reshape(1, c), bl1.reshape(1, c)
    g2r, bl2r = g2.reshape(1, c), bl2.reshape(1, c)
    b1r, b2r = b1.reshape(1, hid), b2.reshape(1, c)
    f32 = jnp.float32
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(rp // tile,),
        in_specs=[_row_spec(c, tile)] + [_param_spec((1, c)), _param_spec((1, c)),
                                   _param_spec((c, hid)),
                                   _param_spec((1, hid)),
                                   _param_spec((hid, c)), _param_spec((1, c)),
                                   _param_spec((1, c)), _param_spec((1, c))]
        + [_row_spec(c, tile)],
        out_specs=[_row_spec(c, tile),
                   _param_spec((1, c)), _param_spec((1, c)),
                   _param_spec((c, hid)), _param_spec((1, hid)),
                   _param_spec((hid, c)), _param_spec((1, c)),
                   _param_spec((1, c)), _param_spec((1, c))],
        out_shape=[jax.ShapeDtypeStruct((rp, c), s.dtype),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, hid), f32),
                   jax.ShapeDtypeStruct((1, hid), f32),
                   jax.ShapeDtypeStruct((hid, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32)],
        interpret=interpret,
    )(sp, g1r, bl1r, w1, b1r, w2, b2r, g2r, bl2r, doutp)
    ds, dg1, dbl1, dw1, db1, dw2, db2, dg2, dbl2 = outs
    return (ds[:rows],
            dg1.reshape(c).astype(g1.dtype), dbl1.reshape(c).astype(bl1.dtype),
            dw1.astype(w1_dt), db1.reshape(hid).astype(b1.dtype),
            dw2.astype(w2_dt), db2.reshape(c).astype(b2.dtype),
            dg2.reshape(c).astype(g2.dtype), dbl2.reshape(c).astype(bl2.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused_op(s, g1, bl1, w1, b1, w2, b2, g2, bl2, interpret):
    return _fwd_pallas(s, g1, bl1, w1, b1, w2, b2, g2, bl2, interpret)


def _fused_fwd(s, g1, bl1, w1, b1, w2, b2, g2, bl2, interpret):
    out = _fwd_pallas(s, g1, bl1, w1, b1, w2, b2, g2, bl2, interpret)
    return out, (s, g1, bl1, w1, b1, w2, b2, g2, bl2)


def _fused_bwd(interpret, res, dout):
    return _bwd_pallas(*res, dout, interpret)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def _reference_rows(s, g1, bl1, w1, b1, w2, b2, g2, bl2):
    """Plain-jnp statement of the fused op's math (LN2(LN1(s) +
    fc2(relu(fc1(LN1(s)))))) — differentiable to any order."""
    ln1, _, _ = _ln_fwd(s, g1, bl1)
    h = jnp.maximum(jnp.dot(ln1, w1) + b1, 0.0)
    out = jnp.dot(h, w2) + b2
    y, _, _ = _ln_fwd(ln1 + out, g2, bl2)
    return y


@partial(jax.custom_jvp, nondiff_argnums=(9,))
def _fused_op_ho(s, g1, bl1, w1, b1, w2, b2, g2, bl2, interpret):
    return _fwd_pallas(s, g1, bl1, w1, b1, w2, b2, g2, bl2, interpret)


@_fused_op_ho.defjvp
def _fused_op_ho_jvp(interpret, primals, tangents):
    # primal via the Pallas kernel; tangents (and therefore every
    # reverse-mode transpose and higher derivative JAX builds from them)
    # via the jnp reference math.  This trades the fused backward for
    # unlimited differentiation order: the one variant the WGAN-GP
    # double-backward can consume.
    primal_out = _fused_op_ho(*primals, interpret)
    _, tangent_out = jax.jvp(_reference_rows, primals, tangents)
    # the reference math may promote (e.g. bf16 inputs with f32
    # accumulation); the tangent must carry the primal's dtype
    return primal_out, tangent_out.astype(primal_out.dtype)


def fused_ln_mlp_ln(s, g1, bl1, w1, b1, w2, b2, g2, bl2, *,
                    interpret: bool | None = None,
                    grad_mode: str = "vjp"):
    """``LN2(LN1(s) + fc2(relu(fc1(LN1(s)))))`` over the last axis of ``s``.

    ``s``: [..., C]; weights: w1 [C, H], w2 [H, C]; LN params [C].
    One HBM read of ``s`` + one write of the output per direction
    (backward recomputes in VMEM).

    ``grad_mode='vjp'`` (default): fused Pallas backward too —
    first-order differentiable only.  ``grad_mode='jvp'``: Pallas
    forward with jnp-math derivatives (``jax.custom_jvp``) —
    differentiable to ANY order, so it can sit inside the gradient
    penalty's double-backward; the backward passes themselves run on
    XLA.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = s.shape
    c = shape[-1]
    s2 = s.reshape(-1, c)
    op = _fused_op_ho if grad_mode == "jvp" else _fused_op
    out = op(s2, g1, bl1, w1, b1, w2, b2, g2, bl2, interpret)
    return out.reshape(shape)

"""Parity tests for the fused LN->MLP->LN edge-tail Pallas kernel
(druggen_tpu/ops/fused_mlp.py) in interpreter mode, and for its wiring
into EncoderBlock (fused_mlp=True vs the XLA path, same params)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.models.layers import EncoderBlock
from druggen_tpu.ops.fused_mlp import fused_ln_mlp_ln


def _ref(s, g1, bl1, w1, b1, w2, b2, g2, bl2):
    def ln(v, g, b):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

    x = ln(s, g1, bl1)
    h = jax.nn.relu(x @ w1 + b1)
    return ln(x + (h @ w2 + b2), g2, bl2)


def _rand_params(rng, c, hid):
    return (jnp.asarray(rng.normal(size=(c,)), jnp.float32) * 0.5 + 1.0,
            jnp.asarray(rng.normal(size=(c,)), jnp.float32) * 0.1,
            jnp.asarray(rng.normal(size=(c, hid)), jnp.float32) / np.sqrt(c),
            jnp.asarray(rng.normal(size=(hid,)), jnp.float32) * 0.1,
            jnp.asarray(rng.normal(size=(hid, c)), jnp.float32) / np.sqrt(hid),
            jnp.asarray(rng.normal(size=(c,)), jnp.float32) * 0.1,
            jnp.asarray(rng.normal(size=(c,)), jnp.float32) * 0.5 + 1.0,
            jnp.asarray(rng.normal(size=(c,)), jnp.float32) * 0.1)


@pytest.mark.parametrize("rows", [300, 512])
def test_forward_parity(rows):
    """Includes a non-multiple-of-tile row count (padding path)."""
    c, hid = 16, 48
    rng = np.random.default_rng(rows)
    s = jnp.asarray(rng.normal(size=(rows, c)), jnp.float32)
    p = _rand_params(rng, c, hid)
    out = fused_ln_mlp_ln(s, *p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(s, *p)),
                               atol=2e-5, rtol=2e-5)


def test_forward_4d_shape():
    c, hid = 16, 48
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.normal(size=(2, 9, 9, c)), jnp.float32)
    p = _rand_params(rng, c, hid)
    out = fused_ln_mlp_ln(s, *p)
    assert out.shape == s.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(s, *p)),
                               atol=2e-5, rtol=2e-5)


def test_grad_parity():
    """Input and every parameter gradient vs jax.grad of the XLA math,
    on a row count spanning >1 grid step plus padding (accumulator +
    zero-padded-cotangent paths)."""
    c, hid = 16, 48
    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.normal(size=(300, c)), jnp.float32)
    p = _rand_params(rng, c, hid)
    cot = jnp.asarray(rng.normal(size=(300, c)), jnp.float32)

    g_fused = jax.grad(lambda *a: jnp.sum(fused_ln_mlp_ln(*a) * cot),
                       argnums=tuple(range(9)))(s, *p)
    g_ref = jax.grad(lambda *a: jnp.sum(_ref(*a) * cot),
                     argnums=tuple(range(9)))(s, *p)
    names = ["s", "g1", "bl1", "w1", "b1", "w2", "b2", "g2", "bl2"]
    for name, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_bfloat16_dtype():
    c, hid = 16, 48
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.normal(size=(64, c)), jnp.bfloat16)
    p = _rand_params(rng, c, hid)
    out = fused_ln_mlp_ln(s, *p)
    assert out.dtype == jnp.bfloat16
    ref = _ref(s.astype(jnp.float32), *p)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=0.1, rtol=0.1)


def _block_inputs(rng, b, n, c):
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, n, n, c)), jnp.float32)
    return x, y


def test_encoder_block_fused_parity():
    """fused_mlp=True must be checkpoint-compatible (same param tree) and
    numerically match the XLA block, values and param grads."""
    b, n, c, heads = 2, 9, 16, 4
    rng = np.random.default_rng(4)
    x, y = _block_inputs(rng, b, n, c)
    blk = EncoderBlock(dim=c, heads=heads, mlp_ratio=3)
    blk_f = EncoderBlock(dim=c, heads=heads, mlp_ratio=3, fused_mlp=True)
    params = blk.init(jax.random.PRNGKey(0), x, y)
    params_f = blk_f.init(jax.random.PRNGKey(0), x, y)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))

    (x0, y0) = blk.apply(params, x, y)
    (x1, y1) = blk_f.apply(params, x, y)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=2e-5, rtol=2e-5)

    def loss(mod):
        def f(p):
            xo, yo = mod.apply(p, x, y)
            return jnp.sum(xo**2) + jnp.sum(yo**2)
        return f

    g0 = jax.grad(loss(blk))(params)
    g1 = jax.grad(loss(blk_f))(params)
    flat0, _ = jax.tree_util.tree_flatten_with_path(g0)
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1)
    for (k0, a), (_, bv) in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bv), atol=2e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(k0))


def test_encoder_block_fused_dropout_falls_back():
    """Non-deterministic dropout must bypass the fused kernel (which has
    no RNG) and still run."""
    b, n, c, heads = 1, 5, 16, 4
    rng = np.random.default_rng(5)
    x, y = _block_inputs(rng, b, n, c)
    blk = EncoderBlock(dim=c, heads=heads, mlp_ratio=3, drop_rate=0.5,
                       fused_mlp=True)
    params = blk.init(jax.random.PRNGKey(0), x, y)
    xo, yo = blk.apply(params, x, y, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert xo.shape == x.shape and yo.shape == y.shape


def test_jvp_mode_second_order():
    """grad_mode='jvp' (Pallas forward, jnp-math derivatives) must support
    grad-of-grad — the WGAN-GP double-backward pattern — and agree with
    the pure-jnp reference to second order."""
    rng = np.random.default_rng(3)
    c, hid, rows = 16, 32, 8
    params = _rand_params(rng, c, hid)
    s = jnp.asarray(rng.normal(size=(rows, c)).astype(np.float32))

    def gp_like(fn):
        # ||d/ds sum(fn(s))||^2 — then grad w.r.t. a weight (2nd order)
        def inner(w1):
            p = list(params)
            p[2] = w1
            g = jax.grad(lambda x: jnp.sum(fn(x, *p)))(s)
            return jnp.sum(g * g)
        return jax.value_and_grad(inner)(params[2])

    v_ref, g_ref = gp_like(lambda x, *p: _ref(x, *p))
    v_fused, g_fused = gp_like(
        lambda x, *p: fused_ln_mlp_ln(x, *p, grad_mode="jvp"))
    np.testing.assert_allclose(float(v_fused), float(v_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_jvp_mode_first_order_matches_vjp_mode():
    rng = np.random.default_rng(4)
    c, hid, rows = 16, 32, 8
    params = _rand_params(rng, c, hid)
    s = jnp.asarray(rng.normal(size=(rows, c)).astype(np.float32))
    for mode in ("vjp", "jvp"):
        g = jax.grad(lambda x: jnp.sum(
            fused_ln_mlp_ln(x, *params, grad_mode=mode) ** 2))(s)
        if mode == "vjp":
            base = np.asarray(g)
        else:
            np.testing.assert_allclose(np.asarray(g), base,
                                       rtol=1e-4, atol=1e-5)

"""Pallas fused-attention kernel tests (interpret mode on the CPU backend):
forward parity with the unfused jnp math and gradient parity with jax.grad
of the reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.ops.fused_attention import (
    edge_modulated_attention,
    reference_attention,
)

B, N, H, DK = 2, 11, 2, 64   # D = 128 (lane-aligned), N deliberately ragged
D = H * DK


def _inputs(seed=0):
    key = jax.random.PRNGKey(seed)
    q = jax.random.normal(jax.random.fold_in(key, 0), (B, N, H, DK))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, N, H, DK))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, N, H, DK))
    e = jax.random.normal(jax.random.fold_in(key, 3), (B, N, N, H, DK))
    return q, k, v, e


def test_forward_matches_reference():
    q, k, v, e = _inputs()
    edge_f, node_f = edge_modulated_attention(q, k, v, e, interpret=True)
    edge_r, node_r = reference_attention(q, k, v, e)
    np.testing.assert_allclose(np.asarray(edge_f), np.asarray(edge_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(node_f), np.asarray(node_r),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    q, k, v, e = _inputs(1)
    # random cotangent-weighted scalar so every output element matters
    key = jax.random.PRNGKey(9)
    w_edge = jax.random.normal(jax.random.fold_in(key, 0), (B, N, N, D))
    w_node = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D))

    def loss_fused(q, k, v, e):
        ep, na = edge_modulated_attention(q, k, v, e, interpret=True)
        return jnp.sum(ep * w_edge) + jnp.sum(na * w_node)

    def loss_ref(q, k, v, e):
        ep, na = reference_attention(q, k, v, e)
        return jnp.sum(ep * w_edge) + jnp.sum(na * w_node)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, e)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, e)
    for name, gf, gr in zip("qkve", g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad mismatch for {name}")


def test_small_dim_falls_back():
    """Non-lane-aligned dims route to the jnp path and still work under
    jit and grad."""
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(key, 0), (2, 5, 2, 8))
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 2, 8))
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 5, 2, 8))
    e = jax.random.normal(jax.random.fold_in(key, 3), (2, 5, 5, 2, 8))
    ep, na = jax.jit(edge_modulated_attention)(q, k, v, e)
    er, nr = reference_attention(q, k, v, e)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(er), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(na), np.asarray(nr), rtol=1e-5, atol=1e-6)


def test_mha_module_with_pallas_matches_without():
    """GraphMHA(use_pallas=True) == GraphMHA(use_pallas=False) at dim 128
    (interpret-mode kernel on CPU)."""
    from druggen_tpu.models import GraphMHA

    # monkeypatch default interpret detection is not needed: CPU backend
    # auto-selects interpret mode inside edge_modulated_attention
    dim, heads, n, b = 128, 8, 9, 2
    key = jax.random.PRNGKey(3)
    node = jax.random.normal(jax.random.fold_in(key, 0), (b, n, dim))
    edge = jax.random.normal(jax.random.fold_in(key, 1), (b, n, n, dim))
    mha_ref = GraphMHA(dim=dim, heads=heads, use_pallas=False)
    params = mha_ref.init(jax.random.fold_in(key, 2), node, edge)
    out_ref = mha_ref.apply(params, node, edge)
    mha_pl = GraphMHA(dim=dim, heads=heads, use_pallas=True)
    out_pl = mha_pl.apply(params, node, edge)
    for a, bb in zip(out_ref, out_pl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)

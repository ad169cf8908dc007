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


def test_proj_forward_matches_reference():
    from druggen_tpu.ops.fused_attention import (
        edge_modulated_attention_proj,
        reference_attention_proj,
    )

    q, k, v, e = _inputs(2)
    key = jax.random.PRNGKey(5)
    we = jax.random.normal(jax.random.fold_in(key, 0), (D, D)) * 0.1
    be = jax.random.normal(jax.random.fold_in(key, 1), (D,)) * 0.1
    woe = jax.random.normal(jax.random.fold_in(key, 2), (D, D)) * 0.1
    boe = jax.random.normal(jax.random.fold_in(key, 3), (D,)) * 0.1
    eraw = e.reshape(B, N, N, D)
    ef, nf = edge_modulated_attention_proj(q, k, v, eraw, we, be, woe, boe,
                                           interpret=True)
    er, nr = reference_attention_proj(q, k, v, eraw, we, be, woe, boe)
    np.testing.assert_allclose(np.asarray(ef), np.asarray(er),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nf), np.asarray(nr),
                               rtol=1e-4, atol=1e-4)


def test_proj_gradients_match_reference():
    from druggen_tpu.ops.fused_attention import (
        edge_modulated_attention_proj,
        reference_attention_proj,
    )

    q, k, v, e = _inputs(3)
    key = jax.random.PRNGKey(6)
    we = jax.random.normal(jax.random.fold_in(key, 0), (D, D)) * 0.1
    be = jax.random.normal(jax.random.fold_in(key, 1), (D,)) * 0.1
    woe = jax.random.normal(jax.random.fold_in(key, 2), (D, D)) * 0.1
    boe = jax.random.normal(jax.random.fold_in(key, 3), (D,)) * 0.1
    eraw = e.reshape(B, N, N, D)
    w_edge = jax.random.normal(jax.random.fold_in(key, 4), (B, N, N, D))
    w_node = jax.random.normal(jax.random.fold_in(key, 5), (B, N, D))

    def loss(fn):
        def inner(q, k, v, eraw, we, be, woe, boe):
            ep, na = fn(q, k, v, eraw, we, be, woe, boe)
            return jnp.sum(ep * w_edge) + jnp.sum(na * w_node)
        return inner

    from functools import partial
    fused = partial(edge_modulated_attention_proj, interpret=True)
    args = (q, k, v, eraw, we, be, woe, boe)
    g_f = jax.grad(loss(fused), argnums=tuple(range(8)))(*args)
    g_r = jax.grad(loss(reference_attention_proj),
                   argnums=tuple(range(8)))(*args)
    names = ["q", "k", "v", "eraw", "we", "be", "woe", "boe"]
    for name, gf, gr in zip(names, g_f, g_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"grad mismatch for {name}")


def test_mha_module_pallas_proj_matches_xla():
    from druggen_tpu.models import GraphMHA

    dim, heads, n, b = 128, 8, 9, 2
    key = jax.random.PRNGKey(8)
    node = jax.random.normal(jax.random.fold_in(key, 0), (b, n, dim))
    edge = jax.random.normal(jax.random.fold_in(key, 1), (b, n, n, dim))
    mha_ref = GraphMHA(dim=dim, heads=heads, use_pallas=False)
    params = mha_ref.init(jax.random.fold_in(key, 2), node, edge)
    out_ref = mha_ref.apply(params, node, edge)
    mha_pl = GraphMHA(dim=dim, heads=heads, use_pallas=True)
    # same params must be loadable in both modes (checkpoint compat)
    out_pl = mha_pl.apply(params, node, edge)
    for a, bb in zip(out_ref, out_pl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4)


def test_mha_module_pallas_grads_match_xla():
    from druggen_tpu.models import GraphMHA

    dim, heads, n, b = 128, 8, 7, 2
    key = jax.random.PRNGKey(9)
    node = jax.random.normal(jax.random.fold_in(key, 0), (b, n, dim))
    edge = jax.random.normal(jax.random.fold_in(key, 1), (b, n, n, dim))
    mha_ref = GraphMHA(dim=dim, heads=heads, use_pallas=False)
    params = mha_ref.init(jax.random.fold_in(key, 2), node, edge)

    def loss(mha):
        def f(p):
            no, eo = mha.apply(p, node, edge)
            return jnp.sum(no ** 2) + jnp.sum(eo ** 2)
        return f

    g_ref = jax.grad(loss(mha_ref))(params)
    g_pl = jax.grad(loss(GraphMHA(dim=dim, heads=heads,
                                  use_pallas=True)))(params)
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_p = dict(jax.tree_util.tree_flatten_with_path(g_pl)[0])
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf),
            rtol=5e-3, atol=5e-3,
            err_msg=f"param grad mismatch at {path}")

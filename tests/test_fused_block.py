"""v5 megablock kernel (ops/fused_block.py): the whole encoder-block edge
stream (e-proj -> modulate -> out_e -> per-channel softmax aggregation ->
residual -> LN4 -> MLP2 -> LN6) in one Pallas residency.

Parity oracle is the unfused jnp math (identical to the XLA model path,
reference layers.py:108-193).  On CPU the kernel runs in interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.models import Discriminator, Generator
from druggen_tpu.ops.fused_block import (
    fused_block_edge_stream,
    jnp_block_edge_stream,
)

B, N, D, H = 3, 7, 128, 8
HID = 3 * D


def _inputs(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)

    def arr(*s, scale=0.3):
        return jnp.asarray(rng.standard_normal(s) * scale, dtype)

    q, k, v = arr(B, N, D), arr(B, N, D), arr(B, N, D)
    y = arr(B, N, N, D)
    params = (arr(D, D), arr(D), arr(D, D), arr(D),          # we be woe boe
              jnp.ones(D, dtype), arr(D, scale=0.1),         # ln4
              arr(D, HID, scale=0.1), arr(HID, scale=0.1),   # fc1
              arr(HID, D, scale=0.1), arr(D, scale=0.1),     # fc2
              jnp.ones(D, dtype), arr(D, scale=0.1))         # ln6
    return q, k, v, y, params


def test_forward_matches_oracle():
    q, k, v, y, params = _inputs()
    yo_ref, na_ref = jnp_block_edge_stream(q, k, v, y, *params, heads=H)
    yo, na = fused_block_edge_stream(q, k, v, y, *params, heads=H,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(yo), np.asarray(yo_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(na), np.asarray(na_ref),
                               atol=2e-5, rtol=2e-5)


def test_gradients_match_oracle():
    q, k, v, y, params = _inputs(1)
    args = (q, k, v, y) + params

    def loss(fn):
        def inner(*a):
            yo, na = fn(*a)
            return jnp.sum(jnp.sin(yo)) + jnp.sum(na * na)
        return inner

    g_ref = jax.grad(loss(lambda *a: jnp_block_edge_stream(*a, heads=H)),
                     argnums=tuple(range(16)))(*args)
    g_fus = jax.grad(loss(lambda *a: fused_block_edge_stream(
        *a, heads=H, interpret=True)), argnums=tuple(range(16)))(*args)
    for i, (a, b) in enumerate(zip(g_fus, g_ref)):
        ref_scale = float(jnp.abs(b).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3 * ref_scale,
            rtol=2e-3, err_msg=f"grad argnum {i}")


def test_batch_padding():
    """Batch sizes that don't divide the graph tile are zero-padded; the
    padded tail must not contaminate outputs or gradients."""
    q, k, v, y, params = _inputs(2)
    # run with B=3 (tile up to 8) vs per-sample
    yo, na = fused_block_edge_stream(q, k, v, y, *params, heads=H,
                                     interpret=True)
    for i in range(B):
        yo1, na1 = fused_block_edge_stream(
            q[i:i + 1], k[i:i + 1], v[i:i + 1], y[i:i + 1], *params,
            heads=H, interpret=True)
        np.testing.assert_allclose(np.asarray(yo[i]), np.asarray(yo1[0]),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(na[i]), np.asarray(na1[0]),
                                   atol=2e-5, rtol=2e-5)


def test_generator_block_mode_matches_plain():
    """Generator(fused_mlp='block') must match the plain XLA Generator on
    the same params (checkpoint-compatible tree, identical math)."""
    kw = dict(act="relu", vertexes=9, edges=5, nodes=8, dropout=0.0,
              dim=D, depth=2, heads=4, mlp_ratio=3)
    g0 = Generator(**kw, fused_mlp=False)
    gb = Generator(**kw, fused_mlp="block")
    ze = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 9, 5))
    zn = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 8))
    p = g0.init(jax.random.PRNGKey(2), ze, zn)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(gb.init(jax.random.PRNGKey(2),
                                                    ze, zn)))
    for a, b in zip(g0.apply(p, ze, zn), gb.apply(p, ze, zn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_full_train_step_with_block_critic():
    """One full WGAN-GP step with fused_critic='block' must match the
    plain step bit-for-bit in losses (same math, GP pass stays XLA)."""
    from druggen_tpu.config import TrainConfig
    from druggen_tpu.train.step import (
        init_state,
        make_optimizers,
        make_train_step,
    )

    m_dim, b_dim, n = 6, 4, 9
    kw = dict(act="relu", vertexes=n, edges=b_dim, nodes=m_dim, dropout=0.0,
              dim=D, depth=1, heads=4, mlp_ratio=2)
    g = Generator(**kw)
    d_plain = Discriminator(**kw)
    cfg = TrainConfig(raw_file="x", drug_raw_file="y", batch_size=4,
                      max_atom=n, dim=D, heads=4, mlp_ratio=2)
    g_opt, d_opt = make_optimizers(cfg)
    state0 = init_state(g, d_plain, g_opt, d_opt, jax.random.PRNGKey(0),
                        n, m_dim, b_dim)
    rng = np.random.default_rng(0)
    x = rng.integers(0, m_dim, (4, n)).astype(np.int8)
    a0 = np.triu(rng.integers(0, b_dim, (4, n, n)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    key = jax.random.PRNGKey(7)

    outs = {}
    for name, fused_critic in (("plain", False), ("block", "block")):
        step = make_train_step(g, d_plain, g_opt, d_opt, lambda_gp=10.0,
                               m_dim=m_dim, b_dim=b_dim, donate=False,
                               fused_critic=fused_critic)
        _, metrics, _ = step(state0, key, x, a, x, a)
        outs[name] = {k: float(v) for k, v in metrics.items()}
    assert outs["plain"]["d_loss"] == pytest.approx(
        outs["block"]["d_loss"], rel=2e-5)
    assert outs["plain"]["g_loss"] == pytest.approx(
        outs["block"]["g_loss"], rel=2e-5)


def test_gradients_multi_chunk_backward():
    """N=18 -> row chunk 9: the chunked backward (two chunks per graph,
    VMEM-bounded) must match the oracle like the single-chunk path."""
    n = 18
    rng = np.random.default_rng(4)

    def arr(*s, scale=0.2):
        return jnp.asarray(rng.standard_normal(s) * scale, jnp.float32)

    q, k, v = arr(2, n, D), arr(2, n, D), arr(2, n, D)
    y = arr(2, n, n, D)
    params = (arr(D, D), arr(D), arr(D, D), arr(D),
              jnp.ones(D), arr(D, scale=0.1),
              arr(D, HID, scale=0.1), arr(HID, scale=0.1),
              arr(HID, D, scale=0.1), arr(D, scale=0.1),
              jnp.ones(D), arr(D, scale=0.1))
    args = (q, k, v, y) + params

    def loss(fn):
        def inner(*a):
            yo, na = fn(*a)
            return jnp.sum(jnp.sin(yo)) + jnp.sum(na * na)
        return inner

    g_ref = jax.grad(loss(lambda *a: jnp_block_edge_stream(*a, heads=H)),
                     argnums=tuple(range(16)))(*args)
    g_fus = jax.grad(loss(lambda *a: fused_block_edge_stream(
        *a, heads=H, interpret=True)), argnums=tuple(range(16)))(*args)
    for i, (a, b) in enumerate(zip(g_fus, g_ref)):
        scale = float(jnp.abs(b).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3 * scale, rtol=2e-3,
                                   err_msg=f"grad argnum {i}")

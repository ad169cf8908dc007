"""Parity tests for the fused whole-generator Pallas kernel (v4) in
interpreter mode (Mosaic-compiled runs happen on real TPU; the math is
backend-identical)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.models import Generator
from druggen_tpu.ops.fused_generator import (
    extract_generator_weights,
    fused_generator_logits,
)


def _symmetric_onehot(rng, b, n, b_dim, m_dim, dtype=jnp.float32):
    lab = np.triu(rng.integers(0, b_dim, (b, n, n)), 1)
    lab = lab + lab.transpose(0, 2, 1)
    z_e = jax.nn.one_hot(lab, b_dim, dtype=dtype)
    z_n = jax.nn.one_hot(rng.integers(0, m_dim, (b, n)), m_dim, dtype=dtype)
    return z_e, z_n


def _build(n, m_dim, b_dim, dim, heads, depth):
    g = Generator(act="relu", vertexes=n, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=dim, depth=depth, heads=heads,
                  mlp_ratio=3)
    params = g.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, n, n, b_dim)), jnp.zeros((1, n, m_dim)))
    return g, params


@pytest.mark.parametrize("depth", [1, 2])
def test_parity_vs_flax(depth):
    n, m_dim, b_dim, dim, heads = 9, 12, 5, 16, 4
    g, params = _build(n, m_dim, b_dim, dim, heads, depth)
    rng = np.random.default_rng(depth)
    z_e, z_n = _symmetric_onehot(rng, 3, n, b_dim, m_dim)
    _, _, nl_ref, el_ref = g.apply(params, z_e, z_n, deterministic=True)
    nl, el = fused_generator_logits(params, z_e, z_n, heads=heads,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(nl), np.asarray(nl_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(el), np.asarray(el_ref),
                               atol=2e-5, rtol=2e-5)


def test_parity_full_config_shape():
    """Reference default shape (N=45 -> key axis padded to 48)."""
    n, m_dim, b_dim, dim, heads = 45, 12, 5, 32, 8
    g, params = _build(n, m_dim, b_dim, dim, heads, 1)
    rng = np.random.default_rng(7)
    z_e, z_n = _symmetric_onehot(rng, 2, n, b_dim, m_dim)
    _, _, nl_ref, el_ref = g.apply(params, z_e, z_n, deterministic=True)
    nl, el = fused_generator_logits(params, z_e, z_n, heads=heads,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(nl), np.asarray(nl_ref),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(el), np.asarray(el_ref),
                               atol=5e-5, rtol=5e-5)


def test_bfloat16_path():
    n, m_dim, b_dim, dim, heads = 9, 12, 5, 16, 4
    g, params = _build(n, m_dim, b_dim, dim, heads, 1)
    rng = np.random.default_rng(3)
    z_e, z_n = _symmetric_onehot(rng, 2, n, b_dim, m_dim, dtype=jnp.bfloat16)
    nl, el = fused_generator_logits(params, z_e, z_n, heads=heads,
                                    interpret=True)
    _, _, nl_ref, el_ref = g.apply(
        params, z_e.astype(jnp.float32), z_n.astype(jnp.float32),
        deterministic=True)
    assert nl.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(nl, dtype=np.float32),
                               np.asarray(nl_ref), atol=0.15, rtol=0.15)
    np.testing.assert_allclose(np.asarray(el, dtype=np.float32),
                               np.asarray(el_ref), atol=0.15, rtol=0.15)


def test_debug_rejects_asymmetric():
    n, m_dim, b_dim, dim, heads = 9, 12, 5, 16, 4
    _, params = _build(n, m_dim, b_dim, dim, heads, 1)
    rng = np.random.default_rng(5)
    z_e, z_n = _symmetric_onehot(rng, 1, n, b_dim, m_dim)
    z_e = z_e.at[0, 0, 1, :].set(z_e[0, 0, 1, ::-1])  # break symmetry
    with pytest.raises(AssertionError):
        fused_generator_logits(params, z_e, z_n, heads=heads,
                               interpret=True, debug=True)


def test_extract_weights_depth():
    _, params = _build(9, 12, 5, 16, 4, 2)
    ws, depth = extract_generator_weights(params)
    assert depth == 2
    # stacked block weights carry the depth axis
    assert ws[8].shape[0] == 2

"""scan_layers: lax.scan over stacked encoder blocks must be numerically
identical to the unrolled stack (same math, different param layout), must
support the WGAN-GP double-backward, and must compose with remat.

The unrolled TransformerEncoder mirrors reference layers.py:195-234; scan
is a TPU-native compile-time optimization with no reference analogue."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.config import TrainConfig
from druggen_tpu.models import Generator, Discriminator
from druggen_tpu.models.layers import (
    TransformerEncoder,
    stack_block_params,
    unstack_block_params,
)
from druggen_tpu.train.step import (
    init_state,
    make_optimizers,
    make_train_step,
)

B, N, DIM, HEADS, DEPTH = 2, 7, 16, 4, 3


def _encoders(**kw):
    common = dict(dim=DIM, depth=DEPTH, heads=HEADS, mlp_ratio=2, **kw)
    return (TransformerEncoder(**common, scan_layers=False),
            TransformerEncoder(**common, scan_layers=True))


def test_scan_layers_matches_unrolled():
    unrolled, scanned = _encoders()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM))
    y = jax.random.normal(jax.random.PRNGKey(2), (B, N, N, DIM))
    p_unrolled = unrolled.init(key, x, y)
    p_scan = jax.tree_util.tree_map(
        jnp.asarray, stack_block_params(p_unrolled))

    out_u = unrolled.apply(p_unrolled, x, y)
    out_s = scanned.apply(p_scan, x, y)
    for a, b in zip(out_u, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_stack_unstack_roundtrip():
    unrolled, scanned = _encoders()
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM))
    y = jax.random.normal(jax.random.PRNGKey(2), (B, N, N, DIM))
    p_scan = scanned.init(jax.random.PRNGKey(3), x, y)
    back = stack_block_params(unstack_block_params(p_scan))
    for pa, pb in zip(jax.tree_util.tree_leaves(p_scan),
                      jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    # and the unstacked layout drives the unrolled encoder to the same output
    out_s = scanned.apply(p_scan, x, y)
    out_u = unrolled.apply(jax.tree_util.tree_map(
        jnp.asarray, unstack_block_params(p_scan)), x, y)
    for a, b in zip(out_s, out_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_scan_layers_full_train_step(remat):
    """Full WGAN-GP step (double backward through the scanned stack)."""
    m_dim, b_dim = 5, 4
    kw = dict(act="relu", vertexes=N, edges=b_dim, nodes=m_dim, dropout=0.0,
              dim=DIM, depth=DEPTH, heads=HEADS, mlp_ratio=2,
              scan_layers=True, remat=remat)
    g, d = Generator(**kw), Discriminator(**kw)
    cfg = TrainConfig(raw_file="x.smi", drug_raw_file="y.smi", batch_size=B,
                      max_atom=N, dim=DIM, heads=HEADS, mlp_ratio=2)
    g_opt, d_opt = make_optimizers(cfg)
    state = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(0), N, m_dim,
                       b_dim)
    step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=m_dim,
                           b_dim=b_dim, submodel="DrugGEN", donate=False)
    rng = np.random.default_rng(0)
    x = rng.integers(0, m_dim, (B, N)).astype(np.int8)
    a0 = np.triu(rng.integers(0, b_dim, (B, N, N)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    st, metrics, _ = step(state, jax.random.PRNGKey(5), x, a, x, a)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(p0), np.asarray(p1))
        for p0, p1 in zip(jax.tree_util.tree_leaves(state.g_params),
                          jax.tree_util.tree_leaves(st.g_params)))
    assert moved


def test_scan_layers_dropout_distinct_masks():
    """split_rngs must give each scanned layer its own dropout mask: two
    different-depth stacks from the same key should diverge (smoke: the
    forward runs and is finite under dropout)."""
    unrolled, scanned = _encoders(drop_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM))
    y = jax.random.normal(jax.random.PRNGKey(2), (B, N, N, DIM))
    p = scanned.init(jax.random.PRNGKey(3), x, y)
    out = scanned.apply(p, x, y, False,
                        rngs={"dropout": jax.random.PRNGKey(4)})
    for t in out:
        assert np.isfinite(np.asarray(t)).all()


def test_generator_checkpoint_layout_conversion():
    """A full Generator checkpoint saved by the unrolled model must drive
    the scan_layers model to identical outputs after stack_block_params
    (checkpoint compatibility across layouts)."""
    m_dim, b_dim = 5, 4
    kw = dict(act="relu", vertexes=N, edges=b_dim, nodes=m_dim, dropout=0.0,
              dim=DIM, depth=DEPTH, heads=HEADS, mlp_ratio=2)
    g_unrolled = Generator(**kw, scan_layers=False)
    g_scan = Generator(**kw, scan_layers=True)
    z_e = jax.random.normal(jax.random.PRNGKey(0), (B, N, N, b_dim))
    z_n = jax.random.normal(jax.random.PRNGKey(1), (B, N, m_dim))
    p = g_unrolled.init(jax.random.PRNGKey(2), z_e, z_n)
    p_scan = jax.tree_util.tree_map(jnp.asarray, stack_block_params(p))
    out_u = g_unrolled.apply(p, z_e, z_n)
    out_s = g_scan.apply(p_scan, z_e, z_n)
    for a, b in zip(out_u, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_load_params_auto_cross_layout(tmp_path):
    """A scan_layers checkpoint on disk must load into an unrolled template
    (and vice versa) via checkpoint.load_params_auto — the inference engine
    relies on this when a --scan_layers training run exports G."""
    from druggen_tpu.train import checkpoint as ckpt

    m_dim, b_dim = 5, 4
    kw = dict(act="relu", vertexes=N, edges=b_dim, nodes=m_dim, dropout=0.0,
              dim=DIM, depth=DEPTH, heads=HEADS, mlp_ratio=2)
    g_unrolled = Generator(**kw, scan_layers=False)
    g_scan = Generator(**kw, scan_layers=True)
    z_e = jax.random.normal(jax.random.PRNGKey(0), (B, N, N, b_dim))
    z_n = jax.random.normal(jax.random.PRNGKey(1), (B, N, m_dim))
    p = g_unrolled.init(jax.random.PRNGKey(2), z_e, z_n)
    p_scan = jax.tree_util.tree_map(jnp.asarray, stack_block_params(p))

    # scan-trained ckpt -> unrolled template
    path = str(tmp_path / "scan-G.ckpt")
    ckpt.save_params(path, p_scan)
    loaded = ckpt.load_params_auto(path, p)
    out_ref = g_unrolled.apply(p, z_e, z_n)
    out_loaded = g_unrolled.apply(loaded, z_e, z_n)
    for a, b in zip(out_ref, out_loaded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)

    # unrolled ckpt -> scan template
    path2 = str(tmp_path / "unrolled-G.ckpt")
    ckpt.save_params(path2, p)
    loaded2 = ckpt.load_params_auto(path2, p_scan)
    out_s = g_scan.apply(loaded2, z_e, z_n)
    for a, b in zip(out_ref, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_share_fake_explicit_with_dropout_raises():
    """Explicit share_fake=True + generator dropout > 0 must be rejected
    (the reference redraws dropout masks on the G-step forward)."""
    m_dim, b_dim = 5, 4
    kw = dict(act="relu", vertexes=N, edges=b_dim, nodes=m_dim,
              dim=DIM, depth=1, heads=HEADS, mlp_ratio=2)
    g = Generator(**kw, dropout=0.1)
    d = Discriminator(**kw, dropout=0.0)
    cfg = TrainConfig(raw_file="x", drug_raw_file="y", batch_size=B,
                      max_atom=N, dim=DIM, heads=HEADS, mlp_ratio=2)
    g_opt, d_opt = make_optimizers(cfg)
    with pytest.raises(ValueError, match="share_fake"):
        make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=m_dim,
                        b_dim=b_dim, share_fake=True)

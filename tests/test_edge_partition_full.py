"""Full-model edge-partitioned training parity (VERDICT round-1 item 2).

The complete WGAN-GP step under shard_map on a ('data','node') mesh must
match the single-device step: losses, updated parameters, and emitted
logits — proving the giant-batch mode is a real training capability, not an
attention-core demo.  Runs on the 8 virtual CPU devices (conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.models import Discriminator, Generator
from druggen_tpu.parallel.edge_partition import (
    make_edge_mesh,
    make_sharded_train_step,
    shard_train_inputs,
)
from druggen_tpu.train.step import init_state, make_train_step
import optax

# N divisible by the node axis (4); the product path pads the dataset when
# vertexes % node_k != 0 (see Trainer).
B, N, M_DIM, B_DIM = 8, 8, 5, 4
DIM, HEADS, DEPTH, MLP_RATIO = 16, 4, 2, 2


class _Cfg:
    g_lr = d_lr = 1e-3
    beta1, beta2 = 0.9, 0.999
    adam_weight_decay = 0.01


def _models(**kw):
    common = dict(act="relu", vertexes=N, edges=B_DIM, nodes=M_DIM,
                  dropout=0.0, dim=DIM, depth=DEPTH, heads=HEADS,
                  mlp_ratio=MLP_RATIO)
    return (Generator(**common, **kw), Discriminator(**common, **kw))


def _batch(seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, M_DIM, size=(B, N), dtype=np.int32)
    a = rng.integers(0, B_DIM, size=(B, N, N), dtype=np.int32)
    a = np.minimum(a, a.transpose(0, 2, 1))  # symmetric like real data
    return x, a


@pytest.mark.parametrize("submodel", ["DrugGEN", "NoTarget"])
def test_sharded_step_matches_single_device(submodel):
    """3-step training trajectory parity.

    SGD optimizers isolate numerical equivalence: with Adam the FIRST
    update is ±lr elementwise (m̂/√v̂ = sign(g) at step 1), so ~1e-8
    reduction-order noise on near-zero gradient elements flips update
    signs — inherent f32 behavior, not a sharding bug (losses still match
    to 1e-6 under AdamW; verified while writing this test).  SGD updates
    are ∝ grad, keeping the trajectories tight."""
    g_model, d_model = _models()
    g_opt = optax.sgd(1e-2)
    d_opt = optax.sgd(1e-2)
    key = jax.random.PRNGKey(3)
    state0 = init_state(g_model, d_model, g_opt, d_opt,
                        jax.random.PRNGKey(1), N, M_DIM, B_DIM)

    step_ref = make_train_step(g_model, d_model, g_opt, d_opt,
                               lambda_gp=10.0, m_dim=M_DIM, b_dim=B_DIM,
                               submodel=submodel, donate=False)

    mesh = make_edge_mesh(2, 4)
    step_sh = make_sharded_train_step(g_model, d_model, g_opt, d_opt, mesh,
                                      lambda_gp=10.0, m_dim=M_DIM,
                                      b_dim=B_DIM, submodel=submodel,
                                      donate=False)

    state_a, state_b = state0, state0
    for i in range(3):
        x, a = _batch(10 + i)
        dx, da = _batch(100 + i)
        state_a, m_a, (nl_a, el_a) = step_ref(state_a, key, x, a, dx, da)
        xs, as_, dxs, das = shard_train_inputs(mesh, x, a, dx, da)
        state_b, m_b, (nl_b, el_b) = step_sh(state_b, key, xs, as_, dxs, das)

        np.testing.assert_allclose(float(m_a["d_loss"]),
                                   float(m_b["d_loss"]), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(float(m_a["g_loss"]),
                                   float(m_b["g_loss"]), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(nl_b), np.asarray(nl_a),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(el_b), np.asarray(el_a),
                                   rtol=1e-4, atol=1e-5)

    # parameters after 3 full updates agree
    for pa, pb in zip(jax.tree_util.tree_leaves(state_a.g_params),
                      jax.tree_util.tree_leaves(state_b.g_params)):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                                   rtol=1e-4, atol=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(state_a.d_params),
                      jax.tree_util.tree_leaves(state_b.d_params)):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_step_adamw_losses_match():
    """Under the product AdamW optimizers, per-step losses still match the
    single-device step tightly (trajectory-level sign noise documented in
    the SGD test above)."""
    from druggen_tpu.train.step import make_optimizers

    g_model, d_model = _models()
    g_opt, d_opt = make_optimizers(_Cfg())
    key = jax.random.PRNGKey(3)
    state0 = init_state(g_model, d_model, g_opt, d_opt,
                        jax.random.PRNGKey(1), N, M_DIM, B_DIM)
    step_ref = make_train_step(g_model, d_model, g_opt, d_opt,
                               lambda_gp=10.0, m_dim=M_DIM, b_dim=B_DIM,
                               donate=False)
    mesh = make_edge_mesh(2, 4)
    step_sh = make_sharded_train_step(g_model, d_model, g_opt, d_opt, mesh,
                                      lambda_gp=10.0, m_dim=M_DIM,
                                      b_dim=B_DIM, donate=False)
    state_a, state_b = state0, state0
    for i in range(2):
        x, a = _batch(10 + i)
        dx, da = _batch(100 + i)
        state_a, m_a, _ = step_ref(state_a, key, x, a, dx, da)
        xs, as_, dxs, das = shard_train_inputs(mesh, x, a, dx, da)
        state_b, m_b, _ = step_sh(state_b, key, xs, as_, dxs, das)
        np.testing.assert_allclose(float(m_a["d_loss"]),
                                   float(m_b["d_loss"]), rtol=1e-5,
                                   atol=2e-6)
        np.testing.assert_allclose(float(m_a["g_loss"]),
                                   float(m_b["g_loss"]), rtol=1e-5,
                                   atol=2e-6)


def test_sharded_step_composes_with_scan_and_remat():
    """scan_layers + remat inside the sharded step (the deep-config
    combination) still matches the plain single-device step."""
    from druggen_tpu.models.layers import stack_block_params
    from druggen_tpu.train.step import make_optimizers

    g_plain, d_plain = _models()
    g_scan, d_scan = _models(scan_layers=True, remat=True)
    g_opt, d_opt = make_optimizers(_Cfg())
    key = jax.random.PRNGKey(5)
    state0 = init_state(g_plain, d_plain, g_opt, d_opt,
                        jax.random.PRNGKey(2), N, M_DIM, B_DIM)
    # convert the unrolled init to the scan layout for the scan models
    state_scan = state0._replace(
        g_params=jax.tree_util.tree_map(
            jnp.asarray, stack_block_params(jax.device_get(state0.g_params))),
        d_params=jax.tree_util.tree_map(
            jnp.asarray, stack_block_params(jax.device_get(state0.d_params))),
        g_opt_state=g_opt.init(stack_block_params(
            jax.device_get(state0.g_params))),
        d_opt_state=d_opt.init(stack_block_params(
            jax.device_get(state0.d_params))))

    step_ref = make_train_step(g_plain, d_plain, g_opt, d_opt,
                               lambda_gp=10.0, m_dim=M_DIM, b_dim=B_DIM,
                               donate=False)
    mesh = make_edge_mesh(2, 4)
    step_sh = make_sharded_train_step(g_scan, d_scan, g_opt, d_opt, mesh,
                                      lambda_gp=10.0, m_dim=M_DIM,
                                      b_dim=B_DIM, donate=False)

    x, a = _batch(50)
    dx, da = _batch(51)
    _, m_a, _ = step_ref(state0, key, x, a, dx, da)
    xs, as_, dxs, das = shard_train_inputs(mesh, x, a, dx, da)
    _, m_b, _ = step_sh(state_scan, key, xs, as_, dxs, das)
    np.testing.assert_allclose(float(m_a["d_loss"]), float(m_b["d_loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m_a["g_loss"]), float(m_b["g_loss"]),
                               rtol=1e-5, atol=1e-6)


def _assemble_from_host_slices(mesh, spec, host_arrays):
    """Emulate multi-host global-batch assembly on a single process.

    ``host_arrays`` is one equal batch-axis slice per simulated host.  Each
    mesh device gets exactly the shard it would receive from
    ``jax.make_array_from_process_local_data`` on a real multi-host run
    (host-major device order, whole 'data' rows per host): we look up the
    device's global index slices, map the batch slice into the owning
    host's local array, and build the global array from the single-device
    shards."""
    from jax.sharding import NamedSharding

    per_host = host_arrays[0].shape[0]
    global_shape = (per_host * len(host_arrays),) + host_arrays[0].shape[1:]
    sh = NamedSharding(mesh, spec)
    shards = []
    for dev, idx in sh.devices_indices_map(global_shape).items():
        b_sl = idx[0]
        host = b_sl.start // per_host
        assert b_sl.stop <= (host + 1) * per_host, \
            "'data' row straddles simulated hosts — layout bug"
        local_sl = (slice(b_sl.start - host * per_host,
                          b_sl.stop - host * per_host),) + idx[1:]
        shards.append(jax.device_put(host_arrays[host][local_sl], dev))
    return jax.make_array_from_single_device_arrays(global_shape, sh, shards)


def test_sharded_step_from_simulated_host_slices():
    """Multi-host x mesh_node composition (round-3 VERDICT item 8): the
    full WGAN-GP sharded step fed by per-host batch slices — assembled
    exactly as jax.make_array_from_process_local_data would on 2 hosts x
    (2 data x 2 node) devices each — matches the single-device step on the
    concatenated global batch."""
    from jax.sharding import PartitionSpec as P

    g_model, d_model = _models()
    g_opt = optax.sgd(1e-2)
    d_opt = optax.sgd(1e-2)
    key = jax.random.PRNGKey(3)
    state0 = init_state(g_model, d_model, g_opt, d_opt,
                        jax.random.PRNGKey(1), N, M_DIM, B_DIM)
    step_ref = make_train_step(g_model, d_model, g_opt, d_opt,
                               lambda_gp=10.0, m_dim=M_DIM, b_dim=B_DIM,
                               donate=False)
    mesh = make_edge_mesh(4, 2)  # 2 simulated hosts x 2 data rows each
    step_sh = make_sharded_train_step(g_model, d_model, g_opt, d_opt, mesh,
                                      lambda_gp=10.0, m_dim=M_DIM,
                                      b_dim=B_DIM, donate=False)

    x, a = _batch(10)
    dx, da = _batch(100)
    # per-host BatchIterator shards: host h sees rows [h*B/2, (h+1)*B/2)
    half = B // 2
    spec_x, spec_a = P("data", "node"), P("data", "node", None)
    xs = _assemble_from_host_slices(mesh, spec_x, [x[:half], x[half:]])
    as_ = _assemble_from_host_slices(mesh, spec_a, [a[:half], a[half:]])
    dxs = _assemble_from_host_slices(mesh, spec_x, [dx[:half], dx[half:]])
    das = _assemble_from_host_slices(mesh, spec_a, [da[:half], da[half:]])

    _, m_a, (nl_a, el_a) = step_ref(state0, key, x, a, dx, da)
    _, m_b, (nl_b, el_b) = step_sh(state0, key, xs, as_, dxs, das)
    np.testing.assert_allclose(float(m_a["d_loss"]), float(m_b["d_loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m_a["g_loss"]), float(m_b["g_loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nl_b), np.asarray(nl_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(el_b), np.asarray(el_a),
                               rtol=1e-4, atol=1e-5)


def test_batch_iterator_host_shards_cover_global_batch():
    """The union of per-host BatchIterator batches is a disjoint cover of
    the epoch permutation — the multi-host feeding contract the sharded
    step relies on."""
    from druggen_tpu.data.dataset import BatchIterator, GraphData

    m = 32
    rng = np.random.default_rng(0)
    x = rng.integers(0, M_DIM, size=(m, N)).astype(np.int8)
    x[:, 0] = np.arange(m)  # row identity in column 0
    data = GraphData(x=x,
                     a=rng.integers(0, B_DIM, size=(m, N, N)).astype(np.int8),
                     smiles=[f"s{i}" for i in range(m)], vocab=None,
                     max_atom=N)
    its = [BatchIterator(data, batch_size=4, seed=7, host_id=h, num_hosts=2)
           for h in range(2)]
    seen = []
    for it in its:
        for x_b, _a_b in it.epoch_batches(0):
            seen.extend(x_b[:, 0].tolist())
    # 2 hosts x (16//4)=4 batches x 4 rows = 32 rows, disjoint cover
    assert sorted(seen) == list(range(m))
    """The node-sharded Generator forward inside shard_map equals the
    unsharded apply (logits reassembled from shards)."""
    from jax.sharding import PartitionSpec as P

    g_model, _ = _models()
    g_sh = g_model.clone(node_axis="node")
    z_e = np.random.default_rng(0).normal(
        size=(B, N, N, B_DIM)).astype(np.float32)
    z_n = np.random.default_rng(1).normal(
        size=(B, N, M_DIM)).astype(np.float32)
    variables = g_model.init(jax.random.PRNGKey(0), jnp.asarray(z_e),
                             jnp.asarray(z_n))
    ref = g_model.apply(variables, jnp.asarray(z_e), jnp.asarray(z_n))

    mesh = make_edge_mesh(2, 4)
    fn = jax.shard_map(
        lambda e, n: g_sh.apply(variables, e, n),
        mesh=mesh,
        in_specs=(P("data", "node", None, None), P("data", "node", None)),
        out_specs=(P("data", "node", None), P("data", "node", None, None),
                   P("data", "node", None), P("data", "node", None, None)))
    from jax.sharding import NamedSharding

    e_sh = jax.device_put(z_e, NamedSharding(mesh, P("data", "node", None,
                                                     None)))
    n_sh = jax.device_put(z_n, NamedSharding(mesh, P("data", "node", None)))
    outs = fn(e_sh, n_sh)
    for o_sh, o_ref in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(o_sh), np.asarray(o_ref),
                                   rtol=1e-5, atol=1e-6)

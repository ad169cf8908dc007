"""Numerics-ladder tests (round 5).

Covers: the ``f32_stats`` model flag (f32 LayerNorm/softmax reductions —
the bf16-forward escalation tier), per-tier step builders including the
round-4 ADVICE crash (make_multi_step had no gp_f32 parameter), the
trainer's multi-tier escalation, gp_f32 on the edge-partitioned sharded
step, and guarded/unguarded optimizer-state checkpoint migration.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.data.corpus import (
    DRUGLIKE_SMILES,
    TARGET_SMILES,
    write_corpus,
)


def _small_models(dim=16, n=9, m_dim=5, b_dim=4, heads=2, dtype=jnp.bfloat16,
                  **kw):
    from druggen_tpu.models import Discriminator, Generator

    common = dict(act="relu", vertexes=n, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=dim, depth=1, heads=heads, mlp_ratio=2,
                  dtype=dtype)
    common.update(kw)
    return Generator(**common), Discriminator(**common)


def test_f32_stats_forward_close_to_bf16():
    """The f32-reduction model computes the same function (small numeric
    drift only) and exposes the identical parameter tree."""
    n, m_dim, b_dim = 9, 5, 4
    G, _ = _small_models()
    G32, _ = _small_models(f32_stats=True)
    key = jax.random.PRNGKey(0)
    e = jax.random.uniform(key, (2, n, n, b_dim))
    x = jax.random.uniform(jax.random.fold_in(key, 1), (2, n, m_dim))
    params = G.init(jax.random.PRNGKey(7), e, x)
    out = G.apply(params, e, x)
    out32 = G32.apply(params, e, x)   # same params: tree is identical
    for a, b in zip(out, out32):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.05, rtol=0.05)
    # and the f32 variant's LN/softmax really ran in f32: outputs finite
    assert all(np.isfinite(np.asarray(o, np.float32)).all() for o in out32)


@pytest.mark.parametrize("builder_kwargs", [
    dict(gp_f32=True),
    dict(f32_stats=True),
    dict(gp_f32=True, f32_stats=True),
])
def test_train_step_tiers_run(builder_kwargs):
    from druggen_tpu.train.step import (
        init_state,
        make_optimizers,
        make_train_step,
    )

    class Cfg:
        g_lr = d_lr = 1e-3
        beta1, beta2 = 0.9, 0.999
        adam_weight_decay = 0.0
        nonfinite_guard = True

    n, m_dim, b_dim = 9, 5, 4
    G, D = _small_models()
    g_opt, d_opt = make_optimizers(Cfg)
    state = init_state(G, D, g_opt, d_opt, jax.random.PRNGKey(0), n, m_dim,
                      b_dim)
    step = make_train_step(G, D, g_opt, d_opt, lambda_gp=10.0, m_dim=m_dim,
                           b_dim=b_dim, compute_dtype=jnp.bfloat16,
                           donate=False, **builder_kwargs)
    x = jnp.zeros((4, n), jnp.int32)
    a = jnp.zeros((4, n, n), jnp.int32)
    new_state, metrics, _ = step(state, jax.random.PRNGKey(1), x, a, x, a)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert int(new_state.step) == 1


def test_multi_step_accepts_gp_f32():
    """ADVICE r4 (high): --steps_per_dispatch > 1 crashed with TypeError
    because make_multi_step had no gp_f32 parameter."""
    from druggen_tpu.train.step import (
        init_state,
        make_multi_step,
        make_optimizers,
    )

    class Cfg:
        g_lr = d_lr = 1e-3
        beta1, beta2 = 0.9, 0.999
        adam_weight_decay = 0.0
        nonfinite_guard = True

    n, m_dim, b_dim = 9, 5, 4
    G, D = _small_models()
    g_opt, d_opt = make_optimizers(Cfg)
    state = init_state(G, D, g_opt, d_opt, jax.random.PRNGKey(0), n, m_dim,
                      b_dim)
    multi = make_multi_step(G, D, g_opt, d_opt, lambda_gp=10.0, m_dim=m_dim,
                            b_dim=b_dim, compute_dtype=jnp.bfloat16,
                            donate=False, gp_f32=True, f32_stats=True)
    K = 2
    xs = jnp.zeros((K, 4, n), jnp.int32)
    as_ = jnp.zeros((K, 4, n, n), jnp.int32)
    new_state, metrics, _ = multi(state, jax.random.PRNGKey(1), xs, as_, xs,
                                  as_)
    assert metrics["d_loss"].shape == (K,)
    assert int(new_state.step) == K


def test_sharded_step_gp_f32_matches_unsharded():
    """ADVICE r4 (medium): the edge-partitioned step silently dropped
    gp_f32.  Now it threads it; values still match the single-device
    gp_f32 step (both compute the GP chain in f32)."""
    from jax.sharding import Mesh

    from druggen_tpu.parallel.edge_partition import (
        make_edge_mesh,
        make_sharded_train_step,
        shard_train_inputs,
    )
    from druggen_tpu.train.step import (
        init_state,
        make_optimizers,
        make_train_step,
    )

    class Cfg:
        g_lr = d_lr = 1e-3
        beta1, beta2 = 0.9, 0.999
        adam_weight_decay = 0.0
        nonfinite_guard = True

    n, m_dim, b_dim = 8, 5, 4
    G, D = _small_models(n=n, dtype=jnp.bfloat16)
    g_opt, d_opt = make_optimizers(Cfg)
    state = init_state(G, D, g_opt, d_opt, jax.random.PRNGKey(0), n, m_dim,
                      b_dim)
    mesh = make_edge_mesh(2, 2)
    sh_step = make_sharded_train_step(G, D, g_opt, d_opt, mesh,
                                      lambda_gp=10.0, m_dim=m_dim,
                                      b_dim=b_dim,
                                      compute_dtype=jnp.bfloat16,
                                      donate=False, gp_f32=True)
    ref_step = make_train_step(G, D, g_opt, d_opt, lambda_gp=10.0,
                               m_dim=m_dim, b_dim=b_dim,
                               compute_dtype=jnp.bfloat16, donate=False,
                               gp_f32=True, share_fake=False)
    rng = np.random.default_rng(0)
    x = rng.integers(0, m_dim, (4, n)).astype(np.int32)
    a_sym = rng.integers(0, b_dim, (4, n, n))
    a = np.triu(a_sym) + np.triu(a_sym, 1).transpose(0, 2, 1)
    a = a.astype(np.int32)
    key = jax.random.PRNGKey(3)
    _, m_ref, _ = ref_step(state, key, x, a, x, a)
    xs, as_, dxs, das = shard_train_inputs(mesh, x, a, x, a)
    _, m_sh, _ = sh_step(state, key, xs, as_, dxs, das)
    np.testing.assert_allclose(float(m_ref["d_loss"]),
                               float(m_sh["d_loss"]), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(float(m_ref["g_loss"]),
                               float(m_sh["g_loss"]), rtol=2e-2, atol=2e-2)


def test_trainer_ladder_escalation(tmp_path):
    """Trainer escalates tier by tier through gp_f32 -> f32_stats -> full
    f32, each against the same state object, and the step keeps running."""
    from druggen_tpu.config import parse_train_args
    from druggen_tpu.train.trainer import Trainer

    write_corpus(str(tmp_path / "chembl.smi"), DRUGLIKE_SMILES)
    write_corpus(str(tmp_path / "drugs.smi"), TARGET_SMILES)
    cfg = parse_train_args([
        "--raw_file", str(tmp_path / "chembl.smi"),
        "--drug_raw_file", str(tmp_path / "drugs.smi"),
        "--submodel", "DrugGEN", "--max_atom", "25", "--dim", "16",
        "--heads", "2", "--batch_size", "8", "--epoch", "1",
        "--compute_dtype", "bf16",
        "--mol_data_dir", str(tmp_path / "c"),
        "--drug_data_dir", str(tmp_path / "cd"),
        "--log_dir", str(tmp_path / "l"),
        "--sample_dir", str(tmp_path / "s"),
        "--model_save_dir", str(tmp_path / "m"),
        "--set_seed", "--seed", "7", "--exp_name", "ladder"])
    assert cfg.gp_f32 == "auto" and cfg.f32_stats == "auto"
    tr = Trainer(cfg)
    assert tr._numerics_tier == 0 and tr._ladder == [1, 2, 3]
    assert tr._gp_escalation_armed
    x = jnp.zeros((8, 25), jnp.int8)
    a = jnp.zeros((8, 25, 25), jnp.int8)
    for expect_tier in (1, 2, 3):
        st, m, _ = tr.step_fn(tr.state, tr.key, x, a, x, a)
        tr.state = st
        tr._escalate_numerics()
        assert tr._numerics_tier == expect_tier
    assert not tr._ladder and not tr._gp_escalation_armed
    st, m, _ = tr.step_fn(tr.state, tr.key, x, a, x, a)
    assert np.isfinite(float(m["d_loss"]))
    # past the last tier: warns once, does not raise
    tr._escalate_numerics()
    assert tr._ladder_exhausted_warned


def test_trainer_tier_config_parsing(tmp_path):
    from druggen_tpu.config import parse_train_args

    for flag, field in (("--gp_f32", "gp_f32"), ("--f32_stats", "f32_stats"),
                        ("--f32_full", "f32_full")):
        for v in ("on", "off", "auto"):
            c = parse_train_args(["--raw_file", "x.smi",
                                  "--submodel", "NoTarget", flag, v])
            assert getattr(c, field) == v


def test_checkpoint_guard_migration(tmp_path):
    """Round-4 ADVICE (low): guarded (AllFiniteState) and unguarded
    checkpoints migrate into each other's optimizer-state layout instead
    of failing with an opaque structure error."""
    from druggen_tpu.train import checkpoint as ckpt
    from druggen_tpu.train.step import init_state, make_optimizers

    class CfgG:
        g_lr = d_lr = 1e-3
        beta1, beta2 = 0.9, 0.999
        adam_weight_decay = 0.0
        nonfinite_guard = True

    class CfgU(CfgG):
        nonfinite_guard = False

    n, m_dim, b_dim = 9, 5, 4
    G, D = _small_models()
    go_g, do_g = make_optimizers(CfgG)
    go_u, do_u = make_optimizers(CfgU)
    s_guard = init_state(G, D, go_g, do_g, jax.random.PRNGKey(0), n, m_dim,
                         b_dim)
    s_plain = init_state(G, D, go_u, do_u, jax.random.PRNGKey(0), n, m_dim,
                         b_dim)

    d = str(tmp_path / "m1")
    os.makedirs(d)
    ckpt.save_state(d, s_plain)           # old-era (unguarded) checkpoint
    restored = ckpt.restore_state(d, s_guard)
    assert restored is not None
    assert int(restored.g_opt_state.notfinite_count) == 0

    d2 = str(tmp_path / "m2")
    os.makedirs(d2)
    ckpt.save_state(d2, s_guard)          # guarded checkpoint, unguarded run
    restored2 = ckpt.restore_state(d2, s_plain)
    assert restored2 is not None
    # inner Adam moments survived the unwrap
    flat = jax.tree_util.tree_leaves(restored2.g_opt_state)
    assert len(flat) == len(jax.tree_util.tree_leaves(s_plain.g_opt_state))


def test_engine_stagnation_guard(tmp_path, monkeypatch):
    """With the unlimited default, a dead generator stops via the
    stagnation guard instead of looping forever (and a max_batches cap
    still applies when given, for the screening path)."""
    from druggen_tpu.config import InferenceConfig
    from druggen_tpu.infer.engine import InferenceEngine

    write_corpus(str(tmp_path / "chembl.smi"), DRUGLIKE_SMILES)
    write_corpus(str(tmp_path / "drugs.smi"), TARGET_SMILES)
    cfg = InferenceConfig(
        inference_model=str(tmp_path), sample_num=16,
        inf_smiles=str(tmp_path / "chembl.smi"),
        train_smiles=str(tmp_path / "chembl.smi"),
        train_drug_smiles=str(tmp_path / "drugs.smi"),
        mol_data_dir=str(tmp_path / "c"),
        inf_batch_size=4, dim=16, depth=1, heads=2, mlp_ratio=2,
        max_atom=25, compute_dtype="float32", set_seed=True, seed=1)
    eng = InferenceEngine(cfg, g_params="__pending__")
    template = eng.G.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, eng.vertexes, eng.vertexes, eng.b_dim)),
        jnp.zeros((1, eng.vertexes, eng.m_dim)))
    eng.g_params = template

    calls = {"n": 0}
    real_x = np.asarray(eng.data.x[:4], np.int32)
    real_a = np.asarray(eng.data.a[:4], np.int32)

    def stuck_forward(params, a_labels, x_labels):
        calls["n"] += 1
        return real_x, real_a

    # decode succeeds only for the first batch: a generator that stalls
    # at 4/16 valid (the failure mode behind the round-4 9,800/10,000 set)
    import druggen_tpu.infer.engine as engine_mod

    real_decode = engine_mod.matrices_to_mol

    def flaky_decode(x, a, vocab, strict=False):
        if calls["n"] <= 1 and not strict:
            return real_decode(x, a, vocab, strict=strict)
        return None

    eng._forward = stuck_forward
    monkeypatch.setattr(engine_mod, "matrices_to_mol", flaky_decode)
    kept, decoded, _, _ = eng.sample(sample_num=16)
    assert 0 < len(kept) < 16
    assert calls["n"] >= 200          # ran until the stagnation guard
    calls["n"] = -10**9               # decode "succeeds" again
    kept, decoded, _, _ = eng.sample(sample_num=16, max_batches=3)
    assert len(decoded) == 12         # explicit 3-batch cap still respected

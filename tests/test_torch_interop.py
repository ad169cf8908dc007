"""Activation parity against the ACTUAL reference torch modules.

VERDICT.md round-1 item 1: round-1 parity rested on NumPy re-derivations
written by the same author — a correlated-error risk on exactly the quirky
math (element-wise q*k, per-channel softmax, ``(e+1)*e``) the project hinges
on.  These tests import the reference's own ``src/model`` modules from
``/root/reference`` (torch is installed), randomly initialize them, convert
the weights with :mod:`druggen_tpu.interop.torch_ckpt`, and assert per-layer
and end-to-end allclose — plus WGAN-GP loss-value parity with identical
interpolation draws.

Reference: /root/reference/src/model/layers.py:56-234, models.py:5-269,
loss.py:4-85.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from druggen_tpu.interop import torch_ckpt as tc  # noqa: E402
from druggen_tpu.models.layers import EncoderBlock, GraphMHA  # noqa: E402
from druggen_tpu.models.models import (  # noqa: E402
    Discriminator,
    Generator,
    SimpleDisc,
)
from druggen_tpu.train import losses  # noqa: E402

REFERENCE = "/root/reference"

# Small-but-nontrivial config: depth 2 exercises block indexing, heads 4
# exercises the per-head reshape, mlp_ratio 3 matches the reference default.
DIM, HEADS, DEPTH, MLP_RATIO = 32, 4, 2, 3
B, N, M_DIM, B_DIM = 3, 9, 8, 5


@pytest.fixture(scope="module")
def ref():
    """Import the reference's own torch modules."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if not os.path.isdir(os.path.join(REFERENCE, "src", "model")):
        pytest.skip("reference checkout not available")
    from src.model import layers as ref_layers
    from src.model import loss as ref_loss
    from src.model import models as ref_models

    return ref_layers, ref_models, ref_loss


def _rand_inputs(seed=0):
    rng = np.random.default_rng(seed)
    z_n = rng.normal(size=(B, N, M_DIM)).astype(np.float32)
    z_e = rng.normal(size=(B, N, N, B_DIM)).astype(np.float32)
    return z_e, z_n


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# per-layer parity
# ---------------------------------------------------------------------------

def test_mha_parity(ref):
    ref_layers, _, _ = ref
    torch.manual_seed(0)
    mha_t = ref_layers.MHA(DIM, HEADS).eval()
    variables = tc.torch_mha_to_flax(mha_t.state_dict())

    rng = np.random.default_rng(1)
    node = rng.normal(size=(B, N, DIM)).astype(np.float32)
    edge = rng.normal(size=(B, N, N, DIM)).astype(np.float32)

    with torch.no_grad():
        node_t, edge_t = mha_t(_t(node), _t(edge))
    node_j, edge_j = GraphMHA(DIM, HEADS).apply(variables, jnp.asarray(node),
                                                jnp.asarray(edge))
    np.testing.assert_allclose(np.asarray(node_j), node_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(edge_j), edge_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_encoder_block_parity(ref):
    ref_layers, _, _ = ref
    torch.manual_seed(1)
    blk_t = ref_layers.Encoder_Block(DIM, HEADS, torch.nn.ReLU(),
                                     MLP_RATIO, 0.0).eval()
    variables = tc.torch_encoder_block_to_flax(blk_t.state_dict())

    rng = np.random.default_rng(2)
    node = rng.normal(size=(B, N, DIM)).astype(np.float32)
    edge = rng.normal(size=(B, N, N, DIM)).astype(np.float32)

    with torch.no_grad():
        node_t, edge_t = blk_t(_t(node), _t(edge))
    node_j, edge_j = EncoderBlock(DIM, HEADS, MLP_RATIO, 0.0).apply(
        variables, jnp.asarray(node), jnp.asarray(edge))
    np.testing.assert_allclose(np.asarray(node_j), node_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(edge_j), edge_t.numpy(),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# full-model parity
# ---------------------------------------------------------------------------

def _make_ref_generator(ref_models, seed=2):
    torch.manual_seed(seed)
    return ref_models.Generator(act="relu", vertexes=N, edges=B_DIM,
                                nodes=M_DIM, dropout=0.0, dim=DIM,
                                depth=DEPTH, heads=HEADS,
                                mlp_ratio=MLP_RATIO).eval()


def _make_ref_discriminator(ref_models, seed=3):
    torch.manual_seed(seed)
    return ref_models.Discriminator(act="relu", vertexes=N, edges=B_DIM,
                                    nodes=M_DIM, dropout=0.0, dim=DIM,
                                    depth=DEPTH, heads=HEADS,
                                    mlp_ratio=MLP_RATIO).eval()


def _our_generator(**kw):
    return Generator(act="relu", vertexes=N, edges=B_DIM, nodes=M_DIM,
                     dropout=0.0, dim=DIM, depth=DEPTH, heads=HEADS,
                     mlp_ratio=MLP_RATIO, **kw)


def _our_discriminator(**kw):
    return Discriminator(act="relu", vertexes=N, edges=B_DIM, nodes=M_DIM,
                         dropout=0.0, dim=DIM, depth=DEPTH, heads=HEADS,
                         mlp_ratio=MLP_RATIO, **kw)


def test_generator_parity(ref):
    _, ref_models, _ = ref
    gen_t = _make_ref_generator(ref_models)
    variables = tc.torch_generator_to_flax(gen_t.state_dict())

    z_e, z_n = _rand_inputs(3)
    with torch.no_grad():
        outs_t = gen_t(_t(z_e), _t(z_n))
    outs_j = _our_generator().apply(variables, jnp.asarray(z_e),
                                    jnp.asarray(z_n))
    for o_j, o_t in zip(outs_j, outs_t):
        np.testing.assert_allclose(np.asarray(o_j), o_t.numpy(),
                                   rtol=1e-5, atol=1e-5)


def test_generator_parity_scan_layout(ref):
    """The scan_layers (stacked blocks/block) layout loads converted
    reference weights and matches the reference forward too."""
    _, ref_models, _ = ref
    gen_t = _make_ref_generator(ref_models)
    variables = tc.torch_generator_to_flax(gen_t.state_dict(),
                                           scan_layers=True)
    z_e, z_n = _rand_inputs(4)
    with torch.no_grad():
        outs_t = gen_t(_t(z_e), _t(z_n))
    outs_j = _our_generator(scan_layers=True).apply(
        variables, jnp.asarray(z_e), jnp.asarray(z_n))
    for o_j, o_t in zip(outs_j, outs_t):
        np.testing.assert_allclose(np.asarray(o_j), o_t.numpy(),
                                   rtol=1e-5, atol=1e-5)


def test_discriminator_parity(ref):
    _, ref_models, _ = ref
    disc_t = _make_ref_discriminator(ref_models)
    variables = tc.torch_discriminator_to_flax(disc_t.state_dict())

    z_e, z_n = _rand_inputs(5)
    with torch.no_grad():
        logit_t = disc_t(_t(z_e), _t(z_n))
    logit_j = _our_discriminator().apply(variables, jnp.asarray(z_e),
                                         jnp.asarray(z_n))
    np.testing.assert_allclose(np.asarray(logit_j), logit_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_simple_disc_parity(ref):
    _, ref_models, _ = ref
    torch.manual_seed(4)
    sd_t = ref_models.simple_disc("tanh", M_DIM, N, B_DIM).eval()
    variables = tc.torch_simple_disc_to_flax(sd_t.state_dict())

    feats = N * M_DIM + N * N * B_DIM
    x = np.random.default_rng(6).normal(size=(B, feats)).astype(np.float32)
    with torch.no_grad():
        out_t = sd_t(_t(x))
    out_j = SimpleDisc(act="tanh", m_dim=M_DIM, vertexes=N,
                       b_dim=B_DIM).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# loss parity (incl. the double-backward gradient penalty)
# ---------------------------------------------------------------------------

def _patch_rand_with_jax_eps(monkeypatch, key):
    """Make torch.rand reproduce the exact eps draws our JAX
    gradient_penalty derives from ``key`` (node for rank-3 shapes, edge for
    rank-4 — matching loss.py:21-22)."""
    k_node, k_edge = jax.random.split(key)
    eps_node = np.asarray(jax.random.uniform(k_node, (B, 1, 1)))
    eps_edge = np.asarray(jax.random.uniform(k_edge, (B, 1, 1, 1)))

    real_rand = torch.rand

    def fake_rand(*shape, **kw):
        if len(shape) == 4:
            return torch.from_numpy(eps_edge.copy())
        if len(shape) == 3:
            return torch.from_numpy(eps_node.copy())
        return real_rand(*shape, **kw)

    monkeypatch.setattr(torch, "rand", fake_rand)


def test_gradient_penalty_value_parity(ref, monkeypatch):
    _, ref_models, ref_loss = ref
    disc_t = _make_ref_discriminator(ref_models, seed=7)
    variables = tc.torch_discriminator_to_flax(disc_t.state_dict())
    disc_j = _our_discriminator()

    rng = np.random.default_rng(8)
    real_e, real_n = _rand_inputs(9)
    fake_n = rng.normal(size=(B, N, M_DIM)).astype(np.float32)
    fake_e = rng.normal(size=(B, N, N, B_DIM)).astype(np.float32)

    key = jax.random.PRNGKey(123)
    _patch_rand_with_jax_eps(monkeypatch, key)

    gp_t = ref_loss.gradient_penalty(
        disc_t, _t(real_n), _t(real_e), _t(fake_n), _t(fake_e), B, "cpu")

    critic = lambda e, n: disc_j.apply(variables, e, n)
    gp_j = losses.gradient_penalty(critic, jnp.asarray(real_n),
                                   jnp.asarray(real_e), jnp.asarray(fake_n),
                                   jnp.asarray(fake_e), key)
    np.testing.assert_allclose(float(gp_j), float(gp_t.detach()), rtol=2e-4)

    # the fwdrev restructuring must produce the same VALUE too
    gp_j2 = losses.gradient_penalty_fwdrev(
        critic, jnp.asarray(real_n), jnp.asarray(real_e),
        jnp.asarray(fake_n), jnp.asarray(fake_e), key)
    np.testing.assert_allclose(float(gp_j2), float(gp_t.detach()), rtol=2e-4)


def test_discriminator_and_generator_loss_parity(ref, monkeypatch):
    """End-to-end d_loss (real + fake + λ·GP) and g_loss against the
    reference's own loss code with shared weights and identical eps."""
    _, ref_models, ref_loss = ref
    gen_t = _make_ref_generator(ref_models, seed=11)
    disc_t = _make_ref_discriminator(ref_models, seed=12)
    g_vars = tc.torch_generator_to_flax(gen_t.state_dict())
    d_vars = tc.torch_discriminator_to_flax(disc_t.state_dict())

    mol_e, mol_n = _rand_inputs(13)
    drug_e, drug_n = _rand_inputs(14)

    key = jax.random.PRNGKey(77)
    _patch_rand_with_jax_eps(monkeypatch, key)

    _, _, d_loss_t = ref_loss.discriminator_loss(
        gen_t, disc_t, _t(drug_e), _t(drug_n), _t(mol_e), _t(mol_n),
        B, "cpu", lambda_gp=10.0)
    g_loss_t, *_ = ref_loss.generator_loss(gen_t, disc_t, _t(mol_e),
                                           _t(mol_n), B)

    gen_j = _our_generator()
    disc_j = _our_discriminator()
    gen_fn = lambda e, n: gen_j.apply(g_vars, e, n)
    critic = lambda e, n: disc_j.apply(d_vars, e, n)

    d_loss_j = losses.discriminator_loss(
        gen_fn, critic, jnp.asarray(drug_e), jnp.asarray(drug_n),
        jnp.asarray(mol_e), jnp.asarray(mol_n), 10.0, key)
    g_loss_j, _ = losses.generator_loss(gen_fn, critic, jnp.asarray(mol_e),
                                        jnp.asarray(mol_n))
    np.testing.assert_allclose(float(d_loss_j), float(d_loss_t.detach()),
                               rtol=2e-4)
    np.testing.assert_allclose(float(g_loss_j), float(g_loss_t.detach()),
                               rtol=1e-4)


# ---------------------------------------------------------------------------
# round-trip + CLI
# ---------------------------------------------------------------------------

def test_generator_round_trip(ref):
    """flax -> torch -> flax is the identity (bit-exact)."""
    _, ref_models, _ = ref
    gen_t = _make_ref_generator(ref_models, seed=20)
    variables = tc.torch_generator_to_flax(gen_t.state_dict())
    back = tc.torch_generator_to_flax(
        tc.to_torch_tensors(tc.flax_generator_to_torch(variables)))
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_export_loads_into_reference_model(ref):
    """state_dicts we emit load into the reference module with
    strict=True and reproduce our forward."""
    _, ref_models, _ = ref
    disc_j = _our_discriminator()
    z_e, z_n = _rand_inputs(21)
    variables = disc_j.init(jax.random.PRNGKey(5), jnp.asarray(z_e),
                            jnp.asarray(z_n))
    sd = tc.to_torch_tensors(tc.flax_discriminator_to_torch(variables))

    disc_t = _make_ref_discriminator(ref_models, seed=22)
    disc_t.load_state_dict(sd, strict=True)
    disc_t.eval()
    with torch.no_grad():
        out_t = disc_t(_t(z_e), _t(z_n))
    out_j = disc_j.apply(variables, jnp.asarray(z_e), jnp.asarray(z_n))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_cli_import_generator(ref, tmp_path):
    """The CLI converts a saved torch .ckpt into a msgpack our checkpoint
    loader restores, matching the reference forward."""
    _, ref_models, _ = ref
    from flax import serialization

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    import import_torch_ckpt as cli

    gen_t = _make_ref_generator(ref_models, seed=30)
    ckpt_in = tmp_path / "DrugGEN-G.ckpt"
    ckpt_out = tmp_path / "DrugGEN-G.msgpack"
    torch.save(gen_t.state_dict(), str(ckpt_in))

    assert cli.main(["--model", "generator", "--input", str(ckpt_in),
                     "--output", str(ckpt_out)]) == 0

    gen_j = _our_generator()
    z_e, z_n = _rand_inputs(31)
    template = gen_j.init(jax.random.PRNGKey(0), jnp.asarray(z_e),
                          jnp.asarray(z_n))
    with open(ckpt_out, "rb") as f:
        variables = serialization.from_bytes(template, f.read())
    with torch.no_grad():
        outs_t = gen_t(_t(z_e), _t(z_n))
    outs_j = gen_j.apply(variables, jnp.asarray(z_e), jnp.asarray(z_n))
    for o_j, o_t in zip(outs_j, outs_t):
        np.testing.assert_allclose(np.asarray(o_j), o_t.numpy(),
                                   rtol=1e-5, atol=1e-5)


def test_data_parallel_prefix_stripped(ref):
    _, ref_models, _ = ref
    gen_t = _make_ref_generator(ref_models, seed=40)
    wrapped = {f"module.{k}": v for k, v in gen_t.state_dict().items()}
    variables = tc.torch_generator_to_flax(wrapped)
    z_e, z_n = _rand_inputs(41)
    with torch.no_grad():
        outs_t = gen_t(_t(z_e), _t(z_n))
    outs_j = _our_generator().apply(variables, jnp.asarray(z_e),
                                    jnp.asarray(z_n))
    np.testing.assert_allclose(np.asarray(outs_j[2]), outs_t[2].numpy(),
                               rtol=1e-5, atol=1e-5)

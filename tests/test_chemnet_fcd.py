"""ChemNet embedder + literal-FCD plumbing.

The reference's FCD comes from fcd_torch (results/evaluate.py:12,69-83).
Weights are not downloadable here, so these tests check (a) the Fréchet
math against the closed form on synthetic Gaussians, (b) that the ChemNet
architecture runs, round-trips through its weight formats, and plugs into
FCD as a featurizer producing literal-formula numbers.
"""

import json

import numpy as np
import pytest

from druggen_tpu.metrics.chemnet import (
    PAD_LEN,
    VOCAB_SIZE,
    ChemNet,
    one_hot_batch,
    tokenize,
)
from druggen_tpu.metrics.fcd import FCD, frechet_distance

SMALL_CONFIG = [
    {"type": "conv", "filters": 8, "kernel": 5, "activation": "selu"},
    {"type": "lstm", "units": 16, "return_sequences": False},
]


# ------------------------------------------------------------ Fréchet math

def test_frechet_identical_zero():
    mu = np.array([1.0, 2.0, 3.0])
    sigma = np.diag([1.0, 2.0, 0.5])
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_diagonal_closed_form():
    """For diagonal covariances the published FCD formula reduces to
    ||mu1-mu2||^2 + sum_i (sqrt(s1_i) - sqrt(s2_i))^2."""
    rng = np.random.default_rng(0)
    mu1, mu2 = rng.normal(size=4), rng.normal(size=4)
    s1 = rng.uniform(0.5, 2.0, size=4)
    s2 = rng.uniform(0.5, 2.0, size=4)
    expected = float(((mu1 - mu2) ** 2).sum()
                     + ((np.sqrt(s1) - np.sqrt(s2)) ** 2).sum())
    got = frechet_distance(mu1, np.diag(s1), mu2, np.diag(s2))
    assert got == pytest.approx(expected, rel=1e-8)


def test_frechet_mean_shift_only():
    """Equal covariances: FD = ||mu1-mu2||^2 exactly (any covariance)."""
    rng = np.random.default_rng(1)
    A = rng.normal(size=(5, 5))
    sigma = A @ A.T + np.eye(5)
    mu1, mu2 = rng.normal(size=5), rng.normal(size=5)
    got = frechet_distance(mu1, sigma, mu2, sigma)
    assert got == pytest.approx(float(((mu1 - mu2) ** 2).sum()), abs=1e-6)


def test_frechet_sampled_gaussians():
    """Estimates from large samples of two known Gaussians converge to the
    analytic distance (sanity for the mu/cov-fitting path inside FCD)."""
    rng = np.random.default_rng(2)
    d = 3
    mu1, mu2 = np.zeros(d), np.full(d, 0.5)
    s1, s2 = np.diag([1.0, 1.0, 1.0]), np.diag([2.0, 1.0, 0.5])
    x1 = rng.multivariate_normal(mu1, s1, size=20000)
    x2 = rng.multivariate_normal(mu2, s2, size=20000)
    est = frechet_distance(x1.mean(0), np.cov(x1, rowvar=False),
                           x2.mean(0), np.cov(x2, rowvar=False))
    analytic = frechet_distance(mu1, s1, mu2, s2)
    assert est == pytest.approx(analytic, abs=0.05)


# ------------------------------------------------------------ tokenizer

def test_tokenize_two_char_symbols():
    toks = tokenize("ClCCBr")
    # Cl and Br are single tokens
    assert len(toks) == 4


def test_one_hot_shape_and_padding():
    x = one_hot_batch(["CCO", "C"])
    assert x.shape == (2, PAD_LEN, VOCAB_SIZE)
    assert x[0].sum() == 3
    assert x[1].sum() == 1


# ------------------------------------------------------------ model

def test_chemnet_forward_shapes():
    net = ChemNet.random_init(seed=0, config=SMALL_CONFIG)
    emb = net(["CCO", "c1ccccc1", "CC(=O)O"], batch_size=4)
    assert emb.shape == (3, 16)
    assert np.isfinite(emb).all()
    # deterministic
    emb2 = net(["CCO", "c1ccccc1", "CC(=O)O"], batch_size=4)
    np.testing.assert_allclose(emb, emb2)


def test_chemnet_batching_consistent():
    net = ChemNet.random_init(seed=0, config=SMALL_CONFIG)
    smis = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCC"]
    np.testing.assert_allclose(net(smis, batch_size=2),
                               net(smis, batch_size=5), atol=1e-5)


def test_chemnet_npz_roundtrip(tmp_path):
    net = ChemNet.random_init(seed=3, config=SMALL_CONFIG)
    path = str(tmp_path / "chemnet.npz")
    net.save_npz(path)
    loaded = ChemNet.load(path)
    assert loaded.config == SMALL_CONFIG
    np.testing.assert_allclose(net(["CCO"]), loaded(["CCO"]), atol=1e-6)


def test_chemnet_torch_format(tmp_path):
    """An fcd_torch-style checkpoint (list of (layer-name, weights) with
    torch-layout arrays) loads and runs."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    k_keras = rng.standard_normal((5, VOCAB_SIZE, 8)) / 10  # [k, in, out]
    conv_torch = np.transpose(k_keras, (2, 1, 0))           # [out, in, k]
    h = 16
    Wx_torch = rng.standard_normal((4 * h, 8)) / 10         # [4h, in]
    Wh_torch = rng.standard_normal((4 * h, h)) / 10
    b = np.zeros(4 * h)
    obj = [
        ("Conv1d_1", {"weights": [conv_torch, np.zeros(8)]}),
        ("LSTM_1", {"weights": [Wx_torch, Wh_torch, b]}),
    ]
    path = str(tmp_path / "chemnet.pt")
    torch.save(obj, path)
    net = ChemNet.load(path)
    emb = net(["CCO", "CCN"])
    assert emb.shape == (2, h)
    # conv kernel was transposed back to [k, in, out]
    ref = ChemNet(
        [{"type": "conv", "filters": 8, "kernel": 5, "activation": "selu"},
         {"type": "lstm", "units": h, "return_sequences": False}],
        [(k_keras, np.zeros(8)), (Wx_torch.T, Wh_torch.T, b)])
    np.testing.assert_allclose(emb, ref(["CCO", "CCN"]), atol=1e-5)


# ------------------------------------------------------------ FCD plumbing

def test_fcd_with_chemnet_featurizer():
    net = ChemNet.random_init(seed=0, config=SMALL_CONFIG)
    fcd = FCD(featurizer=net)
    a = ["CCO", "CCN", "CCC", "CC(=O)O", "c1ccccc1", "CCCl", "CCBr", "CCF"]
    b = ["CCCCCCCCCC", "c1ccc2ccccc2c1", "CC(C)(C)C(=O)N",
         "O=C(O)c1ccccc1O", "ClC(Cl)(Cl)Cl", "N#Cc1ccccc1",
         "OCC(O)C(O)CO", "CN1CCCC1"]
    same = fcd(a, a)
    diff = fcd(a, b)
    # 8 samples in 16 dims -> singular covariance; sqrtm noise keeps the
    # same-set distance slightly above exact zero
    assert same == pytest.approx(0.0, abs=1e-2)
    assert diff > 10 * max(same, 1e-6)


def test_evaluator_literal_flag(tmp_path):
    from evaluate import MoleculeEvaluator

    net = ChemNet.random_init(seed=0, config=SMALL_CONFIG)
    path = str(tmp_path / "w.npz")
    net.save_npz(path)
    gen = ["CCO", "CCN", "CCC"]
    ev = MoleculeEvaluator(gen, gen, n_jobs=1, chemnet_weights=path)
    assert ev.fcd_is_literal
    out = ev.frechet()
    assert out["fcd_ref1"] == pytest.approx(0.0, abs=1e-5)
    ev2 = MoleculeEvaluator(gen, gen, n_jobs=1)
    assert not ev2.fcd_is_literal

"""--features mode tests: the extra node-feature block (reference _genF,
dataset.py:161-185) through codec, dataset, and train step."""

import numpy as np
import pytest

from druggen_tpu.chem import mol_from_smiles
from druggen_tpu.chem.codec import atom_features
from druggen_tpu.chem.vocab import build_vocab
from druggen_tpu.data.corpus import DRUGLIKE_SMILES
from druggen_tpu.data.dataset import BatchIterator, featurize_smiles

MAX_ATOM = 20


def test_atom_features_shape_and_content():
    mol = mol_from_smiles("Cc1ccccc1O")  # o-cresol: 8 heavy atoms
    f = atom_features(mol, MAX_ATOM)
    assert f.shape == (MAX_ATOM, 54)
    assert f.dtype == np.int8
    # padding rows all zero
    assert (f[8:] == 0).all()
    # methyl carbon: degree 1 -> slot 1; sp3 -> hyb slot 4 (index 14+3)
    assert f[0, 1] == 1
    # aromatic ring atoms flagged aromatic (index 29) and in-ring (46) and
    # ring-size-6 (47 + (6-2) = 51)
    arom_rows = [i for i, a in enumerate(mol.atoms) if a.aromatic]
    for i in arom_rows:
        assert f[i, 29] == 1
        assert f[i, 46] == 1
        assert f[i, 51] == 1
    # radicals==0 indicator always set for real atoms
    assert (f[:8, 41] == 1).all()


def test_featurize_with_features():
    vocab = build_vocab(DRUGLIKE_SMILES, MAX_ATOM)
    small = [s for s in DRUGLIKE_SMILES
             if (m := mol_from_smiles(s)) and m.num_atoms() <= MAX_ATOM][:20]
    data = featurize_smiles(small, vocab, MAX_ATOM, features=True)
    assert data.f is not None
    assert data.f.shape == (len(data), MAX_ATOM, 54)
    assert data.feature_dim == 54
    # batches arrive as dense float blocks of width m_dim + 54
    it = BatchIterator(data, 4, seed=0)
    x, a = next(iter(it.epoch_batches(0)))
    assert x.shape == (4, MAX_ATOM, vocab.m_dim + 54)
    assert x.dtype == np.float32
    # the one-hot prefix still one-hots
    assert np.allclose(x[..., :vocab.m_dim].sum(-1), 1.0)


def test_dense_step_runs():
    import jax

    from druggen_tpu.config import TrainConfig
    from druggen_tpu.models import Discriminator, Generator
    from druggen_tpu.train.step import (
        init_state,
        make_optimizers,
        make_train_step,
    )

    m_dim, b_dim, vert = 5 + 54, 4, 7
    cfg = TrainConfig(raw_file="x", drug_raw_file="y", batch_size=4,
                      max_atom=vert, dim=16, heads=4, mlp_ratio=2)
    g = Generator(act="relu", vertexes=vert, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=16, depth=1, heads=4, mlp_ratio=2)
    d = Discriminator(act="relu", vertexes=vert, edges=b_dim, nodes=m_dim,
                      dropout=0.0, dim=16, depth=1, heads=4, mlp_ratio=2)
    go, do = make_optimizers(cfg)
    state = init_state(g, d, go, do, jax.random.PRNGKey(0), vert, m_dim,
                       b_dim)
    step = make_train_step(g, d, go, do, lambda_gp=10.0, m_dim=m_dim,
                           b_dim=b_dim, node_mode="dense", donate=False)
    rng = np.random.default_rng(0)
    x = rng.random((4, vert, m_dim)).astype(np.float32)
    a0 = np.triu(rng.integers(0, b_dim, (4, vert, vert)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    new_state, metrics, outs = step(state, jax.random.PRNGKey(1), x, a,
                                    x.copy(), a.copy())
    assert np.isfinite(float(metrics["d_loss"]))
    assert outs[0].shape == (4, vert, m_dim)

"""ChEMBL-v29 12-atom-type vocabulary closure (round-4 VERDICT item 6).

The fragment-recombination corpora only reach 9 element types, so a model
trained on them could never emit Ca/K/As and a released m_dim-13 checkpoint
could not import without index surgery.  These tests pin the fix:
``widen_vocab``/``get_vocab(union_ref12=True)`` (reference
src/data/utils.py:26-126 ordering), the rare-element corpus supplement
(featurize + decode round-trip), and torch-checkpoint import at m_dim 13.
"""

import numpy as np
import pytest

from druggen_tpu.chem.vocab import (
    CHEMBL_VOCAB,
    Vocab,
    build_vocab,
    get_vocab,
    widen_vocab,
)
from druggen_tpu.data.corpus import (
    DRUGLIKE_SMILES,
    REF12_SUPPLEMENT,
    TARGET_SMILES,
    write_corpus,
)


def test_widen_vocab_union_and_order():
    v = Vocab((0, 6, 7, 8), (0, 1, 2))
    w = widen_vocab(v, CHEMBL_VOCAB)
    # sorted atomic numbers, PAD first (reference utils.py:97-109)
    assert w.atom_labels == CHEMBL_VOCAB.atom_labels
    assert w.bond_labels == (0, 1, 2, 3, 4)
    # widening never drops scanned labels outside the reference set
    v2 = Vocab((0, 6, 53), (0, 1))       # iodine not in ref12
    w2 = widen_vocab(v2, CHEMBL_VOCAB)
    assert 53 in w2.atom_labels
    assert w2.atom_labels == tuple(sorted(set(CHEMBL_VOCAB.atom_labels)
                                          | {53}))


def test_get_vocab_union_ref12(tmp_path):
    write_corpus(str(tmp_path / "chembl.smi"), DRUGLIKE_SMILES)
    write_corpus(str(tmp_path / "drugs.smi"), TARGET_SMILES)
    v = get_vocab(str(tmp_path / "chembl.smi"), str(tmp_path / "drugs.smi"),
                  45, cache_dir=str(tmp_path / "vocab"))
    w = get_vocab(str(tmp_path / "chembl.smi"), str(tmp_path / "drugs.smi"),
                  45, cache_dir=str(tmp_path / "vocab"), union_ref12=True)
    assert set(v.atom_labels) <= set(w.atom_labels)
    assert set(CHEMBL_VOCAB.atom_labels) <= set(w.atom_labels)
    assert w.m_dim >= 13
    # distinct cache keys: plain vocab unchanged on re-read
    v2 = get_vocab(str(tmp_path / "chembl.smi"), str(tmp_path / "drugs.smi"),
                   45, cache_dir=str(tmp_path / "vocab"))
    assert v2 == v
    # cached widened vocab round-trips
    w2 = get_vocab(str(tmp_path / "chembl.smi"), str(tmp_path / "drugs.smi"),
                   45, cache_dir=str(tmp_path / "vocab"), union_ref12=True)
    assert w2 == w


def test_supplement_covers_rare_elements_and_roundtrips():
    from druggen_tpu.chem.codec import matrices_to_mol
    from druggen_tpu.chem.canon import mol_to_smiles
    from druggen_tpu.chem.smiles import mol_from_smiles
    from druggen_tpu.data.dataset import featurize_smiles

    v = build_vocab(REF12_SUPPLEMENT, 45, use_native=False)
    assert {19, 20, 33} <= set(v.atom_labels)

    data = featurize_smiles(REF12_SUPPLEMENT, CHEMBL_VOCAB, 45)
    assert len(data) == len(REF12_SUPPLEMENT)
    seen = set()
    for i in range(len(data)):
        mol = matrices_to_mol(data.x[i], data.a[i], CHEMBL_VOCAB,
                              strict=True)
        assert mol is not None, REF12_SUPPLEMENT[i]
        smi = mol_to_smiles(mol)
        assert mol_from_smiles(smi) is not None
        seen.update(a.atomic_num for a in mol.atoms)
    assert {19, 20, 33} <= seen


def test_torch_import_m13_without_index_surgery():
    """A reference-layout torch Generator state_dict at the published
    vocab width (m_dim 13) converts onto our flax Generator built from
    the widened vocab, bit-for-bit, both directions."""
    import jax
    import jax.numpy as jnp

    from druggen_tpu.interop.torch_ckpt import (
        flax_generator_to_torch,
        torch_generator_to_flax,
    )
    from druggen_tpu.models import Generator

    m_dim = CHEMBL_VOCAB.m_dim       # 13
    b_dim = CHEMBL_VOCAB.b_dim       # 5
    G = Generator(act="relu", vertexes=45, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=32, depth=1, heads=2, mlp_ratio=2)
    params = G.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 45, 45, b_dim)),
                    jnp.zeros((1, 45, m_dim)))
    sd = flax_generator_to_torch(params)
    # readout width records the 13-type space
    assert sd["readout_n.weight"].shape[0] == m_dim
    back = torch_generator_to_flax(sd)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves({"params": back})
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_two_steps_with_ref12_vocab(tmp_path):
    """End-to-end: widened vocab + supplemented corpus trains, and the
    generator's output space includes the rare atom columns."""
    import jax.numpy as jnp

    from druggen_tpu.config import parse_train_args
    from druggen_tpu.train.trainer import Trainer

    write_corpus(str(tmp_path / "chembl.smi"),
                 DRUGLIKE_SMILES + REF12_SUPPLEMENT)
    write_corpus(str(tmp_path / "drugs.smi"), TARGET_SMILES)
    cfg = parse_train_args([
        "--raw_file", str(tmp_path / "chembl.smi"),
        "--drug_raw_file", str(tmp_path / "drugs.smi"),
        "--submodel", "DrugGEN", "--max_atom", "25", "--dim", "16",
        "--heads", "2", "--batch_size", "8", "--epoch", "1",
        "--vocab_ref12",
        "--mol_data_dir", str(tmp_path / "c"),
        "--drug_data_dir", str(tmp_path / "cd"),
        "--log_dir", str(tmp_path / "l"),
        "--sample_dir", str(tmp_path / "s"),
        "--model_save_dir", str(tmp_path / "m"),
        "--set_seed", "--seed", "3", "--exp_name", "ref12"])
    assert cfg.vocab_ref12
    tr = Trainer(cfg)
    assert set(CHEMBL_VOCAB.atom_labels) <= set(tr.vocab.atom_labels)
    assert tr.m_dim >= 13
    x = jnp.zeros((8, 25), jnp.int8)
    a = jnp.zeros((8, 25, 25), jnp.int8)
    st, m, (nl, el) = tr.step_fn(tr.state, tr.key, x, a, x, a)
    assert nl.shape[-1] == tr.m_dim      # rare columns in the output space
    assert np.isfinite(float(m["d_loss"]))

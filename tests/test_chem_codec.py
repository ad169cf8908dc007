"""Tests for vocab building and the graph<->matrix codec (round-trip
property tests per SURVEY.md §4)."""

import numpy as np
import pytest

from druggen_tpu.chem import canonical_smiles, mol_from_smiles, mol_to_smiles
from druggen_tpu.chem.codec import (
    check_valency,
    correct_mol,
    matrices_to_mol,
    mol_to_matrices,
    smiles_to_matrices,
    strip_to_largest_fragment,
)
from druggen_tpu.chem.vocab import build_vocab, Vocab, CHEMBL_VOCAB
from druggen_tpu.data.corpus import DRUGLIKE_SMILES, TARGET_SMILES, generate_corpus

MAX_ATOM = 45


@pytest.fixture(scope="module")
def vocab():
    return build_vocab(DRUGLIKE_SMILES + TARGET_SMILES, MAX_ATOM)


def test_corpus_parses():
    bad = [s for s in DRUGLIKE_SMILES + TARGET_SMILES
           if mol_from_smiles(s) is None]
    assert not bad, f"corpus SMILES failed to parse: {bad}"


def test_vocab_structure(vocab):
    assert vocab.atom_labels[0] == 0            # PAD atom at index 0
    assert vocab.bond_labels[0] == 0            # ZERO bond at index 0
    assert list(vocab.atom_labels) == sorted(vocab.atom_labels)
    assert 6 in vocab.atom_labels               # carbon present
    assert vocab.bond_labels == (0, 1, 2, 3, 4)  # single/double/triple/arom
    # encoder/decoder are inverses
    for k, v in vocab.atom_encoder.items():
        assert vocab.atom_decoder[v] == k


def test_vocab_json_roundtrip(vocab):
    assert Vocab.from_json(vocab.to_json()) == vocab


# Bracket atoms ([nH], charges, isotopes) lose their annotations in the
# (X, A) graph representation; pyrrole-type and nitro-type molecules then
# fail strict decode exactly like the reference's RDKit path (matrices2mol
# rebuilds neutral H-free atoms, dataset.py:218-228).
HLOSS = [s for s in DRUGLIKE_SMILES if "[nH]" in s or "+" in s]


@pytest.mark.parametrize("smi", HLOSS)
def test_codec_annotation_loss_fails_strict_decode(smi, vocab):
    res = smiles_to_matrices(smi, vocab, MAX_ATOM)
    assert res is not None
    X, A = res
    assert matrices_to_mol(X, A, vocab, strict=True) is None
    # non-strict decode still yields a writable molecule
    mol = matrices_to_mol(X, A, vocab, strict=False)
    assert mol is not None
    assert isinstance(mol_to_smiles(mol), str)


@pytest.mark.parametrize("smi", [s for s in DRUGLIKE_SMILES[:40]
                                 if "[" not in s])
def test_codec_roundtrip(smi, vocab):
    """SMILES -> (X, A) -> Mol -> canonical SMILES must equal the canonical
    form of the input (graph-level lossless round trip; stereo excepted)."""
    res = smiles_to_matrices(smi, vocab, MAX_ATOM)
    assert res is not None, f"featurization failed for {smi}"
    X, A = res
    assert X.shape == (MAX_ATOM,)
    assert A.shape == (MAX_ATOM, MAX_ATOM)
    assert (A == A.T).all(), "adjacency must be symmetric"
    mol = matrices_to_mol(X, A, vocab, strict=True)
    assert mol is not None
    # decoded mol has trailing PAD (*) atoms; strip by taking largest frag
    out = strip_to_largest_fragment(mol_to_smiles(mol))
    assert canonical_smiles(out) == canonical_smiles(smi), smi


def test_single_atom_rejected(vocab):
    # reference connectivity filter drops molecules with isolated atoms
    assert smiles_to_matrices("C", vocab, MAX_ATOM) is None


def test_oversize_rejected(vocab):
    big = "C" * 60  # 60-carbon chain
    assert smiles_to_matrices(big, vocab, 45) is None


def test_out_of_vocab_rejected():
    tiny = build_vocab(["CCO"], 45)  # vocab = {PAD, C, O}, single bonds only
    assert smiles_to_matrices("CCN", tiny, 45) is None    # N not in vocab
    assert smiles_to_matrices("C=C.CC", tiny, 45) is None  # DOUBLE not in vocab


def test_valency_repair(vocab):
    """A 5-valent carbon graph must be repaired by bond removal
    (reference correct_mol, dataset.py:251-277)."""
    X = np.zeros(8, dtype=np.int8)
    A = np.zeros((8, 8), dtype=np.int8)
    c = vocab.atom_encoder[6]
    X[:6] = c
    # center atom 0 with double bonds to 1,2 and single to 3,4 => valence 6
    dbl = vocab.bond_encoder[2]
    sng = vocab.bond_encoder[1]
    for j, t in [(1, dbl), (2, dbl), (3, sng), (4, sng)]:
        A[0, j] = A[j, 0] = t
    A[4, 5] = A[5, 4] = sng
    # pad column/row for unused atoms stays 0; nodes 6,7 are PAD but have no
    # bonds => decoded as '*' fragments
    mol = matrices_to_mol(X, A, vocab, strict=False)
    ok, info = check_valency(mol)
    assert not ok and info[0] == 0
    repaired = correct_mol(mol)
    ok, _ = check_valency(repaired)
    assert ok
    # the highest-order (double) bond was removed first
    assert repaired.num_bonds() < 5


def test_strip_largest_fragment():
    assert strip_to_largest_fragment("CCO.C.*") == "CCO"
    assert strip_to_largest_fragment("*CC") == "CCC"


def test_generated_corpus_valid():
    corpus = generate_corpus(50, seed=3)
    assert len(corpus) == 50
    assert all(mol_from_smiles(s) is not None for s in corpus)
    # deterministic
    assert corpus == generate_corpus(50, seed=3)


def test_chembl_vocab_constants():
    assert CHEMBL_VOCAB.m_dim == 13
    assert CHEMBL_VOCAB.b_dim == 5


def test_dense_garbage_decode_fast_and_consistent():
    """Early-GAN generators emit near-complete graphs (~1000 bonds on 45
    atoms).  The strict decode must reject them (over-valence) without the
    O(E^2) construction / full ring analysis cost — a 128-graph batch
    decodes in well under a second (chem/mol.py pre-screen), and the
    lenient path still writes a SMILES string."""
    import time

    from druggen_tpu.chem.vocab import CHEMBL_VOCAB as V
    from druggen_tpu.chem.canon import mol_to_smiles

    rng = np.random.default_rng(0)
    n = 45
    t0 = time.time()
    for _ in range(128):
        nl = rng.integers(1, V.m_dim, n)
        el0 = np.triu(rng.integers(0, V.b_dim, (n, n)), 1)
        mol = matrices_to_mol(nl, el0 + el0.T, V, strict=True)
        assert mol is None          # over-valent garbage must be invalid
    assert time.time() - t0 < 5.0   # was ~25 s before the fast path
    # lenient decode still produces a writable graph
    nl = rng.integers(1, V.m_dim, n)
    el0 = np.triu(rng.integers(0, V.b_dim, (n, n)), 1)
    mol = matrices_to_mol(nl, el0 + el0.T, V, strict=False)
    assert mol is not None
    assert isinstance(mol_to_smiles(mol), str)

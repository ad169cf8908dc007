"""Native (C++) chem kernel tests: bit-identical featurization vs the pure
Python path, batch API, and graceful degradation."""

import numpy as np
import pytest

from druggen_tpu import native
from druggen_tpu.chem.codec import smiles_to_matrices
from druggen_tpu.chem.vocab import build_vocab
from druggen_tpu.data.corpus import (
    DRUGLIKE_SMILES,
    TARGET_SMILES,
    generate_corpus,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native kernel not built")

MAX_ATOM = 45


@pytest.fixture(scope="module")
def vocab():
    return build_vocab(DRUGLIKE_SMILES + TARGET_SMILES, MAX_ATOM)


def test_single_parity(vocab):
    """Every corpus molecule featurizes identically in C++ and Python."""
    corpus = DRUGLIKE_SMILES + TARGET_SMILES + generate_corpus(100, seed=11)
    mismatches = []
    for s in corpus:
        py = smiles_to_matrices(s, vocab, MAX_ATOM)
        try:
            cc = native.featurize_smiles_native(s, vocab, MAX_ATOM)
        except RuntimeError:
            pytest.skip("native kernel unavailable")
        if (py is None) != (cc is None):
            mismatches.append((s, "keep-mismatch", py is None, cc is None))
            continue
        if py is None:
            continue
        if not (np.array_equal(py[0], cc[0]) and np.array_equal(py[1], cc[1])):
            mismatches.append((s, "matrix-mismatch"))
    assert not mismatches, mismatches[:5]


def test_invalid_inputs(vocab):
    for bad in ["", "((((", "C1CC", "[Xx]", "garbage", "C=#C", "cc"]:
        assert native.featurize_smiles_native(bad, vocab, MAX_ATOM) is None


def test_batch_parity(vocab):
    corpus = DRUGLIKE_SMILES + ["garbage", "C1CC"] + TARGET_SMILES
    X, A, kept = native.featurize_batch_native(corpus, vocab, MAX_ATOM,
                                               n_threads=4)
    # python reference
    py_kept = []
    py_x, py_a = [], []
    for i, s in enumerate(corpus):
        res = smiles_to_matrices(s, vocab, MAX_ATOM)
        if res is not None:
            py_kept.append(i)
            py_x.append(res[0])
            py_a.append(res[1])
    assert kept == py_kept
    np.testing.assert_array_equal(X, np.stack(py_x))
    np.testing.assert_array_equal(A, np.stack(py_a))


def test_batch_deterministic_under_threads(vocab):
    corpus = generate_corpus(200, seed=3)
    X1, A1, k1 = native.featurize_batch_native(corpus, vocab, MAX_ATOM,
                                               n_threads=1)
    X8, A8, k8 = native.featurize_batch_native(corpus, vocab, MAX_ATOM,
                                               n_threads=8)
    assert k1 == k8
    np.testing.assert_array_equal(X1, X8)
    np.testing.assert_array_equal(A1, A8)


def test_vocab_scan_parity():
    """dg_vocab_scan unions exactly the labels the Python build_vocab sees,
    including bracket/charged molecules and the size filter."""
    if not native.vocab_scan_available():
        pytest.skip("vocab scan entry point not in this .so")
    corpus = (DRUGLIKE_SMILES + TARGET_SMILES + generate_corpus(300, seed=7)
              + ["C#N", "[O-]C(=O)C", "garbage", "C" * 60, "c1ccccc1"])
    v_py = build_vocab(corpus, MAX_ATOM, use_native=False)
    v_cc = build_vocab(corpus, MAX_ATOM, use_native=True)
    assert v_py == v_cc
    # scan honors max_atom: tiny cap excludes big molecules' labels
    v_small_py = build_vocab(corpus, 8, use_native=False)
    v_small_cc = build_vocab(corpus, 8, use_native=True)
    assert v_small_py == v_small_cc

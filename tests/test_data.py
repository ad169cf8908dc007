"""Tests for the dense dataset pipeline (cache, batching, host sharding)."""

import numpy as np
import pytest

from druggen_tpu.chem.vocab import build_vocab, get_vocab
from druggen_tpu.data.corpus import DRUGLIKE_SMILES, write_corpus
from druggen_tpu.data.dataset import (
    BatchIterator,
    cache_path_for,
    featurize_smiles,
    load_dataset,
)

MAX_ATOM = 45


@pytest.fixture(scope="module")
def vocab():
    return build_vocab(DRUGLIKE_SMILES, MAX_ATOM)


@pytest.fixture(scope="module")
def data(vocab):
    return featurize_smiles(DRUGLIKE_SMILES, vocab, MAX_ATOM)


def test_featurize_shapes(data):
    m = len(data)
    assert m > 60  # most of the corpus survives filtering
    assert data.x.shape == (m, MAX_ATOM) and data.x.dtype == np.int8
    assert data.a.shape == (m, MAX_ATOM, MAX_ATOM) and data.a.dtype == np.int8
    assert len(data.smiles) == m
    # adjacency symmetric, diagonal empty
    assert (data.a == data.a.transpose(0, 2, 1)).all()
    assert (np.diagonal(data.a, axis1=1, axis2=2) == 0).all()


def test_cache_roundtrip(tmp_path, vocab):
    raw = tmp_path / "mini.smi"
    write_corpus(str(raw), DRUGLIKE_SMILES[:20])
    d1 = load_dataset(str(raw), vocab, MAX_ATOM, data_dir=str(tmp_path))
    cache = cache_path_for(str(raw), MAX_ATOM, str(tmp_path))
    import os
    assert os.path.exists(cache)
    assert cache.endswith(f"mini{MAX_ATOM}.npz")
    d2 = load_dataset(str(raw), vocab, MAX_ATOM, data_dir=str(tmp_path))
    np.testing.assert_array_equal(d1.x, d2.x)
    np.testing.assert_array_equal(d1.a, d2.a)
    assert d1.smiles == d2.smiles


def test_cache_invalidated_by_vocab_change(tmp_path, vocab):
    raw = tmp_path / "mini.smi"
    corpus = DRUGLIKE_SMILES[:10] + ["OCCO", "OCCN", "NCCN"]
    write_corpus(str(raw), corpus)
    d_full = load_dataset(str(raw), vocab, MAX_ATOM, data_dir=str(tmp_path))
    smaller = build_vocab(["CCO", "CCN"], MAX_ATOM)  # C/N/O, single bonds
    d = load_dataset(str(raw), smaller, MAX_ATOM, data_dir=str(tmp_path))
    # rebuilt with the new vocab: only the single-bond C/N/O molecules remain
    assert len(d) < len(d_full)
    assert set(d.smiles) == {"OCCO", "OCCN", "NCCN"}
    assert d.vocab == smaller


def test_batch_iterator_drop_last(data):
    bs = 32
    it = BatchIterator(data, bs, seed=1)
    batches = list(it.epoch_batches(0))
    assert len(batches) == len(data) // bs
    for x, a in batches:
        assert x.shape == (bs, MAX_ATOM)
        assert a.shape == (bs, MAX_ATOM, MAX_ATOM)


def test_batch_iterator_deterministic(data):
    it = BatchIterator(data, 16, seed=7)
    b1 = [x for x, _ in it.epoch_batches(3)]
    b2 = [x for x, _ in it.epoch_batches(3)]
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)
    # different epoch => different order
    b3 = [x for x, _ in it.epoch_batches(4)]
    assert any(not np.array_equal(x, y) for x, y in zip(b1, b3))


def test_host_sharding_disjoint(data):
    """Two hosts see disjoint molecule sets per epoch."""
    bs = 8
    seen = []
    for host in (0, 1):
        it = BatchIterator(data, bs, seed=5, host_id=host, num_hosts=2)
        idxs = set()
        for x, a in it.epoch_batches(0):
            for xr, ar in zip(x, a):
                idxs.add(xr.tobytes() + ar.tobytes())
        seen.append(idxs)
    # full (X, A) featurizations are unique in this corpus, so disjoint
    assert not (seen[0] & seen[1])


def test_vocab_file_cache(tmp_path):
    raw1 = tmp_path / "a.smi"
    raw2 = tmp_path / "b.smi"
    write_corpus(str(raw1), DRUGLIKE_SMILES[:10])
    write_corpus(str(raw2), DRUGLIKE_SMILES[10:20])
    v1 = get_vocab(str(raw1), str(raw2), MAX_ATOM, cache_dir=str(tmp_path / "v"))
    v2 = get_vocab(str(raw2), str(raw1), MAX_ATOM, cache_dir=str(tmp_path / "v"))
    assert v1 == v2  # order-independent cache key (sorted names)

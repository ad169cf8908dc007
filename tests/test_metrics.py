"""Metric-kernel tests (reference utils.py:472-611 behaviours)."""

import numpy as np
import pytest

from druggen_tpu.chem.fingerprints import (
    fingerprints_for_smiles,
    morgan_fingerprint,
)
from druggen_tpu.chem.smiles import mol_from_smiles
from druggen_tpu.metrics import (
    average_agg_tanimoto,
    fraction_unique,
    fraction_valid,
    internal_diversity,
    max_component,
    mean_atom_type,
    novelty,
)


def test_fraction_valid():
    assert fraction_valid(["CCO", "CCC", "garbage", None]) == 0.5
    assert fraction_valid([]) == 0.0
    assert fraction_valid(["CCO"]) == 1.0


def test_fraction_unique_canonical():
    # OCC and CCO are the same molecule
    assert fraction_unique(["CCO", "OCC", "CCC"]) == pytest.approx(2 / 3)
    assert fraction_unique(["CCO", "bad"], check_validity=True) == 1.0


def test_novelty():
    train = ["CCO", "CCC"]
    assert novelty(["CCO", "CCN"], train) == 0.5
    assert novelty(["OCC"], train) == 0.0       # same mol, spelled differently
    assert novelty([], train) == 0.0


def test_novelty_precomputed_canonical_set(tmp_path):
    from druggen_tpu.metrics.molecular import canonical_set

    train = ["CCO", "OCC", "CCC", "not-a-molecule"]
    cs = canonical_set(train, n_jobs=1)
    assert None not in cs and len(cs) == 2
    for gen in (["CCO", "CCN"], ["OCC"], []):
        assert novelty(gen, train, train_canon=cs) == novelty(gen, train)
    # disk cache round-trips identically (keyed by file size+mtime)
    src = tmp_path / "train.smi"
    src.write_text("\n".join(train) + "\n")
    c1 = canonical_set(train, n_jobs=1, cache_for=str(src))
    c2 = canonical_set(["IGNORED-on-cache-hit"], n_jobs=1,
                       cache_for=str(src))
    assert c1 == cs and c2 == cs


def test_fingerprint_properties():
    fp1 = morgan_fingerprint(mol_from_smiles("CCO"))
    fp2 = morgan_fingerprint(mol_from_smiles("OCC"))
    fp3 = morgan_fingerprint(mol_from_smiles("c1ccccc1"))
    np.testing.assert_array_equal(fp1, fp2)      # graph-invariant
    assert (fp1 != fp3).any()                    # discriminative
    assert fp1.shape == (1024,)
    assert fp1.sum() > 0


def test_tanimoto_self_similarity():
    fps = fingerprints_for_smiles(["CCO", "CCC", "c1ccccc1"])
    assert fps.shape[0] == 3
    # max-agg similarity of a set against itself is 1 everywhere
    assert average_agg_tanimoto(fps, fps, agg="max") == pytest.approx(1.0)


def test_tanimoto_matches_numpy():
    """Cross-check the jnp matmul path against a scalar NumPy computation."""
    fps_a = fingerprints_for_smiles(["CCO", "CCC", "CCN", "CCCl"])
    fps_b = fingerprints_for_smiles(["c1ccccc1", "CC(=O)O"])
    got = average_agg_tanimoto(fps_a, fps_b, agg="max")
    sims = np.zeros((len(fps_a), len(fps_b)))
    for i, x in enumerate(fps_a):
        for j, y in enumerate(fps_b):
            inter = float((x & y).sum())
            union = float(x.sum() + y.sum() - inter)
            sims[i, j] = inter / union if union else 1.0
    expect = sims.max(axis=0).mean()
    assert got == pytest.approx(expect, rel=1e-6)


def test_internal_diversity():
    homogeneous = fingerprints_for_smiles(["CCO", "CCO", "CCO"])
    diverse = fingerprints_for_smiles(["CCO", "c1ccccc1", "ClC(Cl)(Cl)Cl"])
    d_h, _ = internal_diversity(homogeneous)
    d_d, _ = internal_diversity(diverse)
    assert d_h == pytest.approx(0.0)
    assert d_d > 0.3


def test_max_component_and_atom_types():
    assert max_component(["CCO", "CC"], 10) == pytest.approx((3 + 2) / 2 / 10)
    # PAD label 0 discounted via the minus-one convention
    rows = [np.array([1, 1, 2, 0, 0]), np.array([3, 0, 0, 0, 0])]
    assert mean_atom_type(rows) == pytest.approx(((3 - 1) + (2 - 1)) / 2)

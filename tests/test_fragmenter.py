"""Fragment-recombination corpus builder (data/fragmenter.py)."""

import random

import pytest

from druggen_tpu.chem.smiles import mol_from_smiles
from druggen_tpu.data.corpus import DRUGLIKE_SMILES
from druggen_tpu.data.fragmenter import (
    build_corpus,
    crossover,
    cuttable_bonds,
    split_at,
)


def M(s):
    m = mol_from_smiles(s)
    assert m is not None
    return m


def test_cuttable_bonds_excludes_ring_and_multiple():
    m = M("CC(=O)Oc1ccccc1")  # phenyl acetate
    cuts = cuttable_bonds(m)
    for bi in cuts:
        b = m.bonds[bi]
        assert int(b.type) == 1
        # no aromatic ring bond is cuttable
        ring_atoms = {i for r in m.ring_info() for i in r}
        assert not ({b.a1, b.a2} <= ring_atoms)


def test_split_partitions_atoms():
    m = M("CCOc1ccccc1")
    for bi in cuttable_bonds(m):
        a, b = split_at(m, bi)
        assert sorted(a + b) == list(range(m.num_atoms()))
        assert m.bonds[bi].a1 in a and m.bonds[bi].a2 in b


def test_crossover_products_are_valid():
    rng = random.Random(3)
    parents = [M(s) for s in DRUGLIKE_SMILES[:30]]
    n_ok = 0
    for _ in range(200):
        a, b = rng.choice(parents), rng.choice(parents)
        smi = crossover(a, b, rng, min_atom=5)
        if smi is None:
            continue
        n_ok += 1
        child = mol_from_smiles(smi)
        assert child is not None, smi
        assert child.num_atoms() <= 45
    assert n_ok > 50  # crossover succeeds routinely on drug-like parents


def test_build_corpus_deterministic_unique():
    c1 = build_corpus(DRUGLIKE_SMILES, 60, seed=5, min_atom=5)
    c2 = build_corpus(DRUGLIKE_SMILES, 60, seed=5, min_atom=5)
    assert c1 == c2
    assert len(set(c1)) == 60
    # every product parses
    assert all(mol_from_smiles(s) is not None for s in c1)


def test_build_corpus_needs_parents():
    with pytest.raises(ValueError):
        build_corpus(["C"], 10)

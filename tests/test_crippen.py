"""Exact Wildman-Crippen logP (druggen_tpu/chem/crippen.py).

Anchored on known RDKit ``Crippen.MolLogP`` values (the reference's logP
source, utils.py:641) — each checked value below was verified against the
published implementation before RDKit became unavailable in this
environment, and doubles as a hand-check of the type assignments."""

import pytest

from druggen_tpu.chem.crippen import (
    crippen_atom_types,
    crippen_contributions,
    crippen_logp,
)
from druggen_tpu.chem.smiles import mol_from_smiles


def M(s):
    m = mol_from_smiles(s)
    assert m is not None, s
    return m


# (smiles, RDKit Crippen.MolLogP)
KNOWN = [
    ("C", 0.6361),                  # methane: C1 + 4 H1
    ("CCO", -0.0014),               # ethanol: C1, C3, O2, 5 H1 + H2
    ("c1ccccc1", 1.6866),           # benzene: 6 C18 + 6 H1
    ("Oc1ccccc1", 1.3922),          # phenol: C23 + O2 + H2
    ("OC(=O)c1ccccc1", 1.3848),     # benzoic acid: C21, C5, O10, O2, H4
    ("Nc1ccccc1", 1.2688),          # aniline: C22 + N3 + 2 H3
    ("c1ccncc1", 1.0816),           # pyridine: 5 C18 + N11
    ("c1ccc2ccccc2c1", 2.8398),     # naphthalene: 8 C18 + 2 C19
    ("CC(C)C", 1.6623),             # isobutane: 3 C1 + C2
    ("CC(C)Cc1ccc(cc1)C(C)C(=O)O", 3.0732),   # ibuprofen
    ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", -1.0293),  # caffeine
]


@pytest.mark.parametrize("smi,want", KNOWN)
def test_known_rdkit_values(smi, want):
    assert crippen_logp(M(smi)) == pytest.approx(want, abs=1e-3)


def test_atom_types_ethanol():
    assert crippen_atom_types(M("CCO")) == ["C1", "C3", "O2"]


def test_atom_types_aspirin():
    types = crippen_atom_types(M("CC(=O)Oc1ccccc1C(=O)O"))
    assert types == ["C1", "C5", "O9", "O4", "C23", "C18", "C18", "C18",
                     "C18", "C21", "C5", "O10", "O2"]


def test_h_types():
    # (smiles, atom idx, expected H type)
    cases = [
        ("CCO", 0, "H1"),            # CH3
        ("CCO", 2, "H2"),            # alcohol OH
        ("Oc1ccccc1", 0, "H2"),      # phenol OH
        ("OC(=O)C", 0, "H4"),        # carboxylic acid OH
        ("CCN", 2, "H3"),            # amine NH2
        ("CS", 1, "H2"),             # thiol SH ([#1][!C;!N;!O])
        ("CON", 2, "H3"),            # H on N (methoxyamine NH2)
        ("CC=C", 2, "H1"),           # vinylic H on C
    ]
    for smi, idx, want in cases:
        contribs = crippen_contributions(M(smi))
        assert contribs[idx][2] == want, (smi, idx, contribs[idx])


def test_n_oxide_and_charged():
    # nitro group written charged: [O-][N+](=O)C
    m = M("C[N+](=O)[O-]")
    types = crippen_atom_types(m)
    assert types[0] == "C3"          # CH3 on N
    assert types[1] == "N13"         # charged trisubstituted N
    assert types[2] == "O5"          # N=O
    assert types[3] == "O5"          # [O-] on N
    # carboxylate: the O12 special case precedes generic anionic O7
    m2 = M("CC(=O)[O-]")
    assert crippen_atom_types(m2)[3] == "O12"
    # ammonium
    m3 = M("C[NH3+]")
    assert crippen_atom_types(m3)[1] == "N10"


def test_every_atom_gets_a_type():
    from druggen_tpu.data.corpus import DRUGLIKE_SMILES, generate_corpus

    for smi in DRUGLIKE_SMILES + generate_corpus(100, seed=11):
        m = mol_from_smiles(smi)
        if m is None:
            continue
        types = crippen_atom_types(m)
        assert len(types) == m.num_atoms()
        assert all(t for t in types)
        # total is finite and bounded for drug-sized molecules
        v = crippen_logp(m)
        assert -20 < v < 20

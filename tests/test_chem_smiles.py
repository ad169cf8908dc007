"""Tests for the chem runtime: SMILES parse / sanitize / canonical write.

The reference gets this functionality from RDKit; these tests pin down our
own implementation's behaviour (round-trip, H counting, aromaticity,
valence rejection) on hand-checked molecules.
"""

import pytest

from druggen_tpu.chem import (
    BondType,
    mol_from_smiles,
    mol_to_smiles,
    canonical_smiles,
)


# (smiles, num_heavy_atoms, num_bonds, total_H_count)
PARSE_CASES = [
    ("C", 1, 0, 4),                      # methane
    ("CC", 2, 1, 6),                     # ethane
    ("C=C", 2, 1, 4),                    # ethene
    ("C#N", 2, 1, 1),                    # HCN
    ("CCO", 3, 2, 6),                    # ethanol
    ("CC(=O)O", 4, 3, 4),                # acetic acid
    ("c1ccccc1", 6, 6, 6),               # benzene
    ("c1ccc2ccccc2c1", 10, 11, 8),       # naphthalene
    ("c1ccncc1", 6, 6, 5),               # pyridine
    ("c1cc[nH]c1", 5, 5, 5),             # pyrrole
    ("c1ccoc1", 5, 5, 4),                # furan
    ("c1ccsc1", 5, 5, 4),                # thiophene
    ("C1CCCCC1", 6, 6, 12),              # cyclohexane
    ("CC(C)C", 4, 3, 10),                # isobutane
    ("[NH4+]", 1, 0, 4),                 # ammonium
    ("[O-]C(=O)C", 4, 3, 3),             # acetate
    ("ClCCl", 3, 2, 2),                  # DCM
    ("BrCCBr", 4, 3, 4),
    ("N#Cc1ccccc1", 8, 8, 5),            # benzonitrile
    ("O=S(=O)(O)O", 5, 4, 2),            # sulfuric acid (S(VI))
    ("CN1C=NC2=C1C(=O)N(C)C(=O)N2C", 14, 15, 10),  # caffeine, kekulé form
    ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", 14, 15, 10),    # caffeine, aromatic form
    ("CC(=O)Oc1ccccc1C(=O)O", 13, 13, 8),          # aspirin
    ("C%10CC%10", 3, 3, 6),              # %nn ring closure (cyclopropane)
    ("C1.C1", 2, 1, 6),                  # dot + ring bond = ethane
    ("[13CH4]", 1, 0, 4),                # isotope
    ("F/C=C/F", 4, 3, 2),                # stereo parsed+dropped
    ("N[C@@H](C)C(=O)O", 6, 5, 7),       # alanine with chirality tag
]


@pytest.mark.parametrize("smi,na,nb,nh", PARSE_CASES)
def test_parse_counts(smi, na, nb, nh):
    mol = mol_from_smiles(smi)
    assert mol is not None, f"failed to parse {smi}"
    assert mol.num_atoms() == na
    assert mol.num_bonds() == nb
    assert sum(a.total_hs() for a in mol.atoms) == nh


INVALID = [
    "",                 # empty
    "C(",               # unclosed branch
    "C1CC",             # unclosed ring
    "CC)C",             # unmatched close
    "C=",               # dangling bond
    "Xx",               # unknown element
    "C=#C",             # two bond symbols
    "CF=C",             # F with double bond: valence 2 > 1
    "O(C)(C)C",         # O valence 3
    "N(C)(C)(C)C",      # neutral N valence 4
    "c1ccc1",           # cyclobutadiene-as-aromatic: not kekulizable
    "cc",               # aromatic atoms outside ring
    "C%1CC",            # bad %nn
    "[C",               # unclosed bracket
]


@pytest.mark.parametrize("smi", INVALID)
def test_invalid_rejected(smi):
    assert mol_from_smiles(smi) is None, f"{smi!r} should be invalid"


ROUNDTRIP = [
    "CCO",
    "CC(=O)Oc1ccccc1C(=O)O",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "c1ccc2ccccc2c1",
    "c1cc[nH]c1",
    "C1CC2CCC1CC2",                      # bicyclic
    "c1ccc(-c2ccccc2)cc1",               # biphenyl (explicit single)
    "[O-]S(=O)(=O)c1ccccc1",
    "O=C(O)CCCCC(=O)O",
    "CC(C)(C)c1ccc(O)cc1",
    "FC(F)(F)c1ccccc1",
    "N#Cc1ccc(Cl)cc1",
    "CN(C)CCCN1c2ccccc2CCc2ccc(Cl)cc21",  # clomipramine
    "CC(=O)Nc1ccc(O)cc1",                # paracetamol
    "OCC1OC(O)C(O)C(O)C1O",              # glucose (no stereo)
]


@pytest.mark.parametrize("smi", ROUNDTRIP)
def test_roundtrip_and_canonical_stability(smi):
    """parse -> write -> parse -> write must be a fixed point, and the result
    must describe the same molecule (atom/bond/H counts preserved)."""
    mol = mol_from_smiles(smi)
    assert mol is not None
    out1 = mol_to_smiles(mol)
    mol2 = mol_from_smiles(out1)
    assert mol2 is not None, f"wrote unparseable SMILES {out1!r} from {smi!r}"
    out2 = mol_to_smiles(mol2)
    assert out1 == out2, f"not canonical-stable: {out1!r} vs {out2!r}"
    assert mol2.num_atoms() == mol.num_atoms()
    assert mol2.num_bonds() == mol.num_bonds()
    assert (sum(a.total_hs() for a in mol2.atoms)
            == sum(a.total_hs() for a in mol.atoms))


def test_canonical_invariance_under_renumbering():
    """Different SMILES spellings of the same molecule canonicalize
    identically."""
    spellings = {
        "toluene": ["Cc1ccccc1", "c1ccccc1C", "c1ccc(C)cc1", "c1cc(C)ccc1"],
        "ethanol": ["CCO", "OCC", "C(O)C"],
        "isobutane": ["CC(C)C", "C(C)(C)C"],
        "paracetamol": ["CC(=O)Nc1ccc(O)cc1", "Oc1ccc(NC(C)=O)cc1"],
        "pyridine": ["c1ccncc1", "n1ccccc1", "c1cnccc1"],
    }
    for name, group in spellings.items():
        outs = {canonical_smiles(s) for s in group}
        assert None not in outs, f"{name}: parse failure in {group}"
        assert len(outs) == 1, f"{name}: canonicalization not invariant: {outs}"


def test_distinct_molecules_distinct_canonical():
    mols = ["CCO", "CCC", "CCN", "c1ccccc1", "C1CCCCC1", "CC=O", "CC(=O)O",
            "CCOC", "CC(C)O", "CCCO"]
    outs = [canonical_smiles(s) for s in mols]
    assert len(set(outs)) == len(mols)


def test_aromatic_perception_and_kekule():
    mol = mol_from_smiles("c1ccccc1")
    assert all(a.aromatic for a in mol.atoms)
    assert all(b.type == BondType.AROMATIC for b in mol.bonds)
    # kekulé structure: exactly 3 double bonds
    assert len(mol._kekule_double) == 3


def test_charge_parsing():
    mol = mol_from_smiles("[N+](C)(C)(C)C")
    assert mol is not None
    assert mol.atoms[0].charge == 1
    mol = mol_from_smiles("[Fe+2]")
    assert mol is not None and mol.atoms[0].charge == 2
    mol = mol_from_smiles("[O-2]")
    assert mol is not None and mol.atoms[0].charge == -2


def test_fragments_dot():
    mol = mol_from_smiles("CCO.CC")
    assert mol is not None
    comps = mol.connected_components()
    assert sorted(len(c) for c in comps) == [2, 3]
    out = mol_to_smiles(mol)
    assert "." in out

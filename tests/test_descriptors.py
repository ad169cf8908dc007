"""Descriptor tests: hand-checkable values (MW, HBD/HBA, TPSA, rotors,
rings) and sanity ranges for the heuristic ones (logP, QED, SA)."""

import pytest

from druggen_tpu.chem import mol_from_smiles
from druggen_tpu.chem import descriptors as D


def M(smi):
    mol = mol_from_smiles(smi)
    assert mol is not None, smi
    return mol


def test_mol_weight():
    assert abs(D.mol_weight(M("C")) - 16.043) < 0.01          # CH4
    assert abs(D.mol_weight(M("CCO")) - 46.07) < 0.01         # ethanol
    assert abs(D.mol_weight(M("c1ccccc1")) - 78.11) < 0.01    # benzene
    # aspirin 180.16
    assert abs(D.mol_weight(M("CC(=O)Oc1ccccc1C(=O)O")) - 180.16) < 0.05


def test_h_donors_acceptors():
    # RDKit Lipinski.NumHDonors / NumHAcceptors SMARTS definitions
    # (reference utils.py:642-643): the carboxyl OH oxygen is NOT an
    # acceptor ([O;H1;v2] attached to a C that is =O is excluded)
    aspirin = M("CC(=O)Oc1ccccc1C(=O)O")
    assert D.num_h_donors(aspirin) == 1       # the COOH
    assert D.num_h_acceptors(aspirin) == 3    # 2 C=O + ester O
    caffeine = M("Cn1cnc2c1c(=O)n(C)c(=O)n2C")
    assert D.num_h_donors(caffeine) == 0
    # 2 C=O + pyridine-type n; the three substituted n are v3 aromatic
    # with all valences in the ring system -> [nH0] matches, the two
    # amide-type n's still count under [nH0,o,s;+0]
    assert D.num_h_acceptors(caffeine) == 6
    ethylamine = M("CCN")
    assert D.num_h_donors(ethylamine) == 1
    assert D.num_h_acceptors(ethylamine) == 1
    pyrrole = M("c1cc[nH]c1")
    assert D.num_h_donors(pyrrole) == 1
    assert D.num_h_acceptors(pyrrole) == 0    # [nH] excluded from [nH0]


def test_tpsa_known_values():
    # published Ertl TPSA values
    assert abs(D.tpsa(M("c1ccccc1")) - 0.0) < 0.01            # benzene
    assert abs(D.tpsa(M("CCO")) - 20.23) < 0.01               # ethanol
    assert abs(D.tpsa(M("CC(=O)O")) - 37.30) < 0.01           # acetic acid
    assert abs(D.tpsa(M("c1ccncc1")) - 12.89) < 0.01          # pyridine
    assert abs(D.tpsa(M("c1cc[nH]c1")) - 15.79) < 0.01        # pyrrole
    # aspirin: 2 x esterO(9.23->?): ester = C(=O)O: 17.07 + 9.23; COOH =
    # 17.07 + 20.23 => 26.30 + 37.30 = 63.60
    assert abs(D.tpsa(M("CC(=O)Oc1ccccc1C(=O)O")) - 63.60) < 0.01


def test_rotatable_bonds():
    assert D.num_rotatable_bonds(M("CCCC")) == 1      # butane: C2-C3
    assert D.num_rotatable_bonds(M("c1ccccc1")) == 0
    assert D.num_rotatable_bonds(M("CC(=O)NC")) == 0  # amide excluded
    assert D.num_rotatable_bonds(M("c1ccc(-c2ccccc2)cc1")) == 1  # biphenyl


def test_ring_counts():
    assert D.num_rings(M("c1ccccc1")) == 1
    assert D.num_rings(M("c1ccc2ccccc2c1")) == 2
    assert D.num_aromatic_rings(M("c1ccc2ccccc2c1")) == 2
    assert D.num_aromatic_rings(M("C1CCCCC1")) == 0


def test_logp_trends():
    """Heuristic logP must reproduce hydrophobicity ordering."""
    hexane = D.crippen_logp(M("CCCCCC"))
    ethanol = D.crippen_logp(M("CCO"))
    glycerol = D.crippen_logp(M("OCC(O)CO"))
    assert hexane > ethanol > glycerol
    assert D.crippen_logp(M("c1ccccc1")) > 0     # benzene hydrophobic
    assert D.crippen_logp(M("OCC(O)C(O)C(O)CO")) < 0  # polyol hydrophilic


def test_qed_ranges():
    """QED in (0,1]; drug-like molecules score well above tiny fragments
    and greasy chains."""
    aspirin = D.qed(M("CC(=O)Oc1ccccc1C(=O)O"))
    caffeine = D.qed(M("Cn1cnc2c1c(=O)n(C)c(=O)n2C"))
    octadecane = D.qed(M("C" * 18))
    methane_dimer = D.qed(M("CC"))
    for v in (aspirin, caffeine, octadecane, methane_dimer):
        assert 0.0 < v <= 1.0
    assert aspirin > 0.5
    assert caffeine > 0.4
    assert aspirin > octadecane
    assert caffeine > octadecane


def test_sa_score_ranges():
    """SA is corpus-relative here (see descriptors module docstring), so we
    assert ranges and coarse structure rather than exact orderings between
    individual molecules."""
    simple = D.sa_score(M("CCO"))
    benzene = D.sa_score(M("c1ccccc1"))
    drug = D.sa_score(M("CC(=O)Oc1ccccc1C(=O)O"))
    complex_mol = D.sa_score(M("CC12CCC(CC1)C(C)(C)O2"))
    for v in (simple, benzene, drug, complex_mol):
        assert 1.0 <= v <= 10.0
    # familiar drug-like structures stay on the accessible half
    assert benzene < 5.0
    assert drug < 5.0
    # structural penalties register: the bridged bicyclic scores harder
    # than plain benzene
    assert complex_mol > benzene


def test_lipinski_veber():
    aspirin = M("CC(=O)Oc1ccccc1C(=O)O")
    assert D.obey_lipinski(aspirin) == 5
    assert D.obey_veber(aspirin) == 2
    # a gross rule-breaker: huge greasy chain
    big = M("C" * 40)
    assert D.obey_lipinski(big) < 5

"""Offline-evaluator stack tests: scaffolds, fragments, Fréchet distance,
PAINS filters, and the evaluate.py CLI surface."""

import json
import os

import numpy as np
import pytest

from druggen_tpu.chem import mol_from_smiles
from druggen_tpu.chem.filters import (
    has_azo,
    has_catechol,
    has_quinone,
    is_pains,
)
from druggen_tpu.chem.scaffolds import (
    fragment_molecule,
    murcko_scaffold,
    scaffold_smiles,
)
from druggen_tpu.chem.canon import canonical_smiles, mol_to_smiles
from druggen_tpu.data.corpus import DRUGLIKE_SMILES, TARGET_SMILES
from druggen_tpu.metrics.fcd import FCD, frechet_distance
from druggen_tpu.metrics.frag_scaf import (
    compute_scaffolds,
    cos_similarity,
    frag_similarity,
    scaf_similarity,
)


def test_murcko_scaffold_basic():
    # toluene -> benzene
    scaf = murcko_scaffold(mol_from_smiles("Cc1ccccc1"))
    assert mol_to_smiles(scaf) == canonical_smiles("c1ccccc1")
    # acyclic molecule -> no scaffold
    assert murcko_scaffold(mol_from_smiles("CCCCO")) is None
    # biphenyl stays biphenyl (linker kept)
    scaf = murcko_scaffold(mol_from_smiles("c1ccc(-c2ccccc2)cc1"))
    assert scaf.num_rings() == 2
    assert scaf.num_atoms() == 12


def test_scaffold_min_rings():
    assert scaffold_smiles("Cc1ccccc1", min_rings=2) is None
    assert scaffold_smiles("c1ccc(-c2ccccc2)cc1", min_rings=2) is not None


def test_fragmenter():
    # ring-attachment cut: ethylbenzene -> ring + won't cut terminal...
    frags = fragment_molecule("CCc1ccccc1")
    assert len(frags) >= 1
    # amide junction molecule splits
    frags2 = fragment_molecule("c1ccccc1CNC(=O)CCc1ccncc1")
    assert len(frags2) >= 2
    # unfragmentable stays whole
    assert fragment_molecule("c1ccccc1") == [canonical_smiles("c1ccccc1")]


def test_cos_similarity_bounds():
    from collections import Counter

    a = Counter({"x": 2, "y": 1})
    assert cos_similarity(a, a) == pytest.approx(1.0)
    b = Counter({"z": 3})
    assert cos_similarity(a, b) == pytest.approx(0.0)
    assert np.isnan(cos_similarity(Counter(), a))


def test_frag_scaf_similarity_self():
    corpus = DRUGLIKE_SMILES[:30]
    assert frag_similarity(corpus, corpus) == pytest.approx(1.0)
    assert scaf_similarity(corpus, corpus) == pytest.approx(1.0)
    # disjoint chemistry scores lower
    alkanes = ["CCCCCC", "CCCCCCC", "CC(C)CCC"]
    sim = frag_similarity(alkanes, corpus)
    assert np.isnan(sim) or sim < 0.7


def test_frechet_distance_math():
    mu = np.zeros(4)
    sig = np.eye(4)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)
    mu2 = np.ones(4)
    # identical covariance: distance = ||mu1-mu2||^2 = 4
    assert frechet_distance(mu, sig, mu2, sig) == pytest.approx(4.0, abs=1e-6)


def test_fcd_discriminates():
    fcd = FCD()
    a = DRUGLIKE_SMILES[:40]
    b = DRUGLIKE_SMILES[40:]
    alkanes = ["C" * k for k in range(3, 30)]
    same_ish = fcd(a, b)
    diff = fcd(a, alkanes)
    assert np.isfinite(same_ish) and np.isfinite(diff)
    assert diff > same_ish   # alkanes are farther from drugs than drugs
    # identical sets => ~0
    assert fcd(a, a) == pytest.approx(0.0, abs=1e-6)


def test_pains_patterns():
    quinone = mol_from_smiles("O=C1C=CC(=O)C=C1")
    assert has_quinone(quinone)
    assert is_pains(quinone)
    catechol = mol_from_smiles("Oc1ccccc1O")
    assert has_catechol(catechol)
    azo = mol_from_smiles("c1ccccc1N=Nc1ccccc1")
    assert has_azo(azo)
    clean = mol_from_smiles("CC(=O)Nc1ccc(O)cc1")   # paracetamol
    assert not is_pains(clean)
    assert not is_pains(mol_from_smiles("CCO"))


def test_evaluate_cli(tmp_path):
    import importlib

    ev = importlib.import_module("evaluate")
    gen_csv = tmp_path / "gen.csv"
    with open(gen_csv, "w") as f:
        f.write("SMILES\n")
        for s in DRUGLIKE_SMILES[:25]:
            f.write(s + "\n")
    ref1 = tmp_path / "ref1.smi"
    with open(ref1, "w") as f:
        f.write("\n".join(DRUGLIKE_SMILES[25:60]) + "\n")
    ref2 = tmp_path / "ref2.smi"
    with open(ref2, "w") as f:
        f.write("\n".join(TARGET_SMILES) + "\n")
    out = tmp_path / "res"
    results = ev.evaluate_molecules_from_files(
        str(gen_csv), str(ref1), str(ref2), output_prefix=str(out))
    assert results["validity"] == 1.0
    assert 0 < results["uniqueness"] <= 1.0
    assert "fcd_ref1" in results and "fcd_ref2" in results
    assert "lipinski_mean" in results
    with open(str(out) + ".json") as f:
        blob = json.load(f)
    assert blob["n_generated"] == 25
    assert os.path.exists(str(out) + ".csv")


def test_evaluate_cli_strips_output_suffix(tmp_path, monkeypatch):
    """Passing --output results.json must not produce results.json.json —
    the CLI strips a trailing .json/.csv before using the prefix."""
    import importlib
    import sys

    ev = importlib.import_module("evaluate")
    gen = tmp_path / "gen.smi"
    with open(gen, "w") as f:
        f.write("\n".join(DRUGLIKE_SMILES[:10]) + "\n")
    ref1 = tmp_path / "ref1.smi"
    with open(ref1, "w") as f:
        f.write("\n".join(DRUGLIKE_SMILES[10:30]) + "\n")
    out = tmp_path / "res.json"
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--gen", str(gen), "--ref1", str(ref1),
        "--output", str(out), "--n-jobs", "1"])
    ev.main()
    assert os.path.exists(tmp_path / "res.json")
    assert os.path.exists(tmp_path / "res.csv")
    assert not os.path.exists(tmp_path / "res.json.json")

"""Tests for the utility scripts (docking report, data setup).

Covers the two SURVEY §2.1 components previously untested:
- setup/downloader analogue (reference setup.sh:33-172) ->
  scripts/setup_data.py
- docking-results analysis (reference results/README.md:3 protocol) ->
  scripts/docking_report.py
"""

import csv
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import docking_report  # noqa: E402


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def test_read_scores_named_column(tmp_path):
    p = tmp_path / "a.csv"
    _write_csv(p, ["smiles", "docking score"],
               [["CCO", "-7.5"], ["CCN", "-9.0"], ["bad", "x"]])
    assert docking_report.read_scores(str(p)) == [-7.5, -9.0]


def test_read_scores_fallback_last_numeric(tmp_path):
    p = tmp_path / "b.csv"
    _write_csv(p, ["smiles", "whatever"],
               [["CCO", "-8.25"], ["CCN", "-6.0"]])
    assert docking_report.read_scores(str(p)) == [-8.25, -6.0]


def test_summarize_top_fraction():
    # 10 scores; top-10% = single most-negative score
    scores = [-1.0, -2.0, -3.0, -4.0, -5.0,
              -6.0, -7.0, -8.0, -9.0, -10.0]
    s = docking_report.summarize(scores, 0.1)
    assert s["n"] == 10
    assert s["best"] == -10.0
    assert s["worst"] == -1.0
    assert s["top10pct_n"] == 1
    assert s["top10pct_mean"] == -10.0
    # top-50%: mean of the 5 most negative
    s5 = docking_report.summarize(scores, 0.5)
    assert s5["top50pct_mean"] == pytest.approx(-8.0)


def test_summarize_empty():
    assert docking_report.summarize([], 0.1) == {"n": 0}


def test_docking_report_reproduces_reference_headline():
    """BASELINE.md: mean of top-10% DrugGEN-AKT1 docking scores = -8.52
    kcal/mol (n=1000, best -10.60), computed from the reference's released
    CSV (/root/reference/results/docking/druggen_akt1_top10_docking.csv)."""
    ref = "/root/reference/results/docking/druggen_akt1_top10_docking.csv"
    if not os.path.exists(ref):
        pytest.skip("reference docking CSV not mounted")
    scores = docking_report.read_scores(ref)
    # this file is already the top-10% subset -> summarize over all of it
    s = docking_report.summarize(scores, 1.0)
    assert s["n"] == 1000
    assert s["mean"] == pytest.approx(-8.52, abs=0.01)
    assert s["best"] == pytest.approx(-10.60, abs=0.01)


def test_docking_report_cli_json_out(tmp_path):
    p = tmp_path / "scores.csv"
    _write_csv(p, ["smiles", "score"], [["C", "-5.0"], ["CC", "-7.0"]])
    out = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "docking_report.py"),
         str(p), "--json-out", str(out), "--top-frac", "0.5"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    report = json.loads(out.read_text())
    assert report["scores"]["n"] == 2
    assert report["scores"]["top50pct_mean"] == -7.0


def test_setup_data_end_to_end(tmp_path):
    """setup_data.py writes corpora, builds vocab + caches, verifies
    (reference setup.sh:140-160 verification semantics)."""
    data_dir = tmp_path / "data"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "setup_data.py"),
         "--data-dir", str(data_dir), "--n-generated", "20"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr + r.stdout
    assert "Setup complete and verified." in r.stdout
    assert (data_dir / "chembl_train.smi").exists()
    assert (data_dir / "chembl_test.smi").exists()
    assert (data_dir / "akt_train.smi").exists()
    # vocab + dense caches created
    assert (data_dir / "vocab").is_dir()
    npz = [f for f in os.listdir(data_dir) if f.endswith(".npz")]
    assert len(npz) >= 2, npz


def test_setup_data_fails_on_empty_corpus(tmp_path):
    """A corpus that filters to nothing must exit nonzero (verification)."""
    bad = tmp_path / "bad.smi"
    bad.write_text("SMILES\nnot_a_molecule\n((((\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "setup_data.py"),
         "--data-dir", str(tmp_path / "d"), "--chembl", str(bad),
         "--drug", str(bad)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode != 0
    assert "SETUP FAILED" in r.stdout

"""Tests for sample decoding/artifacts and the JSONL run logger."""

import json
import os

import numpy as np
import pytest

from druggen_tpu.chem.vocab import build_vocab
from druggen_tpu.data.corpus import DRUGLIKE_SMILES
from druggen_tpu.data.dataset import featurize_smiles
from druggen_tpu.utils.logging import RunLogger
from druggen_tpu.utils.sampling import (
    decode_batch,
    save_sample_artifacts,
    training_metrics,
)

MAX_ATOM = 25


@pytest.fixture(scope="module")
def setup():
    vocab = build_vocab(DRUGLIKE_SMILES, MAX_ATOM)
    small = [s for s in DRUGLIKE_SMILES if "[" not in s][:16]
    data = featurize_smiles(small, vocab, MAX_ATOM)
    # build "logits" that argmax back to the real molecules: one-hot * 10
    node_logits = np.eye(vocab.m_dim, dtype=np.float32)[data.x] * 10.0
    edge_logits = np.eye(vocab.b_dim, dtype=np.float32)[data.a] * 10.0
    return vocab, data, node_logits, edge_logits


def test_decode_batch_perfect_logits(setup):
    vocab, data, node_logits, edge_logits = setup
    mols, nl, el = decode_batch(node_logits, edge_logits, vocab, strict=True)
    n_valid = sum(1 for m in mols if m is not None)
    # these encode real bracket-free molecules, so all decode
    assert n_valid == len(mols)


def test_training_metrics_perfect_generator(setup):
    """If the 'generator' emits exactly the real batch, Validity and
    Uniqueness are 1 and Novelty vs the real batch is 0."""
    vocab, data, node_logits, edge_logits = setup
    m = training_metrics(node_logits, edge_logits, data.x, data.a, vocab,
                         drug_smiles=["CCO"],
                         drug_fps=np.zeros((1, 1024), np.uint8),
                         max_atom=MAX_ATOM)
    assert m["Validity"] == 1.0
    assert m["Uniqueness"] == 1.0
    assert m["Novelty"] == 0.0          # identical to the real batch
    assert m["SNN_real"] == pytest.approx(1.0)
    assert m["MaxLen"] > 0
    assert m["Atom_types"] > 0


def test_save_sample_artifacts(tmp_path, setup):
    vocab, data, node_logits, edge_logits = setup
    n = save_sample_artifacts(str(tmp_path), 0, 0, node_logits, edge_logits,
                              vocab)
    assert n == len(data)
    out = tmp_path / "1_1-epoch_iteration"
    assert (out / "samples.smi").exists()
    assert (out / "1.txt").exists()
    txt = (out / "1.txt").read_text()
    assert "edge matrix" in txt and "smiles:" in txt
    # grid image rendered
    assert (out / "samples.png").exists()


def test_run_logger(tmp_path):
    logger = RunLogger(str(tmp_path), "run1", use_wandb=False)
    logger.log({"d_loss": 1.5, "note": "hi"}, step=3, echo=False)
    logger.log({"d_loss": 1.25}, step=4, echo=True)
    jsonl = (tmp_path / "run1.jsonl").read_text().strip().splitlines()
    assert len(jsonl) == 2
    rec = json.loads(jsonl[0])
    assert rec["step"] == 3 and rec["d_loss"] == 1.5 and rec["note"] == "hi"
    # echoed line went to the text log
    assert "d_loss" in (tmp_path / "run1.txt").read_text()
    logger.finish()

"""Host-pipeline units: ThreadPrefetcher + the trainer's deferred loss
logging (log_flush_steps) — the JSONL record stream must be identical to
the reference's per-step logging (train.py:318) regardless of the flush
window."""

import json
import time

import pytest

from druggen_tpu.utils.prefetch import ThreadPrefetcher, prefetch


def test_prefetch_order_and_completeness():
    src = list(range(100))
    assert list(ThreadPrefetcher(iter(src), depth=3)) == src


def test_prefetch_disabled_passthrough():
    src = iter([1, 2, 3])
    assert prefetch(src, 0) is src


def test_prefetch_propagates_producer_exception():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = ThreadPrefetcher(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_close_stops_producer():
    produced = []

    def slow():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = ThreadPrefetcher(slow(), depth=2)
    next(it)
    it.close()
    time.sleep(0.2)
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n  # producer stopped


def test_trainer_flush_window_logs_every_step(tmp_path):
    """A flush window >1 must still write one JSONL row per optimizer step
    with correct (step, epoch, iter) and real loss values."""
    from druggen_tpu.config import TrainConfig
    from druggen_tpu.data.corpus import (
        DRUGLIKE_SMILES,
        TARGET_SMILES,
        write_corpus,
    )
    from druggen_tpu.train.trainer import Trainer

    write_corpus(str(tmp_path / "chembl.smi"), DRUGLIKE_SMILES)
    write_corpus(str(tmp_path / "drugs.smi"), TARGET_SMILES)
    cfg = TrainConfig(
        raw_file=str(tmp_path / "chembl.smi"),
        drug_raw_file=str(tmp_path / "drugs.smi"),
        submodel="DrugGEN", max_atom=25, dim=16, heads=2,
        batch_size=8, epoch=1, log_sample_step=1000,
        mol_data_dir=str(tmp_path / "cache"),
        drug_data_dir=str(tmp_path / "cache_drug"),
        log_dir=str(tmp_path / "logs"),
        sample_dir=str(tmp_path / "samples"),
        model_save_dir=str(tmp_path / "models"),
        set_seed=True, seed=7, exp_name="flush",
        log_flush_steps=4, prefetch_depth=2,
    )
    tr = Trainer(cfg)
    n_steps_expected = len(tr.data) // cfg.batch_size
    tr.train()

    rows = [json.loads(line) for line in
            open(tmp_path / "logs" / f"{cfg.run_name}.jsonl")]
    loss_rows = [r for r in rows if "d_loss" in r]
    assert len(loss_rows) == n_steps_expected
    assert [r["step"] for r in loss_rows] == list(
        range(1, n_steps_expected + 1))
    assert [r["iter"] for r in loss_rows] == list(range(n_steps_expected))
    assert all(r["epoch"] == 0 for r in loss_rows)
    # losses are real fetched floats, not placeholders
    assert all(isinstance(r["d_loss"], float) and r["d_loss"] == r["d_loss"]
               for r in loss_rows)

"""End-to-end CLI integration: train -> checkpoint -> resume -> inference
-> offline evaluation, all through the same entry points a user runs
(reference workflow: train.py -> inference.py -> results/evaluate.py).

Everything runs tiny (dim 16, N 25, 1 epoch) on the virtual CPU mesh.
"""

import csv
import json
import os

import pytest

from druggen_tpu.data.corpus import (
    DRUGLIKE_SMILES,
    TARGET_SMILES,
    write_corpus,
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    write_corpus(str(tmp / "chembl.smi"), DRUGLIKE_SMILES)
    write_corpus(str(tmp / "drugs.smi"), TARGET_SMILES)
    write_corpus(str(tmp / "test.smi"), DRUGLIKE_SMILES[:24])
    return tmp


def _train_args(tmp, epochs: int, resume: bool = False):
    args = [
        "--raw_file", str(tmp / "chembl.smi"),
        "--drug_raw_file", str(tmp / "drugs.smi"),
        "--submodel", "DrugGEN",
        "--max_atom", "25", "--dim", "16", "--heads", "2",
        "--batch_size", "8", "--epoch", str(epochs),
        "--g_lr", "1e-4", "--d_lr", "1e-4",
        "--log_sample_step", "4",
        "--mol_data_dir", str(tmp / "cache"),
        "--drug_data_dir", str(tmp / "cache_drug"),
        "--log_dir", str(tmp / "logs"),
        "--sample_dir", str(tmp / "samples"),
        "--model_save_dir", str(tmp / "models"),
        "--set_seed", "--seed", "7",
        "--exp_name", "e2e",
    ]
    if resume:
        args.append("--resume")
    return args


def test_full_pipeline(workdir):
    import train as train_cli

    train_cli.main(_train_args(workdir, epochs=1))

    # run-name-derived model dir with final state + G export
    model_root = workdir / "models"
    run_dirs = os.listdir(model_root)
    assert len(run_dirs) == 1
    model_dir = model_root / run_dirs[0]
    assert (model_dir / "DrugGEN-G.ckpt").exists()
    # periodic {epoch}-{iter}-{G,D}.ckpt saves happened (reference name scheme)
    names = os.listdir(model_dir)
    assert any(n.endswith("-G.ckpt") and n[0].isdigit() for n in names)
    assert any(n.endswith("-D.ckpt") and n[0].isdigit() for n in names)

    # training log is a readable JSONL with losses
    log_files = [f for f in os.listdir(workdir / "logs") if "e2e" in f]
    assert log_files
    with open(workdir / "logs" / log_files[0]) as f:
        records = [json.loads(line) for line in f if line.strip()]
    assert any("d_loss" in r for r in records)

    # ---- resume: a second invocation with a LONGER schedule continues
    # from the saved state (same epoch count = schedule already complete,
    # a no-op; epochs=2 = train the second epoch only).  run_name embeds
    # the epoch count, so cross-schedule resume names the source dir.
    steps_before = max(r.get("step", 0) for r in records)
    train_cli.main(_train_args(workdir, epochs=1, resume=True))
    with open(workdir / "logs" / log_files[0]) as f:
        records_noop = [json.loads(line) for line in f if line.strip()]
    assert max(r.get("step", 0) for r in records_noop) == steps_before
    train_cli.main(_train_args(workdir, epochs=2, resume=True)
                   + ["--resume_directory", str(model_dir)])
    log2 = [f for f in os.listdir(workdir / "logs")
            if "epoch2" in f and f.endswith(".jsonl")]
    with open(workdir / "logs" / log2[0]) as f:
        records2 = [json.loads(line) for line in f if line.strip()]
    assert max(r.get("step", 0) for r in records2) == 2 * steps_before
    assert min(r.get("step", 10**9) for r in records2
               if "d_loss" in r) > steps_before

    # ---- inference on the trained checkpoint
    import inference as inf_cli

    out_dir = workdir / "inf_out"
    inf_cli.main([
        "--submodel", "DrugGEN",
        "--inference_model", str(model_dir),
        "--sample_num", "8", "--inf_batch_size", "8",
        "--inf_smiles", str(workdir / "test.smi"),
        "--train_smiles", str(workdir / "chembl.smi"),
        "--train_drug_smiles", str(workdir / "drugs.smi"),
        "--max_atom", "25", "--dim", "16", "--heads", "2",
        "--mol_data_dir", str(workdir / "cache"),
        "--output_dir", str(out_dir),
    ])
    drugs_csv = out_dir / "DrugGEN" / "inference_drugs.csv"
    results_csv = out_dir / "DrugGEN" / "inference_results.csv"
    assert drugs_csv.exists() and results_csv.exists()
    with open(results_csv) as f:
        row = next(csv.DictReader(f))
    assert "validity" in row

    # ---- offline evaluation CLI.  A 1-epoch tiny G may emit zero valid
    # molecules, so evaluate the inference output when non-empty and a
    # known-good set otherwise (the CLI path under test is identical).
    import evaluate as eval_cli

    with open(drugs_csv) as f:
        n_gen = sum(1 for _ in f) - 1
    gen_path = drugs_csv
    if n_gen == 0:
        gen_path = workdir / "gen_fallback.csv"
        fallback = TARGET_SMILES[:16]
        with open(gen_path, "w") as f:
            f.write("SMILES\n")
            for s in fallback:
                f.write(s + "\n")
        n_gen = len(fallback)
    eval_cli.main([
        "--gen", str(gen_path),
        "--ref1", str(workdir / "chembl.smi"),
        "--ref2", str(workdir / "drugs.smi"),
        "--output", str(workdir / "evalout"), "--n-jobs", "0",
    ])
    with open(str(workdir / "evalout") + ".json") as f:
        res = json.load(f)
    assert 0.0 <= res["validity"] <= 1.0
    assert res["n_generated"] == n_gen


def test_train_cli_mesh_node(workdir, capsys):
    """--mesh_node from the CLI: the trainer pads 25 -> 28 vertexes and
    trains the full edge-partitioned step on the ('data','node') mesh."""
    import train as train_cli

    args = [
        "--raw_file", str(workdir / "chembl.smi"),
        "--drug_raw_file", str(workdir / "drugs.smi"),
        "--submodel", "DrugGEN",
        "--max_atom", "25", "--dim", "16", "--heads", "2",
        "--batch_size", "8", "--epoch", "1",
        "--g_lr", "1e-4", "--d_lr", "1e-4",
        "--log_sample_step", "100",
        "--mol_data_dir", str(workdir / "cache"),
        "--drug_data_dir", str(workdir / "cache_drug"),
        "--log_dir", str(workdir / "logs_en"),
        "--sample_dir", str(workdir / "samples_en"),
        "--model_save_dir", str(workdir / "models_en"),
        "--exp_name", "e2e_edge",
        "--mesh_node", "4",
    ]
    train_cli.main(args)
    out = capsys.readouterr().out
    assert "padded vertexes to 28" in out
    assert "'node': 4" in out
    import json

    log_files = [f for f in os.listdir(workdir / "logs_en")
                 if "e2e_edge" in f and f.endswith(".jsonl")]
    with open(workdir / "logs_en" / log_files[0]) as f:
        records = [json.loads(line) for line in f if line.strip()]
    import math

    assert any("d_loss" in r and math.isfinite(r["d_loss"]) for r in records)


def test_train_cli_mesh_model(workdir, capsys):
    """--mesh_model from the CLI: TP-sharded training end-to-end."""
    import train as train_cli

    args = [
        "--raw_file", str(workdir / "chembl.smi"),
        "--drug_raw_file", str(workdir / "drugs.smi"),
        "--submodel", "DrugGEN",
        "--max_atom", "25", "--dim", "16", "--heads", "2",
        "--batch_size", "8", "--epoch", "1",
        "--g_lr", "1e-4", "--d_lr", "1e-4",
        "--log_sample_step", "100",
        "--mol_data_dir", str(workdir / "cache"),
        "--drug_data_dir", str(workdir / "cache_drug"),
        "--log_dir", str(workdir / "logs_tp"),
        "--sample_dir", str(workdir / "samples_tp"),
        "--model_save_dir", str(workdir / "models_tp"),
        "--exp_name", "e2e_tp",
        "--mesh_model", "2", "--mesh_data", "4",
    ]
    train_cli.main(args)
    out = capsys.readouterr().out
    assert "'model': 2" in out
    import json
    import math

    log_files = [f for f in os.listdir(workdir / "logs_tp")
                 if "e2e_tp" in f and f.endswith(".jsonl")]
    with open(workdir / "logs_tp" / log_files[0]) as f:
        records = [json.loads(line) for line in f if line.strip()]
    assert any("d_loss" in r and math.isfinite(r["d_loss"]) for r in records)


def test_sampling_cadence_spans_epochs(tmp_path):
    """log_sample_step larger than steps-per-epoch must still fire: the
    cadence runs on the GLOBAL step (regression: the per-epoch iter counter
    never reached the threshold, so long runs with short epochs wrote no
    samples or mid-run checkpoints)."""
    import train as train_cli

    write_corpus(str(tmp_path / "chembl.smi"), DRUGLIKE_SMILES)
    write_corpus(str(tmp_path / "drugs.smi"), TARGET_SMILES)
    # 30 mols / batch 8 -> 3 steps per epoch; sample step 7 > 3
    train_cli.main([
        "--raw_file", str(tmp_path / "chembl.smi"),
        "--drug_raw_file", str(tmp_path / "drugs.smi"),
        "--submodel", "DrugGEN",
        "--max_atom", "25", "--dim", "16", "--heads", "2",
        "--batch_size", "8", "--epoch", "4",
        "--log_sample_step", "7",
        "--mol_data_dir", str(tmp_path / "cache"),
        "--drug_data_dir", str(tmp_path / "cache_drug"),
        "--log_dir", str(tmp_path / "logs"),
        "--sample_dir", str(tmp_path / "samples"),
        "--model_save_dir", str(tmp_path / "models"),
        "--set_seed", "--seed", "7",
        "--exp_name", "cadence",
    ])
    model_root = tmp_path / "models"
    model_dir = model_root / os.listdir(model_root)[0]
    periodic = [n for n in os.listdir(model_dir)
                if n.endswith("-G.ckpt") and n[0].isdigit()]
    # 4 epochs x 3 steps = 12 global steps -> fires at step 7 (and not 14)
    assert periodic, "global-step cadence never fired across epochs"


def test_resume_exact_continuation(tmp_path):
    """Auto-resume continues the ORIGINAL schedule bit-exactly: 1 epoch +
    resume-to-2 produces the same final G export as an unbroken 2-epoch
    run (step-folded PRNG + full-state checkpoint + stream fast-forward)."""
    import train as train_cli

    write_corpus(str(tmp_path / "chembl.smi"), DRUGLIKE_SMILES)
    write_corpus(str(tmp_path / "drugs.smi"), TARGET_SMILES)

    def args(sub, epochs):
        d = tmp_path / sub
        return [
            "--raw_file", str(tmp_path / "chembl.smi"),
            "--drug_raw_file", str(tmp_path / "drugs.smi"),
            "--submodel", "DrugGEN",
            "--max_atom", "25", "--dim", "16", "--heads", "2",
            "--batch_size", "8", "--epoch", str(epochs),
            "--log_sample_step", "1000",
            "--mol_data_dir", str(tmp_path / "cache"),
            "--drug_data_dir", str(tmp_path / "cache_drug"),
            "--log_dir", str(d / "logs"),
            "--sample_dir", str(d / "samples"),
            "--model_save_dir", str(d / "models"),
            "--set_seed", "--seed", "7",
            "--exp_name", "cont",
        ]

    train_cli.main(args("unbroken", 2))
    train_cli.main(args("resumed", 1))
    r1_root = tmp_path / "resumed" / "models"
    r1_dir = r1_root / os.listdir(r1_root)[0]
    train_cli.main(args("resumed", 2) + ["--resume",
                                         "--resume_directory", str(r1_dir)])

    def g_bytes(sub):
        root = tmp_path / sub / "models"
        cands = [n for n in os.listdir(root) if "epoch2" in n]
        with open(root / cands[0] / "DrugGEN-G.ckpt", "rb") as f:
            return f.read()

    assert g_bytes("unbroken") == g_bytes("resumed")


def test_gp_f32_auto_escalation(tmp_path):
    """gp_f32="auto": trainer starts on the all-bf16 step and can swap in
    the f32-GP program mid-run against the same state (PERF.md round 4:
    full speed in the healthy regime, self-healing at the NaN frontier)."""
    import numpy as np

    from druggen_tpu.config import parse_train_args
    from druggen_tpu.train.trainer import Trainer

    write_corpus(str(tmp_path / "chembl.smi"), DRUGLIKE_SMILES)
    write_corpus(str(tmp_path / "drugs.smi"), TARGET_SMILES)
    cfg = parse_train_args([
        "--raw_file", str(tmp_path / "chembl.smi"),
        "--drug_raw_file", str(tmp_path / "drugs.smi"),
        "--submodel", "DrugGEN", "--max_atom", "25", "--dim", "16",
        "--heads", "2", "--batch_size", "8", "--epoch", "1",
        "--compute_dtype", "bf16",
        "--mol_data_dir", str(tmp_path / "c"),
        "--drug_data_dir", str(tmp_path / "cd"),
        "--log_dir", str(tmp_path / "l"),
        "--sample_dir", str(tmp_path / "s"),
        "--model_save_dir", str(tmp_path / "m"),
        "--set_seed", "--seed", "7", "--exp_name", "esc"])
    assert cfg.gp_f32 == "auto"
    tr = Trainer(cfg)
    assert tr._gp_escalation_armed
    import jax.numpy as jnp

    x = jnp.zeros((8, 25), jnp.int8)
    a = jnp.zeros((8, 25, 25), jnp.int8)
    st1, m1, _ = tr.step_fn(tr.state, tr.key, x, a, x, a)
    tr.state = st1
    tr._escalate_gp()           # swap to the f32-GP program
    assert not tr._gp_escalation_armed
    st2, m2, _ = tr.step_fn(tr.state, tr.key, x, a, x, a)
    assert np.isfinite(float(m2["d_loss"]))
    # off/on parse variants
    for v in ("on", "off"):
        c = parse_train_args([
            "--raw_file", "x.smi", "--submodel", "NoTarget",
            "--gp_f32", v])
        assert c.gp_f32 == v

"""Inference engine.

The analogue of the reference ``Inference`` class (``inference.py:30-290``):
load a trained generator, stream an inference dataset through it, argmax
decode to molecules, keep the largest fragment with ``*``->``C``, loop until
``sample_num`` valid molecules are collected, then compute the 13-metric
report and write ``inference_drugs.csv`` + ``inference_results.csv``.

TPU-first differences: batches are jitted through G in one compiled program
per batch size (default inference batch 1 in the reference wastes the chip;
our default batches the whole request), decode happens host-side off the
hot path.
"""

from __future__ import annotations

import dataclasses
import os
import time
import warnings

import numpy as np

import jax
import jax.numpy as jnp

from druggen_tpu.chem.canon import mol_to_smiles
from druggen_tpu.chem.codec import matrices_to_mol, strip_to_largest_fragment
from druggen_tpu.chem.fingerprints import fingerprints_for_smiles, morgan_fingerprint
from druggen_tpu.chem.smiles import mol_from_smiles
from druggen_tpu.chem.vocab import Vocab, get_vocab, read_smiles_file
from druggen_tpu.config import InferenceConfig
from druggen_tpu.data.dataset import BatchIterator, load_dataset
from druggen_tpu.metrics import molecular as mm
from druggen_tpu.metrics.descriptor_metrics import mean_qed, mean_sa
from druggen_tpu.models import Generator
from druggen_tpu.train import checkpoint as ckpt


class InferenceEngine:
    def __init__(self, cfg: InferenceConfig, vocab: Vocab | None = None,
                 g_params=None):
        self.cfg = cfg
        if cfg.platform:
            jax.config.update("jax_platforms", cfg.platform)
        self.vocab = vocab or get_vocab(
            cfg.train_smiles, cfg.train_drug_smiles, cfg.max_atom,
            cache_dir=os.path.join(cfg.mol_data_dir, "vocab"),
            union_ref12=getattr(cfg, "vocab_ref12", False))
        self.data = load_dataset(cfg.inf_smiles, self.vocab, cfg.max_atom,
                                 cfg.mol_data_dir)
        self.m_dim = self.vocab.m_dim
        self.b_dim = self.vocab.b_dim
        self.vertexes = int(self.data.x.shape[1])
        self.compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                              else jnp.float32)
        if self.compute_dtype == jnp.float32 and getattr(cfg, "fused_mlp",
                                                         False):
            # The fused-MLP kernel tiles are sized for bf16; at f32 it
            # measured ~3x slower than XLA (PERF.md inference table), so
            # mirror bench.py's guard rather than run the known-bad combo.
            warnings.warn("fused_mlp with compute_dtype=float32 is ~3x "
                          "slower than plain XLA (bf16-sized kernel tiles); "
                          "disabling fused_mlp. Use bfloat16 to keep it.",
                          stacklevel=2)
            cfg = dataclasses.replace(cfg, fused_mlp=False)
            self.cfg = cfg
        self.G = Generator(act=cfg.act, vertexes=self.vertexes,
                           edges=self.b_dim, nodes=self.m_dim,
                           dropout=cfg.dropout, dim=cfg.dim, depth=cfg.depth,
                           heads=cfg.heads, mlp_ratio=cfg.mlp_ratio,
                           dtype=None if self.compute_dtype == jnp.float32
                           else self.compute_dtype,
                           use_pallas=cfg.use_pallas,
                           fused_mlp=getattr(cfg, "fused_mlp", False))
        if g_params is not None:
            self.g_params = g_params
        else:
            template = self.G.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, self.vertexes, self.vertexes, self.b_dim)),
                jnp.zeros((1, self.vertexes, self.m_dim)))
            path = os.path.join(cfg.inference_model,
                                f"{cfg.submodel}-G.ckpt")
            # auto-converts scan_layers (stacked blocks/block) checkpoints
            # into this engine's unrolled Generator layout, and vice versa
            self.g_params = ckpt.load_params_auto(path, template)

        if cfg.use_pallas:
            # v4 fully-fused generator kernel (ops/fused_generator.py): the
            # whole forward runs in VMEM, one grid step per graph.  Real
            # one-hot adjacencies are symmetric, satisfying the kernel's
            # precondition.
            from druggen_tpu.ops.fused_generator import (
                fused_generator_logits,
            )

            @jax.jit
            def forward(params, a_labels, x_labels):
                a = jax.nn.one_hot(a_labels, self.b_dim,
                                   dtype=self.compute_dtype)
                x = jax.nn.one_hot(x_labels, self.m_dim,
                                   dtype=self.compute_dtype)
                node_logits, edge_logits = fused_generator_logits(
                    params, a, x, heads=cfg.heads)
                return (jnp.argmax(node_logits, -1).astype(jnp.int32),
                        jnp.argmax(edge_logits, -1).astype(jnp.int32))
        else:
            @jax.jit
            def forward(params, a_labels, x_labels):
                a = jax.nn.one_hot(a_labels, self.b_dim,
                                   dtype=self.compute_dtype)
                x = jax.nn.one_hot(x_labels, self.m_dim,
                                   dtype=self.compute_dtype)
                _, _, node_logits, edge_logits = self.G.apply(params, a, x)
                return (jnp.argmax(node_logits, -1).astype(jnp.int32),
                        jnp.argmax(edge_logits, -1).astype(jnp.int32))

        self._forward = forward

    # ------------------------------------------------------------------
    def sample(self, sample_num: int | None = None,
               max_batches: int | None = None, seed_offset: int = 0):
        """Run the sampling loop (reference inference.py:180-229).

        Like the reference, keeps sampling until ``sample_num`` VALID
        molecules are collected (the reference loops until its counter
        fills, inference.py:226-228) — there is no fixed batch cap unless
        ``max_batches``/``cfg.inf_max_batches`` sets one (the
        fixed-sample-budget mode checkpoint screening uses).  A dead
        generator is caught by a stagnation guard (no new valid molecule
        across ``stall_batches`` consecutive batches) instead of a budget
        that silently truncates healthy runs (the round-4 10k set stopped
        at 9,800 because of exactly such a cap).

        Returns (kept_smiles, all_decoded [incl. None], node_label_rows,
        real_mols_first_per_batch)."""
        cfg = self.cfg
        sample_num = sample_num or cfg.sample_num
        batch = max(cfg.inf_batch_size, 1)
        # seed_offset: a fresh shuffle for top-up rounds (the generator is
        # deterministic per input graph, so re-walking the same stream
        # would reproduce the same molecules)
        it = iter(BatchIterator(self.data, batch,
                                seed=cfg.seed + seed_offset, loop=True,
                                drop_last=True))
        kept: list[str] = []
        all_decoded: list[str | None] = []
        node_rows: list[np.ndarray] = []
        real_first: list = []
        n_batches = 0
        none_counter = 0
        limit = max_batches or getattr(cfg, "inf_max_batches", 0) or 0
        stall_batches = max(200, 2 * sample_num // batch)
        last_progress_batch = 0
        while len(kept) < sample_num and (limit == 0
                                          or n_batches < limit):
            if n_batches - last_progress_batch >= stall_batches:
                print(f"sampling stalled: no valid molecule in the last "
                      f"{stall_batches} batches "
                      f"({len(kept)}/{sample_num} collected) — stopping",
                      flush=True)
                break
            x, a = next(it)
            n_labels, e_labels = self._forward(self.g_params, a, x)
            n_labels = np.asarray(n_labels)
            e_labels = np.asarray(e_labels)
            for bi in range(batch):
                mol = matrices_to_mol(n_labels[bi], e_labels[bi], self.vocab,
                                      strict=False)
                smi = None if mol is None else mol_to_smiles(mol)
                if smi is not None:
                    smi = strip_to_largest_fragment(smi)
                    if mol_from_smiles(smi) is None:
                        smi = None
                if smi is None:
                    none_counter += 1
                    all_decoded.append(None)
                else:
                    kept.append(smi)
                    all_decoded.append(smi)
                    node_rows.append(n_labels[bi])
                    last_progress_batch = n_batches
                if len(kept) >= sample_num:
                    break
            # real molecule bookkeeping for SNN (reference keeps the first
            # real mol of each batch, inference.py:225)
            real = matrices_to_mol(np.asarray(x)[0], np.asarray(a)[0],
                                   self.vocab, strict=True)
            if real is not None:
                real_first.append(real)
            n_batches += 1
            if none_counter >= sample_num and not kept:
                break
        return kept, all_decoded, node_rows, real_first

    # ------------------------------------------------------------------
    def run(self) -> dict:
        """Full inference + metric report (reference inference.py:141-290)."""
        cfg = self.cfg
        out_dir = os.path.join(cfg.output_dir, cfg.submodel)
        os.makedirs(out_dir, exist_ok=True)

        chembl_smiles = read_smiles_file(cfg.train_smiles)
        chembl_test = read_smiles_file(cfg.inf_smiles)
        drug_smiles = read_smiles_file(cfg.train_drug_smiles)
        drug_fps = fingerprints_for_smiles(drug_smiles)

        t0 = time.time()
        kept, all_decoded, node_rows, real_first = self.sample()
        gen_smi = kept
        if not cfg.disable_correction:
            from druggen_tpu.infer.corrector import SmilesCorrector

            corrector = SmilesCorrector.default(out_dir)
            gen_smi = corrector.correct(kept)
            # the correction pipeline standardizes + DEDUPES, so the
            # delivered set can shrink below sample_num (the round-4 10k
            # set came out at 9,800).  The reference's contract is
            # sample_num molecules delivered (inference.py:226-228 +
            # 10,001-line released CSVs) — top up with fresh samples until
            # the corrected set reaches it.
            rounds = 0
            while len(gen_smi) < cfg.sample_num and rounds < 20:
                rounds += 1
                need = cfg.sample_num - len(gen_smi)
                ex_kept, ex_dec, ex_rows, _ = self.sample(
                    sample_num=max(2 * need, 64), seed_offset=rounds)
                if not ex_kept:
                    break
                kept += ex_kept
                all_decoded += ex_dec
                node_rows += ex_rows
                have = set(gen_smi)
                for s in corrector.correct(ex_kept):
                    if s not in have:
                        have.add(s)
                        gen_smi.append(s)
                        if len(gen_smi) >= cfg.sample_num:
                            break
                print(f"correction top-up round {rounds}: "
                      f"{len(gen_smi)}/{cfg.sample_num}", flush=True)
        elapsed = time.time() - t0
        print(f"Inference lasted {elapsed:.2f} seconds "
              f"({len(kept)} raw, {len(gen_smi)} after correction)")

        gen_fps = fingerprints_for_smiles(kept)
        real_fps = (np.stack([morgan_fingerprint(m) for m in real_first])
                    if real_first else np.zeros((0, 1024), np.uint8))

        sample_num = cfg.sample_num
        if not cfg.disable_correction:
            validity = round(len(gen_smi) / sample_num, 3)
        else:
            validity = round(mm.fraction_valid(gen_smi), 3)

        results = {
            "submodel": cfg.submodel,
            "validity": validity,
            # raw generator success rate over ALL decode attempts — in
            # correction mode `validity` divides by the request size, which
            # conflates generator quality with engine behavior (round-4
            # VERDICT weak #5); this column is cap-independent
            "generator_validity": round(
                len(kept) / max(len(all_decoded), 1), 3),
            "uniqueness": round(mm.fraction_unique(gen_smi), 3),
            # corpus-side canonical sets are parallel + disk-cached: at
            # reference scale (1.59M molecules) the serial re-scan was
            # 40+ min per report (PERF.md round 4)
            "novelty": round(mm.novelty(
                gen_smi, chembl_smiles,
                train_canon=mm.canonical_set(
                    chembl_smiles, n_jobs=2,
                    cache_for=cfg.train_smiles)), 3),
            "novelty_inference": round(mm.novelty(
                gen_smi, chembl_test,
                train_canon=mm.canonical_set(
                    chembl_test, n_jobs=2,
                    cache_for=cfg.inf_smiles)), 3),
            "novelty_real_inhibitor": round(mm.novelty(gen_smi, drug_smiles), 3),
            "ave_len": round(mm.max_component(gen_smi, self.vertexes), 3),
            "mean_atom_type": round(mm.mean_atom_type(node_rows), 3)
            if node_rows else 0.0,
            "snn_chembl": round(mm.average_agg_tanimoto(real_fps, gen_fps), 3)
            if len(real_fps) and len(gen_fps) else 0.0,
            "snn_real_inhibitor": round(
                mm.average_agg_tanimoto(drug_fps, gen_fps), 3)
            if len(drug_fps) and len(gen_fps) else 0.0,
            "IntDiv": round(mm.internal_diversity(gen_fps)[0], 3)
            if len(gen_fps) else 0.0,
            "qed": round(mean_qed(gen_smi), 3),
            "sa": round(mean_sa(gen_smi), 3),
        }
        for k, v in results.items():
            print(f"{k}: {v}")

        # CSV outputs (reference inference.py:280-290)
        self._write_csv(os.path.join(out_dir, "inference_results.csv"),
                        [results])
        self._write_csv(os.path.join(out_dir, "inference_drugs.csv"),
                        [{"SMILES": s} for s in gen_smi])
        return results

    @staticmethod
    def _write_csv(path: str, rows: list[dict]) -> None:
        import csv

        if not rows:
            with open(path, "w") as f:
                f.write("SMILES\n")
            return
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)

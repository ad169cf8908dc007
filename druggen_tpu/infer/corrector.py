"""SMILES correction pipeline.

The reference ships a pretrained seq2seq SMILES-token transformer
(``src/util/smiles_cor.py``, adapted from LindeSchoenmaker/SMILES-corrector)
that rewrites invalid SMILES into valid ones, then standardizes + dedupes
(``smiles_cor.py:1219-1283``).  Its weights come from a Google Drive
download that is unavailable offline, so this module provides

- :class:`SmilesCorrector` — the pipeline driver with the reference's
  post-processing (standardize -> desalt/largest-fragment -> dedup -> drop
  invalid), and
- an optional **neural hook**: if a trained
  :class:`druggen_tpu.infer.seq2seq.Seq2SeqCorrector` checkpoint is
  supplied, invalid SMILES are run through its greedy decoder first,
  exactly where the reference calls ``correct_SMILES``
  (``smiles_cor.py:1180-1215``).

``--disable_correction`` parity is handled by the caller (the reference
makes correction optional too, ``inference.py:157,300``).
"""

from __future__ import annotations

import os

from druggen_tpu.chem.canon import canonical_smiles
from druggen_tpu.chem.codec import strip_to_largest_fragment
from druggen_tpu.chem.smiles import mol_from_smiles


class SmilesCorrector:
    def __init__(self, out_dir: str | None = None, neural=None):
        self.out_dir = out_dir
        self.neural = neural          # optional Seq2SeqCorrector

    @classmethod
    def default(cls, out_dir: str | None = None) -> "SmilesCorrector":
        """Rule-based pipeline; attaches a neural corrector when one is
        configured:

        - ``$DRUGGEN_CORRECTOR_CKPT`` — a Seq2SeqCorrector trained by
          ``scripts/train_corrector.py``;
        - ``$DRUGGEN_REFERENCE_CORRECTOR`` —
          ``model.pkg:src_vocab.pth:trg_vocab.pth`` paths of the
          reference's released corrector (e.g. PAPYRUS_200), run through
          the weight-compatible re-implementation
          (interop/corrector_ckpt.ReferenceCorrector)."""
        neural = None
        ref_spec = os.environ.get("DRUGGEN_REFERENCE_CORRECTOR", "")
        ckpt_path = os.environ.get("DRUGGEN_CORRECTOR_CKPT", "")
        if ref_spec:
            try:
                from druggen_tpu.interop.corrector_ckpt import (
                    ReferenceCorrector,
                )

                if os.path.isdir(ref_spec):
                    # a from-scratch-trained reference-topology dir
                    # (scripts/train_corrector.py --arch reference)
                    neural = ReferenceCorrector.load_trained(ref_spec)
                else:
                    neural = ReferenceCorrector.load(*ref_spec.split(":"))
            except Exception as e:
                print(f"reference corrector unavailable ({e}); "
                      "falling back")
        if neural is None and ckpt_path and os.path.exists(ckpt_path):
            try:
                from druggen_tpu.infer.seq2seq import Seq2SeqCorrector

                neural = Seq2SeqCorrector.load(ckpt_path)
            except Exception as e:
                print(f"neural corrector unavailable ({e}); rule-based only")
        return cls(out_dir, neural)

    def correct(self, smiles_list: list[str]) -> list[str]:
        """Reference ``smi_correct.correct`` semantics
        (``smiles_cor.py:1262-1283``): split valid/invalid, neural-correct
        the invalid when possible, standardize, dedupe (keeping order)."""
        valid, invalid = [], []
        for s in smiles_list:
            if s is None:
                continue
            if mol_from_smiles(s) is not None:
                valid.append(s)
            else:
                invalid.append(s)
        if self.neural is not None and invalid:
            # one compiled batch when the corrector supports it (both
            # Seq2SeqCorrector and ReferenceCorrector do)
            if hasattr(self.neural, "translate_batch"):
                fixes = self.neural.translate_batch(invalid)
            else:
                fixes = [self.neural.translate(s) for s in invalid]
            for fixed in fixes:
                if fixed and mol_from_smiles(fixed) is not None:
                    valid.append(fixed)

        out: list[str] = []
        seen: set[str] = set()
        for s in valid:
            std = self.standardize(s)
            if std is None or std in seen:
                continue
            seen.add(std)
            out.append(std)
        if self.out_dir:
            os.makedirs(self.out_dir, exist_ok=True)
            with open(os.path.join(self.out_dir, "corrected.smi"), "w") as f:
                f.write("\n".join(out) + ("\n" if out else ""))
        return out

    @staticmethod
    def standardize(smiles: str) -> str | None:
        """Standardization + desalting (the reference delegates to
        chembl_structure_pipeline, ``smiles_cor.py:1240-1260``): keep the
        largest fragment, re-canonicalize."""
        frag = strip_to_largest_fragment(smiles)
        return canonical_smiles(frag)

"""Self-contained chemistry runtime.

The reference delegates all chemistry to RDKit's C++ core (see reference
``src/data/dataset.py:13``, ``src/util/utils.py:21-31``).  This package is our
own implementation of the subset of that functionality the framework needs:

- :mod:`periodic`      — element tables (symbols, valences, masses).
- :mod:`mol`           — the molecular graph object + sanitization.
- :mod:`smiles`        — SMILES parser (``mol_from_smiles``).
- :mod:`canon`         — canonical ranking + SMILES writer (``mol_to_smiles``).
- :mod:`fingerprints`  — Morgan/ECFP-style hashed bit fingerprints.
- :mod:`descriptors`   — physchem descriptors (MW, TPSA, logP, QED, SA, ...).
- :mod:`vocab`         — atom/bond encoders-decoders (reference
  ``src/data/utils.py:26-126``).
- :mod:`codec`         — graph <-> dense matrices codec (reference
  ``src/data/dataset.py:119-185,205-277``).

If RDKit happens to be importable it can be used for cross-validation, but
nothing in this package requires it.
"""

from druggen_tpu.chem.mol import Atom, Bond, Mol, SanitizeError, BondType
from druggen_tpu.chem.smiles import mol_from_smiles, SmilesParseError
from druggen_tpu.chem.canon import mol_to_smiles, canonical_smiles

__all__ = [
    "Atom",
    "Bond",
    "Mol",
    "BondType",
    "SanitizeError",
    "SmilesParseError",
    "mol_from_smiles",
    "mol_to_smiles",
    "canonical_smiles",
]

"""ctypes bindings for the native chem kernel (libdruggen_chem.so).

Builds lazily with ``make`` on first use if the shared object is missing
and a toolchain is available; everything degrades gracefully to the pure
Python implementation in :mod:`druggen_tpu.chem` (same semantics —
cross-validated in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdruggen_chem.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.dg_abi_version.restype = ctypes.c_int
    if lib.dg_abi_version() != 1:
        return None
    lib.dg_featurize.restype = ctypes.c_int
    lib.dg_featurize.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8)]
    lib.dg_featurize_batch.restype = None
    lib.dg_featurize_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    if hasattr(lib, "dg_vocab_scan"):  # absent in pre-r4 prebuilt .so
        lib.dg_vocab_scan.restype = None
        lib.dg_vocab_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _vocab_arrays(vocab):
    atom = np.asarray(vocab.atom_labels, dtype=np.int64)
    bond = np.asarray(vocab.bond_labels, dtype=np.int64)
    return atom, bond


def featurize_smiles_native(smiles: str, vocab, max_atom: int):
    """Single-molecule native featurization; None if rejected (same contract
    as chem.codec.smiles_to_matrices)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native chem kernel unavailable")
    atom, bond = _vocab_arrays(vocab)
    X = np.zeros(max_atom, dtype=np.int8)
    A = np.zeros((max_atom, max_atom), dtype=np.int8)
    r = lib.dg_featurize(
        smiles.encode(), max_atom,
        atom.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(atom),
        bond.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(bond),
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    if r <= 0:
        return None
    return X, A


def featurize_batch_native(smiles_list, vocab, max_atom: int,
                           n_threads: int = 0):
    """Multithreaded batch featurization.

    Returns (X [M,N] int8, A [M,N,N] int8, kept_indices list[int])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native chem kernel unavailable")
    atom, bond = _vocab_arrays(vocab)
    buf = "\n".join(smiles_list).encode()
    offsets = np.zeros(len(smiles_list), dtype=np.int64)
    pos = 0
    for i, s in enumerate(smiles_list):
        offsets[i] = pos
        pos += len(s.encode()) + 1
    n = len(smiles_list)
    X = np.zeros((n, max_atom), dtype=np.int8)
    A = np.zeros((n, max_atom, max_atom), dtype=np.int8)
    keep = np.zeros(n, dtype=np.int32)
    lib.dg_featurize_batch(
        buf, len(buf), n,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_atom,
        atom.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(atom),
        bond.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(bond),
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    kept = np.nonzero(keep > 0)[0]
    return X[kept], A[kept], kept.tolist()


def vocab_scan_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "dg_vocab_scan")


def vocab_scan_native(smiles_list, max_atom: int, n_threads: int = 0):
    """Multithreaded vocabulary scan: returns (atomic_nums, bond_types) as
    sorted lists of ints present across molecules that parse and have
    <= max_atom atoms (build_vocab semantics, reference
    src/data/utils.py:83-109)."""
    lib = _load()
    if lib is None or not hasattr(lib, "dg_vocab_scan"):
        raise RuntimeError("native vocab scan unavailable")
    buf = "\n".join(smiles_list).encode()
    offsets = np.zeros(len(smiles_list), dtype=np.int64)
    pos = 0
    for i, s in enumerate(smiles_list):
        offsets[i] = pos
        pos += len(s.encode()) + 1
    atom_mask = np.zeros(256, dtype=np.uint8)
    bond_mask = np.zeros(64, dtype=np.uint8)
    lib.dg_vocab_scan(
        buf, len(buf), len(smiles_list),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_atom,
        atom_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bond_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    return (np.nonzero(atom_mask)[0].tolist(),
            np.nonzero(bond_mask)[0].tolist())

"""Physicochemical descriptors.

Replaces the RDKit descriptor calls used by the reference metrics
(``QED.qed`` and ``sascorer.calculateScore`` in ``inference.py:264-265``,
``Descriptors/Lipinski/Crippen/rdMolDescriptors`` in
``src/util/utils.py:627-665``).

Implementation notes:

- **logP** is the exact Wildman-Crippen model — the published 68-type
  SMARTS table evaluated on the from-scratch SMARTS engine
  (:mod:`druggen_tpu.chem.crippen`), verified against known RDKit
  ``Crippen.MolLogP`` values.  The round-1 compact approximation remains
  as :func:`crippen_logp_procedural`.
- **TPSA** implements Ertl's published N/O contribution table (the default
  RDKit mode, which also ignores S/P).
- **H-bond counts** are SMARTS-based, matching RDKit's
  ``Lipinski.NumHDonors`` / ``NumHAcceptors`` definitions (used by the
  reference at utils.py:642-643) and QED's own acceptor catalogue.
- **QED** uses the published Bickerton et al. (2012) ADS parameters and
  mean weights, with HBA/HBD computed per RDKit's ``QED.properties``
  (QED acceptor SMARTS list / CalcNumHBD); the ALERTS descriptor uses the
  catalogue in :mod:`druggen_tpu.chem.alerts`.
- **SA score** implements Ertl & Schuffenhauer's formula exactly —
  duplicate-counted fragment score, size/stereo/spiro/bridge/macrocycle
  penalties, symmetry correction, and the published 1..10 mapping with
  its ``+1`` offset quirk (RDKit contrib ``sascorer.calculateScore``) —
  and replaces the PubChem-derived fragment-frequency database (shipped
  as a pickle with RDKit, unavailable offline) with a frequency table
  built from this package's corpus via :func:`build_fragment_scores` —
  same formula, documented different prior.
"""

from __future__ import annotations

import math

from druggen_tpu.chem import periodic
from druggen_tpu.chem.mol import BondType, Mol

# ---------------------------------------------------------------- weights

def mol_weight(mol: Mol) -> float:
    return mol.mol_weight()


def exact_mol_weight(mol: Mol) -> float:
    return mol.exact_mol_weight()


def heavy_atom_count(mol: Mol) -> int:
    return mol.num_atoms()


# ---------------------------------------------------------------- H bonds

# RDKit Lipinski.HDonorSmarts / HAcceptorSmarts — the definitions behind
# the reference's Lipinski.NumHDonors / NumHAcceptors (utils.py:642-643).
_HDONOR_SMARTS = ("[$([N;!H0;v3]),$([N;!H0;+1;v4]),$([O,S;H1;+0]),"
                  "$([n;H1;+0])]")
_HACCEPTOR_SMARTS = ("[$([O,S;H1;v2]-[!$(*=[O,N,P,S])]),$([O,S;H0;v2]),"
                     "$([O,S;-]),$([N;v3;!$(N-*=!@[O,N,P,S])]),"
                     "$([nH0,o,s;+0])]")

# RDKit QED.Acceptors — QED's own HBA catalogue (counts matches per
# pattern, summed; rdkit/Chem/QED.py)
_QED_ACCEPTOR_SMARTS = (
    "[oH0;X2]", "[OH1;X2;v2]", "[OH0;X2;v2]", "[OH0;X1;v2]", "[O-;X1]",
    "[SH0;X2;v2]", "[SH0;X1;v2]", "[S-;X1]", "[nH0;X2]", "[NH0;X1;v3]",
    "[$([N;+0;X3;v3]);!$(N[C,S]=O)]",
)


def _n_matching(smarts: str, mol: Mol) -> int:
    from druggen_tpu.chem.smarts import compile_smarts

    return len(compile_smarts(smarts).matching_atoms(mol))


def num_h_donors(mol: Mol) -> int:
    """RDKit ``Lipinski.NumHDonors`` (= ``CalcNumHBD``): SMARTS-defined
    donor atoms (reference utils.py:642)."""
    return _n_matching(_HDONOR_SMARTS, mol)


def num_h_acceptors(mol: Mol) -> int:
    """RDKit ``Lipinski.NumHAcceptors``: SMARTS-defined acceptor atoms
    (reference utils.py:643)."""
    return _n_matching(_HACCEPTOR_SMARTS, mol)


def qed_h_acceptors(mol: Mol) -> int:
    """QED's HBA term: total matches over the QED acceptor catalogue
    (rdkit/Chem/QED.py Acceptors)."""
    return sum(_n_matching(p, mol) for p in _QED_ACCEPTOR_SMARTS)


# ---------------------------------------------------------------- rotors

def num_rotatable_bonds(mol: Mol) -> int:
    """Acyclic single bonds between two non-terminal heavy atoms, excluding
    amide C-N (the strict RDKit definition)."""
    ring_bonds = set()
    for r in mol.ring_info():
        for i in range(len(r)):
            ring_bonds.add(frozenset((r[i], r[(i + 1) % len(r)])))
    count = 0
    for b in mol.bonds:
        if b.type != BondType.SINGLE:
            continue
        if frozenset((b.a1, b.a2)) in ring_bonds:
            continue
        if mol.degree(b.a1) < 2 or mol.degree(b.a2) < 2:
            continue
        if _is_amide_bond(mol, b.a1, b.a2) or _is_amide_bond(mol, b.a2, b.a1):
            continue
        count += 1
    return count


def _is_amide_bond(mol: Mol, c_idx: int, n_idx: int) -> bool:
    if mol.atoms[c_idx].atomic_num != 6 or mol.atoms[n_idx].atomic_num != 7:
        return False
    for j in mol.neighbors(c_idx):
        bond = mol.get_bond(c_idx, j)
        if (mol.atoms[j].atomic_num == 8 and bond is not None
                and bond.type == BondType.DOUBLE):
            return True
    return False


# ---------------------------------------------------------------- rings

def num_aromatic_rings(mol: Mol) -> int:
    return sum(1 for r in mol.ring_info()
               if all(mol.atoms[i].aromatic for i in r))


def num_rings(mol: Mol) -> int:
    return mol.num_rings()


# ---------------------------------------------------------------- TPSA

def tpsa(mol: Mol) -> float:
    """Ertl topological polar surface area: published N/O contribution
    table (RDKit default mode — S/P contribute 0)."""
    total = 0.0
    for i, a in enumerate(mol.atoms):
        h = a.total_hs()
        deg = mol.degree(i)
        btypes = sorted(int(mol.bonds[bi].type) for bi in mol.adj()[i])
        n_triple = btypes.count(int(BondType.TRIPLE))
        n_double = btypes.count(int(BondType.DOUBLE))
        if a.atomic_num == 7:
            if a.aromatic:
                if h >= 1:
                    total += 15.79
                elif deg == 3:
                    total += 4.93 if a.charge == 0 else 4.10
                else:
                    total += 12.89 if a.charge == 0 else 3.01
            elif a.charge == 0:
                if n_triple >= 1:
                    total += 23.79
                elif n_double >= 2:
                    total += 11.68
                elif n_double == 1:
                    total += 23.85 if h >= 1 else 12.36
                elif h >= 2:
                    total += 26.02
                elif h == 1:
                    total += 12.03
                else:
                    total += 3.24
            else:  # charged N
                if h >= 3:
                    total += 27.64
                elif h == 2:
                    total += 16.61
                elif h == 1:
                    total += 4.44
                else:
                    total += 0.0
        elif a.atomic_num == 8:
            if a.aromatic:
                total += 13.14
            elif a.charge == -1:
                total += 23.06
            elif n_double >= 1:
                total += 17.07
            elif h >= 1:
                total += 20.23
            else:
                total += 9.23
    return total


# ---------------------------------------------------------------- logP

def crippen_logp(mol: Mol) -> float:
    """Exact Wildman-Crippen logP (RDKit ``Crippen.MolLogP``; reference
    utils.py:641, QED's ALOGP).  Full published SMARTS table — see
    :mod:`druggen_tpu.chem.crippen`."""
    from druggen_tpu.chem.crippen import crippen_logp as _exact

    return _exact(mol)


# Round-1 compact approximation, kept for reference/fallback.
_LOGP_HETERO_H = -0.2677      # H on N/O
_LOGP_CARBON_H = 0.1230       # H on C


def _logp_atom(mol: Mol, i: int) -> float:
    a = mol.atoms[i]
    z = a.atomic_num
    nbr_z = [mol.atoms[j].atomic_num for j in mol.neighbors(i)]
    n_hetero = sum(1 for x in nbr_z if x not in (6, 1))
    if z == 6:
        if a.aromatic:
            return 0.2955 if n_hetero else 0.1581
        return 0.08 if n_hetero else 0.1441
    if z == 7:
        if a.aromatic:
            return -0.3239
        if a.charge > 0:
            return -1.95
        return -1.0190 if not any(
            mol.bonds[bi].type == BondType.DOUBLE for bi in mol.adj()[i]) \
            else -0.3396
    if z == 8:
        if a.aromatic:
            return 0.1552
        for bi in mol.adj()[i]:
            if mol.bonds[bi].type == BondType.DOUBLE:
                return -0.1526      # carbonyl O
        if a.total_hs() > 0:
            return -0.3567          # hydroxyl
        return -0.2893              # ether
    table = {9: 0.4202, 17: 0.6895, 35: 0.8456, 53: 0.8857, 16: 0.6482,
             15: 0.8612, 5: -0.3187, 14: 0.8, 33: 0.8, 34: 0.6, 1: 0.1230}
    return table.get(z, 0.0)


def crippen_logp_procedural(mol: Mol) -> float:
    total = 0.0
    for i, a in enumerate(mol.atoms):
        total += _logp_atom(mol, i)
        h_contrib = _LOGP_CARBON_H if a.atomic_num == 6 else _LOGP_HETERO_H
        total += a.total_hs() * h_contrib
    return total


# ---------------------------------------------------------------- alerts

def count_alerts(mol: Mol) -> int:
    """QED's ALERTS descriptor: number of structural-alert SMARTS hit.

    Routed through the from-scratch SMARTS engine and the alert catalogue
    in :mod:`druggen_tpu.chem.alerts` (Bickerton/Brenk set re-derivation).
    The round-1 procedural fallback remains as
    :func:`count_alerts_procedural`."""
    from druggen_tpu.chem.alerts import count_alerts as _smarts_count
    return _smarts_count(mol)


def count_alerts_procedural(mol: Mol) -> int:
    """Round-1 procedural alert set (aldehydes, nitro, azo/N-N, peroxide,
    thiol, long CH2 runs) — kept as a dependency-free fallback."""
    alerts = 0
    for i, a in enumerate(mol.atoms):
        nbrs = mol.neighbors(i)
        if a.atomic_num == 6 and not a.aromatic and a.total_hs() >= 1:
            # aldehyde: C(=O)H
            if any(mol.atoms[j].atomic_num == 8
                   and mol.get_bond(i, j).type == BondType.DOUBLE
                   for j in nbrs):
                if a.total_hs() >= 1 and mol.degree(i) <= 2:
                    alerts += 1
        if a.atomic_num == 7:
            # nitro: N with two O neighbors incl. a double bond
            o_nbrs = [j for j in nbrs if mol.atoms[j].atomic_num == 8]
            if len(o_nbrs) >= 2:
                alerts += 1
            # azo / hydrazine N-N
            if any(mol.atoms[j].atomic_num == 7 for j in nbrs):
                alerts += 1
        if a.atomic_num == 8:
            # peroxide O-O
            if any(mol.atoms[j].atomic_num == 8 for j in nbrs):
                alerts += 1
        if a.atomic_num == 16 and a.total_hs() > 0:
            alerts += 1            # thiol
    # long unbranched aliphatic chain (>= 7 consecutive sp3 CH2)
    run = _longest_ch2_run(mol)
    if run >= 7:
        alerts += 1
    return alerts


def _longest_ch2_run(mol: Mol) -> int:
    best = 0

    def is_ch2(i):
        a = mol.atoms[i]
        return (a.atomic_num == 6 and not a.aromatic and not a.in_ring
                and a.total_hs() == 2)

    for start in range(mol.num_atoms()):
        if not is_ch2(start):
            continue
        # simple DFS along CH2 atoms
        stack = [(start, {start})]
        while stack:
            u, path = stack.pop()
            best = max(best, len(path))
            for v in mol.neighbors(u):
                if v not in path and is_ch2(v):
                    stack.append((v, path | {v}))
    return best


# ---------------------------------------------------------------- QED

# Bickerton et al. 2012 ADS parameters (a, b, c, d, e, f, dmax) per
# descriptor, and the published mean weights.
_ADS_PARAMS = {
    "MW": (2.817065973, 392.5754953, 290.7489764, 2.419764353,
           49.22325677, 65.37051707, 104.9805561),
    "ALOGP": (3.172690585, 137.8624751, 2.534937431, 4.581497897,
              0.822739154, 0.576295591, 131.3186604),
    "HBA": (2.948620388, 160.4605972, 3.615294657, 4.435986202,
            0.290141953, 1.300669958, 148.7763046),
    "HBD": (1.618662227, 1010.051101, 0.985094388, 0.000000001,
            0.713820843, 0.920922555, 258.1632616),
    "PSA": (1.876861559, 125.2232657, 62.90773554, 87.83366614,
            12.01999824, 28.51324732, 104.5686167),
    "ROTB": (0.010000000, 272.4121427, 2.558379970, 1.565547684,
             1.271567166, 2.758063707, 105.4420403),
    "AROM": (3.217788970, 957.7374108, 2.274627939, 0.000000001,
             1.317690384, 0.375760881, 312.3372610),
    "ALERTS": (0.010000000, 1199.094025, -0.09002883, 0.000000001,
               0.185904477, 0.875193782, 417.7253140),
}
_QED_WEIGHTS = {"MW": 0.66, "ALOGP": 0.46, "HBA": 0.05, "HBD": 0.61,
                "PSA": 0.06, "ROTB": 0.65, "AROM": 0.48, "ALERTS": 0.95}


def _ads(x: float, params) -> float:
    a, b, c, d, e, f, dmax = params
    t1 = 1.0 + math.exp(-(x - c + d / 2.0) / e)
    t2 = 1.0 + math.exp(-(x - c - d / 2.0) / f)
    val = a + b / t1 * (1.0 - 1.0 / t2)
    return max(val / dmax, 1e-9)


def qed_properties(mol: Mol) -> dict:
    """The eight QED descriptors, computed as RDKit ``QED.properties``
    does: MolWt, Crippen ALOGP, the QED acceptor-catalogue HBA,
    CalcNumHBD, TPSA, strict rotatable bonds, aromatic SSSR rings, and
    structural-alert hits."""
    return {
        "MW": mol_weight(mol),
        "ALOGP": crippen_logp(mol),
        "HBA": qed_h_acceptors(mol),
        "HBD": num_h_donors(mol),
        "PSA": tpsa(mol),
        "ROTB": num_rotatable_bonds(mol),
        "AROM": num_aromatic_rings(mol),
        "ALERTS": count_alerts(mol),
    }


def qed(mol: Mol) -> float:
    """Weighted-desirability QED (Bickerton et al. 2012; the reference calls
    RDKit's implementation at inference.py:264)."""
    props = qed_properties(mol)
    num = 0.0
    den = 0.0
    for k, w in _QED_WEIGHTS.items():
        num += w * math.log(_ads(props[k], _ADS_PARAMS[k]))
        den += w
    return math.exp(num / den)


# ---------------------------------------------------------------- SA score

_FRAGMENT_SCORES: dict[int, float] | None = None


def _load_fragment_table() -> dict[int, float] | None:
    """Load a precomputed fragment-frequency table if one is staged.

    Search order: ``$DRUGGEN_SA_FRAGMENTS``, then the repo-level
    ``data/cache/sa_fragments.npz`` (built by
    ``scripts/build_sa_fragments.py`` from the real reference-released
    molecule sets).  Returns None when nothing is staged (the built-in
    corpus prior is used instead)."""
    import os

    cand = [os.environ.get("DRUGGEN_SA_FRAGMENTS", "")]
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand.append(os.path.join(pkg_root, "data", "cache", "sa_fragments.npz"))
    for path in cand:
        if path and os.path.exists(path):
            import numpy as np

            z = np.load(path)
            ids = z["ids"].astype(np.uint64).tolist()
            return dict(zip(ids, z["scores"].tolist()))
    return None


def build_fragment_scores(smiles_iter=None) -> dict[int, float]:
    """Ertl-style fragment familiarity scores from a corpus: log-scaled
    frequency of radius<=2 Morgan identifiers.  Stands in for RDKit's
    PubChem-derived fpscores pickle (see module docstring)."""
    from collections import Counter

    from druggen_tpu.chem.fingerprints import _hash64
    from druggen_tpu.chem.smiles import mol_from_smiles

    if smiles_iter is None:
        from druggen_tpu.data.corpus import DRUGLIKE_SMILES, TARGET_SMILES

        smiles_iter = DRUGLIKE_SMILES + TARGET_SMILES
    counts: Counter[int] = Counter()
    for smi in smiles_iter:
        m = mol_from_smiles(smi)
        if m is None:
            continue
        for ident in _morgan_identifiers(m):
            counts[ident] += 1
    if not counts:
        return {}
    # score: log10(freq / mean_freq), clipped to [-4, 4] (Ertl's scheme)
    import numpy as np

    mean = float(np.mean(list(counts.values())))
    return {k: max(min(math.log10(v / mean) + 1.0, 4.0), -4.0)
            for k, v in counts.items()}


def _morgan_identifiers(mol: Mol, radius: int = 2) -> list[int]:
    from druggen_tpu.chem.fingerprints import _hash64

    ids = []
    cur = []
    for i, a in enumerate(mol.atoms):
        cur.append(_hash64(a.atomic_num, mol.degree(i), a.charge,
                           a.total_hs(), int(a.in_ring), int(a.aromatic)))
    ids.extend(cur)
    for _ in range(radius):
        nxt = []
        for i in range(mol.num_atoms()):
            nbrs = sorted((int(mol.get_bond(i, j).type), cur[j])
                          for j in mol.neighbors(i))
            flat = [cur[i]]
            for bt, nid in nbrs:
                flat.extend((bt, nid))
            nxt.append(_hash64(*flat))
        cur = nxt
        ids.extend(cur)
    return ids


def sa_score(mol: Mol) -> float:
    """Synthetic accessibility 1 (easy) .. 10 (hard): Ertl & Schuffenhauer's
    formula, term for term as in RDKit contrib ``sascorer.calculateScore``
    (the reference imports it at inference.py:19-20 and reports mean SA at
    :265) — duplicate-counted fragment score with ``-4`` for unknown
    environments, size/stereo/spiro/bridgehead/macrocycle penalties,
    symmetry correction, and the published raw→[1,10] mapping including
    its ``+1`` offset.  The fragment-frequency prior is corpus-built
    (:func:`build_fragment_scores`) instead of RDKit's PubChem pickle —
    the documented deviation."""
    from collections import Counter

    global _FRAGMENT_SCORES
    if _FRAGMENT_SCORES is None:
        _FRAGMENT_SCORES = _load_fragment_table() or build_fragment_scores()

    n = mol.num_atoms()
    if n == 0:
        return 10.0
    # fragment score: counts over all environment ids (radii 0..2)
    counts = Counter(_morgan_identifiers(mol))
    nf = sum(counts.values())
    score1 = sum(_FRAGMENT_SCORES.get(i, -4.0) * c
                 for i, c in counts.items()) / nf

    # complexity penalties (sascorer features)
    rings = mol.ring_info()
    size_penalty = n ** 1.005 - n
    stereo_penalty = math.log10(_potential_stereo_centers(mol) + 1)
    spiro_atoms, bridge_atoms = _spiro_bridge_atoms(mol, rings)
    spiro_penalty = math.log10(len(spiro_atoms) + 1)
    bridge_penalty = math.log10(len(bridge_atoms) + 1)
    macro_penalty = (math.log10(2)
                     if any(len(r) > 8 for r in rings) else 0.0)
    score2 = -(size_penalty + stereo_penalty + spiro_penalty
               + bridge_penalty + macro_penalty)

    # symmetry correction: many atoms sharing few distinct environments
    score3 = 0.0
    if n > len(counts):
        score3 = math.log(float(n) / len(counts)) * 0.5

    raw = score1 + score2 + score3
    _min, _max = -4.0, 2.5
    sascore = 11.0 - (raw - _min + 1.0) / (_max - _min) * 9.0
    if sascore > 8.0:
        sascore = 8.0 + math.log(sascore + 1.0 - 9.0)
    return float(min(max(sascore, 1.0), 10.0))


def _spiro_bridge_atoms(mol: Mol, rings) -> tuple[set, set]:
    """Spiro atoms (shared by ring pairs with exactly one common atom) and
    bridgehead atoms (endpoints of a >=2-bond shared path between two
    rings) — RDKit ``CalcNumSpiroAtoms`` / ``CalcNumBridgeheadAtoms``
    semantics on the SSSR."""
    spiro: set[int] = set()
    bridge: set[int] = set()
    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            shared = set(rings[i]) & set(rings[j])
            if len(shared) == 1:
                spiro |= shared
            elif len(shared) >= 3:
                # endpoints of the shared path: exactly one neighbor
                # inside the shared set
                for a in shared:
                    n_in = sum(1 for b in shared
                               if b != a and mol.get_bond(a, b) is not None)
                    if n_in == 1:
                        bridge.add(a)
    return spiro, bridge


def _subtree_sig(mol: Mol, cur: int, prev: int, depth: int):
    a = mol.atoms[cur]
    base = (a.atomic_num, a.charge, a.total_hs(), a.aromatic)
    if depth == 0:
        return base
    subs = []
    for j in mol.neighbors(cur):
        if j == prev:
            continue
        b = mol.get_bond(cur, j)
        subs.append((int(b.type), _subtree_sig(mol, j, cur, depth - 1)))
    return (base, tuple(sorted(subs, key=repr)))


def _potential_stereo_centers(mol: Mol) -> int:
    """Approximation of RDKit ``FindMolChiralCenters(includeUnassigned=
    True)`` count: sp3 carbons whose four substituents (implicit H
    included) are pairwise-distinct by depth-limited subtree signature.
    The graph representation drops stereo marks, so *potential* centers
    are the right analogue (sascorer counts assigned+unassigned)."""
    count = 0
    for i, a in enumerate(mol.atoms):
        if a.atomic_num != 6 or a.aromatic:
            continue
        h = a.total_hs()
        nbrs = list(mol.neighbors(i))
        if len(nbrs) + h != 4 or h > 1:
            continue
        sigs = [_subtree_sig(mol, j, i, 6) for j in nbrs]
        if len(set(map(repr, sigs))) == len(sigs):
            count += 1
    return count


# ---------------------------------------------------------------- rules

def obey_lipinski(mol: Mol) -> int:
    """Count of satisfied Lipinski rules (reference utils.py:627-646).

    Bug-compatible rule 4: the reference's walrus expression
    ``(logp := Crippen.MolLogP(mol) >= -2) & (logp <= 5)`` binds ``logp``
    to the *boolean* ``MolLogP >= -2``, so ``logp <= 5`` is always true
    and the rule reduces to ``logP >= -2`` (utils.py:641)."""
    rules = [
        exact_mol_weight(mol) < 500,
        num_h_donors(mol) <= 5,
        num_h_acceptors(mol) <= 10,
        crippen_logp(mol) >= -2,
        num_rotatable_bonds(mol) <= 10,
    ]
    return sum(int(r) for r in rules)


def obey_veber(mol: Mol) -> int:
    """Count of satisfied Veber rules (reference utils.py:649-665)."""
    return int(num_rotatable_bonds(mol) <= 10) + int(tpsa(mol) <= 140)

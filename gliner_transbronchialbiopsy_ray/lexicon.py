"""Transplant-pathology lexicon: the deterministic stand-in for the GLiNER
model plus the UMLS-style linking dictionary.

Three consumers share this single source of truth so the golden-corpus P/R
gate is exact:
- ``fixtures.py`` plants surface forms from these concepts,
- ``stages/ner.py``'s LexiconBackend extracts them (same output contract as
  the reference model handler: char spans, closed label set, scores in
  [0.5, 1), rounded to 3 decimals — /root/reference/src/streamlit/app/models/
  model_handler.py:20-37,166-170),
- ``stages/link.py`` links surfaces to canonical forms (north-star entity
  linking: exact alias match first, then similarity fallback).

Entity vocabulary mirrors the reference's 14 labels
(/root/reference/src/streamlit/app/config.py:39-54) with surface variants
modeled on the sandbox excerpts (src/finetuning/sandbox.ipynb cells 11-20).
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import pyarrow as pa

from .config import LABELS
from .schema import DICTIONARY_SCHEMA

# (canonical_id, canonical_form, label, [aliases...]).  Aliases are the
# plantable / matchable surface forms (post-normalization).
CONCEPTS: list[tuple[str, str, str, list[str]]] = [
    # Site
    ("SITE_LID", "LID", "Site", ["LID", "lobe inférieur droit"]),
    ("SITE_LIG", "LIG", "Site", ["LIG", "lobe inférieur gauche"]),
    ("SITE_LM", "LM", "Site", ["LM", "lobe moyen"]),
    ("SITE_LSD", "LSD", "Site", ["LSD", "lobe supérieur droit"]),
    ("SITE_LSG", "LSG", "Site", ["LSG", "lobe supérieur gauche"]),
    ("SITE_NELSON", "Nelson", "Site", ["Nelson", "pyramide basale"]),
    ("SITE_LINGULA", "lingula", "Site", ["lingula"]),
    # Grade A (acute cellular rejection)
    *[(f"GRADE_A{g}", f"A{g}", "Grade A", [f"A{g}"]) for g in "01234"],
    ("GRADE_AX", "Ax", "Grade A", ["Ax", "AX"]),
    # Grade B (airway inflammation)
    *[(f"GRADE_B{g}", f"B{g}", "Grade B", [f"B{g}"]) for g in "0123"],
    ("GRADE_BX", "Bx", "Grade B", ["Bx", "BX"]),
    # Rejet chronique
    ("REJET_CHRONIQUE", "rejet chronique", "Rejet Chronique",
     ["rejet chronique", "bronchiolite oblitérante"]),
    # Coloration C4d
    ("C4D_NEG", "C4d négatif", "Coloration C4d", ["C4d négatif"]),
    ("C4D_POS", "C4d positif", "Coloration C4d", ["C4d positif"]),
    ("C4D_DOUTEUX", "C4d douteux", "Coloration C4d", ["C4d douteux"]),
    # Lésion septale
    ("LESION_SEPTALE", "lésion septale", "Lésion Septale",
     ["lésion septale", "lésions septales", "épaississement septal"]),
    # Lésion intra-alvéolaire
    ("LESION_IA", "lésion intra-alvéolaire", "Lésion Intra-Alvéolaire",
     ["lésion intra-alvéolaire", "lésions intra-alvéolaires",
      "oedème intra-alvéolaire"]),
    # Éosinophilie
    ("EOSINOPHILIE", "éosinophilie", "Éosinophilie",
     ["éosinophilie", "infiltrat éosinophile"]),
    # Pneumonie organisée
    ("PNEUMONIE_ORG", "pneumonie organisée", "Pneumonie Organisée",
     ["pneumonie organisée", "bourgeons conjonctifs"]),
    # DAD
    ("DAD", "DAD", "DAD", ["DAD", "dommage alvéolaire diffus"]),
    # Infection
    ("INFECTION_CMV", "CMV", "Infection", ["CMV", "inclusions virales à CMV"]),
    ("INFECTION_ASPERGILLUS", "aspergillus", "Infection", ["aspergillus"]),
    ("INFECTION_PNEUMOCYSTIS", "pneumocystis", "Infection", ["pneumocystis"]),
    # Autre pathologie
    ("PATHO_FIBROSE", "fibrose interstitielle", "Autre Pathologie",
     ["fibrose interstitielle"]),
    ("PATHO_EMPHYSEME", "emphysème", "Autre Pathologie", ["emphysème"]),
    ("PATHO_ANTHRACOSE", "anthracose", "Autre Pathologie", ["anthracose"]),
]

# Labels whose object is a number parsed out of the surface form
# ("7 fragments" -> "7") rather than a dictionary concept.
NUMERIC_LABELS: dict[str, str] = {
    "Nombre Total De Fragments": r"\b(\d+)\s+fragments\b",
    "Nombre Total De Fragments Alvéolés": r"\b(\d+)\s+alvéolés\b",
}

# Distractor aliases that must NOT link exactly (exercise the similarity
# fallback path): near-miss spellings mapping to real concepts.
NEAR_MISS_ALIASES: dict[str, tuple[str, str]] = {
    # surface -> (label, expected canonical_id)
    "lobe inferieur droit": ("Site", "SITE_LID"),
    "pneumonie organisee": ("Pneumonie Organisée", "PNEUMONIE_ORG"),
    "eosinophilie": ("Éosinophilie", "EOSINOPHILIE"),
}


def dictionary_table() -> pa.Table:
    """The linking dictionary as an Arrow table (broadcast small side)."""
    return pa.table(
        {
            "canonical_id": [c[0] for c in CONCEPTS],
            "canonical_form": [c[1] for c in CONCEPTS],
            "label": [c[2] for c in CONCEPTS],
            "aliases": [c[3] for c in CONCEPTS],
        },
        schema=DICTIONARY_SCHEMA,
    )


@lru_cache(maxsize=None)
def alias_lookup() -> dict[tuple[str, str], tuple[str, str]]:
    """(label, lowercased alias) -> (canonical_id, canonical_form)."""
    out: dict[tuple[str, str], tuple[str, str]] = {}
    for cid, cform, label, aliases in CONCEPTS:
        for a in aliases:
            out[(label, a.lower())] = (cid, cform)
        out[(label, cform.lower())] = (cid, cform)
    return out


@lru_cache(maxsize=None)
def label_patterns(labels: tuple[str, ...] | None = None) -> dict[str, re.Pattern]:
    """One compiled alternation regex per label (longest alias first so the
    longest surface wins), plus the numeric patterns.  Compiled once per
    process / per NER actor."""
    wanted = set(labels) if labels else set(LABELS)
    by_label: dict[str, list[str]] = {}
    for _, _, label, aliases in CONCEPTS:
        if label in wanted:
            by_label.setdefault(label, []).extend(aliases)
    # near-miss surfaces are extractable (the model would find them) but are
    # NOT dictionary aliases — they exercise the similarity-linking fallback
    for surface, (label, _cid) in NEAR_MISS_ALIASES.items():
        if label in wanted:
            by_label.setdefault(label, []).append(surface)
    pats: dict[str, re.Pattern] = {}
    for label, aliases in by_label.items():
        alts = sorted(set(aliases), key=len, reverse=True)
        pats[label] = re.compile(
            r"(?<!\w)(?:" + "|".join(re.escape(a) for a in alts) + r")(?!\w)",
            re.UNICODE,
        )
    for label, pat in NUMERIC_LABELS.items():
        if label in wanted:
            pats[label] = re.compile(pat, re.UNICODE)
    return pats


def deterministic_score(label: str, surface: str) -> float:
    """Stable pseudo-confidence in [0.5, 0.999), rounded to 3 decimals (the
    reference rounds scores to 3: model_handler.py:33)."""
    h = int.from_bytes(
        hashlib.md5(f"{label}|{surface}".encode("utf-8")).digest()[:4], "big"
    )
    return round(0.5 + (h % 499) / 1000.0, 3)


def canonical_for(label: str, surface: str) -> tuple[str | None, str]:
    """Exact-dictionary canonicalization of one surface form.

    Returns (canonical_id | None, canonical_obj).  Numeric labels parse the
    number; unknown surfaces fall back to the lowercased surface."""
    if label in NUMERIC_LABELS:
        m = re.search(r"\d+", surface)
        return (None, m.group(0) if m else surface)
    hit = alias_lookup().get((label, surface.lower()))
    if hit:
        return hit
    return (None, surface.lower())

"""Text normalization + section segmentation (SURVEY §2.2 M1-M3).

Semantics match the reference row-for-row:
- clean_text:            /root/reference/src/streamlit/app/utils/text_processor.py:96-136
- extract_conclusion:    text_processor.py:138-216 (2-stage regex segmentation)
- _format_grade_notations: text_processor.py:218-238

Exposed both as pure per-string functions (used by the fixture generator and
unit tests) and as a vectorized-per-batch Arrow transform (`segment_batch`)
for `Dataset.map_batches(..., batch_format="pyarrow")`.  All patterns are
compiled once at module import (= once per Ray worker process).
"""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa

from ..config import (
    BIOPSY_PATTERNS,
    CONCLUSION_PATTERNS,
    END_MARKERS,
    LAVAGE_PATTERNS,
)

_WS = re.compile(r"\s+")
_SPECIAL = re.compile(
    r"[^\w\sÀ-ſàâäéèêëîïôöùûüÿçÀÂÄÉÈÊËÎÏÔÖÙÛÜŸÇ.,;:()\[\]{}\"'-]"
)
_PUNCT_SPACE = re.compile(r"\s*([.,;:!?])\s*")
_MULTI_DOT = re.compile(r"\.{2,}")
_DASHES = re.compile(r"[-‐‑‒–—―]+")

_CONCLUSION = [re.compile(p, re.MULTILINE | re.DOTALL) for p in CONCLUSION_PATTERNS]
_BIOPSY = [re.compile(p, re.MULTILINE | re.DOTALL) for p in BIOPSY_PATTERNS]
_LAVAGE = [re.compile(p) for p in LAVAGE_PATTERNS]
_ENDS = [re.compile(p) for p in END_MARKERS]

_GRADE_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"A(\d|\+|x|X)B(\d|\+|x|X)"), r"A\1 B\2"),
    (re.compile(r"[Aa](\d|\+|x|X)[Bb](\d|\+|x|X)"), r"A\1 B\2"),
    (re.compile(r"grade\s+([AaBb])(\d|\+|x|X)"), r"Grade \1\2"),
    (re.compile(r"([AaBb])(\d|\+|x|X)\s*-\s*([AaBb])(\d|\+|x|X)"), r"\1\2 \3\4"),
]


def clean_text(text: str) -> str:
    """NFKC-normalize, collapse whitespace, strip chars outside the French
    whitelist, normalize punctuation spacing / multi-dots / dash variants."""
    if not text:
        return ""
    text = unicodedata.normalize("NFKC", text)
    text = _WS.sub(" ", text)
    text = _SPECIAL.sub("", text)
    text = _PUNCT_SPACE.sub(r"\1 ", text)
    text = _MULTI_DOT.sub(".", text)
    text = _DASHES.sub("-", text)
    return text.strip()


def format_grade_notations(text: str) -> str:
    """Rewrite glued/dashed/lowercase grade notations: A0B0 -> 'A0 B0',
    'grade a2' -> 'Grade a2', 'A1-B0' -> 'A1 B0'."""
    for pat, repl in _GRADE_PATTERNS:
        text = pat.sub(repl, text)
    return text


def extract_conclusion(text: str) -> str | None:
    """Two-stage section segmentation: CONCLUSION header -> transbronchial
    biopsy sub-section, ending at the lavage section or a trailing marker.
    Returns None when no conclusion/biopsy section exists (caller keeps the
    row and flags it — rows are never silently dropped)."""
    text = clean_text(text)

    conclusion_text = None
    for pat in _CONCLUSION:
        m = pat.search(text)
        if m:
            conclusion_text = text[m.end():]
            break
    if not conclusion_text:
        return None

    biopsy_text = None
    for pat in _BIOPSY:
        m = pat.search(conclusion_text)
        if m:
            section = conclusion_text[m.start():]
            end_pos = None
            for lav in _LAVAGE:
                lm = lav.search(section)
                if lm:
                    end_pos = lm.start()
                    break
            if end_pos is None:
                for endp in _ENDS:
                    em = endp.search(section)
                    if em and em.start() > 0:
                        end_pos = em.start()
                        break
            biopsy_text = section[:end_pos] if end_pos else section
            break

    if biopsy_text:
        return format_grade_notations(clean_text(biopsy_text))
    return None


def segment_batch(batch: pa.Table) -> pa.Table:
    """Arrow batch transform: text -> (conclusion, status).

    Per-row regex work runs in C via compiled module-level patterns; no state
    to amortize, so this stays a stateless `map_batches` task stage."""
    texts = batch.column("text").to_pylist()
    conclusions: list[str | None] = []
    status: list[str] = []
    for t in texts:
        if not t:
            conclusions.append(None)
            status.append("no_text")
            continue
        c = extract_conclusion(t)
        if c is None:
            conclusions.append(None)
            status.append("no_conclusion")
        else:
            conclusions.append(c)
            status.append("ok")
    out = batch.drop_columns(["text"])
    out = out.append_column("conclusion", pa.array(conclusions, type=pa.string()))
    out = out.append_column("status", pa.array(status, type=pa.string()))
    return out

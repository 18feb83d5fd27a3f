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


# Rows made only of these chars behave IDENTICALLY under Python re and
# Arrow's RE2 kernels for every pattern in clean_text (the vectorized
# fast path below): ASCII printable + \t\n\r (RE2 \s and Python \s agree
# on these; \v/\x85/  etc. do NOT and are excluded), Latin-1/-A
# letters U+00C0-U+017F (kept by clean_text's EXPLICIT whitelist ranges,
# so RE2's ASCII-only \w vs Python's unicode \w never matters), and the
# dash variants (literal chars in both engines).  Anything else — other
# scripts, exotic whitespace, control chars — falls back to the per-row
# Python reference implementation, so the column transform is exactly
# clean_text row-for-row on ALL inputs (property-tested).
_ARROW_SAFE_PAT = r"^[ -~\t\n\rÀ-ſ‐-―]*$"


def clean_text_column(arr):
    """Vectorized clean_text over a pa.Array/ChunkedArray of strings:
    the five substitution passes run as Arrow RE2 kernels for rows
    inside the engine-agreement character set (_ARROW_SAFE_PAT); other
    rows take the per-string Python path.  Nulls stay null.  NFKC runs
    per-row via unicodedata (C-fast) — pyarrow 16.1's utf8_normalize
    returns DECOMPOSED output even for NFC/NFKC (missing compose flag),
    so the Arrow kernel cannot be used for it."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    norm = pa.array(
        [unicodedata.normalize("NFKC", t) if t is not None else None
         for t in arr.to_pylist()], type=pa.string())
    safe = pc.match_substring_regex(norm, _ARROW_SAFE_PAT)
    v = pc.replace_substring_regex(norm, r"\s+", replacement=" ")
    v = pc.replace_substring_regex(v, _SPECIAL.pattern, replacement="")
    v = pc.replace_substring_regex(
        v, r"\s*([.,;:!?])\s*", replacement=r"\1 ")
    v = pc.replace_substring_regex(v, r"\.{2,}", replacement=".")
    v = pc.replace_substring_regex(v, "[-‐‑‒–"
                                   "—―]+", replacement="-")
    v = pc.utf8_trim_whitespace(v)
    if pc.all(pc.fill_null(safe, True)).as_py():
        return v
    # sparse fallback: only the rows RE2 may treat differently
    out = v.to_pylist()
    raw = arr.to_pylist()
    for i, ok in enumerate(safe.to_pylist()):
        if ok is False and raw[i] is not None:
            out[i] = clean_text(raw[i])
    return pa.array(out, type=pa.string())


def extract_conclusion(text: str) -> str | None:
    """Two-stage section segmentation: CONCLUSION header -> transbronchial
    biopsy sub-section, ending at the lavage section or a trailing marker.
    Returns None when no conclusion/biopsy section exists (caller keeps the
    row and flags it — rows are never silently dropped)."""
    return _conclusion_from_clean(clean_text(text))


def _conclusion_from_clean(text: str) -> str | None:
    """extract_conclusion body over ALREADY-CLEANED text (the batch path
    cleans the whole column vectorized first)."""
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

    The whole-document clean pass (NFKC + five substitutions — the bulk
    of the wall time) runs VECTORIZED via clean_text_column; only the
    section searches and the short-section grade rewrite stay per-row
    (compiled patterns, C regex)."""
    cleaned = clean_text_column(batch.column("text"))
    texts = cleaned.to_pylist()
    # no_text keys on the RAW text (a whitespace-only doc cleans to ""
    # but is flagged no_conclusion, exactly as the per-string path does)
    raws = batch.column("text").to_pylist()
    conclusions: list[str | None] = []
    status: list[str] = []
    for t, raw in zip(texts, raws):
        if not raw:
            conclusions.append(None)
            status.append("no_text")
            continue
        c = _conclusion_from_clean(t)
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

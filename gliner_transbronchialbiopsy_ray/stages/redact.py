"""PII / pattern redaction over a text column.

The training-data op the reference doesn't have but every corpus pipeline
needs before model training: scrub structured identifiers (emails, phone
numbers, IPs, ...) from every document, keeping a per-doc hit count as the
audit signal.  The reference's closest surface is clean_text's regex
normalization (reference src/streamlit/app/utils/text_processor.py:96-130),
which rewrites characters, not entities.

Scale design: one streaming ``map_batches`` pass, zero shuffles.  The
regex work runs in Arrow compute (``pc.count_substring_regex`` /
``pc.replace_substring_regex``) — RE2 under the hood, the SAME engine
DuckDB binds, so the oracle comparison is engine-exact, and the kernel is
C++ over the whole column (no Python row loop).  Patterns are applied in
list order; each pattern's count is measured on the text as produced by
the previous pattern (matching a nested ``regexp_replace`` oracle).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Real-world default: the classic structured-PII scrub set.  RE2-safe
# (no backrefs / lookaround), ASCII word boundaries.
DEFAULT_PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
]


def redact_text(
    docs: ray.data.Dataset,
    patterns: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    digest: bool = True,
) -> ray.data.Dataset:
    """-> (id_col, n_redactions, redacted_md5 | redacted_text).

    ``digest=True`` (default) emits the md5 of the redacted text instead of
    the text itself — the audit/verification shape (tiny rows; the rewrite
    itself is usually fused into a wider pipeline via ``digest=False``).
    """
    pats = DEFAULT_PII_PATTERNS if patterns is None else patterns

    def scrub(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch.column(text_col), pa.string())
        hits = None
        for pat, repl in pats:
            c = pc.count_substring_regex(txt, pat)
            hits = c if hits is None else pc.add(hits, c)
            txt = pc.replace_substring_regex(txt, pat, repl)
        out = {
            id_col: batch.column(id_col),
            "n_redactions": pc.cast(hits, pa.int64()),
        }
        if digest:
            out["redacted_md5"] = pa.array(
                [hashlib.md5(t.encode()).hexdigest() if t is not None else None
                 for t in txt.to_pylist()],
                type=pa.string(),
            )
        else:
            out["redacted_text"] = txt
        return pa.table(out)

    return docs.map_batches(scrub, batch_format="pyarrow")

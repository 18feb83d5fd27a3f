"""Entity-highlight presentation stage (M9).

Reference: dashboard_v1.py:54-73 `highlight_entities` wraps every regex
occurrence of each entity's TEXT in a styled <span> — which corrupts
offsets when one entity's surface form is a substring of another's and
re-highlights repeated words.  This version is offset-based: spans are
spliced right-to-left by their (start, end) character offsets into the
conclusion, so nesting/duplication bugs can't occur and the output is
deterministic.  Runs as a stateless vectorized `map_batches` stage over
the entities dataset (ENTITIES_SCHEMA in); per-row work is bounded by
that row's entity count (entities are already overlap-merged upstream,
stages/ner.py merge_overlaps).
"""

from __future__ import annotations

import html as _html

import pandas as pd
import pyarrow as pa

# Label -> swatch, mirroring the reference's fixed palette semantics
# (dashboard_v1.py:30-46).  Unknown labels get the reference's default.
_DEFAULT_COLOR = "#F5F5F5"
_PALETTE = {
    "patient_age": "#FFB3BA",
    "rejection_grade": "#BAFFC9",
    "inflammation": "#BAE1FF",
    "fibrosis": "#FFFFBA",
    "infection": "#FFDFBA",
}


def _render_row(text: str, ents: list | None) -> str:
    if not text:
        return ""
    if ents is None:
        ents = []
    out = _html.escape(text)
    # Splice right-to-left over ESCAPED text: recompute offsets by
    # escaping the prefix, so '&' / '<' in the conclusion can't shift
    # later spans.
    spans = sorted(
        (e for e in ents if e.get("start") is not None),
        key=lambda e: (e["start"], e["end"]),
        reverse=True,
    )
    for e in spans:
        s, t = int(e["start"]), int(e["end"])
        if not (0 <= s < t <= len(text)):
            continue  # defensive: never corrupt output on a bad span
        es = len(_html.escape(text[:s]))
        et = len(_html.escape(text[:t]))
        label = _html.escape(str(e.get("label", "")))
        color = _PALETTE.get(e.get("label"), _DEFAULT_COLOR)
        frag = (
            f'<span class="highlighted-entity" style="background-color: '
            f'{color};">{out[es:et]}'
            f'<span class="entity-tooltip">{label}</span></span>'
        )
        out = out[:es] + frag + out[et:]
    return out


def highlight_batch(batch: pa.Table) -> pd.DataFrame:
    """(doc_id, conclusion, status, entities) -> + `html` column."""
    df = batch.to_pandas()
    df["html"] = [
        _render_row(txt, ents)
        for txt, ents in zip(df["conclusion"], df["entities"])
    ]
    return df[["doc_id", "status", "html"]]

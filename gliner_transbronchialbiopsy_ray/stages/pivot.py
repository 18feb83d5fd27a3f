"""Reference-compatible wide-row 'node table' view (SURVEY §1.4, §2.5 G1).

One row per document: Nom_Document, Conclusion, one column per label holding
';'.join of mentions (or None), plus Scores as a real map-like JSON string
(the reference smuggles a stringified Python dict through pandas —
entity_processor.py:80-83; we emit canonical JSON instead of `eval` food).

Spans are row-local, so the pivot is a plain `map_batches` — NO shuffle.
The wide row is exactly a pivoted view of the (doc, label, value) triples.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..config import LABELS


def pivot_wide(batch: pa.Table, labels: list[str] | None = None) -> pa.Table:
    labels = labels or LABELS
    col = batch.column("entities")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ent_lists = col.to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    conclusions = batch.column("conclusion").to_pylist()

    cols: dict[str, list] = {lb: [] for lb in labels}
    scores_col: list[str] = []
    n_entities: list[int] = []
    for ents in ent_lists:
        ents = ents or []
        per_label: dict[str, list[str]] = {}
        per_scores: dict[str, list[float]] = {}
        for e in ents:  # entity lists are short (<=~20); row-local
            per_label.setdefault(e["label"], []).append(e["text"])
            per_scores.setdefault(e["label"], []).append(round(e["score"], 3))
        for lb in labels:
            vals = per_label.get(lb)
            cols[lb].append(";".join(vals) if vals else None)
        scores_col.append(json.dumps(per_scores, ensure_ascii=False, sort_keys=True))
        n_entities.append(len(ents))

    out = {
        "Nom_Document": pa.array(doc_ids, type=pa.string()),
        "Conclusion": pa.array(conclusions, type=pa.string()),
    }
    for lb in labels:
        out[lb] = pa.array(cols[lb], type=pa.string())
    out["Scores"] = pa.array(scores_col, type=pa.string())
    out["n_entities"] = pa.array(n_entities, type=pa.int32())
    return pa.table(out)

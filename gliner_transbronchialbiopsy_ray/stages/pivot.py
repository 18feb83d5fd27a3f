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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import LABELS


def pivot_wide(batch: pa.Table, labels: list[str] | None = None) -> pa.Table:
    """Row-local pivot, Arrow-vectorized (r4-verdict hot-path item):
    entities flatten ONCE (zero-copy list_flatten/list_parent_indices);
    each label column is a masked ListArray + `pc.binary_join(';')` in
    C.  Only the Scores JSON assembly walks entities in Python (one
    pass over the flattened arrays — float repr / json.dumps semantics
    are the reference contract and don't vectorize)."""
    labels = labels or LABELS
    col = batch.column("entities")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = batch.num_rows
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(col)
    lab = flat.field("label")
    txt = flat.field("text")

    out: dict[str, pa.Array] = {
        "Nom_Document": batch.column("doc_id").cast(pa.string()),
        "Conclusion": batch.column("conclusion").cast(pa.string()),
    }
    for lb in labels:
        m = pc.fill_null(pc.equal(lab, lb), False)
        mnp = m.to_numpy(zero_copy_only=False)
        cnt = np.bincount(parents[mnp], minlength=n)
        offs = np.concatenate(([0], np.cumsum(cnt))).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), txt.filter(m))
        joined = pc.binary_join(lst, ";")
        out[lb] = pc.if_else(pa.array(cnt > 0), joined,
                             pa.scalar(None, type=pa.string()))

    # Scores: {label: [round(score, 3) in row order]} as canonical JSON
    acc: dict[int, dict[str, list[float]]] = {}
    scores = flat.field("score").to_pylist()
    for p, lb2, s in zip(parents.tolist(), lab.to_pylist(), scores):
        acc.setdefault(p, {}).setdefault(lb2, []).append(round(s, 3))
    empty = json.dumps({})
    scores_col = [
        json.dumps(acc[i], ensure_ascii=False, sort_keys=True)
        if i in acc else empty
        for i in range(n)
    ]
    out["Scores"] = pa.array(scores_col, type=pa.string())
    out["n_entities"] = pc.cast(
        pc.fill_null(pc.list_value_length(col), 0), pa.int32())
    return pa.table(out)

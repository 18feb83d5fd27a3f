"""Interleaved-span document assembly (input_hint shape -> per-doc text).

Input rows: (doc_id, spans: list<struct<kind, text, media_ref, offset>>).
Text spans concatenated in `offset` order reconstruct the document text;
media spans pass through untouched.  The span-sequence order invariant
(kind, text, media_ref, order) is derived purely from IN-ROW data (sort by
`offset`), never from block arrival order — holds under any repartition.

Vectorization: flatten the list column once (`pc.list_flatten` /
`pc.list_parent_indices`, zero-copy), lexsort by (row, offset) in numpy,
group-concatenate text spans per row.  No Python loop over span structs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_spans(batch: pa.Table):
    """Return (parent_row_index, kind, text, media_ref, offset) numpy/arrow
    arrays for the flattened spans column, in (row, offset) order."""
    col = batch.column("spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(col)
    offsets = flat.field("offset").to_numpy(zero_copy_only=False)
    order = np.lexsort((offsets, parents))
    return parents[order], flat.take(pa.array(order)), offsets[order]


def assemble_text(batch: pa.Table) -> pa.Table:
    """Add a `text` column: concatenation of kind=='text' span texts in
    offset order ('' separator — spans may split mid-word).  Rows with no
    text spans get None (flagged downstream as status='no_text').

    Pure-Arrow kernels end to end: the sorted text spans become one
    ListArray over per-row count offsets and `pc.binary_join` does the
    group-concatenate in C — no to_pylist, no Python join loop (the
    r4-verdict Arrow-native hot-path item; 4x over the object-array
    version at 20k docs)."""
    n = batch.num_rows
    if n == 0:
        return batch.append_column("text", pa.array([], type=pa.string()))
    parents, flat, _ = _flat_spans(batch)
    is_text = pc.equal(flat.field("kind"), "text")
    mask = pc.fill_null(is_text, False).to_numpy(zero_copy_only=False)
    texts = flat.field("text").filter(pa.array(mask))
    counts = np.bincount(parents[mask], minlength=n)
    offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    lst = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), texts)
    joined = pc.binary_join(lst, "")
    out = pc.if_else(pa.array(counts > 0), joined,
                     pa.scalar(None, type=pa.string()))
    return batch.append_column("text", out)


def media_inventory(batch: pa.Table) -> pa.Table:
    """Explode media spans to (doc_id, kind, media_ref, offset) rows —
    the plumbing for downstream decode/feature-extract actor stages."""
    parents, flat, offsets = _flat_spans(batch)
    kinds = np.asarray(flat.field("kind").to_pylist(), dtype=object)
    refs = np.asarray(flat.field("media_ref").to_pylist(), dtype=object)
    is_media = kinds != "text"
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=object)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[parents[is_media]].tolist(), type=pa.string()),
            "kind": pa.array(kinds[is_media].tolist(), type=pa.string()),
            "media_ref": pa.array(refs[is_media].tolist(), type=pa.string()),
            "offset": pa.array(offsets[is_media].tolist(), type=pa.int32()),
        }
    )


def span_sequence(batch: pa.Table) -> pa.Table:
    """Emit the per-row span sequence (kind, text, media_ref) in offset order
    — the row-for-row invariant checked against the reference.  Output:
    (doc_id, seq: list<struct<kind,text,media_ref>>)."""
    n = batch.num_rows
    parents, flat, _ = _flat_spans(batch)
    seq_struct = pa.StructArray.from_arrays(
        [flat.field("kind"), flat.field("text"), flat.field("media_ref")],
        names=["kind", "text", "media_ref"],
    )
    counts = np.bincount(parents, minlength=n)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    seq = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), seq_struct)
    return pa.table({"doc_id": batch.column("doc_id"), "seq": seq})

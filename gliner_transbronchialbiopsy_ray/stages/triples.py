"""Triple emission, dedup and canonicalization aggregates (north-star
stages 3-4; SURVEY §2.5 G1, §2.7 D4).

`emit_triples` explodes the row-local entity lists into (subj, pred, obj)
rows fully vectorized (list_flatten + parent indices — no Python loop over
entities).  Because every document occupies exactly ONE input row, all
mentions of a doc are row-local, so per-batch dedup on (subj, pred, obj) IS
global dedup — no shuffle needed.  `dedup_triples_global` provides the
shuffle variant for inputs that violate that partitioning assumption.

`surface_form_stats` is the canonicalization clustering aggregate
(groupby(pred, obj)) with salted two-phase aggregation: canonical values are
power-law hot ("A0" dominates), so we pre-aggregate per batch, salt the key,
merge, then unsalt — the driver-side result is tiny.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import LABEL_TO_SNAKE, label_to_pred

_PRED_BY_LABEL = {lb: label_to_pred(lb) for lb in LABEL_TO_SNAKE}


def emit_triples(batch: pa.Table, n_parts: int = 1024) -> pa.Table:
    """Explode entities -> triple rows with provenance.

    Output: (subj, pred, label, obj(raw surface), score, span_idx, part_id).
    `label` is kept for the linking stage and dropped at finalize.
    `part_id` = crc32(subj) % n_parts: a stable partition key reused by every
    downstream stage (one partitioning key across the pipeline).
    """
    col = batch.column("entities")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(col)
    n_flat = len(flat)

    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=object)
    subj = doc_ids[parents] if n_flat else np.array([], dtype=object)
    labels = flat.field("label").to_pylist()
    preds = [_PRED_BY_LABEL.get(lb, "has_" + lb.lower().replace(" ", "_")) for lb in labels]

    # span_idx = position within the row's entity list, derived from the
    # (non-decreasing) parent indices so it is robust to sliced arrays.
    if n_flat:
        run_starts = np.r_[0, np.flatnonzero(np.diff(parents)) + 1]
        run_lens = np.diff(np.r_[run_starts, n_flat])
        span_idx = (
            np.arange(n_flat, dtype=np.int64) - np.repeat(run_starts, run_lens)
        ).astype(np.int32)
    else:
        span_idx = np.array([], dtype=np.int32)
    part_id = np.array(
        [zlib.crc32(s.encode("utf-8")) % n_parts for s in subj], dtype=np.int32
    )
    return pa.table(
        {
            "subj": pa.array(subj.tolist(), type=pa.string()),
            "pred": pa.array(preds, type=pa.string()),
            "label": flat.field("label"),
            "obj": flat.field("text"),
            "score": flat.field("score"),
            "span_idx": pa.array(span_idx, type=pa.int32()),
            "part_id": pa.array(part_id, type=pa.int32()),
        }
    )


def dedup_triples_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (== per-doc-set) dedup on (subj, pred, obj), keeping the
    max-score mention.  Valid as GLOBAL dedup because docs are row-local."""
    df = batch.to_pandas()
    df = df.sort_values(["score"], ascending=False, kind="stable")
    df = df.drop_duplicates(subset=["subj", "pred", "obj"], keep="first")
    df = df.sort_values(["subj", "pred", "obj"], kind="stable")
    return pa.Table.from_pandas(df, preserve_index=False)


def finalize_triples(batch: pa.Table) -> pa.Table:
    """Drop the working columns, leaving the TRIPLES_SCHEMA shape."""
    keep = ["subj", "pred", "obj", "score", "span_idx", "part_id"]
    return batch.select([c for c in keep if c in batch.column_names])


def dedup_triples_global(ds, keep: str = "max_score"):
    """Shuffle dedup for non-row-local inputs: groupby(subj, pred, obj) ->
    first (max score).  Document: all-to-all exchange on the triple key."""

    def head1(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("score", ascending=False, kind="stable").head(1)

    return ds.groupby(["subj", "pred", "obj"]).map_groups(
        head1, batch_format="pandas"
    )


class _PartialCount:
    """Per-batch partial aggregation for (pred, obj) counts with a salt
    column — the combiner half of the salted two-phase groupby."""

    def __init__(self, salt_buckets: int = 16):
        self.salt = salt_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select(["pred", "obj", "subj"]).to_pandas()
        part = (
            df.groupby(["pred", "obj"], sort=False)
            .agg(n=("subj", "size"), n_docs=("subj", "nunique"))
            .reset_index()
        )
        # Salt must be INDEPENDENT of the group key or the salted groupby
        # has exactly the same groups as the unsalted one (a hot key would
        # NOT spread).  Derive it from the batch's content (subject sample)
        # so the same hot (pred, obj) arriving in different batches lands
        # in different salt buckets; the final phase merges across salts,
        # so the result is invariant to the salt assignment.
        h = zlib.crc32("\x00".join(map(str, df["subj"].head(64))).encode("utf-8"))
        part["salt"] = np.int32(h % self.salt)
        return pa.Table.from_pandas(part, preserve_index=False)


def surface_form_stats(triples_ds, salt_buckets: int = 16):
    """Canonicalization clustering view: per (pred, obj) mention count and
    doc count.  Two-phase: vectorized per-batch partials -> small groupby.

    Note n_docs from partials is an upper bound only if a doc's mentions
    split across batches; docs are row-local here so partials are exact.
    """
    partials = triples_ds.map_batches(
        _PartialCount(salt_buckets), batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["pred", "obj"], sort=False)
            .agg(n=("n", "sum"), n_docs=("n_docs", "sum"))
            .reset_index()
        )
        return out

    # first merge within salt bucket (spreads hot keys), then final tiny merge
    merged = partials.groupby(["salt", "pred", "obj"]).map_groups(
        lambda g: g.groupby(["pred", "obj"], sort=False)
        .agg(n=("n", "sum"), n_docs=("n_docs", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    return merged.groupby(["pred", "obj"]).map_groups(merge, batch_format="pandas")

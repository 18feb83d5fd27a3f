"""Substring-window (chunk-level) duplicate detection.

Detects duplicated fixed-width character windows ACROSS documents — the
partition-friendly relative of exact-substring dedup from "Deduplicating
Training Data Makes Language Models Better" (Lee et al., 2022,
arXiv:2107.06499).  A corpus-wide suffix array is not shardable; instead
documents are cut into fixed windows (``window`` chars every ``stride``
chars) and a window found in >= ``min_docs`` distinct documents is a
duplicated chunk.  With ``stride == window`` the windows tile the doc
(cheapest, catches same-phase duplication — boilerplate headers/footers,
licence blocks, mirrored articles); ``stride < window`` trades shuffle
volume for phase coverage.  The reference app has no substring-level
dedup (its dedup is whole-cell; reference/src/streamlit/app/utils/
text_processor.py) — this operator belongs to the LLM-curation suite the
engine adds on top.

Scale design:
- window emission is VECTORIZED: one ``pyarrow.compute``
  ``utf8_slice_codeunits`` call per offset (offset count bounded by
  max-doc-length / stride), never a Python loop over rows;
- the shuffle key is a coarse bucket of the window hash (same pattern as
  ``stages.dedup.exact_dedup``: bounded group count, per-window work
  vectorized in pandas inside the bucket);
- a per-batch combiner dedupes (doc_id, window) pairs before the shuffle
  (a window repeated WITHIN a doc adds no distinct-doc count);
- the doc-level scoring pass marks duplicate windows inside the SAME
  bucket groups, then re-keys the tiny per-(bucket, doc) partials by
  doc_id — two bounded shuffles total and NO broadcast of the duplicate-
  window set (on a dup-heavy corpus that set is O(corpus) and must never
  transit the driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from .dedup import N_HASH_BUCKETS

_EMPTY_WINDOWS = pa.table({
    "doc_id": pa.array([], type=pa.int64()),
    "win": pa.array([], type=pa.string()),
    "bucket": pa.array([], type=pa.int32()),
})


def _window_bucket(win: pa.Array) -> pa.Array:
    """Deterministic coarse shuffle bucket for window strings (pandas
    siphash with its fixed default key — stable across processes)."""
    h = pd.util.hash_array(np.asarray(win.to_pylist(), dtype=object),
                           categorize=False)
    return pa.array((h % N_HASH_BUCKETS).astype(np.int32))


def emit_windows(batch: pa.Table, window: int, stride: int,
                 text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, win, bucket) rows: every FULL ``window``-char slice at
    offsets 0, stride, 2*stride, ... — deduped per doc within the batch
    (combiner for the distinct-doc count downstream)."""
    if batch.num_rows == 0:
        return _EMPTY_WINDOWS
    text = pc.fill_null(batch.column(text_col), "")
    doc = batch.column(id_col)
    lens = pc.utf8_length(text)
    maxlen = pc.max(lens).as_py() or 0
    doc_parts, win_parts = [], []
    for off in range(0, max(maxlen - window + 1, 0), stride):
        keep = pc.greater_equal(lens, off + window)  # full windows only
        # utf8_slice_codeunits slices by CODEPOINT for utf8 (verified:
        # 'héllo'[1:4] -> 'éll'), matching DuckDB substring() semantics
        sl = pc.utf8_slice_codeunits(text, off, off + window)
        doc_parts.append(pc.filter(doc, keep).to_pandas())
        win_parts.append(pc.filter(sl, keep).to_pandas())
    if not doc_parts:
        return _EMPTY_WINDOWS
    df = pd.DataFrame({
        "doc_id": pd.concat(doc_parts, ignore_index=True),
        "win": pd.concat(win_parts, ignore_index=True),
    }).drop_duplicates(["doc_id", "win"])
    out = pa.table({
        "doc_id": pa.array(df["doc_id"], type=pa.int64()),
        "win": pa.array(df["win"], type=pa.string()),
    })
    return out.append_column("bucket", _window_bucket(out.column("win")))


def _windows_dataset(docs: ray.data.Dataset, window: int, stride: int,
                     text_col: str, id_col: str) -> ray.data.Dataset:
    return docs.map_batches(
        lambda b: emit_windows(b, window, stride, text_col, id_col),
        batch_format="pyarrow",
    )


def duplicated_windows(docs: ray.data.Dataset, window: int = 40,
                       stride: int = 40, min_docs: int = 2,
                       text_col: str = "text", id_col: str = "doc_id",
                       ) -> ray.data.Dataset:
    """Windows appearing in >= min_docs distinct docs: (win, ndocs).

    One bucketed shuffle; all rows of a window land in one bucket (the
    bucket is a pure function of the window), so the per-bucket distinct-
    doc count is the GLOBAL count."""
    wins = _windows_dataset(docs, window, stride, text_col, id_col)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("win", sort=False)["doc_id"].nunique()
        c = c[c >= min_docs]
        return pd.DataFrame({"win": c.index.to_numpy(),
                             "ndocs": c.to_numpy().astype("int64")})

    return wins.groupby("bucket").map_groups(agg, batch_format="pandas")


def doc_dup_window_stats(docs: ray.data.Dataset, window: int = 40,
                         stride: int = 40, min_docs: int = 2,
                         text_col: str = "text", id_col: str = "doc_id",
                         ) -> ray.data.Dataset:
    """Per-doc duplicated-chunk stats: (doc_id, n_windows, n_dup, dup_ppm)
    over the doc's DISTINCT windows.  ``dup_ppm`` (integer parts-per-
    million, truncating division — non-negative, so trunc == floor on
    both engines) is the filter signal: docs above a dup_ppm threshold
    are boilerplate/mirror candidates.

    Docs shorter than ``window`` emit no windows and are absent from the
    result (callers wanting them keep a left join against the id column).
    """
    wins = _windows_dataset(docs, window, stride, text_col, id_col)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("win", sort=False)["doc_id"].transform("nunique")
        g = g.assign(is_dup=(nd >= min_docs))
        out = (g.groupby("doc_id", sort=False)
                .agg(n_windows=("win", "size"), n_dup=("is_dup", "sum"))
                .reset_index())
        out["n_windows"] = out["n_windows"].astype("int64")
        out["n_dup"] = out["n_dup"].astype("int64")
        return out

    partials = wins.groupby("bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    merged = partials.groupby("doc_id").aggregate(
        Sum("n_windows", alias_name="n_windows"),
        Sum("n_dup", alias_name="n_dup"),
    )

    def fin(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_windows": pd.Series(dtype="int64"),
                                 "n_dup": pd.Series(dtype="int64"),
                                 "dup_ppm": pd.Series(dtype="int64")})
        df["dup_ppm"] = (1_000_000 * df["n_dup"]) // df["n_windows"]
        return df

    return merged.map_batches(fin, batch_format="pyarrow")

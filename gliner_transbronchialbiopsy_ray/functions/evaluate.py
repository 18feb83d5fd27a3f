"""Distributed entity-level evaluation + k-fold metric aggregation (G9).

Reference: train_cross_validation.py evaluates per-fold P/R/F1 and
aggregates across folds inside the training loop; here the evaluation is
an engine operator over (pred, gold) mention datasets.

Scale shape: both sides explode to (doc_id, label, text) mention rows
(vectorized Arrow list flatten), union with a source tag, then ONE hash
shuffle on doc_id; inside each bucket the set-compare collapses to
per-(fold, label) TP/FP/FN counters — only |folds|x|labels| partial rows
leave a bucket, and they sum exactly across buckets because every doc's
mentions are bucket-local.  Match criterion is exact
(doc_id, label, surface) — offset-basis-independent (pred offsets are
conclusion-relative, gold offsets document-relative)."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.window import hash_bucketed_map_groups


def explode_mentions(entities_ds: ray.data.Dataset) -> ray.data.Dataset:
    """ENTITIES_SCHEMA rows -> (doc_id, label, text) mention rows via
    zero-copy list flatten (no Python per-entity loop)."""

    def flatten(batch: pa.Table) -> pa.Table:
        ents = batch.column("entities")
        if isinstance(ents, pa.ChunkedArray):
            ents = ents.combine_chunks()
        flat = ents.flatten()
        parents = ents.value_parent_indices()
        return pa.table({
            "doc_id": batch.column("doc_id").take(parents),
            "label": flat.field("label"),
            "text": flat.field("text"),
        })

    return entities_ds.map_batches(flatten, batch_format="pyarrow")


def entity_prf_by_fold(
    pred_mentions: ray.data.Dataset,
    gold_mentions: ray.data.Dataset,
    k: int = 5,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Per-(fold, label) TP/FP/FN with integer-ppm P/R/F1.  Folds are
    assigned by crc32(doc_id) % k — the same deterministic hash family
    as functions/annotation.py:kfold_splits, so fold membership is
    reproducible under any partitioning."""

    def tag(ds, src):
        def add(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "src", pa.array(np.full(batch.num_rows, src, dtype=np.int8)))
        return ds.map_batches(add, batch_format="pyarrow")

    unioned = tag(pred_mentions, 1).union(tag(gold_mentions, 2))

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["doc_id", "label", "text", "src"])
        # src-sum per distinct mention: 1 = pred-only (FP), 2 = gold-only
        # (FN), 3 = both (TP)
        m = (g.groupby(["doc_id", "label", "text"], sort=False)["src"]
             .sum().reset_index())
        m["fold"] = m["doc_id"].map(
            lambda d: zlib.crc32(str(d).encode()) % k).astype("int64")
        out = (m.groupby(["fold", "label"], sort=False)["src"]
               .value_counts().unstack(fill_value=0)
               .reindex(columns=[1, 2, 3], fill_value=0)
               .rename(columns={1: "fp", 2: "fn", 3: "tp"})
               .reset_index())
        out.columns.name = None
        return out[["fold", "label", "tp", "fp", "fn"]]

    parts = hash_bucketed_map_groups(
        unioned, "doc_id", bucket_fn, n_buckets=n_buckets).to_pandas()
    if "fold" not in parts.columns:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ["fold", "tp", "fp", "fn"]} |
                            {"label": pd.Series(dtype="object")})
    agg = (parts.groupby(["fold", "label"], sort=False)[["tp", "fp", "fn"]]
           .sum().reset_index())
    for c in ["tp", "fp", "fn"]:
        agg[c] = agg[c].astype("int64")
    # integer ppm so the result is exactly reproducible (no float folds)
    agg["p_ppm"] = (1_000_000 * agg["tp"]) // (agg["tp"] + agg["fp"]).clip(lower=1)
    agg["r_ppm"] = (1_000_000 * agg["tp"]) // (agg["tp"] + agg["fn"]).clip(lower=1)
    agg["f1_ppm"] = (2 * agg["p_ppm"] * agg["r_ppm"]) // (
        agg["p_ppm"] + agg["r_ppm"]).clip(lower=1)
    return (agg.sort_values(["fold", "label"]).reset_index(drop=True))


def kfold_summary(per_fold: pd.DataFrame) -> pd.DataFrame:
    """Cross-fold aggregate (the reference's cross-validation summary):
    per label, number of folds seen, mean and population-std of f1_ppm
    plus mean p/r — all integer, deterministic."""
    if per_fold.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ["n_folds", "mean_f1_ppm",
                                       "std_f1_ppm", "mean_p_ppm",
                                       "mean_r_ppm"]} |
                            {"label": pd.Series(dtype="object")})

    def summarize(g: pd.DataFrame) -> pd.Series:
        f1 = g["f1_ppm"].to_numpy(np.int64)
        mean = int(f1.sum()) // len(f1)
        var = int(((f1 - mean) ** 2).sum()) // len(f1)
        return pd.Series({
            "n_folds": np.int64(len(f1)),
            "mean_f1_ppm": np.int64(mean),
            "std_f1_ppm": np.int64(int(np.sqrt(var))),
            "mean_p_ppm": np.int64(int(g["p_ppm"].sum()) // len(g)),
            "mean_r_ppm": np.int64(int(g["r_ppm"].sum()) // len(g)),
        })

    out = (per_fold.groupby("label", sort=False)
           .apply(summarize, include_groups=False).reset_index())
    return out.sort_values("label").reset_index(drop=True)

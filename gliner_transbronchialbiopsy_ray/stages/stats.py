"""Grouped statistics suite (SURVEY §2.5 G2-G8) over the entities/triples
datasets.  All are small-output grouped aggregates: explode row-local lists
vectorized, pre-aggregate per batch where the key space is small, then a
tiny groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..config import LABELS


def explode_entities(batch: pa.Table) -> pa.Table:
    """entities list column -> one row per mention (doc_id, label, text, score)."""
    col = batch.column("entities")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(col)
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=object)
    return pa.table(
        {
            "doc_id": pa.array(
                doc_ids[parents].tolist() if len(parents) else [], type=pa.string()
            ),
            "label": flat.field("label"),
            "text": flat.field("text"),
            "score": flat.field("score"),
        }
    )


def label_statistics(entities_ds: ray.data.Dataset) -> pd.DataFrame:
    """G2: per-label Count, Unique_Count, Mean/Min/Max score.  Includes
    zero rows for labels with no mentions (G3 semantics)."""
    mentions = entities_ds.map_batches(explode_entities, batch_format="pyarrow")
    agg = mentions.groupby("label").aggregate(
        Count(alias_name="count"),
        Mean("score", alias_name="mean_score"),
        Min("score", alias_name="min_score"),
        Max("score", alias_name="max_score"),
    )
    uniq = (
        mentions.groupby(["label", "text"])
        .aggregate(Count(alias_name="_n"))
        .groupby("label")
        .aggregate(Count(alias_name="unique_count"))
    )
    df = agg.to_pandas().merge(uniq.to_pandas(), on="label", how="outer")
    base = pd.DataFrame({"label": LABELS})
    df = base.merge(df, on="label", how="left")
    df["count"] = df["count"].fillna(0).astype(int)
    df["unique_count"] = df["unique_count"].fillna(0).astype(int)
    return df.sort_values("label").reset_index(drop=True)


def global_stats(entities_ds: ray.data.Dataset) -> dict:
    """G4: total docs, docs with conclusion, total entities, mean per doc."""

    def per_batch(batch: pa.Table) -> pa.Table:
        col = batch.column("entities")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_ents = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        status = np.asarray(batch.column("status").to_pylist(), dtype=object)
        return pa.table(
            {
                "docs": pa.array([len(status)], type=pa.int64()),
                "with_conclusion": pa.array(
                    [int(np.sum((status == "ok") | (status == "no_entities")))],
                    type=pa.int64(),
                ),
                "entities": pa.array([int(np.nansum(n_ents))], type=pa.int64()),
            }
        )

    partials = entities_ds.map_batches(per_batch, batch_format="pyarrow")
    total = partials.aggregate(
        Sum("docs", alias_name="docs"),
        Sum("with_conclusion", alias_name="with_conclusion"),
        Sum("entities", alias_name="entities"),
    )
    docs = total["docs"] or 0
    return {
        "total_docs": int(docs),
        "docs_with_conclusion": int(total["with_conclusion"] or 0),
        "total_entities": int(total["entities"] or 0),
        "mean_entities_per_doc": (total["entities"] or 0) / docs if docs else 0.0,
    }


class _CooccurPartial:
    """G5: per-batch partial label-pair counts (pairs per doc are tiny)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("entities")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pairs: dict[tuple[str, str], int] = {}
        for ents in col.to_pylist():
            labels = sorted({e["label"] for e in (ents or [])})
            for i in range(len(labels)):
                for j in range(i + 1, len(labels)):
                    k = (labels[i], labels[j])
                    pairs[k] = pairs.get(k, 0) + 1
        if not pairs:
            return pa.table(
                {"label_a": pa.array([], type=pa.string()),
                 "label_b": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        ks = sorted(pairs)
        return pa.table(
            {
                "label_a": pa.array([k[0] for k in ks], type=pa.string()),
                "label_b": pa.array([k[1] for k in ks], type=pa.string()),
                "n": pa.array([pairs[k] for k in ks], type=pa.int64()),
            }
        )


def label_cooccurrence(entities_ds: ray.data.Dataset) -> pd.DataFrame:
    """G5: cross-doc label co-presence counts (pre-aggregated per batch —
    at most 14*13/2 partial rows per batch reach the shuffle)."""
    partials = entities_ds.map_batches(_CooccurPartial(), batch_format="pyarrow")
    out = partials.groupby(["label_a", "label_b"]).aggregate(Sum("n", alias_name="n"))
    return (
        out.to_pandas()
        .sort_values(["label_a", "label_b"])
        .reset_index(drop=True)
    )


def threshold_impact(entities_ds: ray.data.Dataset, n_steps: int = 21) -> pd.DataFrame:
    """G6: for thresholds linspace(0,1,n), how many mentions survive.
    Single pass: bucket each mention's score, then cumulative sum."""
    mentions = entities_ds.map_batches(explode_entities, batch_format="pyarrow")

    def bucketize(batch: pa.Table) -> pa.Table:
        s = batch.column("score").to_numpy(zero_copy_only=False)
        b = np.clip((s * (n_steps - 1)).astype(np.int32), 0, n_steps - 1)
        return pa.table({"bucket": pa.array(b, type=pa.int32()),
                         "n": pa.array(np.ones(len(b), dtype=np.int64))})

    counts = (
        mentions.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    full = pd.DataFrame({"bucket": np.arange(n_steps)})
    counts = full.merge(counts, on="bucket", how="left").fillna(0)
    counts["n"] = counts["n"].astype(int)
    # mentions surviving threshold t = sum of buckets >= t
    rev = counts["n"][::-1].cumsum()[::-1]
    return pd.DataFrame(
        {
            "threshold": np.round(np.linspace(0, 1, n_steps), 3),
            "surviving": rev.to_numpy(),
        }
    )


def score_histogram(entities_ds: ray.data.Dataset, bins: int = 100) -> pd.DataFrame:
    """Mergeable-sketch variant of G7 for 100 TB inputs: per-batch fixed-bin
    histograms (one (label, bin, n) partial row set per batch) merged by a
    tiny groupby — approximate quantiles derivable from the histogram with
    error <= 1/bins, and partials merge associatively like any sketch."""
    mentions = entities_ds.map_batches(explode_entities, batch_format="pyarrow")

    def hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["label", "score"]).to_pandas()
        df["bin"] = np.clip((df["score"] * bins).astype(int), 0, bins - 1)
        return (
            df.groupby(["label", "bin"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    partials = mentions.map_batches(hist, batch_format="pyarrow").to_pandas()
    return (
        partials.groupby(["label", "bin"], sort=False)["n"]
        .sum()
        .reset_index()
        .sort_values(["label", "bin"])
        .reset_index(drop=True)
    )


def score_distribution(entities_ds: ray.data.Dataset) -> pd.DataFrame:
    """G7: per-label score quantiles (exact at this scale; the scale path is
    a mergeable sketch emitted per batch)."""
    mentions = entities_ds.map_batches(explode_entities, batch_format="pyarrow")

    def q(g: pd.DataFrame) -> pd.DataFrame:
        qs = g["score"].quantile([0.0, 0.25, 0.5, 0.75, 1.0]).to_numpy()
        return pd.DataFrame(
            {
                "label": [g["label"].iloc[0]],
                "q0": [qs[0]], "q25": [qs[1]], "q50": [qs[2]],
                "q75": [qs[3]], "q100": [qs[4]],
            }
        )

    return (
        mentions.groupby("label")
        .map_groups(q, batch_format="pandas")
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )


def profile_columns(
    ds: "ray.data.Dataset",
    columns: list[str],
    n_buckets: int = 256,
) -> pd.DataFrame:
    """Distributed column profiler (the ANALYZE operator of a data
    engine): per column, row count, null count, EXACT distinct count,
    and min/max rendered as strings (int64 and string columns only —
    float/timestamp rendering is engine-specific, callers cast first).

    ONE pass over the data emits two partial streams per batch:
    a 1-row stats partial per column (n, n_null, min, max) and the
    batch's per-column DISTINCT values (lexical form).  Value rows are
    keyed (column, crc32(value) % n_buckets) — never the bare column
    name, which would funnel a column's whole distinct set through one
    group — so the exchange is skew-free two-phase: per-bucket exact
    nunique partials over the value strings (same value -> same
    bucket, so partials add exactly), then an O(columns x n_buckets)
    driver fold (bounded by construction).  Output: (column, n_rows, n_nulls, n_distinct,
    min_repr, max_repr) sorted by column."""
    import zlib

    def partials(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for c in columns:
            col = batch.column(c)
            vals = col.drop_null()
            n, n_null = len(col), col.null_count
            if len(vals):
                mn = pc.min(vals).as_py()
                mx = pc.max(vals).as_py()
            else:
                mn = mx = None
            # native values, folded natively ("10" < "9" as strings);
            # rendering happens once, on the driver
            rows.append(pd.DataFrame({
                "column": [c], "kind": np.int64(0),
                "n": np.int64(n), "n_null": np.int64(n_null),
                "min_r": pd.Series([mn], dtype=object),
                "max_r": pd.Series([mx], dtype=object),
                "v": [""], "_bucket": np.int32(0)}))
            uv = pd.Series(pc.unique(vals).to_pylist()).map(str)
            if len(uv):
                hf = pd.DataFrame({
                    "column": c, "kind": np.int64(1),
                    "n": np.int64(0), "n_null": np.int64(0),
                    "min_r": None, "max_r": None,
                    "v": uv.astype(object)})
                hf["_bucket"] = hf["v"].map(
                    lambda s: zlib.crc32(s.encode()) % n_buckets
                ).astype("int32")
                rows.append(hf)
        return pd.concat(rows, ignore_index=True)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        stats = g[g["kind"] == 0]
        out = []
        if len(stats):
            agg = stats.groupby("column", sort=False).agg(
                n=("n", "sum"), n_null=("n_null", "sum"),
                min_r=("min_r", "min"), max_r=("max_r", "max")
            ).reset_index()
            agg["kind"] = np.int64(0)
            agg["nd"] = np.int64(0)
            out.append(agg)
        hashes = g[g["kind"] == 1]
        if len(hashes):
            nd = (hashes.groupby("column", sort=False)["v"].nunique()
                  .reset_index(name="nd"))
            nd["kind"] = np.int64(1)
            for c in ("n", "n_null"):
                nd[c] = np.int64(0)
            nd["min_r"] = None
            nd["max_r"] = None
            out.append(nd)
        if not out:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in [
                ("column", object), ("kind", "int64"), ("n", "int64"),
                ("n_null", "int64"), ("min_r", object),
                ("max_r", object), ("nd", "int64")]})
        return pd.concat(out, ignore_index=True)[
            ["column", "kind", "n", "n_null", "min_r", "max_r", "nd"]]

    parts = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(bucket_fold, batch_format="pandas")
             .to_pandas())
    # driver fold: O(columns x buckets) partial rows
    stats = parts[parts["kind"] == 0].groupby("column").agg(
        n_rows=("n", "sum"), n_nulls=("n_null", "sum"),
        min_repr=("min_r", "min"), max_repr=("max_r", "max"))
    nd = (parts[parts["kind"] == 1].groupby("column")["nd"].sum()
          .rename("n_distinct"))
    out = stats.join(nd, how="left").reset_index()
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out[["n_rows", "n_nulls"]] = out[["n_rows", "n_nulls"]].astype("int64")
    for c in ("min_repr", "max_repr"):
        out[c] = out[c].map(lambda v: None if v is None else str(v))
    return (out[["column", "n_rows", "n_nulls", "n_distinct",
                 "min_repr", "max_repr"]]
            .sort_values("column").reset_index(drop=True))


def grouped_median_x2(
    ds: "ray.data.Dataset",
    keys: list[str],
    value: str,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """EXACT per-group median — the holistic aggregate the sketch
    family (q60's KLL-style quantiles) approximates.  Returned
    DOUBLED (`median_x2` = lo + hi of the middle pair for even counts,
    2 x middle for odd) so integer inputs stay int64-exact end to end
    — no float interpolation to diverge at the ulp; DuckDB replays it
    as CAST(2 * median(v) AS BIGINT).

    Holistic ⇒ values must co-locate per group: ONE crc(key) coarse-
    bucket exchange (the repo-wide 32-bucket map_groups discipline),
    then a vectorized per-bucket sort + middle-pick across ALL groups
    in the bucket at once (lexsort by (key, value), middle offsets
    from group run lengths — no per-group Python loop)."""
    import zlib

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(keys + [value]).to_pandas()
        k = df[keys[0]].astype(str)
        for c in keys[1:]:
            k = k + "\x00" + df[c].astype(str)
        df["_bucket"] = k.map(
            lambda s: zlib.crc32(s.encode()) % n_buckets).astype("int32")
        return df

    def med(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(keys + [value], kind="stable")
        v = d[value].to_numpy()
        grp = (d[keys].astype(str).agg("\x00".join, axis=1)
               .to_numpy())
        # group run boundaries over the sorted frame
        starts = np.concatenate(
            ([0], np.flatnonzero(grp[1:] != grp[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(grp)]))
        lo = v[starts + (ends - starts - 1) // 2]
        hi = v[starts + (ends - starts) // 2]
        out = d.iloc[starts][keys].reset_index(drop=True)
        out["median_x2"] = (lo + hi).astype("int64")
        return out

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(med, batch_format="pandas"))


def rollup_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    value: str,
    all_label: str = "(all)",
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """ROLLUP (hierarchical GROUPING SETS) in ONE data pass: for key
    prefix levels [k1..kn], [k1..kn-1], ..., [] each batch emits
    per-level combiner partials (sum, count, min, max of `value`), and
    one coarse (level, keys) bucket exchange merges them — n+1
    grouping sets never cost n+1 scans.  Rolled-up key columns carry
    `all_label` instead of SQL's NULL (explicit, join-safe).  Output:
    (k1..kn, level, sum_v, n, min_v, max_v); level = number of active
    keys."""
    import zlib

    def combine(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(keys + [value]).to_pandas()
        parts = []
        for lvl in range(len(keys), -1, -1):
            active = keys[:lvl]
            if active:
                gb = df.groupby(active, sort=False)[value]
                part = gb.agg(["sum", "count", "min", "max"]
                              ).reset_index()
            else:
                part = pd.DataFrame({
                    "sum": [df[value].sum()],
                    "count": [len(df)],
                    "min": [df[value].min() if len(df) else None],
                    "max": [df[value].max() if len(df) else None]})
            for c in keys[lvl:]:
                part[c] = all_label
            part["level"] = np.int64(lvl)
            parts.append(part[keys + ["level", "sum", "count",
                                      "min", "max"]])
        out = pd.concat(parts, ignore_index=True)
        k = out["level"].astype(str)
        for c in keys:
            k = k + "\x00" + out[c].astype(str)
        out["_bucket"] = k.map(
            lambda s: zlib.crc32(s.encode()) % n_buckets).astype("int32")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys + ["level"], sort=False)
        out = gb.agg(sum_v=("sum", "sum"), n=("count", "sum"),
                     min_v=("min", "min"), max_v=("max", "max")
                     ).reset_index()
        out["level"] = out["level"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    return (ds.map_batches(combine, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(merge, batch_format="pandas"))


def grouped_mode(
    ds: "ray.data.Dataset",
    keys: list[str],
    value: str,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Deterministic per-group MODE: the most frequent value, ties
    broken by the smallest value (SQL's mode() leaves ties
    implementation-defined — this one is replayable: ROW_NUMBER OVER
    (ORDER BY cnt DESC, value) = 1).  Combiner-first: per-batch
    (key, value) counts, ONE crc(key) exchange co-locating each key's
    histogram, per-bucket sum + argmax.  Output: keys + (mode_value,
    mode_count)."""
    import zlib

    def combine(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(keys + [value]).to_pandas()
        part = (df.groupby(keys + [value], sort=False)
                .size().rename("n").reset_index())
        k = part[keys[0]].astype(str)
        for c in keys[1:]:
            k = k + "\x00" + part[c].astype(str)
        part["_bucket"] = k.map(
            lambda s: zlib.crc32(s.encode()) % n_buckets).astype("int32")
        return part

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(keys + [value], sort=False)["n"].sum()
               .reset_index()
               .sort_values(["n", value],
                            ascending=[False, True], kind="stable")
               .drop_duplicates(subset=keys, keep="first"))
        out = agg.rename(columns={value: "mode_value",
                                  "n": "mode_count"})
        out["mode_count"] = out["mode_count"].astype("int64")
        return out[keys + ["mode_value", "mode_count"]]

    return (ds.map_batches(combine, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(pick, batch_format="pandas"))


def grouped_quantile_disc(
    ds: "ray.data.Dataset",
    keys: list[str],
    value: str,
    quantiles: list[tuple[str, int, int]],
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """EXACT per-group DISCRETE quantiles (PERCENTILE_DISC /
    quantile_disc semantics): for each requested quantile num/den the
    group's sorted element at index ceil(n * num/den) - 1 — the
    smallest element whose cumulative rank reaches the quantile,
    always a member of the set, so integer inputs stay int64-exact
    (the convention DuckDB's quantile_disc uses, pinned by probe:
    n=7, q=0.75 -> the 6th element, where floor((n-1)q) would pick
    the 5th).

    `quantiles` is [(out_col, num, den), ...] — e.g.
    [("q1", 1, 4), ("q3", 3, 4)] yields one row per group with both
    quartile columns from a SINGLE co-location pass.

    Same holistic discipline as grouped_median_x2: ONE crc(key)
    coarse-bucket exchange, then a vectorized per-bucket sort with
    group run lengths — all groups in a bucket are picked at once, no
    per-group Python loop."""
    import zlib

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(keys + [value]).to_pandas()
        k = df[keys[0]].astype(str)
        for c in keys[1:]:
            k = k + "\x00" + df[c].astype(str)
        df["_bucket"] = k.map(
            lambda s: zlib.crc32(s.encode()) % n_buckets).astype("int32")
        return df

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(keys + [value], kind="stable")
        v = d[value].to_numpy()
        grp = (d[keys].astype(str).agg("\x00".join, axis=1).to_numpy())
        starts = np.concatenate(
            ([0], np.flatnonzero(grp[1:] != grp[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(grp)]))
        n = ends - starts
        out = d.iloc[starts][keys].reset_index(drop=True)
        for col, num, den in quantiles:
            idx = starts + (num * n + den - 1) // den - 1
            out[col] = v[idx].astype("int64")
        out["n"] = n.astype("int64")
        return out

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(pick, batch_format="pandas"))

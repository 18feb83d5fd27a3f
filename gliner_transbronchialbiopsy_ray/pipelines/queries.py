"""Query registry: every implemented operator/pipeline exposed as a
callable(sf_dir) plus (where SQL-expressible) a DuckDB oracle string over the
same parquet tables.  This is the driver's correctness gate
(`__ray_entry__.queries()` / `oracle_sql()`).

Numeric-parity rules used throughout so value-hashes match the oracle:
- float aggregates are rounded identically on both sides (round(x, d));
- ratios that could hit round-half-even vs round-half-away differences are
  computed in INTEGER arithmetic (scaled //) on both sides;
- top-k queries always carry a deterministic tie-break key;
- cosine similarity is computed in float64 on both sides (DuckDB: cast
  list to DOUBLE[]).
"""

from __future__ import annotations

import datetime as dt
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

# --------------------------------------------------------------------------
# helpers


def _preagg(ds, keys: list[str], spec: dict[str, tuple[str, str]],
            merge: str = "driver"):
    """Two-phase grouped aggregation: vectorized per-batch pandas partials
    (combiner) -> final merge.

    merge="driver" (default): partial rows are bounded by (distinct keys x
    batches) — for bounded-cardinality keys the partials are tiny, so the
    final sum happens driver-side in pandas, avoiding Ray's all-to-all
    Aggregate machinery (~5 s fixed cost regardless of data size).
    merge="ray": Ray groupby over the partials — use when the key space
    itself is huge (the partials wouldn't fit one node).

    spec `how` values: sum | count | max | min.  Partials combine with the
    matching fn (count partials combine by sum)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        agg = {}
        for out, (col, how) in spec.items():
            agg[out] = (col, "size" if how == "count" else how)
        return df.groupby(keys, sort=False, dropna=False).agg(**agg).reset_index()

    combine = {
        out: ("sum" if how in ("sum", "count") else how)
        for out, (_, how) in spec.items()
    }
    partials = ds.map_batches(partial, batch_format="pyarrow")
    if merge == "ray":
        from ray.data.aggregate import Max, Min

        cls = {"sum": Sum, "max": Max, "min": Min}
        return partials.groupby(keys).aggregate(
            *[cls[combine[out]](out, alias_name=out) for out in spec]
        )
    pdf = partials.to_pandas()
    # Ray can deliver partial blocks in COMPLETION order (varies run to
    # run); float sums are order-sensitive at the ulp level, which a
    # dtype-sensitive value hash can see after rounding.  Sort partials
    # into a canonical order before the merge so the fold is
    # deterministic regardless of scheduling.
    pdf = pdf.sort_values(keys + list(spec), kind="stable").reset_index(drop=True)
    return (
        pdf.groupby(keys, sort=False, dropna=False)
        .agg(**{out: (out, combine[out]) for out in spec})
        .reset_index()
    )


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --------------------------------------------------------------------------
# relational operators over the TPC-H-ish tables (G2/G4-analog aggregates,
# sorts, joins, dedup) — each with a DuckDB oracle.


def q01_lineitem_agg(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def with_cents(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        # discounts are 2-decimal; integer cents keep the avg divisible
        # exactly on both engines (no float rounding-mode hazard)
        df["disc_cents"] = (df["l_discount"] * 100).round().astype("int64")
        return df

    out = _preagg(
        ds.map_batches(with_cents, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_price": ("l_extendedprice", "sum"),
            "disc_cents": ("disc_cents", "sum"),
            "n": ("l_quantity", "count"),
        },
    )
    out["avg_disc_ppm"] = (1_000_000 * out["disc_cents"]) // (100 * out["n"])
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_price"] = out["sum_price"].round(2)
    return out.drop(columns=["disc_cents"])


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS n,
       (1000000 * CAST(round(sum(l_discount) * 100) AS BIGINT))
         // (100 * count(*)) AS avg_disc_ppm
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q02_filtered_revenue(sf_dir: str) -> pd.DataFrame:
    """Filter + computed column with the predicate PUSHED INTO THE READ
    (row-group pruning at the source — only matching row groups leave
    storage), plus a residual in-batch filter for exactness."""
    cutoff = dt.datetime(1996, 1, 1)
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") < cutoff),
    )

    def fr(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["l_shipdate"], pa.scalar(cutoff)))
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_returnflag": batch["l_returnflag"], "revenue": rev})

    out = _preagg(
        ds.map_batches(fr, batch_format="pyarrow"),
        ["l_returnflag"],
        {"revenue": ("revenue", "sum"), "n": ("revenue", "count")},
    )
    out["revenue"] = out["revenue"].round(2)
    return out


Q02_SQL = """
SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
"""


def q03_top_orders(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return top.to_pandas()


Q03_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q04_mktsegment_revenue(sf_dir: str) -> pd.DataFrame:
    """Broadcast hash join: customer (small) shipped once via ray.put,
    orders stream through map_batches — no shuffle join."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class AddSegment:
        def __init__(self):
            self.seg = ray.get(seg_ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df["c_mktsegment"] = df["o_custkey"].map(self.seg)
            return df[["c_mktsegment", "o_totalprice"]]

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = orders.map_batches(AddSegment, batch_format="pyarrow",
                                concurrency=2, num_cpus=0.5)
    out = _preagg(
        joined, ["c_mktsegment"],
        {"total": ("o_totalprice", "sum"), "n": ("o_totalprice", "count")},
    )
    out["total"] = out["total"].round(2)
    return out


Q04_SQL = """
SELECT c_mktsegment, round(sum(o_totalprice), 2) AS total, count(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q05_region_customers(sf_dir: str) -> pd.DataFrame:
    """Multi-hop dimension join, all small sides broadcast."""
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({k: r2name[v] for k, v in n2r.items()})

    class AddRegion:
        def __init__(self):
            self.lk = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df["r_name"] = df["c_nationkey"].map(self.lk)
            return df[["r_name", "c_custkey"]]

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = cust.map_batches(AddRegion, batch_format="pyarrow",
                              concurrency=2, num_cpus=0.5)
    return _preagg(joined, ["r_name"], {"n": ("c_custkey", "count")})


Q05_SQL = """
SELECT r_name, count(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q06_distinct_flags(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    batch_distinct = ds.map_batches(
        lambda b: b.to_pandas().drop_duplicates(), batch_format="pyarrow"
    ).repartition(4)
    out = batch_distinct.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    return out.to_pandas()


Q06_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q07_orders_by_status_month(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderdate", "o_totalprice"])

    def month(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["month"] = df["o_orderdate"].dt.strftime("%Y-%m")
        return df[["o_orderstatus", "month", "o_totalprice"]]

    out = _preagg(
        ds.map_batches(month, batch_format="pyarrow"),
        ["o_orderstatus", "month"],
        {"total": ("o_totalprice", "sum"), "n": ("o_totalprice", "count")},
    )
    out["total"] = out["total"].round(2)
    return out


Q07_SQL = """
SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS month,
       round(sum(o_totalprice), 2) AS total, count(*) AS n
FROM orders GROUP BY o_orderstatus, month
"""


# --------------------------------------------------------------------------
# events: time bucketing, top-k, sessionization (streaming-shaped workload
# expressed as ordered groupby — SURVEY §2.9 note)


def q08_events_hourly(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def hour(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
        return df[["hour", "event_type", "value"]]

    out = _preagg(
        ds.map_batches(hour, batch_format="pyarrow"),
        ["hour", "event_type"],
        {"total_value": ("value", "sum"), "n": ("value", "count")},
    )
    out["total_value"] = out["total_value"].round(2)
    return out


Q08_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, round(sum(value), 2) AS total_value, count(*) AS n
FROM events GROUP BY hour, event_type
"""


def q09_top_users(sf_dir: str) -> pd.DataFrame:
    """Top-k over an UNBOUNDED key (user_id grows with scale): full
    per-user totals via Ray-merged two-phase aggregation (a partial top-k
    before full aggregation would be wrong — a user outside one batch's
    top-k can still be global top), then per-batch top-k combiner over the
    aggregated rows so only k rows per block reach the driver."""
    ds = _read(sf_dir, "events", ["user_id", "value"])
    agg = _preagg(ds, ["user_id"], {"total": ("value", "sum")}, merge="ray")

    def topk(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["total"] = df["total"].round(2)
        return df.sort_values(["total", "user_id"], ascending=[False, True],
                              kind="stable").head(10)

    parts = agg.map_batches(topk, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["total", "user_id"], ascending=[False, True],
                            kind="stable").head(10)
    return out.reset_index(drop=True)


Q09_SQL = """
SELECT user_id, round(sum(value), 2) AS total FROM events
GROUP BY user_id ORDER BY total DESC, user_id LIMIT 10
"""


def q10_sessionize(sf_dir: str) -> pd.DataFrame:
    """Session count per user with a 30-minute inactivity gap.  Ray side:
    groupby(user).map_groups over ts-sorted events (the partitioned-log
    pattern for stream-shaped data); oracle: lag window function."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # every user's events are in exactly one bucket; one vectorized
        # pandas pass per bucket (coarse shuffle key: group-call overhead
        # is bounded by bucket count, not user count)
        g = g.sort_values(["user_id", "ts"], kind="stable")
        gaps = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        starts = gaps.isna() | (gaps > 1800)
        out = starts.groupby(g["user_id"], sort=False).sum().rename("n_sessions")
        return out.reset_index().astype({"n_sessions": "int64"})

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .repartition(8)
        .groupby("bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
        .to_pandas()
    )


Q10_SQL = """
SELECT user_id, count(*) FILTER (
  WHERE prev_ts IS NULL OR epoch(ts - prev_ts) > 1800
) AS n_sessions
FROM (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
) GROUP BY user_id
"""


# --------------------------------------------------------------------------
# documents: text analysis + dedup family


def q11_token_count(sf_dir: str):
    from ..stages.text_analysis import token_count

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        token_count, batch_format="pyarrow"
    )


Q11_SQL = "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents"


def q12_lang_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = _preagg(ds, ["lang"], {"sum_chars": ("n_chars", "sum"),
                                 "n": ("n_chars", "count")})
    # integer-scaled average (exact on both engines)
    out["avg_chars_ppm"] = (1_000_000 * out["sum_chars"]) // out["n"]
    return out.drop(columns=["sum_chars"])


Q12_SQL = """
SELECT lang, count(*) AS n,
       CAST((1000000 * sum(n_chars)) // count(*) AS BIGINT) AS avg_chars_ppm
FROM documents GROUP BY lang
"""


def q13_exact_dedup(sf_dir: str):
    from ..stages.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


Q13_SQL = "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"


def q14_duplicate_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact-duplicate pair COUNT (scalar result keeps the schema stable
    even when the corpus has zero duplicates; the pair-listing operator
    itself is `stages.dedup.duplicate_pairs`, unit-tested on a corpus with
    injected dupes)."""
    from ..stages.dedup import duplicate_pairs

    pairs = duplicate_pairs(_read(sf_dir, "documents", ["doc_id", "text"]))
    return pd.DataFrame({"n_dup_pairs": [pairs.count()]})


Q14_SQL = """
SELECT count(*) AS n_dup_pairs
FROM documents a JOIN documents b ON a.text = b.text AND a.doc_id < b.doc_id
"""


def q15_fingerprint(sf_dir: str):
    from ..stages.text_analysis import fingerprint

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint, batch_format="pyarrow"
    )


Q15_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"


def q16_quality(sf_dir: str) -> pd.DataFrame:
    """Quality features in INTEGER-scaled arithmetic (ppm) so rounding-mode
    differences between numpy and DuckDB cannot flip a digit."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feats(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch.column("text").to_pylist()).fillna("")
        doc_id = batch.column("doc_id").to_pylist()
        n_chars = s.str.len().astype("int64")
        n_tokens = (s.str.count(" ") + 1).astype("int64")
        n_stop = s.str.count(r"(?:^| )(?:the|a)(?= |$)").astype("int64")
        return pd.DataFrame(
            {
                "doc_id": doc_id,
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "stop_ppm": (1_000_000 * n_stop) // n_tokens,
                "mean_tok_len_ppm": (1_000_000 * (n_chars - (n_tokens - 1))) // n_tokens,
            }
        )

    return ds.map_batches(feats, batch_format="pyarrow")


Q16_SQL = """
SELECT doc_id, length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       (1000000 * len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))))
         // len(string_split(text, ' ')) AS stop_ppm,
       (1000000 * (length(text) - (len(string_split(text, ' ')) - 1)))
         // len(string_split(text, ' ')) AS mean_tok_len_ppm
FROM documents
"""


def q17_langid(sf_dir: str):
    """Heuristic language ID (stopword-profile argmax, first-wins ties).
    Model-style actor-pool op; on ASCII corpora the heuristic is exactly
    SQL-expressible (token join against the profile table + ranked
    argmax), so it carries an oracle — a real model backend would drop
    back to rows-only."""
    from ..stages.text_analysis import LangId

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=2, num_cpus=0.5
    )


def _langid_sql() -> str:
    """Mirror of text_analysis._LANG_PROFILES with first-wins priority."""
    from ..stages.text_analysis import _LANG_PROFILES

    vals = []
    for prio, (lang, words) in enumerate(_LANG_PROFILES.items(), start=1):
        for w in sorted(words):
            vals.append(f"('{lang}', '{w}', {prio})")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
prof(lang, w, prio) AS (VALUES {", ".join(vals)}),
hits AS (
  SELECT t.doc_id, p.lang, p.prio, count(*) AS h
  FROM toks t JOIN prof p ON t.w = p.w
  GROUP BY t.doc_id, p.lang, p.prio
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, prio) AS rn
  FROM hits
)
SELECT d.doc_id, coalesce(b.lang, 'unknown') AS lang_pred
FROM documents d
LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
ORDER BY d.doc_id
"""


def q18_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id 0..4 (float64 on
    both sides; deterministic tie-break on neighbor_id)."""
    from ..stages.similarity import brute_force_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).take_all()  # vectorized predicate; 5 tiny rows reach the driver
    queries = {r["vec_id"]: r["embedding"] for r in qrows}
    out = brute_force_topk(emb, queries, k=5)
    return out[["query_id", "neighbor_id", "score", "rank"]]


Q18_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS score
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id
),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank FROM s)
SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
"""


def q19_embedding_norms(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def norms(batch: pa.Table) -> pd.DataFrame:
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        return pd.DataFrame(
            {"label": batch.column("label").to_pylist(),
             "norm": np.sqrt((m * m).sum(axis=1))}
        )

    out = _preagg(
        ds.map_batches(norms, batch_format="pyarrow"),
        ["label"], {"sum_norm": ("norm", "sum"), "n": ("norm", "count")},
    )
    out["avg_norm"] = (out["sum_norm"] / out["n"]).round(6)
    return out.drop(columns=["sum_norm"])


Q19_SQL = """
SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
       round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm
FROM embeddings GROUP BY label
"""


def q20_emb_neardup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact cosine near-dup pairs (threshold 0.4) — right side broadcast
    once (embeddings fit the small-side budget; the LSH variant below is the
    100 TB path)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    full = emb.to_pandas()
    ids = full["vec_id"].to_numpy()
    m = np.array(full["embedding"].tolist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, mn))

    class Pairs:
        def __init__(self):
            self.ids, self.mn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            bids = np.asarray(batch.column("vec_id").to_pylist())
            bm = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
            sims = bm @ self.mn.T
            li, ri = np.nonzero((sims >= 0.4) & (bids[:, None] < self.ids[None, :]))
            return pd.DataFrame(
                {"left_id": bids[li], "right_id": self.ids[ri],
                 "cosine": np.round(sims[li, ri], 6)}
            )

    return emb.map_batches(Pairs, batch_format="pyarrow",
                           concurrency=2, num_cpus=0.5)


Q20_SQL = """
SELECT a.vec_id AS left_id, b.vec_id AS right_id,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
"""


def q21_emb_neardup_lsh(sf_dir: str):
    """LSH-bucketed near-dup (the at-scale variant; approximate -> rows-only)."""
    from ..stages.dedup import embedding_neardup_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_neardup_pairs(emb, cosine_threshold=0.4)


def q22_minhash_neardup(sf_dir: str):
    """MinHash-LSH near-duplicate candidates over documents (rows-only)."""
    from ..stages.dedup import minhash_candidate_pairs

    return minhash_candidate_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), jaccard_threshold=0.5,
        concurrency=2,
    )


def q23_simhash(sf_dir: str):
    """64-bit SimHash signatures per doc (rows-only; deterministic)."""
    from ..stages.dedup import simhash_signatures

    return simhash_signatures(
        _read(sf_dir, "documents", ["doc_id", "text"]), concurrency=2
    )


def q24_event_type_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Per-user event-type co-presence pairs (G5 analog with SQL oracle)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().drop_duplicates()  # per-batch combiner
        df["bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        j = g.merge(g, on="user_id")
        j = j[j["event_type_x"] < j["event_type_y"]]
        return j.rename(columns={"event_type_x": "et1", "event_type_y": "et2"})[
            ["et1", "et2"]
        ]

    p = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .repartition(8)
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    return _preagg(p, ["et1", "et2"], {"n": ("et1", "count")})


Q24_SQL = """
SELECT a.event_type AS et1, b.event_type AS et2, count(*) AS n
FROM (SELECT DISTINCT user_id, event_type FROM events) a
JOIN (SELECT DISTINCT user_id, event_type FROM events) b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""


def q25_word_frequencies(sf_dir: str) -> pd.DataFrame:
    from ..stages.text_analysis import word_frequencies

    return word_frequencies(_read(sf_dir, "documents", ["text"]), top_k=20)


Q25_SQL = """
SELECT word, CAST(n AS BIGINT) AS n FROM (
  SELECT w AS word, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
) ORDER BY n DESC, word LIMIT 20
"""


def q26_latest_event_per_user(sf_dir: str) -> pd.DataFrame:
    """Keep-latest-by-key (O2 sort + keyed dedup): last event per user."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        # per-batch combiner: keep only the latest per user within the batch
        df = batch.to_pandas().sort_values(["ts", "event_id"], kind="stable")
        df = df.groupby("user_id", sort=False).tail(1)
        df["bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def latest_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        return g.groupby("user_id", sort=False).tail(1).drop(columns=["bucket"])

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .repartition(8)
        .groupby("bucket")
        .map_groups(latest_bucket, batch_format="pandas")
        .to_pandas()
    )


Q26_SQL = """
SELECT user_id, ts, event_type, event_id FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q27_global_sort_check(sf_dir: str) -> pd.DataFrame:
    """Global sort evidence (O2): events sorted by ts; verified via the
    order-sensitive fingerprint of (rank -> event_id) for the first 100
    rows (an order-insensitive hash can't see sort order, so the rank
    column makes it order-sensitive)."""
    ds = _read(sf_dir, "events", ["ts", "event_id"])
    top = ds.sort(["ts", "event_id"]).limit(100).to_pandas()
    top["rank"] = range(1, len(top) + 1)
    return top[["rank", "event_id", "ts"]]


Q27_SQL = """
SELECT CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rank,
       event_id, ts
FROM events ORDER BY ts, event_id LIMIT 100
"""


def q28_part_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])
    out = _preagg(
        ds, ["p_brand"],
        {"total_price": ("p_retailprice", "sum"), "n": ("p_size", "count"),
         "sum_size": ("p_size", "sum")},
    )
    out["total_price"] = out["total_price"].round(2)
    # p_size is int32 — widen before the ppm multiply or it overflows
    out["avg_size_ppm"] = (1_000_000 * out["sum_size"].astype("int64")) // out["n"]
    return out.drop(columns=["sum_size"])


Q28_SQL = """
SELECT p_brand, round(sum(p_retailprice), 2) AS total_price, count(*) AS n,
       CAST((1000000 * sum(p_size)) // count(*) AS BIGINT) AS avg_size_ppm
FROM part GROUP BY p_brand
"""


def q29_supplier_nation(sf_dir: str) -> pd.DataFrame:
    """Broadcast join supplier x nation + aggregate."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    lk_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    class AddNation:
        def __init__(self):
            self.lk = ray.get(lk_ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df["n_name"] = df["s_nationkey"].map(self.lk)
            return df[["n_name", "s_acctbal"]]

    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    joined = sup.map_batches(AddNation, batch_format="pyarrow",
                             concurrency=2, num_cpus=0.5)
    out = _preagg(joined, ["n_name"],
                  {"total_bal": ("s_acctbal", "sum"),
                   "n": ("s_acctbal", "count")})
    out["total_bal"] = out["total_bal"].round(2)
    return out


Q29_SQL = """
SELECT n_name, round(sum(s_acctbal), 2) AS total_bal, count(*) AS n
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q30_orders_lineitem_join(sf_dir: str) -> pd.DataFrame:
    """Large-x-large partitioned hash join expressed the portable way:
    bucket both sides on the key hash, groupby bucket, pairwise join inside
    the group (SURVEY §2.4; Dataset.join exists in newer Ray — this is the
    version-portable pattern).  Output: revenue per order priority."""
    B = 32
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def o_side(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["bucket"] = (df["o_orderkey"] % B).astype("int32")
        df["side"] = "o"
        df = df.rename(columns={"o_orderkey": "key"})
        df["rev"] = 0.0
        return df[["bucket", "side", "key", "o_orderpriority", "rev"]]

    def l_side(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["bucket"] = (df["l_orderkey"] % B).astype("int32")
        df["side"] = "l"
        df = df.rename(columns={"l_orderkey": "key"})
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        df["o_orderpriority"] = None
        return df[["bucket", "side", "key", "o_orderpriority", "rev"]]

    both = orders.map_batches(o_side, batch_format="pyarrow").union(
        items.map_batches(l_side, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == "o"][["key", "o_orderpriority"]]
        l = g[g["side"] == "l"][["key", "rev"]]
        j = l.merge(o, on="key", how="inner")
        return (
            j.groupby("o_orderpriority", sort=False)
            .agg(revenue=("rev", "sum"), n=("rev", "size"))
            .reset_index()
        )

    from ray.data.aggregate import Sum

    partial = both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")
    out = (
        partial.groupby("o_orderpriority")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    return out


Q30_SQL = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q31_training_records(sf_dir: str) -> pd.DataFrame:
    """Annotation ETL (M7/M8): wide gold annotations -> token-level training
    records; returns per-record token/span counts (deterministic)."""
    from ..functions.annotation import annotations_to_records

    path = _btb_corpus_for(sf_dir)
    wide = btb_wide(sf_dir).drop_columns(["Scores", "n_entities"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        names = {"Conclusion": "text"}
        cols = [names.get(c, c) for c in batch.column_names]
        return batch.rename_columns(cols)

    recs = wide.map_batches(prep, batch_format="pyarrow").map_batches(
        annotations_to_records, batch_format="pyarrow"
    )

    def counts(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        return pd.DataFrame(
            {
                "n_tokens": pc.list_value_length(batch.column("tokenized_text")).to_pylist(),
                "n_spans": pc.list_value_length(batch.column("ner")).to_pylist(),
            }
        )

    df = recs.map_batches(counts, batch_format="pyarrow").to_pandas()
    return (
        df.groupby(["n_tokens", "n_spans"]).size().rename("n").reset_index()
    )


# --------------------------------------------------------------------------
# BTB knowledge-graph pipeline queries (fixture corpus, deterministic; the
# NER/linking semantics are not SQL-expressible -> rows-only driver check;
# their correctness gate is tests/test_pipeline_e2e.py's golden P/R)

_SF_TO_NDOCS = {"sf0.001": 200, "sf0.01": 1000, "sf0.1": 20000}


def _auto_btb_cfg(work_factor: int = 1):
    """PipelineConfig sized to the current cluster: the NER actor pool gets
    ~half the CPUs (at 0.5 CPU each), leaving headroom for the stateless
    read/map stages so the stream never starves."""
    from ..config import PipelineConfig

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    pool = max(2, cpus)          # actors at 0.5 CPU each => ~cpus/2 reserved
    return PipelineConfig(
        ner_concurrency=(2, pool),
        ner_num_cpus=0.5,
        ner_batch_size=128,
        model_backend="lexicon",
        # NER actor-task granularity = block count (~n_rows/4096 after the
        # text-stage bundling).  Measured at sf0.1/32cpu: adding a
        # repartition (ner_blocks) or un-bundling the text stages costs
        # MORE than the parallelism it buys with the cheap lexicon kernel
        # (5.4s baseline vs 6.0-6.9s tuned) — per-task overhead dominates.
        # With a real model backend (>=50ms/doc), set ner_blocks >= pool
        # and a small ner_batch_size instead, as bench.py's scaling job
        # does via override_num_blocks.
    ), work_factor


def _btb_corpus_for(sf_dir: str) -> str:
    from ..fixtures import write_corpus

    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return write_corpus(_SF_TO_NDOCS.get(name, 1000), seed=42, shards=8)


def btb_triples(sf_dir: str):
    from ..config import PipelineConfig
    from .btb import triples_dataset

    path = _btb_corpus_for(sf_dir)
    docs = rd.read_parquet(f"{path}/documents")
    cfg, _ = _auto_btb_cfg()
    return triples_dataset(docs, cfg)


def btb_wide(sf_dir: str):
    from ..config import PipelineConfig
    from ..stages.pivot import pivot_wide
    from .btb import entities_dataset

    path = _btb_corpus_for(sf_dir)
    docs = rd.read_parquet(f"{path}/documents")
    cfg, _ = _auto_btb_cfg()
    ents = entities_dataset(docs, cfg)
    return ents.map_batches(pivot_wide, batch_format="pyarrow")


def btb_highlighted(sf_dir: str):
    """M9 highlight_entities (reference dashboard_v1.py:54-73) as an
    offset-correct presentation stage: entities dataset -> per-doc HTML
    with each span wrapped in the reference's span/tooltip markup."""
    from ..stages.highlight import highlight_batch
    from .btb import entities_dataset

    path = _btb_corpus_for(sf_dir)
    docs = rd.read_parquet(f"{path}/documents")
    cfg, _ = _auto_btb_cfg()
    ents = entities_dataset(docs, cfg)
    return ents.map_batches(highlight_batch, batch_format="pyarrow")


def btb_kfold_metrics(sf_dir: str) -> pd.DataFrame:
    """G9 k-fold metric aggregate: entity-level P/R/F1 per fold over the
    fixture corpus (pred = lexicon NER, gold = planted mentions), then
    the cross-fold mean/std summary — the reference's cross-validation
    metric aggregation re-expressed as a distributed evaluation operator
    (functions/evaluate.py)."""
    from ..functions.evaluate import (
        entity_prf_by_fold,
        explode_mentions,
        kfold_summary,
    )
    from .btb import entities_dataset

    path = _btb_corpus_for(sf_dir)
    docs = rd.read_parquet(f"{path}/documents")
    cfg, _ = _auto_btb_cfg()
    pred = explode_mentions(entities_dataset(docs, cfg))
    gold = rd.read_parquet(f"{path}/gold_entities.parquet",
                           columns=["doc_id", "label", "text"])
    per_fold = entity_prf_by_fold(pred, gold, k=5)
    return kfold_summary(per_fold)


def btb_curation_pipeline(sf_dir: str) -> pd.DataFrame:
    """The composite training-data curation funnel (pipelines/docs.py:
    curate_corpus): quality -> repetition -> exact dedup ->
    decontamination over the documents table (source 'src0' as the eval
    set, matching q62), ending in kept-corpus context-window sizing.
    One shuffle total; funnel counted in a single combiner aggregate.
    Deterministic -> golden-pinned."""
    from .docs import curate_corpus

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    bench = docs.filter(expr="source == 'src0'")
    corpus = docs.filter(expr="source != 'src0'")
    return curate_corpus(corpus, bench)


def btb_label_stats(sf_dir: str) -> pd.DataFrame:
    from ..config import PipelineConfig
    from ..stages.stats import label_statistics
    from .btb import entities_dataset

    path = _btb_corpus_for(sf_dir)
    docs = rd.read_parquet(f"{path}/documents")
    cfg, _ = _auto_btb_cfg()
    ents = entities_dataset(docs, cfg)
    return label_statistics(ents)


def btb_surface_forms(sf_dir: str):
    from ..config import PipelineConfig
    from ..stages.triples import surface_form_stats
    from .btb import triples_dataset

    path = _btb_corpus_for(sf_dir)
    docs = rd.read_parquet(f"{path}/documents")
    cfg, _ = _auto_btb_cfg()
    tri = triples_dataset(docs, cfg)
    return surface_form_stats(tri)


def btb_media_features(sf_dir: str):
    """Media-span feature extraction (decode stub); the query projects the
    list<float> feature down to a rounded norm so the driver's value-hash
    stays scalar — the full vector schema is covered by pytest."""
    from ..stages.multimodal import media_features

    path = _btb_corpus_for(sf_dir)
    feats = media_features(rd.read_parquet(f"{path}/documents"))

    def project(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["feature_norm"] = df["feature"].map(
            lambda v: round(float(np.linalg.norm(np.asarray(v, dtype=np.float64))), 4)
            if v is not None else None
        )
        return df[["doc_id", "media_ref", "kind", "decode_status", "feature_norm"]]

    return feats.map_batches(project, batch_format="pyarrow")


def btb_corrected_wide(sf_dir: str):
    from ..stages.corrections import apply_corrections

    path = _btb_corpus_for(sf_dir)
    wide = btb_wide(sf_dir)
    corr = rd.read_parquet(f"{path}/corrections.parquet")
    return apply_corrections(wide, corr)


def btb_global_stats(sf_dir: str) -> pd.DataFrame:
    from ..stages.stats import global_stats
    from .btb import entities_dataset

    path = _btb_corpus_for(sf_dir)
    cfg, _ = _auto_btb_cfg()
    ents = entities_dataset(rd.read_parquet(f"{path}/documents"), cfg)
    return pd.DataFrame([global_stats(ents)])


def btb_cooccurrence(sf_dir: str) -> pd.DataFrame:
    from ..stages.stats import label_cooccurrence
    from .btb import entities_dataset

    path = _btb_corpus_for(sf_dir)
    cfg, _ = _auto_btb_cfg()
    ents = entities_dataset(rd.read_parquet(f"{path}/documents"), cfg)
    return label_cooccurrence(ents)


def btb_threshold_curve(sf_dir: str) -> pd.DataFrame:
    from ..stages.stats import threshold_impact
    from .btb import entities_dataset

    path = _btb_corpus_for(sf_dir)
    cfg, _ = _auto_btb_cfg()
    ents = entities_dataset(rd.read_parquet(f"{path}/documents"), cfg)
    return threshold_impact(ents)


def btb_score_distribution(sf_dir: str) -> pd.DataFrame:
    from ..stages.stats import score_distribution
    from .btb import entities_dataset

    path = _btb_corpus_for(sf_dir)
    cfg, _ = _auto_btb_cfg()
    ents = entities_dataset(rd.read_parquet(f"{path}/documents"), cfg)
    return score_distribution(ents)


def btb_corrections_by_date(sf_dir: str) -> pd.DataFrame:
    from ..stages.corrections import corrections_by_date

    path = _btb_corpus_for(sf_dir)
    return corrections_by_date(rd.read_parquet(f"{path}/corrections.parquet"))


def q32_ivf_ann_topk(sf_dir: str) -> pd.DataFrame:
    """IVF approximate top-k (scale path; approximate -> rows-only)."""
    from ..stages.similarity import ivf_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).take_all()
    queries = {r["vec_id"]: r["embedding"] for r in qrows}
    return ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=8)


def q33_verified_neardups(sf_dir: str):
    """MinHash-LSH candidates + exact n-gram Jaccard verification."""
    from ..stages.dedup import verified_near_dups

    return verified_near_dups(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        jaccard_threshold=0.5, concurrency=2,
    )


def q34_native_join(sf_dir: str) -> pd.DataFrame:
    """Native Dataset.join (hash-partitioned) — the built-in alternative to
    q30's explicit bucketed join; falls back to q30 when this Ray version
    lacks Dataset.join.  Output: revenue per order priority (same oracle)."""
    if not hasattr(rd.Dataset, "join"):
        return q30_orders_lineitem_join(sf_dir)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    # partition count sized to the cluster: each partition spawns aggregator
    # actors, so 16 partitions on a 4-CPU driver run is pure overhead
    try:
        n_parts = max(2, min(16, int(ray.cluster_resources().get("CPU", 4)) // 2))
    except Exception:
        n_parts = 8
    joined = items.join(
        orders, join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def rev(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df[["o_orderpriority", "rev"]]

    out = _preagg(
        joined.map_batches(rev, batch_format="pyarrow"),
        ["o_orderpriority"],
        {"revenue": ("rev", "sum"), "n": ("rev", "count")},
    )
    out["revenue"] = out["revenue"].round(2)
    return out


def q35_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Sliding-window aggregate (1 h windows, 30 min slide): each event maps
    to exactly 2 windows (flat-map in the batch UDF), then combiner+merge.
    Window keys are integer epoch-seconds — exact on both engines."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def expand(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        epoch_us = df["ts"].astype("datetime64[us]").astype("int64")
        slot = epoch_us // 1_800_000_000  # 30-min slots, exact integer math
        out = []
        for off in (0, 1):
            w = df.copy()
            w["window_start"] = (slot - off) * 1800
            out.append(w[["window_start", "event_type", "value"]])
        return pd.concat(out, ignore_index=True)

    out = _preagg(
        ds.map_batches(expand, batch_format="pyarrow"),
        ["window_start", "event_type"],
        {"total_value": ("value", "sum"), "n": ("value", "count")},
    )
    out["total_value"] = out["total_value"].round(2)
    return out


Q35_SQL = """
SELECT (epoch_us(ts) // 1800000000 - off) * 1800 AS window_start,
       event_type, round(sum(value), 2) AS total_value, count(*) AS n
FROM events CROSS JOIN (VALUES (0), (1)) AS offs(off)
GROUP BY window_start, event_type
"""


def q36_topk_per_group(sf_dir: str) -> pd.DataFrame:
    """Top-2 events by value per event_type (grouped rank): coarse-bucket
    combiner keeps only per-batch top-2 before the shuffle."""
    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def partial_top(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df.sort_values(["value", "event_id"], ascending=[False, True],
                            kind="stable")
        return df.groupby("event_type", sort=False).head(2)

    partials = ds.map_batches(partial_top, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(["value", "event_id"],
                                    ascending=[False, True], kind="stable")
    out = partials.groupby("event_type", sort=False).head(2).reset_index(drop=True)
    out["rank"] = out.groupby("event_type").cumcount() + 1
    return out[["event_type", "event_id", "value", "rank"]]


Q36_SQL = """
SELECT event_type, event_id, value, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 2
"""


def btb_score_histogram(sf_dir: str) -> pd.DataFrame:
    """Mergeable fixed-bin histogram sketch of mention scores (G7 at scale)."""
    from ..stages.stats import score_histogram
    from .btb import entities_dataset

    path = _btb_corpus_for(sf_dir)
    cfg, _ = _auto_btb_cfg()
    ents = entities_dataset(rd.read_parquet(f"{path}/documents"), cfg)
    return score_histogram(ents)


def q38_winnow_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing rolling-hash fingerprints; returns per-doc fingerprint
    counts (deterministic; set itself is list<uint64>, rows-only check)."""
    from ..stages.text_analysis import winnow_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        winnow_fingerprints, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "n_fingerprints"]).to_pandas()


def q40_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """LEFT-join semantics: order count per customer INCLUDING zero-order
    customers.  Ray side: grouped counts on the big side (combiner), then a
    left merge onto the (small) customer table."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    counts = _preagg(orders, ["o_custkey"], {"n_orders": ("o_orderkey", "count")})
    cust = _read(sf_dir, "customer", ["c_custkey"]).to_pandas()
    out = cust.merge(counts, left_on="c_custkey", right_on="o_custkey", how="left")
    out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
    return out[["c_custkey", "n_orders"]]


Q40_SQL = """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""


def q41_string_kernels(sf_dir: str):
    """Scalar string functions as pure pyarrow.compute kernels (upper,
    slice, element-wise concat) — zero Python in the batch body."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def fn(batch: pa.Table) -> pa.Table:
        lang = batch["lang"]
        src = batch["source"]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_uc": pc.utf8_upper(lang),
                "src_id": pc.utf8_slice_codeunits(src, 3),
                "combo": pc.binary_join_element_wise(lang, src, "-"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


Q41_SQL = """
SELECT doc_id, upper(lang) AS lang_uc, substr(source, 4) AS src_id,
       lang || '-' || source AS combo
FROM documents
"""


def q42_conditional_agg(sf_dir: str) -> pd.DataFrame:
    """Conditional aggregation (CASE WHEN analog via pc.if_else): revenue
    split into high/low-discount buckets per return flag."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_discount"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        hi = pc.greater_equal(batch["l_discount"], pa.scalar(0.05))
        zero = pa.scalar(0.0)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "rev_hi_disc": pc.if_else(hi, rev, zero),
                "rev_lo_disc": pc.if_else(hi, zero, rev),
            }
        ).to_pandas()

    out = _preagg(
        ds.map_batches(fn, batch_format="pyarrow"),
        ["l_returnflag"],
        {"rev_hi_disc": ("rev_hi_disc", "sum"),
         "rev_lo_disc": ("rev_lo_disc", "sum"),
         "n": ("rev_hi_disc", "count")},
    )
    out["rev_hi_disc"] = out["rev_hi_disc"].round(2)
    out["rev_lo_disc"] = out["rev_lo_disc"].round(2)
    return out


Q42_SQL = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_discount >= 0.05
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
         AS rev_hi_disc,
       round(sum(CASE WHEN l_discount >= 0.05
                      THEN 0 ELSE l_extendedprice * (1 - l_discount) END), 2)
         AS rev_lo_disc,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q43_deterministic_sample(sf_dir: str) -> pd.DataFrame:
    """Reproducible hash-based sampling (the scalable alternative to seeded
    random_sample: membership depends only on the row key, so the sample is
    stable across block layouts, reruns and engines).  Keep rows whose
    md5(doc_id) hex prefix < '1a' (~10.2%)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def sample(batch: pa.Table) -> pa.Table:
        # md5 itself has no vectorized kernel (DuckDB-parity requires md5),
        # but everything around it is: arrow cast, bytes-level compare
        # (digest()[0] < 0x1a == hexdigest()[:2] < "1a"), zero-copy filter.
        ids = pc.cast(batch.column("doc_id"), pa.string()).to_pylist()
        keep = np.fromiter(
            (hashlib.md5(s.encode()).digest()[0] < 0x1A for s in ids),
            dtype=bool, count=len(ids),
        )
        return batch.filter(pa.array(keep))

    return ds.map_batches(sample, batch_format="pyarrow").to_pandas()


Q43_SQL = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
"""


def q44_distinct_counts(sf_dir: str) -> pd.DataFrame:
    """Exact distinct counts.  user_id is an UNBOUNDED key space (grows
    with the corpus): per-batch `pc.unique` partials shrink each block to
    its distinct ids, then a Ray hash-shuffle groupby counts the groups —
    distributed memory, never a driver-side set union of O(distinct)
    values.  event_type is a bounded enum, so a driver union of tiny
    per-batch sets is the right (shuffle-free) plan there.  The
    approximate no-shuffle path for unbounded keys is the HLL sketch
    (q45)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def upartial(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(batch.column("user_id"))})

    n_users = (
        ds.map_batches(upartial, batch_format="pyarrow")
        .groupby("user_id")
        .count()
        .count()
    )

    def tpartial(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": pc.unique(batch.column("event_type"))})

    types = set(
        ds.map_batches(tpartial, batch_format="pyarrow")
        .to_pandas()["event_type"]
    )
    return pd.DataFrame({"n_users": [n_users], "n_types": [len(types)]})


Q44_SQL = """
SELECT count(DISTINCT user_id) AS n_users,
       count(DISTINCT event_type) AS n_types
FROM events
"""


def q45_approx_distinct_hll(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog approximate distinct users (mergeable 4 KiB sketches per
    batch, no shuffle — the 100 TB path).  Deterministic (md5 hashing) but
    approximate -> rows-only; accuracy vs exact asserted in pytest."""
    from ..functions.sketches import approx_distinct

    ds = _read(sf_dir, "events", ["user_id"])
    est = approx_distinct(ds, "user_id")
    return pd.DataFrame({"approx_n_users": [round(est)]})


def q46_median_per_type(sf_dir: str) -> pd.DataFrame:
    """EXACT distributed median (discrete quantile) without a global sort:
    per-batch (value -> count) histograms per group (values are 2-decimal
    discrete, so the histogram is bounded), merged, then the value at index
    floor((n-1)/2) of the expanded sorted sequence — quantile_disc
    semantics, matching DuckDB exactly."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return (
            df.groupby(["event_type", "value"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    merged = (
        ds.map_batches(hist, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "value"], sort=False)["n"]
        .sum()
        .reset_index()
    )
    out = []
    for et, g in merged.groupby("event_type"):
        g = g.sort_values("value", kind="stable")
        total = int(g["n"].sum())
        k = (total - 1) // 2
        cum = g["n"].cumsum()
        med = g.loc[cum > k, "value"].iloc[0]
        out.append({"event_type": et, "median_value": med, "n": total})
    return pd.DataFrame(out)


Q46_SQL = """
SELECT event_type, quantile_disc(value, 0.5) AS median_value, count(*) AS n
FROM events GROUP BY event_type
"""


def q47_having_filter(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate + post-aggregation predicate (HAVING analog)."""
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    # l_partkey is unbounded (grows with scale) -> Ray-merged two-phase
    # aggregation; the HAVING filter + rounding run distributed over the
    # aggregated blocks, so only qualifying rows ever leave the cluster.
    agg = _preagg(ds, ["l_partkey"],
                  {"total_qty": ("l_quantity", "sum"),
                   "n": ("l_quantity", "count")},
                  merge="ray")

    def having(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["n"] >= 20].copy()
        df["total_qty"] = df["total_qty"].round(2)
        return df

    return agg.map_batches(having, batch_format="pyarrow")


Q47_SQL = """
SELECT l_partkey, round(sum(l_quantity), 2) AS total_qty, count(*) AS n
FROM lineitem GROUP BY l_partkey HAVING count(*) >= 20
"""


def q48_anti_join(sf_dir: str) -> pd.DataFrame:
    """Broadcast ANTI-join: event users with no customer record (the
    exact-key-set counterpart of the Bloom pre-filter in functions/bloom.py).
    The big side streams; the key set is broadcast once."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    keys = set()
    for b in cust.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.update(b.column("c_custkey").to_pylist())
    keys_ref = ray.put(keys)

    def anti(batch: pa.Table) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        df = batch.to_pandas()
        return df[~df["user_id"].isin(ks)].drop_duplicates()

    ev = _read(sf_dir, "events", ["user_id"])
    out = ev.map_batches(anti, batch_format="pyarrow").to_pandas()
    n = len(out.drop_duplicates()) if len(out) else 0
    # scalar result keeps the schema stable even when every key matches
    # (empty filtered Datasets lose their schema; same pattern as q14)
    return pd.DataFrame({"n_unmatched_users": [n]})


Q48_SQL = """
SELECT count(DISTINCT user_id) AS n_unmatched_users FROM events
WHERE user_id NOT IN (SELECT c_custkey FROM customer)
"""


_BPE_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def q39_bpe_token_count(sf_dir: str) -> pd.DataFrame:
    """BPE-ish regex tokenization (GPT-2-style contraction/word/number/punct
    classes) — per-doc token counts; Python re and DuckDB RE2 agree on this
    pattern (verified), so it carries a full oracle."""
    import re

    pat = re.compile(_BPE_RE)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch.column("text").to_pylist()).fillna("")
        return pd.DataFrame(
            {
                "doc_id": batch.column("doc_id").to_pylist(),
                "n_bpe_tokens": s.map(lambda t: len(pat.findall(t))).astype("int64"),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow").to_pandas()


Q39_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+')) AS n_bpe_tokens
FROM documents
"""


def q37_kmeans_embeddings(sf_dir: str) -> pd.DataFrame:
    """Distributed Lloyd's k-means over the embedding column (iterative:
    broadcast centroids -> per-batch partial sums -> driver update).
    Deterministic seed; returns per-cluster sizes + rounded inertia."""
    from ..stages.similarity import kmeans_dataset

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    assign, stats = kmeans_dataset(emb, k=8, iters=5)
    return stats



# --------------------------------------------------------------------------
# temporal joins / window-scan suite (stages/joins.py, stages/window.py)


def q49_asof_join(sf_dir: str):
    """Point-in-time (as-of) join: each event picks the user's most recent
    order at or before the event time.  Orders are pre-deduped per
    (custkey, orderdate) keeping max orderkey so the as-of match is
    deterministic on both engines."""
    from ..stages.joins import asof_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
    o_uniq = _preagg(orders, ["o_custkey", "o_orderdate"],
                     {"o_orderkey": ("o_orderkey", "max")}, merge="ray")
    joined = asof_join(
        events, o_uniq,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
        right_payload=["o_orderdate", "o_orderkey"], n_buckets=16,
    )

    def fin(batch: pa.Table) -> pd.DataFrame:
        # union-with-None tagging leaves pay columns object-dtyped; pin
        # the oracle dtypes after the (inner) join
        df = batch.to_pandas()
        df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
        df["o_orderkey"] = df["o_orderkey"].astype("int64")
        return df

    return joined.map_batches(fin, batch_format="pyarrow")


Q49_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderdate, o.o_orderkey
FROM events e ASOF JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q50_range_join_count(sf_dir: str):
    """Range join: per order, how many of that customer's events fall in
    [o_orderdate, o_orderdate + 7 days).  Left rows kept at count 0."""
    from ..stages.joins import range_join_count

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    events = _read(sf_dir, "events", ["user_id", "ts"])
    return range_join_count(
        orders, events,
        left_key="o_custkey", right_key="user_id",
        left_time="o_orderdate", right_time="ts",
        window=pd.Timedelta(days=7),
        out_cols=["o_orderkey"], n_buckets=16,
    ).select_columns(["o_orderkey", "n_in_window"])


Q50_SQL = """
SELECT o.o_orderkey, count(e.user_id) AS n_in_window
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate AND e.ts < o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
"""


def q51_running_total(sf_dir: str):
    """Per-user cumulative sum in (ts, event_id) order — the PARTITION BY
    running aggregate (stages/window.py keyed_running_agg).  The order is
    total (event_id tie-break) so float accumulation order — and thus the
    rounded result — is engine-independent."""
    from ..stages.window import keyed_running_agg

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = keyed_running_agg(
        ds, key="user_id", order_by=["ts", "event_id"], value="value",
        out_col="running_total", agg="sum", n_buckets=16,
    )

    def fin(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["running_total"] = df["running_total"].round(2)
        return df[["event_id", "user_id", "running_total"]]

    return out.map_batches(fin, batch_format="pyarrow")


Q51_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM events
"""


def q52_watermark_late_flags(sf_dir: str):
    """Streaming-style lateness audit: treating event_id as the ARRIVAL
    sequence and ts as event time, flag events whose timestamp is more
    than 10 minutes behind the watermark (max event time seen over all
    earlier arrivals).  Distributed two-phase prefix scan
    (stages/window.py global_prefix_scan) — per-block partials + driver
    prefix-combine + per-block finish; only O(blocks) driver state."""
    from ..stages.window import global_prefix_scan

    ds = _read(sf_dir, "events", ["event_id", "ts"])
    scanned = global_prefix_scan(ds, order_by="event_id", value="ts",
                                 out_col="wm", inclusive=False)

    def flag(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        late = df["ts"] < (df["wm"] - pd.Timedelta(minutes=10))
        return pd.DataFrame({
            "event_id": df["event_id"],
            "is_late": late.astype("int64"),
        })

    return scanned.map_batches(flag, batch_format="pyarrow")


Q52_SQL = """
SELECT event_id,
       CAST(CASE WHEN ts < max(ts) OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 - INTERVAL 10 MINUTE
            THEN 1 ELSE 0 END AS BIGINT) AS is_late
FROM events
"""


def q53_grouped_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact p25/p50/p90 per event_type WITHOUT a global sort: per-batch
    value histograms (combiner) -> merged per-type histogram -> discrete
    quantile off the cumulative counts (same exact-histogram method as
    q46, generalized to a quantile vector)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return (
            df.groupby(["event_type", "value"], sort=False)
            .size().rename("n").reset_index()
        )

    merged = (
        ds.map_batches(hist, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "value"], sort=False)["n"].sum().reset_index()
    )
    out = []
    for et, g in merged.groupby("event_type"):
        g = g.sort_values("value", kind="stable")
        total = int(g["n"].sum())
        cum = g["n"].cumsum()
        row = {"event_type": et, "n": total}
        # quantile_disc rank = ceil(q*n), 1-indexed (verified vs DuckDB);
        # integer ceil keeps it exact
        for pct, col in ((25, "p25"), (50, "p50"), (90, "p90")):
            k = -((-pct * total) // 100)
            row[col] = g.loc[cum >= k, "value"].iloc[0]
        out.append(row)
    return pd.DataFrame(out)[["event_type", "p25", "p50", "p90", "n"]]


Q53_SQL = """
SELECT event_type,
       quantile_disc(value, 0.25) AS p25,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.9)  AS p90,
       count(*) AS n
FROM events GROUP BY event_type
"""


def q54_simhash_neardups(sf_dir: str):
    """SimHash hamming-ball near-dup pairs (banded pigeonhole LSH,
    stages/dedup.py simhash_neardup_pairs).  Deterministic (md5 token
    hashes) -> golden-hash pinned; no SQL oracle (64-bit simhash needs
    engine-identical hashing)."""
    from ..stages.dedup import simhash_neardup_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_neardup_pairs(docs, max_hamming=3, bands=4, concurrency=2)


def q55_dedup_pipeline(sf_dir: str):
    """Flagship corpus-dedup COMPOSITION (the standard crawl-cleaning
    chain): verdict-preserving exact dedup -> MinHash-LSH candidates ->
    exact-Jaccard verify (distributed) -> connected components ->
    canonical doc per cluster (min doc_id).  Returns a per-doc verdict
    DATASET — (doc_id, cluster, status in {canonical, near_dup,
    exact_dup}) — streaming end to end: the only driver-side state is the
    candidate-pair component map (bounded by the LSH gate, NOT corpus
    size).  Deterministic -> golden-hash pinned."""
    from ..stages.dedup import (
        connected_components,
        exact_dedup_flags,
        verified_near_dups,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # materialize: flagged rows feed BOTH the near-dup scan (keepers only)
    # and the final verdict pass — one shuffle, two consumers
    flags = exact_dedup_flags(docs).materialize()
    kept = flags.map_batches(
        lambda b: b.filter(b.column("keeper")), batch_format="pyarrow"
    )

    cands = verified_near_dups(kept, jaccard_threshold=0.7, concurrency=2)
    comps = connected_components(cands).to_pandas()  # bounded: LSH-gated
    comp_ref = ray.put(dict(zip(comps["node"], comps["component"])))

    def verdict(batch: pa.Table) -> pd.DataFrame:
        cm = ray.get(comp_ref)
        df = batch.select(["doc_id", "keeper"]).to_pandas()
        cluster = df["doc_id"].map(lambda d: cm.get(d, d)).astype("int64")
        cluster[~df["keeper"]] = -1
        status = np.where(
            ~df["keeper"], "exact_dup",
            np.where(cluster == df["doc_id"], "canonical", "near_dup"),
        )
        return pd.DataFrame({"doc_id": df["doc_id"], "cluster": cluster,
                             "status": status})

    return flags.map_batches(verdict, batch_format="pyarrow")



def q56_rollup(sf_dir: str) -> pd.DataFrame:
    """Multi-level aggregate (ROLLUP): one streamed combiner pass over the
    fact table; the two coarser levels re-aggregate the tiny merged
    partials driver-side — the input is read ONCE for all three levels."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    fine = _preagg(ds, ["l_returnflag", "l_linestatus"],
                   {"sum_qty": ("l_quantity", "sum"), "n": ("l_quantity", "count")})
    mid = (fine.groupby("l_returnflag", as_index=False)
           .agg(sum_qty=("sum_qty", "sum"), n=("n", "sum")))
    mid["l_linestatus"] = None
    total = pd.DataFrame({
        "l_returnflag": [None], "l_linestatus": [None],
        "sum_qty": [fine["sum_qty"].sum()], "n": [fine["n"].sum()],
    })
    out = pd.concat([fine, mid, total], ignore_index=True)
    out["sum_qty"] = out["sum_qty"].round(2)
    return out[["l_returnflag", "l_linestatus", "sum_qty", "n"]]


Q56_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q57_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sampling: 5 rows per event_type chosen by
    md5(event_id) hash order (stable across engines, reruns and block
    layouts — the scalable alternative to seeded per-group sampling).
    Per-batch top-5-per-type combiner -> driver merge of the bounded
    (types x 5 x blocks) partials."""
    import hashlib

    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def topk(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["_h"] = [hashlib.md5(str(e).encode()).hexdigest()
                    for e in df["event_id"]]
        df = df.sort_values(["_h", "event_id"], kind="stable")
        return df.groupby("event_type", sort=False).head(5)

    parts = ds.map_batches(topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["_h", "event_id"], kind="stable")
    out = parts.groupby("event_type", sort=False).head(5)
    return out[["event_id", "event_type"]].reset_index(drop=True)


Q57_SQL = """
SELECT event_id, event_type FROM (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
           AS rn
  FROM events) t WHERE rn <= 5
"""


def q58_connected_components_distributed(sf_dir: str):
    """Dedup-cluster assignment with the DISTRIBUTED fixpoint (Dataset
    joins + grouped Min per round) — the huge-candidate-graph path of
    stages/dedup.py connected_components, registered so the driver
    exercises it; must agree with the driver-side variant (golden)."""
    from ..stages.dedup import connected_components, minhash_candidate_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_candidate_pairs(docs, jaccard_threshold=0.6, concurrency=2)
    return connected_components(pairs, distributed=True)


def q59_semi_join_bloom(sf_dir: str) -> pd.DataFrame:
    """Exact SEMI join via Bloom pre-filter + exact confirm: distinct event
    users that DO have a customer record.  The Bloom pass (no false
    negatives) drops most non-matching rows without a shuffle; the exact
    key-set check runs only on the small survivor set, so the result is
    EXACT despite the probabilistic pre-filter — the scale recipe when
    the key set is too big to broadcast raw (functions/bloom.py)."""
    from ..functions.bloom import bloom_semi_join

    events = _read(sf_dir, "events", ["user_id"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    survivors = bloom_semi_join(events, cust, key_col="user_id",
                                right_key_col="c_custkey", fp_rate=0.01)

    def distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(batch.column("user_id"))})

    cand = survivors.map_batches(distinct, batch_format="pyarrow").to_pandas()
    cand = pd.DataFrame({"user_id": pd.unique(cand["user_id"])})
    exact = set(cust.to_pandas()["c_custkey"])  # small dimension side
    out = cand[cand["user_id"].isin(exact)].sort_values("user_id")
    return out.reset_index(drop=True)


Q59_SQL = """
SELECT DISTINCT user_id FROM events
WHERE user_id IN (SELECT c_custkey FROM customer)
ORDER BY user_id
"""


def q60_approx_quantiles(sf_dir: str) -> pd.DataFrame:
    """Mergeable-sketch approximate quantiles of event value (one streamed
    pass, per-batch QuantileSketch partials, driver fold — bounded memory
    for ANY value cardinality; rank error <= n/k).  The exact counterpart
    is q53 (histogram method, needs bounded distinct values).
    Deterministic -> golden-pinned; accuracy vs exact asserted in
    tests/test_sketches.py."""
    from ..functions.sketches import approx_quantiles

    # sketch contents depend on batch composition -> pin the block layout
    # (fixed block count) so the query is reproducible run to run; the
    # rank-error bound holds under ANY layout (accuracy test), this just
    # pins WHICH epsilon-approximate answer is returned
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"],
                         override_num_blocks=8)
    qs = [0.1, 0.5, 0.9, 0.99]
    vals = approx_quantiles(ds, "value", qs, k=512)
    return pd.DataFrame({"q": qs, "value": [round(v, 6) for v in vals]})

def q61_repetition_filter(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality rules (stages/text_analysis.py
    repetition_stats): duplicate-word and top-word ppm per doc, integer
    arithmetic end to end so the oracle reproduces every value exactly.
    One streamed map_batches pass, no shuffle."""
    from ..stages.text_analysis import repetition_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(repetition_stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q61_SQL = """
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (SELECT doc_id, word, count(*) AS n FROM ex GROUP BY doc_id, word),
m AS (
  SELECT doc_id,
         CAST(sum(n) AS BIGINT) AS total_words,
         CAST(count(*) AS BIGINT) AS distinct_words,
         CAST(max(n) AS BIGINT) AS max_n
  FROM c GROUP BY doc_id
)
SELECT doc_id, total_words, distinct_words,
  CAST((1000000 * (total_words - distinct_words)) // total_words AS BIGINT)
    AS dup_word_ppm,
  CAST((1000000 * max_n) // total_words AS BIGINT) AS top_word_ppm,
  ((1000000 * (total_words - distinct_words)) // total_words < 300000)
    AND ((1000000 * max_n) // total_words < 200000) AS keep
FROM m ORDER BY doc_id
"""


def q62_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (stages/decontaminate.py): docs from
    source 'src0' act as the eval set; every other doc is flagged with
    the count of its distinct 8-grams that appear in the eval set.
    Eval-gram set is broadcast (small side); the corpus is one streamed
    actor-pool pass — no shuffle.  Output: contaminated docs only."""
    from ..stages.decontaminate import decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    bench = docs.filter(expr="source == 'src0'")
    corpus = docs.filter(expr="source != 'src0'")
    out = decontaminate(corpus, bench, n=8).to_pandas()
    out = out[out["contaminated"]][["doc_id", "hit_grams"]]
    return out.sort_values("doc_id").reset_index(drop=True)


Q62_SQL = """
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest([array_to_string(w[i:i+7], ' ')
                 for i in generate_series(1, len(w) - 7)]) AS g
  FROM words
),
bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
corpus AS (SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0')
SELECT corpus.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS hit_grams
FROM corpus JOIN bench ON corpus.g = bench.g
GROUP BY corpus.doc_id
ORDER BY doc_id
"""


def q63_tfidf_topk(sf_dir: str, min_df: int = 1) -> pd.DataFrame:
    """Corpus TF-IDF, top-3 terms per doc.  Two passes: (1) document
    frequency via per-batch distinct-(doc,word) partials -> small
    groupby(word) shuffle (vocab-bounded); (2) broadcast the df map
    (`ray.put` once) and score each doc in one streamed pass — tf and
    top-k are row-local, so no second shuffle.  Ranking uses ROUNDED
    scores with an alphabetical tie-break so the order is float-exact
    across engines.  Partitioning assumption: the BROADCAST vocabulary
    fits the object store — `min_df` is the scale lever (hapax
    legomena are >40% of a web-scale vocab; min_df=2+ prunes them
    before the broadcast, and pruned words are skipped in scoring).
    The default min_df=1 keeps the exact-oracle semantics."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch.column("text").to_pylist(), dtype="object").fillna("")
        s.index = pd.RangeIndex(len(s))
        ex = s.str.split(" ").explode()
        dw = pd.DataFrame({"row": ex.index, "word": ex.to_numpy()}).drop_duplicates()
        c = dw.groupby("word", sort=False).size()
        return pd.DataFrame({"word": c.index, "df": c.to_numpy(np.int64)})

    dfp = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("word").aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    if "word" not in dfp.columns:  # empty input -> no partial blocks
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "word": pd.Series(dtype=object),
                             "tfidf": pd.Series(dtype="float64"),
                             "rank": pd.Series(dtype="int64")})
    if min_df > 1:  # prune the long tail BEFORE the broadcast
        dfp = dfp[dfp["df"] >= min_df]
    n_docs = docs.count()
    df_ref = ray.put(dict(zip(dfp["word"], dfp["df"])))

    def score(batch: pa.Table) -> pd.DataFrame:
        dfm = ray.get(df_ref)
        s = pd.Series(batch.column("text").to_pylist(), dtype="object").fillna("")
        s.index = pd.RangeIndex(len(s))
        ids = np.asarray(batch.column("doc_id").to_pylist())
        ex = s.str.split(" ").explode()
        tf = (
            pd.DataFrame({"i": ex.index.to_numpy(), "word": ex.to_numpy()})
            .groupby(["i", "word"], sort=False).size().reset_index(name="tf")
        )
        dfv = tf["word"].map(dfm).to_numpy(np.float64)
        if min_df > 1:  # words pruned from the broadcast map are skipped
            keep = ~np.isnan(dfv)
            tf, dfv = tf[keep], dfv[keep]
        tf["tfidf"] = np.round(
            tf["tf"].to_numpy(np.float64) * np.log(n_docs / dfv), 6)
        tf["doc_id"] = ids[tf["i"].to_numpy()]
        tf = tf.sort_values(["doc_id", "tfidf", "word"],
                            ascending=[True, False, True], kind="stable")
        top = tf.groupby("doc_id", sort=False).head(3).copy()
        top["rank"] = (top.groupby("doc_id", sort=False).cumcount() + 1).astype("int64")
        return top[["doc_id", "word", "tfidf", "rank"]]

    out = docs.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


Q63_SQL = """
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM ex GROUP BY doc_id, word),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM ex GROUP BY word),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word,
         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (word) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank
  FROM scored
)
SELECT doc_id, word, tfidf, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""


def q64_mixture_resample(sf_dir: str) -> pd.DataFrame:
    """Temperature-based source-mixture resampling (the data-mixing step
    of LLM corpus prep): flatten the language distribution by keeping
    each doc with probability sqrt(min_lang_count / lang_count),
    decided by a DETERMINISTIC per-doc hash draw (md5 lower 64 bits mod
    1e6 — stable across reruns, block layouts and engines; DuckDB's
    md5_number_lower is the same little-endian lower-half read).  Lang
    counts are a bounded enum -> per-batch combiner + driver merge, then
    the keep-ppm map broadcasts into one streamed filter pass."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    counts = _preagg(docs, ["lang"], {"n": ("doc_id", "count")})
    mn = float(counts["n"].min())
    keep_ppm = {
        lang: int(np.floor(1_000_000 * np.sqrt(mn / n)))
        for lang, n in zip(counts["lang"], counts["n"])
    }
    ppm_ref = ray.put(keep_ppm)

    def sample(batch: pa.Table) -> pa.Table:
        ppm = ray.get(ppm_ref)
        ids = pc.cast(batch.column("doc_id"), pa.string()).to_pylist()
        langs = batch.column("lang").to_pylist()
        keep = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
             % 1_000_000 < ppm[lg] for s, lg in zip(ids, langs)),
            dtype=bool, count=len(ids),
        )
        return batch.filter(pa.array(keep))

    out = docs.map_batches(sample, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q64_SQL = """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
mn AS (SELECT min(n) AS mn FROM counts),
th AS (
  SELECT lang,
         CAST(trunc(1000000 * sqrt(CAST(mn.mn AS DOUBLE) / n)) AS BIGINT)
           AS keep_ppm
  FROM counts CROSS JOIN mn
)
SELECT d.doc_id, d.lang
FROM documents d JOIN th USING (lang)
WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 1000000 < th.keep_ppm
ORDER BY doc_id
"""


def q65_pack_sequences(sf_dir: str, cap: int = 256) -> pd.DataFrame:
    """Context-window sequence packing (concat-and-chop, the GPT-style
    pretraining layout): docs in doc_id order are conceptually
    concatenated and chopped into `cap`-token windows; each doc belongs
    to the window where its FIRST token lands.  The global token offset
    comes from `stages/window.py:global_prefix_sum` (two-phase
    distributed scan — driver state is O(blocks)); the per-window
    rollup uses a ray-merged aggregate because window count grows with
    the corpus (unbounded key)."""
    from ..stages.window import global_prefix_sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(batch.column("text"), " "), 1)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pc.cast(n, pa.int64())})

    t = docs.map_batches(toks, batch_format="pyarrow")
    scanned = global_prefix_sum(t, order_by="doc_id", value="n_tokens",
                                out_col="cum_before", inclusive=False)

    def assign(batch: pa.Table) -> pa.Table:
        cum = batch.column("cum_before").to_numpy(zero_copy_only=False)
        return pa.table({
            "seq_id": pa.array(cum // cap, type=pa.int64()),
            "n_tokens": batch.column("n_tokens"),
        })

    out = _preagg(
        scanned.map_batches(assign, batch_format="pyarrow"),
        ["seq_id"],
        {"n_docs": ("n_tokens", "count"),
         "total_tokens": ("n_tokens", "sum")},
        merge="ray",
    ).to_pandas()
    return out.sort_values("seq_id").reset_index(drop=True)


Q65_SQL = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
c AS (
  SELECT doc_id, n,
         CAST(coalesce(sum(n) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM t
)
SELECT CAST(cum_before // 256 AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens
FROM c GROUP BY seq_id ORDER BY seq_id
"""


def q66_bipartite_pagerank(sf_dir: str) -> pd.DataFrame:
    """Iterative PageRank on the user<->event_type bipartite graph
    (stages/graph.py): ranks stay in datasets co-partitioned with the
    edges via native hash joins — no rank vector is ever broadcast or
    collected, so node count is unbounded.  Returns the bounded
    (event_type) side.  Oracle: the same power iteration unrolled into
    DuckDB CTEs."""
    from ..stages.graph import bipartite_pagerank

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    # join partition count sized to the data: every partition spawns
    # aggregator actors, pure overhead at small sf (size up on a cluster).
    # update_left_last=False skips the final left update (one full
    # join+shuffle round) — the returned right ranks never consume it.
    out_r, _ranks_l = bipartite_pagerank(ev, iters=2, num_partitions=2,
                                         update_left_last=False)
    return out_r.rename(columns={"rank": "pr"})


def _pagerank_sql(iters: int = 2, d: float = 0.85) -> str:
    """Unrolled power-iteration CTE chain mirroring bipartite_pagerank."""
    parts = [
        """WITH e AS (SELECT DISTINCT user_id AS l, event_type AS r FROM events),
dl AS (SELECT l, CAST(count(*) AS DOUBLE) AS dg FROM e GROUP BY l),
dr AS (SELECT r, CAST(count(*) AS DOUBLE) AS dg FROM e GROUP BY r),
nl AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dl),
nr AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dr),
l0 AS (SELECT l, 1.0/nl.n AS pr FROM dl CROSS JOIN nl)"""
    ]
    for i in range(iters):
        parts.append(
            f"""r{i} AS (
  SELECT e.r, (1-{d})/nr.n + {d}*sum(l{i}.pr / dl.dg) AS pr
  FROM e JOIN l{i} ON e.l = l{i}.l JOIN dl ON e.l = dl.l CROSS JOIN nr
  GROUP BY e.r, nr.n)"""
        )
        parts.append(
            f"""l{i + 1} AS (
  SELECT e.l, (1-{d})/nl.n + {d}*sum(r{i}.pr / dr.dg) AS pr
  FROM e JOIN r{i} ON e.r = r{i}.r JOIN dr ON e.r = dr.r CROSS JOIN nl
  GROUP BY e.l, nl.n)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT r AS event_type, round(pr, 6) AS pr FROM r{iters - 1}"
        + " ORDER BY event_type"
    )


Q66_SQL = _pagerank_sql(iters=2)


def q67_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding centroids (class centroids for embedding-based
    classification): per-batch (label, vector-sum, n) partials — labels
    are a bounded enum, so each partial is k x dim floats — folded
    driver-side in canonical order, then divided and exploded to
    (label, i, c) rows.  One streamed pass, no shuffle; the same partial
    shape as the kmeans Lloyd step (stages/similarity.py)."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        m = np.array(df["embedding"].to_list(), dtype=np.float64)
        rows = []
        for lb, idx in df.groupby("label").indices.items():
            rows.append({"label": lb, "vsum": m[idx].sum(0), "n": len(idx)})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "vsum" not in parts.columns:  # empty input -> no partial blocks
        return pd.DataFrame({"label": pd.Series(dtype="int64"),
                             "i": pd.Series(dtype="int64"),
                             "c": pd.Series(dtype="float64")})
    # canonical fold order (completion order varies run to run)
    parts["_k"] = parts["vsum"].map(lambda v: np.asarray(v).tobytes())
    parts = parts.sort_values(["label", "n", "_k"], kind="stable")
    out = []
    for lb, grp in parts.groupby("label", sort=True):
        s = np.sum(np.stack(grp["vsum"].to_list()), axis=0)
        c = np.round(s / grp["n"].sum(), 6)
        out.append(pd.DataFrame({
            "label": np.repeat(lb, len(c)),
            "i": np.arange(1, len(c) + 1, dtype=np.int64),
            "c": c,
        }))
    return pd.concat(out, ignore_index=True)


Q67_SQL = """
WITH ex AS (
  SELECT label, unnest(generate_series(1, len(embedding))) AS i,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
       round(avg(v), 6) AS c
FROM ex GROUP BY label, i ORDER BY label, i
"""


def btb_raw_media(sf_dir: str) -> pd.DataFrame:
    """REAL multimodal kernel path (no stub): a deterministic raw-RGB888
    payload table (media-store analog — raw tensors stored next to
    compressed originals) runs decode -> channel-stat features -> exact
    block-mean resize through the actor-pool stage
    (stages/multimodal.py:RawImageStage).  One malformed payload is
    planted to pin the keep-row-with-status error path.  Deterministic
    -> golden-pinned (rows-only; media bytes aren't SQL-expressible)."""
    import hashlib as _hashlib

    from ..stages.multimodal import raw_media_features

    rng = np.random.RandomState(1234)
    refs, payloads = [], []
    for i in range(64):
        img = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
        refs.append(f"raw://{i:03d}")
        payloads.append(img.tobytes())
    refs.append("raw://bad")
    payloads.append(b"truncated")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([8] * len(refs), type=pa.int32()),
        "height": pa.array([8] * len(refs), type=pa.int32()),
    }))
    ds = raw_media_features(media, out_w=4, out_h=4, concurrency=2)
    tbl = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow")))
    df = tbl.to_pandas()
    # bytes column -> stable hex digest so the result frame is text-only
    df["resized_md5"] = df["resized_payload"].map(
        lambda b: None if b is None else _hashlib.md5(b).hexdigest())
    df = df.drop(columns=["resized_payload"])
    return df.sort_values("media_ref").reset_index(drop=True)


def btb_png_media(sf_dir: str) -> pd.DataFrame:
    """REAL compressed-image decode path (no codec libs): deterministic
    PNG payloads (stdlib-zlib deflate on the write side) run decode ->
    channel-stat features -> exact block-mean resize through the SAME
    actor-pool stage as raw RGB (stages/multimodal.py:RawImageStage
    routing on the PNG signature; decode_png = inflate + per-scanline
    unfilter).  A checkerboard with analytically-known channel means
    anchors pixel-exactness; one truncated PNG pins the
    keep-row-with-status error path.  Deterministic -> golden-pinned
    (rows-only; media bytes aren't SQL-expressible)."""
    import hashlib as _hashlib

    from ..stages.multimodal import encode_png, raw_media_features

    rng = np.random.RandomState(4321)
    refs, payloads = [], []
    # analytic anchor: checkerboard -> channel means are half the color
    board = np.zeros((8, 8, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    board[(yy + xx) % 2 == 1] = (200, 100, 50)
    refs.append("png://board")
    payloads.append(encode_png(board))
    for i in range(32):
        img = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
        refs.append(f"png://{i:03d}")
        payloads.append(encode_png(img))
    refs.append("png://bad")
    payloads.append(payloads[1][:20])
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([0] * len(refs), type=pa.int32()),
        "height": pa.array([0] * len(refs), type=pa.int32()),
    }))
    ds = raw_media_features(media, out_w=4, out_h=4, concurrency=2)
    tbl = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow")))
    df = tbl.to_pandas()
    df["resized_md5"] = df["resized_payload"].map(
        lambda b: None if b is None else _hashlib.md5(b).hexdigest())
    df = df.drop(columns=["resized_payload"])
    df = df.sort_values("media_ref").reset_index(drop=True)
    # pixel-exactness gate: the checkerboard's means are analytic
    feat = np.asarray(df.loc[df["media_ref"] == "png://board",
                             "feature"].iloc[0])
    assert np.allclose(feat[:3], [100.0, 50.0, 25.0])
    assert df.loc[df["media_ref"] == "png://bad",
                  "decode_status"].iloc[0].startswith("decode_error")
    return df


def btb_jpeg_media(sf_dir: str) -> pd.DataFrame:
    """REAL baseline-JPEG decode path (pure NumPy Huffman + IDCT, no
    codec libs): deterministic JPEG payloads (encode_jpeg fixture
    builder, flat quant) run decode -> channel-stat features -> exact
    block-mean resize through the SAME actor-pool stage as raw/PNG/PNM
    (stages/multimodal.py:RawImageStage routing on the SOI marker).  A
    solid-color anchor is exact under flat quantization; one 4:2:0
    subsampled payload exercises the chroma-upsample path and one
    truncated payload pins the keep-row-with-status error path.
    Deterministic -> golden-pinned (rows-only; media bytes aren't
    SQL-expressible)."""
    import hashlib as _hashlib

    from ..stages.multimodal import encode_jpeg, raw_media_features

    rng = np.random.RandomState(977)
    refs, payloads = [], []
    solid = np.full((16, 16, 3), (120, 60, 30), dtype=np.uint8)
    refs.append("jpg://solid")
    payloads.append(encode_jpeg(solid))
    yy, xx = np.mgrid[0:24, 0:16]
    grad = np.stack([yy * 9, xx * 13, yy * 4 + xx * 4],
                    axis=2).astype(np.uint8)
    refs.append("jpg://grad420")
    payloads.append(encode_jpeg(grad, subsampling="4:2:0",
                                restart_interval=2))
    for i in range(24):
        img = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
        refs.append(f"jpg://{i:03d}")
        payloads.append(encode_jpeg(img))
    refs.append("jpg://bad")
    payloads.append(payloads[2][:40])
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([0] * len(refs), type=pa.int32()),
        "height": pa.array([0] * len(refs), type=pa.int32()),
    }))
    ds = raw_media_features(media, out_w=4, out_h=4, concurrency=2)
    tbl = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow")))
    df = tbl.to_pandas()
    df["resized_md5"] = df["resized_payload"].map(
        lambda b: None if b is None else _hashlib.md5(b).hexdigest())
    df = df.drop(columns=["resized_payload"])
    df = df.sort_values("media_ref").reset_index(drop=True)
    feat = np.asarray(df.loc[df["media_ref"] == "jpg://solid",
                             "feature"].iloc[0])
    # flat quant: exact up to YCbCr DC rounding (+-1 per channel)
    assert np.allclose(feat[:3], [120.0, 60.0, 30.0], atol=1.5)
    assert df.loc[df["media_ref"] == "jpg://bad",
                  "decode_status"].iloc[0].startswith("decode_error")
    return df


def btb_gif_bmp_media(sf_dir: str) -> pd.DataFrame:
    """REAL GIF + BMP decode path (pure Python/NumPy, no codec libs):
    deterministic GIF payloads (real LZW compressor on the write side,
    plain + interlaced) and BMP payloads (24-bit BI_RGB + palette
    BI_RLE8, bottom-up + top-down) run decode -> channel-stat features
    -> exact block-mean resize through the SAME actor-pool stage as
    raw/PNG/PNM/JPEG (stages/multimodal.py:RawImageStage routing on the
    GIF87a/89a and "BM" signatures).  A checkerboard with analytically
    known channel means anchors pixel-exactness per format; truncated
    payloads pin the keep-row-with-status error path.  Deterministic ->
    golden-pinned (rows-only; media bytes aren't SQL-expressible)."""
    import hashlib as _hashlib

    from ..stages.multimodal import (encode_bmp, encode_gif,
                                     raw_media_features)

    rng = np.random.RandomState(8712)
    board = np.zeros((8, 8, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    board[(yy + xx) % 2 == 1] = (200, 100, 50)
    refs, payloads = [], []
    refs.append("gif://board")
    payloads.append(encode_gif(board))
    refs.append("gif://board_interlaced")
    payloads.append(encode_gif(board, interlace=True))
    refs.append("bmp://board")
    payloads.append(encode_bmp(board))
    refs.append("bmp://board_rle8")
    payloads.append(encode_bmp(board, rle8=True))
    refs.append("bmp://board_topdown")
    payloads.append(encode_bmp(board, top_down=True))
    for i in range(12):
        # bounded palette (GIF is a palette format)
        img = (rng.randint(0, 6, size=(9, 7, 3)) * 43).astype(np.uint8)
        refs.append(f"gif://{i:03d}")
        payloads.append(encode_gif(img, interlace=bool(i % 2)))
        refs.append(f"bmp://{i:03d}")
        payloads.append(encode_bmp(img, rle8=bool(i % 2),
                                   top_down=bool(i % 3 == 0)))
    refs.append("gif://bad")
    payloads.append(payloads[0][:16])
    refs.append("bmp://bad")
    payloads.append(payloads[2][:30])
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([0] * len(refs), type=pa.int32()),
        "height": pa.array([0] * len(refs), type=pa.int32()),
    }))
    ds = raw_media_features(media, out_w=4, out_h=4, concurrency=2)
    tbl = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow")))
    df = tbl.to_pandas()
    df["resized_md5"] = df["resized_payload"].map(
        lambda b: None if b is None else _hashlib.md5(b).hexdigest())
    df = df.drop(columns=["resized_payload"])
    df = df.sort_values("media_ref").reset_index(drop=True)
    # pixel-exactness gates: palette formats decode exactly, so the
    # checkerboard means are analytic and IDENTICAL across all five
    # container variants
    anchors = ["gif://board", "gif://board_interlaced", "bmp://board",
               "bmp://board_rle8", "bmp://board_topdown"]
    for ref in anchors:
        feat = np.asarray(df.loc[df["media_ref"] == ref,
                                 "feature"].iloc[0])
        assert np.allclose(feat[:3], [100.0, 50.0, 25.0]), ref
    md5s = {ref: df.loc[df["media_ref"] == ref, "resized_md5"].iloc[0]
            for ref in anchors}
    assert len(set(md5s.values())) == 1, md5s  # identical pixels out
    for ref in ("gif://bad", "bmp://bad"):
        assert df.loc[df["media_ref"] == ref,
                      "decode_status"].iloc[0].startswith("decode_error")
    return df


def btb_tiff_media(sf_dir: str) -> pd.DataFrame:
    """REAL TIFF decode path (pure Python/NumPy, no codec libs):
    deterministic TIFF payloads — both byte orders, compressions
    none/PackBits/TIFF-LZW (MSB-first, early code-width change),
    horizontal predictor, grayscale photometric, multi-strip — run
    decode -> channel-stat features -> exact block-mean resize through
    the SAME actor-pool stage as the other containers
    (stages/multimodal.py:RawImageStage routing on the II*/MM* magic).
    The checkerboard anchor decodes pixel-identically across all
    variants; a truncated payload pins the error path.  Deterministic
    -> golden-pinned (rows-only)."""
    import hashlib as _hashlib

    from ..stages.multimodal import encode_tiff, raw_media_features

    rng = np.random.RandomState(1771)
    board = np.zeros((8, 8, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    board[(yy + xx) % 2 == 1] = (200, 100, 50)
    refs, payloads = [], []
    variants = [
        ("none_le", dict(compression="none")),
        ("none_be", dict(compression="none", big_endian=True)),
        ("packbits", dict(compression="packbits")),
        ("lzw", dict(compression="lzw")),
        ("lzw_pred", dict(compression="lzw", predictor=True)),
        ("strips", dict(compression="packbits", rows_per_strip=3)),
    ]
    for tag, kw in variants:
        refs.append(f"tiff://board_{tag}")
        payloads.append(encode_tiff(board, **kw))
    for i in range(10):
        img = rng.randint(0, 256, size=(9, 7, 3)).astype(np.uint8)
        _, kw = variants[i % len(variants)]
        refs.append(f"tiff://{i:03d}")
        payloads.append(encode_tiff(img, **kw))
    g = rng.randint(0, 256, size=(6, 6, 1)).astype(np.uint8)
    gray = np.repeat(g, 3, axis=2)
    refs.append("tiff://gray")
    payloads.append(encode_tiff(gray, gray=True, compression="lzw"))
    refs.append("tiff://bad")
    payloads.append(payloads[0][:30])
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([0] * len(refs), type=pa.int32()),
        "height": pa.array([0] * len(refs), type=pa.int32()),
    }))
    ds = raw_media_features(media, out_w=4, out_h=4, concurrency=2)
    tbl = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow")))
    df = tbl.to_pandas()
    df["resized_md5"] = df["resized_payload"].map(
        lambda b: None if b is None else _hashlib.md5(b).hexdigest())
    df = df.drop(columns=["resized_payload"])
    df = df.sort_values("media_ref").reset_index(drop=True)
    anchors = [f"tiff://board_{t}" for t, _ in variants]
    md5s = set()
    for ref in anchors:
        feat = np.asarray(df.loc[df["media_ref"] == ref,
                                 "feature"].iloc[0])
        assert np.allclose(feat[:3], [100.0, 50.0, 25.0]), ref
        md5s.add(df.loc[df["media_ref"] == ref, "resized_md5"].iloc[0])
    assert len(md5s) == 1, md5s  # identical pixels across all variants
    assert df.loc[df["media_ref"] == "tiff://bad",
                  "decode_status"].iloc[0].startswith("decode_error")
    return df


def btb_video_frames(sf_dir: str) -> pd.DataFrame:
    """REAL video frame-sampling path: deterministic RAWV clips (a
    seekable raw-RGB container, stages/multimodal.py) run through the
    actor-pool sampler which reads the header, decodes ONLY the sampled
    frames by byte offset, and emits per-frame channel features plus a
    motion score.  A moving-gradient pattern makes motion nontrivial;
    one truncated payload pins the keep-row-with-status error path.
    Deterministic -> golden-pinned (rows-only)."""
    from ..stages.multimodal import encode_raw_video, raw_video_frames

    rng = np.random.RandomState(4321)
    refs, payloads = [], []
    for i in range(16):
        n, h, w = 12, 8, 8
        base = rng.randint(0, 200, size=(h, w, 3)).astype(np.uint8)
        frames = np.stack([np.roll(base, shift=t, axis=1) + (t * 3)
                           for t in range(n)]).astype(np.uint8)
        refs.append(f"rawv://{i:03d}")
        payloads.append(encode_raw_video(frames, fps=25))
    refs.append("rawv://bad")
    payloads.append(payloads[0][:40])  # truncated mid-header/body
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
    }))
    ds = raw_video_frames(media, n_frames=4, concurrency=2)
    tbl = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow")))
    df = tbl.to_pandas()
    return (df.sort_values(["media_ref", "frame_index"])
            .reset_index(drop=True))


def btb_raw_audio(sf_dir: str) -> pd.DataFrame:
    """REAL audio kernel path (no stub, no audio libs): deterministic
    RIFF/WAVE PCM payloads (stdlib `wave` writer) run through the
    actor-pool WAV decode stage (stages/multimodal.py:RawAudioStage) ->
    scalar features + windowed RMS envelope.  Covers 16-bit mono, 8-bit
    mono, 16-bit stereo, and a malformed payload pinning the
    keep-row-with-status error path.  Deterministic -> golden-pinned
    (rows-only; audio bytes aren't SQL-expressible)."""
    import io
    import wave as _wave

    from ..stages.multimodal import wav_audio_features

    def make_wav(freq: float, rate: int, secs: float, width: int,
                 nch: int, amp: float) -> bytes:
        t = np.arange(int(rate * secs)) / rate
        x = amp * np.sin(2 * np.pi * freq * t)
        if nch == 2:  # right channel at half amplitude
            x = np.stack([x, 0.5 * x], axis=1)
        else:
            x = x[:, None]
        if width == 1:
            data = (x * 127 + 128).astype(np.uint8).tobytes()
        else:
            data = (x * 32767).astype("<i2").tobytes()
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(data)
        return buf.getvalue()

    refs, payloads = [], []
    for i, (freq, width, nch, amp) in enumerate(
            [(440.0, 2, 1, 0.8), (220.0, 2, 1, 0.3), (880.0, 1, 1, 0.5),
             (440.0, 2, 2, 0.6), (55.0, 2, 1, 1.0)] * 8):
        refs.append(f"wav://{i:03d}")
        payloads.append(make_wav(freq, 8000, 0.25 + 0.01 * (i % 5),
                                 width, nch, amp))
    refs.append("wav://bad")
    payloads.append(b"RIFFgarbage-not-a-wave")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
    }))
    ds = wav_audio_features(media, n_windows=4, concurrency=2)
    tbl = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow")))
    df = tbl.to_pandas()
    for col in ("feature", "rms_envelope"):
        df[col] = df[col].map(
            lambda v: None if v is None
            else str([round(float(f), 5) for f in v]))
    return df.sort_values("media_ref").reset_index(drop=True)


def btb_compressed_audio(sf_dir: str) -> pd.DataFrame:
    """COMPRESSED audio decode path (real codecs, no audio libs):
    deterministic G.711 u-law/A-law and IMA ADPCM payloads built by the
    engine's own encoder (stages/multimodal.py:encode_wav) run through
    the same actor-pool WAV stage as PCM — one parser, four codings.
    Covers u-law mono, A-law mono, ADPCM mono, ADPCM stereo and a
    truncated-fmt error payload (row kept, status set).  Deterministic
    -> golden-pinned (rows-only; codec bytes aren't SQL-expressible)."""
    from ..stages.multimodal import encode_wav, wav_audio_features

    rate = 8000

    def sine(freq: float, secs: float, amp: float, phase: float = 0.0):
        t = np.arange(int(rate * secs)) / rate
        return (amp * np.sin(2 * np.pi * freq * t + phase)
                * 32767).astype(np.int16)

    refs, payloads = [], []
    for i in range(24):
        freq = 110.0 * (1 + i % 6)
        amp = 0.3 + 0.1 * (i % 5)
        secs = 0.2 + 0.01 * (i % 4)
        mono = sine(freq, secs, amp)
        kind = ("ulaw", "alaw", "ima_adpcm", "ima_stereo")[i % 4]
        if kind == "ima_stereo":
            st = np.stack([mono, sine(freq * 2, secs, amp / 2)], axis=1)
            payloads.append(encode_wav(st, rate, fmt="ima_adpcm",
                                       block_align=256))
        else:
            payloads.append(encode_wav(
                mono, rate,
                fmt="ima_adpcm" if kind == "ima_adpcm" else kind))
        refs.append(f"wav://{kind}/{i:03d}")
    refs.append("wav://bad-fmt")
    import struct as _s
    bad = (b"RIFF" + _s.pack("<I", 20) + b"WAVE"
           + b"fmt " + _s.pack("<I", 4) + b"\x01\x00\x01\x00")
    payloads.append(bad)
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
    }))
    ds = wav_audio_features(media, n_windows=4, concurrency=2)
    tbl = pa.concat_tables(
        list(ds.iter_batches(batch_size=256, batch_format="pyarrow")))
    df = tbl.to_pandas()
    for col in ("feature", "rms_envelope"):
        df[col] = df[col].map(
            lambda v: None if v is None
            else str([round(float(f), 5) for f in v]))
    return df.sort_values("media_ref").reset_index(drop=True)


def btb_mp4_demux(sf_dir: str) -> pd.DataFrame:
    """REAL MP4/ISO-BMFF demux path (stages/multimodal.py:probe_mp4 +
    mp4_sample_table + Mp4SampleExtractor): deterministic box-built
    payloads -> evenly-spaced coded-sample extraction by byte range
    (O(sampled) bytes touched — the scale property), crc32 over the
    located bytes pinning exactness.  Codec payload decode is the
    documented stub; the container machinery is real.  Golden-pinned
    (rows-only)."""
    import struct

    from ..stages.multimodal import mp4_sample_features

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    def make_mp4(seed: int) -> bytes:
        n = 4 + (seed % 5)
        samples = [bytes([(seed + i) % 256]) * (2 + (seed + i) % 7)
                   for i in range(n)]
        ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomavc1")
        mdat = box(b"mdat", b"".join(samples))
        base = len(ftyp) + 8
        split = 1 + seed % (n - 1)  # chunk 1 gets `split` samples
        chunk_offs = [base,
                      base + sum(len(s) for s in samples[:split])]
        entry = (struct.pack(">I", 86) + b"avc1" + bytes(6)
                 + struct.pack(">H", 1) + bytes(16)
                 + struct.pack(">HH", 16 * (1 + seed % 4), 16)
                 + bytes(50))
        stsd = box(b"stsd", struct.pack(">II", 0, 1) + entry)
        stsz = box(b"stsz", struct.pack(">III", 0, 0, n)
                   + b"".join(struct.pack(">I", len(s))
                              for s in samples))
        stsc = box(b"stsc", struct.pack(">II", 0, 2)
                   + struct.pack(">III", 1, split, 1)
                   + struct.pack(">III", 2, n - split, 1))
        stco = box(b"stco", struct.pack(">II", 0, 2)
                   + b"".join(struct.pack(">I", o)
                              for o in chunk_offs))
        stbl = box(b"stbl", stsd + stsz + stsc + stco)
        hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                   + bytes(13))
        mdhd = box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, 1000,
                                        100 * n))
        mdia = box(b"mdia", mdhd + box(b"minf", stbl))
        mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, 600,
                                        60 * n) + bytes(80))
        moov = box(b"moov", mvhd + box(b"trak", mdia))
        return ftyp + mdat + moov

    refs = [f"mp4://{i:03d}" for i in range(16)]
    payloads = [make_mp4(i) for i in range(16)]
    refs.append("mp4://bad")
    payloads.append(b"mdatgarbage-without-ftyp")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
    }))
    out = (mp4_sample_features(media, n_samples=3, concurrency=2)
           .to_pandas())
    return (out.sort_values(["media_ref", "sample_idx"])
            .reset_index(drop=True))


def btb_mp3_demux(sf_dir: str) -> pd.DataFrame:
    """REAL MPEG-audio demux path (stages/multimodal.py:probe_mp3 +
    mp3_frame_table + Mp3FrameExtractor): deterministic header-built
    VBR streams across MPEG versions/layers, ID3v2/ID3v1 tags and a
    Xing-tagged mono stream -> evenly-spaced coded-frame extraction by
    byte range (O(sampled) bytes touched), crc32 over the located
    bytes pinning exactness.  Frame payload decode is the documented
    codec stub; the container machinery is real.  Golden-pinned
    (rows-only)."""
    from ..stages.multimodal import (_mp3_parse_header,
                                     mp3_frame_features)

    def hdr(version, layer, br_idx, sr_idx, pad, mode):
        ver_bits = {"1": 3, "2": 2, "2.5": 0}[version]
        h = ((0x7FF << 21) | (ver_bits << 19)
             | ({1: 3, 2: 2, 3: 1}[layer] << 17) | (1 << 16)
             | (br_idx << 12) | (sr_idx << 10) | (pad << 9)
             | (mode << 6))
        return h.to_bytes(4, "big")

    def make_mp3(seed: int) -> bytes:
        version = ("1", "2", "2.5")[seed % 3]
        layer = 1 + (seed % 3) if version == "1" else 3
        sr_idx = seed % 3
        mode = (0, 3, 1, 2)[seed % 4]
        out = bytearray()
        if seed % 4 == 1:  # leading ID3v2 tag (syncsafe size)
            pad_len = 20 + seed
            out += (b"ID3\x03\x00\x00"
                    + bytes([0, 0, pad_len >> 7, pad_len & 0x7F])
                    + b"t" * pad_len)
        n = 3 + seed % 4
        for i in range(n):
            br_idx = 1 + (seed * 5 + i * 3) % 14  # VBR
            h4 = hdr(version, layer, br_idx, sr_idx, (seed + i) % 2,
                     mode)
            size = _mp3_parse_header(h4 + bytes(4), 0)["frame_size"]
            body = bytearray(bytes([(seed * 11 + i) % 256])
                             * (size - 4))
            if i == 0 and layer == 3 and seed % 2 == 0:
                side = (17 if mode == 3 else 32) if version == "1" \
                    else (9 if mode == 3 else 17)
                p = side  # relative to body (header already split off)
                if len(body) >= p + 12:
                    body[p:p + 4] = b"Xing"
                    body[p + 4:p + 8] = (0x1).to_bytes(4, "big")
                    body[p + 8:p + 12] = n.to_bytes(4, "big")
            out += h4 + body
        if seed % 5 == 2:  # trailing ID3v1 tag
            out += b"TAG" + bytes([seed % 256]) * 125
        return bytes(out)

    refs = [f"mp3://{i:03d}" for i in range(14)]
    payloads = [make_mp3(i) for i in range(14)]
    refs.append("mp3://bad")
    payloads.append(b"\x00garbage-not-mpeg-audio")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
    }))
    out = (mp3_frame_features(media, n_frames=3, concurrency=2)
           .to_pandas())
    return (out.sort_values(["media_ref", "frame_idx"])
            .reset_index(drop=True))


def q68_heavy_hitters_cms(sf_dir: str) -> pd.DataFrame:
    """Approximate top-10 event users via Count-Min sketch + candidate
    union (functions/sketches.py) — the no-shuffle scale path for heavy
    hitters over unbounded key spaces (exact counterpart: q09).  CMS
    folds are elementwise adds (order-invariant); the candidate set
    depends on batch composition, so the block layout is pinned like
    q60's for reproducibility."""
    from ..functions.sketches import approx_heavy_hitters

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"],
                         override_num_blocks=8)
    return approx_heavy_hitters(ds, "user_id", k=10)


def q69_grouped_moments(sf_dir: str) -> pd.DataFrame:
    """Statistical aggregates (stddev_samp / covar_samp / corr) per
    return flag via mergeable second-moment partials
    (functions/moments.py, Chan-Golub-LeVeque parallel merge — the
    numerically stable form, matching streaming engines to float
    precision).  Rounding: corr is dimensionless -> 6 dp; the
    scale-carrying stats round to 2 dp so last-ulp algorithm differences
    can't flip a rounding boundary."""
    from ..functions.moments import grouped_moments

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    out = grouped_moments(ds, ["l_returnflag"], "l_quantity",
                          "l_extendedprice")
    out["std_x"] = out["std_x"].round(2)
    out["std_y"] = out["std_y"].round(2)
    out["covar"] = out["covar"].round(2)
    out["corr"] = out["corr"].round(6)
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q69_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(stddev_samp(l_quantity), 2) AS std_x,
       round(stddev_samp(l_extendedprice), 2) AS std_y,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar,
       round(corr(l_quantity, l_extendedprice), 6) AS corr
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q70_verified_neardups_shuffle(sf_dir: str) -> pd.DataFrame:
    """q33's verification through the SHUFFLE strategy (two native hash
    joins ship each pair its own texts; no broadcast state — the path
    for candidate sets that outgrow the object store).  Must produce
    byte-identical pairs to q33; registered so the driver exercises the
    join-based verifier, and the equality is pinned by golden hash +
    tests/test_ivf_neardups.py."""
    from ..stages.dedup import verified_near_dups

    out = verified_near_dups(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        jaccard_threshold=0.5, concurrency=2,
        strategy="shuffle", join_partitions=4,
    ).to_pandas()
    return out.sort_values(["left_id", "right_id"]).reset_index(drop=True)


def q71_chunk_documents(sf_dir: str) -> pd.DataFrame:
    """Overlapping character chunking for RAG/pretraining
    (text_analysis.chunk_documents): 200-char windows every 150 chars,
    one streamed flat-map pass.  Chunk content is pinned by md5 so the
    oracle (substr + generate_series) verifies the exact text of every
    window, not just counts."""
    from ..stages.text_analysis import chunk_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(chunk_documents, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


Q71_SQL = """
WITH starts AS (
  SELECT doc_id, text,
         unnest([i for i in generate_series(0, greatest(len(text) - 1, 0), 150)])
           AS start
  FROM documents
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1
            AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start,
       CAST(len(substr(text, start + 1, 200)) AS BIGINT) AS chunk_chars,
       md5(substr(text, start + 1, 200)) AS chunk_md5
FROM starts
ORDER BY doc_id, chunk_idx
"""


def q72_grouped_approx_distinct(sf_dir: str) -> pd.DataFrame:
    """Per-event-type approximate distinct users via per-group HLL
    sketches (functions/sketches.py:grouped_approx_distinct) — the
    grouped, no-shuffle companion to q45's global HLL; exact grouped
    counterpart would be a count(DISTINCT) GROUP BY.  Deterministic
    (register maxes are order-invariant) -> golden-pinned; accuracy-vs-
    exact asserted in tests/test_sketches.py."""
    from ..functions.sketches import grouped_approx_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    out = grouped_approx_distinct(ds, "event_type", "user_id")
    out["approx_distinct"] = out["approx_distinct"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


def q73_unpivot(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT / melt: wide lineitem measure columns to long
    (orderkey, linenumber, measure, value) rows — a pure row-local
    reshape (one streamed pass, rows explode x3, no shuffle), then a
    small grouped rollup per measure so the result is compact.  Values
    are integer-scaled (cents / hundredths) to keep the fold exact."""
    ds = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount"])
    measures = ["l_quantity", "l_extendedprice", "l_discount"]

    def melt(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        rows = []
        for m in measures:
            # integer-scale: quantities are whole, price/discount 2dp
            v = np.round(df[m].to_numpy(np.float64) * 100).astype(np.int64)
            rows.append(pd.DataFrame({"measure": m, "value_c": v}))
        long = pd.concat(rows, ignore_index=True)
        return (long.groupby("measure", sort=False)
                .agg(n=("value_c", "size"), total_c=("value_c", "sum"))
                .reset_index())

    parts = ds.map_batches(melt, batch_format="pyarrow").to_pandas()
    if "measure" not in parts.columns:  # empty input -> no partial blocks
        return pd.DataFrame({"measure": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64"),
                             "total_c": pd.Series(dtype="int64")})
    # no canonical pre-sort needed: integer sums are order-invariant
    out = (parts.groupby("measure", as_index=False)
           .agg(n=("n", "sum"), total_c=("total_c", "sum")))
    return out.sort_values("measure").reset_index(drop=True)


Q73_SQL = """
WITH long AS (
  SELECT measure, CAST(round(value * 100) AS BIGINT) AS value_c
  FROM (
    UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount FROM lineitem)
    ON l_quantity, l_extendedprice, l_discount
    INTO NAME measure VALUE value
  )
)
SELECT measure, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(value_c) AS BIGINT) AS total_c
FROM long GROUP BY measure ORDER BY measure
"""


def q74_lag_delta(sf_dir: str) -> pd.DataFrame:
    """Per-user LAG: each event's value delta to the user's previous
    event in (ts, event_id) order — the keyed-shift window op on the
    shared hash-bucket scaffold (stages/window.py:
    hash_bucketed_map_groups): one all-to-all on the key, sort within
    the bucket, vectorized groupby shift; per-key history never crosses
    buckets.  Deltas are integer-scaled to keep the compare exact."""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def shift_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        # stay in float64 so a NULL value propagates as NaN (an int64
        # cast of NaN is INT64_MIN garbage); the values are integral
        # after the round, so float arithmetic below is exact
        g["value_c"] = np.round(g["value"].to_numpy(np.float64) * 1_000_000)
        prev = g.groupby("user_id", sort=False)["value_c"].shift(1)
        # float64 with NaN for each user's first event — matching how a
        # nullable BIGINT lag column materializes in pandas
        g["delta_c"] = g["value_c"] - prev
        return g[["user_id", "event_id", "delta_c"]]

    out = hash_bucketed_map_groups(
        ds, "user_id", shift_bucket, n_buckets=16).to_pandas()
    if "user_id" not in out.columns:  # empty input -> no partial blocks
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "event_id": pd.Series(dtype="int64"),
                             "delta_c": pd.Series(dtype="float64")})
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


Q74_SQL = """
WITH c AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 1000000) AS BIGINT) AS value_c
  FROM events
)
SELECT user_id, event_id,
       value_c - lag(value_c) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS delta_c
FROM c ORDER BY user_id, event_id
"""


def _levenshtein(a: str, b: str) -> int:
    """Standard Wagner-Fischer edit distance (unit costs, no
    transposition) — matches DuckDB's levenshtein()."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def q75_fuzzy_name_pairs(sf_dir: str, max_dist: int = 3) -> pd.DataFrame:
    """Fuzzy string join (alias detection): edit-distance pairs among the
    DISTINCT part names, blocked by first token so the pairwise DP runs
    only within blocks — the standard blocking-key fuzzy-join shape
    (never all-pairs on the corpus; distinct-name vocabulary is the
    bounded side).  Distinct names: per-batch unique partials -> one
    grouped pass; pairing: groupby(block).map_groups with the
    Wagner-Fischer kernel.  The registered oracle hardcodes the default
    max_dist=3 — non-default values diverge from Q75_SQL."""
    ds = _read(sf_dir, "part", ["p_name"])

    def uniq(batch: pa.Table) -> pa.Table:
        return pa.table({"p_name": pc.unique(batch.column("p_name"))})

    names = (
        ds.map_batches(uniq, batch_format="pyarrow")
        .groupby("p_name").count().drop_columns(["count()"])
    )

    def add_block(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["blk"] = df["p_name"].str.split(" ").str[0]
        return df

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(g["p_name"].unique())
        out = []
        for i, a in enumerate(vals):
            for b in vals[i + 1:]:
                if abs(len(a) - len(b)) > max_dist:
                    continue  # length gap alone already exceeds the bound
                d = _levenshtein(a, b)
                if d <= max_dist:
                    out.append((a, b, d))
        return pd.DataFrame(out, columns=["left_name", "right_name", "dist"]
                            ).astype({"dist": "int64"} if out else {})

    out = (
        names.map_batches(add_block, batch_format="pyarrow")
        .groupby("blk").map_groups(block_pairs, batch_format="pandas")
        .to_pandas()
    )
    if "left_name" not in out.columns:  # no block produced any pair
        return pd.DataFrame({"left_name": pd.Series(dtype=object),
                             "right_name": pd.Series(dtype=object),
                             "dist": pd.Series(dtype="int64")})
    return out.sort_values(["left_name", "right_name"]).reset_index(drop=True)


Q75_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part),
p AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM names)
SELECT a.p_name AS left_name, b.p_name AS right_name,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
ORDER BY left_name, right_name
"""


def q76_ntile_rank(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """Rank windows per partition: NTILE(4) and percent_rank over
    (value, event_id) order within each event_type — the position-based
    rank family (complement to q74's offset windows).  Scale shape: the
    PARTITION key is the shuffle key, so each group lands whole in one
    task and ranks are exact with no global pass; NTILE sizing follows
    the SQL rule (first n%k buckets get one extra row).  The registered
    oracle hardcodes the default k=4 — non-default values diverge from
    Q76_SQL."""
    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], kind="stable")
        n = len(g)
        rank0 = np.arange(n, dtype=np.int64)
        base, rem = divmod(n, k)
        big = rem * (base + 1)
        tile = np.where(
            rank0 < big,
            rank0 // (base + 1),
            rem + (rank0 - big) // max(base, 1),
        ) + 1
        g["tile"] = tile.astype(np.int64)
        g["pct_rank"] = np.round(
            rank0 / (n - 1) if n > 1 else np.zeros(n), 6)
        return g[["event_type", "event_id", "tile", "pct_rank"]]

    out = (
        ds.groupby("event_type").map_groups(rank_group, batch_format="pandas")
        .to_pandas()
    )
    if "event_type" not in out.columns:  # empty input -> no partial blocks
        return pd.DataFrame({"event_type": pd.Series(dtype=object),
                             "event_id": pd.Series(dtype="int64"),
                             "tile": pd.Series(dtype="int64"),
                             "pct_rank": pd.Series(dtype="float64")})
    return out.sort_values(["event_type", "event_id"]).reset_index(drop=True)


Q76_SQL = """
SELECT event_type, event_id,
       CAST(ntile(4) OVER w AS BIGINT) AS tile,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
ORDER BY event_type, event_id
"""


def q77_string_agg_per_order(sf_dir: str) -> pd.DataFrame:
    """Ordered per-group string_agg at unbounded group count — the
    distributed form of the reference's per-document ';'.join wide cells
    (entity_processor.py:74-77), here with a SQL oracle: per order, the
    return flags concatenated in line-number order.  Uses
    window.grouped_ordered_concat (sort + boundary-stitch: driver state
    is O(blocks), never O(groups))."""
    from ..stages.window import grouped_ordered_concat

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag"])
    out = grouped_ordered_concat(
        ds, key="l_orderkey", order="l_linenumber", val="l_returnflag")
    return out.rename_columns({"concat": "flags", "n": "n_items"})


Q77_SQL = """
SELECT l_orderkey,
       string_agg(l_returnflag, ';' ORDER BY l_linenumber) AS flags,
       count(*) AS n_items
FROM lineitem GROUP BY l_orderkey
"""


def q78_mode_per_nation(sf_dir: str) -> pd.DataFrame:
    """Per-nation modal market segment (grouped MODE with lexicographic
    tie-break): bounded (nation x segment) key space -> per-batch count
    combiner + canonical driver fold; nation names attach from the
    broadcast-small dimension table (no shuffle join)."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    counts = _preagg(cust, ["c_nationkey", "c_mktsegment"],
                     {"n": ("c_mktsegment", "count")})
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name"]).to_pandas()
    counts = counts.merge(nat, left_on="c_nationkey",
                          right_on="n_nationkey")
    counts = counts.sort_values(["n_name", "n", "c_mktsegment"],
                                ascending=[True, False, True],
                                kind="stable")
    out = counts.groupby("n_name", sort=False).head(1)
    out = out.rename(columns={"c_mktsegment": "mode_segment"})
    return (out[["n_name", "mode_segment", "n"]]
            .sort_values("n_name").reset_index(drop=True))


Q78_SQL = """
SELECT n_name, mode_segment, n FROM (
  SELECT n.n_name, c.c_mktsegment AS mode_segment, count(*) AS n,
         row_number() OVER (
           PARTITION BY n.n_name
           ORDER BY count(*) DESC, c.c_mktsegment) AS rn
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_mktsegment
) WHERE rn = 1 ORDER BY n_name
"""


def q79_cube_orders(sf_dir: str) -> pd.DataFrame:
    """Full CUBE over (status, priority): ONE streamed combiner pass at
    the finest grouping; the three coarser levels re-aggregate the tiny
    merged partials driver-side (bounded keys), so the fact table is
    read once for all four levels (same shape as q56's ROLLUP, plus the
    priority-only slice)."""
    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    fine = _preagg(ds, ["o_orderstatus", "o_orderpriority"],
                   {"total": ("o_totalprice", "sum"),
                    "n": ("o_totalprice", "count")})

    def level(keys: list[str]) -> pd.DataFrame:
        if keys:
            lv = (fine.groupby(keys, as_index=False)
                  .agg(total=("total", "sum"), n=("n", "sum")))
        else:
            lv = pd.DataFrame({"total": [fine["total"].sum()],
                               "n": [fine["n"].sum()]})
        for col in ("o_orderstatus", "o_orderpriority"):
            if col not in lv.columns:
                lv[col] = None
        return lv

    out = pd.concat(
        [fine, level(["o_orderstatus"]), level(["o_orderpriority"]),
         level([])],
        ignore_index=True)
    out["total"] = out["total"].round(2)
    return out[["o_orderstatus", "o_orderpriority", "total", "n"]]


Q79_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS total, count(*) AS n
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q80_set_ops(sf_dir: str) -> pd.DataFrame:
    """Distributed INTERSECT / EXCEPT via tag-counting: both key sets
    union into one (key, side-bit) stream with per-batch dedup, a single
    groupby(key) ORs the bits, and a bounded histogram over the three
    bit patterns folds per batch -> driver.  One shuffle total, no
    membership list ever materializes."""
    from ray.data.aggregate import Max

    orders = _read(sf_dir, "orders", ["o_custkey"])
    bldg = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'")

    def tag(bit: int, col: str):
        def f(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            keys = df[col].drop_duplicates()
            return pd.DataFrame({
                "key": keys,
                "b1": np.full(len(keys), bit & 1, dtype=np.int64),
                "b2": np.full(len(keys), (bit >> 1) & 1, dtype=np.int64),
            })
        return f

    tagged = (
        orders.map_batches(tag(1, "o_custkey"), batch_format="pyarrow")
        .union(bldg.map_batches(tag(2, "c_custkey"),
                                batch_format="pyarrow"))
        .groupby("key")
        .aggregate(Max("b1", alias_name="b1"), Max("b2", alias_name="b2"))
    )

    def hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        pat = df["b1"] * 1 + df["b2"] * 2
        g = pat.groupby(pat).size()
        return pd.DataFrame({"pat": g.index.astype(np.int64),
                             "n": g.values.astype(np.int64)})

    parts = tagged.map_batches(hist, batch_format="pyarrow").to_pandas()
    names = {1: "orders_only", 2: "building_only", 3: "intersect"}
    if not len(parts):
        counts = {}
    else:
        counts = parts.groupby("pat")["n"].sum().to_dict()
    out = pd.DataFrame(
        {"op": [names[p] for p in (3, 1, 2)],
         "n": [int(counts.get(p, 0)) for p in (3, 1, 2)]})
    return out.sort_values("op").reset_index(drop=True)


Q80_SQL = """
WITH o AS (SELECT DISTINCT o_custkey AS k FROM orders),
     b AS (SELECT c_custkey AS k FROM customer
           WHERE c_mktsegment = 'BUILDING')
SELECT op, n FROM (
  SELECT 'intersect' AS op,
         (SELECT count(*) FROM (SELECT k FROM o INTERSECT
                                SELECT k FROM b)) AS n
  UNION ALL
  SELECT 'orders_only',
         (SELECT count(*) FROM (SELECT k FROM o EXCEPT SELECT k FROM b))
  UNION ALL
  SELECT 'building_only',
         (SELECT count(*) FROM (SELECT k FROM b EXCEPT SELECT k FROM o))
) ORDER BY op
"""


def q81_profile_orders(sf_dir: str) -> pd.DataFrame:
    """Column profiling (per-column null count / exact distinct count /
    min / max as text) in the melted shape: one pass melts the profiled
    columns to (col, val) with per-batch distinct+null combiners, a
    groupby(col, val) dedups globally, and the per-column stats fold
    from per-batch partials over the deduped stream — distinct counting
    never holds a value list on the driver."""
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    ds = _read(sf_dir, "orders", cols)

    def melt(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        frames = []
        for c in cols:
            s = df[c]
            nn = s.dropna().drop_duplicates()
            frames.append(pd.DataFrame({
                "col": c, "val": nn.astype(str),
                "nulls": np.int64(0)}))
            n_null = np.int64(s.isna().sum())
            if n_null:
                frames.append(pd.DataFrame(
                    {"col": [c], "val": [None], "nulls": [n_null]}))
        return pd.concat(frames, ignore_index=True)

    melted = (
        ds.map_batches(melt, batch_format="pyarrow")
        .groupby(["col", "val"]).aggregate(Sum("nulls", alias_name="nulls"))
    )

    def colstats(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        nulls = df.groupby("col", as_index=False).agg(
            n_nulls=("nulls", "sum"))
        df = df[df["val"].notna()]
        if not len(df):
            stats = pd.DataFrame({"col": pd.Series(dtype=object),
                                  "n_distinct": pd.Series(dtype="int64"),
                                  "min_s": pd.Series(dtype=object),
                                  "max_s": pd.Series(dtype=object)})
        else:
            g = df.groupby("col")["val"]
            stats = pd.DataFrame(
                {"col": g.size().index,
                 "n_distinct": g.size().values.astype(np.int64),
                 "min_s": g.min().values,
                 "max_s": g.max().values})
        # one partial frame carries both the value stats and the null
        # counts so the melted stream is consumed exactly once
        return stats.merge(nulls, on="col", how="outer")

    parts = melted.map_batches(
        colstats, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["col", "min_s"], kind="stable")
    out = (parts.groupby("col", as_index=False)
           .agg(n_distinct=("n_distinct", "sum"),
                min_s=("min_s", "min"), max_s=("max_s", "max"),
                n_nulls=("n_nulls", "sum")))
    out["n_nulls"] = out["n_nulls"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return (out[["col", "n_nulls", "n_distinct", "min_s", "max_s"]]
            .sort_values("col").reset_index(drop=True))


Q81_SQL = """
SELECT col, n_nulls, n_distinct, min_s, max_s FROM (
  SELECT 'o_orderstatus' AS col,
         count(*) - count(o_orderstatus) AS n_nulls,
         count(DISTINCT o_orderstatus) AS n_distinct,
         min(CAST(o_orderstatus AS VARCHAR)) AS min_s,
         max(CAST(o_orderstatus AS VARCHAR)) AS max_s FROM orders
  UNION ALL
  SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
         count(DISTINCT o_orderpriority),
         min(CAST(o_orderpriority AS VARCHAR)),
         max(CAST(o_orderpriority AS VARCHAR)) FROM orders
  UNION ALL
  SELECT 'o_custkey', count(*) - count(o_custkey),
         count(DISTINCT o_custkey),
         min(CAST(o_custkey AS VARCHAR)),
         max(CAST(o_custkey AS VARCHAR)) FROM orders
) ORDER BY col
"""


def q82_percentile_cont(sf_dir: str) -> pd.DataFrame:
    """INTERPOLATED per-group percentiles (quantile_cont — complement to
    q53's discrete ranks): same exact merged value-count histogram, then
    linear interpolation between the two bracketing order statistics at
    rank q*(n-1).  No global sort; histogram width = distinct values per
    group."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return (df.groupby(["event_type", "value"], sort=False)
                .size().rename("n").reset_index())

    merged = (
        ds.map_batches(hist, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "value"], sort=False)["n"]
        .sum().reset_index()
    )
    out = []
    for et, g in merged.groupby("event_type"):
        g = g.sort_values("value", kind="stable")
        vals = g["value"].to_numpy()
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        row = {"event_type": et}
        for q, cname in ((0.5, "p50"), (0.9, "p90")):
            pos = q * (n - 1)          # DuckDB quantile_cont rank rule
            k0 = int(np.floor(pos))
            v0 = vals[np.searchsorted(cum, k0 + 1)]
            v1 = vals[np.searchsorted(cum, min(k0 + 2, n))]
            row[cname] = round(float(v0 + (pos - k0) * (v1 - v0)), 6)
        row["n"] = n
        out.append(row)
    return pd.DataFrame(out)[["event_type", "p50", "p90", "n"]]


Q82_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def q83_degree_histogram(sf_dir: str) -> pd.DataFrame:
    """Bipartite degree distribution (user -> #distinct event types):
    per-batch (user, type) dedup combiner, global distinct groupby, a
    second groupby counts per-user degree, and the bounded degree domain
    folds to a histogram from per-batch partials — the degree table
    itself never reaches the driver."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def local_distinct(batch: pa.Table) -> pd.DataFrame:
        return (batch.to_pandas()[["user_id", "event_type"]]
                .drop_duplicates())

    deg = (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby(["user_id", "event_type"]).count()
        .groupby("user_id").count()
    )

    def hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = df.groupby("count()").size()
        return pd.DataFrame({"degree": g.index.astype(np.int64),
                             "n_users": g.values.astype(np.int64)})

    parts = deg.map_batches(hist, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("degree", as_index=False)
           .agg(n_users=("n_users", "sum")))
    return out.sort_values("degree").reset_index(drop=True)


Q83_SQL = """
SELECT degree, count(*) AS n_users FROM (
  SELECT user_id, count(DISTINCT event_type) AS degree
  FROM events GROUP BY user_id
) GROUP BY degree ORDER BY degree
"""


def q84_bigram_lm(sf_dir: str, topk: int = 20) -> pd.DataFrame:
    """N-gram language-model statistics: global top-k bigrams with
    conditional probability ppm = 1e6 * c(w1,w2) // c(w1,·) (integer
    arithmetic on both sides; denominator = bigram-START count of w1, so
    it derives from the same grouped table with no second corpus pass).
    Scale shape: vectorized per-batch bigram counting (token arrays
    concatenated once, doc boundaries masked — no per-doc Python loop),
    then ONE hash-bucket shuffle on w1 (window.hash_bucketed_map_groups):
    each bucket merges partial counts, attaches the per-w1 denominator
    via a grouped transform, and emits only its local top-k, so the
    driver folds O(k x buckets) rows."""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        empty = pd.DataFrame({"w1": pd.Series(dtype=object),
                              "w2": pd.Series(dtype=object),
                              "n": pd.Series(dtype="int64")})
        if not texts:
            return empty
        toks = [t.split(" ") for t in texts]  # matches string_split
        lens = np.array([len(t) for t in toks], dtype=np.int64)
        words = np.array([w for t in toks for w in t], dtype=object)
        if len(words) < 2:
            return empty
        # pair i = (words[i], words[i+1]); drop pairs crossing a doc
        # boundary (i is a doc's last token)
        last_idx = np.cumsum(lens) - 1
        mask = np.ones(len(words) - 1, dtype=bool)
        mask[last_idx[last_idx < len(words) - 1]] = False
        df = pd.DataFrame({"w1": words[:-1][mask], "w2": words[1:][mask]})
        g = df.groupby(["w1", "w2"], sort=False).size().rename("n")
        return g.reset_index()

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["w1", "w2"], as_index=False)["n"].sum()
        cw1 = m.groupby("w1")["n"].transform("sum")
        m["cond_ppm"] = (1_000_000 * m["n"]) // cw1
        m = m.sort_values(["n", "w1", "w2"],
                          ascending=[False, True, True], kind="stable")
        return m.head(topk)

    parts = hash_bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"),
        key="w1", fn=bucket_topk).to_pandas()
    out = parts.sort_values(["n", "w1", "w2"],
                            ascending=[False, True, True],
                            kind="stable").head(topk)
    out["n"] = out["n"].astype("int64")
    out["cond_ppm"] = out["cond_ppm"].astype("int64")
    return out[["w1", "w2", "n", "cond_ppm"]].reset_index(drop=True)


def q85_pca_embeddings(sf_dir: str) -> pd.DataFrame:
    """Distributed PCA projection (stages/similarity.py:pca_embeddings):
    one moment-partial pass (driver folds O(batches x d^2) floats, never
    the data), driver-side d x d eigh with a fixed sign convention, one
    broadcast projection pass.  Eigenvectors aren't SQL-expressible ->
    rows-only, golden-pinned; the analytic pytest is the semantic
    check."""
    from ..stages.similarity import pca_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    proj, _summary = pca_embeddings(ds, k=2)
    return proj.to_pandas().sort_values("vec_id").reset_index(drop=True)


Q84_SQL = """
WITH toks AS (
  SELECT doc_id, g.w, g.o FROM documents,
  LATERAL (SELECT unnest(string_split(text, ' ')) AS w,
                  generate_subscripts(string_split(text, ' '), 1) AS o) g
),
big AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS n
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.o = a.o + 1
  GROUP BY 1, 2
)
SELECT w1, w2, n,
       CAST((1000000 * n) // sum(n) OVER (PARTITION BY w1) AS BIGINT)
         AS cond_ppm
FROM big ORDER BY n DESC, w1, w2 LIMIT 20
"""


def q86_funnel(sf_dir: str) -> pd.DataFrame:
    """Sequence-pattern (funnel) matching: how many users have a
    view -> click -> purchase SUBSEQUENCE in time order (greedy
    earliest-match, the standard funnel semantic).  Scale shape: one
    hash-bucket shuffle on user_id; inside each bucket the three stages
    resolve with vectorized grouped mins + merges (no per-user Python
    loop), and only the three counters leave the bucket."""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = (g[g["event_type"] == "view"].groupby("user_id")["ts"].min()
             .rename("t_v").reset_index())
        c = g[g["event_type"] == "click"].merge(v, on="user_id")
        c = (c[c["ts"] > c["t_v"]].groupby("user_id")["ts"].min()
             .rename("t_c").reset_index())
        p = g[g["event_type"] == "purchase"].merge(c, on="user_id")
        p = p[p["ts"] > p["t_c"]]
        return pd.DataFrame({
            "n_view": [np.int64(len(v))],
            "n_view_click": [np.int64(len(c))],
            "n_full_funnel": [np.int64(p["user_id"].nunique())],
        })

    parts = hash_bucketed_map_groups(
        ds, key="user_id", fn=funnel_bucket).to_pandas()
    out = pd.DataFrame({
        "n_view": [parts["n_view"].sum()],
        "n_view_click": [parts["n_view_click"].sum()],
        "n_full_funnel": [parts["n_full_funnel"].sum()],
    }).astype("int64")
    return out


Q86_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT DISTINCT e.user_id
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase')
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_full_funnel
"""


def q87_full_outer_join(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join (the one join type the registry lacked): every
    customer with their order count, customers without orders kept with
    n_orders = 0, orphan order keys kept with null acctbal.  Ray side:
    ray-merged per-key combiner aggregate -> native hash full_outer
    join.  Ray's join DROPS the right_on key column, so the right side
    carries a duplicate key to coalesce from (the documented
    workaround)."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    n_ord = _preagg(orders, ["o_custkey"],
                    {"n_orders": ("o_custkey", "count")}, merge="ray")

    def dup_key(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["okey"] = df["o_custkey"]
        return df

    n_ord = n_ord.map_batches(dup_key, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    joined = cust.join(n_ord, join_type="full_outer", num_partitions=4,
                       on=("c_custkey",), right_on=("o_custkey",))

    def finish(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        key = df["c_custkey"].astype("float64").fillna(df["okey"])
        return pd.DataFrame({
            "custkey": key.astype("int64"),
            "n_orders": df["n_orders"].fillna(0).astype("int64"),
            "acctbal": df["c_acctbal"].round(2),
        })

    out = joined.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("custkey").reset_index(drop=True)


Q87_SQL = """
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       COALESCE(o.n, 0) AS n_orders,
       round(c.c_acctbal, 2) AS acctbal
FROM customer c
FULL OUTER JOIN (SELECT o_custkey, count(*) AS n
                 FROM orders GROUP BY o_custkey) o
  ON c.c_custkey = o.o_custkey
ORDER BY custkey
"""


def q88_json_props_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: pull the integer `k` out of the JSON
    `props` column and aggregate per event_type.  Ray side: vectorized
    regex extraction (`Series.str.extract` on the known key) with a
    row-exact `json.loads` fallback for any row the fast path misses —
    the standard two-tier JSON scan.  Aggregation is the per-batch
    combiner + bounded-key driver merge."""
    import json as _json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        miss = k.isna()
        if miss.any():  # non-integer / reordered JSON: exact parse
            k[miss] = df.loc[miss, "props"].map(
                lambda s: _json.loads(s).get("k"))
        df["k"] = k.astype("int64")
        df["k_gt50"] = (df["k"] > 50).astype("int64")
        return df[["event_type", "k", "k_gt50"]]

    out = _preagg(
        ds.map_batches(extract, batch_format="pyarrow"),
        ["event_type"],
        {
            "n": ("k", "count"),
            "k_sum": ("k", "sum"),
            "n_k_gt50": ("k_gt50", "sum"),
            "k_max": ("k", "max"),
        },
    )
    out["avg_k_ppm"] = (1_000_000 * out["k_sum"]) // out["n"]
    return out.sort_values("event_type").reset_index(drop=True)


Q88_SQL = """
WITH e AS (SELECT event_type,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS k
           FROM events)
SELECT event_type,
       count(*) AS n,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_k_gt50,
       max(k) AS k_max,
       CAST((1000000 * sum(k)) // count(*) AS BIGINT) AS avg_k_ppm
FROM e GROUP BY event_type ORDER BY event_type
"""


def q89_cross_join(sf_dir: str) -> pd.DataFrame:
    """CROSS JOIN (completes the join matrix: inner/left/semi/anti/asof/
    range/full-outer/cross).  Scale shape: the small side is read once on
    the driver and broadcast via the task closure; the big side expands
    per batch with a pandas `how="cross"` merge — no shuffle at all, and
    the expansion streams block by block."""
    region = _read(sf_dir, "region", ["r_name"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_name"])

    def expand(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().merge(region, how="cross")
        df["pair"] = df["n_name"] + "-" + df["r_name"]
        return df[["n_name", "r_name", "pair"]]

    out = nation.map_batches(expand, batch_format="pyarrow").to_pandas()
    return out.sort_values(["n_name", "r_name"]).reset_index(drop=True)


Q89_SQL = """
SELECT n_name, r_name, n_name || '-' || r_name AS pair
FROM nation CROSS JOIN region
ORDER BY n_name, r_name
"""


def q90_transition_matrix(sf_dir: str) -> pd.DataFrame:
    """Markov transition counts: per-user (prev_event_type ->
    event_type) bigrams in (ts, event_id) order, with the number of
    distinct users carrying each transition.  Scale shape: ONE hash
    shuffle on user_id; inside each bucket the sequence resolves with a
    vectorized grouped shift and collapses to a (|types|^2)-row partial
    — n_users partials sum exactly because a user's whole history lives
    in one bucket.  Only tiny partials reach the driver."""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        g["prev"] = g.groupby("user_id", sort=False)["event_type"].shift(1)
        g = g[g["prev"].notna()]
        return (
            g.groupby(["prev", "event_type"], sort=False)
            .agg(n=("user_id", "size"), n_users=("user_id", "nunique"))
            .reset_index()
        )

    parts = hash_bucketed_map_groups(
        ds, "user_id", pairs_bucket, n_buckets=16).to_pandas()
    if "prev" not in parts.columns:  # empty input -> no partial blocks
        return pd.DataFrame({"from_type": pd.Series(dtype="object"),
                             "to_type": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64"),
                             "n_users": pd.Series(dtype="int64")})
    out = (
        parts.groupby(["prev", "event_type"], sort=False)[["n", "n_users"]]
        .sum().reset_index()
        .rename(columns={"prev": "from_type", "event_type": "to_type"})
    )
    out[["n", "n_users"]] = out[["n", "n_users"]].astype("int64")
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


Q90_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS from_type, event_type AS to_type,
       count(*) AS n, count(DISTINCT user_id) AS n_users
FROM o WHERE prev IS NOT NULL
GROUP BY prev, event_type ORDER BY from_type, to_type
"""


def q91_moving_avg(sf_dir: str) -> pd.DataFrame:
    """ROWS-frame window (the one frame type the registry lacked —
    q35 is a RANGE/time frame, q51 an unbounded running frame): per-user
    3-event moving average of value in (ts, event_id) order.  Same
    keyed-window scaffold as q74: one user_id hash shuffle, vectorized
    grouped `rolling` inside the bucket.  Values are integer-scaled and
    the average is ppm integer division so the compare is exact."""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def mavg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        g["value_c"] = np.round(
            g["value"].to_numpy(np.float64) * 100).astype("int64")
        grp = g.groupby("user_id", sort=False)["value_c"]
        roll = grp.rolling(3, min_periods=1)
        g["w_sum"] = roll.sum().reset_index(level=0, drop=True).astype("int64")
        g["w_cnt"] = roll.count().reset_index(level=0, drop=True).astype("int64")
        g["mavg_ppm"] = (1_000_000 * g["w_sum"]) // (100 * g["w_cnt"])
        return g[["user_id", "event_id", "mavg_ppm"]]

    out = hash_bucketed_map_groups(
        ds, "user_id", mavg_bucket, n_buckets=16).to_pandas()
    if "user_id" not in out.columns:
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "event_id": pd.Series(dtype="int64"),
                             "mavg_ppm": pd.Series(dtype="int64")})
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


Q91_SQL = """
WITH c AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events
)
SELECT user_id, event_id,
       CAST((1000000 * sum(value_c) OVER w) //
            (100 * count(*) OVER w) AS BIGINT) AS mavg_ppm
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def q92_lm_doc_score(sf_dir: str, min_count: int = 2,
                     keep_ppm: int = 35_000) -> pd.DataFrame:
    """CCNet-style LM quality filtering: score every document by the
    average conditional probability (ppm) of its bigrams under the
    corpus bigram LM, and flag keeps above a threshold.  Two passes:
    (1) build the bigram table with q84's vectorized counting + one w1
    hash shuffle, PRUNE to n >= min_count (the broadcast-bound lever —
    a real deployment prunes/quantizes the LM exactly like CCNet), then
    broadcast it via ray.put; (2) one streamed pass re-counting each
    doc's bigrams (docs are row-local, so per-batch doc scores are
    final), vectorized merge against the broadcast table with unseen
    bigrams scored 0.  Integer ppm arithmetic end to end."""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _doc_bigrams(doc_ids, texts):
        toks = [t.split(" ") for t in texts]
        lens = np.array([len(t) for t in toks], dtype=np.int64)
        words = np.array([w for t in toks for w in t], dtype=object)
        if len(words) < 2:
            return pd.DataFrame({"doc_id": [], "w1": [], "w2": []})
        last_idx = np.cumsum(lens) - 1
        mask = np.ones(len(words) - 1, dtype=bool)
        mask[last_idx[last_idx < len(words) - 1]] = False
        own = np.repeat(np.asarray(doc_ids, dtype=object), lens)
        return pd.DataFrame({"doc_id": own[:-1][mask],
                             "w1": words[:-1][mask],
                             "w2": words[1:][mask]})

    def lm_partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        bi = _doc_bigrams([""] * len(texts), texts)
        if not len(bi):
            return pd.DataFrame({"w1": pd.Series(dtype=object),
                                 "w2": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        return (bi.groupby(["w1", "w2"], sort=False).size()
                .rename("n").reset_index())

    def lm_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["w1", "w2"], as_index=False)["n"].sum()
        cw1 = m.groupby("w1")["n"].transform("sum")
        # denominator over ALL bigrams, prune AFTER (matches the oracle)
        m["cond_ppm"] = ((1_000_000 * m["n"]) // cw1).astype("int64")
        return m[m["n"] >= min_count][["w1", "w2", "cond_ppm"]]

    lm = hash_bucketed_map_groups(
        ds.map_batches(lm_partial, batch_format="pyarrow"),
        key="w1", fn=lm_bucket).to_pandas()
    lm_ref = ray.put(lm)

    def score(batch: pa.Table) -> pd.DataFrame:
        table = ray.get(lm_ref)
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        bi = _doc_bigrams(doc_ids, texts)
        if len(bi):
            j = bi.merge(table, on=["w1", "w2"], how="left")
            j["cond_ppm"] = j["cond_ppm"].fillna(0).astype("int64")
            agg = (j.groupby("doc_id", sort=False)
                   .agg(n_bigrams=("cond_ppm", "size"),
                        s=("cond_ppm", "sum")).reset_index())
        else:
            agg = pd.DataFrame({"doc_id": [], "n_bigrams": [], "s": []})
        out = pd.DataFrame({"doc_id": doc_ids}).merge(
            agg, on="doc_id", how="left")
        out["n_bigrams"] = out["n_bigrams"].fillna(0).astype("int64")
        out["avg_cond_ppm"] = (
            out["s"].fillna(0).astype("int64")
            // out["n_bigrams"].clip(lower=1)).astype("int64")
        out["keep"] = (out["avg_cond_ppm"] >= keep_ppm).astype("int64")
        return out[["doc_id", "n_bigrams", "avg_cond_ppm", "keep"]]

    res = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return res.sort_values("doc_id").reset_index(drop=True)


def q94_gapfill_hourly(sf_dir: str) -> pd.DataFrame:
    """Date-spine gap filling: hourly event counts with EVERY hour of
    the observed range present, zero-filled where no events landed (the
    time-series densification pattern q08 deliberately omits).  Scale
    shape: the combiner aggregate yields one bounded partial per
    (hour x batch); the spine is derived from the tiny aggregate result
    itself (its min/max hour), so no second pass over the data and no
    unbounded driver state — spine length is hours-of-range, not rows."""
    ds = _read(sf_dir, "events", ["ts"])

    def hour(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame({"hour": df["ts"].dt.floor("h")})

    agg = _preagg(
        ds.map_batches(hour, batch_format="pyarrow"),
        ["hour"], {"n": ("hour", "count")},
    )
    spine = pd.DataFrame({
        "hour": pd.date_range(agg["hour"].min(), agg["hour"].max(),
                              freq="h")})
    out = spine.merge(agg, on="hour", how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    out["hour"] = out["hour"].dt.strftime("%Y-%m-%d %H:%M:%S")
    return out.sort_values("hour").reset_index(drop=True)


Q94_SQL = """
WITH h AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n
           FROM events GROUP BY 1),
spine AS (SELECT unnest(generate_series((SELECT min(hour) FROM h),
                                        (SELECT max(hour) FROM h),
                                        INTERVAL 1 HOUR)) AS hour)
SELECT strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       COALESCE(h.n, 0) AS n
FROM spine s LEFT JOIN h ON s.hour = h.hour
ORDER BY hour
"""


def q93_time_weighted_avg(sf_dir: str) -> pd.DataFrame:
    """Interval-weighted aggregation: per-user time-weighted mean of
    `value`, each event's value held until the user's next event (the
    last event carries no interval) — the sensor/metrics rollup
    semantic.  One user_id hash shuffle; inside the bucket a vectorized
    grouped lead gives microsecond durations; integer ppm arithmetic
    end to end (cents x us products stay far below int64 range at
    per-user cardinalities)."""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def twa_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        g["vc"] = np.round(
            g["value"].to_numpy(np.float64) * 100).astype("int64")
        nxt = g.groupby("user_id", sort=False)["ts"].shift(-1)
        mask = nxt.notna()
        g = g[mask]
        dur = ((nxt[mask].to_numpy("datetime64[us]")
                - g["ts"].to_numpy("datetime64[us]"))
               .astype("timedelta64[us]").astype(np.int64))
        g = g.assign(wv=g["vc"].to_numpy() * dur, dur=dur)
        out = (g.groupby("user_id", sort=False)[["wv", "dur"]]
               .sum().reset_index())
        # 1e6 * sum(vc*dur) exceeds int64 (the oracle sums in HUGEINT);
        # the per-user rows are bucket-local and few, so exact Python-int
        # math here is free
        out["twa_ppm"] = (
            (out["wv"].astype(object) * 1_000_000)
            // (out["dur"].astype(object) * 100)).astype("int64")
        return out[["user_id", "twa_ppm"]]

    out = hash_bucketed_map_groups(
        ds, "user_id", twa_bucket, n_buckets=16).to_pandas()
    if "user_id" not in out.columns:
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "twa_ppm": pd.Series(dtype="int64")})
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


Q93_SQL = """
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS vc,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
d AS (
  SELECT user_id, vc, CAST(epoch_us(nxt - ts) AS BIGINT) AS dur
  FROM c WHERE nxt IS NOT NULL
)
SELECT user_id,
       CAST((1000000 * sum(vc * dur)) // (100 * sum(dur)) AS BIGINT)
         AS twa_ppm
FROM d GROUP BY user_id ORDER BY user_id
"""


Q92_SQL = """
WITH toks AS (
  SELECT doc_id, g.w, g.o FROM documents,
  LATERAL (SELECT unnest(string_split(text, ' ')) AS w,
                  generate_subscripts(string_split(text, ' '), 1) AS o) g
),
bi AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.o = a.o + 1
),
lm AS (
  SELECT w1, w2, count(*) AS n FROM bi GROUP BY 1, 2
),
lmp AS (
  SELECT w1, w2,
         CAST((1000000 * n) // sum(n) OVER (PARTITION BY w1) AS BIGINT)
           AS cond_ppm
  FROM lm QUALIFY n >= 2
),
scored AS (
  SELECT b.doc_id, count(*) AS n_bigrams,
         sum(COALESCE(l.cond_ppm, 0)) AS s
  FROM bi b LEFT JOIN lmp l ON b.w1 = l.w1 AND b.w2 = l.w2
  GROUP BY b.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(sc.s // sc.n_bigrams, 0) AS BIGINT) AS avg_cond_ppm,
       CAST(CASE WHEN COALESCE(sc.s // sc.n_bigrams, 0) >= 35000
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d LEFT JOIN scored sc ON d.doc_id = sc.doc_id
ORDER BY d.doc_id
"""


def q95_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: users grouped by the Monday-start week of
    their FIRST event (the cohort), counting distinct active users per
    (cohort_week, week_offset) — the classic product-analytics rollup.
    Scale shape: ONE user_id hash shuffle; inside each bucket the per-user
    first week and distinct (user, week) activity pairs are both
    bucket-local (a user's whole history lives in one bucket), so the
    per-bucket (cohort, offset) distinct-user counts are disjoint partials
    that SUM exactly — same trick as q90's transition matrix.  The final
    merge is over (weeks x offsets) rows, bounded by the calendar, not the
    corpus."""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g["ts"].dt.normalize()
        week = d - pd.to_timedelta(d.dt.weekday, unit="D")  # Monday floor
        act = pd.DataFrame({"user_id": g["user_id"], "week": week})
        act = act.drop_duplicates()
        cohort = act.groupby("user_id", sort=False)["week"].min()
        act["cohort_week"] = act["user_id"].map(cohort)
        act["week_offset"] = (
            (act["week"] - act["cohort_week"]).dt.days // 7).astype("int64")
        out = (act.groupby(["cohort_week", "week_offset"], sort=False)
               .size().rename("n_users").reset_index())
        return out

    parts = hash_bucketed_map_groups(ds, "user_id", bucket,
                                     n_buckets=16).to_pandas()
    if "cohort_week" not in parts.columns:
        return pd.DataFrame({"cohort_week": pd.Series(dtype=object),
                             "week_offset": pd.Series(dtype="int64"),
                             "n_users": pd.Series(dtype="int64")})
    out = (parts.groupby(["cohort_week", "week_offset"], sort=False)
           ["n_users"].sum().reset_index())
    out["cohort_week"] = out["cohort_week"].dt.strftime("%Y-%m-%d")
    out["n_users"] = out["n_users"].astype("int64")
    return (out.sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True))


Q95_SQL = """
WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cw
           FROM events GROUP BY 1),
a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cw, a.w) // 7 AS BIGINT) AS week_offset,
       count(*) AS n_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q96_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Ratio-to-report: each nation's share (ppm) of global order revenue
    plus its revenue rank — the percent-of-total window pattern the
    rollup/cube queries don't cover.  Scale shape: the customer->nation
    dimension is broadcast once via ray.put (q04's pattern); revenue sums
    are per-batch combiner partials merged driver-side over the 25-nation
    bounded key; the global total is derived from that tiny aggregate, so
    no second pass.  Share math uses Python-int objects: 1e6 x global
    cents exceeds int64 at warehouse scale (the oracle sums in HUGEINT)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    c2n = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def tag(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(c2n)
        df = batch.to_pandas()
        return pd.DataFrame({
            "nationkey": df["o_custkey"].map(m).astype("int64"),
            "cents": (df["o_totalprice"] * 100).round().astype("int64"),
        })

    agg = _preagg(ds.map_batches(tag, batch_format="pyarrow"),
                  ["nationkey"], {"rev_cents": ("cents", "sum")})
    agg = agg.merge(nat.rename(columns={"n_nationkey": "nationkey"}),
                    on="nationkey")
    total = int(agg["rev_cents"].sum())
    agg["share_ppm"] = (
        (agg["rev_cents"].astype(object) * 1_000_000) // total
    ).astype("int64")
    agg = agg.sort_values(["rev_cents", "n_name"],
                          ascending=[False, True], kind="stable")
    agg["rn"] = np.arange(1, len(agg) + 1, dtype="int64")
    agg["rev_cents"] = agg["rev_cents"].astype("int64")
    return agg[["n_name", "rev_cents", "share_ppm", "rn"]].reset_index(
        drop=True)


Q96_SQL = """
WITH r AS (
  SELECT n.n_name,
         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1)
SELECT n_name,
       CAST(rev_cents AS BIGINT) AS rev_cents,
       CAST((1000000 * rev_cents) // (SELECT sum(rev_cents) FROM r)
            AS BIGINT) AS share_ppm,
       CAST(row_number() OVER (ORDER BY rev_cents DESC, n_name)
            AS BIGINT) AS rn
FROM r
ORDER BY rn
"""


def q97_weighted_median(sf_dir: str) -> pd.DataFrame:
    """Weighted median (lower variant: smallest value whose cumulative
    weight reaches half the total) of extended price weighted by quantity,
    per return flag.  Scale shape: histogram-reduce — a distributed
    groupby compresses rows to a (flag, price_cents)->weight histogram
    (merge="ray": the key space scales with distinct prices, NOT bounded),
    then a per-flag bucket scan completes the histogram merge, sorts it
    and takes the first row with 2*cumw >= total.  ONE all-to-all: the
    per-batch partials are already (flag, price_c)->w compressed, so the
    bucket merge is a pandas groupby over partial-histogram rows, never
    raw rows.  (If per-flag distinct-value counts outgrow a bucket, chain
    _preagg(merge="ray") in front — same scan, pre-merged input.)"""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def cents_hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        h = pd.DataFrame({
            "flag": df["l_returnflag"],
            "price_c": (df["l_extendedprice"] * 100).round().astype("int64"),
            "w": df["l_quantity"].round().astype("int64"),
        })
        return (h.groupby(["flag", "price_c"], sort=False)["w"]
                .sum().reset_index())

    hist = ds.map_batches(cents_hist, batch_format="pyarrow")

    def median_scan(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["flag", "price_c"], sort=False)["w"]
             .sum().reset_index())
        rows = []
        for flag, sub in g.groupby("flag", sort=False):
            sub = sub.sort_values("price_c", kind="stable")
            cw = sub["w"].cumsum()
            tw = int(sub["w"].sum())
            hit = sub.loc[2 * cw >= tw, "price_c"]
            rows.append({"flag": flag, "wmedian_cents": int(hit.iloc[0])})
        return pd.DataFrame(rows)

    out = hash_bucketed_map_groups(hist, "flag", median_scan,
                                   n_buckets=4).to_pandas()
    if "flag" not in out.columns:
        return pd.DataFrame({"flag": pd.Series(dtype=object),
                             "wmedian_cents": pd.Series(dtype="int64")})
    out["wmedian_cents"] = out["wmedian_cents"].astype("int64")
    return out.sort_values("flag").reset_index(drop=True)


Q97_SQL = """
WITH c AS (SELECT l_returnflag AS flag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                  CAST(round(l_quantity) AS BIGINT) AS w
           FROM lineitem),
t AS (SELECT flag, price_c, sum(w) AS w FROM c GROUP BY 1, 2),
cum AS (SELECT flag, price_c,
               sum(w) OVER (PARTITION BY flag ORDER BY price_c) AS cw,
               sum(w) OVER (PARTITION BY flag) AS tw
        FROM t)
SELECT flag, CAST(min(price_c) AS BIGINT) AS wmedian_cents
FROM cum WHERE 2 * cw >= tw
GROUP BY flag
ORDER BY flag
"""


def _skyline_2d(df: pd.DataFrame) -> pd.DataFrame:
    """Minimizing 2-D skyline sweep over (p_size, price_c); keeps ALL
    mutually-tied points (dominance needs one strict inequality).
    Vectorized: per-size group-min + prefix-min over strictly smaller
    sizes."""
    df = df.sort_values(["p_size", "price_c", "p_partkey"], kind="stable")
    grp_min = df.groupby("p_size", sort=True)["price_c"].min()
    # min price over STRICTLY smaller sizes (shifted prefix-min)
    strict = grp_min.cummin().shift(1)
    dom_strict = df["p_size"].map(strict)
    keep = (df["price_c"] == df["p_size"].map(grp_min)) & (
        dom_strict.isna() | (df["price_c"] < dom_strict))
    return df[keep]


def _disc_quantile(vals, cnts) -> int:
    """DuckDB quantile_disc(x, 0.5) rank rule over a (sorted values,
    counts) histogram: the element at 1-indexed rank ceil(n/2)."""
    cum = np.cumsum(cnts)
    target = -(-cum[-1] // 2)  # ceil(n/2)
    return int(vals[np.searchsorted(cum, target)])


def q98_skyline(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (p_size min, p_retailprice min); ties on both axes are mutually
    non-dominating and all kept, matching the NOT-EXISTS oracle.  Scale
    shape: the LOCAL skyline is a combiner — each batch emits only its
    own frontier (output is frontier-sized, not batch-sized), a TREE
    round re-skylines coalesced frontiers, and only then does the
    driver finish the merge — valid because dominance is transitive:
    any point dominated globally is dominated by some point that
    survives its own shard's local skyline.  The sweep is a vectorized
    sort + per-size group-min + prefix-min over strictly-smaller sizes,
    no pairwise loop.  Honest worst case: on ANTI-correlated axes the
    true frontier is O(n) and no algorithm shrinks it — the combiner
    bounds driver input by frontier size, which for real (roughly
    independent) attributes is ~O(log^1 n) per shard."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def local_skyline(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["price_c"] = (df["p_retailprice"] * 100).round().astype("int64")
        return _skyline_2d(df[["p_partkey", "p_size", "price_c"]])

    def skyline_batch(batch: pa.Table) -> pd.DataFrame:
        return _skyline_2d(batch.to_pandas())

    parts = (ds.map_batches(local_skyline, batch_format="pyarrow")
             .repartition(4)
             .map_batches(skyline_batch, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
    if not len(parts):
        return pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                             "p_size": pd.Series(dtype="int64"),
                             "price_c": pd.Series(dtype="int64")})
    out = _skyline_2d(parts)
    out["p_size"] = out["p_size"].astype("int64")
    return (out.sort_values(["p_size", "price_c", "p_partkey"])
            .reset_index(drop=True))


Q98_SQL = """
WITH c AS (SELECT p_partkey, p_size,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
           FROM part)
SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, price_c
FROM c a
WHERE NOT EXISTS (
  SELECT 1 FROM c b
  WHERE b.p_size <= a.p_size AND b.price_c <= a.price_c
    AND (b.p_size < a.p_size OR b.price_c < a.price_c))
ORDER BY p_size, price_c, p_partkey
"""


def q99_mad(sf_dir: str) -> pd.DataFrame:
    """Median absolute deviation per return flag (robust spread), both
    quantiles under DuckDB's quantile_disc rank rule (element at
    ceil(q*n), 1-indexed).  Scale shape: q97's single-shuffle
    histogram-reduce, but BOTH statistics come out of the same per-flag
    value histogram — the deviation histogram is derived from it in the
    bucket (|price - med| re-binning of counts), so the MAD costs no
    second pass over the data."""
    from ..stages.window import hash_bucketed_map_groups

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def cents_hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        h = pd.DataFrame({
            "flag": df["l_returnflag"],
            "price_c": (df["l_extendedprice"] * 100).round().astype("int64"),
        })
        return (h.groupby(["flag", "price_c"], sort=False)
                .size().rename("n").reset_index())

    hist = ds.map_batches(cents_hist, batch_format="pyarrow")

    def mad_scan(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["flag", "price_c"], sort=False)["n"]
             .sum().reset_index())
        rows = []
        for flag, sub in g.groupby("flag", sort=False):
            sub = sub.sort_values("price_c", kind="stable")
            med = _disc_quantile(sub["price_c"].to_numpy(),
                                 sub["n"].to_numpy())
            dev = (sub.assign(d=(sub["price_c"] - med).abs())
                   .groupby("d")["n"].sum().reset_index()
                   .sort_values("d", kind="stable"))
            mad = _disc_quantile(dev["d"].to_numpy(), dev["n"].to_numpy())
            rows.append({"flag": flag, "median_cents": med,
                         "mad_cents": mad})
        return pd.DataFrame(rows)

    out = hash_bucketed_map_groups(hist, "flag", mad_scan,
                                   n_buckets=4).to_pandas()
    if "flag" not in out.columns:
        return pd.DataFrame({"flag": pd.Series(dtype=object),
                             "median_cents": pd.Series(dtype="int64"),
                             "mad_cents": pd.Series(dtype="int64")})
    out["median_cents"] = out["median_cents"].astype("int64")
    out["mad_cents"] = out["mad_cents"].astype("int64")
    return out.sort_values("flag").reset_index(drop=True)


Q99_SQL = """
WITH c AS (SELECT l_returnflag AS flag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
           FROM lineitem),
m AS (SELECT flag, quantile_disc(price_c, 0.5) AS med FROM c GROUP BY 1)
SELECT c.flag,
       CAST(any_value(m.med) AS BIGINT) AS median_cents,
       CAST(quantile_disc(abs(c.price_c - m.med), 0.5) AS BIGINT)
         AS mad_cents
FROM c JOIN m ON c.flag = m.flag
GROUP BY c.flag
ORDER BY c.flag
"""


def q100_trend_slope(sf_dir: str) -> pd.DataFrame:
    """Grouped OLS trend: least-squares slope of value (cents) against
    event day, per event type — regression via SUFFICIENT STATISTICS
    (n, Sx, Sy, Sxx, Sxy), the canonical mergeable-aggregate pattern:
    per-batch integer partials sum exactly, the closed-form slope is
    computed once per group from the merged stats.  Day offsets from a
    fixed epoch keep per-batch int64 sums far from overflow; the final
    n*Sxy - Sx*Sy products use Python-int objects (the oracle computes
    them in HUGEINT).  Integer ppm output; slopes can be NEGATIVE and
    DuckDB's // TRUNCATES toward zero (-7//2 = -3) while Python's
    floors (-4), so the division is sign-aware truncating."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    epoch = pd.Timestamp("2020-01-01")

    def stats(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        x = ((df["ts"] - epoch).dt.days).astype("int64")
        y = (df["value"] * 100).round().astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"], "x": x, "y": y,
                          "xx": x * x, "xy": x * y})
        return (g.groupby("event_type", sort=False)
                .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                     sxx=("xx", "sum"), sxy=("xy", "sum")).reset_index())

    agg = _preagg(ds.map_batches(stats, batch_format="pyarrow"),
                  ["event_type"],
                  {"n": ("n", "sum"), "sx": ("sx", "sum"),
                   "sy": ("sy", "sum"), "sxx": ("sxx", "sum"),
                   "sxy": ("sxy", "sum")})
    n = agg["n"].astype(object)
    num = n * agg["sxy"].astype(object) - agg["sx"].astype(object) * agg[
        "sy"].astype(object)
    den = n * agg["sxx"].astype(object) - agg["sx"].astype(object) ** 2
    def _trunc_div(a: int, b: int) -> int:
        q = (1_000_000 * abs(a)) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    agg["slope_ppm"] = pd.Series(
        [_trunc_div(a, b) for a, b in zip(num, den)],
        index=agg.index).astype("int64")
    agg["n"] = agg["n"].astype("int64")
    return (agg[["event_type", "n", "slope_ppm"]]
            .sort_values("event_type").reset_index(drop=True))


Q100_SQL = """
WITH c AS (SELECT event_type,
                  CAST(date_diff('day', TIMESTAMP '2020-01-01', ts)
                       AS BIGINT) AS x,
                  CAST(round(value * 100) AS BIGINT) AS y
           FROM events),
s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM c GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
            AS BIGINT) AS slope_ppm
FROM s ORDER BY event_type
"""


def q101_iqr_outliers(sf_dir: str) -> pd.DataFrame:
    """Tukey-fence outlier detection per event type: rows outside
    [Q1 - 1.5*IQR, Q3 + 1.5*IQR] — the DERIVED-THRESHOLD two-phase
    pattern: pass 1 builds per-type value histograms (per-batch
    combiner, driver merge over the bounded type x distinct-cents key)
    and takes Q1/Q3 under the quantile_disc rank rule; the tiny fence
    table is broadcast via ray.put; pass 2 streams the data once more,
    counting fence violations with per-batch partials.  All fence math
    is doubled-integer (2*v vs 2*q1 - 3*iqr) so the 1.5 factor never
    leaves integer arithmetic."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        h = pd.DataFrame({
            "event_type": df["event_type"],
            "vc": (df["value"] * 100).round().astype("int64"),
        })
        return (h.groupby(["event_type", "vc"], sort=False)
                .size().rename("n").reset_index())

    merged = (ds.map_batches(hist, batch_format="pyarrow").to_pandas()
              .groupby(["event_type", "vc"], sort=False)["n"]
              .sum().reset_index())
    fences = {}
    qrows = []
    for et, g in merged.groupby("event_type"):
        g = g.sort_values("vc", kind="stable")
        cum = g["n"].cumsum()
        total = int(cum.iloc[-1])
        q1 = int(g.loc[cum >= -((-25 * total) // 100), "vc"].iloc[0])
        q3 = int(g.loc[cum >= -((-75 * total) // 100), "vc"].iloc[0])
        iqr = q3 - q1
        fences[et] = (2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr)
        qrows.append({"event_type": et, "q1_cents": q1, "q3_cents": q3})
    fence_ref = ray.put(fences)

    def flag(batch: pa.Table) -> pd.DataFrame:
        f = ray.get(fence_ref)
        df = batch.to_pandas()
        vc2 = 2 * (df["value"] * 100).round().astype("int64")
        lo = df["event_type"].map(lambda t: f[t][0])
        hi = df["event_type"].map(lambda t: f[t][1])
        return pd.DataFrame({
            "event_type": df["event_type"],
            "out": ((vc2 < lo) | (vc2 > hi)).astype("int64"),
        })

    agg = _preagg(ds.map_batches(flag, batch_format="pyarrow"),
                  ["event_type"],
                  {"n": ("out", "count"), "n_outliers": ("out", "sum")})
    out = agg.merge(pd.DataFrame(qrows), on="event_type")
    for c in ("n", "n_outliers", "q1_cents", "q3_cents"):
        out[c] = out[c].astype("int64")
    return (out[["event_type", "n", "n_outliers", "q1_cents", "q3_cents"]]
            .sort_values("event_type").reset_index(drop=True))


Q101_SQL = """
WITH c AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS vc
           FROM events),
q AS (SELECT event_type,
             quantile_disc(vc, 0.25) AS q1,
             quantile_disc(vc, 0.75) AS q3
      FROM c GROUP BY 1)
SELECT c.event_type,
       count(*) AS n,
       CAST(count(*) FILTER (WHERE 2 * vc < 2 * q1 - 3 * (q3 - q1)
                                OR 2 * vc > 2 * q3 + 3 * (q3 - q1))
            AS BIGINT) AS n_outliers,
       CAST(any_value(q1) AS BIGINT) AS q1_cents,
       CAST(any_value(q3) AS BIGINT) AS q3_cents
FROM c JOIN q ON c.event_type = q.event_type
GROUP BY c.event_type
ORDER BY c.event_type
"""


def q102_dup_windows(sf_dir: str):
    """Substring-window dedup (Lee et al. 2022 chunk-level relative):
    40-char tiling windows duplicated across >= 2 distinct docs.  One
    bucketed shuffle keyed on the window hash; per-batch (doc, window)
    dedup combiner."""
    from ..stages.substring import duplicated_windows

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return duplicated_windows(docs, window=40, stride=40, min_docs=2)


Q102_SQL = """
WITH w AS (
  SELECT DISTINCT doc_id, substring(text, s, 40) AS win
  FROM (SELECT doc_id, text,
               unnest(range(1, len(text) - 38, 40)) AS s
        FROM documents)
)
SELECT win, count(*) AS ndocs FROM w GROUP BY win HAVING count(*) >= 2
"""


def q103_doc_dup_window_stats(sf_dir: str):
    """Per-doc duplicated-chunk fraction (integer ppm) over the doc's
    distinct 40-char windows — the substring-dedup FILTER signal.  Two
    bounded shuffles (window bucket, then doc_id partial merge); the
    duplicate-window set never transits the driver."""
    from ..stages.substring import doc_dup_window_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return doc_dup_window_stats(docs, window=40, stride=40, min_docs=2)


Q103_SQL = """
WITH w AS (
  SELECT DISTINCT doc_id, substring(text, s, 40) AS win
  FROM (SELECT doc_id, text,
               unnest(range(1, len(text) - 38, 40)) AS s
        FROM documents)
),
d AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2)
SELECT w.doc_id,
       count(*) AS n_windows,
       count(d.win) AS n_dup,
       CAST((1000000 * count(d.win)) // count(*) AS BIGINT) AS dup_ppm
FROM w LEFT JOIN d ON w.win = d.win
GROUP BY w.doc_id
"""


def q104_ngram_jaccard_pairs(sf_dir: str):
    """n-gram Jaccard near-dup pairs (the dedup-family member between
    exact hashing and MinHash): candidates blocked on shared 40-char
    tiling windows, scored with EXACT distinct char-3-gram Jaccard as
    integer ppm — deterministic and fully SQL-expressible, so this one
    carries an oracle (unlike the LSH-gated q33)."""
    from ..stages.substring import window_blocked_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return window_blocked_jaccard_pairs(
        docs, window=40, stride=40, gram_k=3, threshold_ppm=600_000)


Q104_SQL = """
WITH w AS (
  SELECT DISTINCT doc_id, substring(text, s, 40) AS win
  FROM (SELECT doc_id, text,
               unnest(range(1, len(text) - 38, 40)) AS s
        FROM documents)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id
),
g AS (
  SELECT doc_id,
         list_distinct([substring(text, i, 3)
                        for i in generate_series(1, len(text) - 2)]) AS grams
  FROM documents
)
SELECT p.id_a, p.id_b,
       CAST((1000000 * len(list_intersect(ga.grams, gb.grams))) //
            (len(ga.grams) + len(gb.grams)
             - len(list_intersect(ga.grams, gb.grams))) AS BIGINT)
         AS jaccard_ppm
FROM pairs p
JOIN g ga ON ga.doc_id = p.id_a
JOIN g gb ON gb.doc_id = p.id_b
WHERE (1000000 * len(list_intersect(ga.grams, gb.grams))) //
      (len(ga.grams) + len(gb.grams)
       - len(list_intersect(ga.grams, gb.grams))) >= 600000
"""


def q105_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means clustering of the embedding
    column, then greedy cosine near-dup marking WITHIN each cluster —
    the quadratic pass confined to one cluster at a time.  Deterministic
    (bit-stable k-means fold, id-ordered greedy scan) but iterative +
    model-state-driven, so rows-only: pinned by the sf0.001 golden hash
    instead of a SQL oracle."""
    from ..stages.similarity import semdedup

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup(emb, k=8, threshold_ppm=970_000)


def q106_dedup_rewrite(sf_dir: str):
    """Chunk-level exact-substring dedup REWRITE (Lee et al. 2022): every
    duplicated 40-char tiling chunk is removed from every doc except its
    canonical (min doc_id, min offset) occurrence, and each doc's text is
    rebuilt — the actual transformation, where q102/q103 only flag.  Two
    bounded shuffles; compared by rebuilt-text md5."""
    from ..stages.substring import dedup_rewrite_docs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup_rewrite_docs(docs, window=40)


Q106_SQL = """
WITH c AS (
  SELECT doc_id, s, substring(text, s, 40) AS win
  FROM (SELECT doc_id, text,
               unnest(range(1, len(text) - 38, 40)) AS s
        FROM documents)
),
k AS (
  SELECT doc_id, s, win,
         count(*) OVER (PARTITION BY win) AS cnt,
         row_number() OVER (PARTITION BY win ORDER BY doc_id, s) AS rn
  FROM c
),
agg AS (
  SELECT doc_id,
         string_agg(win, '' ORDER BY s) FILTER (WHERE cnt = 1 OR rn = 1)
           AS body,
         count(*) FILTER (WHERE cnt > 1 AND rn > 1) AS n_removed
  FROM k GROUP BY doc_id
),
tails AS (
  SELECT doc_id, substring(text, (len(text) // 40) * 40 + 1) AS tail
  FROM documents
)
SELECT t.doc_id,
       md5(coalesce(a.body, '') || t.tail) AS text_md5,
       CAST(len(coalesce(a.body, '')) + len(t.tail) AS BIGINT) AS new_len,
       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed
FROM tails t LEFT JOIN agg a ON t.doc_id = a.doc_id
"""


def q107_pii_redact(sf_dir: str):
    """Pattern redaction (the PII-scrub shape): RE2 regexes applied in
    order via Arrow compute kernels — the same regex engine DuckDB binds,
    so the nested regexp_replace oracle is engine-exact.  The registry
    instance scrubs two corpus-hitting patterns (the synthetic corpus has
    no real PII; `stages.redact.DEFAULT_PII_PATTERNS` is the production
    set); compared by redacted-text md5 + per-doc hit count."""
    from ..stages.redact import redact_text

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return redact_text(docs, patterns=[
        (r"\bcustomer\b", "[CUST]"),
        (r"\b(spark|hash)\b", "[TOOL]"),
    ])


Q107_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\bcustomer\\b'))
            + len(regexp_extract_all(
                regexp_replace(text, '\\bcustomer\\b', '[CUST]', 'g'),
                '\\b(spark|hash)\\b')) AS BIGINT) AS n_redactions,
       md5(regexp_replace(
             regexp_replace(text, '\\bcustomer\\b', '[CUST]', 'g'),
             '\\b(spark|hash)\\b', '[TOOL]', 'g')) AS redacted_md5
FROM documents
"""


def q108_inverted_index(sf_dir: str):
    """Corpus inverted index: (token, df, capped ascending postings) in
    ONE bounded token-hash shuffle — df exact, postings capped at 10 so
    stopword hub tokens emit bounded rows.  Tokenization = the q25
    contract (split on single space, empties kept)."""
    from ..stages.text_analysis import inverted_index

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return inverted_index(docs, postings_cap=10)


Q108_SQL = """
WITH t AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
r AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY token) AS df
  FROM t
)
SELECT token, CAST(max(df) AS BIGINT) AS df,
       string_agg(doc_id, ',' ORDER BY doc_id) FILTER (WHERE rn <= 10)
         AS postings
FROM r GROUP BY token
"""


def q110_containment_pairs(sf_dir: str):
    """Max-containment near-dup pairs (inter/min instead of Jaccard's
    inter/union): catches SUBSET duplication Jaccard dilutes — a licence
    block or boilerplate snippet embedded verbatim inside a much larger
    doc scores ~1.0 containment but near-zero Jaccard.  Same window-
    blocked candidate generation as q104; only the scoring metric (and
    threshold semantics) differ."""
    from ..stages.substring import window_blocked_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return window_blocked_jaccard_pairs(
        docs, window=40, stride=40, gram_k=3, threshold_ppm=600_000,
        metric="containment")


Q110_SQL = """
WITH w AS (
  SELECT DISTINCT doc_id, substring(text, s, 40) AS win
  FROM (SELECT doc_id, text,
               unnest(range(1, len(text) - 38, 40)) AS s
        FROM documents)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id
),
g AS (
  SELECT doc_id,
         list_distinct([substring(text, i, 3)
                        for i in generate_series(1, len(text) - 2)]) AS grams
  FROM documents
)
SELECT p.id_a, p.id_b,
       CAST((1000000 * len(list_intersect(ga.grams, gb.grams))) //
            least(len(ga.grams), len(gb.grams)) AS BIGINT)
         AS containment_ppm
FROM pairs p
JOIN g ga ON ga.doc_id = p.id_a
JOIN g gb ON gb.doc_id = p.id_b
WHERE least(len(ga.grams), len(gb.grams)) > 0
  AND (1000000 * len(list_intersect(ga.grams, gb.grams))) //
      least(len(ga.grams), len(gb.grams)) >= 600000
"""


def q111_incremental_dedup(sf_dir: str):
    """Incremental snapshot-over-state exact dedup: even-doc_id docs play
    the already-accepted corpus (committed as the bootstrap snapshot into
    a fresh bucketed state dir), odd-doc_id docs the arriving snapshot.
    Output = the new snapshot's verdict table (status: dup_of_state /
    unique / dup_in_snapshot, keeper_id).  Shuffle cost is O(snapshot) —
    the state is read pre-bucketed from disk, never reshuffled."""
    import tempfile

    import pyarrow.compute as _pc

    from ..state.snapshot_dedup import incremental_exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    base = docs.map_batches(
        lambda b: b.filter(_pc.equal(_pc.bit_wise_and(b.column("doc_id"), 1), 0)),
        batch_format="pyarrow")
    snap = docs.map_batches(
        lambda b: b.filter(_pc.equal(_pc.bit_wise_and(b.column("doc_id"), 1), 1)),
        batch_format="pyarrow")
    state_dir = tempfile.mkdtemp(prefix="snapdedup_", dir="/tmp")
    try:
        incremental_exact_dedup(base, state_dir, snapshot_id="base")
        return incremental_exact_dedup(
            snap, state_dir, snapshot_id="day1").to_pandas()
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


Q111_SQL = """
WITH seen AS (
  SELECT md5(text) AS h, min(doc_id) AS keeper
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
),
new AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1
),
m AS (
  SELECT n.doc_id, s.keeper AS state_keeper,
         min(n.doc_id) OVER (PARTITION BY n.h) AS snap_min
  FROM new n LEFT JOIN seen s ON n.h = s.h
)
SELECT doc_id,
       CASE WHEN state_keeper IS NOT NULL THEN 'dup_of_state'
            WHEN doc_id = snap_min THEN 'unique'
            ELSE 'dup_in_snapshot' END AS status,
       CAST(coalesce(state_keeper, snap_min) AS BIGINT) AS keeper_id
FROM m
"""


def q112_incremental_lsh(sf_dir: str):
    """Incremental MinHash-LSH NEAR-dup dedup against persisted band-
    bucket state — q111's near-dup sibling: even-doc_id docs bootstrap
    the accepted-corpus LSH state, odd-doc_id docs arrive as the day-1
    snapshot; output = the snapshot's verdict table.  State is read
    pre-bucketed from disk (never reshuffled); rows-only (MinHash has no
    SQL equivalent), pinned by the sf0.001 golden hash."""
    import tempfile

    import pyarrow.compute as _pc

    from ..state.snapshot_dedup import incremental_lsh_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    base = docs.map_batches(
        lambda b: b.filter(_pc.equal(_pc.bit_wise_and(b.column("doc_id"), 1), 0)),
        batch_format="pyarrow")
    snap = docs.map_batches(
        lambda b: b.filter(_pc.equal(_pc.bit_wise_and(b.column("doc_id"), 1), 1)),
        batch_format="pyarrow")
    state_dir = tempfile.mkdtemp(prefix="snaplsh_", dir="/tmp")
    try:
        incremental_lsh_dedup(base, state_dir, snapshot_id="base")
        return incremental_lsh_dedup(
            snap, state_dir, snapshot_id="day1").to_pandas()
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def q113_range_store(sf_dir: str):
    """Clustered-storage round trip: events written range-partitioned by
    ts (sources/range_store.py — sampled boundaries, no global sort,
    manifest written last), then a 10-day window read back PRUNED (only
    overlapping range_id dirs are listed) + exact residual filter, and
    counted per event_type.  The oracle is the plain SQL window count —
    boundary placement affects pruning efficiency only, never rows."""
    import tempfile

    from ..sources.range_store import read_key_range, write_range_partitioned

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    store = tempfile.mkdtemp(prefix="rangestore_", dir="/tmp")
    try:
        write_range_partitioned(ev, store, key="ts", num_ranges=8)
        win = read_key_range(store, "2024-01-10", "2024-01-20",
                             columns=["event_type"])
        out = _preagg(win, ["event_type"], {"n": ("event_type", "count")})
    finally:
        shutil.rmtree(store, ignore_errors=True)
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


Q113_SQL = """
SELECT event_type, count(*) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
GROUP BY event_type
ORDER BY event_type
"""


def q114_k_hop_reachability(sf_dir: str):
    """Min-hop BFS within 3 hops over the part<->supplier co-supply
    graph (signed bipartite node encoding: part p -> p, supplier s ->
    -s), seeded at parts with l_partkey % 100 = 0 — the iterative
    semi-naive traversal (recursive-CTE equivalent) Ray Data has no
    primitive for.  Per hop only the FRONTIER joins the edges; no node
    set is broadcast or collected — strategy="join" pinned explicitly:
    this entry showcases the unbounded-graph path (the auto broadcast
    fast path has its own coverage in q230/q231/q237).  Oracle: DuckDB
    WITH RECURSIVE."""
    from ..stages.graph import k_hop_reachability

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def both_dirs(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().drop_duplicates()  # per-batch combiner
        p = df["l_partkey"].to_numpy("int64")
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        s = -(df["l_suppkey"].to_numpy("int64") + 1)
        return pd.DataFrame({"src": np.concatenate([p, s]),
                             "dst": np.concatenate([s, p])})

    edges = (li.map_batches(both_dirs, batch_format="pyarrow")
             .groupby(["src", "dst"]).count().drop_columns(["count()"]))
    seeds = li.map_batches(
        lambda b: pd.DataFrame({"node": pd.unique(
            b.column("l_partkey").to_pandas()[
                (b.column("l_partkey").to_pandas() % 100 == 0)]
        ).astype("int64")}),
        batch_format="pyarrow")
    out = k_hop_reachability(edges, seeds, k=3,
                             strategy="join").to_pandas()
    out["hops"] = out["hops"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q114_SQL = """
WITH RECURSIVE
e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (SELECT p AS src, -(s + 1) AS dst FROM e
          UNION ALL SELECT -(s + 1), p FROM e),
reach(node, hops) AS (
  SELECT DISTINCT l_partkey, 0 FROM lineitem WHERE l_partkey % 100 = 0
  UNION
  SELECT ed.dst, r.hops + 1
  FROM reach r JOIN edges ed ON ed.src = r.node
  WHERE r.hops < 3
)
SELECT node, CAST(min(hops) AS BIGINT) AS hops
FROM reach GROUP BY node ORDER BY node
"""


def q109_compression_signal(sf_dir: str):
    """Per-doc zlib compression-ratio quality signal (integer ppm) — the
    dependency-free boilerplate/noise detector of web-corpus filters.
    zlib output has no SQL equivalent, so rows-only: pinned by the
    sf0.001 golden hash + a direct-zlib parity test."""
    from ..stages.text_analysis import compression_signal

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return compression_signal(docs)


def q115_copurchase_triangles(sf_dir: str):
    """Triangle census over the part co-purchase KG (edges: part pairs
    sharing >= 2 distinct orders): per-node triangle counts — the
    community-structure primitive of KG construction.  Edge build is the
    in-group pair generator (no self-join, stages/graph.py
    cooccurrence_edges); closure is wedge-gen + ONE two-key native hash
    join (stages/graph.py triangle_counts)."""
    from ..stages.graph import cooccurrence_edges, triangle_counts

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_count=2)
    out = triangle_counts(edges, src="a", dst="b").to_pandas()
    out["node"] = out["node"].astype("int64")
    out["triangles"] = out["triangles"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q115_SQL = """
WITH e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(DISTINCT a.l_orderkey) >= 2
),
tri AS (
  SELECT e1.p1 AS x, e1.p2 AS y, e2.p2 AS z
  FROM e e1
  JOIN e e2 ON e1.p1 = e2.p1 AND e1.p2 < e2.p2
  JOIN e e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS triangles
FROM corners GROUP BY node ORDER BY node
"""


def q116_supplier_jaccard_topk(sf_dir: str, k: int = 50):
    """Entity-similarity scoring for KG alignment: top-k supplier pairs by
    neighborhood Jaccard (shared-part overlap / union), as integer ppm so
    both engines agree bit-for-bit.  Co-counts come from the in-group
    pair generator; degrees from one grouped count; degrees attach via
    two native hash joins (suppliers are unbounded in principle — no
    broadcast of the degree table); top-k is a per-batch combiner +
    driver merge on bounded k.  Ties break on (ppm desc, s1, s2)."""
    from ..stages.graph import _tag_int_bucket, cooccurrence_edges
    from ..stages.joins import coalesce_for_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    co = cooccurrence_edges(li, "l_partkey", "l_suppkey", min_count=1)

    # degree = distinct parts per supplier: local distinct combiner ->
    # one supplier-bucketed shuffle finishing distinct + count (coarse
    # buckets, not a group per supplier)
    def dloc(b: pa.Table) -> pd.DataFrame:
        return _tag_int_bucket(
            b.to_pandas().drop_duplicates(), "l_suppkey", 32)

    def dcount(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_partkey", "l_suppkey"]].drop_duplicates()
        out = (d.groupby("l_suppkey", sort=False).size()
               .reset_index(name="d"))
        out.columns = ["s", "d"]
        out["d"] = out["d"].astype("int64")
        return out

    deg = (li.map_batches(dloc, batch_format="pyarrow")
           .groupby("_bucket").map_groups(dcount, batch_format="pandas"))

    try:
        nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    except Exception:
        nparts = 2
    deg = coalesce_for_join(deg, nparts)
    j1 = coalesce_for_join(co, nparts).join(
        deg, join_type="inner", num_partitions=nparts,
        on=("a",), right_on=("s",),
    ).rename_columns({"d": "d1"})
    j2 = coalesce_for_join(j1, nparts).join(
        deg, join_type="inner", num_partitions=nparts,
        on=("b",), right_on=("s",),
    ).rename_columns({"d": "d2"})

    def topk_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        inter = df["n"].to_numpy("int64")
        union = df["d1"].to_numpy("int64") + df["d2"].to_numpy("int64") - inter
        df["jaccard_ppm"] = (1_000_000 * inter) // union
        df = df.sort_values(["jaccard_ppm", "a", "b"],
                            ascending=[False, True, True], kind="stable")
        return df[["a", "b", "jaccard_ppm"]].head(k).rename(
            columns={"a": "s1", "b": "s2"})

    parts = j2.map_batches(topk_partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["jaccard_ppm", "s1", "s2"],
                            ascending=[False, True, True],
                            kind="stable").head(k)
    for c in ("s1", "s2", "jaccard_ppm"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


Q116_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
deg AS (SELECT s, count(*) AS d FROM ps GROUP BY s),
co AS (
  SELECT a.s AS s1, b.s AS s2, count(*) AS n
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
  GROUP BY 1, 2
)
SELECT co.s1, co.s2,
       CAST((1000000 * co.n) // (d1.d + d2.d - co.n) AS BIGINT) AS jaccard_ppm
FROM co JOIN deg d1 ON d1.s = co.s1 JOIN deg d2 ON d2.s = co.s2
ORDER BY jaccard_ppm DESC, co.s1, co.s2
LIMIT 50
"""


def q117_ontology_entail(sf_dir: str):
    """RDFS subClassOf entailment materialization (rdfs9): the part
    catalog's brand -> manufacturer -> 'ALL' hierarchy is closed
    driver-side (ontology = bounded schema side), broadcast once, and
    every instance-type assertion expands to its entailed ancestors in a
    streaming map_batches — instances unbounded, zero shuffle for the
    entailment itself.  Output: per entailed class, distinct-instance
    count (two-phase grouped distinct, cf. q44).  The manufacturer level
    is derived from the brand code (Brand#1-5 -> Manufacturer#1, ...,
    the TPC-H brand/mfgr relation) since the table carries only the
    brand.  Oracle: recursive CTE over the same hierarchy."""
    from ..stages.graph import entail_types

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    def subedges(batch: pa.Table) -> pd.DataFrame:
        brands = pd.Series(pd.unique(batch.column("p_brand").to_pandas()))
        mfgr = ("Manufacturer#"
                + ((brands.str[6:].astype(int) - 1) // 5 + 1).astype(str))
        e1 = pd.DataFrame({"child": brands, "parent": mfgr})
        e2 = pd.DataFrame({"child": mfgr.drop_duplicates()})
        e2["parent"] = "ALL"
        return pd.concat([e1, e2], ignore_index=True)

    sub = (part.map_batches(subedges, batch_format="pyarrow")
           .to_pandas().drop_duplicates())  # bounded ontology side

    inst = part.map_batches(
        lambda b: b.select(["p_partkey", "p_brand"]).rename_columns(
            ["inst", "cls"]),
        batch_format="pyarrow")
    entailed = entail_types(inst, sub)

    # distinct (cls, inst) then count per cls — instances unbounded, so
    # the distinct pass is a Ray grouped fold, not a driver set
    dist = entailed.groupby(["cls", "inst"]).count().drop_columns(["count()"])
    out = dist.groupby("cls").count().to_pandas()
    out.columns = ["class", "n_instances"]
    out["n_instances"] = out["n_instances"].astype("int64")
    return out.sort_values("class").reset_index(drop=True)


Q117_SQL = """
WITH RECURSIVE bm AS (
  SELECT DISTINCT p_brand,
         'Manufacturer#' ||
         CAST((CAST(substr(p_brand, 7) AS INT) - 1) // 5 + 1 AS VARCHAR)
         AS p_mfgr
  FROM part
),
sub AS (
  SELECT p_brand AS child, p_mfgr AS parent FROM bm
  UNION
  SELECT DISTINCT p_mfgr, 'ALL' FROM bm
),
clos(child, anc) AS (
  SELECT child, child FROM (SELECT DISTINCT child FROM sub)
  UNION
  SELECT c.child, s.parent FROM clos c JOIN sub s ON s.child = c.anc
)
SELECT c.anc AS class,
       CAST(count(DISTINCT p.p_partkey) AS BIGINT) AS n_instances
FROM part p JOIN clos c ON c.child = p.p_brand
GROUP BY 1 ORDER BY 1
"""


def q118_reciprocal_best_match(sf_dir: str):
    """Entity-alignment by mutual best match: keep (part, supplier) pairs
    where the supplier is the part's top supplier by total shipped
    quantity AND the part is that supplier's top part — the reciprocal-
    nearest-neighbor rule of alignment pipelines.  Weights: one grouped
    sum over (part, supplier) [unbounded keys -> Ray merge]; each side's
    argmax is a per-batch best-row combiner + grouped fold (max is
    associative on the packed (qty, -key) order); mutuality is an inner
    join of the two winner sets on the pair.  Shuffle plan: part-bucketed
    sum pass that ALSO emits the per-part winners (one exchange does
    both), one supplier-bucketed argmax pass, one native join — coarse
    buckets throughout (no per-key map_groups)."""
    from ..stages.graph import _tag_int_bucket
    from ..stages.joins import coalesce_for_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        # quantities are integral; int64 sums make the argmax exact (no
        # float fold-order ulp divergence vs the oracle)
        df["l_quantity"] = df["l_quantity"].astype("int64")
        out = (df.groupby(["l_partkey", "l_suppkey"], sort=False)
               .agg(qty=("l_quantity", "sum")).reset_index())
        return _tag_int_bucket(out, "l_partkey", 32)

    def _argmax(df: pd.DataFrame, by: str, other: str) -> pd.DataFrame:
        # max qty, ties -> min counterpart key
        df = df.sort_values([by, "qty", other],
                            ascending=[True, False, True], kind="stable")
        return df.drop_duplicates(subset=[by], keep="first")

    def fold_and_best_p(g: pd.DataFrame) -> pd.DataFrame:
        w = (g.groupby(["l_partkey", "l_suppkey"], sort=False)["qty"]
             .sum().reset_index())
        # marker rows: _kind=0 full sums (feed the supplier-side argmax),
        # _kind=1 the per-part winners — one shuffle serves both outputs
        bp = _argmax(w, "l_partkey", "l_suppkey").assign(_kind=1)
        return pd.concat([w.assign(_kind=0), bp], ignore_index=True)

    both = (li.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(fold_and_best_p, batch_format="pandas")
            .materialize())

    def split(kind: int):
        return both.map_batches(
            lambda b, _k=kind: b.filter(pc.equal(b.column("_kind"), _k))
            .drop_columns(["_kind"]),
            batch_format="pyarrow")

    def tag_s(b: pa.Table) -> pd.DataFrame:
        return _tag_int_bucket(b.to_pandas(), "l_suppkey", 32)

    best_p_per_s = (split(0).map_batches(tag_s, batch_format="pyarrow")
                    .groupby("_bucket")
                    .map_groups(lambda g: _argmax(
                        g, "l_suppkey", "l_partkey"), batch_format="pandas")
                    .drop_columns(["_bucket", "qty"]))
    best_s_per_p = split(1).drop_columns(["qty"])

    try:
        nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    except Exception:
        nparts = 2
    mutual = coalesce_for_join(best_s_per_p, nparts).join(
        coalesce_for_join(best_p_per_s, nparts),
        join_type="inner", num_partitions=nparts,
        on=("l_partkey", "l_suppkey"),
    )
    out = mutual.to_pandas()
    out = out[["l_partkey", "l_suppkey"]].astype("int64")
    return out.sort_values("l_partkey").reset_index(drop=True)


Q118_SQL = """
WITH w AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem GROUP BY 1, 2
),
bp AS (
  SELECT l_partkey, l_suppkey FROM (
    SELECT l_partkey, l_suppkey,
           row_number() OVER (PARTITION BY l_partkey
                              ORDER BY qty DESC, l_suppkey) AS rn
    FROM w) WHERE rn = 1
),
bs AS (
  SELECT l_partkey, l_suppkey FROM (
    SELECT l_partkey, l_suppkey,
           row_number() OVER (PARTITION BY l_suppkey
                              ORDER BY qty DESC, l_partkey) AS rn
    FROM w) WHERE rn = 1
)
SELECT bp.l_partkey, bp.l_suppkey
FROM bp JOIN bs ON bp.l_partkey = bs.l_partkey
               AND bp.l_suppkey = bs.l_suppkey
ORDER BY bp.l_partkey
"""


def q119_entity_resolution(sf_dir: str):
    """End-to-end entity resolution: multi-pass blocking (two independent
    blocking keys) -> star edges -> connected components -> canonical
    entity id per record.  Star topology (each record links to its block's
    min id) keeps edge count LINEAR in records — never the C(d,2)
    all-pairs blowup — and chains across blocks exactly like pairwise
    edges would (same components).  Blocks come from one coarse-bucketed
    shuffle per key (32 Ray groups, vectorized per-block min inside);
    components use stages/dedup.py connected_components (driver fixpoint
    here — edges are O(records); at cluster scale flip distributed=True,
    the q58 path); singletons keep their own id via a grouped-min union
    fold, not a driver fill.  Oracle: recursive-CTE reachability with
    min-id components."""
    import zlib

    from ..stages.dedup import connected_components

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"])

    def keyed(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        k1 = (df["c_nationkey"].astype(str) + "|" + df["c_mktsegment"])
        k2 = "bal|" + pd.Series(
            np.floor(df["c_acctbal"].to_numpy("float64") / 10)
            .astype("int64")).astype(str)
        out = pd.concat([
            pd.DataFrame({"key": k1, "id": df["c_custkey"]}),
            pd.DataFrame({"key": k2, "id": df["c_custkey"]}),
        ], ignore_index=True)
        out["_bucket"] = out["key"].map(
            lambda k: zlib.crc32(k.encode()) % 32).astype("int32")
        return out

    def star_edges(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["key", "id"], kind="stable")
        m = df.groupby("key", sort=False)["id"].transform("min")
        e = df[df["id"] > m]
        return pd.DataFrame({"left_id": m[df["id"] > m].to_numpy("int64"),
                             "right_id": e["id"].to_numpy("int64")})

    edges = (cust.map_batches(keyed, batch_format="pyarrow")
             .groupby("_bucket").map_groups(star_edges,
                                            batch_format="pandas"))
    labels = connected_components(edges, max_iterations=30)
    labels_arrow = labels.map_batches(
        lambda b: pa.table({"node": b.column("node").cast(pa.int64()),
                            "entity_id": b.column("component")
                            .cast(pa.int64())}),
        batch_format="pyarrow")
    selfrows = cust.map_batches(
        lambda b: pa.table({"node": b.column("c_custkey").cast(pa.int64()),
                            "entity_id": b.column("c_custkey")
                            .cast(pa.int64())}),
        batch_format="pyarrow")
    out = (labels_arrow.union(selfrows).groupby("node").min("entity_id")
           .to_pandas())
    out.columns = ["c_custkey", "entity_id"]
    out = out.astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


Q119_SQL = """
WITH RECURSIVE c AS (
  SELECT c_custkey,
         CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS k1,
         'bal|' || CAST(CAST(floor(c_acctbal / 10) AS BIGINT) AS VARCHAR)
         AS k2
  FROM customer
),
e1 AS (SELECT min(c_custkey) OVER (PARTITION BY k1) AS a, c_custkey AS b
       FROM c),
e2 AS (SELECT min(c_custkey) OVER (PARTITION BY k2) AS a, c_custkey AS b
       FROM c),
e AS (SELECT a, b FROM e1 WHERE a < b
      UNION SELECT a, b FROM e2 WHERE a < b),
ud AS (SELECT a AS s, b AS t FROM e UNION SELECT b, a FROM e),
reach(s, t) AS (
  SELECT c_custkey, c_custkey FROM c
  UNION
  SELECT r.s, u.t FROM reach r JOIN ud u ON u.s = r.t
)
SELECT s AS c_custkey, CAST(min(t) AS BIGINT) AS entity_id
FROM reach GROUP BY s ORDER BY s
"""


def q120_min_cost_reach(sf_dir: str):
    """Weighted min-cost reachability within 3 hops (bounded Bellman-Ford)
    over the signed part<->supplier graph of q114, edge weight = lineitem
    count per (part, supplier) pair — the cheapest-path generalization of
    BFS (stages/graph.py:k_hop_min_cost: semi-naive, improvement-only
    frontier, one join + one grouped-min fold per hop).  Oracle: the
    min-fold unrolled per hop in plain CTEs (r1/r2/r3), which is exactly
    round-bounded Bellman-Ford — no recursive path enumeration, so no
    state explosion."""
    from ..stages.graph import k_hop_min_cost

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def wedges(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        out = (df.groupby(["l_partkey", "l_suppkey"], sort=False)
               .size().reset_index(name="w"))
        p = out["l_partkey"].to_numpy("int64")
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        s = -(out["l_suppkey"].to_numpy("int64") + 1)
        w = out["w"].to_numpy("int64")
        return pd.DataFrame({"src": np.concatenate([p, s]),
                             "dst": np.concatenate([s, p]),
                             "w": np.concatenate([w, w])})

    # per-batch partial counts -> one grouped sum = exact pair weights
    edges = (li.map_batches(wedges, batch_format="pyarrow")
             .groupby(["src", "dst"]).sum("w")
             .map_batches(lambda b: b.rename_columns(["src", "dst", "w"]),
                          batch_format="pyarrow"))
    seeds = li.map_batches(
        lambda b: pd.DataFrame({"node": pd.unique(
            b.column("l_partkey").to_pandas()[
                (b.column("l_partkey").to_pandas() % 100 == 0)]
        ).astype("int64")}),
        batch_format="pyarrow")
    out = k_hop_min_cost(edges, seeds, k=3).to_pandas()
    out = out.astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q120_SQL = """
WITH e0 AS (
  SELECT l_partkey AS p, l_suppkey AS s, count(*) AS w
  FROM lineitem GROUP BY 1, 2
),
edges AS MATERIALIZED (SELECT p AS src, -(s + 1) AS dst, w FROM e0
          UNION ALL SELECT -(s + 1), p, w FROM e0),
s0 AS (SELECT DISTINCT l_partkey AS node, CAST(0 AS BIGINT) AS cost
       FROM lineitem WHERE l_partkey % 100 = 0),
r1 AS MATERIALIZED (SELECT node, min(cost) AS cost FROM (
         SELECT node, cost FROM s0
         UNION ALL
         SELECT e.dst, s0.cost + e.w FROM s0 JOIN edges e ON e.src = s0.node
       ) GROUP BY node),
r2 AS MATERIALIZED (SELECT node, min(cost) AS cost FROM (
         SELECT node, cost FROM r1
         UNION ALL
         SELECT e.dst, r1.cost + e.w FROM r1 JOIN edges e ON e.src = r1.node
       ) GROUP BY node),
r3 AS MATERIALIZED (SELECT node, min(cost) AS cost FROM (
         SELECT node, cost FROM r2
         UNION ALL
         SELECT e.dst, r2.cost + e.w FROM r2 JOIN edges e ON e.src = r2.node
       ) GROUP BY node)
SELECT node, CAST(cost AS BIGINT) AS cost FROM r3 ORDER BY node
"""


def q121_negative_sampling(sf_dir: str):
    """KG-embedding training-set negative sampling over the customer->
    order positive pairs: 3 deterministic modular corruptions per
    positive, accidental true pairs removed by a SHUFFLE anti-join (the
    true-pair set is O(corpus) — never broadcast;
    stages/graph.py:negative_sample_pairs).  Output: negative count per
    s % 97 residue (bounded 97 keys -> combiner + driver merge), which
    pins the full multiset without shipping it."""
    from ..stages.graph import negative_sample_pairs

    pos = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    neg = negative_sample_pairs(pos, "o_custkey", "o_orderkey", k=3)

    def modcount(batch: pa.Table) -> pd.DataFrame:
        s = batch.column("s").to_numpy().astype("int64") % 97
        mod, cnt = np.unique(s, return_counts=True)
        return pd.DataFrame({"s_mod": mod,
                             "n_negatives": cnt.astype("int64")})

    parts = neg.map_batches(modcount, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["s_mod", "n_negatives"],
                              kind="stable").reset_index(drop=True)
    out = (parts.groupby("s_mod", sort=False)["n_negatives"].sum()
           .reset_index())
    out = out.astype("int64")
    return out.sort_values("s_mod").reset_index(drop=True)


Q121_SQL = """
WITH pos AS (SELECT o_custkey AS s, o_orderkey AS o FROM orders),
m AS (SELECT max(o) + 1 AS mo FROM pos),
cand AS (
  SELECT s, (o + j * 2654435761) % mo AS o2
  FROM pos, m, (VALUES (1), (2), (3)) AS t(j)
),
neg AS (
  SELECT c.s, c.o2 FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM pos p WHERE p.s = c.s AND p.o = c.o2)
)
SELECT s % 97 AS s_mod, CAST(count(*) AS BIGINT) AS n_negatives
FROM neg GROUP BY 1 ORDER BY 1
"""


def q122_pathsim_topk(sf_dir: str, k: int = 40):
    """Metapath similarity (PathSim, Sun et al. 2011) over the
    part-supplier-part metapath with lineitem counts as edge
    multiplicities: sim(a, b) = 2*paths(a,b) / (paths(a,a)+paths(b,b))
    where paths(a, b) = sum_s n_as * n_bs — i.e. one row-pair block of
    the sparse A@A^T product.  The inner product is computed INSIDE the
    supplier-bucketed shuffle (each supplier's parts multiply locally,
    partial products summed in a pair-bucketed second pass — the
    cooccurrence_edges shape with a product payload); self-path norms
    paths(a,a) ride the same first pass.  Integer ppm; top-k by
    (ppm desc, a, b) via per-batch combiner + driver merge."""
    from ..stages.graph import _group_slices, _tag_int_bucket
    from ..stages.joins import coalesce_for_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    n_buckets = 32

    def pair_counts(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        out = (df.groupby(["l_suppkey", "l_partkey"], sort=False)
               .size().reset_index(name="n"))
        return _tag_int_bucket(out, "l_suppkey", n_buckets)

    def products(g: pd.DataFrame) -> pd.DataFrame:
        # finish the (supplier, part) count fold, then emit per-supplier
        # cross products n_as * n_bs for a <= b (a == b rows are the
        # self-path norms)
        w = (g.groupby(["l_suppkey", "l_partkey"], sort=False)["n"]
             .sum().reset_index()
             .sort_values(["l_suppkey", "l_partkey"], kind="stable"))
        sk = w["l_suppkey"].to_numpy("int64")
        pk = w["l_partkey"].to_numpy("int64")
        n = w["n"].to_numpy("int64")
        aa, bb, pp = [], [], []
        for s, e in _group_slices(sk):
            d = e - s
            iu = np.triu_indices(d, k=0)  # k=0 keeps the diagonal (norms)
            aa.append(pk[s:e][iu[0]])
            bb.append(pk[s:e][iu[1]])
            pp.append(n[s:e][iu[0]] * n[s:e][iu[1]])
        out = pd.DataFrame({"a": np.concatenate(aa),
                            "b": np.concatenate(bb),
                            "p": np.concatenate(pp)})
        out = (out.groupby(["a", "b"], sort=False)["p"].sum()
               .reset_index())
        return _tag_int_bucket(out, "a", n_buckets)

    def sum_products(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["a", "b"], sort=False)["p"].sum()
                .reset_index())

    paths = (li.map_batches(pair_counts, batch_format="pyarrow")
             .groupby("_bucket").map_groups(products, batch_format="pandas")
             .groupby("_bucket").map_groups(sum_products,
                                            batch_format="pandas")
             .materialize())  # two consumers below (norms + pairs)

    def norms_only(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("a"), b.column("b"))
        t = b.filter(m)
        return pa.table({"node": t.column("a"), "norm": t.column("p")})

    def pairs_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b.column("a"), b.column("b")))

    norms = paths.map_batches(norms_only, batch_format="pyarrow")
    pairs = paths.map_batches(pairs_only, batch_format="pyarrow")

    try:
        nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    except Exception:
        nparts = 2
    norms = coalesce_for_join(norms, nparts)
    j1 = coalesce_for_join(pairs, nparts).join(
        norms, join_type="inner", num_partitions=nparts,
        on=("a",), right_on=("node",),
    ).rename_columns({"norm": "na"})
    j2 = coalesce_for_join(j1, nparts).join(
        norms, join_type="inner", num_partitions=nparts,
        on=("b",), right_on=("node",),
    ).rename_columns({"norm": "nb"})

    def topk_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["pathsim_ppm"] = (2_000_000 * df["p"].to_numpy("int64")) // (
            df["na"].to_numpy("int64") + df["nb"].to_numpy("int64"))
        df = df.sort_values(["pathsim_ppm", "a", "b"],
                            ascending=[False, True, True], kind="stable")
        return df[["a", "b", "pathsim_ppm"]].head(k)

    parts = j2.map_batches(topk_partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["pathsim_ppm", "a", "b"],
                            ascending=[False, True, True],
                            kind="stable").head(k)
    out = out.astype("int64")
    return out.reset_index(drop=True)


Q122_SQL = """
WITH w AS (
  SELECT l_suppkey AS s, l_partkey AS p, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
paths AS (
  SELECT x.p AS a, y.p AS b, sum(x.n * y.n) AS pw
  FROM w x JOIN w y ON x.s = y.s AND x.p <= y.p
  GROUP BY 1, 2
),
norms AS (SELECT a AS node, pw AS norm FROM paths WHERE a = b)
SELECT pr.a, pr.b,
       CAST((2000000 * pr.pw) // (na.norm + nb.norm) AS BIGINT)
       AS pathsim_ppm
FROM paths pr
JOIN norms na ON na.node = pr.a
JOIN norms nb ON nb.node = pr.b
WHERE pr.a < pr.b
ORDER BY pathsim_ppm DESC, pr.a, pr.b
LIMIT 40
"""


def q123_walk_corpus(sf_dir: str):
    """Graph-embedding walk corpus: 3-step deterministic walks from parts
    with l_partkey % 20 = 0 over the signed part<->supplier graph
    (stages/graph.py:deterministic_walks — hash-argmin next hop, pure
    int64 arithmetic both engines replay; per step one frontier join +
    one walk-bucketed argmin fold).  Oracle: three unrolled
    row_number()-argmin joins."""
    from ..stages.graph import deterministic_walks

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def both_dirs(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().drop_duplicates()
        p = df["l_partkey"].to_numpy("int64")
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        s = -(df["l_suppkey"].to_numpy("int64") + 1)
        return pd.DataFrame({"src": np.concatenate([p, s]),
                             "dst": np.concatenate([s, p])})

    edges = (li.map_batches(both_dirs, batch_format="pyarrow")
             .groupby(["src", "dst"]).count().drop_columns(["count()"]))
    seeds = li.map_batches(
        lambda b: pd.DataFrame({"node": pd.unique(
            b.column("l_partkey").to_pandas()[
                (b.column("l_partkey").to_pandas() % 20 == 0)]
        ).astype("int64")}),
        batch_format="pyarrow")
    out = deterministic_walks(edges, seeds, length=3).to_pandas()
    out = out[["n0", "n1", "n2", "n3"]].astype("int64")
    return out.sort_values("n0").reset_index(drop=True)


Q123_SQL = """
WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (SELECT p AS src, -(s + 1) AS dst FROM e
          UNION ALL SELECT -(s + 1), p FROM e),
w0 AS (SELECT DISTINCT l_partkey AS n0 FROM lineitem
       WHERE l_partkey % 20 = 0),
s1 AS (SELECT n0, dst AS n1 FROM (
  SELECT w0.n0, ed.dst,
         row_number() OVER (PARTITION BY w0.n0 ORDER BY
           abs(ed.dst * 2654435761 + w0.n0 * 8191 + 1 * 524287)
           % 1000000007, ed.dst) AS rn
  FROM w0 JOIN edges ed ON ed.src = w0.n0) WHERE rn = 1),
s2 AS (SELECT n0, n1, dst AS n2 FROM (
  SELECT s1.n0, s1.n1, ed.dst,
         row_number() OVER (PARTITION BY s1.n0 ORDER BY
           abs(ed.dst * 2654435761 + s1.n1 * 8191 + 2 * 524287)
           % 1000000007, ed.dst) AS rn
  FROM s1 JOIN edges ed ON ed.src = s1.n1) WHERE rn = 1),
s3 AS (SELECT n0, n1, n2, dst AS n3 FROM (
  SELECT s2.n0, s2.n1, s2.n2, ed.dst,
         row_number() OVER (PARTITION BY s2.n0 ORDER BY
           abs(ed.dst * 2654435761 + s2.n2 * 8191 + 3 * 524287)
           % 1000000007, ed.dst) AS rn
  FROM s2 JOIN edges ed ON ed.src = s2.n2) WHERE rn = 1)
SELECT n0, n1, n2, n3 FROM s3 ORDER BY n0
"""


def q124_skipgram_pairs(sf_dir: str):
    """Skip-gram training pairs from the q123 walk corpus: every ordered
    (center, context) pair within window 2 over walk positions — the
    corpus -> training-examples step of embedding pipelines.  Pair
    emission is a per-batch vectorized unpivot (zero extra shuffle on
    top of the walk build); output = pair-count aggregate grouped by
    hop distance so the result stays bounded.  Oracle: UNION ALL of the
    position pairs over the same unrolled-walk CTEs."""
    walks = q123_walk_corpus(sf_dir)  # small driver df (seeded subset)
    ds = rd.from_pandas(walks)

    def pairs(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        cols = ["n0", "n1", "n2", "n3"]
        frames = []
        for i in range(4):
            for j in range(4):
                if i != j and abs(i - j) <= 2:
                    frames.append(pd.DataFrame({
                        "center": df[cols[i]].to_numpy("int64"),
                        "context": df[cols[j]].to_numpy("int64"),
                        "dist": np.full(len(df), abs(i - j), "int64")}))
        out = pd.concat(frames, ignore_index=True)
        return (out.groupby(["dist"], sort=False)
                .agg(n_pairs=("center", "size"),
                     sum_center=("center", "sum"),
                     sum_context=("context", "sum")).reset_index())

    parts = ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["dist", "n_pairs", "sum_center"],
                              kind="stable")
    out = (parts.groupby("dist", sort=False)
           .agg(n_pairs=("n_pairs", "sum"),
                sum_center=("sum_center", "sum"),
                sum_context=("sum_context", "sum")).reset_index())
    out = out.astype("int64")
    return out.sort_values("dist").reset_index(drop=True)


Q124_SQL = Q123_SQL.replace(
    "SELECT n0, n1, n2, n3 FROM s3 ORDER BY n0",
    """, pairs AS (
  SELECT n0 AS center, n1 AS context, 1 AS dist FROM s3
  UNION ALL SELECT n1, n0, 1 FROM s3
  UNION ALL SELECT n1, n2, 1 FROM s3
  UNION ALL SELECT n2, n1, 1 FROM s3
  UNION ALL SELECT n2, n3, 1 FROM s3
  UNION ALL SELECT n3, n2, 1 FROM s3
  UNION ALL SELECT n0, n2, 2 FROM s3
  UNION ALL SELECT n2, n0, 2 FROM s3
  UNION ALL SELECT n1, n3, 2 FROM s3
  UNION ALL SELECT n3, n1, 2 FROM s3
)
SELECT CAST(dist AS BIGINT) AS dist,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(center) AS BIGINT) AS sum_center,
       CAST(sum(context) AS BIGINT) AS sum_context
FROM pairs GROUP BY dist ORDER BY dist""")


def q125_snapshot_diff(sf_dir: str):
    """KG snapshot diff (CDC added/removed) between two sliding-window
    triple sets — (custkey, orderstatus) pairs observed in 1996-1998 vs
    1997-1999: rows in exactly one snapshot come back tagged
    added/removed via stages/joins.py:dataset_diff (both sides on ONE
    coarse-bucketed exchange, vectorized outer-merge kernel — no
    broadcast, no EXCEPT-style double shuffle).  Output: pair counts per
    (status, change)."""
    from ..stages.joins import dataset_diff

    def snap(lo: str, hi: str):
        ds = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderstatus", "o_orderdate"])
        return ds.map_batches(
            lambda b, _lo=lo, _hi=hi: b.filter(pc.and_(
                pc.greater_equal(b.column("o_orderdate"),
                                 pa.scalar(pd.Timestamp(_lo))),
                pc.less(b.column("o_orderdate"),
                        pa.scalar(pd.Timestamp(_hi)))))
            .select(["o_custkey", "o_orderstatus"]),
            batch_format="pyarrow")

    a = snap("1996-01-01", "1999-01-01")
    b = snap("1997-01-01", "2000-01-01")
    d = dataset_diff(a, b, ["o_custkey", "o_orderstatus"])
    out = _preagg(d, ["o_orderstatus", "change"],
                  {"n_pairs": ("o_custkey", "count")})
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return (out.sort_values(["o_orderstatus", "change"])
            .reset_index(drop=True))


Q125_SQL = """
WITH a AS (SELECT DISTINCT o_custkey, o_orderstatus FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1999-01-01'),
b AS (SELECT DISTINCT o_custkey, o_orderstatus FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '2000-01-01'),
added AS (SELECT *, 'added' AS change FROM
          (SELECT * FROM b EXCEPT SELECT * FROM a)),
removed AS (SELECT *, 'removed' AS change FROM
            (SELECT * FROM a EXCEPT SELECT * FROM b))
SELECT o_orderstatus, change, CAST(count(*) AS BIGINT) AS n_pairs
FROM (SELECT * FROM added UNION ALL SELECT * FROM removed)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q126_node_features(sf_dir: str):
    """KG node-feature assembly (the feature-engineering capstone over
    the co-purchase graph): per part its degree, triangle count and
    connected-component id, assembled WITHOUT joins — the three feature
    datasets ride one node-bucketed exchange (kind marker) and a
    vectorized in-bucket pivot fills triangles=0 for triangle-free
    nodes.  Edge set materialized once, consumed by all three feature
    passes.  Oracle: degree/triangle CTEs + recursive-CTE components,
    COALESCE for the fill."""
    from ..stages.dedup import connected_components
    from ..stages.graph import (_tag_int_bucket, cooccurrence_edges,
                                triangle_counts)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey",
                               min_count=2).materialize()

    def deg_partial(batch: pa.Table) -> pd.DataFrame:
        u = batch.column("a").to_numpy()
        v = batch.column("b").to_numpy()
        node, cnt = np.unique(np.concatenate([u, v]).astype("int64"),
                              return_counts=True)
        return pd.DataFrame({"node": node, "val": cnt.astype("int64"),
                             "kind": np.zeros(len(node), "int8")})

    deg = edges.map_batches(deg_partial, batch_format="pyarrow")
    tri = triangle_counts(edges).map_batches(
        lambda b: pd.DataFrame({
            "node": b.column("node").to_numpy().astype("int64"),
            "val": b.column("triangles").to_numpy().astype("int64"),
            "kind": np.ones(b.num_rows, "int8")}),
        batch_format="pyarrow")
    comp = connected_components(
        edges, max_iterations=40, left_col="a", right_col="b"
    ).map_batches(
        lambda b: pd.DataFrame({
            "node": b.column("node").to_numpy().astype("int64"),
            "val": b.column("component").to_numpy().astype("int64"),
            "kind": np.full(b.num_rows, 2, "int8")}),
        batch_format="pyarrow")

    def tagb(batch: pa.Table) -> pd.DataFrame:
        return _tag_int_bucket(batch.to_pandas(), "node", 32)

    allf = (deg.union(tri).union(comp)
            .map_batches(tagb, batch_format="pyarrow"))

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        # deg partials need a final sum (per-batch uniques can split);
        # tri/comp rows are already one per node
        d = (g[g["kind"] == 0].groupby("node", sort=False)["val"].sum()
             .reset_index().rename(columns={"val": "degree"}))
        t = (g[g["kind"] == 1].groupby("node", sort=False)["val"].sum()
             .reset_index().rename(columns={"val": "triangles"}))
        c = (g[g["kind"] == 2][["node", "val"]]
             .rename(columns={"val": "component"}))
        out = d.merge(t, on="node", how="left").merge(c, on="node",
                                                      how="left")
        out["triangles"] = out["triangles"].fillna(0).astype("int64")
        out["component"] = out["component"].astype("int64")
        return out

    out = (allf.groupby("_bucket").map_groups(assemble,
                                              batch_format="pandas")
           .to_pandas().astype("int64"))
    return out.sort_values("node").reset_index(drop=True)


Q126_SQL = """
WITH RECURSIVE li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(DISTINCT a.l_orderkey) >= 2
),
ud AS (SELECT p1 AS s, p2 AS t FROM e UNION SELECT p2, p1 FROM e),
deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS degree
        FROM ud GROUP BY s),
tri AS (
  SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
    SELECT e1.p1 AS node FROM e e1
      JOIN e e2 ON e1.p1 = e2.p1 AND e1.p2 < e2.p2
      JOIN e e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
    UNION ALL
    SELECT e1.p2 FROM e e1
      JOIN e e2 ON e1.p1 = e2.p1 AND e1.p2 < e2.p2
      JOIN e e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
    UNION ALL
    SELECT e2.p2 FROM e e1
      JOIN e e2 ON e1.p1 = e2.p1 AND e1.p2 < e2.p2
      JOIN e e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
  ) GROUP BY node
),
nodes AS (SELECT DISTINCT s FROM ud),
reach(s, t) AS (
  SELECT s, s FROM nodes
  UNION
  SELECT r.s, u.t FROM reach r JOIN ud u ON u.s = r.t
),
comp AS (SELECT s AS node, CAST(min(t) AS BIGINT) AS component
         FROM reach GROUP BY s)
SELECT deg.node, deg.degree,
       CAST(COALESCE(tri.triangles, 0) AS BIGINT) AS triangles,
       comp.component
FROM deg
LEFT JOIN tri ON tri.node = deg.node
JOIN comp ON comp.node = deg.node
ORDER BY deg.node
"""


def q127_kcore(sf_dir: str, k: int = 3, rounds: int = 4):
    """Bounded-round k-core peeling (k=3, 4 rounds) over the co-purchase
    graph — community-core extraction with fixed-round semantics both
    engines replay exactly (stages/graph.py:k_core_peel: per round one
    degree fold + two bucketed semi-join alive filters, alive set never
    broadcast).  Output: surviving (node, degree).  The registered
    oracle hardcodes k=3 / rounds=4."""
    from ..stages.graph import cooccurrence_edges, k_core_peel

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_count=2)
    out = k_core_peel(edges, k=k, rounds=rounds).to_pandas()
    out = out.astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def _q127_sql(k: int = 3, rounds: int = 4) -> str:
    head = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(DISTINCT a.l_orderkey) >= 2
)"""
    parts = [head]
    prev = "e0"
    for r in range(rounds):
        parts.append(f""",
d{r} AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
  SELECT p1 AS node FROM {prev} UNION ALL SELECT p2 FROM {prev})
  GROUP BY node),
a{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
e{r + 1} AS MATERIALIZED (SELECT e.p1, e.p2 FROM {prev} e
  JOIN a{r} x ON x.node = e.p1 JOIN a{r} y ON y.node = e.p2)""")
        prev = f"e{r + 1}"
    parts.append(f"""
SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
  SELECT p1 AS node FROM {prev} UNION ALL SELECT p2 FROM {prev})
GROUP BY node ORDER BY node""")
    return "".join(parts)


Q127_SQL = _q127_sql()


def q128_scd2_intervals(sf_dir: str):
    """SCD2 intervalization (gaps-and-islands): per user, consecutive
    runs of the same event_type collapse into validity intervals
    [valid_from, valid_to) with valid_to = next run's start (-1 sentinel
    for the open interval) — the dimension-history builder of KG/warehouse
    loads.  Per-key local computation on the keyed-window scaffold
    (stages/window.py:hash_bucketed_map_groups: ONE user-bucketed
    shuffle, vectorized shift/cumsum run collapse inside).  Timestamps
    flow as int64 epoch-us end to end (float64 mantissa is ~256 us
    coarse at this epoch — q113 lesson).  Users subset (% 50 = 0) keeps
    the compared output bounded; the kernel is per-user local, so the
    subset loses no generality."""
    from ..stages.window import hash_bucketed_map_groups

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type"])
    def subset(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy()
        return b.filter(pa.array(uid % 50 == 0))

    ev = ev.map_batches(subset, batch_format="pyarrow")

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, u in g.groupby("user_id", sort=False):
            u = u.sort_values(["ts", "event_id"], kind="stable")
            et = u["event_type"].to_numpy()
            # pin the unit before the int cast: pandas may carry ns or us
            ts = u["ts"].to_numpy("datetime64[us]").astype("int64")
            chg = np.r_[True, et[1:] != et[:-1]]
            starts = ts[chg]
            types = et[chg]
            ends = np.r_[starts[1:], np.int64(-1)]
            out.append(pd.DataFrame({
                "user_id": np.full(len(starts), uid, "int64"),
                "event_type": types,
                "valid_from": starts.astype("int64"),
                "valid_to": ends.astype("int64")}))
        if not out:
            return pd.DataFrame({"user_id": np.empty(0, "int64"),
                                 "event_type": np.empty(0, object),
                                 "valid_from": np.empty(0, "int64"),
                                 "valid_to": np.empty(0, "int64")})
        return pd.concat(out, ignore_index=True)

    res = hash_bucketed_map_groups(ev, "user_id", intervals).to_pandas()
    for c in ("user_id", "valid_from", "valid_to"):
        res[c] = res[c].astype("int64")
    return (res.sort_values(["user_id", "valid_from"])
            .reset_index(drop=True))


Q128_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS tsu
  FROM events WHERE user_id % 50 = 0
),
marked AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
runs AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                           ROWS UNBOUNDED PRECEDING) AS run
  FROM marked
),
iv AS (
  SELECT user_id, run, min(event_type) AS event_type,
         min(tsu) AS valid_from
  FROM runs GROUP BY user_id, run
)
SELECT user_id, event_type, valid_from,
       COALESCE(lead(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY valid_from), -1)
       AS valid_to
FROM iv ORDER BY user_id, valid_from
"""


def q129_embedding_quantize(sf_dir: str):
    """Scalar (int8-range) embedding quantization with EXACT cross-engine
    arithmetic — the vector-compression step of embedding stores: each
    float32 component is fixed-pointed (floor(x * 1e6) in float64, which
    numpy and SQL compute bit-identically), then min-max quantized to
    0..255 in pure integer math; per vector we report the quantization
    range, total absolute reconstruction error and a position-weighted
    code checksum (pins every code without shipping them).  Entirely
    row-local: one map_batches over 2-D numpy, ZERO shuffle.  Oracle:
    zipped unnest + the same integer expressions."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quant(batch: pa.Table) -> pd.DataFrame:
        vid = batch.column("vec_id").to_numpy()
        emb = np.stack(batch.column("embedding").to_pandas().to_numpy())
        fp = np.floor(emb.astype("float64") * 1_000_000.0).astype("int64")
        mn = fp.min(axis=1)
        mx = fp.max(axis=1)
        d = mx - mn
        safe = np.where(d == 0, 1, d)
        q = ((fp - mn[:, None]) * 255) // safe[:, None]
        q = np.where(d[:, None] == 0, 0, q)
        recon = mn[:, None] + (q * d[:, None]) // 255
        err = np.abs(fp - recon).sum(axis=1)
        idx = np.arange(1, fp.shape[1] + 1, dtype="int64")
        checksum = (q * idx[None, :]).sum(axis=1)
        return pd.DataFrame({
            "vec_id": vid.astype("int64"),
            "qmin": mn, "qmax": mx,
            "sum_abs_err": err.astype("int64"),
            "q_checksum": checksum.astype("int64")})

    out = ds.map_batches(quant, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


Q129_SQL = """
WITH el AS (
  SELECT vec_id,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS fp,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
),
rng AS (SELECT vec_id, min(fp) AS mn, max(fp) AS mx FROM el GROUP BY 1),
qq AS (
  SELECT el.vec_id, el.fp, el.i, rng.mn, rng.mx,
         CASE WHEN rng.mx = rng.mn THEN 0
              ELSE ((el.fp - rng.mn) * 255) // (rng.mx - rng.mn) END AS q
  FROM el JOIN rng ON rng.vec_id = el.vec_id
)
SELECT vec_id, mn AS qmin, mx AS qmax,
       CAST(sum(abs(fp - (mn + (q * (mx - mn)) // 255))) AS BIGINT)
       AS sum_abs_err,
       CAST(sum(q * i) AS BIGINT) AS q_checksum
FROM qq GROUP BY vec_id, mn, mx ORDER BY vec_id
"""


def q130_trailing_time_window(sf_dir: str):
    """Time-RANGE trailing window (the frame q91's ROWS window can't
    express): per user, the 1-hour trailing sum of value (integer cents)
    at each event — SQL `RANGE BETWEEN <1h> PRECEDING AND CURRENT ROW`
    semantics including the equal-timestamp peer rule (every row with
    the same order key joins the frame, even later-sorted ones).  Ray
    side: keyed-window scaffold + a vectorized two-pointer kernel
    (prefix sums + searchsorted on int64 epoch-us bounds) — O(n) per
    user, no per-row loop.  User subset (% 50 = 0) bounds the compared
    output; the kernel is per-user local."""
    from ..stages.window import hash_bucketed_map_groups

    HOUR_US = 3_600_000_000

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def subset(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy()
        return b.filter(pa.array(uid % 50 == 0))

    ev = ev.map_batches(subset, batch_format="pyarrow")

    def trailing(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, u in g.groupby("user_id", sort=False):
            u = u.sort_values(["ts", "event_id"], kind="stable")
            ts = u["ts"].to_numpy("datetime64[us]").astype("int64")
            v = np.floor(u["value"].to_numpy("float64") * 100
                         ).astype("int64")
            csum = np.r_[np.int64(0), np.cumsum(v)]
            left = np.searchsorted(ts, ts - HOUR_US, side="left")
            right = np.searchsorted(ts, ts, side="right")
            out.append(pd.DataFrame({
                "user_id": np.full(len(u), uid, "int64"),
                "event_id": u["event_id"].to_numpy("int64"),
                "trailing_cents": (csum[right] - csum[left])
                .astype("int64")}))
        if not out:
            return pd.DataFrame({"user_id": np.empty(0, "int64"),
                                 "event_id": np.empty(0, "int64"),
                                 "trailing_cents": np.empty(0, "int64")})
        return pd.concat(out, ignore_index=True)

    res = hash_bucketed_map_groups(ev, "user_id", trailing).to_pandas()
    res = res.astype("int64")
    return (res.sort_values(["user_id", "event_id"])
            .reset_index(drop=True))


Q130_SQL = """
WITH e AS (
  SELECT user_id, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS tsu,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id % 50 = 0
)
SELECT user_id, event_id,
       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY tsu
                             RANGE BETWEEN 3600000000 PRECEDING
                             AND CURRENT ROW) AS BIGINT)
       AS trailing_cents
FROM e ORDER BY user_id, event_id
"""


def q131_bgp_match(sf_dir: str):
    """SPARQL-style basic-graph-pattern query over a triplified relational
    KG (stages/bgp.py:match_bgp — each pattern a filtered projection,
    shared-variable native joins, SELECT DISTINCT semantics): open
    orders placed by customers in nation 7, as bindings (?o, ?c) of

        (?o, by_customer, ?c) (?c, in_nation, 7) (?o, has_status_open, 1)

    Triples are built streaming from orders/customer (zero shuffle);
    the BGP compiler does the rest.  Oracle: the equivalent SQL joins."""
    from ..stages.bgp import match_bgp

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def order_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        t1 = pd.DataFrame({"s": df["o_orderkey"].astype("int64"),
                           "p": "by_customer",
                           "o": df["o_custkey"].astype("int64")})
        op = df[df["o_orderstatus"] == "O"]
        t2 = pd.DataFrame({"s": op["o_orderkey"].astype("int64"),
                           "p": "has_status_open",
                           "o": np.ones(len(op), "int64")})
        return pd.concat([t1, t2], ignore_index=True)

    def cust_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"s": df["c_custkey"].astype("int64"),
                             "p": "in_nation",
                             "o": df["c_nationkey"].astype("int64")})

    triples = (orders.map_batches(order_triples, batch_format="pyarrow")
               .union(cust.map_batches(cust_triples,
                                       batch_format="pyarrow")))
    out = match_bgp(triples, [
        ("?o", "by_customer", "?c"),
        ("?c", "in_nation", 7),
        ("?o", "has_status_open", 1),
    ]).to_pandas()
    out = out[["o", "c"]].astype("int64")
    return out.sort_values(["o", "c"]).reset_index(drop=True)


Q131_SQL = """
SELECT DISTINCT o.o_orderkey AS o, c.c_custkey AS c
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_nationkey = 7 AND o.o_orderstatus = 'O'
ORDER BY o, c
"""


def _order_chain_triples(sf_dir: str):
    """Triples for the BGP property-path queries: per-customer next-order
    chain edges (keyed-window lead) + a sampled-customer marker + an
    urgent-priority attribute (sparse: only '1-URGENT' orders carry it)."""
    from ..stages.window import hash_bucketed_map_groups

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"])

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, u in g.groupby("o_custkey", sort=False):
            u = u.sort_values(["o_orderdate", "o_orderkey"], kind="stable")
            a = u["o_orderkey"].to_numpy("int64")
            if len(a) > 1:
                out.append(pd.DataFrame({
                    "s": a[:-1], "p": "next_order", "o": a[1:]}))
        if not out:
            return pd.DataFrame({"s": np.empty(0, "int64"),
                                 "p": np.empty(0, object),
                                 "o": np.empty(0, "int64")})
        return pd.concat(out, ignore_index=True)

    edges = hash_bucketed_map_groups(orders, "o_custkey", chain)

    def attrs(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        samp = df[df["o_custkey"] % 20 == 0]
        t1 = pd.DataFrame({"s": samp["o_orderkey"].astype("int64"),
                           "p": "order_of_sampled_cust",
                           "o": np.ones(len(samp), "int64")})
        urg = df[df["o_orderpriority"] == "1-URGENT"]
        t2 = pd.DataFrame({"s": urg["o_orderkey"].astype("int64"),
                           "p": "is_urgent",
                           "o": np.ones(len(urg), "int64")})
        return pd.concat([t1, t2], ignore_index=True)

    return edges.union(orders.map_batches(attrs, batch_format="pyarrow"))


def q132_property_path(sf_dir: str):
    """SPARQL property path `next_order+` (bounded transitive closure,
    max 3 hops) over the per-customer order chain: all (a, b) order
    pairs of sampled customers where b follows a within 3 successions —
    the `p+` path operator of stages/bgp.py (per hop one native join +
    distinct fold; the hop cap is part of the semantics).  Oracle:
    recursive CTE with depth guard over the lead()-built chain."""
    from ..stages.bgp import match_bgp

    triples = _order_chain_triples(sf_dir)
    out = match_bgp(triples, [
        ("?a", "order_of_sampled_cust", 1),
        ("?a", "next_order+", "?b"),
    ], max_hops=3).to_pandas()
    out = out[["a", "b"]].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q132_SQL = """
WITH RECURSIVE nxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS b
  FROM orders
),
e AS (SELECT a, b FROM nxt WHERE b IS NOT NULL),
rr(a, b, d) AS (
  SELECT a, b, 1 FROM e
  UNION
  SELECT rr.a, e.b, rr.d + 1 FROM rr JOIN e ON e.a = rr.b WHERE rr.d < 3
),
samp AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_custkey % 20 = 0)
SELECT DISTINCT rr.a, rr.b
FROM rr JOIN samp s ON s.o_orderkey = rr.a
ORDER BY a, b
"""


def q133_bgp_optional(sf_dir: str):
    """SPARQL OPTIONAL over the order KG: sampled customers' orders with
    their urgency flag if present (-1 when the sparse `is_urgent` triple
    is absent) — the left-outer-join pattern branch of
    stages/bgp.py:match_bgp.  Oracle: LEFT JOIN + COALESCE."""
    from ..stages.bgp import match_bgp

    triples = _order_chain_triples(sf_dir)
    out = match_bgp(
        triples,
        [("?a", "order_of_sampled_cust", 1)],
        optional=[("?a", "is_urgent", "?u")],
    ).to_pandas()
    out["u"] = out["u"].fillna(-1)
    out = out[["a", "u"]].astype("int64")
    return out.sort_values(["a", "u"]).reset_index(drop=True)


Q133_SQL = """
WITH samp AS (SELECT DISTINCT o_orderkey FROM orders
              WHERE o_custkey % 20 = 0),
urg AS (SELECT DISTINCT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT')
SELECT s.o_orderkey AS a,
       CAST(CASE WHEN u.o_orderkey IS NULL THEN -1 ELSE 1 END
            AS BIGINT) AS u
FROM samp s LEFT JOIN urg u ON u.o_orderkey = s.o_orderkey
ORDER BY a, u
"""


def btb_kg_query(sf_dir: str):
    """BGP query over the FLAGSHIP extracted KG (string-node triple
    store): biopsies showing an infection AND chronic rejection, with
    their A-grade when present (OPTIONAL; 'NONE' sentinel) — i.e. the
    reference's dashboard drill-down expressed as a SPARQL pattern over
    stages/bgp.py (cast_nodes=False string joins).  Rows-only: the KG
    itself comes from the NER pipeline (no SQL equivalent); pinned by
    the sf0.001 golden hash."""
    from ..stages.bgp import match_bgp

    triples = QUERIES["btb_triples"][0](sf_dir)
    out = match_bgp(
        triples,
        [("?doc", "has_infection", "?inf"),
         ("?doc", "has_rejet_chronique", "?rej")],
        optional=[("?doc", "has_grade_a", "?ga")],
        s_col="subj", p_col="pred", o_col="obj", cast_nodes=False,
    ).to_pandas()
    out["ga"] = out["ga"].fillna("NONE")
    out = out[["doc", "inf", "rej", "ga"]].astype(str)
    return (out.sort_values(["doc", "inf", "rej", "ga"])
            .reset_index(drop=True))


def q134_rule_materialize(sf_dir: str):
    """Forward-chaining rule materialization (single Datalog-style rule)
    over the order KG: (?o by_customer ?c) ^ (?c in_nation 7) ^
    (?o has_status_open 1) => (?c active_n7_buyer 1) — new triples
    derived and deduped via stages/bgp.py:apply_rule (match plan + one
    vectorized head projection).  Output: the materialized head triples.
    Oracle: SELECT DISTINCT with the rule body as joins."""
    from ..stages.bgp import apply_rule

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def order_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        t1 = pd.DataFrame({"s": df["o_orderkey"].astype("int64"),
                           "p": "by_customer",
                           "o": df["o_custkey"].astype("int64")})
        op = df[df["o_orderstatus"] == "O"]
        t2 = pd.DataFrame({"s": op["o_orderkey"].astype("int64"),
                           "p": "has_status_open",
                           "o": np.ones(len(op), "int64")})
        return pd.concat([t1, t2], ignore_index=True)

    def cust_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"s": df["c_custkey"].astype("int64"),
                             "p": "in_nation",
                             "o": df["c_nationkey"].astype("int64")})

    triples = (orders.map_batches(order_triples, batch_format="pyarrow")
               .union(cust.map_batches(cust_triples,
                                       batch_format="pyarrow")))
    out = apply_rule(
        triples,
        body=[("?o", "by_customer", "?c"), ("?c", "in_nation", 7),
              ("?o", "has_status_open", 1)],
        head=("?c", "active_n7_buyer", 1),
    ).to_pandas()
    out["s"] = out["s"].astype("int64")
    out["o"] = out["o"].astype("int64")
    out = out[["s", "p", "o"]]
    return out.sort_values("s").reset_index(drop=True)


Q134_SQL = """
SELECT DISTINCT c.c_custkey AS s, 'active_n7_buyer' AS p,
       CAST(1 AS BIGINT) AS o
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_nationkey = 7 AND o.o_orderstatus = 'O'
ORDER BY s
"""


def q135_smart_join(sf_dir: str):
    """Cost-based join strategy selection (stages/joins.py:smart_join):
    per-nation open-order revenue via orders x customer — the planner
    counts the dimension side and picks broadcast (here) or the native
    shuffle join (pinned byte-identical by test either way).  Aggregate
    in integer cents."""
    from ..stages.joins import smart_join

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_totalprice", "o_orderstatus"])

    def open_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("o_orderstatus"), "O"))

    orders = orders.map_batches(open_only, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = smart_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def cents(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df["cents"] = np.floor(
            df["o_totalprice"].to_numpy("float64") * 100).astype("int64")
        return df[["c_nationkey", "cents"]]

    out = _preagg(j.map_batches(cents, batch_format="pyarrow"),
                  ["c_nationkey"], {"revenue_cents": ("cents", "sum")})
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values("c_nationkey").reset_index(drop=True)


Q135_SQL = """
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
       AS revenue_cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderstatus = 'O'
GROUP BY 1 ORDER BY 1
"""


def _succession_edge_triples(sf_dir: str):
    """(s, 'next_order', o) triples linking each SAMPLED customer's
    orders in (date, key) succession — the shared edge set of the
    recursive-rule queries (q136/q137).  Distinct from
    `_order_chain_triples` (q132/q133's richer KG: all-customer chains
    plus sampled/urgent attribute triples) — a same-named second
    definition once shadowed it and silently emptied q132/q133."""
    from ..stages.window import hash_bucketed_map_groups

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def sampled(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy()
        return b.filter(pa.array(ck % 20 == 0))

    orders = orders.map_batches(sampled, batch_format="pyarrow")

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, u in g.groupby("o_custkey", sort=False):
            u = u.sort_values(["o_orderdate", "o_orderkey"], kind="stable")
            a = u["o_orderkey"].to_numpy("int64")
            if len(a) > 1:
                out.append(pd.DataFrame({
                    "s": a[:-1], "p": "next_order", "o": a[1:]}))
        if not out:
            return pd.DataFrame({"s": np.empty(0, "int64"),
                                 "p": np.empty(0, object),
                                 "o": np.empty(0, "int64")})
        return pd.concat(out, ignore_index=True)

    # chain buckets with no multi-order customer emit EMPTY schema-less
    # blocks that poison downstream joins — rebuild blocks first
    from ..stages.joins import coalesce_for_join

    return coalesce_for_join(
        hash_bucketed_map_groups(orders, "o_custkey", chain), 8)


def q136_datalog_saturation(sf_dir: str):
    """Datalog saturation to FIXPOINT (stages/bgp.py:saturate) — the
    unbounded-recursion counterpart of q132's hop-capped path: succession
    closure over sampled customers' order chains via a doubling rule set
    (copy rule + succ(x,y) ^ succ(y,z) => succ(x,z)), which converges in
    O(log chain-length) rounds instead of one round per hop.  Output:
    all derived succ pairs.  Oracle: recursive CTE without depth guard."""
    from ..stages.bgp import saturate

    triples = _succession_edge_triples(sf_dir)
    closed = saturate(triples, rules=[
        ([("?x", "next_order", "?y")], ("?x", "succ", "?y")),
        ([("?x", "succ", "?y"), ("?y", "succ", "?z")],
         ("?x", "succ", "?z")),
    ])

    def succ_only(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("p"), "succ"))
        return pa.table({"a": t.column("s").cast(pa.int64()),
                         "b": t.column("o").cast(pa.int64())})

    out = closed.map_batches(succ_only, batch_format="pyarrow").to_pandas()
    out = out.astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q136_SQL = """
WITH RECURSIVE nxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS b
  FROM orders WHERE o_custkey % 20 = 0
),
e AS (SELECT a, b FROM nxt WHERE b IS NOT NULL),
rr(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT rr.a, e.b FROM rr JOIN e ON e.a = rr.b
)
SELECT a, b FROM rr ORDER BY a, b
"""


def q137_semi_naive_reachability(sf_dir: str):
    """SEMI-NAIVE Datalog evaluation (stages/bgp.py:_saturate_semi_naive)
    on a LINEAR rule set — reach(x,y) ^ next_order(y,z) => reach(x,z) —
    capped at 5 rounds, i.e. succession pairs within 1..5 hops.  Each
    round matches only variants touching the last round's DELTA (new
    facts detected by the tag-min store fold), so per-round work tracks
    the closure FRONT, not the whole store — the scale path for deep
    recursions where q136's naive re-match of everything would be
    quadratic.  Oracle: depth-guarded recursive CTE (d < 5)."""
    from ..stages.bgp import saturate

    triples = _succession_edge_triples(sf_dir)
    closed = saturate(triples, rules=[
        ([("?x", "next_order", "?y")], ("?x", "reach", "?y")),
        ([("?x", "reach", "?y"), ("?y", "next_order", "?z")],
         ("?x", "reach", "?z")),
    ], max_rounds=5, strategy="semi_naive")

    def reach_only(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("p"), "reach"))
        return pa.table({"a": t.column("s").cast(pa.int64()),
                         "b": t.column("o").cast(pa.int64())})

    out = closed.map_batches(reach_only, batch_format="pyarrow").to_pandas()
    out = out.astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q137_SQL = """
WITH RECURSIVE nxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS b
  FROM orders WHERE o_custkey % 20 = 0
),
e AS (SELECT a, b FROM nxt WHERE b IS NOT NULL),
rr(a, b, d) AS (
  SELECT a, b, 1 FROM e
  UNION ALL
  SELECT rr.a, e.b, rr.d + 1 FROM rr JOIN e ON e.a = rr.b WHERE rr.d < 5
)
SELECT DISTINCT a, b FROM rr ORDER BY a, b
"""


def q138_incremental_entailment(sf_dir: str):
    """INCREMENTAL saturation (stages/bgp.py:saturate_incremental): an
    rdfs9-style type-entailment store — customer type nation, nation
    subclass region, region subclass world — bootstrapped from even
    custkeys and then MAINTAINED as the odd custkeys arrive: the
    semi-naive loop is seeded with exactly the arriving facts, so the
    second phase's work tracks the batch, not the accumulated store
    (the q111/q112 incremental-state discipline applied to rule
    derivation).  Output: every direct + entailed (entity, cls) pair.
    Oracle: fixed-depth taxonomy = plain SQL unions, no recursion."""
    from ..stages.bgp import saturate, saturate_incremental

    RULES = [([("?x", "type", "?c"), ("?c", "subclass", "?d")],
              ("?x", "type", "?d"))]
    ENT, NAT, REG, WORLD = 10_000_000, 1000, 2000, 3000

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def type_facts(parity: int):
        def f(b: pa.Table) -> pa.Table:
            ck = b.column("c_custkey").to_numpy()
            t = b.filter(pa.array(ck % 2 == parity))
            return pa.table({
                "s": pc.add(t.column("c_custkey").cast(pa.int64()), ENT),
                "p": pa.array(["type"] * t.num_rows),
                "o": pc.add(t.column("c_nationkey").cast(pa.int64()),
                            NAT)})
        return f

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])

    def taxonomy(b: pa.Table) -> pa.Table:
        nk = pc.add(b.column("n_nationkey").cast(pa.int64()), NAT)
        rk = pc.add(b.column("n_regionkey").cast(pa.int64()), REG)
        # nation -> region edges, plus (dup-folded) region -> world
        return pa.table({
            "s": pa.concat_arrays([nk.combine_chunks(),
                                   rk.combine_chunks()]),
            "p": pa.array(["subclass"] * (2 * b.num_rows)),
            "o": pa.concat_arrays([
                rk.combine_chunks(),
                pa.array([WORLD] * b.num_rows, type=pa.int64())])})

    sub = nation.map_batches(taxonomy, batch_format="pyarrow")
    boot = sub.union(cust.map_batches(type_facts(0),
                                      batch_format="pyarrow"))
    closed = saturate(boot, RULES, strategy="semi_naive").materialize()
    arriving = cust.map_batches(type_facts(1), batch_format="pyarrow")
    store = saturate_incremental(closed, arriving, RULES)

    def types_only(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("p"), "type"))
        return pa.table({"ent": t.column("s").cast(pa.int64()),
                         "cls": t.column("o").cast(pa.int64())})

    out = store.map_batches(types_only, batch_format="pyarrow").to_pandas()
    out = out.astype("int64")
    return out.sort_values(["ent", "cls"]).reset_index(drop=True)


Q138_SQL = """
WITH cust AS (
  SELECT c_custkey + 10000000 AS ent, c_nationkey + 1000 AS nat
  FROM customer
),
sub1 AS (SELECT n_nationkey + 1000 AS c, n_regionkey + 2000 AS d
         FROM nation),
types AS (
  SELECT ent, nat AS cls FROM cust
  UNION
  SELECT ent, s1.d AS cls FROM cust JOIN sub1 s1 ON s1.c = cust.nat
  UNION
  SELECT ent, 3000 AS cls FROM cust
)
SELECT ent, CAST(cls AS BIGINT) AS cls FROM types ORDER BY ent, cls
"""


def q139_bgp_filter_minus(sf_dir: str):
    """SPARQL FILTER + MINUS over the order KG (stages/bgp.py:match_bgp):
    orders of customers in nations 0-4 (FILTER ?n < 5) that are NOT open
    (MINUS (?o has_status_open ?f)) — the filter is one vectorized Arrow
    pass over the joined bindings, the MINUS an anti semi-join on the
    shared variable.  Oracle: the equivalent WHERE + NOT EXISTS SQL."""
    from ..stages.bgp import match_bgp

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def order_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        t1 = pd.DataFrame({"s": df["o_orderkey"].astype("int64"),
                           "p": "by_customer",
                           "o": df["o_custkey"].astype("int64")})
        op = df[df["o_orderstatus"] == "O"]
        t2 = pd.DataFrame({"s": op["o_orderkey"].astype("int64"),
                           "p": "has_status_open",
                           "o": np.ones(len(op), "int64")})
        return pd.concat([t1, t2], ignore_index=True)

    def cust_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"s": df["c_custkey"].astype("int64"),
                             "p": "in_nation",
                             "o": df["c_nationkey"].astype("int64")})

    triples = (orders.map_batches(order_triples, batch_format="pyarrow")
               .union(cust.map_batches(cust_triples,
                                       batch_format="pyarrow")))
    out = match_bgp(triples, [
        ("?o", "by_customer", "?c"),
        ("?c", "in_nation", "?n"),
    ], filters=[("n", "<", 5)],
       minus=[("?o", "has_status_open", "?f")]).to_pandas()
    out = out[["o", "c", "n"]].astype("int64")
    return out.sort_values(["o", "c", "n"]).reset_index(drop=True)


Q139_SQL = """
SELECT DISTINCT o.o_orderkey AS o, c.c_custkey AS c,
       CAST(c.c_nationkey AS BIGINT) AS n
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_nationkey < 5 AND o.o_orderstatus <> 'O'
ORDER BY o, c, n
"""


def q140_bgp_aggregate(sf_dir: str):
    """SPARQL aggregation (GROUP BY ?n, COUNT(?o)) over BGP bindings:
    open orders per customer nation — match_bgp emits DISTINCT bindings,
    so a plain groupby-count over them IS COUNT(DISTINCT): the binding
    stream feeds Ray's native aggregate directly, no extra dedup pass.
    Oracle: joins + COUNT(DISTINCT)."""
    from ..stages.bgp import match_bgp

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def order_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        op = df[df["o_orderstatus"] == "O"]
        return pd.DataFrame({"s": op["o_orderkey"].astype("int64"),
                             "p": "open_order_of",
                             "o": op["o_custkey"].astype("int64")})

    def cust_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"s": df["c_custkey"].astype("int64"),
                             "p": "in_nation",
                             "o": df["c_nationkey"].astype("int64")})

    triples = (orders.map_batches(order_triples, batch_format="pyarrow")
               .union(cust.map_batches(cust_triples,
                                       batch_format="pyarrow")))
    bindings = match_bgp(triples, [
        ("?o", "open_order_of", "?c"),
        ("?c", "in_nation", "?n"),
    ])
    agg = bindings.groupby("n").count().to_pandas()
    agg = agg.rename(columns={"count()": "n_orders"})
    agg["n"] = agg["n"].astype("int64")
    agg["n_orders"] = agg["n_orders"].astype("int64")
    return agg.sort_values("n").reset_index(drop=True)


Q140_SQL = """
SELECT CAST(c.c_nationkey AS BIGINT) AS n,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderstatus = 'O'
GROUP BY 1 ORDER BY n
"""


def q141_bgp_path_ops(sf_dir: str):
    """SPARQL path operators over the order-chain KG: sampled-or-urgent
    orders (?a, "order_of_sampled_cust|is_urgent", 1 — predicate
    ALTERNATIVE) paired with the order exactly two successions later
    (?a, "next_order/next_order", ?b — SEQUENCE path, intermediate
    hidden).  Inverse (^pred) is covered by unit tests.  Oracle: two
    self-joins of the lead()-built chain + the OR filter."""
    from ..stages.bgp import match_bgp

    triples = _order_chain_triples(sf_dir)
    out = match_bgp(triples, [
        ("?a", "order_of_sampled_cust|is_urgent", 1),
        ("?a", "next_order/next_order", "?b"),
    ]).to_pandas()
    out = out[["a", "b"]].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q141_SQL = """
WITH nxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS b
  FROM orders
),
e AS (SELECT a, b FROM nxt WHERE b IS NOT NULL),
m AS (SELECT DISTINCT o_orderkey FROM orders
      WHERE o_custkey % 20 = 0 OR o_orderpriority = '1-URGENT')
SELECT DISTINCT m.o_orderkey AS a, e2.b AS b
FROM m JOIN e e1 ON e1.a = m.o_orderkey JOIN e e2 ON e2.a = e1.b
ORDER BY a, b
"""


def q142_declarative_triplify(sf_dir: str):
    """R2RML-lite KG construction (stages/triplify.py): orders and
    customer map DECLARATIVELY into one string-node triple store (subject
    templates + predicate-object maps + a status row_filter), then the
    q131 drill-down runs over it as a BGP — the construct-then-query
    round trip with zero hand-written triple code.  Reads are pruned to
    TripleMap.columns().  Oracle: the joins with 'prefix:'||key node
    encoding inlined."""
    from ..stages.bgp import match_bgp
    from ..stages.triplify import (TripleMap, col, const, node,
                                   row_filter, triplify_tables)

    omap = TripleMap(
        subject=node("order", "o_orderkey"),
        mappings=[
            ("by_customer", node("cust", "o_custkey")),
            ("is_open", const("1"),
             row_filter("o_orderstatus", "==", "O")),
        ])
    cmap = TripleMap(
        subject=node("cust", "c_custkey"),
        mappings=[("in_nation", node("nation", "c_nationkey"))])

    orders = _read(sf_dir, "orders", omap.columns())
    cust = _read(sf_dir, "customer", cmap.columns())
    store = triplify_tables([(orders, omap), (cust, cmap)])

    out = match_bgp(store, [
        ("?o", "by_customer", "?c"),
        ("?c", "in_nation", "nation:7"),
        ("?o", "is_open", "1"),
    ], cast_nodes=False).to_pandas()
    out = out[["o", "c"]].astype(str)
    return out.sort_values(["o", "c"]).reset_index(drop=True)


Q142_SQL = """
SELECT DISTINCT 'order:' || o.o_orderkey AS o, 'cust:' || c.c_custkey AS c
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_nationkey = 7 AND o.o_orderstatus = 'O'
ORDER BY o, c
"""


def q143_domain_range_entailment(sf_dir: str):
    """rdfs2/rdfs3 domain-range entailment: the ontology declares
    (placed domain Customer) (placed range Order) (in_nation domain
    Customer) (in_nation range Nation); instance triples come from the
    DECLARATIVE mapper; the rules join on a PREDICATE VARIABLE —
    (?x ?pp ?y) ^ (?pp domain ?c) => (?x type ?c) and the range twin.
    Plan: broadcast strategy with the full store as the streaming first
    leg and the tiny ontology legs collected — no predicate-keyed
    shuffle (predicate joins are maximally skewed: few keys, huge
    groups).  Output: distinct (ent, cls).  Oracle: plain SQL unions."""
    from ..stages.bgp import match_bgp
    from ..stages.triplify import TripleMap, node, triplify_tables

    omap = TripleMap(subject=node("cust", "o_custkey"),
                     mappings=[("placed", node("order", "o_orderkey"))])
    cmap = TripleMap(
        subject=node("cust", "c_custkey"),
        mappings=[("in_nation", node("nation", "c_nationkey"))])
    orders = _read(sf_dir, "orders", omap.columns())
    cust = _read(sf_dir, "customer", cmap.columns())
    onto = ray.data.from_items([
        {"s": "placed", "p": "domain", "o": "Customer"},
        {"s": "placed", "p": "range", "o": "Order"},
        {"s": "in_nation", "p": "domain", "o": "Customer"},
        {"s": "in_nation", "p": "range", "o": "Nation"},
    ])
    store = (triplify_tables([(orders, omap), (cust, cmap)])
             .union(onto).materialize())

    def ent_of(pos: str, rule_pred: str):
        b = match_bgp(
            store,
            [("?x", "?pp", "?y"), ("?pp", rule_pred, "?c")],
            cast_nodes=False, join_strategy="broadcast",
            materialize_input=False)
        src = "x" if pos == "s" else "y"
        return b.map_batches(
            lambda t, _src=src: pa.table(
                {"ent": t.column(_src), "cls": t.column("c")}),
            batch_format="pyarrow")

    both = ent_of("s", "domain").union(ent_of("o", "range"))
    types = (both.map_batches(
        lambda b: b.to_pandas().drop_duplicates(),
        batch_format="pyarrow")
        .groupby(["ent", "cls"]).count().drop_columns(["count()"]))
    out = types.to_pandas().astype(str)
    return out.sort_values(["ent", "cls"]).reset_index(drop=True)


Q143_SQL = """
WITH t AS (
  SELECT DISTINCT 'cust:' || o_custkey AS ent, 'Customer' AS cls
  FROM orders
  UNION
  SELECT DISTINCT 'order:' || o_orderkey, 'Order' FROM orders
  UNION
  SELECT DISTINCT 'cust:' || c_custkey, 'Customer' FROM customer
  UNION
  SELECT DISTINCT 'nation:' || c_nationkey, 'Nation' FROM customer
)
SELECT ent, cls FROM t ORDER BY ent, cls
"""


def q144_shacl_validation(sf_dir: str):
    """SHACL-lite KG validation (stages/shacl.py): the order KG is
    built declaratively (triplify), then two shapes run — CustomerShape
    (min_count placed>=1: customers with no orders; max_count
    in_nation<=1; class_ref in_nation->Nation where only nations <20
    are typed, so high-nation customers violate) and OrderShape
    (in_set status in {O,F}: 'P' orders violate).  One subject-bucketed
    exchange, vectorized in-bucket checks, referenced-class set
    broadcast.  Oracle: NOT EXISTS / NOT IN equivalents."""
    from ..stages.shacl import Shape, validate_shapes
    from ..stages.triplify import (TripleMap, col, const, node,
                                   row_filter, triplify_tables)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey"])

    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[("type", const("Order")),
                                     ("status", col("o_orderstatus"))])),
        (orders, TripleMap(subject=node("cust", "o_custkey"),
                           mappings=[("placed",
                                      node("order", "o_orderkey"))])),
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("type", const("Customer")),
                                   ("in_nation",
                                    node("nation", "c_nationkey"))])),
        (nation, TripleMap(subject=node("nation", "n_nationkey"),
                           mappings=[("type", const("Nation"),
                                      row_filter("n_nationkey",
                                                 "<", 20))])),
    ])
    shapes = [
        Shape("CustomerShape", "Customer", [
            ("min_count", "placed", 1),
            ("max_count", "in_nation", 1),
            ("class_ref", "in_nation", "Nation"),
        ]),
        Shape("OrderShape", "Order", [
            ("in_set", "status", {"O", "F"}),
        ]),
    ]
    out = validate_shapes(store, shapes).to_pandas().astype(str)
    cols = ["node", "shape", "constraint", "pred", "detail"]
    return out[cols].sort_values(cols).reset_index(drop=True)


Q144_SQL = """
WITH v AS (
  SELECT 'cust:' || c_custkey AS node, 'CustomerShape' AS shape,
         'min_count' AS "constraint", 'placed' AS pred, '0' AS detail
  FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  UNION ALL
  SELECT 'cust:' || c_custkey, 'CustomerShape', 'class_ref',
         'in_nation', 'nation:' || c_nationkey
  FROM customer WHERE c_nationkey >= 20
  UNION ALL
  SELECT 'order:' || o_orderkey, 'OrderShape', 'in_set', 'status',
         o_orderstatus
  FROM orders WHERE o_orderstatus NOT IN ('O', 'F')
)
SELECT * FROM v ORDER BY node, shape, "constraint", pred, detail
"""


def q145_sameas_fusion(sf_dir: str):
    """KG fusion via owl:sameAs (stages/sameas.py): two id schemes —
    order facts name customers custA:K, the customer dimension names
    them custB:K — linked by sameAs pairs for EVEN custkeys only.
    apply_sameas closes the links (connected components), broadcasts the
    canonical map and rewrites the store in one streaming pass; the BGP
    (?c placed ?o) ^ (?c in_nation ?n) is then answerable exactly for
    the merged (even-key, has-order) customers.  Oracle: EXISTS with the
    even-key filter and min-id (custA) canonical encoding."""
    from ..stages.bgp import match_bgp
    from ..stages.sameas import apply_sameas
    from ..stages.triplify import TripleMap, node, triplify_tables

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("custA", "o_custkey"),
                           mappings=[("placed",
                                      node("order", "o_orderkey"))])),
        (cust, TripleMap(subject=node("custB", "c_custkey"),
                         mappings=[("in_nation",
                                    node("nation", "c_nationkey"))])),
    ])

    def links(b: pa.Table) -> pd.DataFrame:
        ck = b.column("c_custkey").to_numpy()
        even = ck[ck % 2 == 0].astype("int64")
        return pd.DataFrame({"a": [f"custA:{k}" for k in even],
                             "b": [f"custB:{k}" for k in even]})

    fused = apply_sameas(
        store, cust.map_batches(links, batch_format="pyarrow"))

    bindings = match_bgp(fused, [
        ("?c", "placed", "?o"),
        ("?c", "in_nation", "?n"),
    ], cast_nodes=False)
    proj = bindings.map_batches(
        lambda t: t.select(["c", "n"]).to_pandas().drop_duplicates(),
        batch_format="pyarrow")
    out = (proj.groupby(["c", "n"]).count().drop_columns(["count()"])
           .to_pandas().astype(str))
    return out.sort_values(["c", "n"]).reset_index(drop=True)


Q145_SQL = """
SELECT DISTINCT 'custA:' || c.c_custkey AS c,
       'nation:' || c.c_nationkey AS n
FROM customer c
WHERE c.c_custkey % 2 = 0
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c, n
"""


def q146_truth_discovery(sf_dir: str):
    """Multi-source truth discovery (stages/fusion.py): three sources
    assert each customer's nation — src1 is always right, src2 perturbs
    keys divisible by 4 (+1 mod 25), src3 keys divisible by 6 (+2 mod
    25).  Majority vote recovers the true nation except keys divisible
    by 12 where all three disagree and the deterministic min-object
    tie-break applies.  Combiner-first: batches pre-aggregate to
    (s,p,o,votes,rank) partials before the single coarse-bucket
    exchange.  Oracle: CASE over the divisibility classes."""
    from ..stages.fusion import resolve_conflicts

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def assertions(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        k = df["c_custkey"].to_numpy("int64")
        t = df["c_nationkey"].to_numpy("int64")
        s = pd.Series([f"cust:{v}" for v in k], dtype=object)
        o2 = np.where(k % 4 == 0, (t + 1) % 25, t)
        o3 = np.where(k % 6 == 0, (t + 2) % 25, t)
        return pd.concat([
            pd.DataFrame({"s": s, "p": "in_nation", "o": t,
                          "source": "src1"}),
            pd.DataFrame({"s": s, "p": "in_nation", "o": o2,
                          "source": "src2"}),
            pd.DataFrame({"s": s, "p": "in_nation", "o": o3,
                          "source": "src3"}),
        ], ignore_index=True)

    triples = cust.map_batches(assertions, batch_format="pyarrow")
    out = resolve_conflicts(triples, strategy="vote").to_pandas()
    out = out[["s", "o"]].rename(columns={"s": "cust", "o": "nation"})
    out["cust"] = out["cust"].astype(str)
    out["nation"] = out["nation"].astype("int64")
    return out.sort_values(["cust", "nation"]).reset_index(drop=True)


Q146_SQL = """
SELECT 'cust:' || c_custkey AS cust,
       CAST(CASE WHEN c_custkey % 12 = 0
                 THEN least(c_nationkey, (c_nationkey + 1) % 25,
                            (c_nationkey + 2) % 25)
                 ELSE c_nationkey END AS BIGINT) AS nation
FROM customer
ORDER BY cust, nation
"""


def q147_entity_dictionary(sf_dir: str):
    """Dense entity-id dictionary (stages/kgprep.py:encode_entities)
    over the declaratively triplified order KG: every distinct node
    (subject or object) numbered 0..N-1 in sorted order via the
    two-phase distributed prefix scan — the dictionary never
    materializes on the driver.  Oracle: row_number() - 1 over the
    distinct node union."""
    from ..stages.kgprep import encode_entities
    from ..stages.triplify import TripleMap, node, triplify_tables

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("cust", "o_custkey"),
                           mappings=[("placed",
                                      node("order", "o_orderkey"))])),
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("in_nation",
                                    node("nation", "c_nationkey"))])),
    ])
    out = encode_entities(store).to_pandas()
    out["node"] = out["node"].astype(str)
    out["id"] = out["id"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q147_SQL = """
WITH nodes AS (
  SELECT 'cust:' || o_custkey AS n FROM orders
  UNION SELECT 'order:' || o_orderkey FROM orders
  UNION SELECT 'cust:' || c_custkey FROM customer
  UNION SELECT 'nation:' || c_nationkey FROM customer
)
SELECT n AS node,
       CAST(row_number() OVER (ORDER BY n) - 1 AS BIGINT) AS id
FROM nodes ORDER BY node
"""


def q148_encoded_triples(sf_dir: str):
    """(h, r, t) id-encoded training triples (stages/kgprep.py:
    encode_triples): entity ids attach via TWO NATIVE HASH JOINS — the
    entity dictionary is O(corpus) and is never broadcast — relation
    ids via one broadcast map; input multiplicity preserved.  Oracle:
    the same row_number dictionaries joined back in SQL."""
    from ..stages.kgprep import encode_triples
    from ..stages.triplify import TripleMap, node, triplify_tables

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("cust", "o_custkey"),
                           mappings=[("placed",
                                      node("order", "o_orderkey"))])),
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("in_nation",
                                    node("nation", "c_nationkey"))])),
    ])
    out = encode_triples(store).to_pandas().astype("int64")
    return out.sort_values(["h", "r", "t"]).reset_index(drop=True)


Q148_SQL = """
WITH tr AS (
  SELECT 'cust:' || o_custkey AS s, 'placed' AS p,
         'order:' || o_orderkey AS o FROM orders
  UNION ALL
  SELECT 'cust:' || c_custkey, 'in_nation', 'nation:' || c_nationkey
  FROM customer
),
nodes AS (SELECT DISTINCT s AS n FROM tr
          UNION SELECT DISTINCT o FROM tr),
ids AS (SELECT n, row_number() OVER (ORDER BY n) - 1 AS id FROM nodes),
rels AS (SELECT p, row_number() OVER (ORDER BY p) - 1 AS rid
         FROM (SELECT DISTINCT p FROM tr))
SELECT CAST(hi.id AS BIGINT) AS h, CAST(rels.rid AS BIGINT) AS r,
       CAST(ti.id AS BIGINT) AS t
FROM tr JOIN ids hi ON hi.n = tr.s JOIN ids ti ON ti.n = tr.o
JOIN rels ON rels.p = tr.p
ORDER BY h, r, t
"""


def q149_ntriples_roundtrip(sf_dir: str):
    """N-Triples interchange round trip (sources/ntriples.py): the
    supplier KG (IRI edges + typed acctbal literals) serializes to
    part-*.nt files and is re-read with the streaming line parser; the
    result aggregates per (predicate, object kind) with distinct-object
    counts — proving lexical fidelity through the escape/strip cycle.
    Oracle: the same counts straight from the relational source."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh

    from ..sources.ntriples import read_ntriples, write_ntriples

    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey", "s_acctbal"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        k = df["s_suppkey"].astype("int64")
        iri = pd.DataFrame({
            "s": [f"http://ex/sup/{v}" for v in k],
            "p": "http://ex/in_nation",
            "o": [f"http://ex/nation/{v}"
                  for v in df["s_nationkey"].astype("int64")],
            "o_kind": "iri", "o_datatype": None, "o_lang": None})
        cents = (df["s_acctbal"] * 100).round().astype("int64")
        lit = pd.DataFrame({
            "s": [f"http://ex/sup/{v}" for v in k],
            "p": "http://ex/acctbal_cents",
            "o": cents.astype(str),
            "o_kind": "literal",
            "o_datatype": "http://www.w3.org/2001/XMLSchema#integer",
            "o_lang": None})
        return pd.concat([iri, lit], ignore_index=True)

    out_dir = _os.path.join(
        "/tmp", "gliner_nt_" + _hl.md5(sf_dir.encode()).hexdigest()[:12])
    if _os.path.isdir(out_dir):
        _sh.rmtree(out_dir)
    write_ntriples(sup.map_batches(to_triples, batch_format="pyarrow"),
                   out_dir)
    files = sorted(_os.path.join(out_dir, f)
                   for f in _os.listdir(out_dir) if f.endswith(".nt"))
    back = read_ntriples(files)

    # distinct objects need a fold: ship (p, kind, o) distinct rows,
    # then count — object cardinality is bounded here (nations + cents)
    proj = back.map_batches(
        lambda b: b.to_pandas()[b.to_pandas()["error"].isna()]
        [["p", "o_kind", "o"]],
        batch_format="pyarrow")
    counts = (back.map_batches(
        lambda b: b.to_pandas()[lambda d: d["error"].isna()]
        .groupby(["p", "o_kind"]).size().rename("n").reset_index(),
        batch_format="pyarrow")
        .groupby(["p", "o_kind"]).sum("n"))
    dist = (proj.map_batches(
        lambda b: b.to_pandas().drop_duplicates(),
        batch_format="pyarrow")
        .groupby(["p", "o_kind", "o"]).count().drop_columns(["count()"])
        .map_batches(lambda b: b.to_pandas()
                     .groupby(["p", "o_kind"]).size()
                     .rename("nd").reset_index(),
                     batch_format="pyarrow")
        .groupby(["p", "o_kind"]).sum("nd"))
    c = counts.to_pandas().rename(columns={"sum(n)": "n"})
    d = dist.to_pandas().rename(columns={"sum(nd)": "n_distinct_o"})
    out = c.merge(d, on=["p", "o_kind"])
    out["p"] = out["p"].astype(str)
    out["o_kind"] = out["o_kind"].astype(str)
    out["n"] = out["n"].astype("int64")
    out["n_distinct_o"] = out["n_distinct_o"].astype("int64")
    return out.sort_values(["p", "o_kind"]).reset_index(drop=True)


Q149_SQL = """
WITH t AS (
  SELECT 'http://ex/in_nation' AS p, 'iri' AS o_kind,
         'http://ex/nation/' || s_nationkey AS o FROM supplier
  UNION ALL
  SELECT 'http://ex/acctbal_cents', 'literal',
         CAST(CAST(round(s_acctbal * 100) AS BIGINT) AS VARCHAR)
  FROM supplier
)
SELECT p, o_kind, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT o) AS BIGINT) AS n_distinct_o
FROM t GROUP BY p, o_kind ORDER BY p, o_kind
"""


def q150_temporal_snapshot(sf_dir: str):
    """Temporal KG time travel (stages/temporal_kg.py): each user's
    event stream becomes (user, state, valid_from, valid_to) intervals
    (gaps-and-islands run collapse, same-instant supersession by
    event_id), then `snapshot_at` recovers every user's state as of
    2024-01-15 with one streaming filter.  Timestamps are int64
    epoch-us end to end.  Oracle: row_number() latest-event-at-T."""
    from ..stages.temporal_kg import intervalize_facts, snapshot_at

    T_US = int(pd.Timestamp("2024-01-15 00:00:00").value // 1000)
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def facts(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        ts = df["ts"].to_numpy("datetime64[us]").astype("int64")
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "pred": "has_state",
            "state": df["event_type"].astype(object),
            "ts_us": ts,
            "event_id": df["event_id"].astype("int64")})

    iv = intervalize_facts(
        ev.map_batches(facts, batch_format="pyarrow"),
        key_cols=["user_id", "pred"], ts_col="ts_us",
        value_col="state", tiebreak_col="event_id")
    snap = snapshot_at(iv, T_US).to_pandas()
    out = snap[["user_id", "state"]].copy()
    out["user_id"] = out["user_id"].astype("int64")
    out["state"] = out["state"].astype(str)
    return (out.sort_values(["user_id", "state"])
            .reset_index(drop=True))


Q150_SQL = """
SELECT user_id, event_type AS state FROM (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
) WHERE rn = 1 ORDER BY user_id, state
"""


def q151_reified_statements(sf_dir: str):
    """RDF statement reification (stages/triplify.py:reify_statements,
    Wikidata-qualifier style): supplier in_nation edges become
    statement nodes with rdf_subject/rdf_predicate/rdf_object plus an
    acctbal_cents qualifier; statement ids are content-derived md5 so
    the oracle mints identical ids with DuckDB's md5().  Row-local,
    shuffle-free.  Output: the reified store."""
    from ..stages.triplify import reify_statements

    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey", "s_acctbal"])

    def base(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "s": [f"sup:{v}" for v in df["s_suppkey"].astype("int64")],
            "p": "in_nation",
            "o": [f"nation:{v}"
                  for v in df["s_nationkey"].astype("int64")],
            "acctbal_cents": (df["s_acctbal"] * 100).round()
            .astype("int64")})

    out = reify_statements(
        sup.map_batches(base, batch_format="pyarrow"),
        qualifiers=["acctbal_cents"]).to_pandas().astype(str)
    return out.sort_values(["s", "p", "o"]).reset_index(drop=True)


Q151_SQL = """
WITH base AS (
  SELECT 'sup:' || s_suppkey AS s, 'in_nation' AS p,
         'nation:' || s_nationkey AS o,
         CAST(round(s_acctbal * 100) AS BIGINT) AS q
  FROM supplier
),
st AS (SELECT 'stmt:' || md5(s || '|' || p || '|' || o) AS sid, *
       FROM base)
SELECT s, p, o FROM (
  SELECT sid AS s, 'rdf_subject' AS p, st.s AS o FROM st
  UNION ALL SELECT sid, 'rdf_predicate', st.p FROM st
  UNION ALL SELECT sid, 'rdf_object', st.o FROM st
  UNION ALL SELECT sid, 'acctbal_cents', CAST(st.q AS VARCHAR) FROM st
) ORDER BY s, p, o
"""


def q152_predicate_profile(sf_dir: str):
    """KG schema discovery (stages/kgprep.py:predicate_profile): per
    predicate — triple count, distinct subjects/objects, and the
    functionality flag (placed is functional: one order, one customer;
    in_nation is functional per customer; the reverse placed_by view is
    NOT).  Distinct folds key on (p, value) pairs, never the skewed
    predicate alone; final counts merge driver-side on the bounded
    predicate vocabulary.  Oracle: COUNT/COUNT DISTINCT per predicate."""
    from ..stages.kgprep import predicate_profile
    from ..stages.triplify import TripleMap, node, triplify_tables

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[("placed_by",
                                      node("cust", "o_custkey"))])),
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("in_nation",
                                    node("nation", "c_nationkey"))])),
    ])
    return predicate_profile(store)


Q152_SQL = """
WITH t AS (
  SELECT 'placed_by' AS p, 'order:' || o_orderkey AS s,
         'cust:' || o_custkey AS o FROM orders
  UNION ALL
  SELECT 'in_nation', 'cust:' || c_custkey, 'nation:' || c_nationkey
  FROM customer
)
SELECT p, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT s) AS BIGINT) AS nd_s,
       CAST(count(DISTINCT o) AS BIGINT) AS nd_o,
       CAST(count(DISTINCT s || '|' || o) AS BIGINT) AS nd_so,
       CAST(CASE WHEN count(DISTINCT s)
                  = count(DISTINCT s || '|' || o)
            THEN 1 ELSE 0 END AS BIGINT) AS is_functional
FROM t GROUP BY p ORDER BY p
"""


def q153_construct_template(sf_dir: str):
    """SPARQL CONSTRUCT with a multi-triple template (stages/bgp.py:
    construct): one body match — open orders of nation-7 customers —
    fans out to three heads (forward edge, inverse edge, class marker)
    with a single global distinct fold.  Oracle: three SELECT DISTINCT
    unions over the same joins."""
    from ..stages.bgp import construct

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def order_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        t1 = pd.DataFrame({"s": df["o_orderkey"].astype("int64"),
                           "p": "by_customer",
                           "o": df["o_custkey"].astype("int64")})
        op = df[df["o_orderstatus"] == "O"]
        t2 = pd.DataFrame({"s": op["o_orderkey"].astype("int64"),
                           "p": "has_status_open",
                           "o": np.ones(len(op), "int64")})
        return pd.concat([t1, t2], ignore_index=True)

    def cust_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"s": df["c_custkey"].astype("int64"),
                             "p": "in_nation",
                             "o": df["c_nationkey"].astype("int64")})

    store = (orders.map_batches(order_triples, batch_format="pyarrow")
             .union(cust.map_batches(cust_triples,
                                     batch_format="pyarrow")))
    out = construct(store, [
        ("?o", "by_customer", "?c"),
        ("?c", "in_nation", 7),
        ("?o", "has_status_open", 1),
    ], heads=[
        ("?c", "has_open_order", "?o"),
        ("?o", "ordered_by", "?c"),
        ("?c", "active_n7_buyer", 1),
    ]).to_pandas()
    out["s"] = out["s"].astype("int64")
    out["p"] = out["p"].astype(str)
    out["o"] = out["o"].astype("int64")
    return out.sort_values(["s", "p", "o"]).reset_index(drop=True)


Q153_SQL = """
WITH b AS (
  SELECT o.o_orderkey AS ok, c.c_custkey AS ck
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_nationkey = 7 AND o.o_orderstatus = 'O'
)
SELECT s, p, o FROM (
  SELECT DISTINCT ck AS s, 'has_open_order' AS p, ok AS o FROM b
  UNION ALL SELECT DISTINCT ok, 'ordered_by', ck FROM b
  UNION ALL SELECT DISTINCT ck, 'active_n7_buyer', 1 FROM b
) ORDER BY s, p, o
"""


def q154_node_property_table(sf_dir: str):
    """KG -> wide node feature table (stages/kgprep.py:
    node_property_table): customers pivot to (node, in_nation, placed)
    with MIN-object semantics for the non-functional `placed` and a '-'
    fill for orderless customers.  Per-batch (s,p)-min combiner before
    the one subject-bucket exchange.  Oracle: LEFT JOIN + min() +
    coalesce."""
    from ..stages.kgprep import node_property_table
    from ..stages.triplify import TripleMap, node, triplify_tables

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("cust", "o_custkey"),
                           mappings=[("placed",
                                      node("order", "o_orderkey"))])),
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("in_nation",
                                    node("nation", "c_nationkey"))])),
    ])
    out = node_property_table(
        store, ["in_nation", "placed"]).to_pandas().astype(str)
    return out.sort_values("node").reset_index(drop=True)


Q154_SQL = """
SELECT 'cust:' || c.c_custkey AS node,
       'nation:' || c.c_nationkey AS in_nation,
       coalesce(min('order:' || o.o_orderkey), '-') AS placed
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1, 2 ORDER BY node
"""


def q155_subproperty_entailment(sf_dir: str):
    """rdfs7 subPropertyOf entailment: supplies and ships_to are both
    declared subproperties of connected_to; the rule (?x ?pp ?y) ^
    (?pp subprop ?qq) => (?x ?qq ?y) — a VARIABLE head predicate —
    materializes the superproperty edges (stages/bgp.py:apply_rule,
    broadcast fold, full store streaming first).  Output: distinct
    connected_to pairs.  Oracle: UNION of both instance sets."""
    from ..stages.bgp import apply_rule
    from ..stages.triplify import TripleMap, node, triplify_tables

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    onto = ray.data.from_items([
        {"s": "supplies", "p": "subprop", "o": "connected_to"},
        {"s": "ships_to", "p": "subprop", "o": "connected_to"},
    ])
    store = (triplify_tables([
        (sup, TripleMap(subject=node("sup", "s_suppkey"),
                        mappings=[("supplies",
                                   node("nation", "s_nationkey"))])),
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("ships_to",
                                    node("nation", "c_nationkey"))])),
    ]).union(onto)).materialize()

    derived = apply_rule(
        store,
        body=[("?x", "?pp", "?y"), ("?pp", "subprop", "?qq")],
        head=("?x", "?qq", "?y"),
        cast_nodes=False, join_strategy="broadcast",
        materialize_input=False)

    def conn(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("p"), "connected_to"))
        return pa.table({"a": t.column("s"), "b": t.column("o")})

    out = derived.map_batches(conn, batch_format="pyarrow").to_pandas()
    out = out.astype(str)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q155_SQL = """
SELECT a, b FROM (
  SELECT DISTINCT 'sup:' || s_suppkey AS a,
         'nation:' || s_nationkey AS b FROM supplier
  UNION
  SELECT DISTINCT 'cust:' || c_custkey, 'nation:' || c_nationkey
  FROM customer
) ORDER BY a, b
"""


def btb_kg_construct(sf_dir: str):
    """FLAGSHIP KG-construction composition over the reference domain:
    the NER-extracted biopsy triple store is (1) typed (every document
    becomes a Biopsy node), (2) ENTAILED with an alternative-path rule —
    has_infection|has_rejet_chronique => has_any_alert (stages/bgp.py
    apply_rule on the string-node store), (3) SHACL-VALIDATED
    (BiopsyShape: grade-A cardinality <= 1, alert enum) and (4)
    PROFILED (stages/kgprep.py:predicate_profile).  Output: one
    (metric, value) row per summary stat + per-predicate triple count —
    deterministic, golden-hashed at sf0.001 (the KG comes from the NER
    pipeline: no SQL equivalent)."""
    from ..stages.bgp import apply_rule
    from ..stages.kgprep import predicate_profile
    from ..stages.shacl import Shape, validate_shapes

    triples = (QUERIES["btb_triples"][0](sf_dir)
               .select_columns(["subj", "pred", "obj"]).materialize())

    def doc_types(b: pa.Table) -> pd.DataFrame:
        d = b.to_pandas()[["subj"]].drop_duplicates()
        return pd.DataFrame({"subj": d["subj"], "pred": "type",
                             "obj": "Biopsy"})

    types = (triples.map_batches(doc_types, batch_format="pyarrow")
             .groupby(["subj", "pred", "obj"]).count()
             .drop_columns(["count()"]))

    entailed = apply_rule(
        triples,
        body=[("?d", "has_infection|has_rejet_chronique", "?v")],
        head=("?d", "has_any_alert", "yes"),
        cast_nodes=False, s_col="subj", p_col="pred", o_col="obj",
    ).map_batches(
        lambda b: b.rename_columns(["subj", "pred", "obj"]),
        batch_format="pyarrow")

    store = triples.union(types).union(entailed).materialize()

    violations = validate_shapes(
        store, [Shape("BiopsyShape", "Biopsy", [
            ("max_count", "has_grade_a", 1),
            ("in_set", "has_any_alert", {"yes"}),
        ])], s_col="subj", p_col="pred", o_col="obj").to_pandas()

    prof = predicate_profile(store, s_col="subj", p_col="pred",
                             o_col="obj")
    n_alert = int(prof.loc[prof["p"] == "has_any_alert", "n"].sum())
    rows = [("stat:n_triples", int(prof["n"].sum())),
            ("stat:n_docs",
             int(prof.loc[prof["p"] == "type", "nd_s"].sum())),
            ("stat:n_alert_docs", n_alert),
            ("stat:n_violations", len(violations))]
    rows += [(f"pred:{p}", int(n))
             for p, n in zip(prof["p"], prof["n"])]
    out = pd.DataFrame(rows, columns=["metric", "value"])
    out["metric"] = out["metric"].astype(str)
    out["value"] = out["value"].astype("int64")
    return out.sort_values("metric").reset_index(drop=True)


def q156_link_prediction_split(sf_dir: str):
    """Filtered link-prediction split (stages/kgprep.py:
    link_prediction_split) over the q148 encoded KG: deterministic
    md5-draw assignment, then valid/test triples touching any entity
    unseen in train reassign to train (FB15k-style filtering).  Output:
    per-split triple counts.  Oracle: the same md5 ranges + NOT IN
    reassignment in SQL."""
    from ..stages.kgprep import encode_triples, link_prediction_split
    from ..stages.triplify import TripleMap, node, triplify_tables

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("cust", "o_custkey"),
                           mappings=[("placed",
                                      node("order", "o_orderkey"))])),
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("in_nation",
                                    node("nation", "c_nationkey"))])),
    ])
    split = link_prediction_split(encode_triples(store))
    counts = (split.map_batches(
        lambda b: b.to_pandas().groupby("split").size()
        .rename("n").reset_index(),
        batch_format="pyarrow")
        .groupby("split").sum("n").to_pandas())
    counts = counts.rename(columns={"sum(n)": "n"})
    counts["split"] = counts["split"].astype(str)
    counts["n"] = counts["n"].astype("int64")
    return counts.sort_values("split").reset_index(drop=True)


Q156_SQL = """
WITH tr AS (
  SELECT 'cust:' || o_custkey AS s, 'placed' AS p,
         'order:' || o_orderkey AS o FROM orders
  UNION ALL
  SELECT 'cust:' || c_custkey, 'in_nation', 'nation:' || c_nationkey
  FROM customer
),
nodes AS (SELECT DISTINCT s AS n FROM tr
          UNION SELECT DISTINCT o FROM tr),
ids AS (SELECT n, row_number() OVER (ORDER BY n) - 1 AS id FROM nodes),
rels AS (SELECT p, row_number() OVER (ORDER BY p) - 1 AS rid
         FROM (SELECT DISTINCT p FROM tr)),
enc AS (
  SELECT hi.id AS h, rels.rid AS r, ti.id AS t
  FROM tr JOIN ids hi ON hi.n = tr.s JOIN ids ti ON ti.n = tr.o
  JOIN rels ON rels.p = tr.p
),
tagged AS (
  SELECT h, r, t,
         CASE WHEN substr(md5(h || '|' || r || '|' || t), 1, 2) < '0d'
              THEN 'test'
              WHEN substr(md5(h || '|' || r || '|' || t), 1, 2) < '1a'
              THEN 'valid' ELSE 'train' END AS split
  FROM enc
),
train_ents AS (SELECT h AS e FROM tagged WHERE split = 'train'
               UNION SELECT t FROM tagged WHERE split = 'train'),
final AS (
  SELECT CASE WHEN split <> 'train'
              AND (h NOT IN (SELECT e FROM train_ents)
                   OR t NOT IN (SELECT e FROM train_ents))
              THEN 'train' ELSE split END AS split
  FROM tagged
)
SELECT split, CAST(count(*) AS BIGINT) AS n
FROM final GROUP BY split ORDER BY split
"""


def q157_disjointness_check(sf_dir: str):
    """owl:disjointWith consistency check expressed as a PURE BGP —
    no new operator needed: (?x type ?c1) ^ (?x type ?c2) ^
    (?c1 disjoint_with ?c2) finds every entity typed into two classes
    the ontology declares disjoint.  Customers whose key is divisible
    by 10 are (wrongly) also typed Order — those are the violations.
    Oracle: the modular filter."""
    from ..stages.bgp import match_bgp
    from ..stages.triplify import (TripleMap, const, node,
                                   triplify_tables)

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    onto = ray.data.from_items([
        {"s": "Customer", "p": "disjoint_with", "o": "Order"},
    ])

    # the planted inconsistency: every 10th customer also typed Order
    def dual(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        d = df[df["c_custkey"] % 10 == 0]
        return pd.DataFrame({
            "s": [f"cust:{k}" for k in d["c_custkey"].astype("int64")],
            "p": "type", "o": "Order"})

    store = (triplify_tables([
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("type", const("Customer"))])),
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[("type", const("Order"))])),
    ]).union(cust.map_batches(dual, batch_format="pyarrow"))
        .union(onto))

    out = match_bgp(store, [
        ("?x", "type", "?c1"),
        ("?x", "type", "?c2"),
        ("?c1", "disjoint_with", "?c2"),
    ], cast_nodes=False).to_pandas()
    out = out[["x", "c1", "c2"]].astype(str)
    return out.sort_values(["x", "c1", "c2"]).reset_index(drop=True)


Q157_SQL = """
SELECT 'cust:' || c_custkey AS x, 'Customer' AS c1, 'Order' AS c2
FROM customer WHERE c_custkey % 10 = 0
ORDER BY x, c1, c2
"""


def q158_named_graph_provenance(sf_dir: str):
    """Named-graph (quad) provenance query (stages/bgp.py g_col): order
    edges live in an 'urgent' or 'routine' graph by priority, customer
    facts in 'crm'; the pattern binds the GRAPH VARIABLE ?src, so each
    nation-7 order comes back with which graph asserted it — the
    provenance surface of a multi-source KG.  Oracle: join + CASE."""
    from ..stages.bgp import match_bgp

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def order_quads(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        g = np.where(df["o_orderpriority"] == "1-URGENT",
                     "urgent", "routine")
        return pd.DataFrame({"s": df["o_orderkey"].astype("int64"),
                             "p": "placed_by",
                             "o": df["o_custkey"].astype("int64"),
                             "g": g})

    def cust_quads(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"s": df["c_custkey"].astype("int64"),
                             "p": "in_nation",
                             "o": df["c_nationkey"].astype("int64"),
                             "g": "crm"})

    store = (orders.map_batches(order_quads, batch_format="pyarrow")
             .union(cust.map_batches(cust_quads,
                                     batch_format="pyarrow")))
    out = match_bgp(store, [
        ("?o", "placed_by", "?c", "?src"),
        ("?c", "in_nation", 7, "crm"),
    ], g_col="g").to_pandas()
    out = out[["o", "c", "src"]]
    out["o"] = out["o"].astype("int64")
    out["c"] = out["c"].astype("int64")
    out["src"] = out["src"].astype(str)
    return out.sort_values(["o", "c", "src"]).reset_index(drop=True)


Q158_SQL = """
SELECT o.o_orderkey AS o, c.c_custkey AS c,
       CASE WHEN o.o_orderpriority = '1-URGENT' THEN 'urgent'
            ELSE 'routine' END AS src
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_nationkey = 7
ORDER BY o, c, src
"""


def q159_image_header_probe(sf_dir: str):
    """Container-header metadata extraction without pixel decode
    (stages/multimodal.py:probe_image_header): each document gets a
    REAL minimal PNG whose IHDR dimensions derive from its text length;
    the probe parses the bytes back and aggregates (width-bucket, n,
    sum_pixels) — if the parser mis-read a single header the sums
    diverge.  Streaming, shuffle-free until the bounded-bucket fold.
    Oracle: the same dims computed arithmetically from length(text)."""
    import struct
    import zlib as _z

    from ..stages.multimodal import image_header_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def make_png(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        ln = df["text"].str.len().fillna(0).astype("int64")
        w = (ln % 64) + 1
        h = (ln % 37) + 2
        payloads = []
        for wi, hi in zip(w, h):
            ihdr = struct.pack(">II", int(wi), int(hi)) + bytes(
                [8, 2, 0, 0, 0])
            payloads.append(
                b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13)
                + b"IHDR" + ihdr
                + struct.pack(">I", _z.crc32(b"IHDR" + ihdr)))
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "payload": payloads})

    probed = image_header_stats(
        docs.map_batches(make_png, batch_format="pyarrow"))

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df["bucket"] = (df["width"] % 8).astype("int64")
        return (df.groupby("bucket")
                .agg(n=("pixels", "size"), sum_pixels=("pixels", "sum"))
                .reset_index())

    agg = (probed.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket").sum(["n", "sum_pixels"]).to_pandas())
    agg = agg.rename(columns={"sum(n)": "n",
                              "sum(sum_pixels)": "sum_pixels"})
    for c in ("bucket", "n", "sum_pixels"):
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("bucket").reset_index(drop=True)


Q159_SQL = """
WITH d AS (
  SELECT (length(text) % 64) + 1 AS w, (length(text) % 37) + 2 AS h
  FROM documents
)
SELECT CAST(w % 8 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(w * h) AS BIGINT) AS sum_pixels
FROM d GROUP BY 1 ORDER BY bucket
"""


def q160_turtle_ingest(sf_dir: str):
    """Turtle ingest (sources/turtle.py): the supplier KG serializes to
    prefixed .ttl part files (one per block: @prefix declarations,
    ';'/',' continuation lists, typed acctbal literals), is re-read
    with the per-file Turtle parser, and aggregates per (predicate,
    object kind) — prefix resolution and continuation parsing verified
    against the relational counts.  Oracle: straight SQL."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh

    from ..sources.turtle import read_turtle

    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey", "s_acctbal"])
    out_dir = _os.path.join(
        "/tmp", "gliner_ttl_" + _hl.md5(sf_dir.encode()).hexdigest()[:12])
    if _os.path.isdir(out_dir):
        _sh.rmtree(out_dir)
    _os.makedirs(out_dir, exist_ok=True)

    def write_ttl(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        if not len(df):
            return pd.DataFrame({"path": pd.Series(dtype=object)})
        lines = ["@prefix ex: <http://ex/> .",
                 "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> ."]
        for k, nk, bal in zip(df["s_suppkey"].astype("int64"),
                              df["s_nationkey"].astype("int64"),
                              (df["s_acctbal"] * 100).round()
                              .astype("int64")):
            lines.append(
                f"ex:sup{k} ex:in_nation ex:nation{nk} ;\n"
                f"    ex:acctbal_cents \"{bal}\"^^xsd:integer .")
        payload = "\n".join(lines) + "\n"
        name = ("part-"
                + _hl.md5(payload.encode()).hexdigest()[:16] + ".ttl")
        path = _os.path.join(out_dir, name)
        with open(path, "w", encoding="utf-8") as f:
            f.write(payload)
        return pd.DataFrame({"path": [path]})

    sup.map_batches(write_ttl, batch_format="pyarrow").materialize()
    files = sorted(_os.path.join(out_dir, f)
                   for f in _os.listdir(out_dir) if f.endswith(".ttl"))
    back = read_turtle(files)

    counts = (back.map_batches(
        lambda b: b.to_pandas()[lambda d: d["error"].isna()]
        .groupby(["p", "o_kind"]).size().rename("n").reset_index(),
        batch_format="pyarrow")
        .groupby(["p", "o_kind"]).sum("n").to_pandas())
    counts = counts.rename(columns={"sum(n)": "n"})
    counts["p"] = counts["p"].astype(str)
    counts["o_kind"] = counts["o_kind"].astype(str)
    counts["n"] = counts["n"].astype("int64")
    return counts.sort_values(["p", "o_kind"]).reset_index(drop=True)


Q160_SQL = """
WITH t AS (
  SELECT 'http://ex/in_nation' AS p, 'iri' AS o_kind FROM supplier
  UNION ALL
  SELECT 'http://ex/acctbal_cents', 'literal' FROM supplier
)
SELECT p, o_kind, CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY p, o_kind ORDER BY p, o_kind
"""


def q161_inverseof_entailment(sf_dir: str):
    """owl:inverseOf entailment as a PURE rule — no new operator:
    (?p inverse_of ?q) ^ (?x ?p ?y) => (?y ?q ?x) swaps subject and
    object through a variable head (ships_to declared inverse of
    serves); apply_rule materializes the inverse edges.  Broadcast
    fold, full store streaming first (predicate joins never shuffle).
    Oracle: the swapped projection."""
    from ..stages.bgp import apply_rule
    from ..stages.triplify import TripleMap, node, triplify_tables

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    onto = ray.data.from_items([
        {"s": "ships_to", "p": "inverse_of", "o": "serves"},
    ])
    store = (triplify_tables([
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("ships_to",
                                    node("nation", "c_nationkey"))])),
    ]).union(onto)).materialize()

    derived = apply_rule(
        store,
        body=[("?x", "?pp", "?y"), ("?pp", "inverse_of", "?qq")],
        head=("?y", "?qq", "?x"),
        cast_nodes=False, join_strategy="broadcast",
        materialize_input=False)

    def serves(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("p"), "serves"))
        return pa.table({"nation": t.column("s"),
                         "cust": t.column("o")})

    out = derived.map_batches(serves, batch_format="pyarrow").to_pandas()
    out = out.astype(str)
    return out.sort_values(["nation", "cust"]).reset_index(drop=True)


Q161_SQL = """
SELECT DISTINCT 'nation:' || c_nationkey AS nation,
       'cust:' || c_custkey AS cust
FROM customer ORDER BY nation, cust
"""


def q162_path_quantifiers(sf_dir: str):
    """SPARQL path quantifiers `*` (zero-or-more) and `?` (zero-or-one)
    over the sampled-customer order-succession chains — the zero-length
    path (SPARQL 1.1 ZeroLengthPath) unioned with the bounded closure
    (`*`, max 3 hops) or the direct edges (`?`).  With both endpoints
    variable the zero-length component pairs every TERM of the scoped
    store with itself.  One result set, `quant` marks the operator.
    Oracle: terms-self-paired UNION depth-guarded recursive CTE."""
    from ..stages.bgp import match_bgp

    triples = _succession_edge_triples(sf_dir).materialize()
    star = match_bgp(triples, [("?a", "next_order*", "?b")],
                     max_hops=3).to_pandas()
    star["quant"] = "*"
    opt = match_bgp(triples, [("?a", "next_order?", "?b")]).to_pandas()
    opt["quant"] = "?"
    out = pd.concat([star, opt], ignore_index=True)
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    return (out[["quant", "a", "b"]]
            .sort_values(["quant", "a", "b"]).reset_index(drop=True))


Q162_SQL = """
WITH RECURSIVE nxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS b
  FROM orders WHERE o_custkey % 20 = 0
),
e AS (SELECT a, b FROM nxt WHERE b IS NOT NULL),
terms AS (SELECT a AS t FROM e UNION SELECT b FROM e),
rr(a, b, d) AS (
  SELECT a, b, 1 FROM e
  UNION
  SELECT rr.a, e.b, rr.d + 1 FROM rr JOIN e ON e.a = rr.b WHERE rr.d < 3
)
SELECT quant, a, b FROM (
  SELECT '*' AS quant, t AS a, t AS b FROM terms
  UNION
  SELECT '*' AS quant, a, b FROM rr
  UNION
  SELECT '?' AS quant, t AS a, t AS b FROM terms
  UNION
  SELECT '?' AS quant, a, b FROM e
)
ORDER BY quant, a, b
"""


def q163_characteristic_sets(sf_dir: str):
    """RDF characteristic sets (stages/kgprep.py:characteristic_sets,
    Neumann & Moerkotte ICDE 2011): subjects grouped by their exact
    distinct-predicate set — the KG shape/cardinality statistic query
    optimizers build on.  Store: orders with two unconditional
    predicates (placed_by, has_status) and two row-filter-guarded flags
    (is_urgent, is_big), so four characteristic sets emerge.  One
    subject-bucket exchange; driver merge bounded by the number of
    distinct sets.  Oracle: string_agg(DISTINCT ... ORDER BY) per
    subject, then grouped counts."""
    from ..stages.kgprep import characteristic_sets
    from ..stages.triplify import (TripleMap, col, const, node,
                                   row_filter, triplify_tables)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus",
                    "o_orderpriority", "o_totalprice"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[
            ("placed_by", node("cust", "o_custkey")),
            ("has_status", col("o_orderstatus")),
            ("is_urgent", const(1),
             row_filter("o_orderpriority", "==", "1-URGENT")),
            ("is_big", const(1),
             row_filter("o_totalprice", ">", 150000.0)),
        ])),
    ])
    return characteristic_sets(store)


Q163_SQL = """
WITH t AS (
  SELECT 'order:' || o_orderkey AS s, 'placed_by' AS p FROM orders
  UNION ALL
  SELECT 'order:' || o_orderkey, 'has_status' FROM orders
  UNION ALL
  SELECT 'order:' || o_orderkey, 'is_urgent' FROM orders
  WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT 'order:' || o_orderkey, 'is_big' FROM orders
  WHERE o_totalprice > 150000
),
per_s AS (
  SELECT s, string_agg(DISTINCT p, ',' ORDER BY p) AS charset,
         count(*) AS nt
  FROM t GROUP BY s
)
SELECT charset, CAST(count(*) AS BIGINT) AS n_subjects,
       CAST(sum(nt) AS BIGINT) AS n_triples
FROM per_s GROUP BY 1 ORDER BY 1
"""


def q164_transitive_property(sf_dir: str):
    """owl:TransitiveProperty entailment driven by an in-store ontology
    declaration (stages/bgp.py:entail_transitive, OWL 2 RL prp-trp):
    located_in (customer -> nation -> region) is DECLARED transitive, so
    its bounded closure materializes customer->region triples; the
    undeclared serves predicate (supplier -> nation) must pass through
    un-entailed — the rule fires per declaration, not per predicate.
    Oracle: recursive CTE over the located_in edges only."""
    from ..stages.bgp import entail_transitive
    from ..stages.triplify import TripleMap, node, triplify_tables

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    onto = ray.data.from_items([
        {"s": "located_in", "p": "a", "o": "TransitiveProperty"},
    ])
    store = (triplify_tables([
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[("located_in",
                                    node("nation", "c_nationkey"))])),
        (nation, TripleMap(subject=node("nation", "n_nationkey"),
                           mappings=[("located_in",
                                      node("region", "n_regionkey"))])),
        (supp, TripleMap(subject=node("supp", "s_suppkey"),
                         mappings=[("serves",
                                    node("nation", "s_nationkey"))])),
    ]).union(onto)).materialize()

    out = entail_transitive(store, max_hops=4).to_pandas()
    out = out.astype(str)
    return out.sort_values(["s", "p", "o"]).reset_index(drop=True)


Q164_SQL = """
WITH RECURSIVE e AS (
  SELECT 'cust:' || c_custkey AS s, 'nation:' || c_nationkey AS o
  FROM customer
  UNION ALL
  SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
),
rr(s, o) AS (
  SELECT s, o FROM e
  UNION
  SELECT rr.s, e.o FROM rr JOIN e ON e.s = rr.o
)
SELECT s, 'located_in' AS p, o FROM rr ORDER BY s, p, o
"""


def q165_bgp_union(sf_dir: str):
    """SPARQL `{A} UNION {B}` (stages/bgp.py:match_bgp_union): branch A
    binds every order with its customer, branch B binds finished
    ('F'-status) orders with the customer variable UNBOUND — branch
    results align to the union of variables (unbound -> null) and fold
    through one coarse-bucket distinct exchange.  Unbound padded as '-'
    for the dtype-sensitive oracle hash.  Oracle: SQL UNION with a '-'
    literal in the unbound column."""
    from ..stages.bgp import match_bgp_union
    from ..stages.triplify import TripleMap, col, node, triplify_tables

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[
            ("placed_by", node("cust", "o_custkey")),
            ("has_status", col("o_orderstatus")),
        ])),
    ])
    out = match_bgp_union(store, [
        [("?o", "placed_by", "?c")],
        [("?o", "has_status", "F")],
    ], cast_nodes=False).to_pandas()
    out["c"] = out["c"].fillna("-").astype(str)
    out["o"] = out["o"].astype(str)
    return (out[["c", "o"]].sort_values(["o", "c"])
            .reset_index(drop=True))


Q165_SQL = """
SELECT c, o FROM (
  SELECT 'cust:' || o_custkey AS c, 'order:' || o_orderkey AS o
  FROM orders
  UNION
  SELECT '-', 'order:' || o_orderkey FROM orders
  WHERE o_orderstatus = 'F'
)
ORDER BY o, c
"""


def q166_bgp_bind(sf_dir: str):
    """SPARQL BIND (stages/bgp.py:bind_bindings): extend the
    order-succession bindings (?a next_order ?b) with computed
    variables — the key gap b - a and a chained reference gap * 3 —
    in one row-local vectorized pass (no shuffle; deterministic
    functions of bound columns preserve distinctness).  Oracle: the
    same arithmetic over the lead()-built chain."""
    from ..stages.bgp import bind_bindings, match_bgp

    triples = _succession_edge_triples(sf_dir)
    base = match_bgp(triples, [("?a", "next_order", "?b")])
    out = bind_bindings(base, [
        ("gap", "-", "b", "a"),
        ("gap3", "*", "gap", 3),
    ]).to_pandas()
    for c in ("a", "b", "gap", "gap3"):
        out[c] = out[c].astype("int64")
    return (out[["a", "b", "gap", "gap3"]]
            .sort_values(["a", "b"]).reset_index(drop=True))


Q166_SQL = """
WITH nxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS b
  FROM orders WHERE o_custkey % 20 = 0
)
SELECT a, b, CAST(b - a AS BIGINT) AS gap,
       CAST((b - a) * 3 AS BIGINT) AS gap3
FROM nxt WHERE b IS NOT NULL
ORDER BY a, b
"""


def q167_clustering_coefficients(sf_dir: str):
    """Local clustering coefficients over the part co-purchase KG (the
    q115 graph: part pairs sharing >= 2 orders) — per node its degree,
    triangle count and cc_ppm = floor(1e6 * 2T / (d(d-1))) in exact
    integer arithmetic (stages/graph.py:clustering_coefficients; the
    degree stream unions onto the triangle stream's node-bucket
    exchange, join-free).  Oracle: the q115 triangle CTE left-joined to
    an endpoint-count degree fold."""
    from ..stages.graph import clustering_coefficients, cooccurrence_edges

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_count=2)
    out = clustering_coefficients(edges, src="a", dst="b").to_pandas()
    for c in ("node", "degree", "triangles", "cc_ppm"):
        out[c] = out[c].astype("int64")
    return (out[["node", "degree", "triangles", "cc_ppm"]]
            .sort_values("node").reset_index(drop=True))


Q167_SQL = """
WITH e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(DISTINCT a.l_orderkey) >= 2
),
tri AS (
  SELECT e1.p1 AS x, e1.p2 AS y, e2.p2 AS z
  FROM e e1
  JOIN e e2 ON e1.p1 = e2.p1 AND e1.p2 < e2.p2
  JOIN e e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tcount AS (SELECT node, count(*) AS t FROM corners GROUP BY node),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e
  ) GROUP BY node
)
SELECT deg.node, CAST(deg.d AS BIGINT) AS degree,
       CAST(COALESCE(tcount.t, 0) AS BIGINT) AS triangles,
       CAST(CASE WHEN deg.d >= 2
            THEN (2000000 * COALESCE(tcount.t, 0))
                 // (deg.d * (deg.d - 1))
            ELSE 0 END AS BIGINT) AS cc_ppm
FROM deg LEFT JOIN tcount ON tcount.node = deg.node
ORDER BY deg.node
"""


def q168_shacl_extended(sf_dir: str):
    """SHACL sh:datatype and sh:lessThan constraint kinds
    (stages/shacl.py): P-status orders carry a `prio` string that must
    lexically parse as integer (all violate — the planted-violation
    set), cust_ref must be numerically < key_ref per node (violations
    where o_custkey >= o_orderkey), and an all-conforming integer check
    contributes nothing.  Same single subject-bucket exchange as q144.
    Oracle: the two violation predicates as plain SQL filters."""
    from ..stages.shacl import Shape, validate_shapes
    from ..stages.triplify import (TripleMap, col, const, node,
                                   row_filter, triplify_tables)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus",
                    "o_orderpriority"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[
            ("type", const("Order")),
            ("cust_ref", col("o_custkey")),
            ("key_ref", col("o_orderkey")),
            ("prio", col("o_orderpriority"),
             row_filter("o_orderstatus", "==", "P")),
        ])),
    ])
    out = validate_shapes(store, [Shape("OrderShape", "Order", [
        ("datatype", "prio", "integer"),
        ("less_than", "cust_ref", "key_ref"),
        ("datatype", "cust_ref", "integer"),   # conforms: no rows
    ])]).to_pandas()
    cols = ["node", "shape", "constraint", "pred", "detail"]
    out = out[cols].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


Q168_SQL = """
SELECT * FROM (
  SELECT 'order:' || o_orderkey AS node, 'OrderShape' AS shape,
         'datatype' AS "constraint", 'prio' AS pred,
         o_orderpriority AS detail
  FROM orders WHERE o_orderstatus = 'P'
  UNION ALL
  SELECT 'order:' || o_orderkey, 'OrderShape', 'less_than', 'cust_ref',
         CAST(o_custkey AS VARCHAR)
  FROM orders WHERE o_custkey >= o_orderkey
)
ORDER BY node, shape, "constraint", pred, detail
"""


def q169_negated_property_set(sf_dir: str):
    """SPARQL negated property set `!p1|p2` (stages/bgp.py:match_bgp):
    over the q165 order store, bindings reached by any predicate
    EXCEPT placed_by — i.e. the has_status edges — joined back to the
    placing customer.  The negation is one inverted vectorized is_in
    in the leg projection (same single scan).  Oracle: predicate
    NOT IN filter over the UNION ALL store."""
    from ..stages.bgp import match_bgp
    from ..stages.triplify import TripleMap, col, node, triplify_tables

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[
            ("placed_by", node("cust", "o_custkey")),
            ("has_status", col("o_orderstatus")),
        ])),
    ])
    out = match_bgp(store, [
        ("?o", "!placed_by", "?st"),
        ("?o", "placed_by", "?c"),
    ], cast_nodes=False).to_pandas()
    out = out[["o", "st", "c"]].astype(str)
    return out.sort_values(["o", "st", "c"]).reset_index(drop=True)


Q169_SQL = """
WITH t AS (
  SELECT 'order:' || o_orderkey AS s, 'placed_by' AS p,
         'cust:' || o_custkey AS o FROM orders
  UNION ALL
  SELECT 'order:' || o_orderkey, 'has_status', o_orderstatus
  FROM orders
)
SELECT DISTINCT a.s AS o, a.o AS st, b.o AS c
FROM t a JOIN t b ON b.s = a.s AND b.p = 'placed_by'
WHERE a.p <> 'placed_by'
ORDER BY o, st, c
"""


def q170_sparql_group_aggregates(sf_dir: str):
    """SPARQL GROUP BY + distributive aggregates over BGP bindings
    (stages/solutions.py:aggregate_bindings): bindings (?c ordered ?o)
    from a numeric-node order KG, grouped per customer — COUNT, SUM,
    MIN, MAX and exact integer-ppm AVG.  All aggregates are
    distributive, so rows pre-fold per batch (combiner-first) before
    the ONE coarse-bucket exchange merges partials.  Oracle: plain
    GROUP BY over the distinct bindings."""
    from ..stages.bgp import match_bgp
    from ..stages.solutions import aggregate_bindings

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    store = orders.map_batches(
        lambda b: pa.table({
            "s": b.column("o_custkey").cast(pa.int64()),
            "p": pa.array(["ordered"] * b.num_rows),
            "o": b.column("o_orderkey").cast(pa.int64())}),
        batch_format="pyarrow")
    bindings = match_bgp(store, [("?c", "ordered", "?o")])
    out = aggregate_bindings(bindings, ["c"], [
        ("n", "count", None),
        ("total", "sum", "o"),
        ("lo", "min", "o"),
        ("hi", "max", "o"),
        ("avg_ppm", "avg_ppm", "o"),
    ]).to_pandas()
    for col in ("c", "n", "total", "lo", "hi", "avg_ppm"):
        out[col] = out[col].astype("int64")
    return (out[["c", "n", "total", "lo", "hi", "avg_ppm"]]
            .sort_values("c").reset_index(drop=True))


Q170_SQL = """
WITH b AS (SELECT DISTINCT o_custkey AS c, o_orderkey AS o FROM orders)
SELECT c, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o) AS BIGINT) AS total,
       CAST(min(o) AS BIGINT) AS lo,
       CAST(max(o) AS BIGINT) AS hi,
       CAST((1000000 * sum(o)) // count(*) AS BIGINT) AS avg_ppm
FROM b GROUP BY c ORDER BY c
"""


def q171_sparql_holistic_aggregates(sf_dir: str):
    """SPARQL holistic aggregates + HAVING
    (stages/solutions.py:aggregate_bindings): the q165 string-node
    order store, bindings (?o placed_by ?c)(?o has_status ?st) grouped
    per customer — COUNT(DISTINCT status), deterministic GROUP_CONCAT
    (values sorted), SAMPLE (= min), HAVING n >= 2.  Holistic
    aggregates need the group's values co-located: one coarse-bucket
    exchange, vectorized in-bucket fold.  Oracle: string_agg(... ORDER
    BY) + count(DISTINCT) with a HAVING clause."""
    from ..stages.bgp import match_bgp
    from ..stages.solutions import aggregate_bindings
    from ..stages.triplify import TripleMap, col, node, triplify_tables

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[
            ("placed_by", node("cust", "o_custkey")),
            ("has_status", col("o_orderstatus")),
        ])),
    ])
    bindings = match_bgp(store, [
        ("?o", "placed_by", "?c"),
        ("?o", "has_status", "?st"),
    ], cast_nodes=False)
    out = aggregate_bindings(bindings, ["c"], [
        ("n", "count", None),
        ("nd_st", "count_distinct", "st"),
        ("statuses", "group_concat", "st", "|"),
        ("first_o", "sample", "o"),
    ], having=[("n", ">=", 2)]).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["nd_st"] = out["nd_st"].astype("int64")
    for col_ in ("c", "statuses", "first_o"):
        out[col_] = out[col_].astype(str)
    return (out[["c", "n", "nd_st", "statuses", "first_o"]]
            .sort_values("c").reset_index(drop=True))


Q171_SQL = """
WITH b AS (
  SELECT DISTINCT 'order:' || o_orderkey AS o,
         'cust:' || o_custkey AS c, o_orderstatus AS st
  FROM orders
)
SELECT c, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT st) AS BIGINT) AS nd_st,
       string_agg(st, '|' ORDER BY st) AS statuses,
       min(o) AS first_o
FROM b GROUP BY c HAVING count(*) >= 2 ORDER BY c
"""


def q172_filter_not_exists(sf_dir: str):
    """SPARQL FILTER EXISTS / NOT EXISTS
    (stages/solutions.py:filter_exists): over the numeric order KG with
    urgency markers, customers-with-orders bindings filtered two ways —
    EXISTS {?o urgent true} (customer has at least one binding whose
    order is urgent... note EXISTS correlates on the BINDING row, so
    the row's own ?o must be urgent) and NOT EXISTS on the same
    pattern; both polarities distinct-folded and counted per status to
    keep the output bounded.  Oracle: EXISTS / NOT EXISTS subqueries."""
    from ..stages.bgp import match_bgp
    from ..stages.solutions import aggregate_bindings, filter_exists

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderpriority"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        ok = b.column("o_orderkey").to_numpy()
        ck = b.column("o_custkey").to_numpy()
        urgent = np.asarray(
            [p.startswith("1") for p in
             b.column("o_orderpriority").to_pylist()])
        base = pd.DataFrame({"s": ck, "p": "ordered", "o": ok})
        mark = pd.DataFrame({"s": ok[urgent], "p": "urgent",
                             "o": np.ones(int(urgent.sum()),
                                          dtype=np.int64)})
        return pd.concat([base, mark], ignore_index=True)

    store = orders.map_batches(to_triples, batch_format="pyarrow")
    bindings = match_bgp(store, [("?c", "ordered", "?o")])
    rows = []
    for negate, tag in ((False, "exists"), (True, "not_exists")):
        kept = filter_exists(bindings, store, [("?o", "urgent", 1)],
                             negate=negate)
        agg = aggregate_bindings(kept, ["c"],
                                 [("n", "count", None)]).to_pandas()
        rows.append(pd.DataFrame({
            "polarity": tag,
            "n_customers": [int(len(agg))],
            "n_bindings": [int(agg["n"].sum()) if len(agg) else 0]}))
    out = pd.concat(rows, ignore_index=True)
    out["polarity"] = out["polarity"].astype(str)
    out["n_customers"] = out["n_customers"].astype("int64")
    out["n_bindings"] = out["n_bindings"].astype("int64")
    return out.sort_values("polarity").reset_index(drop=True)


Q172_SQL = """
WITH b AS (
  SELECT DISTINCT o_custkey AS c, o_orderkey AS o FROM orders
),
urgent AS (
  SELECT DISTINCT o_orderkey AS o FROM orders
  WHERE o_orderpriority LIKE '1%'
),
ex AS (SELECT * FROM b WHERE EXISTS
        (SELECT 1 FROM urgent u WHERE u.o = b.o)),
nex AS (SELECT * FROM b WHERE NOT EXISTS
        (SELECT 1 FROM urgent u WHERE u.o = b.o))
SELECT * FROM (
  SELECT 'exists' AS polarity,
         CAST(count(DISTINCT c) AS BIGINT) AS n_customers,
         CAST(count(*) AS BIGINT) AS n_bindings FROM ex
  UNION ALL
  SELECT 'not_exists',
         CAST(count(DISTINCT c) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM nex
)
ORDER BY polarity
"""


def q173_path_quantified_range(sf_dir: str):
    """SPARQL quantified path range `p{n,m}` (stages/bgp.py:match_bgp):
    order pairs 2..3 succession steps apart in each sampled customer's
    chain — the range closure accumulates only hop counts within
    [n, m] (`_bounded_closure(min_hops=...)`), so the direct-successor
    pairs are excluded without a post-filter.  Oracle: depth-tracking
    recursive CTE filtered to the same depth band."""
    from ..stages.bgp import match_bgp

    triples = _succession_edge_triples(sf_dir)
    out = match_bgp(triples, [("?a", "next_order{2,3}", "?b")]
                    ).to_pandas()
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    return (out[["a", "b"]].sort_values(["a", "b"])
            .reset_index(drop=True))


Q173_SQL = """
WITH RECURSIVE nxt AS (
  SELECT a, b FROM (
    SELECT o_orderkey AS a,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS b
    FROM orders WHERE o_custkey % 20 = 0
  ) WHERE b IS NOT NULL
),
rr(a, b, d) AS (
  SELECT a, b, 1 FROM nxt
  UNION ALL
  SELECT rr.a, nxt.b, rr.d + 1 FROM rr JOIN nxt ON nxt.a = rr.b
  WHERE rr.d < 3
)
SELECT DISTINCT a, b FROM rr WHERE d BETWEEN 2 AND 3 ORDER BY a, b
"""


def q174_property_chain_entailment(sf_dir: str):
    """owl:propertyChainAxiom entailment (stages/owl.py:
    entail_property_chain, OWL 2 RL prp-spo2): the in-store axiom
    (order_nation, propertyChainAxiom, "placed_by/in_nation") composes
    the order->customer and customer->nation edges into direct
    order->nation triples — one sequence-path match per axiom, native
    hash joins per step.  Oracle: the two-table join."""
    from ..stages.owl import entail_property_chain
    from ..stages.triplify import TripleMap, node, triplify_tables

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[
            ("placed_by", node("cust", "o_custkey"))])),
        (cust, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=[
            ("in_nation", node("nation", "c_nationkey"))])),
    ]).union(rd.from_items([{
        "s": "order_nation", "p": "propertyChainAxiom",
        "o": "placed_by/in_nation"}]))
    out = entail_property_chain(store).to_pandas()
    out = out[["s", "p", "o"]].astype(str)
    return out.sort_values(["s", "p", "o"]).reset_index(drop=True)


Q174_SQL = """
SELECT DISTINCT 'order:' || o_orderkey AS s, 'order_nation' AS p,
       'nation:' || c_nationkey AS o
FROM orders JOIN customer ON c_custkey = o_custkey
ORDER BY s, p, o
"""


def q175_symmetric_subproperty(sf_dir: str):
    """owl:SymmetricProperty + rdfs:subPropertyOf hierarchy entailment
    (stages/owl.py:entail_symmetric / entail_subproperty): same-region
    nation pairs (trades_with, declared symmetric) gain their mirrors
    in one streaming swap; supplier located_in triples fan to BOTH
    strict superproperties (located_in < based_in < positioned — the
    driver-closed rdfs5 hierarchy) in one broadcast flat-map.  Output
    = the new triples only, distinct.  Oracle: UNION of the mirror
    join and the two fanned copies."""
    from ..stages.owl import entail_subproperty, entail_symmetric
    from ..stages.triplify import TripleMap, node, triplify_tables

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def pairs(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        m = df.merge(df, on="n_regionkey")
        m = m[m["n_nationkey_x"] < m["n_nationkey_y"]]
        return pd.DataFrame({
            "s": "nation:" + m["n_nationkey_x"].astype(str),
            "p": "trades_with",
            "o": "nation:" + m["n_nationkey_y"].astype(str)})

    # nation is a 25-row dimension: the self-merge is row-local
    trade = nation.repartition(1).map_batches(pairs,
                                              batch_format="pyarrow")
    store = triplify_tables([
        (supp, TripleMap(subject=node("supp", "s_suppkey"),
                         mappings=[
            ("located_in", node("nation", "s_nationkey"))])),
    ]).union(trade).union(rd.from_items([
        {"s": "trades_with", "p": "a", "o": "SymmetricProperty"},
        {"s": "located_in", "p": "subPropertyOf", "o": "based_in"},
        {"s": "based_in", "p": "subPropertyOf", "o": "positioned"},
    ]))
    new = entail_symmetric(store).union(entail_subproperty(store))
    out = new.to_pandas()[["s", "p", "o"]].astype(str)
    return (out.drop_duplicates().sort_values(["s", "p", "o"])
            .reset_index(drop=True))


Q175_SQL = """
WITH tw AS (
  SELECT a.n_nationkey AS x, b.n_nationkey AS y
  FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
  WHERE a.n_nationkey < b.n_nationkey
)
SELECT DISTINCT s, p, o FROM (
  SELECT 'nation:' || y AS s, 'trades_with' AS p, 'nation:' || x AS o
  FROM tw
  UNION ALL
  SELECT 'supp:' || s_suppkey, 'based_in', 'nation:' || s_nationkey
  FROM supplier
  UNION ALL
  SELECT 'supp:' || s_suppkey, 'positioned', 'nation:' || s_nationkey
  FROM supplier
)
ORDER BY s, p, o
"""


def q176_shacl_value_constraints(sf_dir: str):
    """SHACL value-level constraint kinds (stages/shacl.py): sh:hasValue
    (vip marker present only on every-100th customer), sh:equals /
    sh:disjoint over the home/alt nation-value sets (alt = custkey mod
    25, so equals violates where they differ and disjoint where they
    coincide), and sh:nodeKind (market segments are literals, so
    requiring IRIs flags every row).  Same single subject-bucket
    exchange as the other SHACL queries.  Oracle: the four violation
    predicates as plain SQL."""
    from ..stages.shacl import Shape, validate_shapes

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_mktsegment"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        node = "cust:" + df["c_custkey"].astype(str)
        parts = [
            pd.DataFrame({"s": node, "p": "type", "o": "Customer"}),
            pd.DataFrame({"s": node, "p": "home",
                          "o": "nation:" + df["c_nationkey"].astype(str)}),
            pd.DataFrame({"s": node, "p": "alt",
                          "o": "nation:" + (df["c_custkey"] % 25)
                          .astype(str)}),
            pd.DataFrame({"s": node, "p": "seg",
                          "o": df["c_mktsegment"].astype(str)}),
        ]
        vip = df[df["c_custkey"] % 100 == 0]
        if len(vip):
            parts.append(pd.DataFrame({
                "s": "cust:" + vip["c_custkey"].astype(str),
                "p": "vip", "o": "yes"}))
        return pd.concat(parts, ignore_index=True)

    store = cust.map_batches(to_triples, batch_format="pyarrow")
    out = validate_shapes(store, [Shape("CustShape", "Customer", [
        ("has_value", "vip", "yes"),
        ("equals", "home", "alt"),
        ("disjoint", "home", "alt"),
        ("node_kind", "seg", "iri"),
    ])]).to_pandas()
    cols = ["node", "shape", "constraint", "pred", "detail"]
    out = out[cols].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


Q176_SQL = """
SELECT * FROM (
  SELECT 'cust:' || c_custkey AS node, 'CustShape' AS shape,
         'has_value' AS "constraint", 'vip' AS pred, 'yes' AS detail
  FROM customer WHERE c_custkey % 100 <> 0
  UNION ALL
  SELECT 'cust:' || c_custkey, 'CustShape', 'equals', 'home',
         'nation:' || c_nationkey
  FROM customer WHERE c_nationkey <> c_custkey % 25
  UNION ALL
  SELECT 'cust:' || c_custkey, 'CustShape', 'equals', 'home',
         'nation:' || (c_custkey % 25)
  FROM customer WHERE c_nationkey <> c_custkey % 25
  UNION ALL
  SELECT 'cust:' || c_custkey, 'CustShape', 'disjoint', 'home',
         'nation:' || c_nationkey
  FROM customer WHERE c_nationkey = c_custkey % 25
  UNION ALL
  SELECT 'cust:' || c_custkey, 'CustShape', 'node_kind', 'seg',
         c_mktsegment
  FROM customer
)
ORDER BY node, shape, "constraint", pred, detail
"""


def q177_degree_assortativity(sf_dir: str):
    """Degree assortativity of the part co-purchase KG (stages/graph.py:
    degree_assortativity, Newman 2002) in EXACT integer ppm: directed
    edge list built once, endpoint degrees attached via two native hash
    joins, Pearson reduced to three integer sufficient statistics via
    the symmetric-edge identity; partials are Python ints (int64
    overflows long before the edge list stops fitting), driver fold is
    one row per batch.  Oracle: the same sums in HUGEINT with DuckDB's
    truncating division."""
    from ..stages.graph import cooccurrence_edges, degree_assortativity

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_count=2)
    return degree_assortativity(edges, src="a", dst="b")


Q177_SQL = """
WITH e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(DISTINCT a.l_orderkey) >= 2
),
d2 AS (
  SELECT p1 AS x, p2 AS y FROM e
  UNION ALL
  SELECT p2, p1 FROM e
),
deg AS (SELECT x AS node, count(*) AS d FROM d2 GROUP BY x),
j AS (
  SELECT da.d AS dx, db.d AS dy
  FROM d2 JOIN deg da ON da.node = d2.x JOIN deg db ON db.node = d2.y
),
s AS (SELECT count(*) AS m, sum(dx) AS sx, sum(dx * dy) AS sxy,
             sum(dx * dx) AS sxx FROM j)
SELECT CAST(m AS BIGINT) AS m_directed,
       CAST(CASE WHEN m * sxx - sx * sx = 0 THEN 0
            ELSE (1000000 * (m * sxy - sx * sx))
                 // (m * sxx - sx * sx) END AS BIGINT) AS r_ppm
FROM s
"""


def q178_describe_skolemized(sf_dir: str):
    """SPARQL DESCRIBE (CBD) + skolemization (stages/solutions.py:
    describe, stages/kgprep.py:skolemize): urgent orders carry a BLANK
    address node (one per order) — DESCRIBE of the urgent-order targets
    pulls each order's direct triples AND its blank node's triples (the
    blank hop; the customer IRI is NOT recursed), then skolemize
    rewrites `_:` ids to exchangeable `skolem:` IRIs.  Frontier hops are
    native hash semi-joins; nothing lands on the driver.  Oracle: the
    two triple layers with the skolem prefix inlined."""
    from ..stages.kgprep import skolemize
    from ..stages.solutions import describe

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderpriority"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        node = "order:" + df["o_orderkey"].astype(str)
        blank = "_:addr" + df["o_orderkey"].astype(str)
        urgent = df[df["o_orderpriority"].str.startswith("1")]
        return pd.concat([
            pd.DataFrame({"s": node, "p": "placed_by",
                          "o": "cust:" + df["o_custkey"].astype(str)}),
            pd.DataFrame({"s": node, "p": "addr", "o": blank}),
            pd.DataFrame({"s": blank, "p": "prio",
                          "o": df["o_orderpriority"].astype(str)}),
            pd.DataFrame({"s": "order:" + urgent["o_orderkey"]
                          .astype(str), "p": "urgent", "o": "yes"}),
        ], ignore_index=True)

    store = orders.map_batches(to_triples, batch_format="pyarrow")
    cbd = describe(store, patterns=[("?x", "urgent", "yes")], var="x",
                   cast_nodes=False)
    out = skolemize(cbd).to_pandas()[["s", "p", "o"]].astype(str)
    return out.sort_values(["s", "p", "o"]).reset_index(drop=True)


Q178_SQL = """
WITH u AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderpriority AS pr
           FROM orders WHERE o_orderpriority LIKE '1%')
SELECT s, p, o FROM (
  SELECT 'order:' || k AS s, 'placed_by' AS p, 'cust:' || c AS o FROM u
  UNION ALL
  SELECT 'order:' || k, 'addr', 'skolem:addr' || k FROM u
  UNION ALL
  SELECT 'order:' || k, 'urgent', 'yes' FROM u
  UNION ALL
  SELECT 'skolem:addr' || k, 'prio', pr FROM u
)
ORDER BY s, p, o
"""


def q179_literal_parsing(sf_dir: str):
    """RDF literal decomposition (stages/kgprep.py:parse_literals): a
    part KG whose objects mix the three Turtle literal forms (typed
    `"42"^^xsd:integer` sizes, language-tagged `"..."@en` names, plain
    `"..."` types) with brand IRIs — one vectorized extract pass splits
    (lexical, datatype, lang, is_literal), then per-(p, datatype, lang)
    counts plus the sum of integer-typed lexicals prove the split is
    cast-ready.  Oracle: the same shapes built inline in SQL."""
    from ..stages.kgprep import parse_literals

    part = _read(sf_dir, "part",
                 ["p_partkey", "p_name", "p_size", "p_brand"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        node = "part:" + df["p_partkey"].astype(str)
        return pd.concat([
            pd.DataFrame({"s": node, "p": "size",
                          "o": '"' + df["p_size"].astype(str)
                          + '"^^xsd:integer'}),
            pd.DataFrame({"s": node, "p": "name",
                          "o": '"' + df["p_name"].astype(str) + '"@en'}),
            pd.DataFrame({"s": node, "p": "brand",
                          "o": "brand:" + df["p_brand"].astype(str)
                          .str.replace(" ", "", regex=False)}),
        ], ignore_index=True)

    store = part.map_batches(to_triples, batch_format="pyarrow")
    parsed = parse_literals(store)

    def combine(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df["_ival"] = np.where(
            df["datatype"] == "xsd:integer",
            pd.to_numeric(df["lexical"], errors="coerce"), 0)
        g = (df.groupby(["p", "datatype", "lang"], sort=False)
             .agg(n=("is_literal", "size"),
                  n_literal=("is_literal", "sum"),
                  int_sum=("_ival", "sum"))
             .reset_index())
        return g

    partials = parsed.map_batches(combine,
                                  batch_format="pyarrow").to_pandas()
    out = (partials.groupby(["p", "datatype", "lang"], sort=True)
           [["n", "n_literal", "int_sum"]].sum().reset_index())
    for c in ("n", "n_literal", "int_sum"):
        out[c] = out[c].astype("int64")
    for c in ("p", "datatype", "lang"):
        out[c] = out[c].astype(str)
    return (out.sort_values(["p", "datatype", "lang"])
            .reset_index(drop=True))


Q179_SQL = """
SELECT p, datatype, lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(is_literal) AS BIGINT) AS n_literal,
       CAST(sum(ival) AS BIGINT) AS int_sum
FROM (
  SELECT 'size' AS p, 'xsd:integer' AS datatype, '' AS lang,
         1 AS is_literal, p_size AS ival FROM part
  UNION ALL
  SELECT 'name', '', 'en', 1, 0 FROM part
  UNION ALL
  SELECT 'brand', '', '', 0, 0 FROM part
)
GROUP BY p, datatype, lang
ORDER BY p, datatype, lang
"""


def q180_graph_diff(sf_dir: str):
    """KG maintenance delta (stages/kgprep.py:graph_diff): old = every
    supplier's located_in triple; new = the same graph with every 10th
    supplier moved to the next nation and every 7th supplier dropped —
    the diff reports exactly the moved pairs (one added + one removed
    each) and the dropped removals, via one subject-bucket exchange
    with an in-bucket indicator fold.  Oracle: two EXCEPT-style
    anti-join unions."""
    from ..stages.kgprep import graph_diff

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def old_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "s": "supp:" + df["s_suppkey"].astype(str),
            "p": "located_in",
            "o": "nation:" + df["s_nationkey"].astype(str)})

    def new_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["s_suppkey"] % 7 != 0]
        nk = np.where(df["s_suppkey"] % 10 == 0,
                      (df["s_nationkey"] + 1) % 25, df["s_nationkey"])
        return pd.DataFrame({
            "s": "supp:" + df["s_suppkey"].astype(str),
            "p": "located_in",
            "o": "nation:" + pd.Series(nk, index=df.index).astype(str)})

    old = supp.map_batches(old_triples, batch_format="pyarrow")
    new = supp.map_batches(new_triples, batch_format="pyarrow")
    out = graph_diff(old, new).to_pandas()
    cols = ["s", "p", "o", "change"]
    out = out[cols].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


Q180_SQL = """
WITH old AS (
  SELECT 'supp:' || s_suppkey AS s, 'located_in' AS p,
         'nation:' || s_nationkey AS o FROM supplier
),
new AS (
  SELECT 'supp:' || s_suppkey AS s, 'located_in' AS p,
         'nation:' || (CASE WHEN s_suppkey % 10 = 0
                       THEN (s_nationkey + 1) % 25
                       ELSE s_nationkey END) AS o
  FROM supplier WHERE s_suppkey % 7 <> 0
)
SELECT s, p, o, change FROM (
  SELECT s, p, o, 'added' AS change FROM new
  EXCEPT
  SELECT s, p, o, 'added' FROM old
  UNION ALL
  SELECT * FROM (
    SELECT s, p, o, 'removed' AS change FROM old
    EXCEPT
    SELECT s, p, o, 'removed' FROM new
  )
)
ORDER BY s, p, o, change
"""


def q181_stratified_negation(sf_dir: str):
    """Stratified Datalog with NEGATION (stages/bgp.py:
    saturate_stratified): stratum 1 closes succession reachability to
    fixpoint with a doubling rule set (O(log chain) rounds); stratum 2 —
    which may safely negate `reach` because stratum 1 has frozen it —
    derives chain SINKS: reached orders with NO outgoing reach edge
    (the negated atom is match_bgp's MINUS anti semi-join, i.e.
    safe-negation semantics).  Output: each sampled customer's terminal
    order.  Oracle: recursive CTE + NOT EXISTS."""
    from ..stages.bgp import saturate_stratified

    triples = _succession_edge_triples(sf_dir)
    closed = saturate_stratified(triples, [
        [([("?x", "next_order", "?y")], ("?x", "reach", "?y")),
         ([("?x", "reach", "?y"), ("?y", "reach", "?z")],
          ("?x", "reach", "?z"))],
        [([("?w", "reach", "?x"), ("not", ("?x", "reach", "?z"))],
          ("?x", "is_sink", 0))],
    ])

    def sinks_only(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("p"), "is_sink"))
        return pa.table({"node": t.column("s").cast(pa.int64())})

    out = closed.map_batches(sinks_only, batch_format="pyarrow").to_pandas()
    out["node"] = out["node"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q181_SQL = """
WITH RECURSIVE nxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS b
  FROM orders WHERE o_custkey % 20 = 0
),
e AS (SELECT a, b FROM nxt WHERE b IS NOT NULL),
rr(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT rr.a, e.b FROM rr JOIN e ON e.a = rr.b
)
SELECT DISTINCT b AS node FROM rr r1
WHERE NOT EXISTS (SELECT 1 FROM rr r2 WHERE r2.a = r1.b)
ORDER BY node
"""


def q182_inverse_functional_sameas(sf_dir: str):
    """owl:InverseFunctionalProperty entity resolution (stages/owl.py:
    entail_inverse_functional, prp-ifp): customers sharing a phone
    signature (custkey % 50 — deterministic collisions at every sf)
    entail pairwise sameAs; the operator emits the linear STAR form
    (group-min subject -> each other subject) via ONE coarse-bucket
    exchange, never keyed on the raw shared value.  Noise mktsegment
    triples prove the declaration filter.  Oracle: group-min self-join
    (string min on both sides)."""
    from ..stages.owl import entail_inverse_functional

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = "cust:" + df["c_custkey"].astype(str)
        sig = pd.DataFrame({
            "s": s, "p": "phone_sig",
            "o": "sig:" + (df["c_custkey"] % 50).astype(str)})
        seg = pd.DataFrame({
            "s": s, "p": "segment", "o": df["c_mktsegment"].astype(str)})
        return pd.concat([sig, seg], ignore_index=True)

    decl = ray.data.from_items(
        [{"s": "phone_sig", "p": "a", "o": "InverseFunctionalProperty"}])
    store = cust.map_batches(to_triples, batch_format="pyarrow").union(decl)
    out = entail_inverse_functional(store).to_pandas()
    out = out[["s", "p", "o"]].astype(str)
    return out.sort_values(["s", "o"]).reset_index(drop=True)


Q182_SQL = """
WITH t AS (
  SELECT 'cust:' || c_custkey AS s, 'sig:' || (c_custkey % 50) AS v
  FROM customer
),
g AS (SELECT v, min(s) AS canon FROM t GROUP BY v)
SELECT g.canon AS s, 'sameAs' AS p, t.s AS o
FROM t JOIN g USING (v)
WHERE t.s <> g.canon
ORDER BY s, o
"""


def q183_functional_violations(sf_dir: str):
    """owl:FunctionalProperty conformance (stages/owl.py:
    functional_violations, the prp-fp check): every supplier holds a
    located_in nation edge, every 10th supplier holds a conflicting
    SECOND one — the report lists exactly those subjects with their
    distinct-object count (duplicate assertions of the same object do
    not violate: every 7th supplier's edge is asserted twice).  Oracle:
    COUNT(DISTINCT o) HAVING > 1."""
    from ..stages.owl import functional_violations

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = "supp:" + df["s_suppkey"].astype(str)
        base = pd.DataFrame({
            "s": s, "p": "located_in",
            "o": "nation:" + df["s_nationkey"].astype(str)})
        dup = base[df["s_suppkey"].to_numpy() % 7 == 0]
        alt = df[df["s_suppkey"] % 10 == 0]
        second = pd.DataFrame({
            "s": "supp:" + alt["s_suppkey"].astype(str),
            "p": "located_in",
            "o": "nation:" + ((alt["s_nationkey"] + 1) % 25).astype(str)})
        return pd.concat([base, dup, second], ignore_index=True)

    decl = ray.data.from_items(
        [{"s": "located_in", "p": "a", "o": "FunctionalProperty"}])
    store = supp.map_batches(to_triples, batch_format="pyarrow").union(decl)
    out = functional_violations(store).to_pandas()
    out["n_objects"] = out["n_objects"].astype("int64")
    return (out[["s", "p", "n_objects"]]
            .sort_values("s").reset_index(drop=True))


Q183_SQL = """
WITH t AS (
  SELECT 'supp:' || s_suppkey AS s, 'located_in' AS p,
         'nation:' || s_nationkey AS o FROM supplier
  UNION ALL
  SELECT 'supp:' || s_suppkey, 'located_in', 'nation:' || s_nationkey
  FROM supplier WHERE s_suppkey % 7 = 0
  UNION ALL
  SELECT 'supp:' || s_suppkey, 'located_in',
         'nation:' || ((s_nationkey + 1) % 25)
  FROM supplier WHERE s_suppkey % 10 = 0
)
SELECT s, p, CAST(COUNT(DISTINCT o) AS BIGINT) AS n_objects
FROM t GROUP BY s, p HAVING COUNT(DISTINCT o) > 1
ORDER BY s
"""


def q184_class_summary(sf_dir: str):
    """VoID-style class-level graph summary (stages/kgprep.py:
    class_summary): orders typed BOTH 'Order' and 'Order_<status>'
    (multi-type fan-out — each placed_by edge lands in two class
    partitions), customers typed 'Customer' with an untyped literal
    acct_band edge.  Type map attaches via two native LEFT joins (the
    dictionary is O(entities), never broadcast); counts fold
    combiner-first.  Oracle: plain grouped unions."""
    from ..stages.kgprep import class_summary

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def order_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = "order:" + df["o_orderkey"].astype(str)
        return pd.concat([
            pd.DataFrame({"s": s, "p": "a", "o": "Order"}),
            pd.DataFrame({"s": s, "p": "a",
                          "o": "Order_" + df["o_orderstatus"].astype(str)}),
            pd.DataFrame({"s": s, "p": "placed_by",
                          "o": "cust:" + df["o_custkey"].astype(str)}),
        ], ignore_index=True)

    def cust_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = "cust:" + df["c_custkey"].astype(str)
        band = np.where(df["c_acctbal"].to_numpy() >= 0, "pos", "neg")
        return pd.concat([
            pd.DataFrame({"s": s, "p": "a", "o": "Customer"}),
            pd.DataFrame({"s": s, "p": "acct_band", "o": band}),
        ], ignore_index=True)

    store = (orders.map_batches(order_triples, batch_format="pyarrow")
             .union(cust.map_batches(cust_triples,
                                     batch_format="pyarrow")))
    out = class_summary(store).to_pandas()
    out["n"] = out["n"].astype("int64")
    cols = ["s_type", "p", "o_type"]
    return (out[cols + ["n"]].sort_values(cols).reset_index(drop=True))


Q184_SQL = """
SELECT s_type, p, o_type, n FROM (
  SELECT 'Order' AS s_type, 'placed_by' AS p, 'Customer' AS o_type,
         CAST(count(*) AS BIGINT) AS n FROM orders
  UNION ALL
  SELECT 'Order_' || o_orderstatus, 'placed_by', 'Customer',
         CAST(count(*) AS BIGINT) FROM orders GROUP BY o_orderstatus
  UNION ALL
  SELECT 'Customer', 'acct_band', '(untyped)',
         CAST(count(*) AS BIGINT) FROM customer
)
ORDER BY s_type, p, o_type
"""


def q185_rdf_list_unroll(sf_dir: str):
    """RDF collection unrolling (stages/kgprep.py:rdf_list_unroll):
    each sampled customer's first 8 orders encoded as a proper
    rdf:List (first/rest cells ending at nil), then flattened back to
    (head, idx, member) by the pointer-chasing walk — heads found by
    one anti-join, each position one frontier join, the frontier sized
    by the NUMBER of lists.  The 8-element construction cap bounds the
    walk (RDF collections are short by design; unbounded chains belong
    to the succession-closure operators).  Oracle: row_number window."""
    from ..stages.kgprep import rdf_list_unroll
    from ..stages.window import hash_bucketed_map_groups

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def sampled(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy()
        return b.filter(pa.array(ck % 20 == 0))

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for ck, u in g.groupby("o_custkey", sort=False):
            u = u.sort_values(["o_orderdate", "o_orderkey"],
                              kind="stable").head(8)
            n = len(u)
            cell = [f"cell:{ck}_{i}" for i in range(n)]
            nxt = cell[1:] + ["nil"]
            out.append(pd.DataFrame({
                "s": cell + cell, "p": ["first"] * n + ["rest"] * n,
                "o": ("order:" + u["o_orderkey"].astype(str)).tolist()
                     + nxt}))
        if not out:
            return pd.DataFrame({"s": pd.Series(dtype=object),
                                 "p": pd.Series(dtype=object),
                                 "o": pd.Series(dtype=object)})
        return pd.concat(out, ignore_index=True)

    store = hash_bucketed_map_groups(
        orders.map_batches(sampled, batch_format="pyarrow"),
        "o_custkey", cells)
    out = rdf_list_unroll(store, max_len=8).to_pandas()
    out["idx"] = out["idx"].astype("int64")
    return (out[["head", "idx", "member"]]
            .sort_values(["head", "idx"]).reset_index(drop=True))


Q185_SQL = """
SELECT 'cell:' || o_custkey || '_0' AS head,
       CAST(rn - 1 AS BIGINT) AS idx,
       'order:' || o_orderkey AS member
FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders WHERE o_custkey % 20 = 0
) WHERE rn <= 8
ORDER BY head, idx
"""


def q186_sparql_order_limit(sf_dir: str):
    """SPARQL ORDER BY / LIMIT / OFFSET (stages/solutions.py:
    order_limit_bindings): a two-pattern BGP over customer balance and
    nation triples, paged DESC by balance with the custkey tiebreaker
    making the order total.  Distributed top-k: each block folds to
    its local top-(limit+offset) before the single driver-side page
    fold — no global sort shuffle.  Balances as floor(x*100) fixed-
    point cents (identical float64 op on both engines).  Oracle:
    ORDER BY ... LIMIT ... OFFSET."""
    from ..stages.bgp import match_bgp
    from ..stages.solutions import order_limit_bindings

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_acctbal", "c_nationkey"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        cents = np.floor(df["c_acctbal"].to_numpy() * 100).astype("int64")
        return pd.concat([
            pd.DataFrame({"s": df["c_custkey"], "p": "balance_cents",
                          "o": cents}),
            pd.DataFrame({"s": df["c_custkey"], "p": "in_nation",
                          "o": df["c_nationkey"].astype("int64")}),
        ], ignore_index=True)

    store = cust.map_batches(to_triples, batch_format="pyarrow")
    bindings = match_bgp(store, [("?c", "balance_cents", "?b"),
                                 ("?c", "in_nation", "?n")])
    out = order_limit_bindings(
        bindings, [("b", "desc"), ("c", "asc")], limit=20, offset=10)
    out = out[["c", "b", "n"]].astype("int64")
    return out.reset_index(drop=True)


Q186_SQL = """
SELECT c_custkey AS c,
       CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS b,
       CAST(c_nationkey AS BIGINT) AS n
FROM customer
ORDER BY b DESC, c
LIMIT 20 OFFSET 10
"""


def q187_sparql_subquery(sf_dir: str):
    """SPARQL subquery (stages/solutions.py:join_bindings — algebra
    Join of a BGP solution sequence with an aggregated inner SELECT):
    orders strictly above their customer's average order value.  The
    inner query folds avg_ppm per customer (combiner-first exchange);
    the outer BGP re-joins it via ONE native hash join on the shared
    variable; the comparison stays exact in integer ppm (cents * 1e6
    vs the trunc-div average).  Oracle: grouped CTE + join."""
    from ..stages.bgp import match_bgp
    from ..stages.solutions import aggregate_bindings, join_bindings

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        cents = np.floor(
            df["o_totalprice"].to_numpy() * 100).astype("int64")
        return pd.concat([
            pd.DataFrame({"s": df["o_orderkey"], "p": "placed_by",
                          "o": df["o_custkey"].astype("int64")}),
            pd.DataFrame({"s": df["o_orderkey"], "p": "total_cents",
                          "o": cents}),
        ], ignore_index=True)

    store = orders.map_batches(to_triples, batch_format="pyarrow")
    outer = match_bgp(store, [("?o", "placed_by", "?c"),
                              ("?o", "total_cents", "?t")])
    inner = aggregate_bindings(outer, ["c"],
                               [("avg_t", "avg_ppm", "t")])
    joined = join_bindings(outer, inner)

    def above(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        keep = df["t"].to_numpy("int64") * 1_000_000 > \
            df["avg_t"].to_numpy("int64")
        out = df[keep]
        return pd.DataFrame({"o": out["o"].astype("int64"),
                             "c": out["c"].astype("int64"),
                             "t": out["t"].astype("int64")})

    out = joined.map_batches(above, batch_format="pyarrow").to_pandas()
    return out.sort_values("o").reset_index(drop=True)


Q187_SQL = """
WITH t AS (
  SELECT o_orderkey AS o, o_custkey AS c,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS t
  FROM orders
),
a AS (
  SELECT c, (1000000 * sum(t)) // count(*) AS avg_t FROM t GROUP BY c
)
SELECT t.o, t.c, t.t FROM t JOIN a USING (c)
WHERE t.t * 1000000 > a.avg_t
ORDER BY o
"""


def q188_wl_colors(sf_dir: str):
    """1-WL color refinement (stages/graph.py:wl_refinement) over the
    sampled part<->supplier bipartite graph (signed node ids, q114
    encoding): two refinement rounds, then the color-class histogram —
    the structural fingerprint used for graph-isomorphism screening
    and role discovery.  Colors are md5 hex strings replayed EXACTLY
    by the oracle (DuckDB md5 + string_agg ORDER BY == hashlib md5
    over python-sorted hex); per round one native join ships neighbor
    colors, one coarse node-bucket exchange re-hashes.  Oracle: two
    unrolled refinement CTEs."""
    from ..stages.graph import wl_refinement

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().drop_duplicates()
        df = df[df["l_partkey"] % 25 == 0]
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        return pd.DataFrame({"a": df["l_partkey"].to_numpy("int64"),
                             "b": -(df["l_suppkey"].to_numpy("int64") + 1)})

    edges = (li.map_batches(pairs, batch_format="pyarrow")
             .groupby(["a", "b"]).count().drop_columns(["count()"]))
    colors = wl_refinement(edges, rounds=2)
    out = (colors.groupby("color").count().to_pandas()
           .rename(columns={"count()": "n"}))
    out["n"] = out["n"].astype("int64")
    return (out[["color", "n"]].astype({"color": str})
            .sort_values("color").reset_index(drop=True))


Q188_SQL = """
WITH e0 AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
  WHERE l_partkey % 25 = 0
),
e AS (SELECT p AS u, -(s + 1) AS v FROM e0
      UNION ALL SELECT -(s + 1), p FROM e0),
c0 AS (
  SELECT u AS node, md5(CAST(count(*) AS VARCHAR)) AS c
  FROM e GROUP BY u
),
c1 AS (
  SELECT e.u AS node,
         md5(max(s.c) || '|' || string_agg(n.c, ',' ORDER BY n.c)) AS c
  FROM e JOIN c0 n ON n.node = e.v JOIN c0 s ON s.node = e.u
  GROUP BY e.u
),
c2 AS (
  SELECT e.u AS node,
         md5(max(s.c) || '|' || string_agg(n.c, ',' ORDER BY n.c)) AS c
  FROM e JOIN c1 n ON n.node = e.v JOIN c1 s ON s.node = e.u
  GROUP BY e.u
)
SELECT c AS color, CAST(count(*) AS BIGINT) AS n
FROM c2 GROUP BY c ORDER BY color
"""


def q189_link_prediction_rank(sf_dir: str):
    """KG-embedding link-prediction evaluation (stages/kgprep.py:
    link_prediction_rank): optimistic TransE tail rank of each test
    order against EVERY candidate entity, under the all-integer
    hash_embedding both engines replay bit-for-bit.  The plan streams
    the O(corpus) candidate table and broadcasts the bounded test page
    (the inverse of the naive broadcast-the-entities layout).  Oracle:
    test x entities x dims cross join, FILTER count of strictly-better
    scores."""
    from ..stages.kgprep import _distinct, link_prediction_rank

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def tests(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["o_orderkey"] % 97 == 0]
        return pd.DataFrame({
            "h": -df["o_custkey"].to_numpy("int64"),
            "r": np.ones(len(df), dtype="int64"),
            "t": df["o_orderkey"].to_numpy("int64")})

    def ents(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"e": np.concatenate([
            -pd.unique(df["o_custkey"]).astype("int64"),
            df["o_orderkey"].to_numpy("int64")])})

    test = orders.map_batches(tests, batch_format="pyarrow")
    entities = _distinct(
        orders.map_batches(ents, batch_format="pyarrow"), ["e"])
    out = link_prediction_rank(test, entities)
    out = out.astype("int64")
    return out.reset_index(drop=True)


Q189_SQL = """
WITH tr AS (
  SELECT -o_custkey AS h, CAST(1 AS BIGINT) AS r, o_orderkey AS t
  FROM orders
),
test AS (SELECT * FROM tr WHERE t % 97 = 0),
ents AS (SELECT h AS e FROM tr UNION SELECT t FROM tr),
d AS (SELECT j FROM range(8) AS rr(j)),
q AS (
  SELECT test.h, test.r, test.t, d.j,
         ((abs(test.h)*31 + CASE WHEN test.h < 0 THEN 53 ELSE 0 END
           + d.j*17) % 101) - 50
       + ((abs(test.r)*13 + CASE WHEN test.r < 0 THEN 53 ELSE 0 END
           + d.j*17) % 101) - 50 AS qv,
         ((abs(test.t)*31 + CASE WHEN test.t < 0 THEN 53 ELSE 0 END
           + d.j*17) % 101) - 50 AS tv
  FROM test CROSS JOIN d
),
ts AS (SELECT h, r, t, sum(abs(qv - tv)) AS true_score
       FROM q GROUP BY h, r, t),
sc AS (
  SELECT q.h, q.r, q.t, ents.e,
         sum(abs(q.qv -
             (((abs(ents.e)*31
                + CASE WHEN ents.e < 0 THEN 53 ELSE 0 END
                + q.j*17) % 101) - 50))) AS score
  FROM q CROSS JOIN ents
  GROUP BY q.h, q.r, q.t, ents.e
)
SELECT sc.h, sc.r, sc.t,
       CAST(1 + count(*) FILTER (WHERE sc.score < ts.true_score)
            AS BIGINT) AS "rank"
FROM sc JOIN ts USING (h, r, t)
GROUP BY sc.h, sc.r, sc.t
ORDER BY h, r, t
"""


def q190_domain_range_entailment(sf_dir: str):
    """rdfs2 + rdfs3 domain/range type inference as PURE variable-
    predicate rules (stages/bgp.py:apply_rule — no new operator): the
    ontology declares domain/range classes for placed_by and
    in_nation; every data edge then types its subject (rdfs2) and
    object (rdfs3).  The data pattern goes FIRST with the broadcast
    fold — a predicate-variable join is maximally skewed, so the store
    streams and the bounded ontology legs collect (the q143 rule).
    Output: distinct (entity, cls).  Oracle: plain unions."""
    from ..stages.bgp import apply_rule

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def order_edges(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "s": "order:" + df["o_orderkey"].astype(str),
            "p": "placed_by",
            "o": "cust:" + df["o_custkey"].astype(str)})

    def cust_edges(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "s": "cust:" + df["c_custkey"].astype(str),
            "p": "in_nation",
            "o": "nation:" + df["c_nationkey"].astype(str)})

    onto = ray.data.from_items([
        {"s": "placed_by", "p": "domain", "o": "Order"},
        {"s": "placed_by", "p": "range", "o": "Customer"},
        {"s": "in_nation", "p": "domain", "o": "Customer"},
        {"s": "in_nation", "p": "range", "o": "Nation"},
    ])
    store = (orders.map_batches(order_edges, batch_format="pyarrow")
             .union(cust.map_batches(cust_edges,
                                     batch_format="pyarrow"))
             .union(onto))

    kw = dict(cast_nodes=False, join_strategy="broadcast")
    rdfs2 = apply_rule(store, [("?x", "?p", "?y"),
                               ("?p", "domain", "?c")],
                       ("?x", "type", "?c"), **kw)
    rdfs3 = apply_rule(store, [("?x", "?p", "?y"),
                               ("?p", "range", "?c")],
                       ("?y", "type", "?c"), **kw)
    typed = (rdfs2.union(rdfs3)
             .groupby(["s", "p", "o"]).count().drop_columns(["count()"]))
    out = typed.to_pandas()
    out = pd.DataFrame({"entity": out["s"].astype(str),
                        "cls": out["o"].astype(str)})
    return (out.drop_duplicates().sort_values(["entity", "cls"])
            .reset_index(drop=True))


Q190_SQL = """
SELECT DISTINCT entity, cls FROM (
  SELECT 'order:' || o_orderkey AS entity, 'Order' AS cls FROM orders
  UNION ALL
  SELECT 'cust:' || o_custkey, 'Customer' FROM orders
  UNION ALL
  SELECT 'cust:' || c_custkey, 'Customer' FROM customer
  UNION ALL
  SELECT 'nation:' || c_nationkey, 'Nation' FROM customer
)
ORDER BY entity, cls
"""


def q191_allen_interval_join(sf_dir: str):
    """Allen interval-algebra join (stages/temporal_kg.py:
    allen_interval_join): each customer's even-key order intervals
    classified against their odd-key ones into the one holding Allen
    relation — ONE coarse key-bucket exchange, per-key vectorized pair
    grid (the bounded-timeline contract), closed-open epoch-us int64
    intervals.  Span = orderdate + (orderkey%30 + 1) days, so every
    relation class occurs.  Oracle: join + exhaustive CASE."""
    from ..stages.temporal_kg import allen_interval_join

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def iv(parity: int):
        def f(b: pa.Table, _p=parity) -> pd.DataFrame:
            df = b.to_pandas()
            df = df[df["o_orderkey"] % 2 == _p]
            start = (df["o_orderdate"].astype("datetime64[us]")
                     .astype("int64"))
            span = (df["o_orderkey"].to_numpy("int64") % 30 + 1) \
                * 86_400_000_000
            return pd.DataFrame({
                "key": df["o_custkey"].astype(str),
                "id": df["o_orderkey"].to_numpy("int64"),
                "start": start.to_numpy(),
                "end": start.to_numpy() + span})
        return f

    left = orders.map_batches(iv(0), batch_format="pyarrow")
    right = orders.map_batches(iv(1), batch_format="pyarrow")
    out = allen_interval_join(left, right).to_pandas()
    out["key"] = out["key"].astype(str)
    out["relation"] = out["relation"].astype(str)
    out["l_id"] = out["l_id"].astype("int64")
    out["r_id"] = out["r_id"].astype("int64")
    return (out[["key", "l_id", "r_id", "relation"]]
            .sort_values(["key", "l_id", "r_id"])
            .reset_index(drop=True))


Q191_SQL = """
WITH iv AS (
  SELECT CAST(o_custkey AS VARCHAR) AS key, o_orderkey AS id,
         epoch_us(o_orderdate) AS s,
         epoch_us(o_orderdate)
           + (o_orderkey % 30 + 1) * 86400000000 AS e
  FROM orders
),
l AS (SELECT * FROM iv WHERE id % 2 = 0),
r AS (SELECT * FROM iv WHERE id % 2 = 1)
SELECT l.key, l.id AS l_id, r.id AS r_id,
  CASE
    WHEN l.e < r.s THEN 'before'
    WHEN l.e = r.s THEN 'meets'
    WHEN l.s < r.s AND r.s < l.e AND l.e < r.e THEN 'overlaps'
    WHEN l.s = r.s AND l.e < r.e THEN 'starts'
    WHEN l.s > r.s AND l.e < r.e THEN 'during'
    WHEN l.s > r.s AND l.e = r.e THEN 'finishes'
    WHEN l.s = r.s AND l.e = r.e THEN 'equals'
    WHEN r.e < l.s THEN 'after'
    WHEN r.e = l.s THEN 'met_by'
    WHEN r.s < l.s AND l.s < r.e AND r.e < l.e THEN 'overlapped_by'
    WHEN l.s = r.s AND l.e > r.e THEN 'started_by'
    WHEN l.s < r.s AND l.e > r.e THEN 'contains'
    WHEN l.s < r.s AND l.e = r.e THEN 'finished_by'
  END AS relation
FROM l JOIN r ON l.key = r.key
ORDER BY l.key, l_id, r_id
"""


def q192_kg_repair_pipeline(sf_dir: str):
    """KG REPAIR capstone — the full entity-resolution + conflict-
    repair composition, every stage streaming: customers arrive under
    two system aliases (a:K for all, b:K for every 4th) sharing an IFP
    phone signature; (1) owl.entail_inverse_functional derives the
    sameAs links, (2) sameas.apply_sameas folds both aliases onto the
    canonical id, (3) owl.functional_violations counts the resulting
    segment conflicts (every merged entity holds the true value AND
    system B's corrupted 'seg?' variant), (4) fusion.resolve_conflicts
    (vote, min-object tie-break) repairs to one value — provably the
    true one ('X' < 'X?') — and a post-repair violation scan asserting
    ZERO is part of the pipeline.  Output: every entity's repaired
    segment + its pre-repair distinct-object count.  Oracle: the
    repaired end state in plain SQL."""
    from ..stages.fusion import resolve_conflicts
    from ..stages.joins import coalesce_for_join
    from ..stages.owl import (entail_inverse_functional,
                              functional_violations)
    from ..stages.sameas import apply_sameas

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def facts(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        a = pd.DataFrame({
            "s": "a:" + df["c_custkey"].astype(str), "p": "segment",
            "o": df["c_mktsegment"].astype(str)})
        dup = df[df["c_custkey"] % 4 == 0]
        bb = pd.DataFrame({
            "s": "b:" + dup["c_custkey"].astype(str), "p": "segment",
            "o": dup["c_mktsegment"].astype(str) + "?"})
        return pd.concat([a, bb], ignore_index=True)

    def phones(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        sig = "sig:" + df["c_custkey"].astype(str)
        a = pd.DataFrame({"s": "a:" + df["c_custkey"].astype(str),
                          "p": "phone_sig", "o": sig})
        dup = df[df["c_custkey"] % 4 == 0]
        bb = pd.DataFrame({"s": "b:" + dup["c_custkey"].astype(str),
                           "p": "phone_sig",
                           "o": "sig:" + dup["c_custkey"].astype(str)})
        return pd.concat([a, bb], ignore_index=True)

    ifp_decl = ray.data.from_items(
        [{"s": "phone_sig", "p": "a", "o": "InverseFunctionalProperty"}])
    fp_decl = ray.data.from_items(
        [{"s": "segment", "p": "a", "o": "FunctionalProperty"}])

    links = entail_inverse_functional(
        cust.map_batches(phones, batch_format="pyarrow").union(ifp_decl))
    merged = apply_sameas(
        cust.map_batches(facts, batch_format="pyarrow"),
        links, left_col="s", right_col="o").materialize()

    pre = functional_violations(merged.union(fp_decl)).materialize()
    repaired = resolve_conflicts(merged, strategy="vote").materialize()
    post = functional_violations(repaired.union(fp_decl))
    n_post = post.count()
    if n_post != 0:
        raise AssertionError(
            f"repair left {n_post} functional violations")

    num_partitions = max(2, int(ray.cluster_resources()
                                .get("CPU", 4)) // 2)
    viol = pre.map_batches(
        lambda b: pa.table({"s": b.column("s"),
                            "n_objects": b.column("n_objects")}),
        batch_format="pyarrow")
    j = coalesce_for_join(repaired, num_partitions).join(
        coalesce_for_join(viol.materialize(), num_partitions),
        join_type="left_outer", num_partitions=num_partitions,
        on=("s",), right_on=("s",))

    def finish(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "entity": df["s"].astype(str),
            "segment": df["o"].astype(str),
            "pre_objects": df["n_objects"].fillna(1).astype("int64")})

    out = j.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("entity").reset_index(drop=True)


Q192_SQL = """
SELECT 'a:' || c_custkey AS entity, c_mktsegment AS segment,
       CAST(CASE WHEN c_custkey % 4 = 0 THEN 2 ELSE 1 END AS BIGINT)
         AS pre_objects
FROM customer
ORDER BY entity
"""


def q193_landmark_hops(sf_dir: str):
    """Per-landmark hop distances (stages/graph.py:multi_source_hops):
    every sampled part seed's min-hop distance to each node within 2
    hops of the part<->supplier graph — the landmark distance-feature
    operator (per-seed BFS state keyed (seed, node), nothing
    broadcast; the seed set is the bounded landmark sample).  Oracle:
    seed-tracking recursive CTE + grouped min."""
    from ..stages.graph import multi_source_hops

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def both_dirs(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().drop_duplicates()
        p = df["l_partkey"].to_numpy("int64")
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        s = -(df["l_suppkey"].to_numpy("int64") + 1)
        return pd.DataFrame({"src": np.concatenate([p, s]),
                             "dst": np.concatenate([s, p])})

    edges = (li.map_batches(both_dirs, batch_format="pyarrow")
             .groupby(["src", "dst"]).count().drop_columns(["count()"]))
    seeds = li.map_batches(
        lambda b: pd.DataFrame({"node": pd.unique(
            b.column("l_partkey").to_pandas()[
                (b.column("l_partkey").to_pandas() % 100 == 0)]
        ).astype("int64")}),
        batch_format="pyarrow")
    out = multi_source_hops(edges, seeds, k=2).to_pandas()
    out = out.astype("int64")
    return (out.sort_values(["seed", "node"]).reset_index(drop=True))


Q193_SQL = """
WITH RECURSIVE
e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (SELECT p AS src, -(s + 1) AS dst FROM e
          UNION ALL SELECT -(s + 1), p FROM e),
seeds AS (SELECT DISTINCT l_partkey AS n FROM lineitem
          WHERE l_partkey % 100 = 0),
walk(seed, node, hops) AS (
  SELECT n, n, 0 FROM seeds
  UNION
  SELECT w.seed, ed.dst, w.hops + 1
  FROM walk w JOIN edges ed ON ed.src = w.node WHERE w.hops < 2
)
SELECT seed, node, CAST(min(hops) AS BIGINT) AS hops
FROM walk GROUP BY seed, node ORDER BY seed, node
"""


def q194_shacl_closed(sf_dir: str):
    """SHACL sh:closed validation (stages/shacl.py:validate_shapes,
    'closed' kind): supplier nodes may carry only located_in + name —
    every 5th supplier's legacy 'deprecated_field' edge is flagged
    with the offending predicate and value, per triple, in the same
    one-subject-bucket exchange as every other constraint.  Oracle:
    the violating triples in plain SQL."""
    from ..stages.shacl import Shape, validate_shapes

    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey", "s_name"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = "supp:" + df["s_suppkey"].astype(str)
        parts = [
            pd.DataFrame({"s": s, "p": "type", "o": "Supplier"}),
            pd.DataFrame({"s": s, "p": "located_in",
                          "o": "nation:" + df["s_nationkey"].astype(str)}),
            pd.DataFrame({"s": s, "p": "name",
                          "o": df["s_name"].astype(str)}),
        ]
        old = df[df["s_suppkey"] % 5 == 0]
        parts.append(pd.DataFrame({
            "s": "supp:" + old["s_suppkey"].astype(str),
            "p": "deprecated_field",
            "o": (old["s_suppkey"] % 7).astype(str)}))
        return pd.concat(parts, ignore_index=True)

    store = supp.map_batches(to_triples, batch_format="pyarrow")
    shape = Shape("supplier_closed", "Supplier",
                  [("closed", None, ["located_in", "name"])])
    out = validate_shapes(store, [shape]).to_pandas()
    cols = ["node", "shape", "constraint", "pred", "detail"]
    out = out[cols].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


Q194_SQL = """
SELECT 'supp:' || s_suppkey AS node,
       'supplier_closed' AS shape, 'closed' AS constraint,
       'deprecated_field' AS pred,
       CAST(s_suppkey % 7 AS VARCHAR) AS detail
FROM supplier WHERE s_suppkey % 5 = 0
ORDER BY node, detail
"""


def q195_subclass_instance_retrieval(sf_dir: str):
    """Ontology-aware instance retrieval as ONE pure BGP — no
    materialized entailment: ?x type/subclass{0,3} reg:2 finds both
    customers whose nation's taxonomy rolls up into region 2 (one
    subclass hop) and the sampled customers typed directly at region
    level (zero hops), composing the sequence path with a quantified
    range element (stages/bgp.py path machinery end to end).  Oracle:
    the taxonomy unrolled as joins."""
    from ..stages.bgp import match_bgp

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])

    def cust_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        base = pd.DataFrame({
            "s": "cust:" + df["c_custkey"].astype(str), "p": "type",
            "o": "nat:" + df["c_nationkey"].astype(str)})
        direct = df[df["c_custkey"] % 100 == 0]
        extra = pd.DataFrame({
            "s": "cust:" + direct["c_custkey"].astype(str), "p": "type",
            "o": "reg:" + (direct["c_custkey"] % 5).astype(str)})
        return pd.concat([base, extra], ignore_index=True)

    def nat_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        up = pd.DataFrame({
            "s": "nat:" + df["n_nationkey"].astype(str), "p": "subclass",
            "o": "reg:" + df["n_regionkey"].astype(str)})
        top = pd.DataFrame({
            "s": "reg:" + df["n_regionkey"].astype(str).unique(),
            "p": "subclass", "o": "world"})
        return pd.concat([up, top], ignore_index=True)

    store = (cust.map_batches(cust_triples, batch_format="pyarrow")
             .union(nat.map_batches(nat_triples,
                                    batch_format="pyarrow")))
    out = match_bgp(store, [("?x", "type/subclass{0,3}", "reg:2")],
                    cast_nodes=False).to_pandas()
    return (pd.DataFrame({"x": out["x"].astype(str)})
            .sort_values("x").reset_index(drop=True))


Q195_SQL = """
SELECT DISTINCT x FROM (
  SELECT 'cust:' || c.c_custkey AS x
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE n.n_regionkey = 2
  UNION ALL
  SELECT 'cust:' || c_custkey FROM customer
  WHERE c_custkey % 100 = 0 AND c_custkey % 5 = 2
)
ORDER BY x
"""


def q196_wl_quotient_graph(sf_dir: str):
    """Structural graph summarization by WL quotient — PURE COMPOSITION
    of two existing operators: wl_refinement assigns every node its
    1-round WL color, class_summary (typing each node by its color)
    folds the edge set into the quotient multigraph (color_u, adj,
    color_v, n).  The quotient is the compressed schema-level view of
    a structure-regular graph (all leaves collapse to one node, etc).
    Oracle: the q188 refinement CTE joined back onto the edges."""
    from ..stages.graph import wl_refinement
    from ..stages.kgprep import class_summary

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().drop_duplicates()
        df = df[df["l_partkey"] % 25 == 0]
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        return pd.DataFrame({"a": df["l_partkey"].to_numpy("int64"),
                             "b": -(df["l_suppkey"].to_numpy("int64") + 1)})

    edges = (li.map_batches(pairs, batch_format="pyarrow")
             .groupby(["a", "b"]).count().drop_columns(["count()"])
             .materialize())
    colors = wl_refinement(edges, rounds=1)

    def typing(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"s": df["node"].astype(str), "p": "a",
                             "o": df["color"].astype(str)})

    def data(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"s": df["a"].astype(str), "p": "adj",
                             "o": df["b"].astype(str)})

    store = (colors.map_batches(typing, batch_format="pyarrow")
             .union(edges.map_batches(data, batch_format="pyarrow")))
    out = class_summary(store).to_pandas()
    out["n"] = out["n"].astype("int64")
    cols = ["s_type", "p", "o_type"]
    return (out[cols + ["n"]].astype({c: str for c in cols})
            .sort_values(cols).reset_index(drop=True))


Q196_SQL = """
WITH e0 AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
  WHERE l_partkey % 25 = 0
),
pairs AS (SELECT p AS a, -(s + 1) AS b FROM e0),
e AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
c0 AS (
  SELECT u AS node, md5(CAST(count(*) AS VARCHAR)) AS c
  FROM e GROUP BY u
),
c1 AS (
  SELECT e.u AS node,
         md5(max(s.c) || '|' || string_agg(n.c, ',' ORDER BY n.c)) AS c
  FROM e JOIN c0 n ON n.node = e.v JOIN c0 s ON s.node = e.u
  GROUP BY e.u
)
SELECT ca.c AS s_type, 'adj' AS p, cb.c AS o_type,
       CAST(count(*) AS BIGINT) AS n
FROM pairs
JOIN c1 ca ON ca.node = pairs.a
JOIN c1 cb ON cb.node = pairs.b
GROUP BY ca.c, cb.c
ORDER BY s_type, p, o_type
"""


def q197_shortest_path_trace(sf_dir: str):
    """Shortest-path RECONSTRUCTION (stages/graph.py:
    k_hop_min_cost_pred + trace_path): cheapest <=6-hop route from
    part 25 to node -1 (supplier 0 under the -(s+1) signed encoding)
    over the sampled part<->supplier graph with
    deterministic endpoint-hash weights.  The predecessor rides the
    SAME grouped-min fold as the cost (combo = cost*2^32 +
    zigzag(via): min combo = min cost, min-zigzag tie-break — SQL-
    replayable); the trace pulls only the chain rows to the driver.
    Oracle: 6 unrolled relaxation CTEs (a recursive CTE would
    enumerate paths — the q120 lesson), the same zigzag argmin, and a
    recursive pred walk."""
    from ..stages.graph import k_hop_min_cost_pred, trace_path

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def both_dirs(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().drop_duplicates()
        df = df[df["l_partkey"] % 25 == 0]
        p = df["l_partkey"].to_numpy("int64")
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        s = -(df["l_suppkey"].to_numpy("int64") + 1)
        w = ((np.abs(p) + np.abs(s)) % 7 + 1).astype("int64")
        return pd.DataFrame({"src": np.concatenate([p, s]),
                             "dst": np.concatenate([s, p]),
                             "w": np.concatenate([w, w])})

    edges = (li.map_batches(both_dirs, batch_format="pyarrow")
             .groupby(["src", "dst"]).min("w")
             .map_batches(
                 lambda b: b.rename_columns(["src", "dst", "w"]),
                 batch_format="pyarrow"))
    pred = k_hop_min_cost_pred(
        edges, ray.data.from_items([{"node": 25}]), k=6)
    return trace_path(pred, source=25, target=-1)


_Q197_RELAX = """,
c{i} AS MATERIALIZED (SELECT node, min(cost) AS cost FROM (
  SELECT node, cost FROM c{j}
  UNION ALL
  SELECT ew.v, c{j}.cost + ew.w FROM c{j} JOIN ew ON ew.u = c{j}.node
) GROUP BY node)"""

Q197_SQL = """
WITH RECURSIVE
e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
       WHERE l_partkey % 25 = 0),
pairs AS (SELECT p AS a, -(s + 1) AS b FROM e0),
ew AS MATERIALIZED (
       SELECT a AS u, b AS v, (abs(a) + abs(b)) % 7 + 1 AS w FROM pairs
       UNION ALL
       SELECT b, a, (abs(a) + abs(b)) % 7 + 1 FROM pairs),
c0 AS (SELECT CAST(25 AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost)""" \
    + "".join(_Q197_RELAX.format(i=i, j=i - 1) for i in range(1, 7)) + """,
predd AS (
  SELECT ew.v AS node,
         min(CASE WHEN ew.u >= 0 THEN 2*ew.u ELSE -2*ew.u - 1 END) AS zv
  FROM ew JOIN c6 bu ON bu.node = ew.u JOIN c6 bv ON bv.node = ew.v
  WHERE bu.cost + ew.w = bv.cost
  GROUP BY ew.v
),
walk(step, node) AS (
  SELECT 0, CAST(-1 AS BIGINT)
  UNION ALL
  SELECT w.step + 1,
         CASE WHEN p.zv % 2 = 0 THEN p.zv // 2
              ELSE -((p.zv + 1) // 2) END
  FROM walk w JOIN predd p ON p.node = w.node
  WHERE w.node <> 25 AND w.step < 64
)
SELECT CAST(w.step AS BIGINT) AS step, w.node AS node, b.cost AS cost
FROM walk w JOIN c6 b ON b.node = w.node
ORDER BY step
"""


def q198_landmark_closeness(sf_dir: str):
    """Bounded closeness centrality from landmarks — a COMPOSITION:
    q193's multi_source_hops stream feeds a combiner-first per-seed
    fold (count + hop sum pre-aggregated per batch before one tiny
    grouped merge), closeness kept exact in integer ppm:
    (1e6 * (reached - 1)) // sum_hops (non-negative, floor ==
    truncate).  Oracle: the q193 CTE grouped per seed."""
    from ..stages.graph import multi_source_hops

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def both_dirs(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().drop_duplicates()
        p = df["l_partkey"].to_numpy("int64")
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        s = -(df["l_suppkey"].to_numpy("int64") + 1)
        return pd.DataFrame({"src": np.concatenate([p, s]),
                             "dst": np.concatenate([s, p])})

    edges = (li.map_batches(both_dirs, batch_format="pyarrow")
             .groupby(["src", "dst"]).count().drop_columns(["count()"]))
    seeds = li.map_batches(
        lambda b: pd.DataFrame({"node": pd.unique(
            b.column("l_partkey").to_pandas()[
                (b.column("l_partkey").to_pandas() % 100 == 0)]
        ).astype("int64")}),
        batch_format="pyarrow")
    hops = multi_source_hops(edges, seeds, k=2)

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return (df.groupby("seed", sort=False)
                .agg(reached=("node", "size"), sum_hops=("hops", "sum"))
                .reset_index())

    parts = hops.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("seed", sort=False)[["reached", "sum_hops"]]
           .sum().reset_index())
    agg = agg.astype("int64")
    agg["closeness_ppm"] = np.where(
        agg["sum_hops"] > 0,
        (1_000_000 * (agg["reached"] - 1)) // np.maximum(
            agg["sum_hops"], 1),
        np.int64(0)).astype("int64")
    return agg.sort_values("seed").reset_index(drop=True)


Q198_SQL = """
WITH RECURSIVE
e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (SELECT p AS src, -(s + 1) AS dst FROM e
          UNION ALL SELECT -(s + 1), p FROM e),
seeds AS (SELECT DISTINCT l_partkey AS n FROM lineitem
          WHERE l_partkey % 100 = 0),
walk(seed, node, hops) AS (
  SELECT n, n, 0 FROM seeds
  UNION
  SELECT w.seed, ed.dst, w.hops + 1
  FROM walk w JOIN edges ed ON ed.src = w.node WHERE w.hops < 2
),
best AS (SELECT seed, node, min(hops) AS hops
         FROM walk GROUP BY seed, node)
SELECT seed, CAST(count(*) AS BIGINT) AS reached,
       CAST(sum(hops) AS BIGINT) AS sum_hops,
       CAST(CASE WHEN sum(hops) > 0
            THEN (1000000 * (count(*) - 1)) // sum(hops)
            ELSE 0 END AS BIGINT) AS closeness_ppm
FROM best GROUP BY seed ORDER BY seed
"""


def q199_interval_coalesce(sf_dir: str):
    """Interval coalescing (stages/temporal_kg.py:coalesce_intervals):
    each customer's order validity spans (the q191 construction)
    merged into maximal islands — overlapping or touching [start, end)
    epoch-us spans collapse, with the merged-span count.  One
    key-bucket exchange, gaps-and-islands vectorized across every key
    in the bucket at once.  Oracle: window cummax islands."""
    from ..stages.temporal_kg import coalesce_intervals

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def iv(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        start = (df["o_orderdate"].astype("datetime64[us]")
                 .astype("int64"))
        span = (df["o_orderkey"].to_numpy("int64") % 30 + 1) \
            * 86_400_000_000
        return pd.DataFrame({
            "key": df["o_custkey"].astype(str),
            "start": start.to_numpy(),
            "end": start.to_numpy() + span})

    out = coalesce_intervals(
        orders.map_batches(iv, batch_format="pyarrow")).to_pandas()
    out["key"] = out["key"].astype(str)
    for c in ("start", "end", "n_merged"):
        out[c] = out[c].astype("int64")
    return (out[["key", "start", "end", "n_merged"]]
            .sort_values(["key", "start"]).reset_index(drop=True))


Q199_SQL = """
WITH iv AS (
  SELECT CAST(o_custkey AS VARCHAR) AS key,
         epoch_us(o_orderdate) AS s,
         epoch_us(o_orderdate)
           + (o_orderkey % 30 + 1) * 86400000000 AS e
  FROM orders
),
m AS (
  SELECT key, s, e,
         max(e) OVER (PARTITION BY key ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max
  FROM iv
),
isl AS (
  SELECT key, s, e,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY key ORDER BY s, e) AS island
  FROM m
)
SELECT key, CAST(min(s) AS BIGINT) AS start,
       CAST(max(e) AS BIGINT) AS "end",
       CAST(count(*) AS BIGINT) AS n_merged
FROM isl GROUP BY key, island
ORDER BY key, start
"""


def q200_kg_construct_capstone(sf_dir: str):
    """FULL KG-construction capstone — one pipeline through the whole
    surface, every stage streaming: (1) R2RML-lite triplify of the
    customer + nation tables (read-pruned via TripleMap.columns), (2)
    rule entailment deriving each customer's region (apply_rule chain),
    (3) SHACL gate (segment in_set — BUILDING is flagged), (4) dense
    entity + relation dictionaries over the closed store
    (encode_entities: distinct fold + distributed prefix scan), (5)
    VoID class summary.  Output: the per-stage metric rows the
    pipeline's health dashboard would chart.  Oracle: each metric
    derived relationally."""
    from ..stages.bgp import apply_rule
    from ..stages.kgprep import (class_summary, encode_entities,
                                 encode_relations)
    from ..stages.shacl import Shape, validate_shapes
    from ..stages.triplify import TripleMap, col, const, node, triplify

    cmap = TripleMap(
        subject=node("cust", "c_custkey"),
        mappings=[("type", const("Customer")),
                  ("segment", col("c_mktsegment")),
                  ("in_nation", node("nat", "c_nationkey"))])
    nmap = TripleMap(
        subject=node("nat", "n_nationkey"),
        mappings=[("type", const("Nation")),
                  ("in_region", node("reg", "n_regionkey"))])
    cust = _read(sf_dir, "customer", cmap.columns())
    nat = _read(sf_dir, "nation", nmap.columns())

    store = (triplify(cust, cmap).union(triplify(nat, nmap))
             .materialize())
    n_triples = store.count()

    ent = apply_rule(
        store, [("?x", "in_nation", "?n"), ("?n", "in_region", "?r")],
        ("?x", "in_region", "?r"), cast_nodes=False).materialize()
    n_entailed = ent.count()
    full = store.union(ent).materialize()

    shape = Shape("customer", "Customer", [
        ("in_set", "segment",
         ["AUTOMOBILE", "FURNITURE", "MACHINERY", "HOUSEHOLD"])])
    n_violations = validate_shapes(
        store, [shape], type_pred="type").count()

    n_entities = encode_entities(full).count()
    n_relations = len(encode_relations(full))
    n_summary = class_summary(full, type_pred="type").count()

    return pd.DataFrame({
        "metric": ["n_entailed", "n_entities", "n_relations",
                   "n_summary_classes", "n_triples", "n_violations"],
        "value": pd.Series([n_entailed, n_entities, n_relations,
                            n_summary, n_triples, n_violations],
                           dtype="int64")})


Q200_SQL = """
SELECT metric, CAST(value AS BIGINT) AS value FROM (
  SELECT 'n_triples' AS metric,
         3 * (SELECT count(*) FROM customer)
           + 2 * (SELECT count(*) FROM nation) AS value
  UNION ALL
  SELECT 'n_entailed', (SELECT count(*) FROM customer)
  UNION ALL
  SELECT 'n_violations',
         (SELECT count(*) FROM customer
          WHERE c_mktsegment = 'BUILDING')
  UNION ALL
  SELECT 'n_entities',
         (SELECT count(*) FROM customer)
           + (SELECT count(*) FROM nation)
           + (SELECT count(DISTINCT n_regionkey) FROM nation)
           + (SELECT count(DISTINCT c_mktsegment) FROM customer) + 2
  UNION ALL
  SELECT 'n_relations', 4
  UNION ALL
  SELECT 'n_summary_classes', 4
)
ORDER BY metric
"""


def q201_bisimulation_quotient(sf_dir: str):
    """Coarsest bisimulation quotient (stages/graph.py:wl_refinement
    rounds=None): WL refinement iterated to FIXPOINT over the sampled
    part<->supplier graph — classes only split, so one unchanged
    distinct-color count means convergence (cheap grouped count per
    round, max_rounds-guarded).  Output: the class-size histogram
    (how many structural roles the graph has, and how populated).
    Rows-only: the round count is data-dependent, so there is no
    fixed-depth SQL equivalent — pinned by golden value hash."""
    from ..stages.graph import wl_refinement

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().drop_duplicates()
        df = df[df["l_partkey"] % 25 == 0]
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        return pd.DataFrame({"a": df["l_partkey"].to_numpy("int64"),
                             "b": -(df["l_suppkey"].to_numpy("int64") + 1)})

    edges = (li.map_batches(pairs, batch_format="pyarrow")
             .groupby(["a", "b"]).count().drop_columns(["count()"]))
    colors = wl_refinement(edges, rounds=None)
    sizes = (colors.groupby("color").count().to_pandas()
             .rename(columns={"count()": "class_size"}))
    out = (sizes.groupby("class_size").size()
           .rename("n_classes").reset_index())
    out = out.astype("int64")
    return (out.sort_values("class_size").reset_index(drop=True))


def q202_incremental_shacl(sf_dir: str):
    """Incremental SHACL maintenance (state/snapshot_shacl.py): even
    suppliers play the validated corpus (committed into a fresh
    bucketed subject-hash state dir), odd suppliers + updates to every
    10th even one the arriving snapshot.  Only TOUCHED subjects are
    re-checked against their full (state + snapshot) history — the
    snapshot takes one subject-bucket exchange, each bucket reads just
    its own state files filtered to touched subjects (predicate
    pushdown over s-sorted row groups); accumulated state is never
    reshuffled.  Output: the violation delta — updated evens gain a
    max_count conflict, sampled odd arrivals miss located_in.  Oracle:
    both violation classes in plain SQL."""
    import tempfile

    from ..stages.shacl import Shape
    from ..state.snapshot_shacl import (commit_snapshot,
                                        incremental_validate)

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def base_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["s_suppkey"] % 2 == 0]
        s = "supp:" + df["s_suppkey"].astype(str)
        return pd.concat([
            pd.DataFrame({"s": s, "p": "type", "o": "Supplier"}),
            pd.DataFrame({"s": s, "p": "located_in",
                          "o": "nation:" + df["s_nationkey"].astype(str)}),
        ], ignore_index=True)

    def day1_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        odd = df[df["s_suppkey"] % 2 == 1]
        so = "supp:" + odd["s_suppkey"].astype(str)
        parts = [pd.DataFrame({"s": so, "p": "type", "o": "Supplier"})]
        placed = odd[odd["s_suppkey"] % 7 != 0]  # %7==0 stay placeless
        parts.append(pd.DataFrame({
            "s": "supp:" + placed["s_suppkey"].astype(str),
            "p": "located_in",
            "o": "nation:" + placed["s_nationkey"].astype(str)}))
        upd = df[df["s_suppkey"] % 10 == 0]  # touched evens: 2nd edge
        parts.append(pd.DataFrame({
            "s": "supp:" + upd["s_suppkey"].astype(str),
            "p": "located_in",
            "o": "nation:" + ((upd["s_nationkey"] + 1) % 25).astype(str)}))
        return pd.concat(parts, ignore_index=True)

    base = supp.map_batches(base_triples, batch_format="pyarrow")
    day1 = supp.map_batches(day1_triples, batch_format="pyarrow")
    shapes = [Shape("supplier", "Supplier",
                    [("min_count", "located_in", 1),
                     ("max_count", "located_in", 1)])]

    state_dir = tempfile.mkdtemp(prefix="snapshacl_", dir="/tmp")
    try:
        commit_snapshot(base, state_dir, "base")
        out = incremental_validate(day1, shapes, state_dir).to_pandas()
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
    cols = ["node", "shape", "constraint", "pred", "detail"]
    out = out[cols].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


Q202_SQL = """
SELECT node, shape, "constraint", pred, detail FROM (
  SELECT 'supp:' || s_suppkey AS node, 'supplier' AS shape,
         'max_count' AS "constraint", 'located_in' AS pred,
         '2' AS detail
  FROM supplier WHERE s_suppkey % 10 = 0
  UNION ALL
  SELECT 'supp:' || s_suppkey, 'supplier', 'min_count', 'located_in',
         '0'
  FROM supplier WHERE s_suppkey % 2 = 1 AND s_suppkey % 7 = 0
)
ORDER BY node, shape, "constraint", pred, detail
"""


def q203_butterfly_count(sf_dir: str):
    """Bipartite BUTTERFLY (4-cycle) census — the bipartite graph's
    triangle analog (part<->supplier graphs have no triangles at all):
    butterflies = sum over co-supplied part pairs of C(shared, 2).
    Pure composition: graph.cooccurrence_edges (supplier-grouped pair
    generation — the d^2 blowup stays inside the vectorized kernel,
    two coarse exchanges total) + a per-batch Python-int partial fold
    (counts overflow-safe).  Oracle: self-join pair counts."""
    from ..stages.graph import cooccurrence_edges

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def sampled(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy()
        return b.filter(pa.array(pk % 5 == 0))

    pairs = cooccurrence_edges(
        li.map_batches(sampled, batch_format="pyarrow"),
        group_col="l_suppkey", item_col="l_partkey", min_count=1)

    def partial(b: pa.Table) -> pd.DataFrame:
        n = b.column("n").to_numpy().astype("int64")
        return pd.DataFrame({
            "n_pairs": pd.Series([len(n)], dtype="int64"),
            "butterflies": pd.Series(
                [int((n.astype(object) * (n - 1) // 2).sum())],
                dtype="int64")})

    parts = pairs.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "n_pairs": pd.Series([int(parts["n_pairs"].sum())],
                             dtype="int64"),
        "butterflies": pd.Series([int(parts["butterflies"].sum())],
                                 dtype="int64")})


Q203_SQL = """
WITH e AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
  WHERE l_partkey % 5 = 0
),
pr AS (
  SELECT e1.p AS a, e2.p AS b, count(*) AS n
  FROM e e1 JOIN e e2 ON e1.s = e2.s AND e1.p < e2.p
  GROUP BY e1.p, e2.p
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS butterflies
FROM pr
"""


def q204_keyed_topk(sf_dir: str):
    """Per-key top-k (stages/window.py:keyed_topk): each customer's 2
    earliest orders — SQL's row_number() <= 2, COMBINER-FIRST: every
    batch contributes at most k rows per key to the single key-bucket
    exchange, so shuffle volume is bounded by k * keys, not orders.
    Total order via the (date, key) tiebreaker.  Oracle: row_number
    window."""
    from ..stages.window import keyed_topk

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    out = keyed_topk(orders, "o_custkey",
                     [("o_orderdate", "asc"), ("o_orderkey", "asc")],
                     k=2).to_pandas()
    res = pd.DataFrame({
        "c": out["o_custkey"].astype("int64"),
        "o": out["o_orderkey"].astype("int64"),
        "d": (out["o_orderdate"].astype("datetime64[us]")
              .astype("int64"))})
    return res.sort_values(["c", "o"]).reset_index(drop=True)


Q204_SQL = """
SELECT o_custkey AS c, o_orderkey AS o,
       epoch_us(o_orderdate) AS d
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2
ORDER BY c, o
"""


def q205_stratified_hash_sample(sf_dir: str):
    """Deterministic STRATIFIED SAMPLING (the same keyed_topk operator
    with an md5 order column): 3 documents per language, chosen by
    smallest md5(doc_id) — replayable on any engine, stable under
    repartitioning, no RNG state.  The training-data primitive for
    per-stratum eval carve-outs.  Oracle: row_number over md5."""
    from ..stages.window import keyed_topk

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def add_hash(b: pa.Table) -> pd.DataFrame:
        import hashlib
        df = b.to_pandas()
        df["h"] = [hashlib.md5(str(i).encode()).hexdigest()
                   for i in df["doc_id"]]
        return df

    withh = docs.map_batches(add_hash, batch_format="pyarrow")
    out = keyed_topk(withh, "lang", [("h", "asc")], k=3).to_pandas()
    res = pd.DataFrame({"lang": out["lang"].astype(str),
                        "doc_id": out["doc_id"].astype("int64")})
    return (res.sort_values(["lang", "doc_id"])
            .reset_index(drop=True))


Q205_SQL = """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
  FROM documents
) WHERE rn <= 3
ORDER BY lang, doc_id
"""


def q206_nquads_provenance_roundtrip(sf_dir: str):
    """N-Quads interchange round trip (sources/nquads.py) + graph-
    scoped query: supplier located_in quads labeled by a parity
    provenance graph are serialized to .nq part files, read back
    (error-keeping line parse, one vectorized extract per batch), and
    queried with a 4-term BGP whose ?g VARIABLE binds the provenance
    (the q158 quad surface over real interchange IO).  Oracle: the
    parity labeling in plain SQL."""
    import tempfile

    from ..sources.nquads import read_nquads, write_nquads
    from ..stages.bgp import match_bgp

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def quads(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        par = np.where(df["s_suppkey"].to_numpy() % 2 == 0,
                       "g:even", "g:odd")
        return pd.DataFrame({
            "s": "supp:" + df["s_suppkey"].astype(str),
            "p": "located_in",
            "o": "nation:" + df["s_nationkey"].astype(str),
            "g": par, "o_kind": "iri",
            "o_datatype": None, "o_lang": None})

    out_dir = tempfile.mkdtemp(prefix="nquads_", dir="/tmp")
    try:
        man = write_nquads(supp.map_batches(quads, batch_format="pyarrow"),
                           out_dir)
        back = read_nquads(sorted(man["path"]))
        bindings = match_bgp(
            back, [("?s", "located_in", "?o", "?g")], g_col="g",
            cast_nodes=False)
        out = bindings.to_pandas().astype(str)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return (out[["s", "o", "g"]].sort_values(["s", "o", "g"])
            .reset_index(drop=True))


Q206_SQL = """
SELECT 'supp:' || s_suppkey AS s,
       'nation:' || s_nationkey AS o,
       CASE WHEN s_suppkey % 2 = 0 THEN 'g:even' ELSE 'g:odd' END AS g
FROM supplier
ORDER BY s, o, g
"""


def q207_schema_drift(sf_dir: str):
    """KG schema-drift report — predicate_profile (driver frame,
    bounded by the predicate vocabulary) computed on two snapshots and
    diffed: old = even suppliers' located_in/name triples, new = all
    suppliers with a new 'certified' predicate and a second located_in
    edge for every 10th supplier (functionality FLIP).  Each data pass
    streams (the q152 plan: counts per predicate, distinct folds keyed
    on (p, value) pairs, never the bare predicate); the diff itself is
    driver-side over the bounded profiles.  Output: one row per
    predicate with change class.  Oracle: both profiles in SQL."""
    from ..stages.kgprep import predicate_profile

    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey", "s_name"])

    def old_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["s_suppkey"] % 2 == 0]
        s = "supp:" + df["s_suppkey"].astype(str)
        return pd.concat([
            pd.DataFrame({"s": s, "p": "located_in",
                          "o": "nation:" + df["s_nationkey"].astype(str)}),
            pd.DataFrame({"s": s, "p": "name",
                          "o": df["s_name"].astype(str)}),
        ], ignore_index=True)

    def new_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = "supp:" + df["s_suppkey"].astype(str)
        parts = [
            pd.DataFrame({"s": s, "p": "located_in",
                          "o": "nation:" + df["s_nationkey"].astype(str)}),
            pd.DataFrame({"s": s, "p": "name",
                          "o": df["s_name"].astype(str)}),
            pd.DataFrame({"s": s, "p": "certified",
                          "o": np.where(df["s_suppkey"] % 3 == 0,
                                        "yes", "no")}),
        ]
        upd = df[df["s_suppkey"] % 10 == 0]
        parts.append(pd.DataFrame({
            "s": "supp:" + upd["s_suppkey"].astype(str),
            "p": "located_in",
            "o": "nation:" + ((upd["s_nationkey"] + 1) % 25).astype(str)}))
        return pd.concat(parts, ignore_index=True)

    old = predicate_profile(
        supp.map_batches(old_triples, batch_format="pyarrow"))
    new = predicate_profile(
        supp.map_batches(new_triples, batch_format="pyarrow"))
    m = old.merge(new, on="p", how="outer", suffixes=("_old", "_new"),
                  indicator=True)
    change = np.select(
        [m["_merge"] == "right_only", m["_merge"] == "left_only",
         (m["is_functional_old"] == 1) & (m["is_functional_new"] == 0),
         (m["is_functional_old"] == 0) & (m["is_functional_new"] == 1)],
        ["added", "removed", "lost_functional", "became_functional"],
        default="kept")
    out = pd.DataFrame({
        "p": m["p"].astype(str),
        "change": pd.Series(change).astype(str),
        "n_old": m["n_old"].fillna(0).astype("int64"),
        "n_new": m["n_new"].fillna(0).astype("int64")})
    return out.sort_values("p").reset_index(drop=True)


Q207_SQL = """
WITH old AS (
  SELECT 'located_in' AS p, CAST(count(*) AS BIGINT) AS n,
         1 AS func FROM supplier WHERE s_suppkey % 2 = 0
  UNION ALL
  SELECT 'name', CAST(count(*) AS BIGINT), 1
  FROM supplier WHERE s_suppkey % 2 = 0
),
new AS (
  SELECT 'located_in' AS p,
         CAST(count(*) + count(*) FILTER (WHERE s_suppkey % 10 = 0)
              AS BIGINT) AS n,
         0 AS func FROM supplier
  UNION ALL
  SELECT 'name', CAST(count(*) AS BIGINT), 1 FROM supplier
  UNION ALL
  SELECT 'certified', CAST(count(*) AS BIGINT), 1 FROM supplier
)
SELECT coalesce(old.p, new.p) AS p,
       CASE WHEN old.p IS NULL THEN 'added'
            WHEN new.p IS NULL THEN 'removed'
            WHEN old.func = 1 AND new.func = 0 THEN 'lost_functional'
            WHEN old.func = 0 AND new.func = 1 THEN 'became_functional'
            ELSE 'kept' END AS change,
       CAST(coalesce(old.n, 0) AS BIGINT) AS n_old,
       CAST(coalesce(new.n, 0) AS BIGINT) AS n_new
FROM old FULL OUTER JOIN new ON old.p = new.p
ORDER BY p
"""


def q208_property_graph_export(sf_dir: str):
    """Property-graph EXPORT round trip (stages/kgprep.py:
    export_property_graph): the customer KG splits into the
    Neo4j-bulk node table (node, label, segment — assembled in one
    subject-bucket exchange, label riding the same pivot) and a
    relationship table, both written as partitioned CSV parts and
    READ BACK through ray.data.read_csv — the full interchange cycle.
    Output: the re-imported node table.  Oracle: the node layout in
    plain SQL."""
    import tempfile

    from ..stages.kgprep import export_property_graph

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_nationkey"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = "cust:" + df["c_custkey"].astype(str)
        return pd.concat([
            pd.DataFrame({"s": s, "p": "type", "o": "Customer"}),
            pd.DataFrame({"s": s, "p": "segment",
                          "o": df["c_mktsegment"].astype(str)}),
            pd.DataFrame({"s": s, "p": "in_nation",
                          "o": "nation:" + df["c_nationkey"].astype(str)}),
        ], ignore_index=True)

    store = cust.map_batches(to_triples, batch_format="pyarrow")
    out_dir = tempfile.mkdtemp(prefix="pgexport_", dir="/tmp")
    try:
        paths = export_property_graph(
            store, out_dir, rel_preds=["in_nation"], prop_preds=["segment"])
        nodes = ray.data.read_csv(paths["nodes_dir"]).to_pandas()
        n_rels = ray.data.read_csv(paths["rels_dir"]).count()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    if n_rels != len(nodes):
        raise AssertionError(
            f"expected one in_nation rel per node: {n_rels} vs "
            f"{len(nodes)}")
    nodes = nodes[["node", "label", "segment"]].astype(str)
    return nodes.sort_values("node").reset_index(drop=True)


Q208_SQL = """
SELECT 'cust:' || c_custkey AS node, 'Customer' AS label,
       c_mktsegment AS segment
FROM customer
ORDER BY node
"""


def q209_optional_transitive(sf_dir: str):
    """OPTIONAL + transitive path COMPOSED (stages/bgp.py): for every
    sampled customer's chain-start order, OPTIONAL next_order+ binds
    every successor within the 8-hop closure cap — single-order
    customers survive with a null successor (the left-outer
    semantics), multi-order chains fan out.  Oracle: row_number chain
    positions with the SAME hop cap (rn <= 9), LEFT JOIN, -1
    sentinel."""
    from ..stages.bgp import match_bgp
    from ..stages.window import hash_bucketed_map_groups

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def sampled(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy()
        return b.filter(pa.array(ck % 20 == 0))

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, u in g.groupby("o_custkey", sort=False):
            u = u.sort_values(["o_orderdate", "o_orderkey"],
                              kind="stable")
            a = u["o_orderkey"].to_numpy("int64")
            out.append(pd.DataFrame({
                "s": a[:1], "p": "chain_start", "o": np.int64(1)}))
            if len(a) > 1:
                out.append(pd.DataFrame({
                    "s": a[:-1], "p": "next_order", "o": a[1:]}))
        if not out:
            return pd.DataFrame({"s": np.empty(0, "int64"),
                                 "p": np.empty(0, object),
                                 "o": np.empty(0, "int64")})
        return pd.concat(out, ignore_index=True)

    store = hash_bucketed_map_groups(
        orders.map_batches(sampled, batch_format="pyarrow"),
        "o_custkey", chain)
    out = match_bgp(store, [("?x", "chain_start", 1)],
                    optional=[("?x", "next_order+", "?y")]).to_pandas()
    res = pd.DataFrame({
        "x": out["x"].astype("int64"),
        "y": out["y"].fillna(-1).astype("int64")})
    return res.sort_values(["x", "y"]).reset_index(drop=True)


Q209_SQL = """
WITH nxt AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders WHERE o_custkey % 20 = 0
)
SELECT f.k AS x, coalesce(l.k, -1) AS y
FROM (SELECT * FROM nxt WHERE rn = 1) f
LEFT JOIN nxt l ON l.c = f.c AND l.rn > 1 AND l.rn <= 9
ORDER BY x, y
"""


def q210_boruvka_msf(sf_dir: str):
    """Boruvka minimum spanning forest (stages/graph.py:boruvka_msf)
    over the sampled part<->supplier graph with deterministic
    endpoint-hash weights — O(log n) rounds, each: two label joins,
    one component-bucket min-edge pick, a geometric-shrinking
    component merge.  Deterministic under ties via the (w, u, v)
    total order, so the forest is replayable run to run.  Rows-only:
    MSF is not SQL-expressible — pinned by golden hash AND an
    independent driver-side Kruskal parity test in tests/."""
    from ..stages.graph import boruvka_msf

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def weighted(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().drop_duplicates()
        df = df[df["l_partkey"] % 25 == 0]
        u = df["l_partkey"].to_numpy("int64")
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        v = -(df["l_suppkey"].to_numpy("int64") + 1)
        w = (np.abs(u) * 131 + np.abs(v) * 17) % 9973 + 1
        return pd.DataFrame({"a": u, "b": v, "w": w.astype("int64")})

    edges = (li.map_batches(weighted, batch_format="pyarrow")
             .groupby(["a", "b"]).min("w")
             .map_batches(lambda b: b.rename_columns(["a", "b", "w"]),
                          batch_format="pyarrow"))
    out = boruvka_msf(edges).to_pandas().astype("int64")
    return (out[["u", "v", "w"]].sort_values(["u", "v"])
            .reset_index(drop=True))


def q211_temporal_reachability(sf_dir: str):
    """Time-respecting reachability (stages/graph.py:
    temporal_reachability): earliest arrival at every node within 3
    edges of the seed parts, where each hop's ship date must be >= the
    arrival time at its tail (contamination-spread semantics over the
    part<->supplier graph).  Bellman-Ford-style rounds == the oracle's
    per-path edge budget; epoch-us int64 end to end.  Oracle:
    depth-guarded recursive CTE with the timestamp gate in the join."""
    from ..stages.graph import temporal_reachability

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_shipdate"])

    def both_dirs(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["l_partkey"] % 25 == 0]
        ts = (df["l_shipdate"].astype("datetime64[us]")
              .astype("int64").to_numpy())
        p = df["l_partkey"].to_numpy("int64")
        # -(s+1): keys are 0-based — bare -s collides part 0 / supplier 0
        s = -(df["l_suppkey"].to_numpy("int64") + 1)
        out = pd.DataFrame({"src": np.concatenate([p, s]),
                            "dst": np.concatenate([s, p]),
                            "ts": np.concatenate([ts, ts])})
        return out.drop_duplicates()

    edges = (li.map_batches(both_dirs, batch_format="pyarrow")
             .groupby(["src", "dst", "ts"]).count()
             .drop_columns(["count()"]))
    seeds = li.map_batches(
        lambda b: pd.DataFrame({"node": pd.unique(
            b.column("l_partkey").to_pandas()[
                (b.column("l_partkey").to_pandas() % 100 == 0)]
        ).astype("int64")}),
        batch_format="pyarrow")
    out = temporal_reachability(edges, seeds, k=3).to_pandas()
    out = out.astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q211_SQL = """
WITH RECURSIVE
e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s,
              epoch_us(l_shipdate) AS ts
       FROM lineitem WHERE l_partkey % 25 = 0),
ed AS (SELECT p AS src, -(s + 1) AS dst, ts FROM e0
       UNION ALL SELECT -(s + 1), p, ts FROM e0),
seeds AS (SELECT DISTINCT l_partkey AS n FROM lineitem
          WHERE l_partkey % 100 = 0),
walk(node, arr, d) AS (
  SELECT n, CAST(0 AS BIGINT), 0 FROM seeds
  UNION
  SELECT ed.dst, ed.ts, w.d + 1
  FROM walk w JOIN ed ON ed.src = w.node AND ed.ts >= w.arr
  WHERE w.d < 3
)
SELECT node, CAST(min(arr) AS BIGINT) AS arr
FROM walk GROUP BY node ORDER BY node
"""


def q212_personalized_pagerank(sf_dir: str):
    """Personalized PageRank / random-walk-with-restart (stages/
    graph.py:personalized_pagerank_int) from the seed parts over the
    sampled part<->supplier graph, 3 iterations — EXACT integer
    fixed-point (every step an order-insensitive integer sum or floor
    division), so the unrolled SQL oracle matches bit-for-bit where a
    float power iteration could not.  Oracle: 3 MATERIALIZED
    contribution/rank CTE pairs (the q127 exponential-inlining
    lesson)."""
    from ..stages.graph import personalized_pagerank_int

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def both_dirs(batch: pa.Table) -> pd.DataFrame:
        # -(s+1): this dataset's keys are 0-based, so a bare -s would
        # collide part 0 with supplier 0 in the signed encoding
        df = batch.to_pandas().drop_duplicates()
        df = df[df["l_partkey"] % 25 == 0]
        p = df["l_partkey"].to_numpy("int64")
        s = -(df["l_suppkey"].to_numpy("int64") + 1)
        return pd.DataFrame({"src": np.concatenate([p, s]),
                             "dst": np.concatenate([s, p])})

    edges = (li.map_batches(both_dirs, batch_format="pyarrow")
             .groupby(["src", "dst"]).count().drop_columns(["count()"]))
    seeds = li.map_batches(
        lambda b: pd.DataFrame({"node": pd.unique(
            b.column("l_partkey").to_pandas()[
                (b.column("l_partkey").to_pandas() % 100 == 0)]
        ).astype("int64")}),
        batch_format="pyarrow")
    out = personalized_pagerank_int(edges, seeds, iters=3).to_pandas()
    out = out.astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def _q212_round(i: int, j: str) -> str:
    return f""",
c{i} AS MATERIALIZED (
  SELECT x.dst AS node, sum(rr.r // dg.d) AS c
  FROM {j} rr JOIN dg ON dg.src = rr.node
  JOIN ed x ON x.src = rr.node
  GROUP BY x.dst
),
r{i} AS MATERIALIZED (
  SELECT node, r FROM (
    SELECT coalesce(c.node, z.node) AS node,
           (15 * coalesce(z.r, 0)) // 100
         + (85 * coalesce(c.c, 0)) // 100 AS r
    FROM c{i} c FULL OUTER JOIN r0 z ON z.node = c.node
  ) WHERE r > 0
)"""


Q212_SQL = """
WITH e0 AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
  WHERE l_partkey % 25 = 0
),
ed AS MATERIALIZED (SELECT p AS src, -(s + 1) AS dst FROM e0
                    UNION ALL SELECT -(s + 1), p FROM e0),
dg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS d
                    FROM ed GROUP BY src),
seeds AS (SELECT DISTINCT l_partkey AS n FROM lineitem
          WHERE l_partkey % 100 = 0),
r0 AS MATERIALIZED (
  SELECT n AS node,
         CAST(1000000000000 // (SELECT count(*) FROM seeds)
              AS BIGINT) AS r
  FROM seeds)""" \
    + "".join(_q212_round(i, f"r{i - 1}") for i in range(1, 4)) + """
SELECT node, CAST(r AS BIGINT) AS r FROM r3 ORDER BY node
"""


def q213_graph_statistics(sf_dir: str):
    """Per-NAMED-GRAPH VoID statistics over a quad store (the q158
    provenance surface's analytics side): order quads scoped to a
    per-priority graph, folded combiner-first to (g, n_triples,
    n_subjects, n_predicates) — distinct counts via per-batch local
    dedup then one (g, value)-keyed fold each, NEVER keyed on the
    bare graph (the predicate-skew rule applies to graph labels
    too).  Oracle: grouped counts."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderpriority"])

    def quads(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = "order:" + df["o_orderkey"].astype(str)
        g = "g:" + df["o_orderpriority"].astype(str)
        return pd.concat([
            pd.DataFrame({"s": s, "p": "placed_by",
                          "o": "cust:" + df["o_custkey"].astype(str),
                          "g": g}),
            pd.DataFrame({"s": s, "p": "priority",
                          "o": df["o_orderpriority"].astype(str),
                          "g": g}),
        ], ignore_index=True)

    store = orders.map_batches(quads, batch_format="pyarrow")

    def n_part(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return (df.groupby("g", sort=False).size()
                .rename("n").reset_index())

    n = (store.map_batches(n_part, batch_format="pyarrow")
         .to_pandas().groupby("g")["n"].sum())

    def distinct_count(col: str) -> pd.Series:
        from ..stages.kgprep import _distinct
        d = _distinct(store.map_batches(
            lambda b, _c=col: b.select(["g", _c]),
            batch_format="pyarrow"), ["g", col])
        parts = d.map_batches(
            lambda b: b.to_pandas().groupby("g", sort=False).size()
            .rename("n").reset_index(),
            batch_format="pyarrow").to_pandas()
        return parts.groupby("g")["n"].sum()

    ns, np_ = distinct_count("s"), distinct_count("p")
    out = pd.DataFrame({
        "g": sorted(n.index),
        "n_triples": [int(n[g]) for g in sorted(n.index)],
        "n_subjects": [int(ns[g]) for g in sorted(n.index)],
        "n_predicates": [int(np_[g]) for g in sorted(n.index)]})
    for c in ("n_triples", "n_subjects", "n_predicates"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


Q213_SQL = """
SELECT 'g:' || o_orderpriority AS g,
       CAST(2 * count(*) AS BIGINT) AS n_triples,
       CAST(count(*) AS BIGINT) AS n_subjects,
       CAST(2 AS BIGINT) AS n_predicates
FROM orders
GROUP BY o_orderpriority
ORDER BY g
"""


def q214_link_prediction_scores(sf_dir: str):
    """Neighborhood-overlap link prediction
    (stages/graph.py:link_prediction_scores): common-neighbors,
    Resource-Allocation index (integer ppm — RA instead of
    Adamic-Adar so no transcendental ln enters the oracle) and
    Jaccard over the signed part/supplier bipartite graph.  Join-free
    3-exchange shape; -(s+1) encoding (0-based keys).  Oracle: the
    membership self-join."""
    from ..stages.graph import link_prediction_scores

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def edges(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().drop_duplicates()
        df = df[df["l_partkey"] % 10 == 0]
        return pd.DataFrame({
            "a": df["l_partkey"].to_numpy("int64"),
            "b": -(df["l_suppkey"].to_numpy("int64") + 1)})

    out = link_prediction_scores(
        li.map_batches(edges, batch_format="pyarrow")).to_pandas()
    out = out.astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q214_SQL = """
WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM lineitem WHERE l_partkey % 10 = 0),
ed AS (SELECT p AS a, -(s + 1) AS b FROM e0),
mem AS (SELECT a AS z, b AS u FROM ed UNION ALL SELECT b, a FROM ed),
dg AS (SELECT z, CAST(count(*) AS BIGINT) AS d FROM mem GROUP BY z),
pairs AS (
  SELECT m1.u AS a, m2.u AS b,
         CAST(count(*) AS BIGINT) AS c,
         CAST(sum(1000000 // dg.d) AS BIGINT) AS ra
  FROM mem m1 JOIN mem m2 ON m1.z = m2.z AND m1.u < m2.u
  JOIN dg ON dg.z = m1.z
  GROUP BY m1.u, m2.u)
SELECT p.a, p.b, p.c AS common, p.ra AS ra_ppm,
       (1000000 * p.c) // (da.d + db.d - p.c) AS jaccard_ppm
FROM pairs p JOIN dg da ON da.z = p.a JOIN dg db ON db.z = p.b
ORDER BY p.a, p.b
"""


def q215_hits_scores(sf_dir: str):
    """HITS hub/authority in exact integer arithmetic
    (stages/graph.py:hits_int): unnormalized alternating-path counts
    over the directed supplier->part graph, 2 rounds — every step an
    order-insensitive integer SUM so the unrolled MATERIALIZED-CTE
    oracle replays it bit-for-bit (the q212 fixed-point
    discipline)."""
    from ..stages.graph import hits_int

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def edges(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().drop_duplicates()
        df = df[df["l_partkey"] % 8 == 0]
        return pd.DataFrame({
            "src": -(df["l_suppkey"].to_numpy("int64") + 1),
            "dst": df["l_partkey"].to_numpy("int64")})

    e = (li.map_batches(edges, batch_format="pyarrow")
         .groupby(["src", "dst"]).count().drop_columns(["count()"]))
    out = hits_int(e, rounds=2).to_pandas().astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q215_SQL = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT -(l_suppkey + 1) AS u, l_partkey AS v
  FROM lineitem WHERE l_partkey % 8 = 0),
nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
h0 AS (SELECT n, CAST(1 AS BIGINT) AS h FROM nodes),
a1 AS MATERIALIZED (
  SELECT v AS n, CAST(sum(h0.h) AS BIGINT) AS a
  FROM e JOIN h0 ON h0.n = e.u GROUP BY v),
h1 AS MATERIALIZED (
  SELECT u AS n, CAST(sum(a1.a) AS BIGINT) AS h
  FROM e JOIN a1 ON a1.n = e.v GROUP BY u),
a2 AS MATERIALIZED (
  SELECT v AS n, CAST(sum(h1.h) AS BIGINT) AS a
  FROM e JOIN h1 ON h1.n = e.u GROUP BY v),
h2 AS MATERIALIZED (
  SELECT u AS n, CAST(sum(a2.a) AS BIGINT) AS h
  FROM e JOIN a2 ON a2.n = e.v GROUP BY u)
SELECT coalesce(h2.n, a2.n) AS node,
       CAST(coalesce(h2.h, 0) AS BIGINT) AS hub,
       CAST(coalesce(a2.a, 0) AS BIGINT) AS auth
FROM h2 FULL OUTER JOIN a2 ON a2.n = h2.n
ORDER BY node
"""


def q216_shacl_qualified(sf_dir: str):
    """SHACL sh:qualifiedValueShape + qualifiedMin/MaxCount
    (stages/shacl.py 'qualified' kind): each customer must own
    BETWEEN 1 AND 3 orders whose status conforms to the inner
    in_set({'F'}) shape — counting only CONFORMING values, with
    zero-order customers violating the min side (the qualified
    counting semantics a bare min_count/in_set pair cannot express).
    Oracle: conforming-count per customer filtered to the
    out-of-range band."""
    from ..stages.shacl import Shape, validate_shapes

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])

    def cust_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "s": "cust:" + df["c_custkey"].astype(str),
            "p": "type", "o": "Customer"})

    def order_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "s": "cust:" + df["o_custkey"].astype(str),
            "p": "order_status", "o": df["o_orderstatus"].astype(str)})

    store = cust.map_batches(
        cust_triples, batch_format="pyarrow").union(
        orders.map_batches(order_triples, batch_format="pyarrow"))
    shape = Shape("active_customer", "Customer",
                  [("qualified", "order_status", ("in_set", ["F"]),
                    1, 3)])
    out = validate_shapes(store, [shape]).to_pandas()
    cols = ["node", "shape", "constraint", "pred", "detail"]
    out = out[cols].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


Q216_SQL = """
WITH cnt AS (
  SELECT c.c_custkey,
         count(o.o_orderkey)
           FILTER (o.o_orderstatus = 'F') AS n
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
SELECT 'cust:' || c_custkey AS node,
       'active_customer' AS shape, 'qualified' AS "constraint",
       'order_status' AS pred, CAST(n AS VARCHAR) AS detail
FROM cnt WHERE n < 1 OR n > 3
ORDER BY node, detail
"""


def q217_segment_dedup_corpus(sf_dir: str):
    """Corpus-wide segment-level exact dedup
    (stages/dedup.py:segment_dedup_docs — the RefinedWeb paragraph-
    dedup shape, separator-parameterized because this corpus has no
    newlines): every ' table '-delimited segment survives only at its
    first (doc_id, idx) occurrence, documents rebuilt from survivors;
    hash exchange carries coordinates only, segment bytes ride the
    narrow doc exchange once.  Oracle: zip-unnest + QUALIFY keep-first
    + ordered string_agg."""
    from ..stages.dedup import segment_dedup_docs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = segment_dedup_docs(docs, sep=" table ").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["text"] = out["text"].astype(str)
    return out.sort_values("doc_id").reset_index(drop=True)


Q217_SQL = """
WITH segs AS (
  SELECT doc_id,
         unnest(string_split(coalesce(text, ''), ' table ')) AS seg,
         unnest(range(len(string_split(coalesce(text, ''), ' table '))))
           AS idx
  FROM documents),
keep AS (
  SELECT doc_id, idx, seg FROM segs
  QUALIFY row_number() OVER (PARTITION BY seg
                             ORDER BY doc_id, idx) = 1),
rebuilt AS (
  SELECT doc_id, string_agg(seg, ' table ' ORDER BY idx) AS text
  FROM keep GROUP BY doc_id)
SELECT d.doc_id, coalesce(r.text, '') AS text
FROM documents d LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q218_inverse_property_entailment(sf_dir: str):
    """owl:inverseOf entailment (stages/owl.py:entail_inverse,
    prp-inv1/prp-inv2): the declaration (placed_by, inverseOf,
    placed) flips data triples in BOTH directions through one
    streaming swap-and-rename pass — no shuffle, declarations ride in
    as a dict.  Oracle: the two flipped projections unioned."""
    from ..stages.owl import entail_inverse

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        fwd = df[df["o_orderkey"] % 3 == 0]
        rev = df[df["o_orderkey"] % 3 == 1]
        return pd.concat([
            pd.DataFrame({
                "s": "order:" + fwd["o_orderkey"].astype(str),
                "p": "placed_by",
                "o": "cust:" + fwd["o_custkey"].astype(str)}),
            pd.DataFrame({
                "s": "cust:" + rev["o_custkey"].astype(str),
                "p": "placed",
                "o": "order:" + rev["o_orderkey"].astype(str)}),
            pd.DataFrame({"s": ["placed_by"], "p": ["inverseOf"],
                          "o": ["placed"]}),
        ], ignore_index=True)

    store = orders.map_batches(to_triples, batch_format="pyarrow")
    out = entail_inverse(store).to_pandas().astype(str)
    return (out.sort_values(["s", "p", "o"])
            .drop_duplicates().reset_index(drop=True))


Q218_SQL = """
SELECT * FROM (
  SELECT DISTINCT 'cust:' || o_custkey AS s, 'placed' AS p,
         'order:' || o_orderkey AS o
  FROM orders WHERE o_orderkey % 3 = 0
  UNION
  SELECT DISTINCT 'order:' || o_orderkey, 'placed_by',
         'cust:' || o_custkey
  FROM orders WHERE o_orderkey % 3 = 1)
ORDER BY s, p, o
"""


def q219_within_doc_segment_dedup(sf_dir: str):
    """WITHIN-document segment dedup
    (stages/dedup.py:dedup_segments_within_doc — the C4/Gopher
    line-dedup family): repeated ' value '-delimited segments inside
    one document drop, first occurrence kept, order preserved.
    Purely row-local (no shuffle).  Oracle: per-doc QUALIFY keep-first
    + ordered string_agg."""
    from ..stages.dedup import dedup_segments_within_doc

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup_segments_within_doc(docs, sep=" value ").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["text"] = out["text"].astype(str)
    return (out[["doc_id", "text"]].sort_values("doc_id")
            .reset_index(drop=True))


Q219_SQL = """
WITH segs AS (
  SELECT doc_id,
         unnest(string_split(coalesce(text, ''), ' value ')) AS seg,
         unnest(range(len(string_split(coalesce(text, ''), ' value '))))
           AS idx
  FROM documents),
keep AS (
  SELECT doc_id, idx, seg FROM segs
  QUALIFY row_number() OVER (PARTITION BY doc_id, seg
                             ORDER BY idx) = 1)
SELECT doc_id, string_agg(seg, ' value ' ORDER BY idx) AS text
FROM keep GROUP BY doc_id
ORDER BY doc_id
"""




def q220_has_value_entailment(sf_dir: str):
    """owl:hasValue restriction entailment in BOTH directions
    (stages/owl.py:entail_has_value, cls-hv1 + cls-hv2): an Urgent
    restriction (onProperty order_priority, hasValue '1-URGENT')
    types every urgent order (hv1) and materializes the priority
    triple for every asserted-Urgent order (hv2).  Declarations
    broadcast; no shuffle.  Oracle: the two projections unioned."""
    from ..stages.owl import entail_has_value

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        k = df["o_orderkey"].astype(str)
        parts = [
            pd.DataFrame({"s": "order:" + k, "p": "prio",
                          "o": df["o_orderpriority"].astype(str)}),
            pd.DataFrame({"s": "order:" + k[df["o_orderkey"] % 7 == 0],
                          "p": "a", "o": "Urgent"}),
        ]
        return pd.concat(parts, ignore_index=True)

    decls = rd.from_items([
        {"s": "Urgent", "p": "onProperty", "o": "prio"},
        {"s": "Urgent", "p": "hasValue", "o": "1-URGENT"},
    ])
    store = orders.map_batches(
        to_triples, batch_format="pyarrow").union(decls)
    out = entail_has_value(store).to_pandas().astype(str)
    return (out.drop_duplicates().sort_values(["s", "p", "o"])
            .reset_index(drop=True))


Q220_SQL = """
SELECT * FROM (
  SELECT DISTINCT 'order:' || o_orderkey AS s, 'a' AS p,
         'Urgent' AS o
  FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION
  SELECT DISTINCT 'order:' || o_orderkey, 'prio', '1-URGENT'
  FROM orders WHERE o_orderkey % 7 = 0)
ORDER BY s, p, o
"""


def q221_some_values_from_entailment(sf_dir: str):
    """owl:someValuesFrom restriction entailment
    (stages/owl.py:entail_some_values_from, cls-svf1): customers whose
    in_nation edge reaches a nation typed EuroNation get typed
    EuroCustomer.  The (u,p,v) x (v type c) data join co-locates on one
    crc32(v) coarse-bucket exchange; declarations broadcast.  Oracle:
    customer -> nation -> region join."""
    from ..stages.owl import entail_some_values_from

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region")

    def cust_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "s": "cust:" + df["c_custkey"].astype(str),
            "p": "in_nation",
            "o": "nation:" + df["c_nationkey"].astype(str)})

    rdf = region.to_pandas()
    euro = set(rdf.loc[rdf["r_name"] == "EUROPE",
                       "r_regionkey"].astype("int64"))

    def nation_types(b: pa.Table, _e=euro) -> pd.DataFrame:
        df = b.to_pandas()
        hit = df[df["n_regionkey"].astype("int64").isin(_e)]
        return pd.DataFrame({
            "s": "nation:" + hit["n_nationkey"].astype(str),
            "p": "a", "o": "EuroNation"})

    decls = rd.from_items([
        {"s": "EuroCustomer", "p": "onProperty", "o": "in_nation"},
        {"s": "EuroCustomer", "p": "someValuesFrom", "o": "EuroNation"},
    ])
    store = (cust.map_batches(cust_triples, batch_format="pyarrow")
             .union(nation.map_batches(nation_types,
                                       batch_format="pyarrow"))
             .union(decls))
    out = entail_some_values_from(store).to_pandas().astype(str)
    return (out.drop_duplicates().sort_values(["s", "p", "o"])
            .reset_index(drop=True))


Q221_SQL = """
SELECT DISTINCT 'cust:' || c.c_custkey AS s, 'a' AS p,
       'EuroCustomer' AS o
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
ORDER BY s
"""


def q222_different_from_check(sf_dir: str):
    """OWL consistency eq-diff1
    (stages/owl.py:different_from_violations): differentFrom
    assertions whose endpoints meet through the sameAs COMPONENT
    closure (cust -> alias -> alt chain) are contradictions; direct
    differentFrom pairs in separate components are fine.  Canon = min
    component member (lexicographic), replayed by least() in SQL."""
    from ..stages.owl import different_from_violations

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        c = df["c_custkey"].astype("int64")
        ev = c[c % 2 == 0].astype(str)
        q4 = c[c % 4 == 0].astype(str)
        q2 = c[c % 4 == 2].astype(str)
        return pd.concat([
            pd.DataFrame({"s": "cust:" + ev, "p": "sameAs",
                          "o": "alias:" + ev}),
            pd.DataFrame({"s": "alias:" + q4, "p": "sameAs",
                          "o": "alt:" + q4}),
            pd.DataFrame({"s": "cust:" + q4, "p": "differentFrom",
                          "o": "alt:" + q4}),       # violated (chain)
            pd.DataFrame({"s": "cust:" + q2, "p": "differentFrom",
                          "o": "other:" + q2}),     # separate component
        ], ignore_index=True)

    store = cust.map_batches(to_triples, batch_format="pyarrow")
    out = different_from_violations(store).to_pandas().astype(str)
    return (out.sort_values(["a", "b"]).reset_index(drop=True))


Q222_SQL = """
SELECT 'alt:' || c_custkey AS a, 'cust:' || c_custkey AS b,
       'alias:' || c_custkey AS canon
FROM customer WHERE c_custkey % 4 = 0
ORDER BY a, b
"""


def q223_label_propagation(sf_dir: str):
    """Label-propagation community detection
    (stages/graph.py:label_propagation_communities): 2 synchronous
    rounds of most-frequent-neighbor-label voting (self-vote included,
    min-label ties) over the signed part/supplier bipartite graph —
    deterministic integer votes, so the unrolled MATERIALIZED-CTE
    oracle replays the rounds bit-for-bit (q212 discipline).  2 coarse
    exchanges per round."""
    from ..stages.graph import label_propagation_communities

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def edges(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().drop_duplicates()
        df = df[df["l_partkey"] % 12 == 0]
        return pd.DataFrame({
            "a": df["l_partkey"].to_numpy("int64"),
            "b": -(df["l_suppkey"].to_numpy("int64") + 1)})

    e = (li.map_batches(edges, batch_format="pyarrow")
         .groupby(["a", "b"]).count().drop_columns(["count()"]))
    out = label_propagation_communities(e, rounds=2).to_pandas()
    out = out.astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q223_SQL = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS a, -(l_suppkey + 1) AS b
  FROM lineitem WHERE l_partkey % 12 = 0),
mem AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
l0 AS (SELECT DISTINCT node, node AS lab FROM mem),
v1 AS MATERIALIZED (
  SELECT m.node, l.lab, CAST(count(*) AS BIGINT) AS c
  FROM mem m JOIN l0 l ON l.node = m.nbr GROUP BY m.node, l.lab),
l1 AS MATERIALIZED (
  SELECT node, lab FROM (
    SELECT node, lab,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, lab) AS rn
    FROM (SELECT node, lab, sum(c) AS c FROM (
            SELECT node, lab, c FROM v1
            UNION ALL SELECT node, lab, 1 FROM l0)
          GROUP BY node, lab)) WHERE rn = 1),
v2 AS MATERIALIZED (
  SELECT m.node, l.lab, CAST(count(*) AS BIGINT) AS c
  FROM mem m JOIN l1 l ON l.node = m.nbr GROUP BY m.node, l.lab),
l2 AS (
  SELECT node, lab FROM (
    SELECT node, lab,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, lab) AS rn
    FROM (SELECT node, lab, sum(c) AS c FROM (
            SELECT node, lab, c FROM v2
            UNION ALL SELECT node, lab, 1 FROM l1)
          GROUP BY node, lab)) WHERE rn = 1)
SELECT node, CAST(lab AS BIGINT) AS label FROM l2 ORDER BY node
"""




def q224_all_values_from_check(sf_dir: str):
    """owl:allValuesFrom conformance check
    (stages/owl.py:all_values_from_violations, cls-avf as validation —
    deriving types would be unsound open-world): LocalOnly suppliers
    (every third) must ship only to EuroNation-typed nations; edges to
    any other nation are violations.  Two coarse exchanges (crc32(u)
    instance x edge match, crc32(v) anti-join).  Oracle: supplier ->
    nation -> region anti-join."""
    from ..stages.owl import all_values_from_violations

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region")

    def supp_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        k = df["s_suppkey"].astype("int64")
        inst = k[k % 3 == 0].astype(str)
        return pd.concat([
            pd.DataFrame({"s": "supp:" + k.astype(str),
                          "p": "ships_to",
                          "o": "nation:" + df["s_nationkey"].astype(str)}),
            pd.DataFrame({"s": "supp:" + inst, "p": "a",
                          "o": "LocalOnly"}),
        ], ignore_index=True)

    rdf = region.to_pandas()
    euro = set(rdf.loc[rdf["r_name"] == "EUROPE",
                       "r_regionkey"].astype("int64"))

    def nation_types(b: pa.Table, _e=euro) -> pd.DataFrame:
        df = b.to_pandas()
        hit = df[df["n_regionkey"].astype("int64").isin(_e)]
        return pd.DataFrame({
            "s": "nation:" + hit["n_nationkey"].astype(str),
            "p": "a", "o": "EuroNation"})

    decls = rd.from_items([
        {"s": "LocalOnly", "p": "onProperty", "o": "ships_to"},
        {"s": "LocalOnly", "p": "allValuesFrom", "o": "EuroNation"},
    ])
    store = (supp.map_batches(supp_triples, batch_format="pyarrow")
             .union(nation.map_batches(nation_types,
                                       batch_format="pyarrow"))
             .union(decls))
    out = all_values_from_violations(store).to_pandas().astype(str)
    return (out.drop_duplicates().sort_values(["node", "value"])
            .reset_index(drop=True))


Q224_SQL = """
SELECT 'supp:' || s.s_suppkey AS node, 'ships_to' AS pred,
       'nation:' || s.s_nationkey AS value, 'LocalOnly' AS restriction
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE s.s_suppkey % 3 = 0 AND r.r_name <> 'EUROPE'
ORDER BY node, value
"""




def q225_strongly_connected_components(sf_dir: str):
    """Strongly connected components (stages/graph.py:scc_labels, the
    parallel COLORING algorithm — forward max-label fixpoint, roots
    walk backward inside their color class, peel, repeat; all sinks of
    the color DAG peel in parallel).  Graph: the functional map
    n -> 7n+3 (mod 60) over order-key residues — 18 short cycles (the
    SCCs) plus tail singletons.  Labels normalized to the component
    MIN so the oracle (recursive-CTE mutual reachability + least) is
    convention-free."""
    from ..stages.graph import scc_labels

    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def edges(b: pa.Table) -> pd.DataFrame:
        n = np.unique(b.column("o_orderkey").to_numpy() % 60)
        n = n.astype("int64")
        return pd.DataFrame({"src": n, "dst": (7 * n + 3) % 60})

    e = (orders.map_batches(edges, batch_format="pyarrow")
         .groupby(["src", "dst"]).count().drop_columns(["count()"]))
    out = scc_labels(e, max_rounds=10, max_hops=30).to_pandas()
    out = out.astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q225_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT o_orderkey % 60 AS u,
         (7 * (o_orderkey % 60) + 3) % 60 AS v
  FROM orders),
nodes AS (SELECT DISTINCT u AS n FROM e UNION SELECT v FROM e),
reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v),
pairs AS (
  SELECT r1.u, r1.v FROM reach r1
  JOIN reach r2 ON r2.u = r1.v AND r2.v = r1.u)
SELECT n.n AS node,
       CAST(least(n.n, coalesce(min(p.v), n.n)) AS BIGINT) AS scc
FROM nodes n LEFT JOIN pairs p ON p.u = n.n
GROUP BY n.n
ORDER BY node
"""




def q226_k_truss(sf_dir: str):
    """Bounded-round k-truss peeling (stages/graph.py:k_truss_edges):
    the 3-truss of the co-purchase graph (parts sharing an order,
    every-15th part) after 2 peel rounds — each round drops edges in
    < k-2 triangles and recounts support on the survivors (cascades).
    Fixed-round semantics, so the oracle unrolls the rounds as
    MATERIALIZED CTEs (the q127 discipline).  3 coarse exchanges per
    round, wedge fan-out hub-capped upstream by the per-order pair
    generation."""
    from ..stages.graph import cooccurrence_edges, k_truss_edges

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def keep(b: pa.Table) -> pa.Table:
        # pc.remainder doesn't exist in this pyarrow — numpy modulo
        return b.filter(pa.array(
            b.column("l_partkey").to_numpy() % 15 == 0))

    co = cooccurrence_edges(
        li.map_batches(keep, batch_format="pyarrow"),
        "l_orderkey", "l_partkey", min_count=1)
    out = k_truss_edges(co, k=3, rounds=2).to_pandas().astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q226_SQL = """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
                  AND l1.l_partkey < l2.l_partkey
  WHERE l1.l_partkey % 15 = 0 AND l2.l_partkey % 15 = 0),
t0 AS MATERIALIZED (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e0 e1 JOIN e0 e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e0 e3 ON e3.a = e1.b AND e3.b = e2.b),
s0 AS MATERIALIZED (
  SELECT a, b, count(*) AS sup FROM (
    SELECT u AS a, v AS b FROM t0
    UNION ALL SELECT u, w FROM t0
    UNION ALL SELECT v, w FROM t0) GROUP BY a, b),
e1 AS MATERIALIZED (
  SELECT e.a, e.b FROM e0 e
  JOIN s0 s ON s.a = e.a AND s.b = e.b WHERE s.sup >= 1),
t1 AS MATERIALIZED (
  SELECT x.a AS u, x.b AS v, y.b AS w
  FROM e1 x JOIN e1 y ON y.a = x.a AND y.b > x.b
  JOIN e1 z ON z.a = x.b AND z.b = y.b),
s1 AS MATERIALIZED (
  SELECT a, b, count(*) AS sup FROM (
    SELECT u AS a, v AS b FROM t1
    UNION ALL SELECT u, w FROM t1
    UNION ALL SELECT v, w FROM t1) GROUP BY a, b),
e2 AS (
  SELECT e.a, e.b FROM e1 e
  JOIN s1 s ON s.a = e.a AND s.b = e.b WHERE s.sup >= 1)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b FROM e2
ORDER BY a, b
"""


def q227_shacl_range_length(sf_dir: str):
    """SHACL value-range + string-length constraint kinds
    (stages/shacl.py:_validate_frame): parts carry an integer `size`,
    a string `pname` and (every 97th part) an UNPARSEABLE `sizetag`
    ("sz-<n>").  sh:maxInclusive flags sizes > 40, sh:minLength flags
    names shorter than 9 chars, sh:maxExclusive over the non-numeric
    sizetag flags every carrier (the less_than unparseable rule), and
    the two conforming checks (minExclusive 0, maxLength 12) contribute
    nothing.  One subject-bucket exchange, vectorized in-bucket (the
    q168 shape).  Oracle: three violation predicates as SQL filters."""
    from ..stages.shacl import Shape, validate_shapes
    from ..stages.triplify import (TripleMap, col, const, node,
                                   row_filter, triplify_tables)

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_size"])

    def derive(b: pa.Table) -> pa.Table:
        sz = b.column("p_size").cast(pa.string())
        tag = pc.binary_join_element_wise(
            pa.array(["sz"] * b.num_rows), sz, "-")
        mod = pa.array(b.column("p_partkey").to_numpy() % 97)
        return b.append_column("tag", tag).append_column("mod", mod)

    store = triplify_tables([
        (part.map_batches(derive, batch_format="pyarrow"),
         TripleMap(subject=node("part", "p_partkey"), mappings=[
             ("type", const("Part")),
             ("size", col("p_size")),
             ("pname", col("p_name")),
             ("sizetag", col("tag"), row_filter("mod", "==", 0)),
         ])),
    ])
    out = validate_shapes(store, [Shape("PartShape", "Part", [
        ("max_inclusive", "size", 40),
        ("min_exclusive", "size", 0),        # conforms: no violations
        ("max_exclusive", "sizetag", 100),   # unparseable -> violates
        ("min_length", "pname", 9),
        ("max_length", "pname", 12),         # conforms: no violations
    ])]).to_pandas()
    cols = ["node", "shape", "constraint", "pred", "detail"]
    out = out[cols].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


Q227_SQL = """
SELECT * FROM (
  SELECT 'part:' || p_partkey AS node, 'PartShape' AS shape,
         'max_inclusive' AS "constraint", 'size' AS pred,
         CAST(p_size AS VARCHAR) AS detail
  FROM part WHERE p_size > 40
  UNION ALL
  SELECT 'part:' || p_partkey, 'PartShape', 'max_exclusive', 'sizetag',
         'sz-' || p_size
  FROM part WHERE p_partkey % 97 = 0
  UNION ALL
  SELECT 'part:' || p_partkey, 'PartShape', 'min_length', 'pname',
         p_name
  FROM part WHERE length(p_name) < 9
)
ORDER BY node, shape, "constraint", pred, detail
"""


def q228_class_expressions(sf_dir: str):
    """owl:intersectionOf / owl:unionOf entailment (stages/owl.py:
    entail_class_expressions — OWL 2 RL cls-int1/int2/uni, single
    application): customers are typed Big (acctbal > 5000), Mod3 /
    Mod5 (key residue), or directly PremiumBig (every 11th key); the
    ontology declares PremiumBig = intersectionOf(Big, Mod3) as a real
    RDF collection (first/rest/nil cells) and AnyFlag =
    unionOf(Big, Mod5).  Derived: Big∧Mod3 ⇒ PremiumBig (int1), direct
    PremiumBig ⇒ Big + Mod3 (int2), Big∨Mod5 ⇒ AnyFlag (uni).  Lists
    unroll via rdf_list_unroll; one crc32(x) exchange carries the
    all-members check and the global distinct.  Oracle: the three
    rules as SQL filters over the same typing predicates."""
    from ..stages.owl import entail_class_expressions
    from ..stages.triplify import (TripleMap, const, node, row_filter,
                                   triplify_tables)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def derive(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy()
        return (b.append_column("m3", pa.array(k % 3))
                .append_column("m5", pa.array(k % 5))
                .append_column("m11", pa.array(k % 11)))

    data = triplify_tables([
        (cust.map_batches(derive, batch_format="pyarrow"),
         TripleMap(subject=node("cust", "c_custkey"), mappings=[
             ("a", const("Big"), row_filter("c_acctbal", ">", 5000)),
             ("a", const("Mod3"), row_filter("m3", "==", 0)),
             ("a", const("Mod5"), row_filter("m5", "==", 0)),
             ("a", const("PremiumBig"), row_filter("m11", "==", 0)),
         ])),
    ])
    onto = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("PremiumBig", "intersectionOf", "l1"),
        ("l1", "first", "Big"), ("l1", "rest", "l2"),
        ("l2", "first", "Mod3"), ("l2", "rest", "nil"),
        ("AnyFlag", "unionOf", "l3"),
        ("l3", "first", "Big"), ("l3", "rest", "l4"),
        ("l4", "first", "Mod5"), ("l4", "rest", "nil"),
    ]])
    out = entail_class_expressions(
        data.union(onto), type_pred="a").to_pandas()
    out = out[["s", "p", "o"]].astype(str)
    return out.sort_values(["s", "p", "o"]).reset_index(drop=True)


Q228_SQL = """
WITH big AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
m3 AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 3 = 0),
m5 AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 5 = 0),
pb AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 11 = 0)
SELECT DISTINCT * FROM (
  SELECT 'cust:' || big.k AS s, 'a' AS p, 'PremiumBig' AS o
  FROM big JOIN m3 ON m3.k = big.k
  UNION ALL SELECT 'cust:' || k, 'a', 'Big' FROM pb
  UNION ALL SELECT 'cust:' || k, 'a', 'Mod3' FROM pb
  UNION ALL SELECT 'cust:' || k, 'a', 'AnyFlag' FROM big
  UNION ALL SELECT 'cust:' || k, 'a', 'AnyFlag' FROM m5
)
ORDER BY s, p, o
"""


def q229_widest_path(sf_dir: str):
    """Bounded-hop widest (max-min bottleneck) path (stages/graph.py:
    k_hop_widest_path — k_hop_min_cost's tropical dual): over the
    undirected supplier<->part graph with edge capacity = l_quantity
    (integral 1..50; parallel edges collapse to their max under the
    monotone min-fold), the maximum bottleneck width reachable from
    supplier 0 within 4 hops.  Suppliers ride the -(s+1) signed
    encoding (0-based-key collision rule); seeds report the 2^62
    sentinel.  Oracle: 4 unrolled MATERIALIZED relaxation CTEs with
    LEAST/MAX (the q120/q197 discipline)."""
    from ..stages.graph import k_hop_widest_path

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_partkey", "l_quantity"])

    def both(b: pa.Table) -> pa.Table:
        u = -(b.column("l_suppkey").to_numpy() + 1)
        v = b.column("l_partkey").to_numpy()
        cap = b.column("l_quantity").to_numpy().astype("int64")
        return pa.table({
            "src": pa.array(np.concatenate([u, v]).astype("int64")),
            "dst": pa.array(np.concatenate([v, u]).astype("int64")),
            "cap": pa.array(np.concatenate([cap, cap]))})

    edges = li.map_batches(both, batch_format="pyarrow")
    seeds = rd.from_items([{"node": -1}])
    out = k_hop_widest_path(edges, seeds, k=4).to_pandas().astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q229_SQL = """
WITH e AS MATERIALIZED (
  SELECT u, v, MAX(cap) AS cap FROM (
    SELECT -(l_suppkey + 1) AS u, l_partkey AS v,
           CAST(l_quantity AS BIGINT) AS cap FROM lineitem
    UNION ALL
    SELECT l_partkey, -(l_suppkey + 1), CAST(l_quantity AS BIGINT)
    FROM lineitem
  ) GROUP BY u, v),
w0 AS MATERIALIZED (
  SELECT CAST(-1 AS BIGINT) AS node,
         CAST(4611686018427387904 AS BIGINT) AS width),
w1 AS MATERIALIZED (
  SELECT node, MAX(width) AS width FROM (
    SELECT node, width FROM w0
    UNION ALL
    SELECT e.v, LEAST(w.width, e.cap) FROM w0 w JOIN e ON e.u = w.node
  ) GROUP BY node),
w2 AS MATERIALIZED (
  SELECT node, MAX(width) AS width FROM (
    SELECT node, width FROM w1
    UNION ALL
    SELECT e.v, LEAST(w.width, e.cap) FROM w1 w JOIN e ON e.u = w.node
  ) GROUP BY node),
w3 AS MATERIALIZED (
  SELECT node, MAX(width) AS width FROM (
    SELECT node, width FROM w2
    UNION ALL
    SELECT e.v, LEAST(w.width, e.cap) FROM w2 w JOIN e ON e.u = w.node
  ) GROUP BY node),
w4 AS MATERIALIZED (
  SELECT node, MAX(width) AS width FROM (
    SELECT node, width FROM w3
    UNION ALL
    SELECT e.v, LEAST(w.width, e.cap) FROM w3 w JOIN e ON e.u = w.node
  ) GROUP BY node)
SELECT node, width FROM w4 ORDER BY node
"""


def q230_double_sweep_diameter(sf_dir: str):
    """Double-sweep diameter lower bound (stages/graph.py:
    double_sweep_diameter): over the every-10th-part co-purchase graph
    (undirected), BFS from part 0 picks the farthest node (max hops,
    min id tie-break), a second BFS from it reports the bound — two
    k_hop_reachability sweeps, farthest-node selection as per-block
    1-row partials + an O(blocks) driver fold.  k=6 bounds both
    sweeps; the oracle unrolls 2x6 BFS min-folds as MATERIALIZED CTEs
    with the same ORDER BY hops DESC, node ASC LIMIT 1 selection."""
    from ..stages.graph import cooccurrence_edges, double_sweep_diameter

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(
            b.column("l_partkey").to_numpy() % 10 == 0))

    co = cooccurrence_edges(
        li.map_batches(keep, batch_format="pyarrow"),
        "l_orderkey", "l_partkey", min_count=1)

    def both(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy()
        c = b.column("b").to_numpy()
        return pa.table({
            "src": pa.array(np.concatenate([a, c]).astype("int64")),
            "dst": pa.array(np.concatenate([c, a]).astype("int64"))})

    edges = co.map_batches(both, batch_format="pyarrow")
    out = double_sweep_diameter(edges, start=0, k=6).to_pandas()
    return out.astype("int64").reset_index(drop=True)


def _q230_sql() -> str:
    def bfs(prefix: str, rounds: int) -> str:
        parts = []
        for i in range(1, rounds + 1):
            parts.append(f"""{prefix}{i} AS MATERIALIZED (
  SELECT node, MIN(hops) AS hops FROM (
    SELECT node, hops FROM {prefix}{i-1}
    UNION ALL
    SELECT e.v, w.hops + 1 FROM {prefix}{i-1} w JOIN e ON e.u = w.node
  ) GROUP BY node)""")
        return ",\n".join(parts)

    return f"""
WITH pr AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
                  AND l1.l_partkey < l2.l_partkey
  WHERE l1.l_partkey % 10 = 0 AND l2.l_partkey % 10 = 0),
e AS MATERIALIZED (
  SELECT a AS u, b AS v FROM pr UNION ALL SELECT b, a FROM pr),
a0 AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS hops),
{bfs('a', 6)},
f1 AS MATERIALIZED (
  SELECT node, hops FROM a6 ORDER BY hops DESC, node ASC LIMIT 1),
b0 AS MATERIALIZED (
  SELECT node, CAST(0 AS BIGINT) AS hops FROM f1),
{bfs('b', 6)},
f2 AS MATERIALIZED (
  SELECT node, hops FROM b6 ORDER BY hops DESC, node ASC LIMIT 1)
SELECT CAST(0 AS BIGINT) AS start, f1.node AS far_node,
       f1.hops AS ecc_start, f2.hops AS diameter_lb
FROM f1, f2
"""


Q230_SQL = _q230_sql()


def q231_bipartite_components(sf_dir: str):
    """Per-component bipartiteness / odd-cycle census (stages/graph.py:
    bipartite_components): over the every-20th-part co-purchase graph,
    min-label components + one multi-seed parity BFS from the
    component representatives + the same-parity-edge witness count.
    rounds=12 bounds both fixpoints; the oracle replays the identical
    bounded trajectory (12 unrolled label-propagation CTEs, 12 BFS
    min-folds, the parity self-join) so the results coincide even on
    adversarial deep components.  Output: (component, n_nodes,
    odd_edges, is_bipartite), int64."""
    from ..stages.graph import bipartite_components, cooccurrence_edges

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(
            b.column("l_partkey").to_numpy() % 20 == 0))

    co = cooccurrence_edges(
        li.map_batches(keep, batch_format="pyarrow"),
        "l_orderkey", "l_partkey", min_count=1)
    out = bipartite_components(co, rounds=12).to_pandas().astype("int64")
    return out.sort_values("component").reset_index(drop=True)


def _q231_sql() -> str:
    cc = []
    for i in range(1, 13):
        cc.append(f"""l{i} AS MATERIALIZED (
  SELECT node, MIN(lab) AS lab FROM (
    SELECT node, lab FROM l{i-1}
    UNION ALL
    SELECT e.u, l.lab FROM l{i-1} l JOIN e ON e.v = l.node
  ) GROUP BY node)""")
    bfs = []
    for i in range(1, 13):
        bfs.append(f"""h{i} AS MATERIALIZED (
  SELECT node, MIN(hops) AS hops FROM (
    SELECT node, hops FROM h{i-1}
    UNION ALL
    SELECT e.u, h.hops + 1 FROM h{i-1} h JOIN e ON e.v = h.node
  ) GROUP BY node)""")
    cc_sql = ",\n".join(cc)
    bfs_sql = ",\n".join(bfs)
    return f"""
WITH pr AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
                  AND l1.l_partkey < l2.l_partkey
  WHERE l1.l_partkey % 20 = 0 AND l2.l_partkey % 20 = 0),
e AS MATERIALIZED (
  SELECT a AS u, b AS v FROM pr UNION ALL SELECT b, a FROM pr),
l0 AS MATERIALIZED (
  SELECT u AS node, u AS lab FROM (
    SELECT DISTINCT u FROM e)),
{cc_sql},
h0 AS MATERIALIZED (
  SELECT node, CAST(0 AS BIGINT) AS hops FROM l12 WHERE node = lab),
{bfs_sql},
par AS MATERIALIZED (SELECT node, hops % 2 AS par FROM h12),
wit AS MATERIALIZED (
  SELECT DISTINCT pr.a, pr.b FROM pr
  JOIN par pa ON pa.node = pr.a
  JOIN par pb ON pb.node = pr.b
  WHERE pa.par = pb.par),
sizes AS (
  SELECT lab AS component, COUNT(*) AS n_nodes FROM l12 GROUP BY lab),
wcnt AS (
  SELECT l.lab AS component, COUNT(*) AS w
  FROM wit JOIN l12 l ON l.node = wit.a GROUP BY l.lab)
SELECT CAST(s.component AS BIGINT) AS component,
       CAST(s.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(w.w, 0) AS BIGINT) AS odd_edges,
       CAST(CASE WHEN COALESCE(w.w, 0) = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS is_bipartite
FROM sizes s LEFT JOIN wcnt w ON w.component = s.component
ORDER BY component
"""


Q231_SQL = _q231_sql()


def q232_bpe_train(sf_dir: str):
    """BPE tokenizer TRAINING (stages/text_analysis.py:bpe_train,
    Sennrich et al. 2016): learn the first 24 merge rules over the
    documents corpus.  The corpus collapses into the word-frequency
    table in ONE crc(word) exchange; each merge round runs over that
    vocabulary table only (pair partials -> pair-bucket exchange ->
    per-block top-1 -> O(blocks) driver fold -> broadcast regex merge)
    — never a corpus rescan.  Deterministic (lexicographic tie-break),
    no SQL oracle (iterative argmax); pinned by the golden value hash
    and a single-process reference parity test (tests/test_bpe.py)."""
    from ..stages.text_analysis import bpe_train

    docs = _read(sf_dir, "documents", ["text"])
    return bpe_train(docs, n_merges=24).reset_index(drop=True)


def q233_dred_deletion(sf_dir: str):
    """DRed deletion maintenance (stages/bgp.py:saturate_decremental,
    Gupta/Mumick/Subrahmanian 1993): the customer parent forest
    (k -> k//3, k >= 1) is saturated with the linear ancestor rules,
    then every 17th parent edge is RETRACTED and the closure
    maintained in place — overdelete (semi-naive over the deletion
    delta), prune, rederive (unrestricted first round, D-gated).
    Output: the maintained store, equivalent to re-saturating the
    surviving base — which is exactly what the oracle does with a
    recursive CTE over the surviving edges."""
    from ..stages.bgp import saturate, saturate_decremental
    from ..stages.triplify import TripleMap, node, triplify_tables

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def derive(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy()
        keep = k >= 1
        k = k[keep]
        return pa.table({"k": pa.array(k),
                         "pk": pa.array(k // 3),
                         "m17": pa.array(k % 17)})

    rows = cust.map_batches(derive, batch_format="pyarrow")
    base = triplify_tables([
        (rows, TripleMap(subject=node("c", "k"),
                         mappings=[("parent", node("c", "pk"))])),
    ])
    rules = [
        ([("?x", "parent", "?y")], ("?x", "anc", "?y")),
        ([("?x", "parent", "?y"), ("?y", "anc", "?z")],
         ("?x", "anc", "?z")),
    ]
    closed = saturate(base, rules, max_rounds=14, strategy="semi_naive",
                      cast_nodes=False).materialize()
    deleted = triplify_tables([
        (rows.map_batches(
            lambda b: b.filter(pc.equal(b.column("m17"), 0)),
            batch_format="pyarrow"),
         TripleMap(subject=node("c", "k"),
                   mappings=[("parent", node("c", "pk"))])),
    ])
    out = saturate_decremental(closed, base, deleted, rules,
                               max_rounds=14, cast_nodes=False
                               ).to_pandas()
    out = out[["s", "p", "o"]].astype(str)
    return out.sort_values(["s", "p", "o"]).reset_index(drop=True)


Q233_SQL = """
WITH e AS MATERIALIZED (
  SELECT 'c:' || c_custkey AS s, 'c:' || (c_custkey // 3) AS o
  FROM customer WHERE c_custkey >= 1 AND c_custkey % 17 != 0),
anc AS (
  WITH RECURSIVE a(s, o) AS (
    SELECT s, o FROM e
    UNION
    SELECT e.s, a.o FROM e JOIN a ON a.s = e.o)
  SELECT s, o FROM a)
SELECT * FROM (
  SELECT s, 'parent' AS p, o FROM e
  UNION ALL
  SELECT s, 'anc', o FROM anc
)
ORDER BY s, p, o
"""


def q234_bpe_encode(sf_dir: str):
    """BPE encode with the trained tokenizer (stages/text_analysis.py:
    BpeEncoder — train q232's 24 merges, then tokenize the SAME corpus
    in an actor pool: merge ranks ship once per actor via __init__, a
    per-actor word->count memo exploits word repetition).  Output: the
    per-token-count-bucket histogram (bucket of 50 tokens) plus total
    tokens per bucket — a combiner-first fold.  No SQL oracle
    (rank-ordered iterative merges); golden-pinned, with reference
    apply-parity in tests/test_bpe.py."""
    from ..stages.text_analysis import BpeEncoder, bpe_train

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    merges_df = bpe_train(docs, n_merges=24)
    merges = list(map(tuple, merges_df[["left", "right"]].to_numpy()))
    enc = docs.map_batches(
        BpeEncoder, fn_constructor_args=(merges,),
        concurrency=2, batch_size=512, batch_format="pyarrow")
    out = _preagg(
        enc.map_batches(
            lambda b: b.append_column(
                "bucket", pa.array(
                    b.column("n_bpe_tokens").to_numpy() // 50)),
            batch_format="pyarrow"),
        ["bucket"],
        {"n_docs": ("n_bpe_tokens", "count"),
         "total_tokens": ("n_bpe_tokens", "sum")})
    out = out.astype({"bucket": "int64", "n_docs": "int64",
                      "total_tokens": "int64"})
    return out.sort_values("bucket").reset_index(drop=True)


def q235_max_cardinality(sf_dir: str):
    """owl:maxCardinality / maxQualifiedCardinality conformance
    (stages/owl.py:max_cardinality_violations — cls-maxc2/cls-maxqc as
    validation): LimitedBuyer (every 7th customer) may hold at most 2
    DISTINCT urgent orders (qualified: onClass Urgent), CasualBuyer
    (every 11th) at most 14 orders of any kind (unqualified).  Three
    coarse exchanges: crc(u) typing x edge match, crc(v) onClass
    semi-join for the qualified side only, crc(u, r) distinct-count
    fold.  Oracle: two HAVING counts."""
    from ..stages.owl import max_cardinality_violations
    from ..stages.triplify import (TripleMap, const, node, row_filter,
                                   triplify_tables)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderpriority"])

    def derive(b: pa.Table) -> pa.Table:
        k = b.column("o_custkey").to_numpy()
        return (b.append_column("m7", pa.array(k % 7))
                .append_column("m11", pa.array(k % 11)))

    rows = orders.map_batches(derive, batch_format="pyarrow")
    data = triplify_tables([
        (rows, TripleMap(subject=node("cust", "o_custkey"), mappings=[
            ("ordered", node("order", "o_orderkey")),
            ("a", const("LimitedBuyer"), row_filter("m7", "==", 0)),
            ("a", const("CasualBuyer"), row_filter("m11", "==", 0)),
        ])),
        (rows, TripleMap(subject=node("order", "o_orderkey"), mappings=[
            ("a", const("Urgent"),
             row_filter("o_orderpriority", "==", "1-URGENT")),
        ])),
    ])
    onto = rd.from_items([{"s": s, "p": p, "o": o} for s, p, o in [
        ("LimitedBuyer", "onProperty", "ordered"),
        ("LimitedBuyer", "maxQualifiedCardinality", "2"),
        ("LimitedBuyer", "onClass", "Urgent"),
        ("CasualBuyer", "onProperty", "ordered"),
        ("CasualBuyer", "maxCardinality", "14"),
    ]])
    out = max_cardinality_violations(data.union(onto)).to_pandas()
    cols = ["node", "restriction", "pred", "n_values", "max_n"]
    out = out[cols]
    out[["node", "restriction", "pred"]] = \
        out[["node", "restriction", "pred"]].astype(str)
    out[["n_values", "max_n"]] = out[["n_values", "max_n"]].astype("int64")
    return out.sort_values(cols).reset_index(drop=True)


Q235_SQL = """
SELECT * FROM (
  SELECT 'cust:' || o_custkey AS node, 'LimitedBuyer' AS restriction,
         'ordered' AS pred,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_values,
         CAST(2 AS BIGINT) AS max_n
  FROM orders
  WHERE o_custkey % 7 = 0 AND o_orderpriority = '1-URGENT'
  GROUP BY o_custkey HAVING COUNT(DISTINCT o_orderkey) > 2
  UNION ALL
  SELECT 'cust:' || o_custkey, 'CasualBuyer', 'ordered',
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT), CAST(14 AS BIGINT)
  FROM orders
  WHERE o_custkey % 11 = 0
  GROUP BY o_custkey HAVING COUNT(DISTINCT o_orderkey) > 14
)
ORDER BY node, restriction, pred, n_values, max_n
"""


def q236_sparql_update(sf_dir: str):
    """SPARQL 1.1 UPDATE (stages/bgp.py:update_store — DELETE/INSERT
    WHERE as one operator): over the triplified order store, every
    P-status order is re-labeled pending_review and its customer
    flagged — ONE where-match feeding both template sets, one
    flag-fold exchange applying (store \\ D) ∪ I with
    delete-before-insert semantics.  Oracle: the same set algebra as
    SQL filters + unions."""
    from ..stages.bgp import update_store
    from ..stages.triplify import TripleMap, col, node, triplify_tables

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[
            ("placed_by", node("cust", "o_custkey")),
            ("has_status", col("o_orderstatus")),
        ])),
    ])
    out = update_store(
        store,
        where=[("?o", "has_status", "P"), ("?o", "placed_by", "?c")],
        delete=[("?o", "has_status", "P")],
        insert=[("?o", "has_status", "pending_review"),
                ("?c", "flagged", "true")],
        cast_nodes=False).to_pandas()
    out = out[["s", "p", "o"]].astype(str)
    return out.sort_values(["s", "p", "o"]).reset_index(drop=True)


Q236_SQL = """
WITH st AS (
  SELECT 'order:' || o_orderkey AS s, 'placed_by' AS p,
         'cust:' || o_custkey AS o FROM orders
  UNION ALL
  SELECT 'order:' || o_orderkey, 'has_status', o_orderstatus
  FROM orders)
SELECT DISTINCT * FROM (
  SELECT s, p, o FROM st
  WHERE NOT (p = 'has_status' AND o = 'P')
  UNION ALL
  SELECT 'order:' || o_orderkey, 'has_status', 'pending_review'
  FROM orders WHERE o_orderstatus = 'P'
  UNION ALL
  SELECT 'cust:' || o_custkey, 'flagged', 'true'
  FROM orders WHERE o_orderstatus = 'P'
)
ORDER BY s, p, o
"""


def q237_dag_layers(sf_dir: str):
    """DAG longest-path layering (stages/graph.py:dag_longest_path —
    the topological-level / critical-path operator, (max, +) sibling
    of BFS): over the double-parent customer DAG (edges k//2 -> k and
    k//3 -> k, k >= 1 — a true multi-parent DAG where the longest path
    differs from the BFS hop count), each node's layer = longest path
    from the root.  Roots via one distinct + anti semi-join; k=15
    bounds the relaxation (> log2 of the largest key at bench scale).
    Oracle: 15 unrolled MATERIALIZED
    max-relaxation CTEs over the same generic root selection."""
    from ..stages.graph import dag_longest_path

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def mk_edges(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy()
        k = k[k >= 1]
        src = np.concatenate([k // 2, k // 3])
        dst = np.concatenate([k, k])
        keep = src != dst
        return pa.table({"src": pa.array(src[keep].astype("int64")),
                         "dst": pa.array(dst[keep].astype("int64"))})

    edges = cust.map_batches(mk_edges, batch_format="pyarrow")
    out = dag_longest_path(edges, k=15).to_pandas().astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def _q237_sql() -> str:
    lv = []
    for i in range(1, 16):
        lv.append(f"""v{i} AS MATERIALIZED (
  SELECT node, MAX(layer) AS layer FROM (
    SELECT node, layer FROM v{i-1}
    UNION ALL
    SELECT e.v, w.layer + 1 FROM v{i-1} w JOIN e ON e.u = w.node
  ) GROUP BY node)""")
    lv_sql = ",\n".join(lv)
    return f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT c_custkey // 2 AS u, c_custkey AS v FROM customer
    WHERE c_custkey >= 1
    UNION ALL
    SELECT c_custkey // 3, c_custkey FROM customer WHERE c_custkey >= 1
  ) WHERE u != v),
v0 AS MATERIALIZED (
  SELECT u AS node, CAST(0 AS BIGINT) AS layer FROM (
    SELECT DISTINCT u FROM e) s
  WHERE u NOT IN (SELECT v FROM e)),
{lv_sql}
SELECT node, layer FROM v15 ORDER BY node
"""


Q237_SQL = _q237_sql()


def q238_profile_columns(sf_dir: str):
    """Column profiler / ANALYZE (stages/stats.py:profile_columns):
    exact per-column row/null/distinct counts + min/max for the int
    and string columns of orders — one data pass emitting per-batch
    stats partials and per-batch distinct values keyed (column,
    crc32(value) % 256) (never the bare column name — skew-free
    two-phase exact distinct), O(columns x buckets) driver fold.
    Complements q81_profile_orders (melted, min/max AS TEXT): this one
    folds min/max in the column's NATIVE type across blocks and keys
    the distinct exchange by value hash instead of a global
    (col, val) groupby.  Oracle: one UNION ALL arm per column."""
    from ..stages.stats import profile_columns

    cols = ["o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority"]
    ds = _read(sf_dir, "orders", cols)
    out = profile_columns(ds, cols)
    out[["column", "min_repr", "max_repr"]] = \
        out[["column", "min_repr", "max_repr"]].astype(str)
    return out.reset_index(drop=True)


Q238_SQL = """
SELECT * FROM (
  SELECT 'o_custkey' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
         CAST(MIN(o_custkey) AS VARCHAR) AS min_repr,
         CAST(MAX(o_custkey) AS VARCHAR) AS max_repr
  FROM orders
  UNION ALL
  SELECT 'o_orderkey', COUNT(*), COUNT(*) - COUNT(o_orderkey),
         COUNT(DISTINCT o_orderkey),
         CAST(MIN(o_orderkey) AS VARCHAR),
         CAST(MAX(o_orderkey) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', COUNT(*),
         COUNT(*) - COUNT(o_orderpriority),
         COUNT(DISTINCT o_orderpriority),
         MIN(o_orderpriority), MAX(o_orderpriority)
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
         COUNT(DISTINCT o_orderstatus),
         MIN(o_orderstatus), MAX(o_orderstatus)
  FROM orders
)
ORDER BY "column"
"""


def q239_jsonld_round_trip(sf_dir: str):
    """Flat JSON-LD (NDJSON node object) interchange round trip
    (sources/jsonld.py — the JSON face of the RDF surface, q206's
    N-Quads discipline): triplify urgent orders, write_jsonld (whole
    subjects per content-hash part file via one subject-bucket
    exchange; @type lowering, {"@id"} references, sorted multi-value
    arrays), read_jsonld back, return the store.  Oracle: the same
    triples straight from SQL — the file layer must be lossless."""
    import tempfile

    from ..sources.jsonld import read_jsonld, write_jsonld
    from ..stages.triplify import TripleMap, col, const, node, \
        row_filter, triplify_tables

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderpriority"])
    store = triplify_tables([
        (orders, TripleMap(subject=node("order", "o_orderkey"),
                           mappings=[
            ("a", const("Order"),
             row_filter("o_orderpriority", "==", "1-URGENT")),
            ("placed_by", node("cust", "o_custkey"),
             row_filter("o_orderpriority", "==", "1-URGENT")),
            ("prio", col("o_orderpriority"),
             row_filter("o_orderpriority", "==", "1-URGENT")),
        ])),
    ])
    d = tempfile.mkdtemp(prefix="q239_", dir="/tmp")
    try:
        manifest = write_jsonld(store, d)
        back = read_jsonld(sorted(manifest["path"])).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert back["error"].isna().all()
    out = back[["s", "p", "o"]].astype(str)
    return out.sort_values(["s", "p", "o"]).reset_index(drop=True)


Q239_SQL = """
SELECT * FROM (
  SELECT 'order:' || o_orderkey AS s, 'a' AS p, 'Order' AS o
  FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT 'order:' || o_orderkey, 'placed_by', 'cust:' || o_custkey
  FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT 'order:' || o_orderkey, 'prio', o_orderpriority
  FROM orders WHERE o_orderpriority = '1-URGENT'
)
ORDER BY s, p, o
"""


def q240_edit1_join(sf_dir: str):
    """Typo-tolerant string join at edit distance <= 1
    (stages/link.py:edit1_join — FastSS deletion neighborhoods, Bocek
    et al. 2007): part names vs deterministically typo'd part names
    (every 5th part drops the character at position key % len).
    Candidates share a <=1-deletion variant on ONE crc(variant)
    exchange — LINEAR len+1 variants per string, vs the quadratic
    cross join the oracle runs — then the exact O(len) radius check
    and a pair-keyed dedup exchange.  Oracle: DuckDB levenshtein over
    the full cross product."""
    from ..stages.link import edit1_join

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    left = part.map_batches(
        lambda b: pa.table({"name": b.column("p_name")}),
        batch_format="pyarrow")

    def typo(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["p_partkey"] % 5 == 0]
        out = []
        for k, nm in zip(df["p_partkey"], df["p_name"]):
            i = int(k) % len(nm)
            out.append(nm[:i] + nm[i + 1:])
        return pd.DataFrame({"name": pd.Series(out, dtype=object)})

    right = part.map_batches(typo, batch_format="pyarrow")
    out = edit1_join(left, right).to_pandas()
    out = out[["left", "right"]].astype(str)
    return out.sort_values(["left", "right"]).reset_index(drop=True)


Q240_SQL = """
WITH l AS (SELECT DISTINCT p_name AS name FROM part),
r AS (SELECT DISTINCT
        substr(p_name, 1, p_partkey % length(p_name))
        || substr(p_name, (p_partkey % length(p_name)) + 2) AS name
      FROM part WHERE p_partkey % 5 = 0)
SELECT l.name AS "left", r.name AS "right"
FROM l, r WHERE levenshtein(l.name, r.name) <= 1
ORDER BY "left", "right"
"""


def q241_grouped_median(sf_dir: str):
    """Exact per-group median (stages/stats.py:grouped_median_x2 — the
    holistic counterpart of the q60 quantile sketch): median l_quantity
    per (returnflag, linestatus), DOUBLED so the even-count middle
    pair stays integer-exact (no float interpolation).  One crc(key)
    coarse-bucket exchange, vectorized in-bucket sort + run-length
    middle pick.  Complements q82/q97 (value-count HISTOGRAM
    percentiles under the bounded-distinct contract): this one is the
    holistic co-location form that stays exact when per-group distinct
    values are unbounded.  Oracle: CAST(2 * median(..) AS BIGINT)."""
    from ..stages.stats import grouped_median_x2

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy().astype("int64")
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "q": pa.array(q)})

    out = grouped_median_x2(
        li.map_batches(to_int, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], "q").to_pandas()
    out[["l_returnflag", "l_linestatus"]] = \
        out[["l_returnflag", "l_linestatus"]].astype(str)
    out["median_x2"] = out["median_x2"].astype("int64")
    return (out.sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))


Q241_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(2 * median(CAST(l_quantity AS BIGINT)) AS BIGINT)
         AS median_x2
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q242_rollup(sf_dir: str):
    """ROLLUP in one pass (stages/stats.py:rollup_aggregate —
    hierarchical grouping sets as per-batch combiner partials + ONE
    (level, keys) exchange, never n+1 scans): sum/count/min/max of
    integer quantity over ROLLUP(l_returnflag, l_linestatus); rolled
    columns carry '(all)'.  Oracle: GROUP BY ROLLUP with COALESCE and
    GROUPING-derived level."""
    from ..stages.stats import rollup_aggregate

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy().astype("int64")
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "q": pa.array(q)})

    out = rollup_aggregate(
        li.map_batches(to_int, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], "q").to_pandas()
    out[["l_returnflag", "l_linestatus"]] = \
        out[["l_returnflag", "l_linestatus"]].astype(str)
    for c in ("level", "sum_v", "n", "min_v", "max_v"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["level", "l_returnflag", "l_linestatus"])
            .reset_index(drop=True))


Q242_SQL = """
SELECT COALESCE(l_returnflag, '(all)') AS l_returnflag,
       COALESCE(l_linestatus, '(all)') AS l_linestatus,
       CAST(2 - GROUPING(l_returnflag) - GROUPING(l_linestatus)
            AS BIGINT) AS level,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_v,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_v,
       CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_v
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY level, l_returnflag, l_linestatus
"""


def q243_prefix_filter_jaccard(sf_dir: str):
    """PPJoin-style prefix-filtered EXACT word-Jaccard join
    (stages/dedup.py:prefix_filter_jaccard_pairs, Xiao et al. 2008 —
    the third candidate family next to MinHash-LSH and q104's window
    blocking, recall 1.0 by the prefix-filter guarantee): documents
    pairs with token Jaccard >= 0.5.  Rarest-first global token order
    (broadcast df dict, the q63 vocabulary contract), prefix emission,
    one token exchange + one pair dedup exchange, exact verification
    after two native token-set joins; threshold compared by integer
    cross-multiplication.  Oracle: full cross product with
    list_intersect — quadratic, which is exactly what the prefix
    filter avoids."""
    from ..stages.dedup import prefix_filter_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = prefix_filter_jaccard_pairs(docs, threshold=0.9).to_pandas()
    out = out[["a", "b", "inter", "na", "nb"]].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q243_SQL = """
WITH tok AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
  FROM documents),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.ts, b.ts)) AS inter,
         len(a.ts) AS na, len(b.ts) AS nb
  FROM tok a JOIN tok b ON a.doc_id < b.doc_id)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(inter AS BIGINT) AS inter,
       CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb
FROM p WHERE inter * 10 >= 9 * (na + nb - inter)
ORDER BY a, b
"""


def q244_keyed_ranks(sf_dir: str):
    """Ranking window functions (stages/window.py:keyed_ranks):
    RANK / DENSE_RANK / PERCENT_RANK over (PARTITION BY l_returnflag
    ORDER BY l_quantity) for every lineitem row — heavy ties by
    construction (quantities 1..50), percent_rank in exact integer
    ppm.  One crc(key) exchange, one vectorized lexsort per bucket.
    Oracle: the same three window functions in SQL."""
    from ..stages.window import keyed_ranks

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag",
                "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": b.column("l_linenumber")
                             .cast(pa.int64()),
            "l_returnflag": b.column("l_returnflag"),
            "q": pa.array(b.column("l_quantity").to_numpy()
                          .astype("int64"))})

    out = keyed_ranks(
        li.map_batches(to_int, batch_format="pyarrow"),
        "l_returnflag", "q", ["l_orderkey", "l_linenumber"]
    ).to_pandas()
    out["l_returnflag"] = out["l_returnflag"].astype(str)
    for c in ("l_orderkey", "l_linenumber", "q", "rank",
              "dense_rank", "percent_rank_ppm"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["l_returnflag", "l_orderkey",
                             "l_linenumber"])
            .reset_index(drop=True))


Q244_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_returnflag, CAST(l_quantity AS BIGINT) AS q,
       RANK() OVER w AS rank,
       DENSE_RANK() OVER w AS dense_rank,
       CAST((1000000 * (RANK() OVER w - 1)) //
            GREATEST(COUNT(*) OVER (PARTITION BY l_returnflag) - 1, 1)
            AS BIGINT) AS percent_rank_ppm
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY CAST(l_quantity AS BIGINT))
ORDER BY l_returnflag, l_orderkey, l_linenumber
"""


def q245_status_pivot(sf_dir: str):
    """Pivot-to-columns (the relational face of stages/pivot.py's
    label pivot): order counts per priority CROSS status as wide
    columns — indicator columns derived per batch, then the standard
    bounded-key combiner fold (no shuffle wider than the tiny group
    set).  Oracle: conditional aggregation (SUM(CASE WHEN ..))."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def indicators(b: pa.Table) -> pa.Table:
        st = b.column("o_orderstatus").to_pandas()
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "n_open": pa.array((st == "O").to_numpy().astype("int64")),
            "n_done": pa.array((st == "F").to_numpy().astype("int64")),
            "n_pending": pa.array(
                (st == "P").to_numpy().astype("int64"))})

    out = _preagg(ds.map_batches(indicators, batch_format="pyarrow"),
                  ["o_orderpriority"],
                  {"n_open": ("n_open", "sum"),
                   "n_done": ("n_done", "sum"),
                   "n_pending": ("n_pending", "sum"),
                   "n_total": ("n_open", "count")})
    for c in ("n_open", "n_done", "n_pending", "n_total"):
        out[c] = out[c].astype("int64")
    out["o_orderpriority"] = out["o_orderpriority"].astype(str)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q245_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_done,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pending,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM orders GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q246_incremental_cc(sf_dir: str):
    """Incremental connected components over persisted state
    (state/snapshot_cc.py — the entity-resolution cluster-maintenance
    member of the snapshot family): the every-15th-part co-purchase
    graph arrives in TWO snapshots split by order-key parity (pair
    generation is per-order, so the split partitions the edge set
    exactly); each commit touches only the batch, its endpoint label
    buckets, and the broadcast alias map — stored labels are never
    rewritten.  Output: the maintained (node, component) labels,
    which the oracle recomputes from scratch with 12 unrolled
    min-label CTEs over the FULL edge set."""
    import tempfile

    from ..stages.graph import cooccurrence_edges
    from ..state.snapshot_cc import commit_edges, current_labels

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def keep(parity: int):
        def f(b: pa.Table, _p=parity) -> pa.Table:
            pk = b.column("l_partkey").to_numpy()
            ok = b.column("l_orderkey").to_numpy()
            return b.filter(pa.array((pk % 15 == 0) & (ok % 2 == _p)))
        return f

    d = tempfile.mkdtemp(prefix="q246_", dir="/tmp")
    try:
        for parity in (0, 1):
            co = cooccurrence_edges(
                li.map_batches(keep(parity), batch_format="pyarrow"),
                "l_orderkey", "l_partkey", min_count=1)
            commit_edges(d, co, f"parity{parity}")
        out = current_labels(d).to_pandas().astype("int64")
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out.sort_values("node").reset_index(drop=True)


def _q246_sql() -> str:
    cc = []
    for i in range(1, 13):
        cc.append(f"""l{i} AS MATERIALIZED (
  SELECT node, MIN(lab) AS lab FROM (
    SELECT node, lab FROM l{i-1}
    UNION ALL
    SELECT e.u, l.lab FROM l{i-1} l JOIN e ON e.v = l.node
  ) GROUP BY node)""")
    cc_sql = ",\n".join(cc)
    return f"""
WITH pr AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
                  AND l1.l_partkey < l2.l_partkey
  WHERE l1.l_partkey % 15 = 0 AND l2.l_partkey % 15 = 0),
e AS MATERIALIZED (
  SELECT a AS u, b AS v FROM pr UNION ALL SELECT b, a FROM pr),
l0 AS MATERIALIZED (
  SELECT u AS node, u AS lab FROM (SELECT DISTINCT u FROM e)),
{cc_sql}
SELECT node, lab AS component FROM l12 ORDER BY node
"""


Q246_SQL = _q246_sql()


def q247_keyed_lag(sf_dir: str):
    """LAG/LEAD window functions (stages/window.py:keyed_lag — the
    generic operator behind q10's hard-coded sessionizer): per-user
    previous/next event timestamp (epoch µs) and the inter-arrival
    delta, ordered by (ts, event_id).  One crc(user) exchange, one
    vectorized shift per bucket; partition edges are NULL like SQL.
    Epoch-µs values stay exact in float64 (< 2^53).  Oracle: LAG/LEAD
    OVER the same deterministic window."""
    from ..stages.window import keyed_lag

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def epoch(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "t": b.column("ts").cast(pa.int64())})

    out = keyed_lag(ev.map_batches(epoch, batch_format="pyarrow"),
                    "user_id", "t", "t", ["event_id"]).to_pandas()
    out = out[["event_id", "user_id", "t", "prev_value",
               "next_value", "delta"]]
    for c in ("event_id", "user_id", "t"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


Q247_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS t,
       CAST(LAG(epoch_us(ts)) OVER w AS DOUBLE) AS prev_value,
       CAST(LEAD(epoch_us(ts)) OVER w AS DOUBLE) AS next_value,
       CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS DOUBLE) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
ORDER BY event_id
"""


def q248_grouped_mode(sf_dir: str):
    """Deterministic per-group MODE (stages/stats.py:grouped_mode):
    each user's most frequent event type, ties to the lexicographically
    smallest — SQL's mode() is implementation-defined on ties, so the
    oracle replays the explicit ROW_NUMBER OVER (count DESC, value)
    rule instead.  Combiner-first histogram partials, one crc(user)
    exchange (unbounded user key stays distributed)."""
    from ..stages.stats import grouped_mode

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    out = grouped_mode(ev, ["user_id"], "event_type").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["mode_value"] = out["mode_value"].astype(str)
    out["mode_count"] = out["mode_count"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


Q248_SQL = """
SELECT user_id, event_type AS mode_value,
       CAST(n AS BIGINT) AS mode_count
FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
ORDER BY user_id
"""


def q249_shape_induction(sf_dir: str):
    """SHACL shape INDUCTION (stages/shacl.py:induce_shapes — the
    inverse of validation: mine min/max cardinality + lexical datatype
    per (class, predicate) from the data, the schema-inference step of
    KG construction): customers carry a decimal balance, a string
    name, an IRI nation ref, and a segment predicate only for
    BUILDING rows (min_count 0 falls out of the per-class subject
    totals).  One crc(subject) exchange + one small (class, pred)
    fold.  Oracle: the same counts and bool_and datatype priority in
    SQL."""
    from ..stages.shacl import induce_shapes
    from ..stages.triplify import (TripleMap, col, const, node,
                                   row_filter, triplify_tables)

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                  "c_mktsegment"])
    store = triplify_tables([
        (cust, TripleMap(subject=node("cust", "c_custkey"), mappings=[
            ("a", const("Customer")),
            ("bal", col("c_acctbal")),
            ("cname", col("c_name")),
            ("nat", node("nation", "c_nationkey")),
            ("seg", col("c_mktsegment"),
             row_filter("c_mktsegment", "==", "BUILDING")),
        ])),
    ])
    out = induce_shapes(store).to_pandas()
    out[["cls", "pred", "datatype"]] = \
        out[["cls", "pred", "datatype"]].astype(str)
    for c in ("n_subjects", "n_triples", "min_count", "max_count"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["cls", "pred"]).reset_index(drop=True)


Q249_SQL = r"""
WITH store AS (
  SELECT 'cust:' || c_custkey AS s, 'bal' AS p,
         CAST(c_acctbal AS VARCHAR) AS o FROM customer
  UNION ALL
  SELECT 'cust:' || c_custkey, 'cname', c_name FROM customer
  UNION ALL
  SELECT 'cust:' || c_custkey, 'nat', 'nation:' || c_nationkey
  FROM customer
  UNION ALL
  SELECT 'cust:' || c_custkey, 'seg', c_mktsegment
  FROM customer WHERE c_mktsegment = 'BUILDING'),
types AS (
  SELECT 'cust:' || c_custkey AS s, 'Customer' AS cls FROM customer),
m AS (SELECT t.cls, d.p, d.s, d.o
      FROM types t JOIN store d ON d.s = t.s),
per_subj AS (
  SELECT cls, p, s, COUNT(*) AS n FROM m GROUP BY cls, p, s),
ctot AS (SELECT cls, COUNT(DISTINCT s) AS tot FROM types GROUP BY cls),
agg AS (
  SELECT cls, p, COUNT(DISTINCT s) AS ns, SUM(n) AS nt,
         MIN(n) AS mn, MAX(n) AS mx
  FROM per_subj GROUP BY cls, p),
dt AS (
  SELECT cls, p,
         bool_and(regexp_full_match(o, '[+-]?\d+')) AS ai,
         bool_and(regexp_full_match(o, '[+-]?\d+(\.\d+)?')) AS ad,
         bool_and(regexp_full_match(o, '\d{4}-\d{2}-\d{2}')) AS adt,
         bool_and(regexp_full_match(
             o, '[A-Za-z_][A-Za-z0-9_.-]*:\S+')) AS airi
  FROM m GROUP BY cls, p)
SELECT agg.cls AS cls, agg.p AS pred,
       CAST(ns AS BIGINT) AS n_subjects,
       CAST(nt AS BIGINT) AS n_triples,
       CAST(CASE WHEN ns < ctot.tot THEN 0 ELSE mn END AS BIGINT)
         AS min_count,
       CAST(mx AS BIGINT) AS max_count,
       CASE WHEN ai THEN 'integer' WHEN ad THEN 'decimal'
            WHEN adt THEN 'date' WHEN airi THEN 'iri'
            ELSE 'string' END AS datatype
FROM agg
JOIN ctot ON ctot.cls = agg.cls
JOIN dt ON dt.cls = agg.cls AND dt.p = agg.p
ORDER BY agg.cls, pred
"""


def q250_schema_lifecycle(sf_dir: str):
    """Schema-lifecycle capstone (induce_shapes -> Shape ->
    validate_shapes — constraint-level drift detection, complementing
    q207's predicate-profile diff): shapes are MINED from the clean
    even-key customer snapshot (bounded: a handful of (class, pred)
    rows cross the driver), then the full snapshot with planted drift
    — every 19th key's balance becomes 'N/A', every 23rd loses its
    name — is validated against them.  The oracle hard-codes the
    induced constraint VALUES (sf-stable for this data: bal decimal
    1..1, cname string 1..1, nat iri 1..1, seg 0..1); if induction
    ever drifted, the Ray side's violations would change and the
    hash would catch it."""
    from ..stages.shacl import Shape, induce_shapes, validate_shapes
    from ..stages.triplify import (TripleMap, col, const, node,
                                   row_filter, triplify_tables)

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                  "c_mktsegment"])

    def derive(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy()
        bal = b.column("c_acctbal").to_pandas().astype(str)
        bal[k % 19 == 0] = "N/A"
        return (b.append_column("m2", pa.array(k % 2))
                .append_column("m23", pa.array(k % 23))
                .append_column("bal_drift",
                               pa.array(bal.to_numpy(), pa.string())))

    rows = cust.map_batches(derive, batch_format="pyarrow")

    def mappings(drift: bool):
        bal = col("bal_drift") if drift else col("c_acctbal")
        m = [("a", const("Customer")), ("bal", bal),
             ("nat", node("nation", "c_nationkey")),
             ("seg", col("c_mktsegment"),
              row_filter("c_mktsegment", "==", "BUILDING"))]
        if drift:
            m.append(("cname", col("c_name"),
                      row_filter("m23", "!=", 0)))
        else:
            m.append(("cname", col("c_name")))
        return m

    store_a = triplify_tables([
        (rows.map_batches(lambda b: b.filter(
            pc.equal(b.column("m2"), 0)), batch_format="pyarrow"),
         TripleMap(subject=node("cust", "c_custkey"),
                   mappings=mappings(drift=False))),
    ])
    ind = induce_shapes(store_a).to_pandas()
    constraints = []
    for r in ind[ind["cls"] == "Customer"].itertuples():
        if r.min_count > 0:
            constraints.append(("min_count", r.pred, int(r.min_count)))
        constraints.append(("max_count", r.pred, int(r.max_count)))
        if r.datatype in ("integer", "decimal", "date"):
            constraints.append(("datatype", r.pred, r.datatype))
    shape = Shape("induced", "Customer", sorted(constraints))

    store_b = triplify_tables([
        (rows, TripleMap(subject=node("cust", "c_custkey"),
                         mappings=mappings(drift=True))),
    ])
    out = validate_shapes(store_b, [shape],
                          type_pred="a").to_pandas()
    cols = ["node", "shape", "constraint", "pred", "detail"]
    out = out[cols].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


Q250_SQL = """
SELECT * FROM (
  SELECT 'cust:' || c_custkey AS node, 'induced' AS shape,
         'datatype' AS "constraint", 'bal' AS pred, 'N/A' AS detail
  FROM customer WHERE c_custkey % 19 = 0
  UNION ALL
  SELECT 'cust:' || c_custkey, 'induced', 'min_count', 'cname', '0'
  FROM customer WHERE c_custkey % 23 = 0
)
ORDER BY node, shape, "constraint", pred, detail
"""


def q251_zonemap_range_query(sf_dir: str):
    """Zone-map data skipping (sources/io.py:write_zonemapped /
    read_zonemapped — the warehouse layout feature as partitioned
    parquet + a min/max manifest): lineitem range-partitioned by
    l_orderkey into 16 ranges, then a narrow key-range query that the
    manifest prunes to a fraction of the ranges BEFORE any file opens
    (asserted inside the pipeline), residual-filtered, and aggregated.
    Oracle: the plain filtered aggregate — the layout must be
    invisible to the answer."""
    import tempfile

    from ..sources.io import read_zonemapped, write_zonemapped

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_quantity"])
    d = tempfile.mkdtemp(prefix="q251_", dir="/tmp")

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "q": pa.array(b.column("l_quantity").to_numpy()
                          .astype("int64"))})

    try:
        zones = write_zonemapped(li, d, "l_orderkey", n_ranges=16)
        lo, hi = 1000, 3000
        out, nread = read_zonemapped(d, lo=lo, hi=hi)
        assert nread < len(zones), "zone map failed to skip anything"
        agg = _preagg(out.map_batches(to_int, batch_format="pyarrow"),
                      ["l_returnflag"],
                      {"sum_qty": ("q", "sum"), "n": ("q", "count")})
    finally:
        shutil.rmtree(d, ignore_errors=True)
    agg["l_returnflag"] = agg["l_returnflag"].astype(str)
    agg[["sum_qty", "n"]] = agg[["sum_qty", "n"]].astype("int64")
    return agg.sort_values("l_returnflag").reset_index(drop=True)


Q251_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_orderkey BETWEEN 1000 AND 3000
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q252_cdc_apply(sf_dir: str):
    """CDC log apply (stages/corrections.py:apply_cdc_log — the LWW
    corrections fold generalized with deletes and an explicit total
    order): a synthetic insert/update/delete log over orders (every
    order inserted, every 3rd updated at a later offset, every 5th
    deleted last) folds to the final state in ONE crc(key) exchange.
    Oracle: the CASE/filter the log encodes."""
    from ..stages.corrections import apply_cdc_log

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def mk_log(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        k = df["o_orderkey"].to_numpy()
        parts = [pd.DataFrame({
            "k": k, "op": "I", "seq": np.int64(1),
            "v": df["o_orderstatus"].astype(str)})]
        m3 = k % 3 == 0
        if m3.any():
            parts.append(pd.DataFrame({
                "k": k[m3], "op": "U", "seq": np.int64(2),
                "v": "touched"}))
        m5 = k % 5 == 0
        if m5.any():
            parts.append(pd.DataFrame({
                "k": k[m5], "op": "D", "seq": np.int64(3), "v": ""}))
        return pd.concat(parts, ignore_index=True)

    log = orders.map_batches(mk_log, batch_format="pyarrow")
    out = apply_cdc_log(log, ["k"]).to_pandas()
    out["k"] = out["k"].astype("int64")
    out["v"] = out["v"].astype(str)
    return out.sort_values("k").reset_index(drop=True)


Q252_SQL = """
SELECT o_orderkey AS k,
       CASE WHEN o_orderkey % 3 = 0 THEN 'touched'
            ELSE o_orderstatus END AS v
FROM orders
WHERE o_orderkey % 5 != 0
ORDER BY k
"""


def q253_zorder_box_query(sf_dir: str):
    """Z-order clustering + 2-D box skipping (sources/io.py:
    write_zordered / read_zordered_box — the multi-column sibling of
    q251's zone maps): lineitem clustered by the Morton interleave of
    (l_partkey, l_suppkey); a box query prunes ranges via the jointly
    monotone Morton interval [morton(lo), morton(hi)] (sound, not
    BIGMIN-tight), re-checks coordinates in the residual filter, and
    aggregates.  Pruning asserted in-pipeline.  Oracle: the plain 2-D
    filter aggregate."""
    import tempfile

    from ..sources.io import read_zordered_box, write_zordered

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity"])
    d = tempfile.mkdtemp(prefix="q253_", dir="/tmp")

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({
            "q": pa.array(b.column("l_quantity").to_numpy()
                          .astype("int64"))})

    try:
        zones = write_zordered(li, d, "l_partkey", "l_suppkey",
                               n_ranges=16)
        out, nread = read_zordered_box(d, "l_partkey", 100, 400,
                                       "l_suppkey", 10, 40)
        assert nread < len(zones), "z-order pruning failed to skip"
        part = out.map_batches(to_int, batch_format="pyarrow")
        tot = part.sum("q") or 0
        n = part.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return pd.DataFrame({"sum_qty": pd.Series([int(tot)], dtype="int64"),
                         "n": pd.Series([int(n)], dtype="int64")})


Q253_SQL = """
SELECT CAST(COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) AS BIGINT)
         AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 40
"""


def q254_dedup_eval(sf_dir: str):
    """Dedup-pipeline EVALUATION capstone: score the probabilistic
    candidate generator (MinHash LSH, q22's parameters) against exact
    word-Jaccard >= 0.9 ground truth from the prefix filter (q243 —
    recall 1.0 by construction), via one flag-fold-style tag union.
    Output: one row (n_truth, n_candidates, tp, fp ppm-precision,
    fn ppm-recall) — the measurement every production dedup pipeline
    needs before trusting its LSH parameters.  Hash-dependent (MinHash
    seeds), so rows-only + golden-pinned; the arithmetic is integer
    ppm."""
    from ..stages.dedup import (minhash_candidate_pairs,
                                prefix_filter_jaccard_pairs)

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    truth = prefix_filter_jaccard_pairs(docs, threshold=0.9).to_pandas()
    tset = set(zip(truth["a"].astype(int), truth["b"].astype(int)))
    cand = minhash_candidate_pairs(docs).to_pandas()
    ca = cand.iloc[:, 0].astype(int)
    cb = cand.iloc[:, 1].astype(int)
    cset = {(min(a, b), max(a, b)) for a, b in zip(ca, cb)}
    tp = len(tset & cset)
    fp = len(cset - tset)
    fn = len(tset - cset)
    prec = (1_000_000 * tp) // max(len(cset), 1)
    rec = (1_000_000 * tp) // max(len(tset), 1)
    return pd.DataFrame({
        "n_truth": pd.Series([len(tset)], dtype="int64"),
        "n_candidates": pd.Series([len(cset)], dtype="int64"),
        "tp": pd.Series([tp], dtype="int64"),
        "fp": pd.Series([fp], dtype="int64"),
        "fn": pd.Series([fn], dtype="int64"),
        "precision_ppm": pd.Series([prec], dtype="int64"),
        "recall_ppm": pd.Series([rec], dtype="int64")})


def q255_ohlc_bars(sf_dir: str) -> pd.DataFrame:
    """Time-series DOWNSAMPLING to OHLC bars: per (user, hour) the
    open/close values are arg_min/arg_max by the total event order
    (ts, event_id) — a positional aggregate no plain sum/min/max fold
    expresses.  Two-phase: per-batch partials carry (order-key, value)
    witnesses for both endpoints plus the plain high/low/sum/count;
    ONE user-bucket exchange folds witnesses by re-sorting on the
    carried order keys (min/max-by is associative over witnesses), so
    the unbounded user key space never lands on the driver."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    keys = ["user_id", "hour"]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        df = df.sort_values(keys + ["ts", "event_id"], kind="stable")
        stats = (df.groupby(keys, sort=False)["value"]
                 .agg(high="max", low="min", volume="sum", n="size")
                 .reset_index())
        first = df.drop_duplicates(keys, keep="first")[
            keys + ["ts", "event_id", "value"]].rename(columns={
                "ts": "o_ts", "event_id": "o_eid", "value": "open"})
        last = df.drop_duplicates(keys, keep="last")[
            keys + ["ts", "event_id", "value"]].rename(columns={
                "ts": "c_ts", "event_id": "c_eid", "value": "close"})
        out = stats.merge(first, on=keys).merge(last, on=keys)
        out["bucket"] = (out["user_id"] % 64).astype("int32")
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # canonical partial order first: float volume sums are
        # order-sensitive at the ulp and blocks arrive in completion
        # order (the _preagg determinism rule)
        g = g.sort_values(keys + ["o_ts", "o_eid", "c_ts", "c_eid"],
                          kind="stable")
        agg = (g.groupby(keys, sort=False)
               .agg(high=("high", "max"), low=("low", "min"),
                    volume=("volume", "sum"), n=("n", "sum"))
               .reset_index())
        first = g.sort_values(keys + ["o_ts", "o_eid"], kind="stable") \
            .drop_duplicates(keys, keep="first")[keys + ["open"]]
        last = g.sort_values(keys + ["c_ts", "c_eid"], kind="stable") \
            .drop_duplicates(keys, keep="last")[keys + ["close"]]
        out = agg.merge(first, on=keys).merge(last, on=keys)
        out["hour"] = out["hour"].dt.strftime("%Y-%m-%d %H:%M:%S")
        for c in ("open", "high", "low", "close", "volume"):
            out[c] = out[c].round(2)
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "hour", "open", "high", "low", "close",
                    "volume", "n"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas")
            .to_pandas())


Q255_SQL = """
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS hr, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events)
SELECT user_id, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
       round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
       round(max(value), 2) AS high,
       round(min(value), 2) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
       round(sum(value), 2) AS volume,
       count(*) AS n
FROM b GROUP BY user_id, hr
"""


def q256_haskey_sameas(sf_dir: str) -> pd.DataFrame:
    """owl:hasKey entailment (stages/owl.py:has_key_sameas, OWL 2 RL
    prp-key): lineitem lines typed "line" carry (part, supp) key
    properties under the in-store axiom ("line", hasKey, "part/supp")
    — lines sharing BOTH denote the same supply event and come back as
    STAR sameAs edges (group-min member, linear in group size).
    (orderkey, linenumber) is NOT unique in this data, so entities are
    MULTI-VALUED on their key properties and the rule fires on any
    shared value combination — the formal prp-key semantics the
    triple-store join gives for free.  Oracle: per-entity cross
    product of distinct key values, window-min per combination."""
    from ..stages.owl import has_key_sameas

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        x = ("line" + df["l_orderkey"].astype(str) + "_"
             + df["l_linenumber"].astype(str))
        return pd.concat([
            pd.DataFrame({"s": x, "p": "a", "o": "line"}),
            pd.DataFrame({"s": x, "p": "part",
                          "o": df["l_partkey"].astype(str)}),
            pd.DataFrame({"s": x, "p": "supp",
                          "o": df["l_suppkey"].astype(str)}),
        ], ignore_index=True)

    axiom = rd.from_items([
        {"s": "line", "p": "hasKey", "o": "part/supp"}])
    store = (li.map_batches(to_triples, batch_format="pyarrow")
             .union(axiom))
    out = has_key_sameas(store).to_pandas()
    return (out.sort_values(["s", "o"], kind="stable")
            .reset_index(drop=True))


Q256_SQL = """
-- triple-store semantics: (orderkey, linenumber) is NOT unique in this
-- synthetic data, so an entity's key properties are MULTI-VALUED and
-- the formal prp-key rule matches on ANY shared (part, supp)
-- combination — the per-entity cross product, not the per-row tuple
WITH parts AS (
  SELECT DISTINCT 'line' || l_orderkey || '_' || l_linenumber AS x,
         l_partkey FROM lineitem),
supps AS (
  SELECT DISTINCT 'line' || l_orderkey || '_' || l_linenumber AS x,
         l_suppkey FROM lineitem),
t AS (
  SELECT parts.x, l_partkey, l_suppkey
  FROM parts JOIN supps ON parts.x = supps.x),
g AS (
  SELECT x, min(x) OVER (PARTITION BY l_partkey, l_suppkey) AS canon
  FROM t)
SELECT DISTINCT canon AS s, 'sameAs' AS p, x AS o
FROM g WHERE x != canon ORDER BY s, o
"""


def q257_boilerplate_removal(sf_dir: str) -> pd.DataFrame:
    """CCNet-style boilerplate removal
    (stages/dedup.py:drop_frequent_segments): a ' table '-delimited
    segment occurring in >= 4 DISTINCT documents drops from EVERY
    document — global frequency is the boilerplate signal, unlike the
    keep-first rules of q217/q219.  One hash-bucket exchange counts
    distinct docs per segment hash (per-batch pair dedup bounds it);
    the frequent set is boilerplate-sized, so it broadcasts and the
    rebuild is a streaming row-local pass.  Oracle: HAVING
    count(DISTINCT doc_id) anti-join + ordered string_agg."""
    from ..stages.dedup import drop_frequent_segments

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = drop_frequent_segments(docs, sep=" table ",
                                 min_docs=4).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["text"] = out["text"].astype(str)
    return out.sort_values("doc_id").reset_index(drop=True)


Q257_SQL = """
WITH segs AS (
  SELECT doc_id,
         unnest(string_split(coalesce(text, ''), ' table ')) AS seg,
         unnest(range(len(string_split(coalesce(text, ''), ' table '))))
           AS idx
  FROM documents),
hot AS (
  SELECT seg FROM segs GROUP BY seg
  HAVING count(DISTINCT doc_id) >= 4),
keep AS (
  SELECT s.doc_id, s.idx, s.seg
  FROM segs s ANTI JOIN hot h ON s.seg = h.seg),
rebuilt AS (
  SELECT doc_id, string_agg(seg, ' table ' ORDER BY idx) AS text
  FROM keep GROUP BY doc_id)
SELECT d.doc_id, coalesce(r.text, '') AS text
FROM documents d LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q258_property_axiom_checks(sf_dir: str) -> pd.DataFrame:
    """OWL 2 RL property-axiom conformance
    (stages/owl.py:property_axiom_violations — prp-asyp + prp-irp +
    prp-pdw in one operator): rel_a is declared Asymmetric, rel_b
    Irreflexive, and (rel_a, rel_b) propertyDisjointWith.  The
    irreflexive check is row-local; asymmetric exchanges on a crc32
    bucket of the UNORDERED endpoint pair; disjoint on crc32(s, o).
    Oracle: three self-joins over the distinct triple set, unioned."""
    from ..stages.owl import property_axiom_violations

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        data = pd.DataFrame({
            "s": "e:" + (df["o_custkey"] % 40).astype(str),
            "p": np.where(df["o_orderstatus"].astype(str) == "O",
                          "rel_a", "rel_b"),
            "o": "e:" + (df["o_orderkey"] % 40).astype(str)})
        return data

    decls = rd.from_items([
        {"s": "rel_a", "p": "a", "o": "AsymmetricProperty"},
        {"s": "rel_b", "p": "a", "o": "IrreflexiveProperty"},
        {"s": "rel_a", "p": "propertyDisjointWith", "o": "rel_b"},
    ])
    store = _read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderstatus"]) \
        .map_batches(to_triples, batch_format="pyarrow").union(decls)
    out = property_axiom_violations(store).to_pandas()
    out = out.astype(str).drop_duplicates()
    return (out.sort_values(["kind", "s", "p", "o"])
            .reset_index(drop=True))


Q258_SQL = """
WITH t AS (
  SELECT DISTINCT 'e:' || (o_custkey % 40) AS s,
         CASE WHEN o_orderstatus = 'O' THEN 'rel_a' ELSE 'rel_b' END
           AS p,
         'e:' || (o_orderkey % 40) AS o
  FROM orders)
SELECT DISTINCT * FROM (
  SELECT a.s, a.p, a.o, 'asymmetric' AS kind
  FROM t a JOIN t b ON a.s = b.o AND a.o = b.s
  WHERE a.p = 'rel_a' AND b.p = 'rel_a'
  UNION ALL
  SELECT s, p, o, 'irreflexive' FROM t
  WHERE p = 'rel_b' AND s = o
  UNION ALL
  SELECT a.s, a.p, a.o, 'disjoint'
  FROM t a JOIN t b ON a.s = b.s AND a.o = b.o
  WHERE a.p = 'rel_a' AND b.p = 'rel_b'
  UNION ALL
  SELECT b.s, b.p, b.o, 'disjoint'
  FROM t a JOIN t b ON a.s = b.s AND a.o = b.o
  WHERE a.p = 'rel_a' AND b.p = 'rel_b')
ORDER BY kind, s, p, o
"""


def q259_dag_path_counts(sf_dir: str) -> pd.DataFrame:
    """DAG distinct-path counting (stages/graph.py:dag_path_counts,
    the (+, x) counting-semiring sibling of k-hop BFS and longest-path
    layering): a 4-layer DAG built from lineitem (node = layer * 1000
    + key % 80, edges strictly layer t-1 -> t, so acyclic by
    construction; parallel edges count as distinct paths — multigraph
    semantics).  Per round ONE hash join + grouped-SUM fold; the
    frontier empties by round <= 4.  Oracle: unrolled per-length
    frontier CTEs f0..f4 summed."""
    from ..stages.graph import dag_path_counts

    li = _read(sf_dir, "lineitem",
               ["l_linenumber", "l_partkey", "l_suppkey"])

    def to_edges(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["l_linenumber"] <= 4]
        return pd.DataFrame({
            "src": ((df["l_linenumber"] - 1) * 1000
                    + df["l_partkey"] % 80).astype("int64"),
            "dst": (df["l_linenumber"] * 1000
                    + df["l_suppkey"] % 80).astype("int64")})

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    out = dag_path_counts(edges, k=4).to_pandas()
    out["node"] = out["node"].astype("int64")
    out["n_paths"] = out["n_paths"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


Q259_SQL = """
WITH e AS (
  SELECT (l_linenumber - 1) * 1000 + (l_partkey % 80) AS src,
         l_linenumber * 1000 + (l_suppkey % 80) AS dst
  FROM lineitem WHERE l_linenumber <= 4),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
roots AS (
  SELECT node FROM nodes WHERE node NOT IN (SELECT dst FROM e)),
f0 AS (SELECT node, CAST(1 AS BIGINT) AS cnt FROM roots),
f1 AS (SELECT e.dst AS node, CAST(SUM(f0.cnt) AS BIGINT) AS cnt
       FROM f0 JOIN e ON e.src = f0.node GROUP BY e.dst),
f2 AS (SELECT e.dst AS node, CAST(SUM(f1.cnt) AS BIGINT) AS cnt
       FROM f1 JOIN e ON e.src = f1.node GROUP BY e.dst),
f3 AS (SELECT e.dst AS node, CAST(SUM(f2.cnt) AS BIGINT) AS cnt
       FROM f2 JOIN e ON e.src = f2.node GROUP BY e.dst),
f4 AS (SELECT e.dst AS node, CAST(SUM(f3.cnt) AS BIGINT) AS cnt
       FROM f3 JOIN e ON e.src = f3.node GROUP BY e.dst)
SELECT node, CAST(SUM(cnt) AS BIGINT) AS n_paths
FROM (SELECT * FROM f0 UNION ALL SELECT * FROM f1
      UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
      UNION ALL SELECT * FROM f4)
GROUP BY node ORDER BY node
"""


def q260_dsir_importance(sf_dir: str) -> pd.DataFrame:
    """DSIR-style data selection
    (stages/text_analysis.py:dsir_importance_scores — Xie et al. 2023,
    hashed-bigram importance weights linearized to integer ppm so the
    ranking is engine-exact): target = lang 'en', raw = the whole
    corpus, 512 hashed buckets; top 100 docs by importance score.
    Two streaming passes, bounded driver state (2 x 512 ints), no
    shuffle; top-k via per-batch partials + driver merge.  Oracle:
    positional bigram self-join + md5_number_lower bucketing +
    integer-division ppm replay."""
    from ..stages.text_analysis import dsir_importance_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    docs = docs.map_batches(
        lambda b: b.append_column(
            "is_target",
            pc.cast(pc.equal(b.column("lang").cast(pa.string()), "en"),
                    pa.int8())),
        batch_format="pyarrow")
    scored = dsir_importance_scores(docs, n_buckets=512)

    def block_topk(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return (df.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(100))

    parts = scored.map_batches(
        block_topk, batch_format="pyarrow").to_pandas()
    out = (parts.sort_values(["score", "doc_id"],
                             ascending=[False, True]).head(100)
           .reset_index(drop=True))
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score"] = out["score"].astype("int64")
    return out[["doc_id", "score"]]


Q260_SQL = """
WITH toks AS (
  SELECT doc_id, lang, g.w, g.o FROM documents,
  LATERAL (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w,
                  generate_subscripts(
                    string_split(coalesce(text, ''), ' '), 1) AS o) g),
big AS (
  SELECT a.doc_id, a.lang,
         md5_number_lower(a.w || ' ' || b.w) % 512 AS bucket
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.o = a.o + 1),
raw AS (SELECT bucket, count(*) AS c FROM big GROUP BY bucket),
tgt AS (SELECT bucket, count(*) AS c FROM big WHERE lang = 'en'
        GROUP BY bucket),
tot AS (SELECT (SELECT sum(c) FROM raw) AS traw,
               (SELECT coalesce(sum(c), 0) FROM tgt) AS ttgt),
delta AS (
  SELECT r.bucket,
         CAST((1000000 * (coalesce(t.c, 0) + 1)) // (tot.ttgt + 512)
              AS BIGINT)
         - CAST((1000000 * (r.c + 1)) // (tot.traw + 512) AS BIGINT)
           AS d
  FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket, tot),
scores AS (
  SELECT d0.doc_id,
         CAST(coalesce(sum(delta.d), 0) AS BIGINT) AS score
  FROM documents d0
  LEFT JOIN big ON big.doc_id = d0.doc_id
  LEFT JOIN delta ON big.bucket = delta.bucket
  GROUP BY d0.doc_id)
SELECT doc_id, score FROM scores
ORDER BY score DESC, doc_id LIMIT 100
"""


def q261_running_distinct(sf_dir: str) -> pd.DataFrame:
    """Running DISTINCT-user count per event_type in (ts, event_id)
    order (stages/window.py:keyed_running_agg agg="count_distinct") —
    the audience-growth curve, a window aggregate SQL has no native
    form for.  ONE crc-bucket exchange on event_type; first-occurrence
    marks + cumsum inside the bucket.  Oracle: row_number() = 1 flag
    over (event_type, user_id) + windowed SUM."""
    from ..stages.window import keyed_running_agg

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    out = keyed_running_agg(
        ds, key="event_type", order_by=["ts", "event_id"],
        value="user_id", out_col="distinct_users",
        agg="count_distinct", n_buckets=16).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["distinct_users"] = out["distinct_users"].astype("int64")
    return (out[["event_id", "event_type", "distinct_users"]]
            .sort_values("event_id").reset_index(drop=True))


Q261_SQL = """
WITH marked AS (
  SELECT event_id, event_type, ts,
         CASE WHEN row_number() OVER (
                PARTITION BY event_type, user_id
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM events)
SELECT event_id, event_type,
       CAST(sum(is_first) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS distinct_users
FROM marked ORDER BY event_id
"""


def q262_above_customer_avg(sf_dir: str) -> pd.DataFrame:
    """Correlated scalar subquery (orders strictly above THEIR OWN
    customer's average order value): per-customer (sum, count)
    partials fold through one native hash join back onto orders; the
    comparison cross-multiplies in integer CENTS
    (price_cents * n > sum_cents) so no float division enters either
    engine and boundary rows can't flip on ulp drift."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import coalesce_for_join

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.round(b.column("o_totalprice").to_numpy() * 100)
        return pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
            "price_cents": pa.array(c.astype("int64"))})

    ocents = orders.map_batches(cents, batch_format="pyarrow")
    agg = (ocents.groupby("o_custkey").aggregate(
        Sum("price_cents", alias_name="sum_cents"),
        Count(alias_name="n_orders")))
    n_parts = 8
    joined = coalesce_for_join(ocents, n_parts).join(
        coalesce_for_join(agg, n_parts), join_type="inner",
        num_partitions=n_parts, on=("o_custkey",),
        right_on=("o_custkey",))

    def above(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        m = (df["price_cents"].to_numpy("int64")
             * df["n_orders"].to_numpy("int64")
             > df["sum_cents"].to_numpy("int64"))
        out = df[np.asarray(m)]
        return pd.DataFrame({
            "o_orderkey": out["o_orderkey"].astype("int64"),
            "o_custkey": out["o_custkey"].astype("int64"),
            "price_cents": out["price_cents"].astype("int64")})

    out = joined.map_batches(above, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


Q262_SQL = """
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders),
agg AS (
  SELECT o_custkey, CAST(sum(price_cents) AS BIGINT) AS sum_cents,
         count(*) AS n_orders
  FROM c GROUP BY o_custkey)
SELECT c.o_orderkey, c.o_custkey, c.price_cents
FROM c JOIN agg USING (o_custkey)
WHERE c.price_cents * agg.n_orders > agg.sum_cents
ORDER BY c.o_orderkey
"""


def q263_vocab_growth(sf_dir: str) -> pd.DataFrame:
    """Heaps-law vocabulary-growth curve
    (stages/text_analysis.py:vocab_growth + the two-phase
    global_prefix_sum): per doc in id order, cumulative token count vs
    cumulative distinct-vocabulary size.  One coarse word-hash
    exchange finds each word's first document (hashes travel, never
    strings); the per-doc table then prefix-sums with O(blocks) driver
    state.  All integers.  Oracle: min(doc_id) per word + two windowed
    sums."""
    from ..stages.text_analysis import vocab_growth
    from ..stages.window import global_prefix_sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    per_doc = vocab_growth(docs)
    out = global_prefix_sum(per_doc, "doc_id", "n_toks",
                            out_col="cum_tokens")
    out = global_prefix_sum(out, "doc_id", "new_words",
                            out_col="cum_vocab")
    df = out.to_pandas()
    for c in ("doc_id", "cum_tokens", "cum_vocab"):
        df[c] = df[c].astype("int64")
    return (df[["doc_id", "cum_tokens", "cum_vocab"]]
            .sort_values("doc_id").reset_index(drop=True))


Q263_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS w
  FROM documents),
firsts AS (SELECT w, min(doc_id) AS d FROM toks GROUP BY w),
newc AS (SELECT d AS doc_id, count(*) AS nw FROM firsts GROUP BY d),
tokc AS (SELECT doc_id, count(*) AS nt FROM toks GROUP BY doc_id)
SELECT d0.doc_id,
       CAST(sum(coalesce(tokc.nt, 0)) OVER (ORDER BY d0.doc_id)
            AS BIGINT) AS cum_tokens,
       CAST(sum(coalesce(newc.nw, 0)) OVER (ORDER BY d0.doc_id)
            AS BIGINT) AS cum_vocab
FROM documents d0
LEFT JOIN tokc ON tokc.doc_id = d0.doc_id
LEFT JOIN newc ON newc.doc_id = d0.doc_id
ORDER BY d0.doc_id
"""


def q264_pq_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ADC top-k
    (stages/similarity.py:pq_topk — Jegou et al. 2011): the
    memory-bound ANN scale path next to IVF's compute-bound one;
    8 subspaces x 16 codes compress the 64-float embeddings 32x, and
    the scan is a LUT gather-sum per batch.  Approximate by
    construction -> golden-pinned rows-only (recall vs brute force is
    gated in tests)."""
    from ..stages.similarity import pq_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 5)),
        batch_format="pyarrow").take_all()
    queries = {r["vec_id"]: r["embedding"] for r in qrows}
    return pq_topk(emb, queries, k=5, m=8, n_codes=16)


def btb_wet_ingest(sf_dir: str) -> pd.DataFrame:
    """WARC/WET ingest end to end (sources/warc.py — the Common Crawl
    container): deterministic WET files (plain + gzip-member-per-record
    + one corrupt file) written to scratch, read through the Ray
    binary-file source with record explosion inside map_batches, then
    composed with the token-count curation op — error rows ride along,
    never dropped.  Deterministic -> golden-pinned (rows-only; file
    framing isn't SQL-expressible)."""
    import os
    import tempfile

    from ..sources.warc import build_wet_bytes, read_wet_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).limit(40)
    rows = docs.to_pandas().sort_values("doc_id")
    out_dir = os.path.join(tempfile.gettempdir(),
                           f"btb_wet_{abs(hash(sf_dir)) % 10**8}")
    os.makedirs(out_dir, exist_ok=True)
    recs = [{"url": f"http://ex/doc/{int(r.doc_id)}",
             "date": "2026-01-01T00:00:00Z",
             "text": r.text or ""} for r in rows.itertuples()]
    for shard in range(4):
        part = recs[shard::4]
        gz = shard % 2 == 1
        name = f"part-{shard}.wet" + (".gz" if gz else "")
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(build_wet_bytes(part, gzip_members=gz))
    with open(os.path.join(out_dir, "corrupt.wet"), "wb") as f:
        f.write(b"not a warc file")
    ds = read_wet_documents(out_dir)
    ds = ds.map_batches(
        lambda b: b.append_column(
            "n_tokens", pc.cast(pc.add(
                pc.count_substring(
                    pc.cast(b.column("text"), pa.string()), " "), 1),
                pa.int64())),
        batch_format="pyarrow")
    df = ds.to_pandas()
    # scratch paths vary per host: reduce doc_id to basename#idx
    df["doc_id"] = df["doc_id"].map(lambda p: p.rsplit("/", 1)[-1])
    # error rows carry null text -> null count; pin as -1
    df["n_tokens"] = df["n_tokens"].fillna(-1).astype("int64")
    df = (df[["doc_id", "url", "date", "n_tokens", "error"]]
          .sort_values("doc_id").reset_index(drop=True))
    assert df["error"].notnull().sum() == 1  # the corrupt file row
    assert (df["error"].isnull().sum()) == len(recs)
    return df


def q265_url_dedup(sf_dir: str) -> pd.DataFrame:
    """URL normalization + URL-level dedup (stages/urls.py — the
    pre-content-dedup step of web-crawl curation): deterministic messy
    URLs built from orders (mixed-case hosts, explicit :443 ports,
    utm_*/ref= tracking params, fragments) canonicalize and collapse;
    per registered domain, total rows vs distinct canonical URLs.
    ONE coarse crc(canonical_url) exchange with per-batch pre-dedup.
    Oracle: regexp decomposition + list_filter/list_sort replay of the
    exact normalization rules."""
    from ..stages.urls import url_dedup_stats

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def synth(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        ok = df["o_orderkey"].to_numpy("int64")
        ck = df["o_custkey"].to_numpy("int64")
        url = (
            pd.Series(["HTTPS://Shop"] * len(df))
            + pd.Series(ck % 20).astype(str) + ".Example"
            + pd.Series(ck % 20).astype(str) + ".COM"
            + np.where(ok % 3 == 0, ":443", "")
            + "/item/" + pd.Series(ok % 500).astype(str)
            + np.where(ok % 2 == 0,
                       "?utm_source=mail&id="
                       + pd.Series(ok % 7).astype(str) + "&ref=x",
                       "?id=" + pd.Series(ok % 7).astype(str))
            + np.where(ok % 5 == 0, "#sec", ""))
        return pd.DataFrame({"url": url})

    ds = orders.map_batches(synth, batch_format="pyarrow")
    out = url_dedup_stats(ds).to_pandas()
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_unique"] = out["n_unique"].astype("int64")
    return (out[["domain", "n_rows", "n_unique"]]
            .sort_values("domain").reset_index(drop=True))


Q265_SQL = """
WITH u AS (
  SELECT 'HTTPS://Shop' || (o_custkey % 20) || '.Example'
         || (o_custkey % 20) || '.COM'
         || (CASE WHEN o_orderkey % 3 = 0 THEN ':443' ELSE '' END)
         || '/item/' || (o_orderkey % 500)
         || (CASE WHEN o_orderkey % 2 = 0
             THEN '?utm_source=mail&id=' || (o_orderkey % 7) || '&ref=x'
             ELSE '?id=' || (o_orderkey % 7) END)
         || (CASE WHEN o_orderkey % 5 = 0 THEN '#sec' ELSE '' END)
           AS url
  FROM orders),
p AS (
  SELECT url,
    lower(regexp_extract(url, '^([a-zA-Z]+)://', 1)) AS scheme,
    regexp_replace(lower(regexp_extract(
      url, '^[a-zA-Z]+://([^/?#]*)', 1)), ':(80|443)$', '') AS host,
    regexp_extract(url, '^[a-zA-Z]+://[^/?#]*([^?#]*)', 1) AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM u),
n AS (
  SELECT
    scheme || '://' || host
      || (CASE WHEN path = '' THEN '/' ELSE path END)
      || (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END)
        AS canonical_url,
    regexp_extract(host, '([^.:]+\\.[^.:]+)$', 1) AS domain
  FROM (
    SELECT *, array_to_string(list_sort(list_filter(
             string_split(query, '&'),
             x -> x <> '' AND NOT starts_with(x, 'utm_')
                  AND NOT starts_with(x, 'ref='))), '&') AS q2
    FROM p))
SELECT domain, count(*) AS n_rows,
       count(DISTINCT canonical_url) AS n_unique
FROM n GROUP BY domain ORDER BY domain
"""


def q266_pass_at_k(sf_dir: str) -> pd.DataFrame:
    """Model-eval pass@k aggregate (Chen et al. 2021, the unbiased
    estimator 1 - C(n-c, k)/C(n, k)) in EXACT integer arithmetic:
    tasks = l_partkey buckets, a "sample" passes when l_quantity > 25;
    per task n (samples), c (passes), and pass@1/pass@5 as ppm via
    Python big-int products — the oracle replays with HUGEINT
    products, so no float division enters either engine.  Shape: one
    bounded grouped count (combiner first), vectorized ppm math on the
    small per-task table."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def partials(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df["task"] = (df["l_partkey"] % 2000).astype("int64")
        df["c"] = (df["l_quantity"] > 25).astype("int64")
        g = df.groupby("task", as_index=False).agg(
            n=("c", "size"), c=("c", "sum"))
        g["n"] = g["n"].astype("int64")
        return g

    per_task = (li.map_batches(partials, batch_format="pyarrow")
                .groupby("task").sum(["n", "c"])
                .map_batches(lambda b: b.rename_columns(
                    ["task", "n", "c"]), batch_format="pyarrow")
                .to_pandas())

    def pass_ppm(n: int, c: int, k: int) -> int:
        if n - c < k:
            return 1_000_000
        num = den = 1
        for i in range(k):
            num *= (n - c - i)
            den *= (n - i)
        return 1_000_000 - (1_000_000 * num) // den

    per_task = per_task[per_task["n"] >= 5].copy()
    per_task["pass1_ppm"] = [
        pass_ppm(int(n), int(c), 1)
        for n, c in zip(per_task["n"], per_task["c"])]
    per_task["pass5_ppm"] = [
        pass_ppm(int(n), int(c), 5)
        for n, c in zip(per_task["n"], per_task["c"])]
    out = per_task[["task", "n", "c", "pass1_ppm", "pass5_ppm"]]
    for col in out.columns:
        out[col] = out[col].astype("int64")
    return out.sort_values("task").reset_index(drop=True)


Q266_SQL = """
WITH s AS (
  SELECT l_partkey % 2000 AS task,
         CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS pass
  FROM lineitem),
t AS (
  SELECT task, count(*) AS n, sum(pass) AS c
  FROM s GROUP BY task HAVING count(*) >= 5)
SELECT CAST(task AS BIGINT) AS task, CAST(n AS BIGINT) AS n,
       CAST(c AS BIGINT) AS c,
       CAST(CASE WHEN n - c < 1 THEN 1000000
            ELSE 1000000 - (1000000 * CAST(n - c AS HUGEINT))
                           // CAST(n AS HUGEINT) END AS BIGINT)
         AS pass1_ppm,
       CAST(CASE WHEN n - c < 5 THEN 1000000
            ELSE 1000000
              - (1000000
                 * (CAST(n - c AS HUGEINT) * (n - c - 1) * (n - c - 2)
                    * (n - c - 3) * (n - c - 4)))
                // (CAST(n AS HUGEINT) * (n - 1) * (n - 2) * (n - 3)
                    * (n - 4)) END AS BIGINT) AS pass5_ppm
FROM t ORDER BY task
"""


def q267_k_anonymity(sf_dir: str) -> pd.DataFrame:
    """k-anonymity audit (the data-governance gate before releasing a
    training corpus): quasi-identifier = (nation, mktsegment, coarse
    account-cents bucket); every customer in an equivalence class
    smaller than k=3 comes back flagged with its class size.  Shape:
    per-batch combiner counts -> one bounded grouped sum -> broadcast
    of the (small by construction) violating-class set into a streamed
    filter — the big table never shuffles.  Integer cents bucketing
    keeps both engines exact."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal",
                  "c_mktsegment"])

    def with_qi(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        cents = np.round(df["c_acctbal"].to_numpy() * 100).astype("int64")
        # +200k shift keeps cents non-negative: Python // floors but
        # DuckDB // truncates, and they disagree below zero
        df["bal_bucket"] = (cents + 200_000) // 200_000
        df["c_nationkey"] = df["c_nationkey"].astype("int64")
        return df

    qi = cust.map_batches(with_qi, batch_format="pyarrow")
    counts = (qi.groupby(["c_nationkey", "c_mktsegment", "bal_bucket"])
              .count()
              .map_batches(lambda b: b.rename_columns(
                  ["c_nationkey", "c_mktsegment", "bal_bucket", "n"]),
                  batch_format="pyarrow").to_pandas())
    small = counts[counts["n"] < 3]
    small_set = ray.put({
        (int(r.c_nationkey), str(r.c_mktsegment), int(r.bal_bucket)):
        int(r.n) for r in small.itertuples()})

    def flag(b: pa.Table) -> pd.DataFrame:
        s = ray.get(small_set)
        df = b.to_pandas()
        keys = list(zip(df["c_nationkey"].astype("int64"),
                        df["c_mktsegment"].astype(str),
                        df["bal_bucket"].astype("int64")))
        mask = np.fromiter((k in s for k in keys), dtype=bool,
                           count=len(df))
        out = df[mask].copy()
        out["class_size"] = [s[k] for k, m in zip(keys, mask) if m]
        return out[["c_custkey", "c_nationkey", "c_mktsegment",
                    "bal_bucket", "class_size"]]

    out = qi.map_batches(flag, batch_format="pyarrow").to_pandas()
    for c in ("c_custkey", "c_nationkey", "bal_bucket", "class_size"):
        out[c] = out[c].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


Q267_SQL = """
WITH qi AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         c_mktsegment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 200000) // 200000
           AS bal_bucket
  FROM customer),
cls AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket,
         count(*) AS class_size
  FROM qi GROUP BY ALL)
SELECT q.c_custkey, q.c_nationkey, q.c_mktsegment, q.bal_bucket,
       CAST(c.class_size AS BIGINT) AS class_size
FROM qi q JOIN cls c USING (c_nationkey, c_mktsegment, bal_bucket)
WHERE c.class_size < 3
ORDER BY q.c_custkey
"""


def q268_arrow_ipc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Arrow IPC source/sink round trip (sources/io.py:write_arrow_ipc
    / read_arrow_ipc — the zero-copy interchange layout next to the
    parquet path): documents stream to .arrows files inside workers
    (content-addressed names, atomic publish) and stream back through
    the binary-file source.  Oracle: the identity projection — a
    lossless round trip must equal SELECT from the source table."""
    import os
    import tempfile

    from ..sources.io import read_arrow_ipc, write_arrow_ipc

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out_dir = os.path.join(tempfile.gettempdir(),
                           f"btb_ipc_{abs(hash(sf_dir)) % 10**8}")
    paths = write_arrow_ipc(docs, out_dir, rows_per_file=200)
    assert paths, "ipc sink wrote no files"
    back = read_arrow_ipc(paths).to_pandas()
    back["doc_id"] = back["doc_id"].astype("int64")
    return (back[["doc_id", "text", "lang"]]
            .sort_values("doc_id").reset_index(drop=True))


Q268_SQL = """
SELECT doc_id, text, lang FROM documents ORDER BY doc_id
"""


def q269_incremental_join(sf_dir: str) -> pd.DataFrame:
    """Incremental JOIN maintenance (state/snapshot_join.py — the IVM
    delta-join identity dL@R + L@dR + dL@dR over persisted bucketed
    state): snapshot day1 commits the even halves of orders/customer;
    day2's delta over the odd halves must emit EXACTLY the join rows
    where at least one side is new.  Shuffle cost is O(delta) — state
    is read pre-bucketed per group.  Oracle: the full join minus the
    day1 x day1 quadrant."""
    import hashlib as _h
    import os
    import shutil
    import tempfile

    from ..state.snapshot_join import incremental_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def okeyed(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "k": df["o_custkey"].astype("int64"),
            "o_orderkey": df["o_orderkey"].astype("int64")})

    def ckeyed(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "k": df["c_custkey"].astype("int64"),
            "c_nationkey": df["c_nationkey"].astype("int64")})

    o = orders.map_batches(okeyed, batch_format="pyarrow")
    c = cust.map_batches(ckeyed, batch_format="pyarrow")
    state = os.path.join(
        tempfile.gettempdir(),
        "btb_ijoin_" + _h.md5(sf_dir.encode()).hexdigest()[:10])
    shutil.rmtree(state, ignore_errors=True)

    def even(ds, col):
        return ds.map_batches(
            lambda b, _c=col: b.filter(
                pc.equal(pc.bit_wise_and(b.column(_c), 1), 0)),
            batch_format="pyarrow")

    def odd(ds, col):
        return ds.map_batches(
            lambda b, _c=col: b.filter(
                pc.equal(pc.bit_wise_and(b.column(_c), 1), 1)),
            batch_format="pyarrow")

    incremental_join(even(o, "o_orderkey"), even(c, "k"),
                     state, "day1", key="k")
    delta = incremental_join(odd(o, "o_orderkey"), odd(c, "k"),
                             state, "day2", key="k")
    df = delta.to_pandas()
    for col in ("k", "o_orderkey", "c_nationkey"):
        df[col] = df[col].astype("int64")
    return (df[["k", "o_orderkey", "c_nationkey"]]
            .sort_values(["k", "o_orderkey"]).reset_index(drop=True))


Q269_SQL = """
SELECT o.o_custkey AS k, o.o_orderkey,
       CAST(c.c_nationkey AS BIGINT) AS c_nationkey
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE NOT (o.o_orderkey % 2 = 0 AND c.c_custkey % 2 = 0)
ORDER BY k, o_orderkey
"""


def q270_benford_audit(sf_dir: str) -> pd.DataFrame:
    """Benford first-significant-digit audit (the fraud / synthetic-data
    screen a curation pipeline runs before trusting a numeric feed):
    leading digit of o_totalprice tallied in ONE streamed pass
    (per-batch bincount partials over exact integer cents — no float
    log10 anywhere; the leading digit of cents == the leading digit of
    the price), folded into 9 rows, compared against the Benford
    expectation as integer-ppm LITERALS shared with the oracle (both
    engines carry the same constants, so no transcendental enters the
    comparison).  obs_ppm uses floor division — non-negative, so
    DuckDB's truncating // agrees."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(b: pa.Table) -> pd.DataFrame:
        cents = np.round(
            b.column("o_totalprice").to_numpy() * 100).astype("int64")
        # leading digit without float log: repeated integer division
        while cents.max(initial=0) >= 10:
            big = cents >= 10
            cents[big] //= 10
        n = np.bincount(cents, minlength=10)[1:10]
        return pd.DataFrame({"digit": np.arange(1, 10, dtype="int64"),
                             "n": n.astype("int64")})

    counts = (orders.map_batches(partial, batch_format="pyarrow")
              .groupby("digit").sum("n").to_pandas())
    counts = counts.rename(columns={"sum(n)": "n"})
    counts["n"] = counts["n"].astype("int64")
    total = int(counts["n"].sum())
    benford = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
               6: 66946, 7: 57991, 8: 51152, 9: 45757}
    out = counts.sort_values("digit").reset_index(drop=True)
    out["obs_ppm"] = (out["n"] * 1_000_000 // total).astype("int64")
    out["benford_ppm"] = out["digit"].map(benford).astype("int64")
    out["delta_ppm"] = (out["obs_ppm"] - out["benford_ppm"]).astype("int64")
    return out[["digit", "n", "obs_ppm", "benford_ppm", "delta_ppm"]]


Q270_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
t AS (SELECT sum(n) AS total FROM c),
b(digit, benford_ppm) AS (VALUES
  (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
  (6, 66946), (7, 57991), (8, 51152), (9, 45757))
SELECT CAST(b.digit AS BIGINT) AS digit,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
       CAST(COALESCE(c.n, 0) * 1000000 // t.total AS BIGINT) AS obs_ppm,
       CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
       CAST(COALESCE(c.n, 0) * 1000000 // t.total
            - b.benford_ppm AS BIGINT) AS delta_ppm
FROM b LEFT JOIN c ON b.digit = c.digit CROSS JOIN t
ORDER BY digit
"""


def q271_iqr_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-group Tukey-fence outlier audit over EXACT discrete
    quartiles (stages/stats.py:grouped_quantile_disc — the
    PERCENTILE_DISC generalization of grouped_median_x2, both
    quartiles from ONE co-location pass): o_totalprice cents per
    o_orderpriority, fences at Q1 - 1.5*IQR / Q3 + 1.5*IQR kept in
    integer math by doubling (2v < 2*Q1 - 3*IQR), then the (5-row)
    fence table broadcasts into a second streamed counting pass — the
    big table never shuffles twice.  Oracle: quantile_disc + the same
    doubled-integer fence."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.round(
            b.column("o_totalprice").to_numpy() * 100).astype("int64")
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "cents": pa.array(c)})

    vals = orders.map_batches(cents, batch_format="pyarrow")
    from ..stages.stats import grouped_quantile_disc
    q = grouped_quantile_disc(
        vals, ["o_orderpriority"], "cents",
        [("q1_cents", 1, 4), ("q3_cents", 3, 4)]).to_pandas()
    fences = ray.put({
        str(r.o_orderpriority): (int(r.q1_cents), int(r.q3_cents))
        for r in q.itertuples()})

    def flag(b: pa.Table) -> pd.DataFrame:
        f = ray.get(fences)
        df = b.to_pandas()
        pr = df["o_orderpriority"].astype(str).to_numpy()
        v = df["cents"].to_numpy()
        q1 = np.array([f[p][0] for p in pr], dtype="int64")
        q3 = np.array([f[p][1] for p in pr], dtype="int64")
        iqr = q3 - q1
        out = (2 * v < 2 * q1 - 3 * iqr) | (2 * v > 2 * q3 + 3 * iqr)
        part = pd.DataFrame({"o_orderpriority": pr, "out": out})
        g = part.groupby("o_orderpriority", sort=False)["out"]
        res = g.agg(n_outliers="sum", n_total="size").reset_index()
        return res

    tallies = (vals.map_batches(flag, batch_format="pyarrow").to_pandas()
               .groupby("o_orderpriority", sort=False)[
                   ["n_outliers", "n_total"]].sum().reset_index())
    out = q.merge(tallies, on="o_orderpriority")
    out["o_orderpriority"] = out["o_orderpriority"].astype(str)
    for c in ("q1_cents", "q3_cents", "n_outliers", "n_total"):
        out[c] = out[c].astype("int64")
    return (out[["o_orderpriority", "q1_cents", "q3_cents",
                 "n_outliers", "n_total"]]
            .sort_values("o_orderpriority").reset_index(drop=True))


Q271_SQL = """
WITH v AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
q AS (
  SELECT o_orderpriority,
         quantile_disc(cents, 0.25) AS q1_cents,
         quantile_disc(cents, 0.75) AS q3_cents
  FROM v GROUP BY o_orderpriority)
SELECT q.o_orderpriority, q.q1_cents, q.q3_cents,
       CAST(sum(CASE WHEN 2 * v.cents < 2 * q.q1_cents
                          - 3 * (q.q3_cents - q.q1_cents)
                       OR 2 * v.cents > 2 * q.q3_cents
                          + 3 * (q.q3_cents - q.q1_cents)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       count(*) AS n_total
FROM v JOIN q USING (o_orderpriority)
GROUP BY q.o_orderpriority, q.q1_cents, q.q3_cents
ORDER BY q.o_orderpriority
"""


def q272_gini_profile(sf_dir: str) -> pd.DataFrame:
    """Categorical-column Gini-impurity profile (the data-quality
    screen for label/class skew before training): four categorical
    columns across lineitem and orders, each table profiled in ONE
    streamed pass — a batch emits (col, value, n) count partials for
    all of its table's profiled columns at once (the oracle's
    UNION ALL costs one scan per column; the engine pays one per
    TABLE), one bounded (col, value) exchange folds them, and the
    gini fold runs driver-side over the bounded histogram in PYTHON
    INTS (sum(c^2) overflows int64 at petabyte row counts; the oracle
    casts to HUGEINT for the same reason).  gini_ppm =
    1e6 - (1e6 * sum(c^2)) // N^2, exact on both engines."""
    table_cols = {
        "lineitem": ["l_returnflag", "l_linestatus"],
        "orders": ["o_orderstatus", "o_orderpriority"],
    }

    def make_partial(cols: list[str]):
        def partial(b: pa.Table) -> pd.DataFrame:
            df = b.to_pandas()
            parts = []
            for c in cols:
                vc = df[c].value_counts()
                parts.append(pd.DataFrame({
                    "col": c, "val": vc.index.astype(str),
                    "n": vc.to_numpy().astype("int64")}))
            return pd.concat(parts, ignore_index=True)
        return partial

    partials = None
    for table, cols in table_cols.items():
        p = (_read(sf_dir, table, cols)
             .map_batches(make_partial(cols), batch_format="pyarrow"))
        partials = p if partials is None else partials.union(p)
    hist = (partials.groupby(["col", "val"]).sum("n").to_pandas()
            .rename(columns={"sum(n)": "n"}))
    rows = []
    for c in [c for cs in table_cols.values() for c in cs]:
        h = hist[hist["col"] == c]
        counts = [int(x) for x in h["n"]]
        total = sum(counts)
        ss = sum(x * x for x in counts)
        rows.append({
            "col": c, "n_distinct": len(counts), "n_total": total,
            "gini_ppm": 1_000_000 - (1_000_000 * ss) // (total * total)})
    out = pd.DataFrame(rows).sort_values("col").reset_index(drop=True)
    for c in ("n_distinct", "n_total", "gini_ppm"):
        out[c] = out[c].astype("int64")
    return out


Q272_SQL = """
WITH u AS (
  SELECT 'l_returnflag' AS col, l_returnflag AS val FROM lineitem
  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
c AS (SELECT col, val, count(*) AS n FROM u GROUP BY col, val),
g AS (SELECT col, count(*) AS n_distinct, sum(n) AS total,
             sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS ss
      FROM c GROUP BY col)
SELECT col, CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(total AS BIGINT) AS n_total,
       CAST(1000000 - (1000000 * ss)
            // (CAST(total AS HUGEINT) * CAST(total AS HUGEINT))
            AS BIGINT) AS gini_ppm
FROM g ORDER BY col
"""


def q273_cusum_drift(sf_dir: str) -> pd.DataFrame:
    """CUSUM drift / changepoint screen over the monthly order volume
    (the ingest-monitoring primitive: flag sustained upward shifts in
    a feed's arrival rate): monthly counts aggregate DISTRIBUTED
    (bounded ~84 keys), then the inherently SEQUENTIAL one-sided CUSUM
    recurrence S_m = max(0, S_{m-1} + n_m - mean - slack) folds
    driver-side over the bounded month series — documented
    bounded-key contract, the same discipline as q65's global prefix
    scan.  slack = mean // 20 (5%), alarm when S > mean.  All integer;
    the oracle replays the recurrence with a recursive CTE."""
    orders = _read(sf_dir, "orders", ["o_orderdate"])

    def month_part(b: pa.Table) -> pd.DataFrame:
        m = pd.to_datetime(
            b.column("o_orderdate").to_pandas()).dt.strftime("%Y-%m")
        vc = m.value_counts()
        return pd.DataFrame({"month": vc.index.astype(str),
                             "n": vc.to_numpy().astype("int64")})

    m = (orders.map_batches(month_part, batch_format="pyarrow")
         .groupby("month").sum("n").to_pandas()
         .rename(columns={"sum(n)": "n"})
         .sort_values("month").reset_index(drop=True))
    mean = int(m["n"].sum()) // len(m)
    slack = mean // 20
    s, cusum = 0, []
    for n in m["n"]:
        s = max(0, s + int(n) - mean - slack)
        cusum.append(s)
    m["cusum"] = pd.Series(cusum, dtype="int64")
    m["alarm"] = (m["cusum"] > mean).astype("int64")
    m["n"] = m["n"].astype("int64")
    return m[["month", "n", "cusum", "alarm"]]


Q273_SQL = """
WITH RECURSIVE
m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
      FROM orders GROUP BY month),
o AS (SELECT month, n, row_number() OVER (ORDER BY month) AS rn FROM m),
p AS (SELECT CAST(sum(n) // count(*) AS BIGINT) AS mean FROM m),
c AS (
  SELECT o.rn, o.month, o.n,
         GREATEST(0, o.n - p.mean - p.mean // 20) AS s
  FROM o, p WHERE o.rn = 1
  UNION ALL
  SELECT o.rn, o.month, o.n,
         GREATEST(0, c.s + o.n - p.mean - p.mean // 20)
  FROM c JOIN o ON o.rn = c.rn + 1 CROSS JOIN p)
SELECT c.month, CAST(c.n AS BIGINT) AS n, CAST(c.s AS BIGINT) AS cusum,
       CAST(CASE WHEN c.s > p.mean THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM c, p ORDER BY c.month
"""


def q274_regex_scalar_parity(sf_dir: str) -> pd.DataFrame:
    """Scalar string-function parity pack: regexp_extract (first
    number, first long word) via pyarrow's RE2 — the SAME regex
    engine DuckDB links, so semantics match by construction (q107's
    redaction pack established the precedent) — plus split_part,
    which both sides define as ''-on-missing (short lists fall back
    via a vectorized pandas .str[2]; Arrow's list_element raises on
    out-of-range, so the list path stays in pandas).  One streamed
    pass; no Python loop touches a row."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def extract(b: pa.Table) -> pd.DataFrame:
        t = b.column("text")
        num = pc.extract_regex(t, pattern=r"(?P<m>[0-9]+)")
        word = pc.extract_regex(t, pattern=r"(?P<m>[a-zA-Z]{8,})")
        num = pc.fill_null(pc.struct_field(num, "m"), "")
        word = pc.fill_null(pc.struct_field(word, "m"), "")
        third = (t.to_pandas().str.split(" ").str[2]
                 .fillna("").astype(str))
        return pd.DataFrame({
            "doc_id": b.column("doc_id").to_numpy().astype("int64"),
            "first_num": num.to_pandas().astype(str),
            "long_word": word.to_pandas().astype(str),
            "third_token": third.to_numpy()})

    out = docs.map_batches(extract, batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    for c in ("first_num", "long_word", "third_token"):
        out[c] = out[c].astype(str)
    return out.sort_values("doc_id").reset_index(drop=True)


Q274_SQL = """
SELECT doc_id,
       COALESCE(regexp_extract(text, '[0-9]+'), '') AS first_num,
       COALESCE(regexp_extract(text, '[a-zA-Z]{8,}'), '') AS long_word,
       split_part(text, ' ', 3) AS third_token
FROM documents ORDER BY doc_id
"""


def btb_mp1_decode(sf_dir: str) -> pd.DataFrame:
    """REAL MPEG-1 Layer I PAYLOAD decode (stages/multimodal.py:
    decode_mp1_frame + Mp1SubbandDecoder): deterministic synthetic
    Layer I streams across channel modes (mono/stereo/joint/dual),
    multi-frame VBR, ID3v2-tagged — bitstream unpack (allocation,
    scalefactors, sample codes) + the formula-exact requantizer to
    subband samples, with crc32 over the raw quantized codes pinning
    bit-exact decode.  Layer II/III payloads and garbage rows keep
    their rows flagged (the remaining codec stub is Layer II/III +
    H.264/AAC payloads only).  Golden-pinned (rows-only); the
    analytic RMS values are pinned by tests/test_mp1.py."""
    from ..stages.multimodal import (_mp3_parse_header,
                                     encode_mp1_frame,
                                     mp1_subband_features)

    def make_stream(seed: int) -> bytes:
        mode = (3, 0, 1, 2)[seed % 4]
        ext = 1 if mode == 1 else 0
        nch = 1 if mode == 3 else 2
        bound = (ext + 1) * 4 if mode == 1 else 32
        out = bytearray()
        if seed % 3 == 1:  # leading ID3v2 tag
            pad = 16 + seed
            out += (b"ID3\x03\x00\x00"
                    + bytes([0, 0, pad >> 7, pad & 0x7F])
                    + b"x" * pad)
        for f in range(2 + seed % 3):
            alloc = np.zeros((32, nch), dtype=np.int64)
            scf = np.zeros((32, nch), dtype=np.int64)
            codes = np.zeros((12, 32, nch), dtype=np.int64)
            for i in range(6 + seed % 5):
                sb = (i * 5 + seed) % 32
                a = 1 + (i * 3 + seed + f) % 14
                if sb >= bound:
                    alloc[sb, :] = a
                else:
                    for ch in range(nch):
                        alloc[sb, ch] = 1 + (i * 3 + seed + f + ch) % 14
                for ch in range(nch):
                    aa = int(alloc[sb, ch])
                    if aa:
                        scf[sb, ch] = (i * 7 + seed + ch * 11) % 63
                        levels = 2 ** (aa + 1) - 1
                        for s in range(12):
                            codes[s, sb, ch] = (
                                s * 31 + sb * 7 + ch * 13 + seed) % levels
            if mode == 1:  # shared intensity codes above the bound
                for sb in range(bound, 32):
                    codes[:, sb, 1] = codes[:, sb, 0]
            out += encode_mp1_frame(
                codes, alloc, scf, sr_idx=seed % 3,
                br_idx=12 + (seed + f) % 3, mode=mode,
                mode_extension=ext)
        return bytes(out)

    refs = [f"mp1://{i:02d}" for i in range(8)]
    payloads = [make_stream(i) for i in range(8)]
    l3_hdr = ((0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
              | (9 << 12) | (0 << 10) | (3 << 6)).to_bytes(4, "big")
    l3_size = _mp3_parse_header(l3_hdr + bytes(4), 0)["frame_size"]
    refs.append("mp1://layer3")
    payloads.append((l3_hdr + bytes(l3_size - 4)) * 2)
    refs.append("mp1://bad")
    payloads.append(b"not-an-mpeg-stream")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary())}))
    out = (mp1_subband_features(media, n_frames=3, concurrency=2)
           .to_pandas())
    # integer spectral summary instead of raw float32 lists: the
    # golden hash stays repr-stable across numpy versions
    rms = out["subband_rms"]
    out["rms_argmax"] = [
        int(np.argmax(v)) if len(v) else -1 for v in rms]
    out["rms_max_ppm"] = [
        int(round(float(np.max(v)) * 1e6)) if len(v) else -1
        for v in rms]
    out = out.drop(columns=["subband_rms"])
    for c in ("frame_idx", "channels", "active_subbands",
              "codes_crc32", "rms_argmax", "rms_max_ppm"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["media_ref", "frame_idx"])
            .reset_index(drop=True))



def q275_locf_gapfill(sf_dir: str) -> pd.DataFrame:
    """LOCF gap-fill (the time-series regularization step before
    training on sensor/metric feeds): per sampled user, an hourly grid
    from their first to last observed hour, missing hours carrying the
    last observed hourly-max value forward.  Hourly partials aggregate
    combiner-first, then ONE crc(user) exchange co-locates each user's
    (bounded) hour series for a vectorized reindex+ffill — grid
    generation is per-group, never a driver loop.  Hours travel as
    strings (timestamp dtype parity between engines is a known trap).
    Oracle: generate_series grid + last_value IGNORE NULLS."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def hourly(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["user_id"] % 7 == 0]
        if not len(df):
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "h": pd.Series([], dtype="datetime64[ns]"),
                                 "mx": pd.Series([], dtype="int64")})
        h = (pd.to_datetime(df["ts"]).dt.floor("h")
             .astype("datetime64[ns]"))
        c = np.round(df["value"].to_numpy() * 100).astype("int64")
        part = (pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                              "h": h, "mx": c})
                .groupby(["user_id", "h"], sort=False)["mx"].max()
                .reset_index())
        return part

    hv = (ev.map_batches(hourly, batch_format="pyarrow")
          .groupby(["user_id", "h"]).max("mx")
          .map_batches(lambda b: b.rename_columns(["user_id", "h", "mx"]),
                       batch_format="pyarrow"))

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for uid, d in g.groupby("user_id", sort=False):
            d = d.sort_values("h")
            grid = pd.date_range(d["h"].iloc[0], d["h"].iloc[-1],
                                 freq="h")
            s = d.set_index("h")["mx"].reindex(grid)
            outs.append(pd.DataFrame({
                "user_id": np.int64(uid),
                "hour": grid.strftime("%Y-%m-%d %H:00"),
                "filled_cents": s.ffill().astype("int64").to_numpy(),
                "observed": s.notna().astype("int64").to_numpy()}))
        return pd.concat(outs, ignore_index=True)

    from ..stages.window import hash_bucketed_map_groups
    out = hash_bucketed_map_groups(hv, "user_id", fill).to_pandas()
    for c in ("user_id", "filled_cents", "observed"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["user_id", "hour"])
            .reset_index(drop=True))


Q275_SQL = """
WITH e AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE user_id % 7 = 0),
hv AS (SELECT user_id, h, max(c) AS mx FROM e GROUP BY user_id, h),
span AS (SELECT user_id, min(h) AS h0, max(h) AS h1
         FROM hv GROUP BY user_id),
grid AS (SELECT user_id,
                unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
         FROM span),
j AS (SELECT g.user_id, g.h, hv.mx
      FROM grid g LEFT JOIN hv
        ON hv.user_id = g.user_id AND hv.h = g.h)
SELECT user_id, strftime(h, '%Y-%m-%d %H:00') AS hour,
       CAST(last_value(mx IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS filled_cents,
       CAST(mx IS NOT NULL AS BIGINT) AS observed
FROM j ORDER BY user_id, hour
"""


def q276_bloom_semijoin(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter SEMI-JOIN (the scale pattern for big-probe x
    selective-build joins: ship 128 KiB of bits instead of the key
    set): qualifying order keys (totalprice > 4000 00.00) fold into a
    2^20-bit / 4-hash bloom as per-batch bitmap partials OR-merged
    driver-side (O(blocks) x 128 KiB, key count never collected), the
    bloom broadcasts via ray.put into a vectorized lineitem prefilter
    (no false negatives, so nothing is lost), and only the SURVIVORS
    (~selectivity + FP rate) pay the exact native hash join that
    removes false positives.  Result is EXACTLY the semi-join — the
    bloom is a transport optimization, which is why a plain EXISTS
    oracle replays it.  tests/test_joins_window.py pins the FP rate
    and the prefilter's pruning."""
    M_BITS = 1 << 20
    MULTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)

    def _positions(keys: np.ndarray) -> list[np.ndarray]:
        k = keys.astype(np.uint64)
        return [((k * np.uint64(m)) >> np.uint64(40)).astype(np.int64)
                % M_BITS for m in MULTS]

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def build(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        keys = df.loc[df["o_totalprice"] > 400000.0,
                      "o_orderkey"].to_numpy("int64")
        bits = np.zeros(M_BITS // 64, dtype=np.uint64)
        for pos in _positions(keys):
            np.bitwise_or.at(bits, pos >> 6,
                             np.uint64(1) << (pos & 63).astype(np.uint64))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    parts = orders.map_batches(build, batch_format="pyarrow").to_pandas()
    bloom = np.zeros(M_BITS // 64, dtype=np.uint64)
    for blob in parts["bits"]:
        bloom |= np.frombuffer(blob, dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def prefilter(b: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        keys = b.column("l_orderkey").to_numpy().astype("int64")
        mask = np.ones(len(keys), dtype=bool)
        for pos in _positions(keys):
            mask &= (bits[pos >> 6]
                     >> (pos & 63).astype(np.uint64)) & 1 != 0
        return b.filter(pa.array(mask))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_quantity"])
    survivors = li.map_batches(prefilter, batch_format="pyarrow")

    qual = orders.map_batches(
        lambda b: b.filter(
            pc.greater(b.column("o_totalprice"), 400000.0)
        ).select(["o_orderkey"]),
        batch_format="pyarrow")
    from ..stages.joins import coalesce_for_join
    npart = 8
    exact = coalesce_for_join(survivors, npart).join(
        coalesce_for_join(qual, npart), join_type="inner",
        num_partitions=npart, on=("l_orderkey",),
        right_on=("o_orderkey",))

    out = _preagg(
        exact.map_batches(
            lambda b: pa.table({
                "l_returnflag": b.column("l_returnflag"),
                "qty": pa.array(np.round(
                    b.column("l_quantity").to_numpy()).astype("int64")),
            }), batch_format="pyarrow"),
        ["l_returnflag"],
        {"n_items": ("qty", "count"), "sum_qty": ("qty", "sum")},
    )  # merge="driver" -> already a pandas frame
    out["l_returnflag"] = out["l_returnflag"].astype(str)
    out["n_items"] = out["n_items"].astype("int64")
    out["sum_qty"] = out["sum_qty"].astype("int64")
    return (out.sort_values("l_returnflag").reset_index(drop=True)
            [["l_returnflag", "n_items", "sum_qty"]])


Q276_SQL = """
SELECT l_returnflag, count(*) AS n_items,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_totalprice > 400000)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q277_range_frame_sum(sf_dir: str) -> pd.DataFrame:
    """Time-RANGE windowed aggregate (stages/window.py:
    keyed_range_frame_sum — the sliding-window-by-VALUE operator Ray
    Data lacks; q35's sliding window counts ROWS, this one bounds the
    frame by TIME): per event, the sum of value-cents of the same
    user's events in the trailing hour, peers at the current timestamp
    included (RANGE frames are peer-inclusive — searchsorted right
    bound).  ONE crc(user) exchange, prefix-sum + two binary searches
    per row.  Oracle: SUM OVER (RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts_ns": (pd.to_datetime(df["ts"])
                      .astype("datetime64[ns]").astype("int64")),
            "cents": np.round(df["value"].to_numpy() * 100)
            .astype("int64")})

    from ..stages.window import keyed_range_frame_sum
    out = keyed_range_frame_sum(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", order="ts_ns", value="cents",
        range_width=3_600_000_000_000, out="w_sum_cents").to_pandas()
    out = out[["event_id", "user_id", "w_sum_cents"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


Q277_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS BIGINT) AS w_sum_cents
FROM events ORDER BY event_id
"""


def q278_association_rules(sf_dir: str) -> pd.DataFrame:
    """Market-basket association rules (the frequent-itemset / Apriori
    k=2 pass a recommendation or curation pipeline runs over baskets):
    part pairs sharing >= 3 distinct orders, with support, directional
    confidence and lift in EXACT integer ppm (floor division; all
    inputs non-negative so DuckDB's truncating // agrees).

    Scale shape: pair counts come from stages/graph.py
    cooccurrence_edges (per-batch distinct combiner -> ONE group-bucket
    exchange emitting pre-counted pairs -> ONE pair-bucket exchange; no
    self-join — the d^2 blowup happens inside a vectorized kernel);
    per-item order counts are ONE combiner-first aggregate whose result
    is item-dimension-sized and BROADCAST into the pair stream; the
    basket-count scalar is a count over the same distinct combiner.
    lift > 1e6 ppm means the pair co-occurs more than independence
    predicts."""
    from ..stages.graph import cooccurrence_edges

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    pairs = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", min_count=3)

    def distinct_local(b: pa.Table) -> pd.DataFrame:
        return b.to_pandas().drop_duplicates()

    # global distinct (order, part): per-batch combiner, then one keyed
    # exchange finishes the distinct — per-part counts and the basket
    # count both read the deduplicated stream
    op = (li.map_batches(distinct_local, batch_format="pyarrow")
          .groupby(["l_orderkey", "l_partkey"]).count()
          .select_columns(["l_orderkey", "l_partkey"])
          .materialize())
    dd = op.groupby("l_partkey").count().to_pandas()
    ccol = [c for c in dd.columns if c != "l_partkey"][0]
    dd = dd.rename(columns={"l_partkey": "item", ccol: "n_item"})
    baskets = op.groupby("l_orderkey").count().count()
    lut = ray.put(dict(zip(dd["item"].astype("int64"),
                           dd["n_item"].astype("int64"))))

    def rules(b: pa.Table, _n=baskets) -> pd.DataFrame:
        f = ray.get(lut)
        df = b.to_pandas()
        if not len(df):
            return pd.DataFrame({
                "pa": pd.Series([], dtype="int64"),
                "pb": pd.Series([], dtype="int64"),
                "n_ab": pd.Series([], dtype="int64"),
                "support_ppm": pd.Series([], dtype="int64"),
                "conf_ab_ppm": pd.Series([], dtype="int64"),
                "conf_ba_ppm": pd.Series([], dtype="int64"),
                "lift_ppm": pd.Series([], dtype="int64")})
        a = df["a"].to_numpy("int64")
        bb = df["b"].to_numpy("int64")
        n_ab = df["n"].to_numpy("int64")
        n_a = np.array([f[x] for x in a], dtype="int64")
        n_b = np.array([f[x] for x in bb], dtype="int64")
        return pd.DataFrame({
            "pa": a, "pb": bb, "n_ab": n_ab,
            "support_ppm": n_ab * 1_000_000 // _n,
            "conf_ab_ppm": n_ab * 1_000_000 // n_a,
            "conf_ba_ppm": n_ab * 1_000_000 // n_b,
            "lift_ppm": n_ab * _n * 1_000_000 // (n_a * n_b)})

    out = (pairs.map_batches(rules, batch_format="pyarrow").to_pandas()
           .sort_values(["n_ab", "pa", "pb"],
                        ascending=[False, True, True], kind="stable")
           .reset_index(drop=True))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


Q278_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
items AS (SELECT l_partkey AS item, count(*) AS n_item
          FROM op GROUP BY 1),
pairs AS (
  SELECT x.l_partkey AS pa, y.l_partkey AS pb, count(*) AS n_ab
  FROM op x JOIN op y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3)
SELECT CAST(p.pa AS BIGINT) AS pa, CAST(p.pb AS BIGINT) AS pb,
       CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(p.n_ab * 1000000 // n.n_orders AS BIGINT) AS support_ppm,
       CAST(p.n_ab * 1000000 // ia.n_item AS BIGINT) AS conf_ab_ppm,
       CAST(p.n_ab * 1000000 // ib.n_item AS BIGINT) AS conf_ba_ppm,
       CAST(p.n_ab * n.n_orders * 1000000
            // (ia.n_item * ib.n_item) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN items ia ON ia.item = p.pa
JOIN items ib ON ib.item = p.pb
CROSS JOIN n
ORDER BY n_ab DESC, pa, pb
"""


def q279_luby_mis(sf_dir: str, rounds: int = 4) -> pd.DataFrame:
    """Deterministic Luby maximal-independent-set over the part
    co-purchase KG (stages/graph.py:luby_mis — the parallel
    symmetry-breaking primitive behind distributed matching/coloring):
    md5-of-id priorities, `rounds` bounded rounds, one node-bucketed
    min-neighbor exchange per round.  The FIXED round count makes the
    trajectory replayable by the unrolled SQL oracle (q127/q231
    pattern) — both engines walk the identical bounded prefix, so
    results coincide even if the MIS is not yet maximal."""
    from ..stages.graph import cooccurrence_edges, luby_mis

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_count=2)
    out = luby_mis(edges, rounds=rounds).to_pandas()
    out["node"] = out["node"].astype("int64")
    out["status"] = out["status"].astype(str)
    out["decided_round"] = out["decided_round"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def _q279_sql(rounds: int = 4) -> str:
    # every CTE is MATERIALIZED: each round references the previous
    # alive set several times, and DuckDB re-inlines plain CTEs, so an
    # unmaterialized unroll re-scans the parquet exponentially (the
    # q216 HITS-oracle lesson).
    parts = ["""
WITH e AS MATERIALIZED (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(DISTINCT a.l_orderkey) >= 2),
sym AS MATERIALIZED (
  SELECT p1 AS u, p2 AS v FROM e UNION ALL SELECT p2, p1 FROM e),
alive0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
mis{r} AS MATERIALIZED (
  SELECT n.node FROM alive{r - 1} n
  WHERE NOT EXISTS (
    SELECT 1 FROM sym s JOIN alive{r - 1} m ON s.v = m.node
    WHERE s.u = n.node
      AND md5(CAST(s.v AS VARCHAR)) < md5(CAST(n.node AS VARCHAR)))),
rem{r} AS MATERIALIZED (
  SELECT DISTINCT s.v AS node
  FROM sym s JOIN mis{r} m ON s.u = m.node
  JOIN alive{r - 1} a ON a.node = s.v
  WHERE s.v NOT IN (SELECT node FROM mis{r})),
alive{r} AS MATERIALIZED (
  SELECT node FROM alive{r - 1}
  WHERE node NOT IN (SELECT node FROM mis{r})
    AND node NOT IN (SELECT node FROM rem{r}))""")
    unions = "\n  UNION ALL ".join(
        [f"SELECT node, 'mis' AS status, CAST({r} AS BIGINT) AS "
         f"decided_round FROM mis{r}\n  UNION ALL "
         f"SELECT node, 'removed', CAST({r} AS BIGINT) FROM rem{r}"
         for r in range(1, rounds + 1)]
        + [f"SELECT node, 'alive', CAST(-1 AS BIGINT) FROM alive{rounds}"])
    parts.append(f"""
SELECT CAST(node AS BIGINT) AS node, status, decided_round FROM (
  {unions})
ORDER BY node""")
    return "".join(parts)


Q279_SQL = _q279_sql()


def q280_twap(sf_dir: str) -> pd.DataFrame:
    """Per-user time-weighted average event value (TWAP — the
    time-series summary where each observation holds until the next
    one): weight = milliseconds until the user's next event (the final
    observation carries no weight), exact integer cents x ms folded to
    floor-division ppm-free cents.  ONE crc(user) exchange on the
    keyed-window scaffold; inside a bucket the fold is a vectorized
    sort + shift + weighted sum.  Oracle: LEAD window + the same
    integer division.  Users with a single event (no weighted span)
    are dropped, matching the SQL's NULL-sum filter."""
    from ..stages.window import hash_bucketed_map_groups

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "ts_ms": (pd.to_datetime(df["ts"]).astype("datetime64[ns]")
                      .astype("int64") // 1_000_000),
            "cents": np.round(df["value"].to_numpy() * 100)
            .astype("int64")})

    def twap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_ms", "cents"], kind="stable")
        u = g["user_id"].to_numpy("int64")
        t = g["ts_ms"].to_numpy("int64")
        c = g["cents"].to_numpy("int64")
        nxt = np.empty_like(t)
        nxt[:-1] = t[1:]
        nxt[-1] = t[-1]
        last = np.zeros(len(u), dtype=bool)
        last[-1] = True
        last[:-1] = u[:-1] != u[1:]
        dur = np.where(last, 0, nxt - t)
        part = pd.DataFrame({"user_id": u, "w": dur * c, "d": dur})
        agg = part.groupby("user_id", sort=False).sum().reset_index()
        agg = agg[agg["d"] > 0]
        return pd.DataFrame({
            "user_id": agg["user_id"].astype("int64"),
            "twap_cents": (agg["w"] // agg["d"]).astype("int64"),
            "span_ms": agg["d"].astype("int64")})

    out = hash_bucketed_map_groups(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", fn=twap).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


Q280_SQL = """
WITH v AS (
  SELECT user_id,
         CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_ms,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
w AS (
  SELECT user_id, cents,
         lead(ts_ms) OVER (PARTITION BY user_id
                           ORDER BY ts_ms, cents) - ts_ms AS dur
  FROM v),
a AS (
  SELECT user_id, sum(dur * cents) AS num, sum(dur) AS den
  FROM w WHERE dur IS NOT NULL GROUP BY user_id)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(num // den AS BIGINT) AS twap_cents,
       CAST(den AS BIGINT) AS span_ms
FROM a WHERE den > 0 ORDER BY user_id
"""


def q281_kmv_distinct(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """KMV / bottom-k distinct-count sketch per event type
    (functions/sketches.py:grouped_kmv_distinct — the order-statistics
    dual of HLL whose estimator is EXACT-integer SQL-replayable):
    48-bit md5-prefix hashes, estimate = (k-1) * 2^48 // h_k, groups
    under k distinct values fall back to the exact count.  Sketch
    partials ship <= k pairs per key per batch — no raw-row shuffle;
    the exact side (for err_ppm) is the usual two-step distinct.
    Oracle: row_number over the hashed distinct values picks the same
    h_k; '0x' || hex CAST re-derives the same 48-bit integers."""
    from ..functions.sketches import grouped_kmv_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    sk = grouped_kmv_distinct(ev, key="event_type", value="user_id", k=k)

    exact = (ev.groupby(["event_type", "user_id"]).count()
             .groupby("event_type").count().to_pandas())
    ccol = [c for c in exact.columns if c != "event_type"][0]
    exact = exact.rename(columns={ccol: "n_exact"})

    out = sk.merge(exact, on="event_type")
    out["err_ppm"] = (abs(out["kmv_estimate"] - out["n_exact"])
                      * 1_000_000 // out["n_exact"])
    out["event_type"] = out["event_type"].astype(str)
    for c in ("n_exact", "kmv_estimate", "err_ppm"):
        out[c] = out[c].astype("int64")
    return (out[["event_type", "n_exact", "kmv_estimate", "err_ppm"]]
            .sort_values("event_type").reset_index(drop=True))


Q281_SQL = """
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS hv
  FROM d),
x AS (SELECT event_type, count(*) AS n_exact FROM h GROUP BY 1),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h),
kk AS (SELECT event_type, hv AS h_k FROM r WHERE rn = 64)
SELECT x.event_type,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       CAST(COALESCE(63 * 281474976710656 // kk.h_k, x.n_exact)
            AS BIGINT) AS kmv_estimate,
       CAST(abs(COALESCE(63 * 281474976710656 // kk.h_k, x.n_exact)
                - x.n_exact) * 1000000 // x.n_exact AS BIGINT) AS err_ppm
FROM x LEFT JOIN kk ON x.event_type = kk.event_type
ORDER BY x.event_type
"""


def q282_referential_integrity(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit over a deterministically CORRUPTED
    dimension load (the dangling-foreign-key check a warehouse runs
    after every ingest; both engines replay the same corruption rule, so
    the orphan counts are oracle-exact): parents dropped where the key
    is divisible by the per-relationship prime, orphans = child rows
    whose FK no longer resolves.  Scale shape: per relationship, both
    sides project to the single key column and a NATIVE left_anti hash
    join counts the orphans — no broadcast of the (unbounded) parent
    key set, no driver state."""
    from ..stages.joins import coalesce_for_join

    nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    rels = [
        ("lineitem.l_orderkey->orders",
         _read(sf_dir, "lineitem", ["l_orderkey"]), "l_orderkey",
         _read(sf_dir, "orders", ["o_orderkey"]), "o_orderkey", 97),
        ("lineitem.l_partkey->part",
         _read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey",
         _read(sf_dir, "part", ["p_partkey"]), "p_partkey", 89),
        ("orders.o_custkey->customer",
         _read(sf_dir, "orders", ["o_custkey"]), "o_custkey",
         _read(sf_dir, "customer", ["c_custkey"]), "c_custkey", 53),
    ]
    rows = []
    for name, child, fk, parent, pk, prime in rels:
        surviving = parent.map_batches(
            lambda b, _pk=pk, _p=prime: b.filter(
                pa.array(b.column(_pk).to_numpy() % _p != 0)),
            batch_format="pyarrow")
        n_child = child.count()
        orphans = coalesce_for_join(child, nparts).join(
            coalesce_for_join(surviving.materialize(), nparts),
            join_type="left_anti", num_partitions=nparts,
            on=(fk,), right_on=(pk,))
        n_orph = orphans.count()
        rows.append({"relationship": name,
                     "n_child": np.int64(n_child),
                     "n_orphans": np.int64(n_orph),
                     "orphan_ppm": np.int64(
                         n_orph * 1_000_000 // n_child)})
    out = pd.DataFrame(rows).sort_values("relationship")
    out["relationship"] = out["relationship"].astype(str)
    for c in ("n_child", "n_orphans", "orphan_ppm"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


Q282_SQL = """
WITH r1 AS (
  SELECT 'lineitem.l_orderkey->orders' AS relationship,
         count(*) AS n_child,
         count(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM orders o
           WHERE o.o_orderkey = l.l_orderkey AND o.o_orderkey % 97 <> 0
         )) AS n_orphans
  FROM lineitem l),
r2 AS (
  SELECT 'lineitem.l_partkey->part',
         count(*),
         count(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM part p
           WHERE p.p_partkey = l.l_partkey AND p.p_partkey % 89 <> 0))
  FROM lineitem l),
r3 AS (
  SELECT 'orders.o_custkey->customer',
         count(*),
         count(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM customer c
           WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 53 <> 0))
  FROM orders o),
u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
      UNION ALL SELECT * FROM r3)
SELECT relationship, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       CAST(n_orphans * 1000000 // n_child AS BIGINT) AS orphan_ppm
FROM u ORDER BY relationship
"""


def q283_snapshot_table_diff(sf_dir: str) -> pd.DataFrame:
    """Snapshot table diff (stages/joins.py:snapshot_diff — the
    load-over-load audit): snapshot B is derived from orders by a
    deterministic mutation both engines replay (keys % 97 deleted,
    o_totalprice bumped where % 89, % 83 keys cloned as new rows with
    key + 10M), then diffed on (o_custkey, o_orderstatus,
    o_totalprice).  ONE crc(key) exchange, vectorized in-bucket outer
    merge; the summary folds row-level diffs to (change_type,
    changed_cols) counts.  Oracle: FULL OUTER JOIN + CASE."""
    from ..stages.joins import snapshot_diff

    cols = ["o_custkey", "o_orderstatus", "o_totalprice"]
    a = _read(sf_dir, "orders", ["o_orderkey"] + cols)

    def mutate(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        keep = df[df["o_orderkey"] % 97 != 0].copy()
        bump = (keep["o_orderkey"] % 89 == 0).to_numpy()
        keep.loc[bump, "o_totalprice"] = (
            keep.loc[bump, "o_totalprice"] + 1.0)
        clones = df[df["o_orderkey"] % 83 == 0].copy()
        clones["o_orderkey"] = clones["o_orderkey"] + 10_000_000
        return pd.concat([keep, clones], ignore_index=True)

    b = a.map_batches(mutate, batch_format="pyarrow")
    d = snapshot_diff(a, b, key="o_orderkey", cols=cols)
    out = (d.groupby(["change_type", "changed_cols"]).count()
           .to_pandas())
    ccol = [c for c in out.columns
            if c not in ("change_type", "changed_cols")][0]
    out = out.rename(columns={ccol: "n"})
    out["change_type"] = out["change_type"].astype(str)
    out["changed_cols"] = out["changed_cols"].astype(str)
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["change_type", "changed_cols"])
            .reset_index(drop=True))


Q283_SQL = """
WITH b AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 83 = 0),
f AS (
  SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
                OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
                THEN 'changed'
              ELSE 'unchanged' END AS change_type,
         CASE WHEN a.o_orderkey IS NULL OR b.o_orderkey IS NULL THEN ''
              ELSE rtrim(
       (CASE WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
             THEN 'o_custkey,' ELSE '' END) ||
       (CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
             THEN 'o_orderstatus,' ELSE '' END) ||
       (CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
             THEN 'o_totalprice,' ELSE '' END), ',') END AS changed_cols
  FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
SELECT change_type, changed_cols, CAST(count(*) AS BIGINT) AS n
FROM f GROUP BY 1, 2 ORDER BY 1, 2
"""


def btb_mp2_decode(sf_dir: str) -> pd.DataFrame:
    """REAL MPEG-1 Layer II PAYLOAD decode (stages/multimodal.py:
    decode_mp2_frame + Mp2SubbandDecoder): deterministic synthetic
    Layer II streams across channel modes and ALL FOUR B.2 allocation
    tables (a/b/c/d via bitrate/samplerate selection), all scfsi
    sharing modes, grouped 3/5/9-step classes — bitstream unpack +
    the formula-exact requantizer to subband samples, with crc32 over
    the raw quantized codes pinning bit-exact decode.  Layer I/III
    payloads and garbage rows keep their rows flagged (remaining codec
    stub is Layer III + H.264/AAC payloads).  Golden-pinned
    (rows-only); analytic values pinned by tests/test_mp2.py."""
    from ..stages.multimodal import (_mp2_select_table,
                                     _mp3_parse_header,
                                     encode_mp1_frame,
                                     encode_mp2_frame,
                                     mp2_subband_features)

    def make_stream(seed: int) -> bytes:
        mode = (3, 0, 1, 2)[seed % 4]
        ext = 1 if mode == 1 else 0
        nch = 1 if mode == 3 else 2
        # pick a (sr, br) pair that selects each B.2 table across seeds
        # mono seeds (0, 4) land on the low-rate tables d and c, which
        # only exist at <=48 kbit/s/channel (kjmp2 QUANT_LUT_STEP1)
        sr_idx, br_idx = [(2, 2), (1, 14), (0, 13), (0, 12),
                          (0, 2), (1, 12), (2, 5), (0, 14)][seed % 8]
        if nch == 2 and br_idx <= 5:
            br_idx = 13  # low rates can't carry the 2-channel payload
        hdr = _mp3_parse_header(
            (((0x7FF << 21) | (3 << 19) | (2 << 17) | (1 << 16)
              | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
              | (ext << 4)).to_bytes(4, "big") + bytes(4)), 0)
        _tid, rows = _mp2_select_table(hdr)
        sblimit = len(rows)
        bound = min((ext + 1) * 4, sblimit) if mode == 1 else sblimit
        out = bytearray()
        if seed % 3 == 1:  # leading ID3v2 tag
            pad = 16 + seed
            out += (b"ID3\x03\x00\x00"
                    + bytes([0, 0, pad >> 7, pad & 0x7F])
                    + b"x" * pad)
        for f in range(2 + seed % 2):
            alloc = np.zeros((32, nch), dtype=np.int64)
            scfsi = np.zeros((32, nch), dtype=np.int64)
            scf = np.zeros((3, 32, nch), dtype=np.int64)
            codes = np.zeros((36, 32, nch), dtype=np.int64)
            for sb in range(0, sblimit, 2 + nch):
                if sb >= bound:
                    alloc[sb, :] = 1 + (sb * 3 + seed + f) % len(rows[sb])
                else:
                    for ch in range(nch):
                        alloc[sb, ch] = (1 + (sb * 3 + seed + f + ch)
                                         % len(rows[sb]))
                for ch in range(nch):
                    ai = int(alloc[sb, ch])
                    if not ai:
                        continue
                    si = (sb + ch + seed) % 4
                    scfsi[sb, ch] = si
                    base = (sb * 5 + ch * 7 + seed) % 60
                    s3 = {0: (base, base + 1, base + 2),
                          1: (base, base, base + 2),
                          2: (base, base, base),
                          3: (base, base + 1, base + 1)}[si]
                    for p in range(3):
                        scf[p, sb, ch] = s3[p]
                    steps = rows[sb][ai - 1]
                    for s in range(36):
                        codes[s, sb, ch] = (
                            s * 31 + sb * 7 + ch * 13 + seed + f) % steps
            if mode == 1:
                for sb in range(bound, sblimit):
                    codes[:, sb, 1] = codes[:, sb, 0]
            out += encode_mp2_frame(
                codes, alloc, scfsi, scf, sr_idx=sr_idx, br_idx=br_idx,
                mode=mode, mode_extension=ext)
        return bytes(out)

    refs = [f"mp2://{i:02d}" for i in range(8)]
    payloads = [make_stream(i) for i in range(8)]
    # Layer I row: flagged unsupported_layer:1 by the Layer II stage
    l1 = encode_mp1_frame(
        np.zeros((12, 32, 1), dtype=np.int64),
        np.zeros((32, 1), dtype=np.int64),
        np.zeros((32, 1), dtype=np.int64), mode=3)
    refs.append("mp2://layer1")
    payloads.append(l1 * 2)
    refs.append("mp2://bad")
    payloads.append(b"not-an-mpeg-stream")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary())}))
    out = (mp2_subband_features(media, n_frames=3, concurrency=2)
           .to_pandas())
    rms = out["subband_rms"]
    out["rms_argmax"] = [
        int(np.argmax(v)) if len(v) else -1 for v in rms]
    out["rms_max_ppm"] = [
        int(round(float(np.max(v)) * 1e6)) if len(v) else -1
        for v in rms]
    out = out.drop(columns=["subband_rms"])
    for c in ("frame_idx", "channels", "active_subbands",
              "codes_crc32", "rms_argmax", "rms_max_ppm"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["media_ref", "frame_idx"])
            .reset_index(drop=True))


def btb_mp3_decode(sf_dir: str) -> pd.DataFrame:
    """REAL (partial) MPEG-1 Layer III PAYLOAD decode
    (stages/multimodal.py: decode_mp3_frames + Mp3SpectralDecoder):
    deterministic synthetic Layer III streams exercising side-info
    parsing, the BIT RESERVOIR (main_data_begin back-pointers across
    frames), scfsi scalefactor sharing, long AND short (block_type 2)
    windows with subblock gains, the implemented Huffman subset
    (big_values tables 0/1/2/3/6 — each granule rotates through them
    with magnitudes up to the table's range — plus count1 table B) and
    the formula-exact requantizer; |q| <= 1 lines are exact powers of
    two and |q| in {2, 3} lines carry the deterministic float64
    rounding of |q|^(4/3), so max_xr_ppm pins values analytically.  A stream needing
    an unimplemented Huffman table, a Layer II stream and a garbage
    row keep their rows flagged (the documented partial-decode gaps
    stay LOUD).  Golden-pinned (rows-only); analytic values pinned by
    tests/test_mp3_layer3.py."""
    from ..stages.multimodal import (encode_mp2_frame,
                                     encode_mp3_stream,
                                     mp3_spectral_features)

    def gran(seed: int, gr: int, ch: int, short: bool = False) -> dict:
        k = seed * 7 + gr * 3 + ch
        # rotate through every implemented big_values table (1, 2, 3,
        # 6) so the golden exercises all of them; bigv magnitudes are
        # capped at the table's range (dim-1: 1, 2, 2, 3)
        t = (1, 2, 3, 6)[k % 4]
        m = {1: 1, 2: 2, 3: 2, 6: 3}[t]
        g = {"global_gain": 140 + (k * 13) % 80,
             "scalefac_compress": (5, 10, 14, 7)[k % 4],
             "scalefac_scale": k % 2, "preflag": (k // 2) % 2,
             "count1table_select": 1,
             "table_select": [t, t, t],
             "region0_count": 2 + k % 3, "region1_count": 2,
             "bigv": [((1, 0), (0, m), (m, 1), (1, -m), (-m, m),
                       (0, 0))[(k + i) % 6] for i in range(4 + k % 5)],
             "count1": [[(1, 0, -1, 0)[(k + i + j) % 4]
                         for j in range(4)] for i in range(k % 4)]}
        from ..stages.multimodal import _MP3_SLEN
        s1, s2 = _MP3_SLEN[g["scalefac_compress"]]
        if short:
            g["block_type"] = 2
            g["table_select"] = [t, t]
            g["subblock_gain"] = [k % 3, 0, (k + 1) % 3]
            g["scalefactors"] = {"short": [
                [(w + k + sfb) % (1 << (s1 if sfb < 6 else s2))
                 if (s1 if sfb < 6 else s2) else 0
                 for sfb in range(12)] for w in range(3)]}
        else:
            g["block_type"] = 0
            g["scalefactors"] = {"long": [
                (k + sfb) % (1 << (s1 if sfb < 11 else s2))
                if (s1 if sfb < 11 else s2) else 0
                for sfb in range(21)]}
        return g

    def make_stream(seed: int) -> bytes:
        mode = (3, 0, 1, 2)[seed % 4]
        nch = 1 if mode == 3 else 2
        frames = []
        for f in range(2 + seed % 2):
            # granule 1 shares scalefactor groups via scfsi on mono
            # even seeds; short blocks on seeds % 3 == 2
            short = seed % 3 == 2
            if seed % 2 == 0 and not short:
                g0 = [gran(seed + f, 0, ch) for ch in range(nch)]
                g1 = [dict(g, count1=[[1, 0, 0, 0]]) for g in
                      [dict(gg) for gg in g0]]
                scfsi = [[1, 0, 1, 1] for _ in range(nch)]
            else:
                g0 = [gran(seed + f, 0, ch, short) for ch in range(nch)]
                g1 = [gran(seed + f, 1, ch, short) for ch in range(nch)]
                scfsi = [[0, 0, 0, 0] for _ in range(nch)]
            frames.append({"scfsi": scfsi, "granules": [g0, g1]})
        return encode_mp3_stream(frames, sr_idx=seed % 3,
                                 br_idx=(8, 10, 11)[seed % 3],
                                 mode=mode)

    refs = [f"mp3://{i:02d}" for i in range(6)]
    payloads = [make_stream(i) for i in range(6)]
    # Layer II row: flagged unsupported_layer:2
    l2 = encode_mp2_frame(
        np.zeros((36, 32, 1), dtype=np.int64),
        np.zeros((32, 1), dtype=np.int64),
        np.zeros((32, 1), dtype=np.int64),
        np.zeros((3, 32, 1), dtype=np.int64), sr_idx=1, br_idx=10,
        mode=3)
    refs.append("mp3://layer2")
    payloads.append(l2 * 2)
    refs.append("mp3://bad")
    payloads.append(b"not-an-mpeg-stream")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary())}))
    out = (mp3_spectral_features(media, n_frames=3, concurrency=2)
           .to_pandas())
    for c in ("frame_idx", "granule", "channel", "block_type",
              "global_gain", "nonzero_lines", "qs_crc32", "max_xr_ppm"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["media_ref", "frame_idx", "granule",
                             "channel"])
            .reset_index(drop=True))


def q284_theta_sketch_ops(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """Theta-sketch SET OPERATIONS over KMV samples (the capability HLL
    lacks: intersection estimates from mergeable per-set sketches):
    distinct 'view' users vs distinct 'purchase' users.  theta =
    min(h_k) of the two sketches; each retained sample is cut to
    hashes < theta; est = |sample-set-op| * 2^48 // theta — exact
    integer arithmetic, so the SQL oracle replays the estimator
    bit-for-bit (not just an accuracy bound).  Sets under k distinct
    values keep theta = 2^48 and the estimates degrade to exact.
    Scale shape: two sketch folds (each ships <= k pairs per batch) +
    one exact-distinct pass for the err columns; set math on <= 2k
    driver-side hashes."""
    from ..functions.sketches import grouped_kmv_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    both = ev.map_batches(
        lambda b: b.filter(pa.array(np.isin(
            b.column("event_type").to_numpy(zero_copy_only=False),
            ("view", "purchase")))),
        batch_format="pyarrow")
    sk = grouped_kmv_distinct(both, key="event_type", value="user_id",
                              k=k, keep_hashes=True).set_index("event_type")
    m48 = 1 << 48
    theta_a = int(sk.loc["view", "h_k"]) \
        if sk.loc["view", "n_sketch"] >= k else m48
    theta_b = int(sk.loc["purchase", "h_k"]) \
        if sk.loc["purchase", "n_sketch"] >= k else m48
    theta = min(theta_a, theta_b)
    sa = {h for h in sk.loc["view", "hashes"] if h < theta}
    sb = {h for h in sk.loc["purchase", "hashes"] if h < theta}
    est_inter = len(sa & sb) * m48 // theta
    est_union = len(sa | sb) * m48 // theta

    # exact side: one distinct-pair exchange, flags folded per user
    def flags(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "v": (df["event_type"] == "view").astype("int64"),
            "p": (df["event_type"] == "purchase").astype("int64")})

    f = (both.map_batches(flags, batch_format="pyarrow")
         .groupby("user_id").max(["v", "p"]).to_pandas())
    vc = f["max(v)"].astype(bool)
    pc_ = f["max(p)"].astype(bool)
    n_inter = int((vc & pc_).sum())
    n_union = int((vc | pc_).sum())
    return pd.DataFrame({
        "pair": ["view*purchase"],
        "n_exact_inter": np.array([n_inter], dtype="int64"),
        "est_inter": np.array([est_inter], dtype="int64"),
        "n_exact_union": np.array([n_union], dtype="int64"),
        "est_union": np.array([est_union], dtype="int64")})


Q284_SQL = """
WITH va AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'view'),
pu AS (SELECT DISTINCT user_id FROM events
       WHERE event_type = 'purchase'),
ha AS (SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS hv FROM va),
hb AS (SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS hv FROM pu),
ka AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn
                       FROM ha) WHERE rn <= 64),
kb AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn
                       FROM hb) WHERE rn <= 64),
th AS (
  SELECT least(
    CASE WHEN (SELECT count(*) FROM ha) >= 64
         THEN (SELECT max(hv) FROM ka) ELSE 281474976710656 END,
    CASE WHEN (SELECT count(*) FROM hb) >= 64
         THEN (SELECT max(hv) FROM kb) ELSE 281474976710656 END) AS theta),
sa AS (SELECT hv FROM ka, th WHERE hv < theta),
sb AS (SELECT hv FROM kb, th WHERE hv < theta),
ii AS (SELECT count(*) AS n FROM (SELECT hv FROM sa INTERSECT
                                  SELECT hv FROM sb)),
uu AS (SELECT count(*) AS n FROM (SELECT hv FROM sa UNION
                                  SELECT hv FROM sb)),
xx AS (SELECT
  (SELECT count(*) FROM (SELECT user_id FROM va INTERSECT
                         SELECT user_id FROM pu)) AS n_inter,
  (SELECT count(*) FROM (SELECT user_id FROM va UNION
                         SELECT user_id FROM pu)) AS n_union)
SELECT 'view*purchase' AS pair,
       CAST(xx.n_inter AS BIGINT) AS n_exact_inter,
       CAST(ii.n * 281474976710656 // th.theta AS BIGINT) AS est_inter,
       CAST(xx.n_union AS BIGINT) AS n_exact_union,
       CAST(uu.n * 281474976710656 // th.theta AS BIGINT) AS est_union
FROM xx, ii, uu, th
"""


def q285_grouped_ols_slope(sf_dir: str) -> pd.DataFrame:
    """Per-user ordinary-least-squares TREND of event value over event
    rank (the drift detector a metrics pipeline fits per key): slope
    in exact integer ppm via the closed form
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) with x = 0-based rank in
    (ts, event_id) order, y = value cents.  Moments are distributive —
    ONE crc(user) exchange on the keyed-window scaffold, Python-int
    cross products in the fold (n*Sxy*1e6 exceeds int64; the oracle
    casts to HUGEINT for the same reason), sign-aware truncation so
    DuckDB's // agrees on negative slopes.  Users with < 2 events are
    dropped (degenerate fit)."""
    from ..stages.window import hash_bucketed_map_groups

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "ts_ns": (pd.to_datetime(df["ts"]).astype("datetime64[ns]")
                      .astype("int64")),
            "cents": np.round(df["value"].to_numpy() * 100)
            .astype("int64")})

    def ols(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_ns", "event_id"], kind="stable")
        rows = []
        for uid, gg in g.groupby("user_id", sort=False):
            n = len(gg)
            if n < 2:
                continue
            y = [int(v) for v in gg["cents"]]
            sx = n * (n - 1) // 2
            sxx = (n - 1) * n * (2 * n - 1) // 6
            sy = sum(y)
            sxy = sum(i * v for i, v in enumerate(y))
            num = n * sxy - sx * sy
            den = n * sxx - sx * sx
            sgn = 1 if num >= 0 else -1
            rows.append({"user_id": np.int64(uid),
                         "n_events": np.int64(n),
                         "slope_ppm": np.int64(
                             sgn * (abs(num) * 1_000_000 // den))})
        if not rows:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "slope_ppm": pd.Series([], dtype="int64")})
        return pd.DataFrame(rows)

    out = hash_bucketed_map_groups(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", fn=ols).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


Q285_SQL = """
WITH v AS (
  SELECT user_id,
         CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS HUGEINT) AS x,
         CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS y
  FROM events),
m AS (
  SELECT user_id, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
         sum(y) AS sy, sum(x * y) AS sxy
  FROM v GROUP BY user_id HAVING count(*) >= 2),
s AS (
  SELECT user_id, n,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS den
  FROM m)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST((CASE WHEN num >= 0 THEN 1 ELSE -1 END)
            * (abs(num) * 1000000 // den) AS BIGINT) AS slope_ppm
FROM s ORDER BY user_id
"""


def q286_winsorize(sf_dir: str) -> pd.DataFrame:
    """Per-group winsorization audit (the robust-clipping step feature
    pipelines apply before training): order totals clipped at the
    exact discrete p05/p95 per order priority, reporting the clipped
    sums and clip counts.  Exact quantiles from ONE co-location pass
    (stages/stats.py:grouped_quantile_disc), then the 5-row fence
    table BROADCASTS into a second streamed pass that clips and folds
    combiner-first — the big table shuffles zero times.  Oracle:
    quantile_disc + greatest/least."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.round(
            b.column("o_totalprice").to_numpy() * 100).astype("int64")
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "cents": pa.array(c)})

    vals = orders.map_batches(cents, batch_format="pyarrow")
    from ..stages.stats import grouped_quantile_disc
    q = grouped_quantile_disc(
        vals, ["o_orderpriority"], "cents",
        [("p05_cents", 1, 20), ("p95_cents", 19, 20)]).to_pandas()
    fences = ray.put({
        str(r.o_orderpriority): (int(r.p05_cents), int(r.p95_cents))
        for r in q.itertuples()})

    def clip(b: pa.Table) -> pd.DataFrame:
        f = ray.get(fences)
        df = b.to_pandas()
        pr = df["o_orderpriority"].astype(str).to_numpy()
        v = df["cents"].to_numpy()
        lo = np.array([f[p][0] for p in pr], dtype="int64")
        hi = np.array([f[p][1] for p in pr], dtype="int64")
        w = np.clip(v, lo, hi)
        part = pd.DataFrame({
            "o_orderpriority": pr, "sum_cents": v, "wins_cents": w,
            "n_lo": (v < lo).astype("int64"),
            "n_hi": (v > hi).astype("int64")})
        return (part.groupby("o_orderpriority", sort=False)
                .agg(sum_cents=("sum_cents", "sum"),
                     wins_cents=("wins_cents", "sum"),
                     n_lo=("n_lo", "sum"), n_hi=("n_hi", "sum"))
                .reset_index())

    t = (vals.map_batches(clip, batch_format="pyarrow").to_pandas()
         .groupby("o_orderpriority", sort=False).sum().reset_index())
    out = q.merge(t, on="o_orderpriority")
    out["o_orderpriority"] = out["o_orderpriority"].astype(str)
    for c in ("p05_cents", "p95_cents", "sum_cents", "wins_cents",
              "n_lo", "n_hi"):
        out[c] = out[c].astype("int64")
    return (out[["o_orderpriority", "p05_cents", "p95_cents",
                 "sum_cents", "wins_cents", "n_lo", "n_hi"]]
            .sort_values("o_orderpriority").reset_index(drop=True))


Q286_SQL = """
WITH v AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
q AS (
  SELECT o_orderpriority,
         CAST(quantile_disc(cents, 0.05) AS BIGINT) AS p05_cents,
         CAST(quantile_disc(cents, 0.95) AS BIGINT) AS p95_cents
  FROM v GROUP BY 1)
SELECT v.o_orderpriority, q.p05_cents, q.p95_cents,
       CAST(sum(v.cents) AS BIGINT) AS sum_cents,
       CAST(sum(greatest(q.p05_cents, least(q.p95_cents, v.cents)))
            AS BIGINT) AS wins_cents,
       CAST(count(*) FILTER (WHERE v.cents < q.p05_cents)
            AS BIGINT) AS n_lo,
       CAST(count(*) FILTER (WHERE v.cents > q.p95_cents)
            AS BIGINT) AS n_hi
FROM v JOIN q USING (o_orderpriority)
GROUP BY 1, 2, 3 ORDER BY 1
"""


def q288_rolling_zscore_anomalies(sf_dir: str) -> pd.DataFrame:
    """Rolling z-score anomaly detection in EXACT integer arithmetic
    (the streaming-metrics outlier flag, with the float trap removed):
    per user, over the trailing 24 events (ROWS window, current row
    included), flag |z| > 2 via the cross-multiplied identity
    z^2 > 4  <=>  n*(n*x - s1)^2 > 4*n*(n*s2 - s1^2) / n ... reduced
    to (n*x - s1)^2 > 4*(n*s2 - s1^2) — no sqrt, no division, so the
    SQL oracle replays it bit-for-bit.  ONE crc(user) exchange;
    in-bucket the rolling sums are two cumsum-diff arrays.  Windows
    shorter than 4 rows never flag (degenerate variance)."""
    from ..stages.window import hash_bucketed_map_groups

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    W = 24

    def prep(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts_ns": (pd.to_datetime(df["ts"]).astype("datetime64[ns]")
                      .astype("int64")),
            "cents": np.round(df["value"].to_numpy() * 100)
            .astype("int64")})

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_ns", "event_id"], kind="stable")
        rows = []
        for uid, gg in g.groupby("user_id", sort=False):
            x = gg["cents"].to_numpy("int64")
            n_r = len(x)
            c1 = np.concatenate([[0], np.cumsum(x)])
            c2 = np.concatenate([[0], np.cumsum(x * x)])
            lo = np.maximum(0, np.arange(n_r) - W + 1)
            hi = np.arange(n_r) + 1
            n = (hi - lo).astype("int64")
            s1 = c1[hi] - c1[lo]
            s2 = c2[hi] - c2[lo]
            dev = n * x - s1
            var4 = 4 * (n * s2 - s1 * s1)
            flag = (n >= 4) & (dev * dev > var4)
            rows.append(pd.DataFrame({
                "event_id": gg["event_id"].to_numpy("int64"),
                "user_id": np.int64(uid),
                "win_n": n,
                "is_anomaly": flag.astype("int64")}))
        if not rows:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "win_n": pd.Series([], dtype="int64"),
                "is_anomaly": pd.Series([], dtype="int64")})
        return pd.concat(rows, ignore_index=True)

    out = hash_bucketed_map_groups(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", fn=roll).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


Q288_SQL = """
WITH v AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS x, ts
  FROM events),
w AS (
  SELECT event_id, user_id, x,
         count(*) OVER win AS n,
         sum(x) OVER win AS s1,
         sum(x * x) OVER win AS s2
  FROM v
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(n AS BIGINT) AS win_n,
       CAST(CASE WHEN n >= 4
                  AND (n * x - s1) * (n * x - s1)
                      > 4 * (n * s2 - s1 * s1)
             THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM w ORDER BY event_id
"""


def q287_temporal_reachability(sf_dir: str, rounds: int = 3) -> pd.DataFrame:
    """Time-respecting earliest-arrival reachability
    (stages/graph.py:temporal_earliest_arrival) over the supply-chain
    temporal graph: customer -> supplier edges stamped with the ORDER
    date, supplier -> customer edges stamped with the SHIP date — a
    path is realizable only with non-decreasing edge times, the
    semantics static BFS gets wrong.  Suppliers carry the -(s+1)
    encoding (key 0 collision lesson, ADVICE r2).  Seeds: customers
    with key % 500 = 0 at t0 = epoch.  Bounded rounds unroll to a
    MATERIALIZED-CTE oracle replaying the identical min-merge
    trajectory."""
    from ..stages.graph import temporal_earliest_arrival
    from ..stages.joins import smart_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    li_sh = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_suppkey", "l_shipdate"])

    DAY_NS = 86_400_000_000_000

    def order_days(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_custkey": df["o_custkey"].astype("int64"),
            "o_days": (pd.to_datetime(df["o_orderdate"])
                       .astype("datetime64[ns]").astype("int64")
                       // DAY_NS)})

    od = orders.map_batches(order_days, batch_format="pyarrow")
    joined = smart_join(li, od, on="l_orderkey", right_on="o_orderkey")

    def fwd(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "src": df["o_custkey"].astype("int64"),
            "dst": (-(df["l_suppkey"].astype("int64") + 1)),
            "t": df["o_days"].astype("int64")})

    def ship_days(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].astype("int64"),
            "l_suppkey": df["l_suppkey"].astype("int64"),
            "s_days": (pd.to_datetime(df["l_shipdate"])
                       .astype("datetime64[ns]").astype("int64")
                       // DAY_NS)})

    jb = smart_join(
        li_sh.map_batches(ship_days, batch_format="pyarrow"),
        od.map_batches(
            lambda b: b.select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow"),
        on="l_orderkey", right_on="o_orderkey")

    def bwd(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "src": (-(df["l_suppkey"].astype("int64") + 1)),
            "dst": df["o_custkey"].astype("int64"),
            "t": df["s_days"].astype("int64")})

    edges = (joined.map_batches(fwd, batch_format="pyarrow")
             .union(jb.map_batches(bwd, batch_format="pyarrow")))

    cust = _read(sf_dir, "customer", ["c_custkey"])
    seeds = cust.map_batches(
        lambda b: pd.DataFrame({
            "node": b.column("c_custkey").to_numpy()[
                b.column("c_custkey").to_numpy() % 500 == 0]
            .astype("int64")}).assign(t0=np.int64(0)),
        batch_format="pyarrow")

    out = temporal_earliest_arrival(
        edges, seeds, rounds=rounds).to_pandas()
    out["node"] = out["node"].astype("int64")
    out["t_arr"] = out["t_arr"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def _q287_sql(rounds: int = 3) -> str:
    parts = ["""
WITH oe AS MATERIALIZED (
  SELECT o.o_custkey AS src, -(l.l_suppkey + 1) AS dst,
         CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01'
              AS BIGINT) AS t
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT -(l.l_suppkey + 1), o.o_custkey,
         CAST(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
a0 AS MATERIALIZED (
  SELECT c_custkey AS node, CAST(0 AS BIGINT) AS t_arr
  FROM customer WHERE c_custkey % 500 = 0)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
a{r} AS MATERIALIZED (
  SELECT node, min(t_arr) AS t_arr FROM (
    SELECT node, t_arr FROM a{r - 1}
    UNION ALL
    SELECT e.dst AS node, e.t AS t_arr
    FROM a{r - 1} p JOIN oe e
      ON e.src = p.node AND e.t >= p.t_arr
  ) GROUP BY node)""")
    parts.append(f"""
SELECT CAST(node AS BIGINT) AS node, CAST(t_arr AS BIGINT) AS t_arr
FROM a{rounds} ORDER BY node""")
    return "".join(parts)


Q287_SQL = _q287_sql()


def btb_image_phash_dedup(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate IMAGE dedup via perceptual hashing
    (stages/multimodal.py:ImagePerceptualHasher + the signature-
    agnostic banded-hamming transport from stages/dedup.py): the SAME
    picture re-encoded across every REAL codec in the engine (PNG,
    GIF, BMP, TIFF, PPM, baseline JPEG) plus a brightness-shifted
    copy must collapse into one dHash cluster (hamming 0 — gradients
    survive re-encode and uniform shifts), while distinct pictures
    stay apart.  Corrupt rows keep their row flagged.  Golden-pinned
    (rows-only); invariance pinned analytically in
    tests/test_multimodal.py."""
    from ..stages.multimodal import (encode_bmp, encode_gif, encode_jpeg,
                                     encode_png, encode_ppm, encode_tiff,
                                     image_phash_neardups)

    def make_img(seed: int) -> np.ndarray:
        y, x = np.mgrid[0:72, 0:72]
        return np.stack([
            (((x + seed * 7) // 18) * 50 % 251).astype(np.uint8),
            (((y + seed * 13) // 18) * 40 % 251).astype(np.uint8),
            np.full((72, 72), (seed * 29) % 251, np.uint8)], axis=2)

    refs, payloads = [], []
    encoders = [("png", encode_png), ("gif", encode_gif),
                ("bmp", encode_bmp), ("tiff", encode_tiff),
                ("ppm", encode_ppm), ("jpeg", encode_jpeg)]
    for seed in range(4):
        img = make_img(seed)
        for fmt, enc in encoders:
            refs.append(f"img://{seed}/{fmt}")
            payloads.append(enc(img))
        shifted = np.clip(img.astype(int) + 3, 0, 255).astype(np.uint8)
        refs.append(f"img://{seed}/shifted")
        payloads.append(encode_png(shifted))
    refs.append("img://bad")
    payloads.append(b"not-an-image")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([None] * len(refs), type=pa.int64()),
        "height": pa.array([None] * len(refs), type=pa.int64())}))
    sigs, pairs = image_phash_neardups(media, max_hamming=3)
    sdf = sigs.to_pandas()
    pdf = pairs.to_pandas()
    # summarize: per image cluster, how many of its 7 variants paired
    sdf["dhash_hex"] = [f"{int(v):016x}" for v in sdf["dhash"]]
    sdf["ahash_hex"] = [f"{int(v):016x}" for v in sdf["ahash"]]
    sdf = sdf.drop(columns=["dhash", "ahash"])
    pdf = pdf.sort_values(["left_id", "right_id"]).reset_index(drop=True)
    out = sdf.merge(
        pdf.groupby("left_id").size().rename("n_pairs_as_left")
        .reset_index().rename(columns={"left_id": "media_ref"}),
        on="media_ref", how="left")
    out["n_pairs_as_left"] = (out["n_pairs_as_left"].fillna(0)
                              .astype("int64"))
    for c in ("img_w", "img_h"):
        out[c] = out[c].astype("int64")
    return (out[["media_ref", "dhash_hex", "ahash_hex", "img_w",
                 "img_h", "decode_status", "n_pairs_as_left"]]
            .sort_values("media_ref").reset_index(drop=True))


def btb_audio_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate AUDIO dedup via energy fingerprints
    (stages/multimodal.py:AudioFingerprinter + the shared banded-
    hamming transport): the SAME recording re-encoded through every
    REAL audio coding in the engine (PCM16, G.711 u-law/A-law, IMA
    ADPCM) plus a gain-scaled copy collapses to one hamming-0
    fingerprint cluster (window-energy RATIOS survive companding,
    requantization and uniform gain — and the decode_wav fact-chunk
    trim keeps ADPCM frame-aligned), while different recordings stay
    apart.  Corrupt rows keep their row flagged.  Golden-pinned
    (rows-only); invariance pinned in tests/test_multimodal.py."""
    from ..stages.multimodal import (audio_fingerprint_neardups,
                                     encode_wav)

    def make_audio(seed: int) -> np.ndarray:
        rng = np.random.RandomState(100 + seed)
        W, n_per = 66, 200
        env = np.repeat(rng.uniform(0.08, 0.85, W), n_per)
        k = np.hanning(81)
        env = np.convolve(env, k / k.sum(), mode="same")
        t = np.arange(W * n_per) / 8000.0
        f1, f2 = 220 + 37 * seed, 110 + 23 * seed
        x = env * (0.7 * np.sin(2 * np.pi * f1 * t)
                   + 0.3 * np.sin(2 * np.pi * f2 * t))
        return (np.clip(x, -0.99, 0.99) * 32767).astype(np.int16)[:, None]

    refs, payloads = [], []
    for seed in range(3):
        xi = make_audio(seed)
        for fmt in ("pcm16", "ulaw", "alaw", "ima_adpcm"):
            refs.append(f"wav://{seed}/{fmt}")
            payloads.append(encode_wav(xi, 8000, fmt=fmt))
        refs.append(f"wav://{seed}/gain")
        payloads.append(encode_wav(
            (xi * 0.25).astype(np.int16), 8000, fmt="pcm16"))
    refs.append("wav://bad")
    payloads.append(b"RIFFgarbage-not-a-wave")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary())}))
    sigs, pairs = audio_fingerprint_neardups(media, max_hamming=3)
    sdf = sigs.to_pandas()
    pdf = pairs.to_pandas()
    sdf["fp_hex"] = [f"{int(v):016x}" for v in sdf["fingerprint"]]
    sdf = sdf.drop(columns=["fingerprint"])
    out = sdf.merge(
        pdf.groupby("left_id").size().rename("n_pairs_as_left")
        .reset_index().rename(columns={"left_id": "media_ref"}),
        on="media_ref", how="left")
    out["n_pairs_as_left"] = (out["n_pairs_as_left"].fillna(0)
                              .astype("int64"))
    for c in ("sample_rate", "n_frames"):
        out[c] = out[c].astype("int64")
    return (out[["media_ref", "fp_hex", "sample_rate", "n_frames",
                 "decode_status", "n_pairs_as_left"]]
            .sort_values("media_ref").reset_index(drop=True))


def q289_conversion_attribution(sf_dir: str) -> pd.DataFrame:
    """Conversion attribution (first-touch AND last-touch, the
    marketing-analytics join a clickstream pipeline runs): for each
    purchase event, the user's first and last 'view' in the trailing
    7 days (strictly before the purchase; ties on timestamp broken by
    event_id so both engines pick the same touch).  ONE crc(user)
    exchange; in-bucket the per-user view lists resolve every purchase
    with two binary searches — no per-event loop, no self-join.
    Purchases with no view in the window report -1.  Oracle:
    correlated min/max subqueries over the same window."""
    from ..stages.window import hash_bucketed_map_groups

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts"])
    WIN_NS = 7 * 86_400_000_000_000

    def prep(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["event_type"].isin(["view", "purchase"])]
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "event_type": df["event_type"].astype(str),
            "ts_ns": (pd.to_datetime(df["ts"]).astype("datetime64[ns]")
                      .astype("int64"))})

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, gg in g.groupby("user_id", sort=False):
            v = (gg[gg["event_type"] == "view"]
                 .sort_values(["ts_ns", "event_id"], kind="stable"))
            p = gg[gg["event_type"] == "purchase"]
            if not len(p):
                continue
            vt = v["ts_ns"].to_numpy("int64")
            vid = v["event_id"].to_numpy("int64")
            pt = p["ts_ns"].to_numpy("int64")
            pid = p["event_id"].to_numpy("int64")
            hi = np.searchsorted(vt, pt, side="left")  # strictly before
            lo = np.searchsorted(vt, pt - WIN_NS, side="left")
            has = hi > lo
            first = np.where(has, vid[np.clip(lo, 0, max(len(vid) - 1, 0))]
                             if len(vid) else -1, -1)
            last = np.where(has, vid[np.clip(hi - 1, 0,
                                             max(len(vid) - 1, 0))]
                            if len(vid) else -1, -1)
            rows.append(pd.DataFrame({
                "purchase_event_id": pid,
                "user_id": np.int64(uid),
                "first_touch_event_id": first.astype("int64"),
                "last_touch_event_id": last.astype("int64")}))
        if not rows:
            return pd.DataFrame({
                "purchase_event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "first_touch_event_id": pd.Series([], dtype="int64"),
                "last_touch_event_id": pd.Series([], dtype="int64")})
        return pd.concat(rows, ignore_index=True)

    out = hash_bucketed_map_groups(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", fn=attribute).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return (out.sort_values("purchase_event_id")
            .reset_index(drop=True))


Q289_SQL = """
WITH v AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'view'),
p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(COALESCE((
         SELECT v.event_id FROM v
         WHERE v.user_id = p.user_id AND v.ts < p.ts
           AND v.ts >= p.ts - INTERVAL 7 DAY
         ORDER BY v.ts, v.event_id LIMIT 1), -1)
         AS BIGINT) AS first_touch_event_id,
       CAST(COALESCE((
         SELECT v.event_id FROM v
         WHERE v.user_id = p.user_id AND v.ts < p.ts
           AND v.ts >= p.ts - INTERVAL 7 DAY
         ORDER BY v.ts DESC, v.event_id DESC LIMIT 1), -1)
         AS BIGINT) AS last_touch_event_id
FROM p ORDER BY purchase_event_id
"""


def q290_interval_coverage(sf_dir: str) -> pd.DataFrame:
    """Interval-union coverage (the classic islands problem: total
    time covered by possibly-overlapping intervals): per user, each
    event opens an interval [ts, ts + (cents % 720) minutes] — a rule
    both engines replay — and the answer is the union length in
    minutes plus the island count.  ONE crc(user) exchange; in-bucket
    the fold is sort + running-max prefix + vectorized clamp (no
    per-interval loop).  Oracle: the window-max islands technique."""
    from ..stages.window import hash_bucketed_map_groups

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    MIN_NS = 60_000_000_000

    def prep(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        cents = np.round(df["value"].to_numpy() * 100).astype("int64")
        start = (pd.to_datetime(df["ts"]).astype("datetime64[ns]")
                 .astype("int64"))
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "s_ns": start,
            "e_ns": start + (cents % 720) * MIN_NS})

    def cover(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "s_ns", "e_ns", "event_id"],
                          kind="stable")
        rows = []
        for uid, gg in g.groupby("user_id", sort=False):
            s = gg["s_ns"].to_numpy("int64")
            e = gg["e_ns"].to_numpy("int64")
            runmax = np.maximum.accumulate(e)
            prev = np.concatenate([[np.iinfo(np.int64).min],
                                   runmax[:-1]])
            new_island = s > prev
            # covered = sum over rows of max(0, min-growth of runmax)
            grow = np.where(new_island, e - s,
                            np.maximum(e - prev, 0))
            rows.append({"user_id": np.int64(uid),
                         "covered_min": np.int64(grow.sum() // MIN_NS),
                         "n_islands": np.int64(new_island.sum())})
        return pd.DataFrame(rows) if rows else pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "covered_min": pd.Series([], dtype="int64"),
            "n_islands": pd.Series([], dtype="int64")})

    out = hash_bucketed_map_groups(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", fn=cover).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


Q290_SQL = """
WITH iv AS (
  SELECT user_id, event_id,
         CAST(epoch_ns(CAST(ts AS TIMESTAMP)) AS BIGINT) AS s_ns,
         CAST(epoch_ns(CAST(ts AS TIMESTAMP)) AS BIGINT)
           + (CAST(round(value * 100) AS BIGINT) % 720)
             * 60000000000 AS e_ns
  FROM events),
o AS (
  SELECT user_id, s_ns, e_ns,
         max(e_ns) OVER (PARTITION BY user_id
                         ORDER BY s_ns, e_ns, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS prev_max
  FROM iv),
g AS (
  SELECT user_id,
         CASE WHEN prev_max IS NULL OR s_ns > prev_max
              THEN e_ns - s_ns
              ELSE greatest(e_ns - prev_max, 0) END AS grow,
         CASE WHEN prev_max IS NULL OR s_ns > prev_max
              THEN 1 ELSE 0 END AS isl
  FROM o)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(grow) // 60000000000 AS BIGINT) AS covered_min,
       CAST(sum(isl) AS BIGINT) AS n_islands
FROM g GROUP BY user_id ORDER BY user_id
"""


def q291_phrase_index_search(sf_dir: str) -> pd.DataFrame:
    """Persisted positional inverted index + exact phrase search
    (state/search_index.py — the retrieval surface): the corpus is
    committed in TWO incremental snapshots (even doc_ids, then odd),
    and the phrase 'table key' is answered by reading ONLY the term
    buckets it hashes to — no corpus rescan, commit cost O(snapshot),
    query cost O(matching postings).  The oracle replays the
    tokenizer (regexp_extract_all + lower, ASCII-exact) and the
    contiguous-position join, proving the index is lossless."""
    import shutil
    import tempfile

    from ..state.search_index import commit_snapshot, phrase_search

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    state = tempfile.mkdtemp(prefix="gtb_searchidx_")
    try:
        even = docs.map_batches(
            lambda b: b.filter(pa.array(
                b.column("doc_id").to_numpy() % 2 == 0)),
            batch_format="pyarrow")
        odd = docs.map_batches(
            lambda b: b.filter(pa.array(
                b.column("doc_id").to_numpy() % 2 == 1)),
            batch_format="pyarrow")
        commit_snapshot(even, state, "even")
        commit_snapshot(odd, state, "odd")
        out = phrase_search(state, "table key")
    finally:
        shutil.rmtree(state, ignore_errors=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


Q291_SQL = """
WITH toks AS (
  SELECT doc_id, lower(unnest(l)) AS term,
         unnest(range(len(l))) AS pos
  FROM (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS l
        FROM documents)),
m AS (
  SELECT a.doc_id, a.pos
  FROM toks a JOIN toks b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'key'
  WHERE a.term = 'table')
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM m GROUP BY doc_id ORDER BY doc_id
"""


def q292_storage_layout_advisor(sf_dir: str) -> pd.DataFrame:
    """Columnar storage-layout advisor (the audit that decides Parquet
    encodings: run-length vs dictionary): for each candidate column of
    orders, the RUN count in o_orderkey order (RLE potential) and the
    distinct count (dictionary potential), plus avg run length in
    exact ppm.  Scale shape: ONE native sort by the key, then
    per-block partials (runs inside the block + the block's first/last
    values) folded with an O(blocks) boundary pass on the driver — the
    global-prefix-scan discipline; distinct counts ride one keyed
    combiner exchange per column.  Oracle: lag() window + count
    DISTINCT."""
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    orders = _read(sf_dir, "orders", ["o_orderkey"] + cols)
    sorted_ds = orders.sort("o_orderkey")

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        if not len(df):
            return pd.DataFrame({
                "first_key": pd.Series([], dtype="int64"),
                **{f"{c}_{s}": pd.Series([], dtype=object)
                   for c in cols for s in ("first", "last")},
                **{f"{c}_runs": pd.Series([], dtype="int64")
                   for c in cols},
                "n_rows": pd.Series([], dtype="int64")})
        row = {"first_key": [np.int64(df["o_orderkey"].iloc[0])],
               "n_rows": [np.int64(len(df))]}
        for c in cols:
            v = df[c].to_numpy()
            row[f"{c}_first"] = [v[0]]
            row[f"{c}_last"] = [v[-1]]
            row[f"{c}_runs"] = [np.int64(1 + (v[1:] != v[:-1]).sum())]
        return pd.DataFrame(row)

    parts = (sorted_ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().sort_values("first_key")
             .reset_index(drop=True))
    n_rows = int(parts["n_rows"].sum())
    runs = {}
    for c in cols:
        r = int(parts[f"{c}_runs"].sum())
        # boundary fold: a block whose first value equals the previous
        # block's last value does NOT start a new run
        prev_last = parts[f"{c}_last"].iloc[:-1].to_numpy()
        nxt_first = parts[f"{c}_first"].iloc[1:].to_numpy()
        r -= int((prev_last == nxt_first).sum())
        runs[c] = r

    distincts = {}
    for c in cols:
        distincts[c] = (orders.select_columns([c])
                        .groupby(c).count().count())

    out = pd.DataFrame({
        "column": cols,
        "n_rows": np.int64(n_rows),
        "n_distinct": [np.int64(distincts[c]) for c in cols],
        "n_runs": [np.int64(runs[c]) for c in cols],
        "avg_run_ppm": [np.int64(n_rows * 1_000_000 // runs[c])
                        for c in cols]})
    out["column"] = out["column"].astype(str)
    for c in ("n_rows", "n_distinct", "n_runs", "avg_run_ppm"):
        out[c] = out[c].astype("int64")
    return out.sort_values("column").reset_index(drop=True)


Q292_SQL = """
WITH s AS (
  SELECT o_orderstatus, o_orderpriority, o_custkey,
         lag(o_orderstatus) OVER w AS p1,
         lag(o_orderpriority) OVER w AS p2,
         lag(o_custkey) OVER w AS p3
  FROM orders WINDOW w AS (ORDER BY o_orderkey)),
m AS (
  SELECT count(*) AS n_rows,
         count(DISTINCT o_orderstatus) AS d1,
         count(DISTINCT o_orderpriority) AS d2,
         count(DISTINCT o_custkey) AS d3,
         count(*) FILTER (WHERE p1 IS NULL
                          OR o_orderstatus <> p1) AS r1,
         count(*) FILTER (WHERE p2 IS NULL
                          OR o_orderpriority <> p2) AS r2,
         count(*) FILTER (WHERE p3 IS NULL
                          OR o_custkey <> p3) AS r3
  FROM s)
SELECT col.column1 AS "column",
       CAST(m.n_rows AS BIGINT) AS n_rows,
       CAST(CASE col.column1 WHEN 'o_custkey' THEN m.d3
            WHEN 'o_orderpriority' THEN m.d2 ELSE m.d1 END
            AS BIGINT) AS n_distinct,
       CAST(CASE col.column1 WHEN 'o_custkey' THEN m.r3
            WHEN 'o_orderpriority' THEN m.r2 ELSE m.r1 END
            AS BIGINT) AS n_runs,
       CAST(m.n_rows * 1000000 //
            (CASE col.column1 WHEN 'o_custkey' THEN m.r3
             WHEN 'o_orderpriority' THEN m.r2 ELSE m.r1 END)
            AS BIGINT) AS avg_run_ppm
FROM m CROSS JOIN (VALUES ('o_custkey'), ('o_orderpriority'),
                          ('o_orderstatus')) AS col(column1)
ORDER BY "column"
"""


def btb_media_curation(sf_dir: str) -> pd.DataFrame:
    """The MEDIA-CURATION capstone (pipelines/media.py:curate_media —
    the multimodal composition mirroring the text curation funnel):
    mixed-format image corpus -> header probe (no pixel decode) ->
    perceptual hashes -> hamming near-dup clustering -> canonical
    keeper per cluster -> features decoded for KEEPERS ONLY.  Planted
    clusters (one picture re-encoded across codecs) collapse to one
    canonical; corrupt rows ride through flagged.  Golden-pinned."""
    from ..pipelines.media import curate_media
    from ..stages.multimodal import (encode_bmp, encode_gif, encode_png,
                                     encode_ppm)

    def make_img(seed: int) -> np.ndarray:
        y, x = np.mgrid[0:48, 0:48]
        return np.stack([
            (((x + seed * 5) // 12) * 55 % 251).astype(np.uint8),
            (((y + seed * 11) // 12) * 45 % 251).astype(np.uint8),
            np.full((48, 48), (seed * 37) % 251, np.uint8)], axis=2)

    refs, payloads = [], []
    encs = [("png", encode_png), ("gif", encode_gif),
            ("bmp", encode_bmp), ("ppm", encode_ppm)]
    for seed in range(3):
        img = make_img(seed)
        for fmt, enc in encs:
            refs.append(f"m://{seed}/{fmt}")
            payloads.append(enc(img))
    refs.append("m://bad")
    payloads.append(b"garbage-bytes")
    media = rd.from_arrow(pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary())}))
    out = curate_media(media).to_pandas()
    out["dhash_hex"] = [f"{int(v):016x}" for v in out["dhash"]]
    out["ahash_hex"] = [f"{int(v):016x}" for v in out["ahash"]]
    out = out.drop(columns=["dhash", "ahash"])
    out["is_canonical"] = out["is_canonical"].astype(bool)
    for c in ("probe_w", "probe_h", "mean_luma"):
        out[c] = out[c].astype("int64")
    return (out[["media_ref", "probe_format", "probe_w", "probe_h",
                 "dhash_hex", "ahash_hex", "cluster_id",
                 "is_canonical", "decode_status", "mean_luma"]]
            .sort_values("media_ref").reset_index(drop=True))


def q293_hierarchy_rollup(sf_dir: str, levels: int = 5) -> pd.DataFrame:
    """Hierarchical rollup (the BOM/org-chart subtree aggregate): each
    customer hangs under the decimal-trie hierarchy parent(c) = c // 10,
    and every internal node reports its SUBTREE order-cents total and
    leaf count.  Scale shape: ancestors are ARITHMETIC (c // 10^d), so
    each leaf emits its <= `levels` ancestor rows ROW-LOCALLY (a
    flat-map, never an iterative parent join) and ONE grouped sum
    finishes the rollup — the depth-bounded trie trick that turns a
    recursive aggregation into a single exchange.  Leaf sums ride a
    pre-aggregation per customer first, so the ancestor blowup
    multiplies customer-level rows, not order-level.  Only nodes at
    depth >= 1 (true ancestors) are reported.  Oracle: UNION ALL over
    the power ladder."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "cents": np.round(df["o_totalprice"].to_numpy() * 100)
            .astype("int64")})

    per_cust = (orders.map_batches(cents, batch_format="pyarrow")
                .groupby("o_custkey").sum("cents")
                .map_batches(lambda b: pa.table({
                    "o_custkey": b.column("o_custkey"),
                    "cents": b.column("sum(cents)")}),
                    batch_format="pyarrow"))

    def ancestors(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        c = df["o_custkey"].to_numpy("int64")
        v = df["cents"].to_numpy("int64")
        nodes, depths, vals, leaves = [], [], [], []
        anc = c.copy()
        for d in range(1, levels + 1):
            anc = anc // 10
            nodes.append(anc.copy())
            depths.append(np.full(len(c), d, dtype="int64"))
            vals.append(v)
            leaves.append(np.ones(len(c), dtype="int64"))
        return pd.DataFrame({
            "node": np.concatenate(nodes),
            "depth": np.concatenate(depths),
            "cents": np.concatenate(vals),
            "n_leaves": np.concatenate(leaves)})

    out = (per_cust.map_batches(ancestors, batch_format="pyarrow")
           .groupby(["node", "depth"]).sum(["cents", "n_leaves"])
           .to_pandas())
    out = out.rename(columns={"sum(cents)": "subtree_cents",
                              "sum(n_leaves)": "n_leaves"})
    for c in ("node", "depth", "subtree_cents", "n_leaves"):
        out[c] = out[c].astype("int64")
    return (out[["node", "depth", "subtree_cents", "n_leaves"]]
            .sort_values(["depth", "node"]).reset_index(drop=True))


Q293_SQL = """
WITH leaf AS (
  SELECT o_custkey AS c,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
anc AS (
  SELECT c // 10 AS node, 1 AS depth, cents FROM leaf
  UNION ALL SELECT c // 100, 2, cents FROM leaf
  UNION ALL SELECT c // 1000, 3, cents FROM leaf
  UNION ALL SELECT c // 10000, 4, cents FROM leaf
  UNION ALL SELECT c // 100000, 5, cents FROM leaf)
SELECT CAST(node AS BIGINT) AS node, CAST(depth AS BIGINT) AS depth,
       CAST(sum(cents) AS BIGINT) AS subtree_cents,
       CAST(count(*) AS BIGINT) AS n_leaves
FROM anc GROUP BY 1, 2 ORDER BY depth, node
"""


def q294_ranked_retrieval(sf_dir: str, k: int = 15) -> pd.DataFrame:
    """Ranked retrieval over the persisted positional index
    (state/search_index.py:ranked_search): integer tf-idf-lite scoring
    score(d) = sum tf(t,d) * (1e6 // df(t)) over the distinct query
    terms — floor division keeps the ranking exact-integer, so the
    oracle replays it bit-for-bit (a float BM25 could not be
    hash-compared).  The index is committed in two incremental
    snapshots; the query reads ONLY its terms' buckets, df comes from
    the index itself, and doc scores fold on one crc(doc) exchange.
    Ties break on doc_id."""
    import shutil
    import tempfile

    from ..state.search_index import commit_snapshot, ranked_search

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    state = tempfile.mkdtemp(prefix="gtb_rankidx_")
    try:
        commit_snapshot(docs.map_batches(
            lambda b: b.filter(pa.array(
                b.column("doc_id").to_numpy() % 2 == 0)),
            batch_format="pyarrow"), state, "even")
        commit_snapshot(docs.map_batches(
            lambda b: b.filter(pa.array(
                b.column("doc_id").to_numpy() % 2 == 1)),
            batch_format="pyarrow"), state, "odd")
        out = ranked_search(state, "vector table spark", k=k)
    finally:
        shutil.rmtree(state, ignore_errors=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


Q294_SQL = """
WITH toks AS (
  SELECT doc_id, lower(unnest(l)) AS term
  FROM (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS l
        FROM documents)),
q(term) AS (VALUES ('vector'), ('table'), ('spark')),
tf AS (
  SELECT t.doc_id, t.term, count(*) AS tf
  FROM toks t JOIN q ON q.term = t.term GROUP BY 1, 2),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM toks WHERE term IN (SELECT term FROM q) GROUP BY 1),
s AS (
  SELECT tf.doc_id,
         sum(tf.tf * (1000000 // df.df)) AS score
  FROM tf JOIN df ON df.term = tf.term GROUP BY 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(score AS BIGINT) AS score
FROM s ORDER BY score DESC, doc_id LIMIT 15
"""


def q295_join_size_estimate(sf_dir: str) -> pd.DataFrame:
    """Self-join-size (F2) estimation WITHOUT running the join — the
    planner statistic the AMS/CMS inner product was built for (Cormode
    & Muthukrishnan §4.2): |events JOIN events| on user_id
    (= sum of squared per-user counts, the second frequency moment)
    estimated from ONE count-min sketch dotted with itself.  Per-batch
    partials merge driver-side (the HLL plan shape: a few KB each, NO
    shuffle, the table never moves); estimate = min over rows of the
    squared-counter sum, always an overestimate, tight exactly when
    the join is skew-dominated — the case where knowing the size
    matters.  (A uniform FK join like orders x lineitem is the
    estimator's documented worst case: collision mass e/w*|A||B|
    swamps the true count-product.)  The exact side (for err_ppm) is
    one grouped-count pass + a sum of squares.  Rows-only/golden: the
    sketch hash (pandas hash_array + splitmix64) has no SQL replay."""
    from ..functions.sketches import CountMinSketch

    ev = _read(sf_dir, "events", ["user_id"])

    def part(b: pa.Table) -> pd.DataFrame:
        keys, counts = np.unique(
            b.column("user_id").to_numpy(), return_counts=True)
        s = CountMinSketch(width=4096, depth=4)
        s.add_counts(keys.tolist(), counts)
        return pd.DataFrame({"t": [s.table.tobytes()]})

    parts = ev.map_batches(part, batch_format="pyarrow").to_pandas()
    acc = CountMinSketch(width=4096, depth=4)
    for blob in parts.get("t", []):
        other = CountMinSketch(width=4096, depth=4)
        other.table = np.frombuffer(
            blob, dtype=np.int64).reshape(4, 4096).copy()
        acc.merge(other)
    est = acc.inner_product(acc)

    counts = ev.groupby("user_id").count().to_pandas()
    ccol = [c for c in counts.columns if c != "user_id"][0]
    c = counts[ccol].to_numpy("int64")
    n_exact = int((c * c).sum())
    return pd.DataFrame({
        "pair": ["events*events@user_id"],
        "n_exact": np.array([n_exact], dtype="int64"),
        "n_est": np.array([est], dtype="int64"),
        "overestimate": np.array([est >= n_exact], dtype=bool),
        "err_ppm": np.array(
            [(est - n_exact) * 1_000_000 // max(n_exact, 1)],
            dtype="int64")})


def q296_event_transitions(sf_dir: str) -> pd.DataFrame:
    """Event-type transition matrix (the first-order Markov summary of
    user journeys): consecutive event pairs per user in (ts, event_id)
    order, counted globally, with the row-conditional probability in
    exact integer ppm (floor division — both engines agree).  ONE
    crc(user) exchange; in-bucket the pair emission is a vectorized
    shift, and only (from, to, n) partials leave the bucket.  Oracle:
    lead() window + a windowed row total."""
    from ..stages.window import hash_bucketed_map_groups

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts"])

    def prep(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "event_type": df["event_type"].astype(str),
            "ts_ns": (pd.to_datetime(df["ts"]).astype("datetime64[ns]")
                      .astype("int64"))})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_ns", "event_id"],
                          kind="stable")
        u = g["user_id"].to_numpy("int64")
        t = g["event_type"].to_numpy()
        same = u[:-1] == u[1:]
        part = pd.DataFrame({"from_type": t[:-1][same],
                             "to_type": t[1:][same]})
        return (part.groupby(["from_type", "to_type"], sort=False)
                .size().rename("n").reset_index())

    counts = (hash_bucketed_map_groups(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", fn=pairs).to_pandas()
        .groupby(["from_type", "to_type"], sort=False)["n"].sum()
        .reset_index())
    totals = counts.groupby("from_type")["n"].sum().rename("row_total")
    out = counts.merge(totals, on="from_type")
    out["p_ppm"] = (out["n"] * 1_000_000 // out["row_total"])
    for c in ("from_type", "to_type"):
        out[c] = out[c].astype(str)
    for c in ("n", "p_ppm"):
        out[c] = out[c].astype("int64")
    return (out[["from_type", "to_type", "n", "p_ppm"]]
            .sort_values(["from_type", "to_type"])
            .reset_index(drop=True))


Q296_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (
  SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 //
            sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
FROM c ORDER BY from_type, to_type
"""


def q297_monthly_quantile_bands(sf_dir: str) -> pd.DataFrame:
    """Composite-key exact quantile bands (the per-period robust
    summary dashboards plot): per (order month, priority), the exact
    discrete p25/p50/p75 of order cents from ONE co-location pass —
    grouped_quantile_disc on a COMPOSITE key, showing the holistic
    quantile scaffold is key-arity-agnostic.  Oracle: quantile_disc
    grouped the same way; months travel as strings (timestamp dtype
    parity trap)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({
            "month": (pd.to_datetime(df["o_orderdate"])
                      .dt.strftime("%Y-%m")),
            "o_orderpriority": df["o_orderpriority"].astype(str),
            "cents": np.round(df["o_totalprice"].to_numpy() * 100)
            .astype("int64")})

    from ..stages.stats import grouped_quantile_disc
    out = grouped_quantile_disc(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["month", "o_orderpriority"], "cents",
        [("p25_cents", 1, 4), ("p50_cents", 1, 2),
         ("p75_cents", 3, 4)]).to_pandas()
    for c in ("month", "o_orderpriority"):
        out[c] = out[c].astype(str)
    for c in ("p25_cents", "p50_cents", "p75_cents"):
        out[c] = out[c].astype("int64")
    return (out[["month", "o_orderpriority", "p25_cents", "p50_cents",
                 "p75_cents"]]
            .sort_values(["month", "o_orderpriority"])
            .reset_index(drop=True))


Q297_SQL = """
SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
       o_orderpriority,
       CAST(quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT),
                          0.25) AS BIGINT) AS p25_cents,
       CAST(quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT),
                          0.50) AS BIGINT) AS p50_cents,
       CAST(quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT),
                          0.75) AS BIGINT) AS p75_cents
FROM orders GROUP BY 1, 2 ORDER BY month, o_orderpriority
"""


def q298_quota_allocation(sf_dir: str) -> pd.DataFrame:
    """EXACT-SIZE proportional-allocation sampling (the corpus-balancing
    step of web-scale corpus prep — per-domain quotas): a total budget of
    T = N // 2 docs is split across `source` strata proportionally to each
    stratum's total n_chars by the largest-remainder (Hamilton) method in
    PURE INTEGER arithmetic (base = w_i*T // W, leftovers to the largest
    w_i*T % W remainders, ties by source asc), each allocation clipped to
    the stratum's row count (truncated Hamilton — no redistribution, so
    both engines agree without iterating).  Within a stratum the selected
    rows are the alloc_i smallest by md5(doc_id) (deterministic "random",
    stable across engines/block layouts).  Distinct from q64 (Bernoulli
    temperature resampling — probabilistic size) and q57/q205 (fixed
    fraction): this is the exact-budget allocator.

    Scale shape: stratum stats via per-batch combiner (bounded source
    enum); the per-stratum selection keeps <= alloc_i rows per batch (so
    <= T per batch) and the driver fold merges bounded partials — the
    output itself is the T-row sample, so driver state is O(T), the
    sampler's contract."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    stats = _preagg(docs, ["source"],
                    {"n": ("doc_id", "count"), "w": ("n_chars", "sum")})
    n_total = int(stats["n"].sum())
    w_total = int(stats["w"].sum())
    t_budget = n_total // 2
    stats["base"] = (stats["w"] * t_budget) // w_total
    stats["rem"] = (stats["w"] * t_budget) % w_total
    stats = stats.sort_values(["rem", "source"], ascending=[False, True],
                              kind="stable").reset_index(drop=True)
    extra = t_budget - int(stats["base"].sum())
    stats["alloc"] = stats["base"] + (np.arange(len(stats)) < extra)
    stats["alloc"] = np.minimum(stats["alloc"], stats["n"]).astype("int64")
    alloc_ref = ray.put(dict(zip(stats["source"], stats["alloc"])))

    def partial(batch: pa.Table) -> pd.DataFrame:
        alloc = ray.get(alloc_ref)
        df = batch.to_pandas()[["source", "doc_id"]]
        df["h"] = [hashlib.md5(str(int(d)).encode()).hexdigest()
                   for d in df["doc_id"]]
        df = df.sort_values(["source", "h", "doc_id"], kind="stable")
        df["rk"] = df.groupby("source").cumcount()
        keep = df["rk"] < df["source"].map(alloc).fillna(0).astype("int64")
        return df.loc[keep, ["source", "doc_id", "h"]]

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    alloc = dict(zip(stats["source"], stats["alloc"]))
    parts = parts.sort_values(["source", "h", "doc_id"], kind="stable")
    parts["rk"] = parts.groupby("source").cumcount()
    out = parts[parts["rk"] < parts["source"].map(alloc)]
    out = out[["source", "doc_id"]].sort_values(
        ["source", "doc_id"], kind="stable").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out


Q298_SQL = """
WITH t AS (SELECT count(*) AS n_all, count(*) // 2 AS budget FROM documents),
c AS (SELECT source, count(*) AS n, sum(n_chars) AS w
      FROM documents GROUP BY source),
wt AS (SELECT sum(w) AS w_total FROM c),
b AS (SELECT c.source, c.n,
             (c.w * t.budget) // wt.w_total AS base,
             (c.w * t.budget) % wt.w_total AS rem
      FROM c, t, wt),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b),
a AS (SELECT source, n,
             base + CASE WHEN rk <= (SELECT budget FROM t)
                                     - (SELECT sum(base) FROM b)
                    THEN 1 ELSE 0 END AS raw_alloc
      FROM r),
al AS (SELECT source, least(raw_alloc, n) AS alloc FROM a),
s AS (SELECT source, doc_id, row_number() OVER (
        PARTITION BY source
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
SELECT s.source, s.doc_id FROM s JOIN al USING (source) WHERE s.rk <= al.alloc
"""


def q299_hard_negatives(sf_dir: str) -> pd.DataFrame:
    """Hard-negative mining for contrastive training
    (stages/similarity.py:hard_negative_topk): for each of 8 query
    vectors, the exact cosine top-5 neighbors with a DIFFERENT label —
    queries + labels broadcast once, one streamed corpus pass with
    per-batch (k x queries) partials, bounded driver merge.  Distinct
    from q18 (unconstrained ANN) and q121 (modular KG corruption
    sampling): the label-exclusion mask is what makes the negatives
    hard."""
    from ..stages.similarity import hard_negative_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    qrows = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 8)), batch_format="pyarrow"
    ).take_all()  # 8 tiny rows reach the driver
    queries = {r["vec_id"]: r["embedding"] for r in qrows}
    labels = {r["vec_id"]: r["label"] for r in qrows}
    out = hard_negative_topk(emb, queries, labels, k=5)
    out["neighbor_label"] = out["neighbor_label"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return out[["query_id", "neighbor_id", "neighbor_label", "score", "rank"]]


Q299_SQL = """
WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qe
           FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST(e.label AS BIGINT) AS neighbor_label,
         round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]),
               6) AS score
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.query_id AND e.label != q.qlabel
),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, neighbor_id, neighbor_label, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
"""


def q300_dag_betweenness(sf_dir: str) -> pd.DataFrame:
    """DAG path-through centrality (all-paths betweenness): n_through(v) =
    (#root->v paths) x (#v->sink paths) = the number of complete
    root-to-sink paths crossing v — the counting-semiring betweenness a
    lineage/impact analysis reads off a provenance DAG.  Two
    dag_path_counts runs (stages/graph.py — q259's forward counts, plus
    the same fold on the REVERSED edge set, whose roots are the sinks),
    joined per node; the per-node product is exact int64.  Node space is
    the q259 4-layer construction (<= 4,020 nodes by construction —
    bounded), so the final join folds driver-side; unbounded graphs would
    use the native hash join instead."""
    from ..stages.graph import dag_path_counts

    li = _read(sf_dir, "lineitem",
               ["l_linenumber", "l_partkey", "l_suppkey"])

    def to_edges(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["l_linenumber"] <= 4]
        return pd.DataFrame({
            "src": ((df["l_linenumber"] - 1) * 1000
                    + df["l_partkey"] % 80).astype("int64"),
            "dst": (df["l_linenumber"] * 1000
                    + df["l_suppkey"] % 80).astype("int64")})

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    fwd = dag_path_counts(edges, k=4).to_pandas()
    rev = edges.map_batches(
        lambda b: pa.table({"src": b.column("dst"), "dst": b.column("src")}),
        batch_format="pyarrow")
    bwd = dag_path_counts(rev, k=4).to_pandas()
    out = fwd.merge(bwd, on="node", suffixes=("_fwd", "_bwd"))
    out["n_through"] = (out["n_paths_fwd"].astype("int64")
                        * out["n_paths_bwd"].astype("int64"))
    out = out[["node", "n_through"]].sort_values("node").reset_index(drop=True)
    out["node"] = out["node"].astype("int64")
    return out


Q300_SQL = """
WITH e AS MATERIALIZED (
  SELECT (l_linenumber - 1) * 1000 + (l_partkey % 80) AS src,
         l_linenumber * 1000 + (l_suppkey % 80) AS dst
  FROM lineitem WHERE l_linenumber <= 4),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
f0 AS MATERIALIZED (SELECT node, CAST(1 AS BIGINT) AS cnt FROM nodes
      WHERE node NOT IN (SELECT dst FROM e)),
f1 AS MATERIALIZED (SELECT e.dst AS node, CAST(SUM(f0.cnt) AS BIGINT) AS cnt
      FROM f0 JOIN e ON e.src = f0.node GROUP BY e.dst),
f2 AS MATERIALIZED (SELECT e.dst AS node, CAST(SUM(f1.cnt) AS BIGINT) AS cnt
      FROM f1 JOIN e ON e.src = f1.node GROUP BY e.dst),
f3 AS MATERIALIZED (SELECT e.dst AS node, CAST(SUM(f2.cnt) AS BIGINT) AS cnt
      FROM f2 JOIN e ON e.src = f2.node GROUP BY e.dst),
f4 AS MATERIALIZED (SELECT e.dst AS node, CAST(SUM(f3.cnt) AS BIGINT) AS cnt
      FROM f3 JOIN e ON e.src = f3.node GROUP BY e.dst),
fwd AS MATERIALIZED (
  SELECT node, CAST(SUM(cnt) AS BIGINT) AS n_fwd
  FROM (SELECT * FROM f0 UNION ALL SELECT * FROM f1
        UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
        UNION ALL SELECT * FROM f4)
  GROUP BY node),
b0 AS MATERIALIZED (SELECT node, CAST(1 AS BIGINT) AS cnt FROM nodes
      WHERE node NOT IN (SELECT src FROM e)),
b1 AS MATERIALIZED (SELECT e.src AS node, CAST(SUM(b0.cnt) AS BIGINT) AS cnt
      FROM b0 JOIN e ON e.dst = b0.node GROUP BY e.src),
b2 AS MATERIALIZED (SELECT e.src AS node, CAST(SUM(b1.cnt) AS BIGINT) AS cnt
      FROM b1 JOIN e ON e.dst = b1.node GROUP BY e.src),
b3 AS MATERIALIZED (SELECT e.src AS node, CAST(SUM(b2.cnt) AS BIGINT) AS cnt
      FROM b2 JOIN e ON e.dst = b2.node GROUP BY e.src),
b4 AS MATERIALIZED (SELECT e.src AS node, CAST(SUM(b3.cnt) AS BIGINT) AS cnt
      FROM b3 JOIN e ON e.dst = b3.node GROUP BY e.src),
bwd AS MATERIALIZED (
  SELECT node, CAST(SUM(cnt) AS BIGINT) AS n_bwd
  FROM (SELECT * FROM b0 UNION ALL SELECT * FROM b1
        UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3
        UNION ALL SELECT * FROM b4)
  GROUP BY node)
SELECT fwd.node, fwd.n_fwd * bwd.n_bwd AS n_through
FROM fwd JOIN bwd USING (node) ORDER BY node
"""


def q301_bloom_point_lookup(sf_dir: str) -> pd.DataFrame:
    """Per-file Bloom-index point lookup over the clustered store
    (sources/range_store.py:build_bloom_index / read_point_lookup — the
    lakehouse file-skipping index): lineitem is range-clustered by
    l_orderkey, a Bloom index is built over the NON-clustering column
    l_partkey (one bounded bitset per file, one streamed pass), and the
    point query reads only Bloom-positive files with an exact equality
    residual.  False positives cost file reads, never rows.  Oracle:
    the plain equality scan."""
    import tempfile

    from ..sources.range_store import (
        build_bloom_index,
        read_point_lookup,
        write_range_partitioned,
    )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"])
    root = tempfile.mkdtemp(prefix="q301_", dir="/tmp")
    try:
        path = root + "/store"
        write_range_partitioned(li.repartition(16), path, "l_orderkey",
                                num_ranges=8)
        build_bloom_index(path, "l_partkey")
        out = read_point_lookup(
            path, "l_partkey", 7,
            columns=["l_orderkey", "l_linenumber", "l_quantity"]).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out["l_partkey"] = np.int64(7)
    out = out[["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"]]
    return out.sort_values(["l_orderkey", "l_linenumber"],
                           kind="stable").reset_index(drop=True)


Q301_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM lineitem WHERE l_partkey = 7
ORDER BY l_orderkey, l_linenumber
"""


def q302_compact_store(sf_dir: str) -> pd.DataFrame:
    """Small-file compaction (sources/range_store.py:compact_store — the
    lakehouse OPTIMIZE primitive) with read-equality proof: events are
    range-clustered by ts into a deliberately fragmented store (32 input
    blocks x 8 ranges), compacted to one file per range (per-range Ray
    tasks, two-rename atomicity, manifest unchanged, Bloom indexes
    rebuilt), then a key-range read over the COMPACTED store must equal
    the plain SQL range scan."""
    import tempfile

    from ..sources.range_store import (
        compact_store,
        read_key_range,
        write_range_partitioned,
    )

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    root = tempfile.mkdtemp(prefix="q302_", dir="/tmp")
    try:
        path = root + "/store"
        write_range_partitioned(ev.repartition(32), path, "ts", num_ranges=8)
        stats = compact_store(path, target_rows_per_file=1 << 20)
        assert stats["files_after"] < stats["files_before"]
        lo = dt.datetime(2024, 1, 3)
        hi = dt.datetime(2024, 1, 5)
        out = read_key_range(path, lo, hi,
                             columns=["event_id", "user_id"]).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id", kind="stable").reset_index(drop=True)


Q302_SQL = """
SELECT event_id, user_id FROM events
WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-05'
ORDER BY event_id
"""


def q303_schema_evolution_read(sf_dir: str) -> pd.DataFrame:
    """Schema-evolution parquet read (sources/io.py:read_parquet_evolving
    — the long-lived-table reality: columns added/dropped across file
    generations): generation A holds (o_orderkey, o_totalprice) for even
    keys, generation B holds (o_orderkey, o_orderstatus) for odd keys;
    the evolving reader unifies from file FOOTERS only (O(files) driver
    work, no data scan) and pads missing columns with typed nulls inside
    map_batches.  Oracle replays the union-with-nulls directly over
    orders."""
    import tempfile

    from ..sources.io import read_parquet_evolving

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice", "o_orderstatus"])
    d = tempfile.mkdtemp(prefix="q303_", dir="/tmp")

    def gen_a(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(pc.bit_wise_and(b["o_orderkey"], 1), 0))
        return t.select(["o_orderkey", "o_totalprice"])

    def gen_b(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(pc.bit_wise_and(b["o_orderkey"], 1), 1))
        return t.select(["o_orderkey", "o_orderstatus"])

    try:
        orders.map_batches(gen_a, batch_format="pyarrow").write_parquet(
            f"{d}/gen=a")
        orders.map_batches(gen_b, batch_format="pyarrow").write_parquet(
            f"{d}/gen=b")
        out = read_parquet_evolving(d).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return out.sort_values("o_orderkey", kind="stable").reset_index(drop=True)


Q303_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS o_totalprice,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS o_orderstatus
FROM orders ORDER BY o_orderkey
"""


def q304_compacted_index_search(sf_dir: str) -> pd.DataFrame:
    """Index compaction with query-equality proof
    (state/search_index.py:compact_index — the maintenance op that
    restores query read-amplification to one file set per term bucket
    while commits stay O(new-data)): the corpus is committed in FOUR
    snapshots (doc_id % 4), compacted to one (per-bucket parallel merge,
    manifest-guarded crash recovery), and the phrase query over the
    compacted index must equal q291's SQL replay over the raw corpus."""
    import shutil
    import tempfile

    from ..state.search_index import (
        commit_snapshot,
        compact_index,
        phrase_search,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    state = tempfile.mkdtemp(prefix="gtb_cidx_")
    try:
        for r in range(4):
            part = docs.map_batches(
                lambda b, _r=r: b.filter(pa.array(
                    b.column("doc_id").to_numpy() % 4 == _r)),
                batch_format="pyarrow")
            commit_snapshot(part, state, f"part{r}")
        stats = compact_index(state)
        assert stats == {"snapshots_before": 4, "snapshots_after": 1}
        out = phrase_search(state, "table key")
    finally:
        shutil.rmtree(state, ignore_errors=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


Q304_SQL = Q291_SQL


def q305_property_graph_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Property-graph export -> IMPORT round trip (stages/kgprep.py:
    import_property_graph, the inverse of q208's export — the full
    interchange loop every graph-DB migration needs): the customer KG
    exports to Neo4j-bulk node/relationship CSV parts, imports back to
    (s, p, o) triples (row-local flat-maps, no exchange), and the
    reconstructed store must equal the original triple multiset.
    Oracle: the three triple families in plain SQL."""
    import tempfile

    from ..stages.kgprep import export_property_graph, import_property_graph

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_nationkey"])

    def to_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        s = "cust:" + df["c_custkey"].astype(str)
        return pd.concat([
            pd.DataFrame({"s": s, "p": "type", "o": "Customer"}),
            pd.DataFrame({"s": s, "p": "segment",
                          "o": df["c_mktsegment"].astype(str)}),
            pd.DataFrame({"s": s, "p": "in_nation",
                          "o": "nation:" + df["c_nationkey"].astype(str)}),
        ], ignore_index=True)

    store = cust.map_batches(to_triples, batch_format="pyarrow")
    out_dir = tempfile.mkdtemp(prefix="pgrt_", dir="/tmp")
    try:
        paths = export_property_graph(
            store, out_dir, rel_preds=["in_nation"], prop_preds=["segment"])
        back = import_property_graph(
            paths["nodes_dir"], paths["rels_dir"], prop_preds=["segment"])
        out = back.to_pandas().astype(str)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out.sort_values(["s", "p", "o"],
                           kind="stable").reset_index(drop=True)


Q305_SQL = """
WITH t AS (
  SELECT 'cust:' || c_custkey AS s, 'type' AS p, 'Customer' AS o
  FROM customer
  UNION ALL
  SELECT 'cust:' || c_custkey, 'segment', c_mktsegment FROM customer
  UNION ALL
  SELECT 'cust:' || c_custkey, 'in_nation', 'nation:' || c_nationkey
  FROM customer)
SELECT s, p, o FROM t ORDER BY s, p, o
"""


def q306_leakage_safe_split(sf_dir: str) -> pd.DataFrame:
    """Leakage-safe train/test split (the eval-hygiene step of every
    training-data pipeline): docs split deterministically by md5(doc_id)
    (10% test — the q64 md5_number_lower parity trick), then any TRAIN
    doc whose exact text hash also appears in TEST is flagged as leaked
    and excluded.  The leak check is ONE crc(text-hash)-bucket exchange
    (test and train copies of a hash co-locate by construction — never a
    broadcast of the test set, which is O(corpus) at scale).  Output:
    per-source (n_train, n_test, n_leaked)."""
    import hashlib
    import zlib

    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ids = df["doc_id"].astype(str)
        split = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
             % 10 == 0 for s in ids), dtype=bool, count=len(df))
        h = [hashlib.md5((t or "").encode()).hexdigest()
             for t in df["text"]]
        return pd.DataFrame({
            "source": df["source"].astype(str),
            "is_test": split.astype("int64"),
            "h": h,
            "_bucket": np.fromiter(
                (zlib.crc32(x.encode()) % 32 for x in h),
                dtype="int32", count=len(df))})

    def leak_check(g: pd.DataFrame) -> pd.DataFrame:
        test_h = set(g.loc[g["is_test"] == 1, "h"])
        train = g[g["is_test"] == 0]
        leaked = train["h"].isin(test_h)
        out = pd.DataFrame({
            "source": pd.concat([g.loc[g["is_test"] == 1, "source"],
                                 train["source"]], ignore_index=True),
            "kind": (["test"] * int((g["is_test"] == 1).sum())
                     + np.where(leaked, "leaked", "train").tolist())})
        return (out.groupby(["source", "kind"], sort=False)
                .size().reset_index(name="n"))

    parts = (docs.map_batches(tag, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(leak_check, batch_format="pandas")
             .to_pandas())
    parts = parts.sort_values(["source", "kind", "n"],
                              kind="stable").reset_index(drop=True)
    agg = (parts.groupby(["source", "kind"], sort=False)["n"].sum()
           .unstack(fill_value=0).reset_index())
    for c in ("train", "test", "leaked"):
        if c not in agg.columns:
            agg[c] = 0
    out = pd.DataFrame({
        "source": agg["source"],
        "n_train": agg["train"].astype("int64"),
        "n_test": agg["test"].astype("int64"),
        "n_leaked": agg["leaked"].astype("int64")})
    return out.sort_values("source", kind="stable").reset_index(drop=True)


Q306_SQL = """
WITH d AS (
  SELECT source, md5(coalesce(text, '')) AS h,
         CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 = 0
              THEN 1 ELSE 0 END AS is_test
  FROM documents),
t AS (SELECT DISTINCT h FROM d WHERE is_test = 1)
SELECT source,
       count(*) FILTER (is_test = 0 AND h NOT IN (SELECT h FROM t))
         AS n_train,
       count(*) FILTER (is_test = 1) AS n_test,
       count(*) FILTER (is_test = 0 AND h IN (SELECT h FROM t))
         AS n_leaked
FROM d GROUP BY source ORDER BY source
"""


def q307_adaptive_quality_gate(sf_dir: str) -> pd.DataFrame:
    """Per-source ADAPTIVE quality gating (the CCNet-style step: a
    global threshold over-prunes terse domains and under-prunes verbose
    ones, so each source gets its own bar): quality signal = whitespace
    token count; bar = the source's exact discrete p25 (grouped-quantile
    kernel — per-batch combiner over the bounded source enum); one
    broadcast of the tiny (source -> p25) map gates a second streamed
    pass.  Output: per-source (p25_tokens, n_kept, n_dropped); kept =
    tokens >= p25."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def toks(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame({
            "source": df["source"].astype(str),
            "n_tok": df["text"].map(
                lambda t: len((t or "").split())).astype("int64")})

    counted = docs.map_batches(toks, batch_format="pyarrow")
    # exact per-source p25: sources are a bounded enum, so the full
    # (source, n_tok) histogram folds driver-side from per-batch partials
    hist = _preagg(
        counted.map_batches(
            lambda b: b.to_pandas().groupby(
                ["source", "n_tok"], sort=False).size().reset_index(name="c"),
            batch_format="pyarrow"),
        ["source", "n_tok"], {"c": ("c", "sum")})
    p25 = {}
    for src, grp in hist.groupby("source"):
        grp = grp.sort_values("n_tok")
        total = int(grp["c"].sum())
        # DuckDB quantile_disc(x, 0.25) = sorted element at 0-based rank
        # floor(0.25 * (n-1)) — verified empirically; mirror exactly
        need = int(np.floor(0.25 * (total - 1))) + 1  # 1-based cum rank
        cum = grp["c"].cumsum()
        p25[src] = int(grp.loc[cum >= need, "n_tok"].iloc[0])
    p25_ref = ray.put(p25)

    def gate(batch: pa.Table) -> pd.DataFrame:
        bar = ray.get(p25_ref)
        df = batch.to_pandas()
        src = df["source"].astype(str)
        nt = df["text"].map(lambda t: len((t or "").split()))
        kept = nt >= src.map(bar)
        out = pd.DataFrame({"source": src, "kept": kept})
        return (out.groupby(["source", "kept"], sort=False)
                .size().reset_index(name="n"))

    parts = _preagg(docs.map_batches(gate, batch_format="pyarrow"),
                    ["source", "kept"], {"n": ("n", "sum")})
    agg = parts.pivot_table(index="source", columns="kept", values="n",
                            fill_value=0, aggfunc="sum").reset_index()
    out = pd.DataFrame({
        "source": agg["source"].astype(str),
        "p25_tokens": agg["source"].map(p25).astype("int64"),
        "n_kept": agg.get(True, pd.Series(0, index=agg.index)).astype("int64"),
        "n_dropped": agg.get(False, pd.Series(0, index=agg.index)).astype("int64"),
    })
    return out.sort_values("source", kind="stable").reset_index(drop=True)


Q307_SQL = """
WITH d AS (
  SELECT source,
         len(regexp_extract_all(coalesce(text, ''), '\\S+')) AS n_tok
  FROM documents),
q AS (SELECT source,
             CAST(quantile_disc(n_tok, 0.25) AS BIGINT) AS p25_tokens
      FROM d GROUP BY source)
SELECT d.source, q.p25_tokens,
       count(*) FILTER (d.n_tok >= q.p25_tokens) AS n_kept,
       count(*) FILTER (d.n_tok < q.p25_tokens) AS n_dropped
FROM d JOIN q ON d.source = q.source
GROUP BY d.source, q.p25_tokens ORDER BY d.source
"""


def q308_grid_distance_join(sf_dir: str) -> pd.DataFrame:
    """Spatial distance self-join via grid blocking
    (stages/joins.py:grid_distance_join — the spatial analog of LSH
    banding: constant 9x ghost replication + one cell-bucket exchange
    instead of the O(n^2) cross join): parts become integer points
    (x = key*37 % 1000, y = key*91 % 1000), pairs within squared
    distance 15^2 in exact integer arithmetic.  Oracle: the literal
    cross join with the same distance predicate — feasible at oracle
    scale, the thing the grid exists to avoid at 100 TB."""
    from ..stages.joins import grid_distance_join

    part = _read(sf_dir, "part", ["p_partkey"])

    def to_points(b: pa.Table) -> pd.DataFrame:
        k = b.column("p_partkey").to_numpy().astype("int64")
        return pd.DataFrame({"id": k, "x": (k * 37) % 1000,
                             "y": (k * 91) % 1000})

    pts = part.map_batches(to_points, batch_format="pyarrow")
    out = grid_distance_join(pts, radius=15).to_pandas()
    if not len(out):
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "dist_sq": pd.Series(dtype="int64")})
    out = out.astype("int64")
    return out.sort_values(["a", "b"], kind="stable").reset_index(drop=True)


Q308_SQL = """
WITH p AS (
  SELECT p_partkey AS id, (p_partkey * 37) % 1000 AS x,
         (p_partkey * 91) % 1000 AS y
  FROM part)
SELECT a.id AS a, b.id AS b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
FROM p a JOIN p b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 225
ORDER BY a, b
"""


def q309_frequent_triples(sf_dir: str) -> pd.DataFrame:
    """Apriori LEVEL 3 (frequent item TRIPLES, extending q278's pair
    pass): triples of parts sharing >= 2 distinct orders.  The classic
    candidate pruning makes this tractable: a triple can be frequent
    only if all three of its pairs are, so the frequent-PAIR set (the
    already-pruned small dimension, from cooccurrence_edges) broadcasts
    once and each order's basket generates only pair-consistent
    candidates inside one order-bucket exchange; candidate counts fold
    per bucket before the final tiny merge.  At 100 TB the broadcast
    side is the pruned pair set, not the baskets.  Oracle: the literal
    3-way self-join."""
    from ..stages.graph import cooccurrence_edges

    minsup = 2
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    pairs = cooccurrence_edges(li, "l_orderkey", "l_partkey",
                               min_count=minsup).to_pandas()
    freq = set(zip(pairs["a"].astype(int), pairs["b"].astype(int)))
    freq_ref = ray.put(freq)

    def tag(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().drop_duplicates()
        df.columns = ["o", "i"]
        df["_bucket"] = (df["o"] % 32).astype("int32")
        return df

    def gen_triples(g: pd.DataFrame) -> pd.DataFrame:
        fp = ray.get(freq_ref)
        g = g.drop_duplicates(["o", "i"]).sort_values(["o", "i"],
                                                      kind="stable")
        oo = g["o"].to_numpy()
        ii = g["i"].to_numpy()
        brk = np.flatnonzero(oo[1:] != oo[:-1])
        starts = np.concatenate([[0], brk + 1])
        ends = np.concatenate([brk + 1, [len(g)]])
        X, Y, Z = [], [], []
        for s, e in zip(starts, ends):
            items = ii[s:e]
            if len(items) < 3:
                continue
            # pair-consistent candidates only (Apriori pruning)
            for a_i in range(len(items) - 2):
                for b_i in range(a_i + 1, len(items) - 1):
                    x, y = int(items[a_i]), int(items[b_i])
                    if (x, y) not in fp:
                        continue
                    for c_i in range(b_i + 1, len(items)):
                        z = int(items[c_i])
                        if (x, z) in fp and (y, z) in fp:
                            X.append(x)
                            Y.append(y)
                            Z.append(z)
        out = pd.DataFrame({"x": X, "y": Y, "z": Z})
        if not len(out):
            return pd.DataFrame({"x": pd.Series(dtype="int64"),
                                 "y": pd.Series(dtype="int64"),
                                 "z": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        return (out.groupby(["x", "y", "z"], sort=False)
                .size().reset_index(name="n").astype("int64"))

    parts = (li.map_batches(tag, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(gen_triples, batch_format="pandas")
             .to_pandas())  # candidate triples: pruned, small
    if not len(parts):
        return pd.DataFrame({"x": pd.Series(dtype="int64"),
                             "y": pd.Series(dtype="int64"),
                             "z": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64")})
    out = (parts.groupby(["x", "y", "z"], sort=False)["n"].sum()
           .reset_index())
    out = out[out["n"] >= minsup].astype("int64")
    return out.sort_values(["x", "y", "z"],
                           kind="stable").reset_index(drop=True)


Q309_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem)
SELECT a.i AS x, b.i AS y, c2.i AS z, count(*) AS n
FROM d a JOIN d b ON a.o = b.o AND a.i < b.i
         JOIN d c2 ON a.o = c2.o AND b.i < c2.i
GROUP BY 1, 2, 3 HAVING count(*) >= 2
ORDER BY x, y, z
"""


def q310_dbscan_grid(sf_dir: str) -> pd.DataFrame:
    """Deterministic DBSCAN via grid blocking (the density-clustering
    composition: q308's grid_distance_join supplies eps-adjacency
    without a cross join, connected_components supplies the core-graph
    clustering): eps=8, minPts=3 over md5-placed integer points from
    part.  Core = >= minPts-1 eps-neighbors; clusters = CC over
    core-core edges labeled by MIN member id; border points join the
    MIN label among their core neighbors (the deterministic variant of
    classic DBSCAN's first-found assignment); everything else is noise
    (label -1).  The quadratic step (eps-adjacency) is fully
    distributed; cluster state (core set, label map) rides as broadcast
    maps — the small-side contract, with the native-join variants as
    the at-scale alternative.  Oracle: cross-join adjacency + 12
    unrolled MATERIALIZED min-label rounds (depth verified <= 7)."""
    import hashlib

    from ..stages.dedup import connected_components
    from ..stages.joins import grid_distance_join

    eps, minpts = 8, 3
    part = _read(sf_dir, "part", ["p_partkey"])

    def to_points(b: pa.Table) -> pd.DataFrame:
        k = b.column("p_partkey").to_numpy().astype("int64")
        def mdl(s):
            return int.from_bytes(
                hashlib.md5(s.encode()).digest()[8:], "little")
        return pd.DataFrame({
            "id": k,
            "x": [mdl(str(i)) % 500 for i in k],
            "y": [mdl(str(i) + "y") % 500 for i in k]})

    pts = part.map_batches(to_points, batch_format="pyarrow")
    pairs = grid_distance_join(pts, radius=eps).materialize()

    # degrees -> core set: distributed endpoint fold
    def endpoints(b: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"id": np.concatenate([
            b.column("a").to_numpy(), b.column("b").to_numpy()])})

    deg = _preagg(pairs.map_batches(endpoints, batch_format="pyarrow")
                  .map_batches(lambda b: b.to_pandas().assign(c=1),
                               batch_format="pyarrow"),
                  ["id"], {"d": ("c", "sum")})
    core_ids = set(deg.loc[deg["d"] >= minpts - 1, "id"].astype(int))
    core_ref = ray.put(core_ids)

    def core_edges(b: pa.Table) -> pd.DataFrame:
        cs = ray.get(core_ref)
        df = b.to_pandas()
        keep = df["a"].isin(cs) & df["b"].isin(cs)
        return df.loc[keep, ["a", "b"]]

    cc = connected_components(
        pairs.map_batches(core_edges, batch_format="pyarrow"),
        left_col="a", right_col="b").to_pandas()
    label = dict(zip(cc["node"].astype(int), cc["component"].astype(int)))
    # isolated cores (no core neighbor) form their own singleton cluster
    for cid in core_ids:
        label.setdefault(cid, cid)
    label_ref = ray.put(label)

    # border points: min core-neighbor label, one pass over the pairs
    def border_partials(b: pa.Table) -> pd.DataFrame:
        cs, lab = ray.get(core_ref), ray.get(label_ref)
        df = b.to_pandas()
        rows = []
        for u, v in ((df["a"], df["b"]), (df["b"], df["a"])):
            m = (~u.isin(cs)) & v.isin(cs)
            if m.any():
                rows.append(pd.DataFrame({
                    "id": u[m].astype(int),
                    "lab": v[m].map(lab).astype(int)}))
        if not rows:
            return pd.DataFrame({"id": pd.Series(dtype="int64"),
                                 "lab": pd.Series(dtype="int64")})
        out = pd.concat(rows, ignore_index=True)
        return (out.groupby("id", sort=False)["lab"].min()
                .reset_index())

    bp = _preagg(pairs.map_batches(border_partials, batch_format="pyarrow"),
                 ["id"], {"lab": ("lab", "min")})
    border = dict(zip(bp["id"].astype(int), bp["lab"].astype(int)))
    border_ref = ray.put(border)

    def assemble(b: pa.Table) -> pd.DataFrame:
        cs, lab = ray.get(core_ref), ray.get(label_ref)
        bd = ray.get(border_ref)
        ids = b.column("p_partkey").to_numpy().astype("int64")
        role, lb = [], []
        for i in ids:
            i = int(i)
            if i in cs:
                role.append("core")
                lb.append(lab[i])
            elif i in bd:
                role.append("border")
                lb.append(bd[i])
            else:
                role.append("noise")
                lb.append(-1)
        return pd.DataFrame({"id": ids, "role": role,
                             "cluster": np.asarray(lb, dtype="int64")})

    out = part.map_batches(assemble, batch_format="pyarrow").to_pandas()
    out["id"] = out["id"].astype("int64")
    return out.sort_values("id", kind="stable").reset_index(drop=True)


Q310_SQL = "\n".join(
    ["""
WITH p AS MATERIALIZED (
  SELECT p_partkey AS id,
         CAST(md5_number_lower(CAST(p_partkey AS VARCHAR)) % 500
              AS BIGINT) AS x,
         CAST(md5_number_lower(CAST(p_partkey AS VARCHAR) || 'y') % 500
              AS BIGINT) AS y
  FROM part),
e AS MATERIALIZED (
  SELECT a.id AS u, b.id AS v FROM p a JOIN p b ON a.id != b.id
  WHERE (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= 64),
deg AS MATERIALIZED (SELECT u AS id, count(*) AS d FROM e GROUP BY u),
core AS MATERIALIZED (SELECT id FROM deg WHERE d + 1 >= 3),
ce AS MATERIALIZED (
  SELECT e.u, e.v FROM e
  WHERE e.u IN (SELECT id FROM core) AND e.v IN (SELECT id FROM core)),
l0 AS MATERIALIZED (SELECT id AS node, id AS lab FROM core)"""]
    + [f""",
l{i} AS MATERIALIZED (
  SELECT node, MIN(lab) AS lab FROM (
    SELECT node, lab FROM l{i-1}
    UNION ALL
    SELECT ce.u AS node, l.lab FROM l{i-1} l JOIN ce ON ce.v = l.node
  ) GROUP BY node)""" for i in range(1, 13)]
    + ["""
, bl AS MATERIALIZED (
  SELECT e.u AS id, MIN(l.lab) AS lab
  FROM e JOIN l12 l ON l.node = e.v
  WHERE e.u NOT IN (SELECT id FROM core)
  GROUP BY e.u)
SELECT p.id,
       CASE WHEN l.node IS NOT NULL THEN 'core'
            WHEN bl.id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(coalesce(l.lab, bl.lab, -1) AS BIGINT) AS cluster
FROM p LEFT JOIN l12 l ON l.node = p.id
       LEFT JOIN bl ON bl.id = p.id
ORDER BY p.id"""])


# --------------------------------------------------------------------------
# registry

QUERIES: dict[str, tuple] = {
    # name -> (callable(sf_dir), oracle_sql | None)
    "q01_lineitem_agg": (q01_lineitem_agg, Q01_SQL),
    "q02_filtered_revenue": (q02_filtered_revenue, Q02_SQL),
    "q03_top_orders": (q03_top_orders, Q03_SQL),
    "q04_mktsegment_revenue": (q04_mktsegment_revenue, Q04_SQL),
    "q05_region_customers": (q05_region_customers, Q05_SQL),
    "q06_distinct_flags": (q06_distinct_flags, Q06_SQL),
    "q07_orders_by_status_month": (q07_orders_by_status_month, Q07_SQL),
    "q08_events_hourly": (q08_events_hourly, Q08_SQL),
    "q09_top_users": (q09_top_users, Q09_SQL),
    "q10_sessionize": (q10_sessionize, Q10_SQL),
    "q11_token_count": (q11_token_count, Q11_SQL),
    "q12_lang_stats": (q12_lang_stats, Q12_SQL),
    "q13_exact_dedup": (q13_exact_dedup, Q13_SQL),
    "q14_duplicate_pairs": (q14_duplicate_pairs, Q14_SQL),
    "q15_fingerprint": (q15_fingerprint, Q15_SQL),
    "q16_quality": (q16_quality, Q16_SQL),
    "q17_langid": (q17_langid, _langid_sql()),
    "q18_ann_topk": (q18_ann_topk, Q18_SQL),
    "q19_embedding_norms": (q19_embedding_norms, Q19_SQL),
    "q20_emb_neardup_exact": (q20_emb_neardup_exact, Q20_SQL),
    "q21_emb_neardup_lsh": (q21_emb_neardup_lsh, None),
    "q22_minhash_neardup": (q22_minhash_neardup, None),
    "q23_simhash": (q23_simhash, None),
    "q24_event_type_cooccurrence": (q24_event_type_cooccurrence, Q24_SQL),
    "q25_word_frequencies": (q25_word_frequencies, Q25_SQL),
    "q26_latest_event_per_user": (q26_latest_event_per_user, Q26_SQL),
    "q27_global_sort_check": (q27_global_sort_check, Q27_SQL),
    "q28_part_stats": (q28_part_stats, Q28_SQL),
    "q29_supplier_nation": (q29_supplier_nation, Q29_SQL),
    "q30_orders_lineitem_join": (q30_orders_lineitem_join, Q30_SQL),
    "q31_training_records": (q31_training_records, None),
    "btb_triples": (btb_triples, None),
    "btb_wide": (btb_wide, None),
    "btb_highlighted": (btb_highlighted, None),
    "btb_kfold_metrics": (btb_kfold_metrics, None),
    "btb_curation_pipeline": (btb_curation_pipeline, None),
    "btb_label_stats": (btb_label_stats, None),
    "btb_surface_forms": (btb_surface_forms, None),
    "btb_media_features": (btb_media_features, None),
    "btb_corrected_wide": (btb_corrected_wide, None),
    "btb_global_stats": (btb_global_stats, None),
    "btb_cooccurrence": (btb_cooccurrence, None),
    "btb_threshold_curve": (btb_threshold_curve, None),
    "btb_score_distribution": (btb_score_distribution, None),
    "btb_corrections_by_date": (btb_corrections_by_date, None),
    "q32_ivf_ann_topk": (q32_ivf_ann_topk, None),
    "q33_verified_neardups": (q33_verified_neardups, None),
    "q34_native_join": (q34_native_join, Q30_SQL),
    "q35_sliding_window": (q35_sliding_window, Q35_SQL),
    "q36_topk_per_group": (q36_topk_per_group, Q36_SQL),
    "q37_kmeans_embeddings": (q37_kmeans_embeddings, None),
    "q38_winnow_fingerprints": (q38_winnow_fingerprints, None),
    "q39_bpe_token_count": (q39_bpe_token_count, Q39_SQL),
    "q40_customer_order_counts": (q40_customer_order_counts, Q40_SQL),
    "q41_string_kernels": (q41_string_kernels, Q41_SQL),
    "q42_conditional_agg": (q42_conditional_agg, Q42_SQL),
    "q43_deterministic_sample": (q43_deterministic_sample, Q43_SQL),
    "q44_distinct_counts": (q44_distinct_counts, Q44_SQL),
    "q45_approx_distinct_hll": (q45_approx_distinct_hll, None),
    "q46_median_per_type": (q46_median_per_type, Q46_SQL),
    "q47_having_filter": (q47_having_filter, Q47_SQL),
    "q48_anti_join": (q48_anti_join, Q48_SQL),
    "btb_score_histogram": (btb_score_histogram, None),
    "q49_asof_join": (q49_asof_join, Q49_SQL),
    "q50_range_join_count": (q50_range_join_count, Q50_SQL),
    "q51_running_total": (q51_running_total, Q51_SQL),
    "q52_watermark_late_flags": (q52_watermark_late_flags, Q52_SQL),
    "q53_grouped_quantiles": (q53_grouped_quantiles, Q53_SQL),
    "q54_simhash_neardups": (q54_simhash_neardups, None),
    "q55_dedup_pipeline": (q55_dedup_pipeline, None),
    "q56_rollup": (q56_rollup, Q56_SQL),
    "q57_stratified_sample": (q57_stratified_sample, Q57_SQL),
    "q58_cc_distributed": (q58_connected_components_distributed, None),
    "q59_semi_join_bloom": (q59_semi_join_bloom, Q59_SQL),
    "q60_approx_quantiles": (q60_approx_quantiles, None),
    "q61_repetition_filter": (q61_repetition_filter, Q61_SQL),
    "q62_decontaminate": (q62_decontaminate, Q62_SQL),
    "q63_tfidf_topk": (q63_tfidf_topk, Q63_SQL),
    "q64_mixture_resample": (q64_mixture_resample, Q64_SQL),
    "q65_pack_sequences": (q65_pack_sequences, Q65_SQL),
    "q66_bipartite_pagerank": (q66_bipartite_pagerank, Q66_SQL),
    "q67_label_centroids": (q67_label_centroids, Q67_SQL),
    "btb_raw_media": (btb_raw_media, None),
    "btb_png_media": (btb_png_media, None),
    "btb_jpeg_media": (btb_jpeg_media, None),
    "btb_gif_bmp_media": (btb_gif_bmp_media, None),
    "btb_tiff_media": (btb_tiff_media, None),
    "btb_video_frames": (btb_video_frames, None),
    "q68_heavy_hitters_cms": (q68_heavy_hitters_cms, None),
    "q69_grouped_moments": (q69_grouped_moments, Q69_SQL),
    "q70_verified_neardups_shuffle": (q70_verified_neardups_shuffle, None),
    "q71_chunk_documents": (q71_chunk_documents, Q71_SQL),
    "q72_grouped_approx_distinct": (q72_grouped_approx_distinct, None),
    "q73_unpivot": (q73_unpivot, Q73_SQL),
    "q74_lag_delta": (q74_lag_delta, Q74_SQL),
    "q75_fuzzy_name_pairs": (q75_fuzzy_name_pairs, Q75_SQL),
    "q76_ntile_rank": (q76_ntile_rank, Q76_SQL),
    "btb_raw_audio": (btb_raw_audio, None),
    "btb_compressed_audio": (btb_compressed_audio, None),
    "btb_mp4_demux": (btb_mp4_demux, None),
    "btb_mp3_demux": (btb_mp3_demux, None),
    "q77_string_agg_per_order": (q77_string_agg_per_order, Q77_SQL),
    "q78_mode_per_nation": (q78_mode_per_nation, Q78_SQL),
    "q79_cube_orders": (q79_cube_orders, Q79_SQL),
    "q80_set_ops": (q80_set_ops, Q80_SQL),
    "q81_profile_orders": (q81_profile_orders, Q81_SQL),
    "q82_percentile_cont": (q82_percentile_cont, Q82_SQL),
    "q83_degree_histogram": (q83_degree_histogram, Q83_SQL),
    "q84_bigram_lm": (q84_bigram_lm, Q84_SQL),
    "q85_pca_embeddings": (q85_pca_embeddings, None),
    "q86_funnel": (q86_funnel, Q86_SQL),
    "q87_full_outer_join": (q87_full_outer_join, Q87_SQL),
    "q88_json_props_stats": (q88_json_props_stats, Q88_SQL),
    "q89_cross_join": (q89_cross_join, Q89_SQL),
    "q90_transition_matrix": (q90_transition_matrix, Q90_SQL),
    "q91_moving_avg": (q91_moving_avg, Q91_SQL),
    "q92_lm_doc_score": (q92_lm_doc_score, Q92_SQL),
    "q93_time_weighted_avg": (q93_time_weighted_avg, Q93_SQL),
    "q94_gapfill_hourly": (q94_gapfill_hourly, Q94_SQL),
    "q95_cohort_retention": (q95_cohort_retention, Q95_SQL),
    "q96_revenue_share": (q96_revenue_share, Q96_SQL),
    "q97_weighted_median": (q97_weighted_median, Q97_SQL),
    "q98_skyline": (q98_skyline, Q98_SQL),
    "q99_mad": (q99_mad, Q99_SQL),
    "q100_trend_slope": (q100_trend_slope, Q100_SQL),
    "q101_iqr_outliers": (q101_iqr_outliers, Q101_SQL),
    "q102_dup_windows": (q102_dup_windows, Q102_SQL),
    "q103_doc_dup_window_stats": (q103_doc_dup_window_stats, Q103_SQL),
    "q104_ngram_jaccard_pairs": (q104_ngram_jaccard_pairs, Q104_SQL),
    "q105_semdedup": (q105_semdedup, None),
    "q106_dedup_rewrite": (q106_dedup_rewrite, Q106_SQL),
    "q107_pii_redact": (q107_pii_redact, Q107_SQL),
    "q108_inverted_index": (q108_inverted_index, Q108_SQL),
    "q109_compression_signal": (q109_compression_signal, None),
    "q110_containment_pairs": (q110_containment_pairs, Q110_SQL),
    "q111_incremental_dedup": (q111_incremental_dedup, Q111_SQL),
    "q112_incremental_lsh": (q112_incremental_lsh, None),
    "q113_range_store": (q113_range_store, Q113_SQL),
    "q114_k_hop_reachability": (q114_k_hop_reachability, Q114_SQL),
    "q115_copurchase_triangles": (q115_copurchase_triangles, Q115_SQL),
    "q116_supplier_jaccard_topk": (q116_supplier_jaccard_topk, Q116_SQL),
    "q117_ontology_entail": (q117_ontology_entail, Q117_SQL),
    "q118_reciprocal_best_match": (q118_reciprocal_best_match, Q118_SQL),
    "q119_entity_resolution": (q119_entity_resolution, Q119_SQL),
    "q120_min_cost_reach": (q120_min_cost_reach, Q120_SQL),
    "q121_negative_sampling": (q121_negative_sampling, Q121_SQL),
    "q122_pathsim_topk": (q122_pathsim_topk, Q122_SQL),
    "q123_walk_corpus": (q123_walk_corpus, Q123_SQL),
    "q124_skipgram_pairs": (q124_skipgram_pairs, Q124_SQL),
    "q125_snapshot_diff": (q125_snapshot_diff, Q125_SQL),
    "q126_node_features": (q126_node_features, Q126_SQL),
    "q127_kcore": (q127_kcore, Q127_SQL),
    "q128_scd2_intervals": (q128_scd2_intervals, Q128_SQL),
    "q129_embedding_quantize": (q129_embedding_quantize, Q129_SQL),
    "q130_trailing_time_window": (q130_trailing_time_window, Q130_SQL),
    "q131_bgp_match": (q131_bgp_match, Q131_SQL),
    "q132_property_path": (q132_property_path, Q132_SQL),
    "q133_bgp_optional": (q133_bgp_optional, Q133_SQL),
    "btb_kg_query": (btb_kg_query, None),
    "q134_rule_materialize": (q134_rule_materialize, Q134_SQL),
    "q135_smart_join": (q135_smart_join, Q135_SQL),
    "q136_datalog_saturation": (q136_datalog_saturation, Q136_SQL),
    "q137_semi_naive_reachability": (q137_semi_naive_reachability,
                                     Q137_SQL),
    "q138_incremental_entailment": (q138_incremental_entailment,
                                    Q138_SQL),
    "q139_bgp_filter_minus": (q139_bgp_filter_minus, Q139_SQL),
    "q140_bgp_aggregate": (q140_bgp_aggregate, Q140_SQL),
    "q141_bgp_path_ops": (q141_bgp_path_ops, Q141_SQL),
    "q142_declarative_triplify": (q142_declarative_triplify, Q142_SQL),
    "q143_domain_range_entailment": (q143_domain_range_entailment,
                                     Q143_SQL),
    "q144_shacl_validation": (q144_shacl_validation, Q144_SQL),
    "q145_sameas_fusion": (q145_sameas_fusion, Q145_SQL),
    "q146_truth_discovery": (q146_truth_discovery, Q146_SQL),
    "q147_entity_dictionary": (q147_entity_dictionary, Q147_SQL),
    "q148_encoded_triples": (q148_encoded_triples, Q148_SQL),
    "q149_ntriples_roundtrip": (q149_ntriples_roundtrip, Q149_SQL),
    "q150_temporal_snapshot": (q150_temporal_snapshot, Q150_SQL),
    "q151_reified_statements": (q151_reified_statements, Q151_SQL),
    "q152_predicate_profile": (q152_predicate_profile, Q152_SQL),
    "q153_construct_template": (q153_construct_template, Q153_SQL),
    "q154_node_property_table": (q154_node_property_table, Q154_SQL),
    "q155_subproperty_entailment": (q155_subproperty_entailment,
                                    Q155_SQL),
    "btb_kg_construct": (btb_kg_construct, None),
    "q156_link_prediction_split": (q156_link_prediction_split,
                                   Q156_SQL),
    "q157_disjointness_check": (q157_disjointness_check, Q157_SQL),
    "q158_named_graph_provenance": (q158_named_graph_provenance,
                                    Q158_SQL),
    "q159_image_header_probe": (q159_image_header_probe, Q159_SQL),
    "q160_turtle_ingest": (q160_turtle_ingest, Q160_SQL),
    "q161_inverseof_entailment": (q161_inverseof_entailment, Q161_SQL),
    "q162_path_quantifiers": (q162_path_quantifiers, Q162_SQL),
    "q163_characteristic_sets": (q163_characteristic_sets, Q163_SQL),
    "q164_transitive_property": (q164_transitive_property, Q164_SQL),
    "q165_bgp_union": (q165_bgp_union, Q165_SQL),
    "q166_bgp_bind": (q166_bgp_bind, Q166_SQL),
    "q167_clustering_coefficients": (q167_clustering_coefficients,
                                     Q167_SQL),
    "q168_shacl_extended": (q168_shacl_extended, Q168_SQL),
    "q169_negated_property_set": (q169_negated_property_set, Q169_SQL),
    "q170_sparql_group_aggregates": (q170_sparql_group_aggregates,
                                     Q170_SQL),
    "q171_sparql_holistic_aggregates": (q171_sparql_holistic_aggregates,
                                        Q171_SQL),
    "q172_filter_not_exists": (q172_filter_not_exists, Q172_SQL),
    "q173_path_quantified_range": (q173_path_quantified_range, Q173_SQL),
    "q174_property_chain_entailment": (q174_property_chain_entailment,
                                       Q174_SQL),
    "q175_symmetric_subproperty": (q175_symmetric_subproperty, Q175_SQL),
    "q176_shacl_value_constraints": (q176_shacl_value_constraints,
                                     Q176_SQL),
    "q177_degree_assortativity": (q177_degree_assortativity, Q177_SQL),
    "q178_describe_skolemized": (q178_describe_skolemized, Q178_SQL),
    "q179_literal_parsing": (q179_literal_parsing, Q179_SQL),
    "q180_graph_diff": (q180_graph_diff, Q180_SQL),
    "q181_stratified_negation": (q181_stratified_negation, Q181_SQL),
    "q182_inverse_functional_sameas": (q182_inverse_functional_sameas,
                                       Q182_SQL),
    "q183_functional_violations": (q183_functional_violations, Q183_SQL),
    "q184_class_summary": (q184_class_summary, Q184_SQL),
    "q185_rdf_list_unroll": (q185_rdf_list_unroll, Q185_SQL),
    "q186_sparql_order_limit": (q186_sparql_order_limit, Q186_SQL),
    "q187_sparql_subquery": (q187_sparql_subquery, Q187_SQL),
    "q188_wl_colors": (q188_wl_colors, Q188_SQL),
    "q189_link_prediction_rank": (q189_link_prediction_rank, Q189_SQL),
    "q190_domain_range_entailment": (q190_domain_range_entailment,
                                     Q190_SQL),
    "q191_allen_interval_join": (q191_allen_interval_join, Q191_SQL),
    "q192_kg_repair_pipeline": (q192_kg_repair_pipeline, Q192_SQL),
    "q193_landmark_hops": (q193_landmark_hops, Q193_SQL),
    "q194_shacl_closed": (q194_shacl_closed, Q194_SQL),
    "q195_subclass_instance_retrieval": (q195_subclass_instance_retrieval,
                                         Q195_SQL),
    "q196_wl_quotient_graph": (q196_wl_quotient_graph, Q196_SQL),
    "q197_shortest_path_trace": (q197_shortest_path_trace, Q197_SQL),
    "q198_landmark_closeness": (q198_landmark_closeness, Q198_SQL),
    "q199_interval_coalesce": (q199_interval_coalesce, Q199_SQL),
    "q200_kg_construct_capstone": (q200_kg_construct_capstone, Q200_SQL),
    "q201_bisimulation_quotient": (q201_bisimulation_quotient, None),
    "q202_incremental_shacl": (q202_incremental_shacl, Q202_SQL),
    "q203_butterfly_count": (q203_butterfly_count, Q203_SQL),
    "q204_keyed_topk": (q204_keyed_topk, Q204_SQL),
    "q205_stratified_hash_sample": (q205_stratified_hash_sample,
                                    Q205_SQL),
    "q206_nquads_provenance_roundtrip": (q206_nquads_provenance_roundtrip,
                                         Q206_SQL),
    "q207_schema_drift": (q207_schema_drift, Q207_SQL),
    "q208_property_graph_export": (q208_property_graph_export, Q208_SQL),
    "q209_optional_transitive": (q209_optional_transitive, Q209_SQL),
    "q210_boruvka_msf": (q210_boruvka_msf, None),
    "q211_temporal_reachability": (q211_temporal_reachability, Q211_SQL),
    "q212_personalized_pagerank": (q212_personalized_pagerank, Q212_SQL),
    "q213_graph_statistics": (q213_graph_statistics, Q213_SQL),
    "q214_link_prediction_scores": (q214_link_prediction_scores, Q214_SQL),
    "q215_hits_scores": (q215_hits_scores, Q215_SQL),
    "q216_shacl_qualified": (q216_shacl_qualified, Q216_SQL),
    "q217_segment_dedup_corpus": (q217_segment_dedup_corpus, Q217_SQL),
    "q218_inverse_property_entailment": (q218_inverse_property_entailment,
                                         Q218_SQL),
    "q219_within_doc_segment_dedup": (q219_within_doc_segment_dedup,
                                      Q219_SQL),
    "q220_has_value_entailment": (q220_has_value_entailment, Q220_SQL),
    "q221_some_values_from_entailment": (q221_some_values_from_entailment,
                                         Q221_SQL),
    "q222_different_from_check": (q222_different_from_check, Q222_SQL),
    "q223_label_propagation": (q223_label_propagation, Q223_SQL),
    "q224_all_values_from_check": (q224_all_values_from_check, Q224_SQL),
    "q225_strongly_connected_components": (q225_strongly_connected_components,
                                           Q225_SQL),
    "q226_k_truss": (q226_k_truss, Q226_SQL),
    "q227_shacl_range_length": (q227_shacl_range_length, Q227_SQL),
    "q228_class_expressions": (q228_class_expressions, Q228_SQL),
    "q229_widest_path": (q229_widest_path, Q229_SQL),
    "q230_double_sweep_diameter": (q230_double_sweep_diameter, Q230_SQL),
    "q231_bipartite_components": (q231_bipartite_components, Q231_SQL),
    "q232_bpe_train": (q232_bpe_train, None),
    "q233_dred_deletion": (q233_dred_deletion, Q233_SQL),
    "q234_bpe_encode": (q234_bpe_encode, None),
    "q235_max_cardinality": (q235_max_cardinality, Q235_SQL),
    "q236_sparql_update": (q236_sparql_update, Q236_SQL),
    "q237_dag_layers": (q237_dag_layers, Q237_SQL),
    "q238_profile_columns": (q238_profile_columns, Q238_SQL),
    "q239_jsonld_round_trip": (q239_jsonld_round_trip, Q239_SQL),
    "q240_edit1_join": (q240_edit1_join, Q240_SQL),
    "q241_grouped_median": (q241_grouped_median, Q241_SQL),
    "q242_rollup": (q242_rollup, Q242_SQL),
    "q243_prefix_filter_jaccard": (q243_prefix_filter_jaccard, Q243_SQL),
    "q244_keyed_ranks": (q244_keyed_ranks, Q244_SQL),
    "q245_status_pivot": (q245_status_pivot, Q245_SQL),
    "q246_incremental_cc": (q246_incremental_cc, Q246_SQL),
    "q247_keyed_lag": (q247_keyed_lag, Q247_SQL),
    "q248_grouped_mode": (q248_grouped_mode, Q248_SQL),
    "q249_shape_induction": (q249_shape_induction, Q249_SQL),
    "q250_schema_lifecycle": (q250_schema_lifecycle, Q250_SQL),
    "q251_zonemap_range_query": (q251_zonemap_range_query, Q251_SQL),
    "q252_cdc_apply": (q252_cdc_apply, Q252_SQL),
    "q253_zorder_box_query": (q253_zorder_box_query, Q253_SQL),
    "q254_dedup_eval": (q254_dedup_eval, None),
    "q255_ohlc_bars": (q255_ohlc_bars, Q255_SQL),
    "q256_haskey_sameas": (q256_haskey_sameas, Q256_SQL),
    "q257_boilerplate_removal": (q257_boilerplate_removal, Q257_SQL),
    "q258_property_axiom_checks": (q258_property_axiom_checks, Q258_SQL),
    "q259_dag_path_counts": (q259_dag_path_counts, Q259_SQL),
    "q260_dsir_importance": (q260_dsir_importance, Q260_SQL),
    "q261_running_distinct": (q261_running_distinct, Q261_SQL),
    "q262_above_customer_avg": (q262_above_customer_avg, Q262_SQL),
    "q263_vocab_growth": (q263_vocab_growth, Q263_SQL),
    "q264_pq_ann_topk": (q264_pq_ann_topk, None),
    "btb_wet_ingest": (btb_wet_ingest, None),
    "q265_url_dedup": (q265_url_dedup, Q265_SQL),
    "q266_pass_at_k": (q266_pass_at_k, Q266_SQL),
    "q267_k_anonymity": (q267_k_anonymity, Q267_SQL),
    "q268_arrow_ipc_roundtrip": (q268_arrow_ipc_roundtrip, Q268_SQL),
    "q269_incremental_join": (q269_incremental_join, Q269_SQL),
    "q270_benford_audit": (q270_benford_audit, Q270_SQL),
    "q271_iqr_outliers": (q271_iqr_outliers, Q271_SQL),
    "q272_gini_profile": (q272_gini_profile, Q272_SQL),
    "q273_cusum_drift": (q273_cusum_drift, Q273_SQL),
    "q274_regex_scalar_parity": (q274_regex_scalar_parity, Q274_SQL),
    "btb_mp1_decode": (btb_mp1_decode, None),
    "q275_locf_gapfill": (q275_locf_gapfill, Q275_SQL),
    "q276_bloom_semijoin": (q276_bloom_semijoin, Q276_SQL),
    "q277_range_frame_sum": (q277_range_frame_sum, Q277_SQL),
    "q278_association_rules": (q278_association_rules, Q278_SQL),
    "q279_luby_mis": (q279_luby_mis, Q279_SQL),
    "q280_twap": (q280_twap, Q280_SQL),
    "q281_kmv_distinct": (q281_kmv_distinct, Q281_SQL),
    "q282_referential_integrity": (q282_referential_integrity, Q282_SQL),
    "q283_snapshot_table_diff": (q283_snapshot_table_diff, Q283_SQL),
    "btb_mp2_decode": (btb_mp2_decode, None),
    "btb_mp3_decode": (btb_mp3_decode, None),
    "q284_theta_sketch_ops": (q284_theta_sketch_ops, Q284_SQL),
    "q285_grouped_ols_slope": (q285_grouped_ols_slope, Q285_SQL),
    "q286_winsorize": (q286_winsorize, Q286_SQL),
    "q287_temporal_reachability": (q287_temporal_reachability, Q287_SQL),
    "q288_rolling_zscore_anomalies": (q288_rolling_zscore_anomalies, Q288_SQL),
    "btb_image_phash_dedup": (btb_image_phash_dedup, None),
    "btb_audio_fingerprint": (btb_audio_fingerprint, None),
    "q289_conversion_attribution": (q289_conversion_attribution, Q289_SQL),
    "q290_interval_coverage": (q290_interval_coverage, Q290_SQL),
    "q291_phrase_index_search": (q291_phrase_index_search, Q291_SQL),
    "q292_storage_layout_advisor": (q292_storage_layout_advisor, Q292_SQL),
    "btb_media_curation": (btb_media_curation, None),
    "q293_hierarchy_rollup": (q293_hierarchy_rollup, Q293_SQL),
    "q294_ranked_retrieval": (q294_ranked_retrieval, Q294_SQL),
    "q295_join_size_estimate": (q295_join_size_estimate, None),
    "q296_event_transitions": (q296_event_transitions, Q296_SQL),
    "q297_monthly_quantile_bands": (q297_monthly_quantile_bands, Q297_SQL),
    "q298_quota_allocation": (q298_quota_allocation, Q298_SQL),
    "q299_hard_negatives": (q299_hard_negatives, Q299_SQL),
    "q300_dag_betweenness": (q300_dag_betweenness, Q300_SQL),
    "q301_bloom_point_lookup": (q301_bloom_point_lookup, Q301_SQL),
    "q302_compact_store": (q302_compact_store, Q302_SQL),
    "q303_schema_evolution_read": (q303_schema_evolution_read, Q303_SQL),
    "q304_compacted_index_search": (q304_compacted_index_search, Q304_SQL),
    "q305_property_graph_roundtrip": (q305_property_graph_roundtrip, Q305_SQL),
    "q306_leakage_safe_split": (q306_leakage_safe_split, Q306_SQL),
    "q307_adaptive_quality_gate": (q307_adaptive_quality_gate, Q307_SQL),
    "q308_grid_distance_join": (q308_grid_distance_join, Q308_SQL),
    "q309_frequent_triples": (q309_frequent_triples, Q309_SQL),
    "q310_dbscan_grid": (q310_dbscan_grid, Q310_SQL),
}


# --- driver CORRECTNESS window ordering (round 4) ---------------------------
# The correctness driver verifies only the FIRST 50 entries of queries()
# (dict order) against their DuckDB oracles.  Rounds 1-2 exposed the original
# first 50; round 3 rotated onto the KG/SPARQL family (43 first-time-green
# rows).  Round 4 keeps the same 7 flagship anchors and fills the remaining
# 43 slots with never-driver-checked oracle entries: the session-6/7/8
# families (statistical audits q270-q274, time-series q275-q277/q280,
# analytics q278-q297, sketches q281/q284, search index q291/q294) plus a
# band of the q40-q63 window/join/sampling family (VERDICT r3, next-round
# item #1).  All other entries keep their relative order after the window.
_DRIVER_WINDOW_R5 = [
    # anchors (regression guard — driver-green in r1-r4)
    "btb_triples",
    "btb_wide",
    "q01_lineitem_agg",
    "q04_mktsegment_revenue",
    "q13_exact_dedup",
    "q22_minhash_neardup",
    "q33_verified_neardups",
    # round-5 rotation: the oldest never-driver-checked oracle band
    # (q43-q108: sampling, rollup/cube, window functions, LM/text,
    # time-series, dedup-family; VERDICT r4 next-round item #1)
    "q43_deterministic_sample",
    "q56_rollup",
    "q59_semi_join_bloom",
    "q64_mixture_resample",
    "q65_pack_sequences",
    "q66_bipartite_pagerank",
    "q67_label_centroids",
    "q69_grouped_moments",
    "q71_chunk_documents",
    "q73_unpivot",
    "q74_lag_delta",
    "q75_fuzzy_name_pairs",
    "q76_ntile_rank",
    "q77_string_agg_per_order",
    "q78_mode_per_nation",
    "q79_cube_orders",
    "q80_set_ops",
    "q81_profile_orders",
    "q82_percentile_cont",
    "q83_degree_histogram",
    "q84_bigram_lm",
    "q86_funnel",
    "q87_full_outer_join",
    "q88_json_props_stats",
    "q89_cross_join",
    "q90_transition_matrix",
    "q91_moving_avg",
    "q92_lm_doc_score",
    "q93_time_weighted_avg",
    "q94_gapfill_hourly",
    "q95_cohort_retention",
    "q96_revenue_share",
    "q97_weighted_median",
    "q98_skyline",
    "q99_mad",
    "q100_trend_slope",
    "q101_iqr_outliers",
    "q102_dup_windows",
    "q103_doc_dup_window_stats",
    "q104_ngram_jaccard_pairs",
    "q106_dedup_rewrite",
    "q107_pii_redact",
    "q108_inverted_index",
]
assert len(_DRIVER_WINDOW_R5) == 50
QUERIES = {
    **{name: QUERIES[name] for name in _DRIVER_WINDOW_R5},
    **{n: v for n, v in QUERIES.items() if n not in set(_DRIVER_WINDOW_R5)},
}

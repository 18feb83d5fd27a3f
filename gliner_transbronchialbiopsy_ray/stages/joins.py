"""Temporal joins Ray Data lacks natively: as-of join and range join.

Both are expressed as the version-portable co-partition pattern (same shape
as queries.q30's hash join): tag each side, align columns, union, hash the
join key into a bounded bucket space, `groupby(bucket).map_groups`, and run
the vectorized pandas/numpy kernel inside the bucket.

Partitioning assumption (documented per the task's custom-operator rule):
a single bucket — i.e. all rows of ~1/n_buckets of the key space from BOTH
sides — fits in one task's memory.  At 100 TB raise `n_buckets` (the
shuffle is one all-to-all regardless of bucket count) and/or pre-filter
the sides; skewed single keys can further be split by time range.

The reference has no temporal joins (its merges are exact-key pandas
merges, e.g. dashboard annotation<->text alignment); these operators are
part of the training-data-pipeline surface this engine adds.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def coalesce_for_join(ds: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    """Workaround for a Ray Data (2.49) native-join quirk: the hash-shuffle
    join fails with ``ArrowInvalid: No match or multiple matches for key
    field reference ...`` when an input dataset contains EMPTY blocks —
    which ``groupby().map_groups`` stages routinely emit for groups that
    produce no rows.  Empty *shuffle partitions* are fine; empty *input
    blocks* are not (verified empirically: a one-row dataset joins fine at
    num_partitions=4, but the same row plus two empty sibling blocks
    raises).  An even row-count repartition rebuilds blocks so no empty
    block survives (callers guard the count()==0 case separately).

    Call this on a join input that went through map_groups/filter; keep it
    OFF raw reads (the extra pass is wasted there).  `ds.count()` is cheap
    when the caller already materialized/counted `ds` (every current call
    site does, for its own empty-input guard)."""
    n = max(1, min(num_partitions, ds.count()))
    return ds.repartition(n)


def _bucket_of(series: pd.Series, n: int) -> pd.Series:
    # crc32 of the decimal key: stable across engines/runs, spreads
    # sequential int keys (a plain modulo would co-locate hot ranges)
    return series.map(lambda k: zlib.crc32(str(k).encode()) % n).astype("int32")


def _pandas_dtypes(schema: pa.Schema) -> dict:
    """Arrow schema -> {col: pandas dtype} for sentinel padding."""
    return dict(pa.schema(zip(schema.names, schema.types))
                .empty_table().to_pandas().dtypes)


def _sentinel_series(dtype, n: int) -> pd.Series:
    """A typed all-placeholder column.  The other side of a tagged union
    must pad missing columns with TYPED values (never None): an
    object-dtype column through the shuffle serializes per element and
    degrades every downstream kernel to object math.  Values are never
    read (the off-side rows are dropped inside the bucket kernel)."""
    if np.issubdtype(dtype, np.datetime64):
        return pd.Series([pd.NaT] * n, dtype=dtype)
    if np.issubdtype(dtype, np.number):
        return pd.Series(np.zeros(n, dtype=dtype))
    return pd.Series([None] * n, dtype=dtype)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """For every left row, attach the single right row with the greatest
    `right_time` <= `left_time` for the same key (backward as-of, exact
    matches allowed) — the classic point-in-time join (trades as-of quotes,
    events as-of the user's latest order).

    Inner semantics: left rows with no qualifying right row are dropped.
    Determinism: callers must ensure (right_key, right_time) is unique on
    the right side (pre-aggregate ties first) — pandas merge_asof picks an
    arbitrary row among exact ties otherwise.
    """
    l_cols = [c for c in left.schema().names]
    pay = list(right_payload)
    l_dtypes = _pandas_dtypes(left.schema())
    r_dtypes = _pandas_dtypes(right.schema())

    def tag_left(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["_key"] = df[left_key]
        df["_t"] = df[left_time]
        df["_bucket"] = _bucket_of(df["_key"], n_buckets)
        df["_side"] = np.int8(0)
        for c in pay:
            df[c] = _sentinel_series(r_dtypes[c], len(df))
        return df[["_bucket", "_side", "_key", "_t"] + l_cols + pay]

    def tag_right(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["_key"] = df[right_key]
        df["_t"] = df[right_time]
        df["_bucket"] = _bucket_of(df["_key"], n_buckets)
        df["_side"] = np.int8(1)
        for c in l_cols:
            df[c] = _sentinel_series(l_dtypes[c], len(df))
        return df[["_bucket", "_side", "_key", "_t"] + l_cols + pay]

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0][["_key", "_t"] + l_cols].sort_values(
            "_t", kind="stable"
        )
        r = g[g["_side"] == 1][["_key", "_t"] + pay].sort_values(
            "_t", kind="stable"
        )
        if not len(l) or not len(r):
            return l.iloc[0:0][l_cols].assign(**{c: None for c in pay})
        j = pd.merge_asof(
            l, r, on="_t", by="_key", direction="backward",
            allow_exact_matches=True, suffixes=("", "_r"),
        )
        j = j.dropna(subset=[pay[0]])  # inner semantics
        return j[l_cols + pay]

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def range_join_count(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    window: pd.Timedelta,
    out_cols: list[str],
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per left row, COUNT of right rows with the same key and
    `left_time` <= right_time < `left_time` + window (e.g. events within 7
    days after each order).  Left rows with zero matches are kept (count 0).

    Kernel: within a bucket, right times are sorted per key once; each
    key's left bounds are answered by two vectorized `np.searchsorted`
    calls — no per-row Python work, loop only over distinct keys in the
    bucket."""
    l_cols = list(left.schema().names)
    l_dtypes = _pandas_dtypes(left.schema())

    def tag_left(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["_key"] = df[left_key]
        df["_t"] = df[left_time]
        df["_bucket"] = _bucket_of(df["_key"], n_buckets)
        df["_side"] = np.int8(0)
        return df[["_bucket", "_side", "_key", "_t"] + l_cols]

    def tag_right(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = pd.DataFrame(
            {
                "_key": df[right_key],
                "_t": df[right_time],
            }
        )
        df["_bucket"] = _bucket_of(df["_key"], n_buckets)
        df["_side"] = np.int8(1)
        for c in l_cols:
            df[c] = _sentinel_series(l_dtypes[c], len(df))
        return df[["_bucket", "_side", "_key", "_t"] + l_cols]

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0]
        r = g[g["_side"] == 1]
        out = l[l_cols].copy().reset_index(drop=True)
        counts = np.zeros(len(out), dtype=np.int64)
        if len(r):
            r_by_key = {
                k: np.sort(sub["_t"].to_numpy())
                for k, sub in r.groupby("_key", sort=False)
            }
            lk = l["_key"].to_numpy()
            lt = l["_t"].to_numpy()
            for k in pd.unique(lk):
                ts = r_by_key.get(k)
                if ts is None:
                    continue
                mask = lk == k
                starts = lt[mask]
                lo = np.searchsorted(ts, starts, side="left")
                hi = np.searchsorted(ts, starts + window, side="left")
                counts[mask] = hi - lo
        out["n_in_window"] = counts
        return out

    return both.groupby("_bucket").map_groups(count_bucket, batch_format="pandas")


def dataset_diff(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    keys: list[str],
    bucket_key: str | None = None,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Symmetric set difference of two datasets on `keys` (the KG/CDC
    snapshot-diff primitive): rows only in `a` come back with
    change='removed', rows only in `b` with change='added'.  Both sides
    ride ONE coarse-bucketed exchange (side marker column, bucket on
    `bucket_key` — defaults to keys[0], which must be an int column that
    co-locates matching rows); the in-bucket kernel is a vectorized
    two-side distinct + outer merge.  Shuffle volume = |a| + |b|; no
    broadcast, no second pass."""
    import numpy as np

    if bucket_key is None:
        bucket_key = keys[0]

    def tag(kind: int):
        def f(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()[keys].copy()
            df["_kind"] = np.int8(kind)
            df["_bucket"] = (df[bucket_key].to_numpy("int64")
                             % n_buckets).astype("int32")
            return df
        return f

    both = (a.map_batches(tag(0), batch_format="pyarrow")
            .union(b.map_batches(tag(1), batch_format="pyarrow")))

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        da = g[g["_kind"] == 0][keys].drop_duplicates()
        db = g[g["_kind"] == 1][keys].drop_duplicates()
        m = da.merge(db, on=keys, how="outer", indicator=True)
        out = m[m["_merge"] != "both"].copy()
        out["change"] = np.where(out["_merge"] == "left_only",
                                 "removed", "added")
        return out.drop(columns=["_merge"]).reset_index(drop=True)

    return both.groupby("_bucket").map_groups(diff, batch_format="pandas")


def smart_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    broadcast_threshold: int = 200_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Cost-based INNER join strategy selection — the planner decision the
    repo otherwise makes by hand (q04 broadcasts, q34 shuffles): count
    the right side (one cheap pass over its narrow projection) and pick

    - BROADCAST (right rows <= threshold): `ray.put` the right table
      once, vectorized pandas merge per left batch — ZERO shuffle, the
      left side streams untouched.
    - SHUFFLE otherwise: native hash join with coalesced inputs.

    Both paths return identical rows (pinned by test).  The count() is
    the planner statistic; for repeated joins against the same side,
    count once and pass the right strategy directly."""
    if right_on is None:
        right_on = on
    if num_partitions is None:
        try:
            import ray as _ray
            num_partitions = max(
                2, int(_ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    right = right.materialize()  # counted, then joined: one execution
    if right.count() <= broadcast_threshold:
        import ray as _ray

        rdf = right.to_pandas()
        ref = _ray.put(rdf)

        def merge(batch: pa.Table) -> pd.DataFrame:
            rt = _ray.get(ref)
            df = batch.to_pandas()
            out = df.merge(rt, left_on=on, right_on=right_on, how="inner")
            if right_on != on and right_on in out.columns:
                out = out.drop(columns=[right_on])
            return out

        return left.map_batches(merge, batch_format="pyarrow")
    return coalesce_for_join(left, num_partitions).join(
        coalesce_for_join(right, num_partitions), join_type="inner",
        num_partitions=num_partitions, on=(on,), right_on=(right_on,),
    )


def snapshot_diff(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    key: str,
    cols: list[str],
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Relational snapshot diff — the data-engineering audit between two
    versions of a table (old load vs new load, warehouse vs lake copy):
    one row per key with change_type in {'added', 'removed', 'changed',
    'unchanged'} and `changed_cols` = comma-joined names (in `cols`
    order) of the columns whose values differ ('' when not 'changed').

    Contract: `key` is unique within each snapshot (enforced: duplicate
    keys in a bucket raise).  Value comparison is IS DISTINCT FROM:
    null-in-both is unchanged, null-vs-value is changed.  Scale shape:
    both sides project to
    key+cols, tag a side bit, union, ONE crc(key) bucket exchange; the
    in-bucket kernel is a single vectorized outer merge — no broadcast,
    no driver state, and each side is scanned once."""

    def tag(side: int):
        def fn(batch: pa.Table) -> pd.DataFrame:
            df = batch.select([key] + cols).to_pandas()
            df["_side"] = np.int8(side)
            df["_bucket"] = (
                df[key].map(lambda v: zlib.crc32(str(v).encode()))
                .astype("int64") % n_buckets).astype("int32")
            return df
        return fn

    both = (a.map_batches(tag(0), batch_format="pyarrow")
            .union(b.map_batches(tag(1), batch_format="pyarrow")))

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ga = g[g["_side"] == 0].drop(columns=["_side", "_bucket"])
        gb = g[g["_side"] == 1].drop(columns=["_side", "_bucket"])
        if ga[key].duplicated().any() or gb[key].duplicated().any():
            raise ValueError(f"snapshot_diff: duplicate {key} in snapshot")
        m = ga.merge(gb, on=key, how="outer", suffixes=("_a", "_b"),
                     indicator=True)
        n = len(m)
        ct = np.full(n, "unchanged", dtype=object)
        ct[(m["_merge"] == "right_only").to_numpy()] = "added"
        ct[(m["_merge"] == "left_only").to_numpy()] = "removed"
        both_mask = (m["_merge"] == "both").to_numpy()
        changed_cols = np.full(n, "", dtype=object)
        any_changed = np.zeros(n, dtype=bool)
        for c in cols:
            # IS DISTINCT FROM semantics (ADVICE r3): a column null in
            # BOTH snapshots is unchanged (plain != reports NaN != NaN
            # as changed); null vs value IS a change — the audit
            # contract a warehouse diff needs.
            va, vb = m[f"{c}_a"].to_numpy(), m[f"{c}_b"].to_numpy()
            d = (both_mask & (va != vb)
                 & ~(pd.isna(va) & pd.isna(vb)))
            any_changed |= d
            changed_cols[d] = np.where(
                changed_cols[d] == "", c, changed_cols[d] + "," + c)
        ct[any_changed] = "changed"
        return pd.DataFrame({key: m[key].to_numpy(),
                             "change_type": ct,
                             "changed_cols": changed_cols})

    return both.groupby("_bucket").map_groups(
        diff_bucket, batch_format="pandas")


def grid_distance_join(
    points: ray.data.Dataset,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Distance self-join via GRID BLOCKING — the spatial analog of LSH
    banding: all pairs (a, b) with a.id < b.id and squared Euclidean
    distance <= radius^2, in EXACT integer arithmetic (int coordinates
    contract, so the SQL oracle replays bit-for-bit).

    Shape: each point lands in its home cell (x//radius, y//radius) and
    is REPLICATED as a ghost into the 8 neighbor cells — any pair within
    `radius` shares the left point's home cell with the right point as
    home-or-ghost, so ONE cell-bucket exchange finds every pair.  The
    (home left, any right, left.id < right.id) rule counts each pair
    exactly once: a same-cell pair has both endpoints home (id order
    picks one orientation); a cross-cell pair is home-left only in the
    smaller-id point's cell iff that orientation matches.  Replication
    factor is a constant 9 — independent of data size, the property that
    makes the pattern work at 100 TB (vs the O(n^2) cross join).
    Per-cell pairing is a vectorized grid of home x all rows.

    Hot-cell caveat: a cell with k points does O(k * k_nbr) work; at
    production scale pair radius to data density (the star_cap analog
    is the caller shrinking `radius`)."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    r2 = radius * radius
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def scatter(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "id": batch.column(id_col).to_numpy().astype("int64"),
            "x": batch.column(x_col).to_numpy().astype("int64"),
            "y": batch.column(y_col).to_numpy().astype("int64")})
        cx = df["x"] // radius
        cy = df["y"] // radius
        parts = []
        for dx, dy in offs:
            p = df.copy()
            p["cell_x"] = cx + dx
            p["cell_y"] = cy + dy
            p["is_home"] = np.int64(1 if (dx, dy) == (0, 0) else 0)
            parts.append(p)
        out = pd.concat(parts, ignore_index=True)
        # one int cell key; bucket it for the coarse exchange
        out["cell"] = out["cell_x"] * 1_000_003 + out["cell_y"]
        out["_bucket"] = (out["cell"] % n_buckets).astype("int32")
        return out[["id", "x", "y", "cell", "is_home", "_bucket"]]

    def pair_cells(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
            "dist_sq": pd.Series(dtype="int64")})
        g = g.sort_values(["cell", "is_home", "id"], kind="stable")
        cells = g["cell"].to_numpy()
        brk = np.flatnonzero(cells[1:] != cells[:-1])
        starts = np.concatenate([[0], brk + 1])
        ends = np.concatenate([brk + 1, [len(g)]])
        ids = g["id"].to_numpy()
        xs = g["x"].to_numpy()
        ys = g["y"].to_numpy()
        home = g["is_home"].to_numpy().astype(bool)
        A, B, D = [], [], []
        for s, e in zip(starts, ends):
            h = np.flatnonzero(home[s:e]) + s
            if len(h) == 0 or e - s < 2:
                continue
            dx = xs[h][:, None] - xs[s:e][None, :]
            dy = ys[h][:, None] - ys[s:e][None, :]
            d2 = dx * dx + dy * dy
            ok = (d2 <= r2) & (ids[h][:, None] < ids[s:e][None, :])
            li, ri = np.nonzero(ok)
            if len(li):
                A.append(ids[h][li])
                B.append(ids[s:e][ri])
                D.append(d2[li, ri])
        if not A:
            return empty
        out = pd.DataFrame({"a": np.concatenate(A),
                            "b": np.concatenate(B),
                            "dist_sq": np.concatenate(D)})
        # a ghost-right pair could ALSO appear with roles flipped when
        # both orientations satisfy home-left + id order?  No: the left
        # is always HOME, and a point is home in exactly one cell, so
        # pair (a, b) with a.id < b.id emits only from a's home cell —
        # but b may be home there too AND ghost-duplicated via several
        # neighbor offsets of the same cell only if cells collide in the
        # 1_000_003 packing; dedup guards the collision case cheaply.
        return out.drop_duplicates(["a", "b"]).astype("int64")

    return (points.map_batches(scatter, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(pair_cells, batch_format="pandas"))

"""SPARQL solution-sequence operators over bindings datasets: GROUP BY
with aggregates (+ HAVING) and FILTER EXISTS / NOT EXISTS.

A *bindings* dataset is what `stages.bgp.match_bgp` returns: one column
per variable, one row per distinct solution.  SPARQL's aggregate layer
(spec 18.5) groups those solutions and folds each group; its EXISTS
filter (spec 17.4.1.4) keeps a solution iff a pattern group has (no)
compatible match.  The reference app has no SPARQL layer — this module
is part of the KG-construction surface this engine adds; the query
semantics are the public W3C SPARQL 1.1 ones.

Scale plan:
- `aggregate_bindings` groups on arbitrary (possibly unbounded) keys, so
  the result stays a Dataset.  When every aggregate is DISTRIBUTIVE
  (count / sum / min / max / avg_ppm) the rows are pre-folded per batch
  (combiner-first: shuffle volume is per-batch distinct groups, not
  rows) before ONE coarse-bucket exchange merges partials.  A holistic
  aggregate (count_distinct / group_concat / sample) needs the group's
  values co-located, so those route the (projected) rows through the
  same single exchange and fold vectorized in-bucket — the standard
  engine plan for DISTINCT aggregates.
- `filter_exists` evaluates the inner pattern ONCE against the store,
  projects it to the shared variables, folds distinct, and semi-joins
  (anti for NOT EXISTS) with the bindings via native hash joins — both
  sides stream; nothing lands on the driver.  The no-shared-variable
  degenerate case collapses to a single count().
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_DISTRIBUTIVE = {"count", "sum", "min", "max", "avg_ppm"}
_HOLISTIC = {"count_distinct", "group_concat", "sample"}
_FUNCS = _DISTRIBUTIVE | _HOLISTIC

_HAVING_OPS = {
    "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
}


def _trunc_div_series(num: pd.Series, den: pd.Series) -> pd.Series:
    """DuckDB's integer `//` truncates toward zero; Python's floors.
    Sign-aware truncating division over object-dtype Python ints keeps
    ppm ratios exact and oracle-matching even for negative numerators
    (the q100 lesson)."""
    n = num.astype(object)
    d = den.astype(object)
    out = [
        (0 if dd in (0, None) else
         (abs(int(nn)) // abs(int(dd)))
         * (1 if (int(nn) >= 0) == (int(dd) >= 0) else -1))
        for nn, dd in zip(n, d)
    ]
    return pd.Series(out, index=num.index, dtype="int64")


def _validate_aggs(aggs: list[tuple]) -> None:
    for a in aggs:
        if len(a) not in (3, 4) or a[1] not in _FUNCS:
            raise ValueError(
                f"bad aggregate spec {a!r}; want (out, func, var[, sep]) "
                f"with func in {sorted(_FUNCS)}")
        if a[1] != "group_concat" and len(a) == 4:
            raise ValueError(f"separator only valid for group_concat: {a!r}")
        if a[2] is None and a[1] != "count":
            raise ValueError(f"var=None only valid for count: {a!r}")


def _bucket_tag(df: pd.DataFrame, group_vars: list[str],
                n_buckets: int) -> pd.DataFrame:
    key = df[group_vars[0]].astype(str)
    for g in group_vars[1:]:
        key = key + "\x1f" + df[g].astype(str)
    df["_bucket"] = key.map(
        lambda k: zlib.crc32(k.encode()) % n_buckets).astype("int32")
    return df


def _apply_having(out: pd.DataFrame, having) -> pd.DataFrame:
    for col, op, lit in having or []:
        out = out[_HAVING_OPS[op](out[col], lit)]
    return out


def aggregate_bindings(
    bindings: ray.data.Dataset,
    group_vars: list[str],
    aggs: list[tuple],
    having: list[tuple] | None = None,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """SPARQL GROUP BY + aggregates over a bindings dataset.

    `aggs`: list of (out_name, func, var) — func one of
        count            — rows in the group (var=None) / non-null var
        count_distinct   — COUNT(DISTINCT ?var)
        sum / min / max  — the obvious folds
        avg_ppm          — trunc(1e6 * sum(var) / count(var)): AVG kept
                           exact in integer parts-per-million (matches
                           DuckDB `(1000000*sum(x)) // count(x)`)
        group_concat     — values sorted lexicographically then joined
                           with `sep` (4th tuple element, default ",");
                           SPARQL leaves GROUP_CONCAT order undefined —
                           sorting makes it deterministic across runs
                           and block orders
        sample           — deterministic SAMPLE(?var): the MIN value
                           (any group member is spec-legal)
    `having`: list of (out_name, op, literal) filters applied to the
    aggregated rows (groups are complete inside their bucket, so HAVING
    runs there — no extra pass)."""
    _validate_aggs(aggs)
    if not group_vars:
        raise ValueError("group_vars must be non-empty (scalar folds "
                         "belong to Dataset.aggregate)")
    from .window import hash_bucketed_map_groups  # noqa: F401 (doc ref)

    holistic = [a for a in aggs if a[1] in _HOLISTIC]
    needed = list(dict.fromkeys(
        [a[2] for a in aggs if a[2] is not None]))
    proj_cols = list(dict.fromkeys(group_vars + needed))

    def final_agg(g: pd.DataFrame) -> pd.DataFrame:
        """Full-row in-bucket fold (holistic path)."""
        gb = g.groupby(group_vars, sort=False)
        cols = {}
        for a in aggs:
            out, func, var = a[0], a[1], a[2]
            if func == "count":
                cols[out] = (gb.size() if var is None
                             else gb[var].count()).astype("int64")
            elif func == "count_distinct":
                cols[out] = gb[var].nunique().astype("int64")
            elif func == "sum":
                cols[out] = gb[var].sum()
            elif func == "min":
                cols[out] = gb[var].min()
            elif func == "max":
                cols[out] = gb[var].max()
            elif func == "avg_ppm":
                s = gb[var].sum().astype(object) * 1_000_000
                c = gb[var].count()
                cols[out] = _trunc_div_series(s, c)
            elif func == "group_concat":
                sep = a[3] if len(a) == 4 else ","
                cols[out] = gb[var].agg(
                    lambda v, _s=sep: _s.join(sorted(v.astype(str))))
            elif func == "sample":
                cols[out] = gb[var].min()
        out = pd.DataFrame(cols).reset_index()
        return _apply_having(out, having)

    if holistic:
        def tag(batch: pa.Table) -> pd.DataFrame:
            df = batch.select(proj_cols).to_pandas()
            return _bucket_tag(df, group_vars, n_buckets)

        def run(g: pd.DataFrame) -> pd.DataFrame:
            return final_agg(g.drop(columns=["_bucket"]))

        return (bindings.map_batches(tag, batch_format="pyarrow")
                .groupby("_bucket").map_groups(run, batch_format="pandas"))

    # all-distributive: combiner-first, partials through the exchange
    def combine(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(proj_cols).to_pandas()
        gb = df.groupby(group_vars, sort=False)
        cols = {}
        for out, func, var, *_ in aggs:
            if func == "count":
                cols[f"_p_{out}_cnt"] = (
                    gb.size() if var is None else gb[var].count()
                ).astype("int64")
            elif func == "sum":
                cols[f"_p_{out}_sum"] = gb[var].sum()
            elif func == "min":
                cols[f"_p_{out}_min"] = gb[var].min()
            elif func == "max":
                cols[f"_p_{out}_max"] = gb[var].max()
            elif func == "avg_ppm":
                cols[f"_p_{out}_sum"] = gb[var].sum()
                cols[f"_p_{out}_cnt"] = gb[var].count().astype("int64")
        part = pd.DataFrame(cols).reset_index()
        return _bucket_tag(part, group_vars, n_buckets)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.drop(columns=["_bucket"]).groupby(group_vars, sort=False)
        cols = {}
        for out, func, var, *_ in aggs:
            if func == "count":
                cols[out] = gb[f"_p_{out}_cnt"].sum().astype("int64")
            elif func == "sum":
                cols[out] = gb[f"_p_{out}_sum"].sum()
            elif func == "min":
                cols[out] = gb[f"_p_{out}_min"].min()
            elif func == "max":
                cols[out] = gb[f"_p_{out}_max"].max()
            elif func == "avg_ppm":
                s = gb[f"_p_{out}_sum"].sum().astype(object) * 1_000_000
                c = gb[f"_p_{out}_cnt"].sum()
                cols[out] = _trunc_div_series(s, c)
        out = pd.DataFrame(cols).reset_index()
        return _apply_having(out, having)

    return (bindings.map_batches(combine, batch_format="pyarrow")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


def filter_exists(
    bindings: ray.data.Dataset,
    store: ray.data.Dataset,
    patterns: list[tuple],
    negate: bool = False,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    cast_nodes: bool = True,
    num_partitions: int | None = None,
    **bgp_kwargs,
) -> ray.data.Dataset:
    """SPARQL FILTER EXISTS { patterns } / FILTER NOT EXISTS (negate).

    Keeps a binding row iff the pattern group, with the row's shared
    variables substituted, has >= 1 (resp. 0) solution in `store`.
    Differs from MINUS exactly where the spec says they differ: with NO
    shared variables MINUS is the identity, while NOT EXISTS drops
    every row when the inner pattern has any match at all (and EXISTS
    keeps rows only then).

    Plan: ONE inner `match_bgp` evaluation, distinct-projected to the
    shared variables, then a native hash semi-join (EXISTS) or a
    left-outer join + null filter (NOT EXISTS) — the marker column
    workaround for Ray's dropped right_on key.  No driver
    materialization on either side."""
    from .bgp import match_bgp
    from .joins import coalesce_for_join

    inner = match_bgp(store, patterns, s_col=s_col, p_col=p_col,
                      o_col=o_col, cast_nodes=cast_nodes,
                      num_partitions=num_partitions, **bgp_kwargs)
    nparts = num_partitions or 8
    bind_vars = [c for c in bindings.schema().names
                 if not c.startswith("_")]
    # inner variable names are static properties of the pattern group
    # (schema() on a lazy empty-result dataset can be None)
    inner_vars = set()
    for pat in patterns:
        for term in (pat[0], pat[2]):
            if isinstance(term, str) and term.startswith("?"):
                inner_vars.add(term[1:])
        if isinstance(pat[1], str) and pat[1].startswith("?"):
            inner_vars.add(pat[1][1:])
    shared = [v for v in bind_vars if v in inner_vars]

    if not shared:
        any_match = inner.count() > 0
        keep = any_match != negate
        if keep:
            return bindings
        return bindings.map_batches(lambda b: b.slice(0, 0),
                                    batch_format="pyarrow")

    # distinct projection of the inner solutions onto the shared vars
    proj = (inner.map_batches(
        lambda b, _sh=tuple(shared): b.select(list(_sh))
        .to_pandas().drop_duplicates(),
        batch_format="pyarrow")
        .groupby(shared).count().drop_columns(["count()"]))

    if not negate:
        # semi-join: proj is distinct on exactly the join key, so the
        # inner join neither duplicates nor adds columns
        out = coalesce_for_join(bindings, nparts).join(
            coalesce_for_join(proj, nparts),
            join_type="inner", num_partitions=nparts, on=tuple(shared))
        return out.map_batches(
            lambda b, _bv=tuple(bind_vars): b.select(list(_bv)),
            batch_format="pyarrow")

    marked = proj.map_batches(
        lambda b: b.append_column("_m", pa.array([1] * b.num_rows,
                                                 pa.int8())),
        batch_format="pyarrow")
    out = coalesce_for_join(bindings, nparts).join(
        coalesce_for_join(marked, nparts),
        join_type="left_outer", num_partitions=nparts, on=tuple(shared))

    def anti(batch: pa.Table, _bv=tuple(bind_vars)) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_null(batch.column("_m"))).select(list(_bv))

    return out.map_batches(anti, batch_format="pyarrow")


def ask(
    bindings_or_store: ray.data.Dataset,
    patterns: list[tuple] | None = None,
    **bgp_kwargs,
) -> bool:
    """SPARQL ASK: does the pattern group have any solution?  With
    `patterns` the first argument is a triple store and ONE `match_bgp`
    runs; without, the argument is an already-computed bindings dataset.
    A boolean needs only a count — `limit(1)` keeps the evaluation from
    materializing more than the first matching block."""
    from .bgp import match_bgp

    ds = (match_bgp(bindings_or_store, patterns, **bgp_kwargs)
          if patterns is not None else bindings_or_store)
    return ds.limit(1).count() > 0


def describe(
    store: ray.data.Dataset,
    nodes: list | None = None,
    patterns: list[tuple] | None = None,
    var: str | None = None,
    blank_prefix: str = "_:",
    max_depth: int = 4,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    num_partitions: int = 8,
    **bgp_kwargs,
) -> ray.data.Dataset:
    """SPARQL DESCRIBE via Concise Bounded Description (CBD, the
    public-spec convention): all triples whose subject is a target
    node, recursing through BLANK-node objects (ids carrying
    `blank_prefix`) up to `max_depth` — blank nodes have no identity
    outside their graph, so their descriptions ride along.

    Targets come either as a constant `nodes` list or as the `var`
    column of `match_bgp(store, patterns)`.  Each hop is one distinct
    fold of the frontier + one native hash semi-join against the store
    (both sides stream; the frontier is never collected to the driver).
    Already-visited blank nodes are removed from the next frontier by
    an anti marker join, so cyclic blank structures terminate before
    the depth cap."""
    from .bgp import match_bgp
    from .joins import coalesce_for_join

    if (nodes is None) == (patterns is None):
        raise ValueError("pass exactly one of nodes= / patterns=")
    if patterns is not None:
        if var is None:
            raise ValueError("patterns= needs var= (the node variable)")
        b = match_bgp(store, patterns, s_col=s_col, p_col=p_col,
                      o_col=o_col, **bgp_kwargs)
        frontier = b.map_batches(
            lambda t, _v=var: t.select([_v]).rename_columns(["_n"])
            .to_pandas().drop_duplicates(),
            batch_format="pyarrow")
    else:
        frontier = ray.data.from_arrow(pa.table({
            "_n": pa.array([str(n) for n in nodes], pa.string())}))

    def dd(ds):
        local = ds.map_batches(
            lambda t: t.to_pandas().drop_duplicates(),
            batch_format="pyarrow")
        return local.groupby("_n").count().drop_columns(["count()"])

    store = store.materialize()
    frontier = dd(frontier).materialize()
    seen = frontier
    out = None
    for _ in range(max_depth):
        if frontier.count() == 0:
            break
        hop = coalesce_for_join(store, num_partitions).join(
            coalesce_for_join(frontier, num_partitions),
            join_type="inner", num_partitions=num_partitions,
            on=(s_col,), right_on=("_n",))
        hop = hop.map_batches(
            lambda t: t.select([s_col, p_col, o_col]),
            batch_format="pyarrow").materialize()
        out = hop if out is None else out.union(hop)
        # next frontier: NEW blank-node objects only
        blanks = hop.map_batches(
            lambda t, _bp=blank_prefix: pa.table({"_n": t.filter(
                pc.starts_with(t.column(o_col).cast(pa.string()), _bp)
            ).column(o_col).cast(pa.string())}),
            batch_format="pyarrow")
        blanks = dd(blanks).materialize()
        if blanks.count() == 0:
            break
        marked = seen.map_batches(
            lambda t: t.append_column(
                "_m", pa.array([1] * t.num_rows, pa.int8())),
            batch_format="pyarrow")
        nxt = coalesce_for_join(blanks, num_partitions).join(
            coalesce_for_join(marked, num_partitions),
            join_type="left_outer", num_partitions=num_partitions,
            on=("_n",))
        frontier = dd(nxt.map_batches(
            lambda t: t.filter(pc.is_null(t.column("_m")))
            .select(["_n"]),
            batch_format="pyarrow")).materialize()
        if frontier.count() == 0:
            break
        seen = dd(seen.union(frontier)).materialize()
    if out is None:
        dt = dict(zip(store.schema().names, store.schema().types))
        return ray.data.from_arrow(pa.table({
            s_col: pa.array([], dt[s_col]),
            p_col: pa.array([], dt[p_col]),
            o_col: pa.array([], dt[o_col])}))

    def localdd(t: pa.Table) -> pd.DataFrame:
        return t.to_pandas().drop_duplicates()

    return (out.map_batches(localdd, batch_format="pyarrow")
            .groupby([s_col, p_col, o_col]).count()
            .drop_columns(["count()"]))


def order_limit_bindings(
    bindings: ray.data.Dataset,
    order_by: list[tuple],
    limit: int,
    offset: int = 0,
) -> pd.DataFrame:
    """SPARQL ORDER BY + LIMIT/OFFSET solution modifier (spec 18.5.4,
    15.1) as a distributed TOP-K: `order_by` is [(var, 'asc'|'desc'),
    ...], and the result is rows [offset, offset+limit) of the ordered
    solution sequence, returned as a DataFrame (the slice is
    driver-sized BY CONSTRUCTION — k = limit + offset is the caller's
    page, never the corpus).

    Plan: every block folds to its LOCAL top-k (vectorized sort+head —
    a block can contribute at most k survivors), then one final fold
    orders the O(blocks * k) survivors and slices.  No global sort, no
    all-to-all: this is the engine answer to 'ORDER BY ... LIMIT'
    that a naive `Dataset.sort().limit()` would pay a full range
    shuffle for.

    Determinism: make the order TOTAL — include a unique tiebreaker
    variable, or equal rows make the page membership arbitrary (the
    SPARQL spec leaves it implementation-defined; this engine asks the
    caller to be explicit).  Nulls sort LAST regardless of direction
    (pandas na_position semantics; keep ORDER BY vars bound)."""
    if limit < 0 or offset < 0:
        raise ValueError("limit/offset must be >= 0")
    if not order_by:
        raise ValueError("order_by must name at least one variable")
    cols = [c for c, _ in order_by]
    asc = []
    for c, d in order_by:
        if d not in ("asc", "desc"):
            raise ValueError(f"direction for {c!r} must be asc|desc")
        asc.append(d == "asc")
    k = limit + offset

    def local_topk(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return df.sort_values(cols, ascending=asc, kind="stable",
                              na_position="last").head(k)

    if k == 0:
        cand = bindings.limit(0).to_pandas()
        return cand
    cand = (bindings.map_batches(local_topk, batch_format="pyarrow")
            .to_pandas())
    out = cand.sort_values(cols, ascending=asc, kind="stable",
                           na_position="last")
    return out.iloc[offset:offset + limit].reset_index(drop=True)


def join_bindings(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    num_partitions: int | None = None,
    cross_threshold: int = 100_000,
) -> ray.data.Dataset:
    """SPARQL Join of two solution sequences (spec 18.5 Join) — the
    algebra step that makes SUBQUERIES composable: join `left` (e.g.
    match_bgp bindings) with `right` (e.g. an aggregate_bindings
    result) on their SHARED variables.  Distinct inputs stay distinct.

    Shared variables -> one native hash join (both sides stream;
    empty-block guards applied — bindings datasets routinely carry
    map_groups-produced empty blocks).  NO shared variables -> the
    SPARQL cross product: the smaller side must fit under
    `cross_threshold` rows (enforced), is ray.put ONCE, and each batch
    of the larger side takes a vectorized pandas cross merge —
    broadcast, never a shuffle.

    Join variables must be BOUND on both sides: a null never matches
    (SQL semantics).  SPARQL's unbound-is-compatible rule belongs to
    OPTIONAL, which match_bgp handles natively — route nullable
    variables there instead."""
    import ray as _ray

    from .joins import coalesce_for_join

    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(_ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    lcols = set(left.schema().names)
    rcols = set(right.schema().names)
    shared = sorted(lcols & rcols)

    if not shared:
        ln, rn = left.count(), right.count()
        small, big = (left, right) if ln <= rn else (right, left)
        n_small = min(ln, rn)
        if n_small > cross_threshold:
            raise ValueError(
                f"cross product: smaller side has {n_small} rows > "
                f"cross_threshold={cross_threshold}")
        ref = _ray.put(small.to_pandas())

        def cross(b: pa.Table, _ref=ref) -> pd.DataFrame:
            sm = _ray.get(_ref)
            return b.to_pandas().merge(sm, how="cross")

        return big.map_batches(cross, batch_format="pyarrow")

    l = coalesce_for_join(left.materialize(), num_partitions)
    r = coalesce_for_join(right.materialize(), num_partitions)
    return l.join(r, join_type="inner", num_partitions=num_partitions,
                  on=tuple(shared), right_on=tuple(shared))

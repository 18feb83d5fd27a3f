"""SPARQL-style basic-graph-pattern (BGP) matching over a distributed
triple dataset — the KG query-side primitive: a list of (s, p, o)
patterns with shared variables compiles into a chain of native Ray hash
joins.

Plan shape: each pattern becomes a filtered projection of the triple set
(constants pushed into a vectorized Arrow filter, variables become the
projection's column names); patterns then fold left-to-right, each step
ONE native hash join on the variables shared with the bindings
accumulated so far.  All-to-all cost is therefore |patterns| - 1 joins
over pattern-filtered subsets — the selective patterns should come first
(the caller controls order; a cost-based reorder is the production
upgrade).  Patterns that share no variable with the accumulated bindings
would be a cross join and are rejected.

Variables are `?name` strings; subject/object constants are int64 node
ids, predicate constants are strings.  A variable in PREDICATE position
binds the predicate string (rdfs2/rdfs3-style rules join on it); it
cannot carry path operators.  Output: one column per distinct variable,
deduplicated (set semantics, like SPARQL SELECT DISTINCT).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _bounded_closure(edges: ray.data.Dataset, max_hops: int,
                     num_partitions: int,
                     min_hops: int = 1) -> ray.data.Dataset:
    """Distinct (src, dst) pairs connected by min_hops..max_hops directed
    edges — the property-path `p+` expansion (min_hops=1) and the
    quantified-range `p{n,m}` expansion, bounded (an unbounded all-pairs
    closure is quadratic in the worst case; the hop cap is part of the
    operator's contract).  Semi-naive-ish: per hop one native join of
    the previous hop's pairs with the edge set + a distinct fold;
    cycles are harmless (the cap terminates, the distinct collapses).
    NOTE a pair reachable at hop k is NOT re-derived at hop k+1 unless a
    longer path exists — semantics are "some path with length in
    [min_hops, max_hops]", which SPARQL's path translation also uses."""
    from .joins import coalesce_for_join

    def dd(ds):
        local = ds.map_batches(
            lambda b: b.to_pandas().drop_duplicates(),
            batch_format="pyarrow")
        return (local.groupby(["_ta", "_tb"]).count()
                .drop_columns(["count()"]))

    e = dd(edges).materialize()
    if e.count() == 0 or max_hops < min_hops or max_hops < 1:
        return e.filter(lambda r: False) if e.count() else e
        # empty edge set: joining empty blocks trips the
        # ArrowInvalid FieldRef quirk — nothing to close anyway
    acc = e if min_hops <= 1 else None
    frontier = e
    for hop in range(2, max_hops + 1):
        step = coalesce_for_join(frontier, num_partitions).join(
            coalesce_for_join(
                e.rename_columns({"_ta": "_sa", "_tb": "_sb"}),
                num_partitions),
            join_type="inner", num_partitions=num_partitions,
            on=("_tb",), right_on=("_sa",),
        )
        frontier = dd(step.map_batches(
            lambda b: pa.table({"_ta": b.column("_ta"),
                                "_tb": b.column("_sb")}),
            batch_format="pyarrow")).materialize()
        if frontier.count() == 0:
            break
        if hop >= min_hops:
            acc = frontier if acc is None else acc.union(frontier)
    if acc is None:  # no hop count ever reached min_hops
        return e.filter(lambda r: False)
    return dd(acc).materialize()


def _distinct_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (_ta, _tb) pairs: local pandas dedup (normalizes any
    arrow/pandas block mix from a union) + one grouped fold."""
    local = ds.map_batches(
        lambda b: b.to_pandas().drop_duplicates(),
        batch_format="pyarrow")
    return (local.groupby(["_ta", "_tb"]).count()
            .drop_columns(["count()"]))


def _zero_length_pairs(src: ray.data.Dataset, s, o, g,
                       s_col: str, o_col: str, g_col: str | None,
                       cast_nodes: bool) -> ray.data.Dataset | None:
    """The zero-length component of `p*` / `p?` paths (SPARQL 1.1
    ZeroLengthPath): a constant endpoint matches ITSELF; two variables
    match every graph TERM (any subject or object in the scoped store)
    paired with itself; two constants match iff they are equal.
    Returns None when the zero-length set is empty."""
    if not _is_var(s) and not _is_var(o):
        if s == o:
            return ray.data.from_items([{"_ta": s, "_tb": s}])
        return None
    if _is_var(s) and _is_var(o):
        def nodes(batch: pa.Table) -> pd.DataFrame:
            t = batch
            if g is not None:
                t = t.filter(pc.equal(t.column(g_col), g))
            a, b = t.column(s_col), t.column(o_col)
            if cast_nodes:
                a, b = a.cast(pa.int64()), b.cast(pa.int64())
            n = pd.concat([a.to_pandas(), b.to_pandas()],
                          ignore_index=True).drop_duplicates()
            return pd.DataFrame({"_ta": n, "_tb": n})

        return src.map_batches(nodes, batch_format="pyarrow")
    c = s if not _is_var(s) else o
    return ray.data.from_items([{"_ta": c, "_tb": c}])


_FILTER_OPS = {
    "==": pc.equal, "!=": pc.not_equal, "<": pc.less,
    "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
}


def _apply_binding_filters(ds: ray.data.Dataset, filters: list[tuple],
                           acc_vars: list[str]) -> ray.data.Dataset:
    """SPARQL FILTER over bindings: each (var, op, literal) becomes a
    vectorized Arrow predicate; conjunction, applied in one map pass."""
    for var, op, _ in filters:
        if var not in acc_vars:
            raise ValueError(f"FILTER references unbound variable {var!r}")
        if op not in _FILTER_OPS:
            raise ValueError(f"unknown FILTER op {op!r}")

    def f(batch: pa.Table) -> pa.Table:
        mask = None
        for var, op, val in filters:
            cond = _FILTER_OPS[op](batch.column(var), val)
            mask = cond if mask is None else pc.and_(mask, cond)
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def _apply_values(ds: ray.data.Dataset, values: pd.DataFrame,
                  acc_vars: list[str]) -> ray.data.Dataset:
    """SPARQL VALUES as a broadcast semi-join: keep bindings whose
    tuple over the VALUES columns appears in the (deduplicated) inline
    table."""
    cols = list(values.columns)
    missing = [c for c in cols if c not in acc_vars]
    if missing:
        raise ValueError(
            f"VALUES columns {missing} are not bound variables")
    vref = ray.put(values.drop_duplicates().reset_index(drop=True))

    def semi(batch: pa.Table, _ref=vref,
             _cols=tuple(cols)) -> pd.DataFrame:
        vt = ray.get(_ref)
        return batch.to_pandas().merge(vt, on=list(_cols), how="inner")

    return ds.map_batches(semi, batch_format="pyarrow")


def _predicate_histogram(triples: ray.data.Dataset,
                         p_col: str) -> tuple[dict, int]:
    """One cheap stats pass: triple count per constant predicate
    (per-batch value_counts partials, driver merge over the bounded
    predicate vocabulary) — the selectivity estimate reorder uses."""
    parts = triples.map_batches(
        lambda b: b.to_pandas()[p_col].value_counts()
        .rename_axis("p").rename("n").reset_index(),
        batch_format="pyarrow").to_pandas()
    if "p" not in parts.columns:
        return {}, 0
    agg = parts.groupby("p")["n"].sum()
    return dict(agg), int(agg.sum())


def _reorder_by_stats(patterns: list[tuple], hist: dict,
                      total: int, big_first: bool = False) -> list[tuple]:
    """Greedy selectivity order: estimated leg size = predicate count
    (whole store for variable predicates), divided by a constant factor
    per bound subject/object/graph term; start with the smallest, then
    repeatedly take the smallest leg sharing a variable with what's
    bound so far (connectivity preserved — a reorder that would create
    a cross join falls back to leaving that pattern for later)."""
    def est(pattern):
        s, p, o = pattern[:3]
        base = total
        if isinstance(p, str) and not _is_var(p):
            pb = p[1:] if p.startswith("^") else p
            neg = pb.startswith("!")
            if neg:
                pb = pb[1:]
            pb = pb[:-1] if pb[-1:] in ("+", "*", "?") else pb
            alts = pb.split("|")
            base = sum(hist.get(a, 0) for a in alts)
            if neg:
                base = max(total - base, 0)
        bound = sum(1 for t in (pattern[:1] + pattern[2:])
                    if not _is_var(t))
        return base / (50.0 ** bound)

    remaining = sorted(range(len(patterns)),
                       key=lambda i: (est(patterns[i]), i))
    order: list[int] = []
    seen: set = set()
    if big_first and remaining:  # broadcast: the first leg streams
        pick = max(remaining, key=lambda i: (est(patterns[i]), -i))
        order.append(pick)
        remaining.remove(pick)
        seen |= _pattern_vars(patterns[pick])
    while remaining:  # greedy smallest-connected-first
        pick = None
        for i in remaining:
            v = _pattern_vars(patterns[i])
            if not order or not v or (v & seen):
                pick = i
                break
        if pick is None:  # nothing connects: keep estimate order
            pick = remaining[0]
        order.append(pick)
        remaining.remove(pick)
        seen |= _pattern_vars(patterns[pick])
    return [patterns[i] for i in order]


def _expand_sequences(patterns: list[tuple]) -> list[tuple]:
    """Rewrite sequence paths: (s, "p1/p2", o) becomes two chained
    patterns through a fresh internal variable (?__seqN).  Internal
    variables are projected OUT of the final bindings (SPARQL path
    intermediates are invisible); each element may itself carry ^ / + /
    alternatives."""
    out, fresh = [], 0
    for pattern in patterns:
        s, p, o = pattern[:3]
        rest = tuple(pattern[3:])  # graph term rides along per element
        if isinstance(p, str) and not _is_var(p) and "/" in p:
            cur = s
            parts = p.split("/")
            for part in parts[:-1]:
                mid = f"?__seq{fresh}"
                fresh += 1
                out.append((cur, part, mid) + rest)
                cur = mid
            out.append((cur, parts[-1], o) + rest)
        else:
            out.append(pattern)
    return out


def match_bgp(
    triples: ray.data.Dataset,
    patterns: list[tuple],
    optional: list[tuple] | None = None,
    filters: list[tuple] | None = None,
    minus: list[tuple] | None = None,
    values: pd.DataFrame | None = None,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    g_col: str | None = None,
    max_hops: int = 8,
    cast_nodes: bool = True,
    num_partitions: int | None = None,
    join_strategy: str = "hash",
    broadcast_threshold: int = 2_000_000,
    materialize_input: bool = True,
    pattern_sources: dict | None = None,
    final_distinct: bool = True,
    reorder: str = "off",
) -> ray.data.Dataset:
    """Match `patterns` (list of (s, p, o) with `?var` strings for
    variables) against the triple dataset; returns the distinct variable
    bindings.  The triple set is materialized once (every pattern scans
    it).

    Property paths: a predicate ending in `+` (e.g. "knows+") matches
    pairs connected by 1..max_hops edges of the base predicate (bounded
    transitive closure — the cap is part of the semantics).  `^pred`
    matches the INVERSE direction (subject/object roles swapped;
    composes with `+` as `^pred+`).  `p1|p2` matches EITHER predicate
    (one is_in filter — not valid inside a transitive path).  `p1/p2`
    is a SEQUENCE: expanded into chained patterns through fresh internal
    variables that are projected out of the result (each element may
    itself carry ^ / + / |; sequences are required-pattern-only and
    incompatible with pattern_sources).

    `optional` patterns (SPARQL OPTIONAL) left-outer-join after the
    required ones: bindings survive without a match, the optional
    pattern's new variables come back null.  Results stay distinct
    because both join inputs are distinct and optional vars extend the
    row identity.

    `cast_nodes=True` normalizes s/o to int64 (numeric-id KGs);
    `cast_nodes=False` keeps the native node type — string-node KGs
    (e.g. the BTB triple store) join on strings directly.

    `join_strategy="hash"` (default): every fold step is a native
    distributed hash join — both sides can be arbitrarily large.
    `join_strategy="broadcast"`: each NON-FIRST leg is collected to the
    driver once, `ray.put`, and merged into the accumulated bindings with
    a vectorized pandas merge per batch — ZERO shuffles and ZERO
    intermediate materializations until the single final distinct fold.
    The contract is that every non-first leg fits in memory
    (`broadcast_threshold` rows, enforced); the FIRST (largest) leg still
    streams.  This is the right plan for iterative callers (`saturate`)
    where per-round fixed shuffle/actor-startup cost dominates, and for
    selective patterns over huge stores (put the big pattern first).

    `pattern_sources` maps a REQUIRED-pattern index to an alternative
    triple dataset (same s/p/o columns) that pattern matches against
    instead of `triples` — the hook semi-naive evaluation uses to
    restrict one body atom to the last round's delta.  Alternative
    sources are used as-is (the caller materializes them).

    `final_distinct=False` (broadcast path only) skips the output's
    global DISTINCT fold — for callers that fold the result themselves
    anyway (saturate's per-round store fold); bindings may then repeat
    across blocks.

    `filters` — SPARQL FILTER: (var, op, literal) conjunction over the
    required patterns' bindings (op in ==, !=, <, <=, >, >=), applied
    as one vectorized Arrow pass BEFORE optional/minus.
    `minus` — SPARQL MINUS: each entry is a single pattern; bindings
    sharing its variable values are removed (anti semi-join on the
    shared variables; a pattern sharing no variable is rejected).
    `values` — SPARQL VALUES: a small DataFrame whose columns name
    ALREADY-BOUND variables; bindings survive iff their tuple appears
    (broadcast semi-join — VALUES blocks are inline constants, small by
    definition).  Applied with `filters`, before minus/optional.

    NAMED GRAPHS (quads): with `g_col` set, any pattern may carry a
    4th term — a constant graph name (scopes the pattern, GRAPH <g>),
    a `?var` (binds the graph — provenance queries), or be omitted
    (matches any graph; the graph does NOT join the binding identity,
    so cross-graph duplicates collapse).  Transitive paths accept only
    constant graph terms (hops may not cross graphs).

    `reorder="stats"` — cost-based pattern ordering: ONE cheap
    predicate-histogram pass over the store estimates each required
    leg's size (constant terms tighten the estimate), then patterns
    greedily order smallest-connected-first (hash fold) or
    largest-first-then-smallest-connected (broadcast fold: the first
    leg is the one that streams).  Results are order-invariant
    (pinned by test); `pattern_sources` disables it (semi-naive's
    delta rotation owns the order there)."""
    from .joins import coalesce_for_join

    if not patterns:
        raise ValueError("empty pattern list")
    if join_strategy not in ("hash", "broadcast"):
        raise ValueError(f"unknown join_strategy {join_strategy!r}")
    for pat in (optional or []) + (minus or []):
        p = pat[1]
        if isinstance(p, str) and not _is_var(p) and "/" in p:
            raise ValueError(
                f"sequence path {p!r} only supported in required "
                "patterns")
    if pattern_sources and any(
            isinstance(p[1], str) and not _is_var(p[1]) and "/" in p[1]
            for p in patterns):
        raise ValueError(
            "sequence paths cannot be combined with pattern_sources "
            "(expansion renumbers pattern indices)")
    patterns = _expand_sequences(patterns)
    if reorder not in ("off", "stats"):
        raise ValueError(f"unknown reorder {reorder!r}")
    if reorder == "stats" and pattern_sources:
        raise ValueError(
            "reorder cannot be combined with pattern_sources "
            "(reordering renumbers pattern indices)")
    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    store_cols = [s_col, p_col, o_col] + ([g_col] if g_col else [])
    triples = triples.select_columns(store_cols)
    if materialize_input:
        # every pattern scans the store; iterative callers that already
        # hold a materialized store (saturate) opt out to save the copy
        triples = triples.materialize()

    if reorder == "stats" and len(patterns) > 1:
        hist, total = _predicate_histogram(triples, p_col)
        patterns = _reorder_by_stats(
            patterns, hist, total,
            big_first=(join_strategy == "broadcast"))

    def leg(pattern: tuple,
            alt: ray.data.Dataset | None = None,
            ) -> tuple[ray.data.Dataset, list[str]]:
        src = (triples if alt is None
               else alt.select_columns(store_cols))
        s, p, o = pattern[:3]
        g = pattern[3] if len(pattern) > 3 else None
        if g is not None and g_col is None:
            raise ValueError(
                f"pattern {pattern} has a graph term but g_col is not "
                "set")
        out_vars: list[str] = []
        for term in (s, o, p, g):
            if _is_var(term):
                v = term[1:]
                if v in out_vars:
                    raise ValueError(
                        f"pattern {pattern}: repeated variable in one "
                        "pattern is unsupported")
                out_vars.append(v)

        inverse = (isinstance(p, str) and not _is_var(p)
                   and p.startswith("^"))
        pbase = p[1:] if inverse else p
        negated = (isinstance(pbase, str) and not _is_var(pbase)
                   and pbase.startswith("!"))
        if negated:
            # SPARQL negated property set !p1|p2 (^!... composes: the
            # inverse strips first, so ^!p is "inverse of any predicate
            # except p"); quantifiers don't combine with negation
            pbase = pbase[1:]
            if (not pbase or pbase[-1:] in ("+", "*", "?")
                    or re.search(r"\{(\d+),(\d+)\}$", pbase)):
                raise ValueError(
                    f"pattern {pattern}: negated property sets take a "
                    "plain predicate list (no quantifiers)")
        quant = None  # path quantifier: + (one-or-more), * (zero-or-
        # more), ? (zero-or-one), {n,m} (quantified range)
        qlo = qhi = None
        if (not negated and isinstance(pbase, str) and not _is_var(pbase)
                and pbase[-1:] in ("+", "*", "?")):
            quant = pbase[-1]
        rng = (re.search(r"\{(\d+),(\d+)\}$", pbase)
               if (quant is None and not negated and isinstance(pbase, str)
                   and not _is_var(pbase)) else None)
        if rng:
            quant = "range"
            qlo, qhi = int(rng.group(1)), int(rng.group(2))
            if qhi < qlo:
                raise ValueError(
                    f"pattern {pattern}: bad path range {{{qlo},{qhi}}}")
        alts = None
        if (isinstance(pbase, str) and not _is_var(pbase)
                and quant is None and ("|" in pbase or negated)):
            alts = pbase.split("|")
        if quant is not None:
            base = pbase[:-1] if quant != "range" else pbase[:rng.start()]
            if "|" in base:
                raise ValueError(
                    f"pattern {pattern}: alternatives inside a "
                    "path quantifier are unsupported")
            if _is_var(g):
                raise ValueError(
                    f"pattern {pattern}: a graph VARIABLE on a "
                    "quantified path is unsupported (hops and the "
                    "zero-length path have no single provenance); use "
                    "a constant graph term")

            def edge_proj(batch: pa.Table) -> pa.Table:
                cond = pc.equal(batch.column(p_col), base)
                if g is not None:  # constant graph scopes the edges
                    cond = pc.and_(cond,
                                   pc.equal(batch.column(g_col), g))
                t = batch.filter(cond)
                ta, tb = t.column(s_col), t.column(o_col)
                if inverse:
                    ta, tb = tb, ta
                if cast_nodes:
                    ta, tb = ta.cast(pa.int64()), tb.cast(pa.int64())
                return pa.table({"_ta": ta, "_tb": tb})

            edges = src.map_batches(edge_proj, batch_format="pyarrow")
            if quant == "+":
                source = _bounded_closure(edges, max_hops,
                                          num_partitions)
            elif quant == "range":
                # p{n,m}: paths of length n..m; n=0 adds the
                # zero-length pairs (m is the hop cap — max_hops
                # does not apply)
                if qhi == 0:
                    pairs = None
                else:
                    pairs = _bounded_closure(edges, qhi, num_partitions,
                                             min_hops=max(qlo, 1))
                if qlo == 0:
                    zero = _zero_length_pairs(src, s, o, g, s_col,
                                              o_col, g_col, cast_nodes)
                    if zero is not None:
                        pairs = (zero if pairs is None
                                 else pairs.union(zero))
                if pairs is None:
                    nt = pa.int64() if cast_nodes else pa.string()
                    pairs = ray.data.from_arrow(pa.table({
                        "_ta": pa.array([], nt),
                        "_tb": pa.array([], nt)}))
                source = _distinct_pairs(pairs).materialize()
            else:
                # * / ?: the reachable pairs (bounded closure for *,
                # the direct edges for ?) UNION the zero-length path
                pairs = (edges if quant == "?" else _bounded_closure(
                    edges, max_hops, num_partitions))
                zero = _zero_length_pairs(src, s, o, g, s_col, o_col,
                                          g_col, cast_nodes)
                if zero is not None:
                    pairs = pairs.union(zero)
                source = _distinct_pairs(pairs).materialize()
            sc, oc, pred_col, gc = "_ta", "_tb", None, None
        else:
            source, sc, oc, pred_col = src, s_col, o_col, p_col
            gc = g_col if g is not None else None
            if inverse:
                sc, oc = oc, sc

        def project(batch: pa.Table, _s=s, _p=pbase, _o=o,
                    _g=g) -> pa.Table:
            mask = None
            checks = [(_s, sc), (_o, oc)]
            if pred_col is not None and alts is not None:
                mask = pc.is_in(batch.column(pred_col),
                                value_set=pa.array(alts))
                if negated:
                    mask = pc.invert(mask)
            elif pred_col is not None:
                checks.append((_p, pred_col))
            if gc is not None:
                checks.append((_g, gc))
            for term, col in checks:
                if not _is_var(term):
                    cond = pc.equal(batch.column(col), term)
                    mask = cond if mask is None else pc.and_(mask, cond)
            t = batch if mask is None else batch.filter(mask)

            def node(col):
                c = t.column(col)
                return c.cast(pa.int64()) if cast_nodes else c

            cols, names = [], []
            for term, col in ((_s, sc), (_o, oc)):
                if _is_var(term):
                    cols.append(node(col))
                    names.append(term[1:])
            if _is_var(_p):
                # predicate variable binds as-is (predicates are strings
                # regardless of cast_nodes) — enables rdfs2/rdfs3-style
                # rules that join on the predicate itself
                cols.append(t.column(pred_col))
                names.append(_p[1:])
            if _is_var(_g) and gc is not None:
                cols.append(t.column(gc))  # graph variable: provenance
                names.append(_g[1:])
            if not cols:  # all-constant pattern: keep an existence marker
                cols = [node(sc)]
                names = ["_exists"]
            return pa.table(dict(zip(names, cols)))

        ds = source.map_batches(project, batch_format="pyarrow")
        return ds, (out_vars or ["_exists"])

    def dedupe(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
        local = ds.map_batches(
            lambda b: b.to_pandas().drop_duplicates(),
            batch_format="pyarrow")
        return (local.groupby(cols).count().drop_columns(["count()"]))

    sources = pattern_sources or {}

    if join_strategy == "broadcast":
        return _fold_broadcast(leg, dedupe, patterns, optional,
                               broadcast_threshold, sources,
                               final_distinct, filters, minus, values)

    def local_dd(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(
            lambda b: b.to_pandas().drop_duplicates(),
            batch_format="pyarrow")

    acc, acc_vars = leg(patterns[0], sources.get(0))
    acc = dedupe(acc, acc_vars).materialize()
    for idx, pattern in enumerate(patterns[1:], start=1):
        if acc.count() == 0:
            return acc  # no bindings can survive further patterns
        nxt, nxt_vars = leg(pattern, sources.get(idx))
        # LOCAL dedup only: the post-join global fold collapses any
        # cross-block duplicates, so a global distinct here would be a
        # wasted all-to-all (one saved shuffle per pattern)
        nxt = local_dd(nxt).materialize()
        shared = [v for v in nxt_vars if v in acc_vars]
        if not shared and "_exists" not in nxt_vars:
            raise ValueError(
                f"pattern {pattern} shares no variable with prior "
                "bindings (cross join rejected)")
        if "_exists" in nxt_vars:
            # existence check: keep bindings iff any matching triple
            if nxt.count() == 0:
                return acc.limit(0)
            continue
        if nxt.count() == 0:
            # empty leg: no joined bindings (an empty join INPUT would
            # also crash Ray's hash join on a schema-less block)
            return acc.limit(0)
        acc = coalesce_for_join(acc, num_partitions).join(
            coalesce_for_join(nxt, num_partitions),
            join_type="inner", num_partitions=num_partitions,
            on=tuple(shared), right_on=tuple(shared),
        )
        acc_vars = acc_vars + [v for v in nxt_vars if v not in acc_vars]
        acc = dedupe(acc, acc_vars).materialize()

    internal = [v for v in acc_vars if v.startswith("__seq")]
    if internal and len(internal) < len(acc_vars):
        # sequence-path intermediates are invisible in SPARQL: project
        # them out, then re-distinct (several paths may share endpoints)
        acc_vars = [v for v in acc_vars if not v.startswith("__seq")]
        acc = acc.map_batches(
            lambda b, _i=tuple(internal): b.drop_columns(list(_i)),
            batch_format="pyarrow")
        acc = dedupe(acc, acc_vars).materialize()

    if filters:
        acc = _apply_binding_filters(acc, filters, acc_vars).materialize()

    if values is not None:
        acc = _apply_values(acc, values, acc_vars).materialize()

    for pattern in minus or []:
        if acc.count() == 0:
            break
        nxt, nxt_vars = leg(pattern)
        if "_exists" in nxt_vars:
            raise ValueError(f"minus pattern {pattern} binds no variable")
        shared = [v for v in nxt_vars if v in acc_vars]
        if not shared:
            raise ValueError(
                f"minus pattern {pattern} shares no variable with prior "
                "bindings")

        def proj_marker(batch: pa.Table,
                        _shared=tuple(shared)) -> pa.Table:
            t = batch.select(list(_shared))
            return t.append_column(
                "_m", pa.array([1] * t.num_rows, type=pa.int64()))

        mk = dedupe(nxt.map_batches(
            lambda b, _s=tuple(shared): b.select(list(_s)),
            batch_format="pyarrow"), shared).materialize()
        if mk.count() == 0:
            continue
        mk = mk.map_batches(proj_marker, batch_format="pyarrow")
        acc = coalesce_for_join(acc, num_partitions).join(
            coalesce_for_join(mk, num_partitions),
            join_type="left_outer", num_partitions=num_partitions,
            on=tuple(shared), right_on=tuple(shared),
        )

        def keep_unmatched(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.is_null(batch.column("_m")))
            return t.drop_columns(["_m"])

        acc = acc.map_batches(keep_unmatched,
                              batch_format="pyarrow").materialize()

    for pattern in optional or []:
        if acc.count() == 0:
            return acc
        nxt, nxt_vars = leg(pattern)
        if "_exists" in nxt_vars:
            raise ValueError(
                f"optional pattern {pattern} binds no variable")
        nxt = dedupe(nxt, nxt_vars).materialize()
        shared = [v for v in nxt_vars if v in acc_vars]
        new = [v for v in nxt_vars if v not in acc_vars]
        if not shared:
            raise ValueError(
                f"optional pattern {pattern} shares no variable with "
                "prior bindings")
        if nxt.count() == 0:
            # nothing to attach: every binding keeps nulls for the new
            # vars (and an empty join input would crash the hash join)
            def pad(batch: pa.Table, _new=tuple(new)) -> pa.Table:
                t = batch
                for v in _new:
                    t = t.append_column(
                        v, pa.nulls(t.num_rows, pa.int64()))
                return t

            acc = acc.map_batches(pad, batch_format="pyarrow")
            acc_vars = acc_vars + new
            continue
        acc = coalesce_for_join(acc, num_partitions).join(
            coalesce_for_join(nxt, num_partitions),
            join_type="left_outer", num_partitions=num_partitions,
            on=tuple(shared), right_on=tuple(shared),
        ).materialize()
        acc_vars = acc_vars + new
    return acc


def _fold_broadcast(leg, dedupe, patterns, optional, threshold,
                    sources, final_distinct=True, filters=None,
                    minus=None, values=None):
    """Broadcast fold for `match_bgp(join_strategy="broadcast")`: the
    first leg streams; every later leg is collected ONCE on the driver
    (size-checked against `threshold`), `ray.put`, and merged into the
    accumulated bindings with a vectorized pandas merge per batch.  The
    only all-to-all is the single DISTINCT fold after the required
    patterns — no native joins, no per-leg counts or materializations,
    which is what makes iterative callers (saturate) cheap per round.
    FILTER rides the same streaming pass (applied BEFORE the distinct
    fold — it commutes with DISTINCT and shrinks the shuffle); MINUS legs
    are collected like any broadcast leg and removed with a vectorized
    anti-merge per batch.  Returns a LAZY dataset (the hash path
    materializes)."""

    def localdd(ds):
        return ds.map_batches(
            lambda b: b.to_pandas().drop_duplicates(),
            batch_format="pyarrow")

    def collect(ds, cols, pattern):
        df = localdd(ds).to_pandas()
        if len(df) == 0:  # may arrive schema-less (no columns)
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in cols})
        df = df.drop_duplicates().reset_index(drop=True)
        if len(df) > threshold:
            raise ValueError(
                f"broadcast leg for pattern {pattern} has {len(df)} rows "
                f"> broadcast_threshold={threshold}; use "
                "join_strategy='hash'")
        return df[cols]

    acc, acc_vars = leg(patterns[0], sources.get(0))
    acc = localdd(acc)
    for idx, pattern in enumerate(patterns[1:], start=1):
        nxt, nxt_vars = leg(pattern, sources.get(idx))
        shared = [v for v in nxt_vars if v in acc_vars]
        if not shared and "_exists" not in nxt_vars:
            raise ValueError(
                f"pattern {pattern} shares no variable with prior "
                "bindings (cross join rejected)")
        ndf = collect(nxt, nxt_vars, pattern)
        if "_exists" in nxt_vars:
            if len(ndf) == 0:
                return acc.limit(0)
            continue
        if len(ndf) == 0:
            return acc.limit(0)
        ref = ray.put(ndf)

        def merge(batch: pa.Table, _ref=ref,
                  _shared=tuple(shared)) -> pd.DataFrame:
            rt = ray.get(_ref)
            out = batch.to_pandas().merge(rt, on=list(_shared),
                                          how="inner")
            return out.drop_duplicates()

        acc = acc.map_batches(merge, batch_format="pyarrow")
        acc_vars = acc_vars + [v for v in nxt_vars if v not in acc_vars]

    internal = [v for v in acc_vars if v.startswith("__seq")]
    if internal and len(internal) < len(acc_vars):
        acc_vars = [v for v in acc_vars if not v.startswith("__seq")]
        acc = acc.map_batches(
            lambda b, _i=tuple(internal): b.drop_columns(list(_i)),
            batch_format="pyarrow")

    if filters:
        acc = _apply_binding_filters(acc, filters, acc_vars)

    if values is not None:
        acc = _apply_values(acc, values, acc_vars)

    if final_distinct:
        acc = dedupe(acc, acc_vars)  # the one global fold (DISTINCT)

    for pattern in minus or []:
        nxt, nxt_vars = leg(pattern)
        if "_exists" in nxt_vars:
            raise ValueError(f"minus pattern {pattern} binds no variable")
        shared = [v for v in nxt_vars if v in acc_vars]
        if not shared:
            raise ValueError(
                f"minus pattern {pattern} shares no variable with prior "
                "bindings")
        mdf = collect(nxt, nxt_vars, pattern)[shared].drop_duplicates()
        if len(mdf) == 0:
            continue
        mref = ray.put(mdf)

        def anti(batch: pa.Table, _ref=mref,
                 _shared=tuple(shared)) -> pd.DataFrame:
            rt = ray.get(_ref)
            out = batch.to_pandas().merge(
                rt, on=list(_shared), how="left", indicator="_m")
            out = out[out["_m"] == "left_only"]
            return out.drop(columns=["_m"])

        acc = acc.map_batches(anti, batch_format="pyarrow")

    for pattern in optional or []:
        nxt, nxt_vars = leg(pattern)
        if "_exists" in nxt_vars:
            raise ValueError(
                f"optional pattern {pattern} binds no variable")
        shared = [v for v in nxt_vars if v in acc_vars]
        new = [v for v in nxt_vars if v not in acc_vars]
        if not shared:
            raise ValueError(
                f"optional pattern {pattern} shares no variable with "
                "prior bindings")
        ndf = collect(nxt, nxt_vars, pattern)
        if len(ndf) == 0:
            def pad(batch: pa.Table, _new=tuple(new)) -> pa.Table:
                t = batch
                for v in _new:
                    t = t.append_column(
                        v, pa.nulls(t.num_rows, pa.int64()))
                return t

            acc = acc.map_batches(pad, batch_format="pyarrow")
            acc_vars = acc_vars + new
            continue
        oref = ray.put(ndf)

        def lmerge(batch: pa.Table, _ref=oref,
                   _shared=tuple(shared)) -> pd.DataFrame:
            rt = ray.get(_ref)
            return batch.to_pandas().merge(rt, on=list(_shared),
                                           how="left")

        acc = acc.map_batches(lmerge, batch_format="pyarrow")
        acc_vars = acc_vars + new
    return acc


def _head_emitter(head: tuple):
    hs, hp, ho = head

    def emit(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        n = len(df)

        def term(t):
            if _is_var(t):
                return df[t[1:]].to_numpy()
            return pd.Series([t] * n, dtype=object).to_numpy()

        # variable head PREDICATE is allowed (rdfs7's (?x ?q ?y) head):
        # it projects the bound predicate string per row
        return pd.DataFrame({"s": term(hs), "p": term(hp),
                             "o": term(ho)})

    return emit


def apply_rule(
    triples: ray.data.Dataset,
    body: list[tuple],
    head: tuple,
    **match_kwargs,
) -> ray.data.Dataset:
    """Forward-chaining rule application (single Datalog-style rule):
    match the `body` patterns, project every distinct binding through the
    `head` template (s, p, o — `?var` references body variables,
    constants pass through) and return the MATERIALIZED new triples in
    the same (s, p, o) layout as the input store.  One match_bgp plan +
    one vectorized projection; dedupe rides on match_bgp's DISTINCT
    semantics plus a final fold when the head drops variables."""
    hs, hp, ho = head
    bindings = match_bgp(triples, body, **match_kwargs)
    body_vars = set().union(*(_pattern_vars(p) for p in body))
    need = {t[1:] for t in (hs, hp, ho) if _is_var(t)}

    out = bindings.map_batches(_head_emitter(head),
                               batch_format="pyarrow")
    if need != body_vars:  # head dropped a variable: bindings -> dups
        out = (out.map_batches(
            lambda b: b.to_pandas().drop_duplicates(),
            batch_format="pyarrow")
            .groupby(["s", "p", "o"]).count().drop_columns(["count()"]))
    return out


def construct(
    triples: ray.data.Dataset,
    body: list[tuple],
    heads: list[tuple],
    **match_kwargs,
) -> ray.data.Dataset:
    """SPARQL CONSTRUCT with a multi-triple template: ONE body match
    feeds every head projection (the bindings are materialized once and
    fanned out), then a single global distinct fold — heads may overlap
    or drop variables, duplicates collapse exactly once.  The
    N-rule-sharing-one-body counterpart of `apply_rule`."""
    if not heads:
        raise ValueError("empty head template list")
    bindings = match_bgp(triples, body, **match_kwargs).materialize()
    out = None
    for head in heads:
        part = bindings.map_batches(_head_emitter(head),
                                    batch_format="pyarrow")
        out = part if out is None else out.union(part)
    local = out.map_batches(
        lambda b: b.to_pandas().drop_duplicates(),
        batch_format="pyarrow")
    return (local.groupby(["s", "p", "o"]).count()
            .drop_columns(["count()"]))


def _pattern_vars(pattern: tuple) -> set:
    return {t[1:] for t in pattern if _is_var(t)}


def _delta_order(body: list[tuple], i: int) -> tuple[list[tuple], int]:
    """Reorder `body` so the delta-restricted atom `i` sits LAST (the
    broadcast fold streams the first leg and collects the rest — the
    delta is the small side, so it should be collected, and full-store
    atoms should lead).  Falls back to the original order when the
    rotation would break the shared-variable chain match_bgp requires."""
    if len(body) == 1 or i == len(body) - 1:
        return body, i
    cand = [p for j, p in enumerate(body) if j != i] + [body[i]]
    seen = _pattern_vars(cand[0])
    if not seen:
        return body, i  # all-constant first pattern: keep original
    for p in cand[1:]:
        v = _pattern_vars(p)
        if v and not (v & seen):
            return body, i
        seen |= v
    return cand, len(body) - 1


def saturate(
    triples: ray.data.Dataset,
    rules: list[tuple],
    max_rounds: int = 12,
    num_partitions: int | None = None,
    strategy: str = "naive",
    **match_kwargs,
) -> ray.data.Dataset:
    """Datalog saturation: apply `rules` (each a (body, head) pair as in
    `apply_rule`) repeatedly until a round derives NOTHING NEW or
    `max_rounds` is hit — the forward-chaining fixpoint that materializes
    recursive rule sets (ancestors, reachability, RDFS schemas).

    Round structure: every rule matches against the CURRENT store
    (base + all derivations so far); new triples fold in through a
    distinct union.  Convergence is detected by the store's distinct
    count (monotone — derivations only grow), costing one count per
    round.  The store is materialized per round (iterative lineage
    rule).  Naive evaluation (whole store re-matched per round, not
    semi-naive deltas) is correct always but wasteful on deep
    recursions — pass `strategy="semi_naive"` (below) for those.

    Per-round plan defaults to `join_strategy="broadcast"` +
    `materialize_input=False`: rule bodies fold through driver-collected
    broadcast legs over the already-materialized store, so a round costs
    one leg-collect execution per join pattern plus ONE distinct fold —
    not a native hash join (fresh aggregator actors) plus 4 shuffles.
    The contract is that the saturated store's pattern legs stay
    broadcast-sized; pass join_strategy="hash" for stores beyond that.

    `strategy="semi_naive"` is the classic Datalog upgrade: every new
    fact this round must use at least one fact derived LAST round, so
    each rule body is expanded into one variant per atom with that atom
    restricted to the delta (`pattern_sources`), the delta atom rotated
    last (small side collected, full store streams).  The per-round
    store fold doubles as delta detection: store rows tag 0, derivations
    tag 1, groupby(s,p,o).min(tag) — min 1 means genuinely new.  Same
    round semantics as naive (store_k identical round for round, pinned
    by test); the win is matching O(delta x store) instead of
    O(store x store) once the closure front narrows."""

    if strategy not in ("naive", "semi_naive"):
        raise ValueError(f"unknown strategy {strategy!r}")
    match_kwargs.setdefault("join_strategy", "broadcast")
    match_kwargs.setdefault("materialize_input", False)
    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    def dd(ds: ray.data.Dataset) -> ray.data.Dataset:
        local = ds.map_batches(
            lambda b: b.to_pandas().drop_duplicates(),
            batch_format="pyarrow")
        # bound the store's block count BEFORE the aggregate: the fold's
        # output partition count tracks its input block count, and the
        # per-round union (store + one branch per rule) would otherwise
        # multiply blocks every round — an exponential task-count blowup
        # (observed: ~4k map tasks by round 7 on a 4k-row store) that also
        # inflates the shuffle's driver-memory estimate until backpressure
        # stalls the plan.
        local = local.repartition(num_partitions)
        return (local.groupby(["s", "p", "o"]).count()
                .drop_columns(["count()"]))

    if strategy == "semi_naive":
        return _saturate_semi_naive(triples, rules, max_rounds,
                                    num_partitions, match_kwargs)

    store = dd(triples.select_columns(["s", "p", "o"])).materialize()
    n = store.count()
    for _ in range(max_rounds):
        derived = None
        for body, head in rules:
            new = apply_rule(store, body, head, **match_kwargs)
            derived = new if derived is None else derived.union(new)
        store = dd(store.union(derived)).materialize()
        n2 = store.count()
        if n2 == n:
            break
        n = n2
    return store


def _atom_cannot_match(atom: tuple, preds: set) -> bool:
    """True when `atom`'s constant predicate can never appear in a
    dataset whose rows all carry predicates from `preds` — the static
    pruning that lets semi-naive skip delta variants outright (from
    round 2 on, the delta only contains rule-HEAD predicates)."""
    p = atom[1]
    if _is_var(p):
        return False
    if p.endswith("*") or p.endswith("?"):
        # zero-length component matches ANY delta regardless of its
        # predicates — never prunable
        return False
    if p.startswith("!") or p.startswith("^!"):
        # negated set: matches every predicate OUTSIDE the list — only
        # prunable if the delta holds nothing else; stay conservative
        return False
    base = p[:-1] if p.endswith("+") else p
    return base not in preds


def _saturate_semi_naive(
    triples: ray.data.Dataset,
    rules: list[tuple],
    max_rounds: int,
    num_partitions: int,
    match_kwargs: dict,
    base_store: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """See `saturate(strategy="semi_naive")`.  Loop state (the folded
    store) is materialized every round; the delta is a one-op filter
    over that materialized fold, so lineage depth stays constant.

    With `base_store` (a store ALREADY closed under `rules`), this is
    INCREMENTAL maintenance: `triples` are the arriving facts, the
    initial delta is exactly the arriving facts not already known, and
    the rounds only derive consequences that involve them."""

    def tag(t: int):
        def f(batch: pa.Table) -> pd.DataFrame:
            d = batch.to_pandas().drop_duplicates()
            d["_tag"] = np.int64(t)
            return d
        return f

    def only_new(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("min(_tag)"), 1))
        return t.drop_columns(["min(_tag)"])

    base = (triples.select_columns(["s", "p", "o"])
            .map_batches(tag(1), batch_format="pyarrow"))
    if base_store is not None:
        base = base.union(
            base_store.select_columns(["s", "p", "o"])
            .map_batches(tag(0), batch_format="pyarrow"))
    base = base.repartition(num_partitions)
    folded = base.groupby(["s", "p", "o"]).min("_tag").materialize()
    store = folded.drop_columns(["min(_tag)"])
    delta = folded.map_batches(only_new, batch_format="pyarrow")
    if base_store is not None and delta.count() == 0:
        return store  # nothing genuinely new arrived

    # from round 2 on, every delta row was derived by some rule, so its
    # predicate is a rule head — variants whose delta atom names any
    # other constant predicate can be skipped without executing anything.
    # A VARIABLE head predicate (rdfs7-style) can derive any predicate,
    # which disables this pruning entirely.
    head_preds = {head[1] for _, head in rules}
    pruning_ok = not any(_is_var(hp) for hp in head_preds)
    delta_preds: set | None = None  # None = unknown (round 1)

    for _ in range(max_rounds):
        derived = None
        for body, head in rules:
            for i in range(len(body)):
                if (delta_preds is not None
                        and _atom_cannot_match(body[i], delta_preds)):
                    continue
                order, dpos = _delta_order(body, i)
                new = apply_rule(store, order, head,
                                 pattern_sources={dpos: delta},
                                 final_distinct=False, **match_kwargs)
                derived = new if derived is None else derived.union(new)
        if derived is None:
            break  # no rule can touch the delta: fixpoint
        # one exchange yields BOTH the next store and the new-fact delta:
        # store rows tag 0, derivations tag 1; min(tag)==1 <=> not seen
        # before.  repartition first — see dd() in saturate for why.
        u = (store.map_batches(tag(0), batch_format="pyarrow")
             .union(derived.map_batches(tag(1), batch_format="pyarrow"))
             .repartition(num_partitions))
        folded = u.groupby(["s", "p", "o"]).min("_tag").materialize()
        store = folded.drop_columns(["min(_tag)"])
        delta = folded.map_batches(only_new, batch_format="pyarrow")
        delta_preds = head_preds if pruning_ok else None
        if delta.count() == 0:
            break
    return store


def saturate_incremental(
    saturated_store: ray.data.Dataset,
    new_triples: ray.data.Dataset,
    rules: list[tuple],
    max_rounds: int = 12,
    num_partitions: int | None = None,
    **match_kwargs,
) -> ray.data.Dataset:
    """Maintain a rule-saturated store as new base facts arrive — the
    incremental counterpart of re-running `saturate` over the unioned
    base (equivalence pinned by test).  `saturated_store` must already
    be closed under `rules`; the semi-naive loop is seeded with exactly
    the arriving facts that are genuinely new, so the work per batch
    tracks the CONSEQUENCES OF THE BATCH, not the accumulated store —
    the "the KG grew, don't re-derive everything" answer, same state
    discipline as the q111/q112 incremental dedup family.

    Soundness/completeness: any fact derivable from store + new facts
    but absent from the closed store has a derivation using at least one
    new fact, which semi-naive's delta variants enumerate."""
    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2
    match_kwargs.setdefault("join_strategy", "broadcast")
    match_kwargs.setdefault("materialize_input", False)
    return _saturate_semi_naive(new_triples, rules, max_rounds,
                                num_partitions, match_kwargs,
                                base_store=saturated_store)


def entail_transitive(
    store: ray.data.Dataset,
    type_pred: str = "a",
    type_obj: str = "TransitiveProperty",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    max_hops: int = 8,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """owl:TransitiveProperty entailment driven by ONTOLOGY DECLARATIONS
    in the store itself: every predicate q declared transitive by a
    (q, type_pred, type_obj) triple gets its bounded transitive closure
    materialized as triples (s, q, o) in store layout — the
    prp-trp rule of the OWL 2 RL profile, with the hop cap as the
    recursion contract (same as `p+` paths).

    The declaration set is collected to the driver (ontology vocabularies
    are bounded); each declared predicate's edges run the shared
    `_bounded_closure` (per hop one native join + distinct fold).
    Returns the closure triples ONLY (1..max_hops, so the direct edges
    reappear); callers union with the store and distinct-fold, or feed
    a downstream match.  Node dtype passes through untouched."""
    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    decl = store.map_batches(
        lambda b: b.filter(pc.and_(
            pc.equal(b.column(p_col).cast(pa.string()), type_pred),
            pc.equal(b.column(o_col).cast(pa.string()), type_obj),
        )).select([s_col]),
        batch_format="pyarrow").take_all()
    preds = sorted({str(r[s_col]) for r in decl})

    out = None
    for q in preds:
        def edge_proj(batch: pa.Table, _q=q) -> pa.Table:
            t = batch.filter(
                pc.equal(batch.column(p_col).cast(pa.string()), _q))
            return pa.table({"_ta": t.column(s_col),
                             "_tb": t.column(o_col)})

        closure = _bounded_closure(
            store.map_batches(edge_proj, batch_format="pyarrow"),
            max_hops, num_partitions)

        def to_triples(b: pa.Table, _q=q) -> pd.DataFrame:
            df = b.to_pandas()
            return pd.DataFrame({s_col: df["_ta"],
                                 p_col: _q,
                                 o_col: df["_tb"]})

        part = closure.map_batches(to_triples, batch_format="pyarrow")
        out = part if out is None else out.union(part)
    if out is None:
        # no declared transitive predicates: empty TYPED store-layout
        # table (an empty pandas frame drops its schema through Ray)
        return ray.data.from_arrow(pa.table({
            s_col: pa.array([], type=pa.string()),
            p_col: pa.array([], type=pa.string()),
            o_col: pa.array([], type=pa.string())}))
    return out


def match_bgp_union(
    triples: ray.data.Dataset,
    groups: list,
    num_partitions: int | None = None,
    n_buckets: int = 32,
    **match_kwargs,
) -> ray.data.Dataset:
    """SPARQL `{A} UNION {B}` over pattern groups: each element of
    `groups` is a pattern list or a dict of per-branch match_bgp kwargs
    (patterns/optional/filters/minus/values).  Branches evaluate
    independently over ONE materialized store; results align to the
    union of all variables (a variable unbound in a branch comes back
    null, object dtype) and fold through one coarse-bucket distinct
    exchange — SPARQL SELECT DISTINCT across branches, with
    unbound == unbound (two branches emitting the same bound values and
    the same unbound columns collapse to one row).

    Scale shape: |branches| independent BGP plans + ONE bucketed dedup
    exchange.  Branch outputs are evenly re-blocked before the union —
    match_bgp's final fold emits empty/odd blocks that destabilize a
    second groupby exchange (the q127 Sort-estimate quirk)."""
    import zlib

    from .joins import coalesce_for_join

    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2
    store = triples.materialize()
    branches = []
    for grp in groups:
        kw = dict(grp) if isinstance(grp, dict) else {"patterns": grp}
        pats = kw.pop("patterns")
        branches.append(match_bgp(
            store, pats, num_partitions=num_partitions,
            materialize_input=False, **{**match_kwargs, **kw}))

    all_vars = sorted({c for b in branches for c in b.schema().names})

    def pad(df: pd.DataFrame, _cols=tuple(all_vars)) -> pd.DataFrame:
        for c in _cols:
            if c not in df.columns:
                df[c] = None
        return df[list(_cols)]

    padded = [coalesce_for_join(
        b.map_batches(lambda t, _p=pad: _p(t.to_pandas()),
                      batch_format="pyarrow"),
        num_partitions) for b in branches]
    u = padded[0]
    for b in padded[1:]:
        u = u.union(b)

    def tag(batch: pa.Table, _cols=tuple(all_vars),
            _n=n_buckets) -> pd.DataFrame:
        df = batch.to_pandas()
        key = None
        for c in _cols:
            s = df[c].astype(str)
            key = s if key is None else key + "|" + s
        df["_bucket"] = key.map(
            lambda k: zlib.crc32(k.encode()) % _n).astype("int32")
        return df

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["_bucket"]).drop_duplicates()

    return (u.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(dedup, batch_format="pandas"))


_BIND_OPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "//": lambda a, b: a // b,
}


def bind_bindings(
    bindings: ray.data.Dataset,
    bind: list[tuple],
) -> ray.data.Dataset:
    """SPARQL BIND (AS): extend a binding set with computed variables —
    each (new_var, op, a, b) adds `new_var = a <op> b` where a/b are
    bound variable names or numeric literals; later binds may reference
    earlier ones.  Purely row-local (one vectorized map pass, no
    shuffle); a deterministic function of bound columns preserves
    distinctness, so this composes after match_bgp / match_bgp_union
    without re-deduplication.  `//` floors like Python — the DuckDB
    oracle divergence on NEGATIVE numerators (SQL truncates toward
    zero) is the caller's contract to avoid, as with the ppm queries."""
    ops = dict(_BIND_OPS)
    for new_var, op, _, _ in bind:
        if op not in ops:
            raise ValueError(f"unknown BIND op {op!r}")

    def f(batch: pa.Table, _bind=tuple(bind)) -> pd.DataFrame:
        df = batch.to_pandas()
        for new_var, op, a, b in _bind:
            av = df[a] if isinstance(a, str) else a
            bv = df[b] if isinstance(b, str) else b
            df[new_var] = ops[op](av, bv)
        return df

    for _, _, a, b in bind:
        for t in (a, b):
            if isinstance(t, str) and t not in (
                    bindings.schema().names):
                # allow refs to vars created by EARLIER bind entries
                if t not in [nv for nv, *_ in bind]:
                    raise ValueError(
                        f"BIND references unbound variable {t!r}")
    return bindings.map_batches(f, batch_format="pyarrow")


def saturate_stratified(
    triples: ray.data.Dataset,
    strata: list[list[tuple]],
    max_rounds: int = 12,
    num_partitions: int | None = None,
    **match_kwargs,
) -> ray.data.Dataset:
    """Stratified Datalog WITH NEGATION: `strata` is an ordered list of
    rule sets; each rule is (body, head) as in `apply_rule`, and a body
    atom may be wrapped as ("not", (s, p, o)) — the negated atom removes
    bindings compatible with ANY of its matches (exactly `match_bgp`'s
    MINUS anti semi-join, which is Datalog's safe-negation semantics:
    every negated variable shared with the positive body is universally
    excluded, extra variables are existential).

    Stratification is the classic safety condition and is ENFORCED: a
    predicate negated in stratum i must be fully derived before i — it
    may not appear (as a constant) in any head of stratum i or later,
    and a negated atom's predicate may not be a variable.  Within a
    stratum the negated relations are therefore frozen, so the
    per-round fixpoint loop (same count-convergence scheme as
    `saturate`) stays monotone and correct while the store grows.
    Each stratum runs to fixpoint before the next begins; returns the
    final saturated store."""
    heads_from = []  # heads_from[i] = head predicates of strata i..end
    acc: set = set()
    for rules in reversed(strata):
        acc = acc | {r[1][1] for r in rules if not _is_var(r[1][1])}
        heads_from.append(set(acc))
    heads_from.reverse()
    for i, rules in enumerate(strata):
        for body, head in rules:
            for atom in body:
                if not (len(atom) == 2 and atom[0] == "not"):
                    continue
                npred = atom[1][1]
                if _is_var(npred):
                    raise ValueError(
                        f"stratum {i}: negated atom {atom[1]} has a "
                        "variable predicate — unstratifiable")
                if npred in heads_from[i]:
                    raise ValueError(
                        f"stratum {i}: predicate {npred!r} is negated "
                        "but derived in this or a later stratum — "
                        "program is not stratified")

    match_kwargs.setdefault("join_strategy", "broadcast")
    match_kwargs.setdefault("materialize_input", False)
    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    def dd(ds: ray.data.Dataset) -> ray.data.Dataset:
        local = ds.map_batches(
            lambda b: b.to_pandas().drop_duplicates(),
            batch_format="pyarrow")
        local = local.repartition(num_partitions)  # block-blowup guard
        return (local.groupby(["s", "p", "o"]).count()
                .drop_columns(["count()"]))

    store = dd(triples.select_columns(["s", "p", "o"])).materialize()
    n = store.count()
    for si, rules in enumerate(strata):
        if not rules:
            # an empty stratum would leave derived=None below and the
            # "fully derived before negation" contract has nothing to
            # derive — reject loudly instead of union(None)
            raise ValueError(f"stratum {si} has no rules")
        converged = False
        for _ in range(max_rounds):
            derived = None
            for body, head in rules:
                pos = [a for a in body
                       if not (len(a) == 2 and a[0] == "not")]
                neg = [a[1] for a in body
                       if len(a) == 2 and a[0] == "not"]
                if not pos:
                    raise ValueError(
                        f"rule {head}: body needs >= 1 positive atom")
                new = apply_rule(store, pos, head,
                                 minus=neg or None, **match_kwargs)
                derived = new if derived is None else derived.union(new)
            store = dd(store.union(derived)).materialize()
            n2 = store.count()
            if n2 == n:
                converged = True
                break
            n = n2
        if not converged:
            # later strata negate this stratum's predicates; an
            # incomplete derivation would silently break stratified
            # semantics, so exiting by round budget is an error
            raise RuntimeError(
                f"stratum {si} did not reach fixpoint within "
                f"max_rounds={max_rounds}")
    return store


def _flag_fold(sides: list[tuple[ray.data.Dataset, str]],
               num_partitions: int) -> ray.data.Dataset:
    """Multi-set-operation primitive: tag each side's (s, p, o) rows
    with a named 0/1 flag, union, ONE groupby fold taking max of every
    flag — duplicate-insensitive (no per-side pre-dedup needed), so
    intersections / differences / conjunctions of any number of triple
    sets cost exactly one exchange.  Output: (s, p, o, <flag>...)."""
    names = [n for _, n in sides]
    u = None
    for ds, name in sides:
        def tag(batch: pa.Table, _n=name) -> pd.DataFrame:
            d = batch.select(["s", "p", "o"]).to_pandas()
            for c in names:
                d[c] = np.int64(1 if c == _n else 0)
            return d
        part = ds.map_batches(tag, batch_format="pyarrow")
        u = part if u is None else u.union(part)
    u = u.repartition(num_partitions)
    folded = u.groupby(["s", "p", "o"]).max(names)
    return folded.map_batches(
        lambda b: b.rename_columns(["s", "p", "o"] + names),
        batch_format="pyarrow")


def saturate_decremental(
    saturated_store: ray.data.Dataset,
    base: ray.data.Dataset,
    deleted: ray.data.Dataset,
    rules: list[tuple],
    max_rounds: int = 12,
    num_partitions: int | None = None,
    **match_kwargs,
) -> ray.data.Dataset:
    """DRed deletion maintenance (Gupta, Mumick & Subrahmanian, SIGMOD
    1993): retract `deleted` base facts from a store ALREADY closed
    under `rules` without recomputing the closure — the decremental
    sibling of `saturate_incremental` (the full KG-maintenance pair).
    Result is equivalent to `saturate(base - deleted)` (pinned by
    test).  Three phases, each bounded by `max_rounds`:

    1. OVERDELETE — semi-naive over the deletion delta: any head whose
       body matches the ORIGINAL closed store with >= 1 atom in the
       current delta joins the overdeleted set D (the standard
       delta-rotation, one `apply_rule` per (rule, atom) variant per
       round; new members = derived AND in-store AND not-in-D via one
       `_flag_fold` exchange).
    2. PRUNE — store⁻ = store \\ D in one fold.
    3. REDERIVE — overdeleted facts with alternative support re-enter:
       seed R = D ∩ (base \\ deleted) (still-asserted base facts); the
       first round evaluates every rule UNRESTRICTED over store⁻ ∪ R
       (an overdeleted fact may be wholly supported by surviving
       facts), subsequent rounds are semi-naive over the re-admitted
       delta; derived heads are admitted only if in D and not yet
       present, until fixpoint.

    Work tracks the CONSEQUENCES OF THE DELETION, not the store size —
    the broadcast-leg contract of `saturate` applies to the delta
    sides.  Base facts must be a subset of the closed store."""
    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2
    match_kwargs.setdefault("join_strategy", "broadcast")
    match_kwargs.setdefault("materialize_input", False)

    store = (saturated_store.select_columns(["s", "p", "o"])
             .materialize())

    # deletions actually present in the base (others are no-ops)
    f = _flag_fold([(deleted, "_del"), (base, "_base")],
                   num_partitions).materialize()
    deleted0 = f.map_batches(
        lambda b: b.filter(pc.and_(
            pc.equal(b.column("_del"), 1),
            pc.equal(b.column("_base"), 1))).select(["s", "p", "o"]),
        batch_format="pyarrow").materialize()
    base_rem = f.map_batches(
        lambda b: b.filter(pc.and_(
            pc.equal(b.column("_base"), 1),
            pc.equal(b.column("_del"), 0))).select(["s", "p", "o"]),
        batch_format="pyarrow").materialize()
    if deleted0.count() == 0:
        return store

    # ---- phase 1: overdelete ------------------------------------------
    D = deleted0
    delta = deleted0
    for _ in range(max_rounds):
        derived = None
        for body, head in rules:
            for i in range(len(body)):
                order, dpos = _delta_order(body, i)
                new = apply_rule(store, order, head,
                                 pattern_sources={dpos: delta},
                                 final_distinct=False, **match_kwargs)
                derived = new if derived is None else derived.union(new)
        if derived is None:
            break
        f = _flag_fold([(derived, "_new"), (store, "_st"), (D, "_d")],
                       num_partitions).materialize()
        delta = f.map_batches(
            lambda b: b.filter(pc.and_(pc.and_(
                pc.equal(b.column("_new"), 1),
                pc.equal(b.column("_st"), 1)),
                pc.equal(b.column("_d"), 0))).select(["s", "p", "o"]),
            batch_format="pyarrow").materialize()
        if delta.count() == 0:
            break
        D = D.union(delta).materialize()

    # ---- phase 2: prune ------------------------------------------------
    f = _flag_fold([(store, "_st"), (D, "_d")], num_partitions
                   ).materialize()
    pruned = f.map_batches(
        lambda b: b.filter(pc.and_(
            pc.equal(b.column("_st"), 1),
            pc.equal(b.column("_d"), 0))).select(["s", "p", "o"]),
        batch_format="pyarrow").materialize()

    # ---- phase 3: rederive ----------------------------------------------
    # seed: overdeleted facts still asserted as base
    f = _flag_fold([(D, "_d"), (base_rem, "_b")], num_partitions
                   ).materialize()
    seed = f.map_batches(
        lambda b: b.filter(pc.and_(
            pc.equal(b.column("_d"), 1),
            pc.equal(b.column("_b"), 1))).select(["s", "p", "o"]),
        batch_format="pyarrow").materialize()
    cur = pruned.union(seed).materialize()
    # first rederive round is a FULL evaluation over the pruned store
    # (an overdeleted fact may be wholly supported by surviving facts,
    # leaving no delta atom for the semi-naive variants to anchor on);
    # only heads in D are candidates, so the admitted set stays small.
    delta = None
    for _ in range(max_rounds):
        derived = None
        if delta is None:        # round 1: unrestricted evaluation
            for body, head in rules:
                new = apply_rule(cur, body, head,
                                 final_distinct=False, **match_kwargs)
                derived = new if derived is None else derived.union(new)
        else:
            if delta.count() == 0:
                break
            for body, head in rules:
                for i in range(len(body)):
                    order, dpos = _delta_order(body, i)
                    new = apply_rule(cur, order, head,
                                     pattern_sources={dpos: delta},
                                     final_distinct=False,
                                     **match_kwargs)
                    derived = (new if derived is None
                               else derived.union(new))
        if derived is None:
            break
        f = _flag_fold([(derived, "_new"), (D, "_d"), (cur, "_c")],
                       num_partitions).materialize()
        delta = f.map_batches(
            lambda b: b.filter(pc.and_(pc.and_(
                pc.equal(b.column("_new"), 1),
                pc.equal(b.column("_d"), 1)),
                pc.equal(b.column("_c"), 0))).select(["s", "p", "o"]),
            batch_format="pyarrow").materialize()
        if delta.count() == 0:
            break
        cur = cur.union(delta).materialize()
    return cur


def update_store(
    store: ray.data.Dataset,
    where: list[tuple],
    delete: list[tuple] | tuple = (),
    insert: list[tuple] | tuple = (),
    num_partitions: int | None = None,
    **match_kwargs,
) -> ray.data.Dataset:
    """SPARQL 1.1 UPDATE — `DELETE {...} INSERT {...} WHERE {...}` as
    one operator: the `where` BGP is matched ONCE (bindings
    materialized), every `delete` template instantiates the retraction
    set D and every `insert` template the assertion set I, and the new
    store is (store \\ D) ∪ I in ONE `_flag_fold` exchange.  SPARQL
    1.1 §3.1.3 semantics: both template sets are instantiated against
    the PRE-update store and deletes apply before inserts, so a triple
    in both D and I survives.  Templates are (s, p, o) tuples mixing
    `?var` references and constants (the `construct` convention); an
    empty WHERE match updates nothing.  Cost: one BGP plan + one
    all-to-all."""
    delete, insert = list(delete), list(insert)
    if not (delete or insert):
        raise ValueError("update_store needs delete and/or insert "
                         "templates")
    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    bindings = match_bgp(store, where, **match_kwargs).materialize()

    def emit(templates: list[tuple]) -> ray.data.Dataset:
        out = None
        for head in templates:
            part = bindings.map_batches(_head_emitter(head),
                                        batch_format="pyarrow")
            out = part if out is None else out.union(part)
        if out is None:
            out = ray.data.from_arrow(pa.table({
                "s": pa.array([], type=pa.string()),
                "p": pa.array([], type=pa.string()),
                "o": pa.array([], type=pa.string())}))
        return out

    f = _flag_fold([(store.select_columns(["s", "p", "o"]), "_st"),
                    (emit(delete), "_d"), (emit(insert), "_i")],
                   num_partitions)
    return f.map_batches(
        lambda b: b.filter(pc.or_(
            pc.and_(pc.equal(b.column("_st"), 1),
                    pc.equal(b.column("_d"), 0)),
            pc.equal(b.column("_i"), 1))).select(["s", "p", "o"]),
        batch_format="pyarrow")

"""Declarative relational -> knowledge-graph mapping (R2RML-lite): a
`TripleMap` names how one table's rows become (s, p, o) triples — a
subject template plus one mapping per predicate — and `triplify` runs it
as a single vectorized `map_batches` pass (no shuffle: each row's
triples are emitted from its own batch).

Public-knowledge model: W3C R2RML's triples-map concept (subject map +
predicate-object maps, NULL objects skipped), re-expressed as an Arrow
batch transform.  Node encoding is left to the caller: `node()` builds
"prefix:value" string nodes (string-node KGs, cast_nodes=False in
match_bgp), `col()` passes a column through natively (int-node KGs),
`const()` emits a constant object.

Example — orders into a KG:

    tm = TripleMap(
        subject=node("order", "o_orderkey"),
        mappings=[
            ("by_customer", node("cust", "o_custkey")),
            ("has_status", col("o_orderstatus")),
            ("is_open", const(1), row_filter("o_orderstatus", "==", "O")),
        ])
    triples = triplify(orders, tm)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_OPS = {
    "==": pc.equal, "!=": pc.not_equal, "<": pc.less,
    "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
}


def node(prefix: str, column: str):
    """Term constructor: "prefix:value" string node from a column."""
    return ("node", prefix, column)


def col(column: str):
    """Term constructor: the column's native value."""
    return ("col", column)


def const(value):
    """Term constructor: a constant object value."""
    return ("const", value)


def row_filter(column: str, op: str, value):
    """Mapping guard: emit the triple only for rows where
    `column <op> value` (vectorized Arrow predicate)."""
    if op not in _OPS:
        raise ValueError(f"unknown row_filter op {op!r}")
    return (column, op, value)


@dataclass
class TripleMap:
    """One table's triples-map: `subject` is a term constructor
    (`node`/`col`), `mappings` a list of (predicate, object_term) or
    (predicate, object_term, row_filter) tuples.  NULL objects are
    skipped (R2RML semantics); subjects must be non-null."""
    subject: tuple
    mappings: list = field(default_factory=list)

    def columns(self) -> list[str]:
        """Every input column the map touches — the read-pruning list."""
        cols = []

        def term_cols(t):
            if t[0] == "node":
                return [t[2]]
            if t[0] == "col":
                return [t[1]]
            return []

        cols += term_cols(self.subject)
        for m in self.mappings:
            cols += term_cols(m[1])
            if len(m) > 2 and m[2] is not None:
                cols.append(m[2][0])
        seen, out = set(), []
        for c in cols:
            if c not in seen:
                seen.add(c)
                out.append(c)
        return out


def _eval_term(term: tuple, t: pa.Table):
    kind = term[0]
    if kind == "node":
        _, prefix, column = term
        vals = t.column(column).cast(pa.string())
        return pc.binary_join_element_wise(
            pa.array([prefix] * t.num_rows), vals, ":")
    if kind == "col":
        return t.column(term[1]).combine_chunks()
    if kind == "const":
        # explicit type: an empty batch would otherwise infer null type
        # and falsely trigger the mixed-object-type string cast
        return pa.array([term[1]] * t.num_rows,
                        type=pa.scalar(term[1]).type)
    raise ValueError(f"unknown term kind {kind!r}")


def triplify(
    ds: ray.data.Dataset,
    tmap: TripleMap,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> ray.data.Dataset:
    """Run `tmap` over `ds`: one vectorized pass per batch emitting the
    concatenated per-mapping triple tables.  Object columns keep their
    native Arrow type unless mappings disagree — mixed object types are
    cast to string (string-node KG), so a map can mix `node()` objects
    with numeric `col()` literals.

    Row-local and shuffle-free by construction; duplicate triples are
    NOT folded here (match_bgp / saturate dedupe on their side — and a
    store-level fold is one groupby away when the caller needs it)."""
    if not tmap.mappings:
        raise ValueError("TripleMap has no mappings")

    def emit(batch: pa.Table) -> pa.Table:
        subs_all = _eval_term(tmap.subject, batch)
        parts = []
        for m in tmap.mappings:
            pred, oterm = m[0], m[1]
            guard = m[2] if len(m) > 2 else None
            t, subs = batch, subs_all
            if guard is not None:
                colname, op, val = guard
                mask = _OPS[op](batch.column(colname), val)
                mask = pc.fill_null(mask, False)
                t = batch.filter(mask)
                subs = subs_all.filter(mask)
            objs = _eval_term(oterm, t)
            keep = pc.is_valid(objs)
            if pc.any(pc.invert(keep)).as_py():
                subs, objs = subs.filter(keep), objs.filter(keep)
            parts.append((subs, pred, objs))
        otypes = {str(o.type) for _, _, o in parts}
        out = []
        for subs, pred, objs in parts:
            if len(otypes) > 1:
                objs = objs.cast(pa.string())
            out.append(pa.table({
                s_col: subs,
                # explicit type: a zero-row part would infer null type
                # and emit a schema-poisoning empty block
                p_col: pa.array([pred] * len(subs), type=pa.string()),
                o_col: objs}))
        return pa.concat_tables(out) if out else pa.table({})

    return ds.map_batches(emit, batch_format="pyarrow")


def reify_statements(
    triples: ray.data.Dataset,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    qualifiers: list[str] | None = None,
    stmt_prefix: str = "stmt",
) -> ray.data.Dataset:
    """RDF standard reification (Wikidata-qualifier-style statements):
    each input triple becomes a statement node carrying rdf_subject /
    rdf_predicate / rdf_object triples plus one triple per qualifier
    column.  Statement ids are content-derived (md5 of "s|p|o", the
    SQL-reproducible choice — DuckDB's md5() yields the same hex), so
    re-runs and retries mint identical ids; duplicate input triples
    share a statement node by construction.  Row-local, shuffle-free;
    every object serializes to string (statements mix node and literal
    objects)."""
    import hashlib

    quals = qualifiers or []

    def emit(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        s = df[s_col].astype(str)
        p = df[p_col].astype(str)
        o = df[o_col].astype(str)
        sid = pd.Series(
            [f"{stmt_prefix}:" + hashlib.md5(
                f"{a}|{b}|{c}".encode()).hexdigest()
             for a, b, c in zip(s, p, o)], index=df.index, dtype=object)
        parts = [
            pd.DataFrame({"s": sid, "p": "rdf_subject", "o": s}),
            pd.DataFrame({"s": sid, "p": "rdf_predicate", "o": p}),
            pd.DataFrame({"s": sid, "p": "rdf_object", "o": o}),
        ]
        for q in quals:
            parts.append(pd.DataFrame(
                {"s": sid, "p": q, "o": df[q].astype(str)}))
        return pd.concat(parts, ignore_index=True)

    return triples.map_batches(emit, batch_format="pyarrow")


def triplify_tables(
    named: list[tuple],
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> ray.data.Dataset:
    """Union several (dataset, TripleMap) pairs into one triple store —
    the multi-table R2RML mapping.  Object columns are cast to string
    across tables when the per-table object types disagree (one KG needs
    one object type for match_bgp's joins)."""
    if not named:
        raise ValueError("no (dataset, TripleMap) pairs")
    parts = [triplify(ds, tm, s_col, p_col, o_col) for ds, tm in named]
    if len(parts) == 1:
        return parts[0]

    def to_str(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index(o_col), o_col,
            batch.column(o_col).cast(pa.string()))

    schemas = [p.schema() for p in parts]  # ray.data Schema: names/types
    otypes = {str(dict(zip(s.names, s.types))[o_col]) for s in schemas}
    if len(otypes) > 1:
        parts = [p.map_batches(to_str, batch_format="pyarrow")
                 for p in parts]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out

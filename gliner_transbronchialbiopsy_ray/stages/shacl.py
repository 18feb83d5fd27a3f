"""SHACL-lite shape validation over a distributed triple store — the
KG data-quality operator: shapes target a class (nodes carrying a
(n, type, Class) triple) and declare per-node constraints; the validator
returns a VIOLATIONS dataset (node, shape, constraint, pred, detail).

Public-knowledge model: W3C SHACL's node shapes / property shapes
(sh:targetClass, sh:minCount, sh:maxCount, sh:in, sh:pattern,
sh:class), re-expressed as ONE subject-bucketed exchange + vectorized
in-bucket checks:

- every triple routes by subject hash into a coarse bucket (32 buckets,
  the repo-wide map_groups discipline), so each node's full property
  set is co-located — min/max cardinality, enum membership and regex
  checks are then pandas-vectorized per bucket, never per node;
- `class_ref` (sh:class: the object must itself be typed C) needs the
  OTHER node's type, which lives in another bucket: the referenced
  class's node set is collected once (threshold-enforced) and
  broadcast via ray.put — the dimension-side broadcast pattern.  A
  shuffle semi-join variant is the documented upgrade for classes too
  big to broadcast.

Constraints (all tuples, mirroring the declarative TripleMap style):
    ("min_count", pred, n)   — node must have >= n triples of pred
    ("max_count", pred, n)   — node must have <= n
    ("in_set", pred, values) — every object of pred in the enum
    ("pattern", pred, regex) — every object of pred matches (strings)
    ("class_ref", pred, cls) — every object of pred is typed cls
    ("datatype", pred, dt)   — every object of pred lexically parses as
                               dt in {"integer", "decimal", "date"}
                               (sh:datatype for the common XSD types)
    ("less_than", pred, p2)  — every NUMERIC value of pred is < every
                               numeric value of p2 on the same node
                               (sh:lessThan; nodes lacking either
                               property conform; an unparseable value
                               on either side is itself a violation)
    ("has_value", pred, v)   — node must carry at least one
                               (node, pred, v) triple (sh:hasValue);
                               detail = the missing expected value
    ("equals", pred, p2)     — value SET of pred == value set of p2 on
                               the node (sh:equals); one violation per
                               value present on exactly one side,
                               detail = that value
    ("disjoint", pred, p2)   — the two value sets share nothing
                               (sh:disjoint); one violation per shared
                               value
    ("node_kind", pred, k)   — every value of pred is k ∈ {"iri",
                               "literal"} (sh:nodeKind); this engine's
                               node convention is "prefix:..." strings,
                               so kind is decided by the `name:` prefix
                               heuristic
    ("min_inclusive", pred, bound) / ("max_inclusive", pred, bound) /
    ("min_exclusive", pred, bound) / ("max_exclusive", pred, bound)
                             — every value of pred, parsed numerically,
                               satisfies the bound (sh:minInclusive /
                               sh:maxInclusive / sh:minExclusive /
                               sh:maxExclusive); an unparseable value is
                               itself a violation (the less_than rule);
                               detail = the offending lexical form
    ("min_length", pred, n) / ("max_length", pred, n)
                             — the lexical form of every value of pred
                               has len >= n / <= n (sh:minLength /
                               sh:maxLength); detail = the value
    ("qualified", pred, inner, min_n, max_n)
                             — sh:qualifiedValueShape with
                               sh:qualifiedMinCount/MaxCount: the number
                               of pred-values CONFORMING to the inner
                               shape must lie in [min_n, max_n]
                               (max_n=None → unbounded).  inner is a
                               value-level check tuple: ("in_set",
                               values), ("pattern", regex) or
                               ("datatype", dt).  detail = the
                               conforming count; one violation per
                               out-of-range target node
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_KINDS = {"min_count", "max_count", "in_set", "pattern", "class_ref",
          "datatype", "less_than", "has_value", "equals", "disjoint",
          "node_kind", "closed", "qualified",
          "min_inclusive", "max_inclusive",
          "min_exclusive", "max_exclusive",
          "min_length", "max_length"}

_RANGE_KINDS = {"min_inclusive", "max_inclusive",
                "min_exclusive", "max_exclusive"}

_QUALIFIED_INNER = {"in_set", "pattern", "datatype"}

# the engine's node convention: "prefix:rest" strings are IRI-like
# node ids, everything else is a literal
_IRI_RX = re.compile(r"[A-Za-z_][A-Za-z0-9_.-]*:\S+")

_DATATYPE_RX = {
    "integer": r"[+-]?\d+",
    "decimal": r"[+-]?\d+(\.\d+)?",
    "date": r"\d{4}-\d{2}-\d{2}",
}


@dataclass
class Shape:
    """One node shape: `target_class` picks the nodes (via their
    (n, type_pred, target_class) triple), `constraints` the checks."""
    name: str
    target_class: str
    constraints: list = field(default_factory=list)

    def validate_spec(self):
        for c in self.constraints:
            if c[0] not in _KINDS:
                raise ValueError(f"unknown constraint kind {c[0]!r}")
            if c[0] in ("min_count", "max_count") and int(c[2]) < 0:
                raise ValueError(f"{c[0]} must be >= 0")
            if c[0] == "datatype" and c[2] not in _DATATYPE_RX:
                raise ValueError(
                    f"unknown datatype {c[2]!r}; known: "
                    f"{sorted(_DATATYPE_RX)}")
            if c[0] == "node_kind" and c[2] not in ("iri", "literal"):
                raise ValueError(
                    f"node_kind must be 'iri' or 'literal', got {c[2]!r}")
            if c[0] == "closed" and not isinstance(
                    c[2], (list, tuple, set, frozenset)):
                raise ValueError(
                    "closed takes the collection of allowed predicates")
            if c[0] in _RANGE_KINDS:
                try:
                    float(c[2])
                except (TypeError, ValueError):
                    raise ValueError(
                        f"{c[0]} bound must be numeric, got {c[2]!r}")
            if c[0] in ("min_length", "max_length") and int(c[2]) < 0:
                raise ValueError(f"{c[0]} must be >= 0")
            if c[0] == "qualified":
                if len(c) != 5:
                    raise ValueError(
                        "qualified takes (pred, inner, min_n, max_n)")
                inner, min_n, max_n = c[2], c[3], c[4]
                if (not isinstance(inner, tuple)
                        or inner[0] not in _QUALIFIED_INNER):
                    raise ValueError(
                        f"qualified inner shape must be one of "
                        f"{sorted(_QUALIFIED_INNER)}, got {inner!r}")
                if inner[0] == "datatype" and inner[1] not in _DATATYPE_RX:
                    raise ValueError(f"unknown datatype {inner[1]!r}")
                if min_n is None and max_n is None:
                    raise ValueError(
                        "qualified needs min_n and/or max_n")
                if min_n is not None and int(min_n) < 0:
                    raise ValueError("qualifiedMinCount must be >= 0")


def _empty_violations() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=object) for c in
                         ("node", "shape", "constraint", "pred",
                          "detail")})


def _validate_frame(g: pd.DataFrame, shape_specs: list,
                    type_pred: str, refs: dict) -> pd.DataFrame:
    """The whole constraint matrix over ONE co-located triple
    frame — shared by the distributed bucket kernel
    (validate_shapes) and the incremental snapshot validator
    (state/snapshot_shacl.py)."""
    out = []

    types = g[g["p"] == type_pred]
    for name, target, constraints in shape_specs:
        targets = types.loc[types["o"] == target, "s"].unique()
        if len(targets) == 0:
            continue
        tset = pd.Index(targets)
        mine = g[g["s"].isin(tset)]
        for c in constraints:
            kind, pred = c[0], c[1]
            rows = mine[mine["p"] == pred]
            if kind in ("min_count", "max_count"):
                n = int(c[2])
                counts = (rows.groupby("s").size()
                          .reindex(tset, fill_value=0))
                bad = (counts[counts < n] if kind == "min_count"
                       else counts[counts > n])
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad.index.astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred,
                        "detail": bad.to_numpy().astype(str)}))
            elif kind == "in_set":
                allowed = set(map(str, c[2]))
                bad = rows[~rows["o"].isin(allowed)]
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad["s"].astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred, "detail": bad["o"]}))
            elif kind == "pattern":
                rx = re.compile(c[2])
                ok = rows["o"].map(
                    lambda v: bool(rx.fullmatch(str(v))))
                bad = rows[~ok] if len(rows) else rows
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad["s"].astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred, "detail": bad["o"]}))
            elif kind == "class_ref":
                members = refs.get(str(c[2]), set())
                bad = rows[~rows["o"].isin(members)]
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad["s"].astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred, "detail": bad["o"]}))
            elif kind == "closed":
                # sh:closed: a target node may only carry the
                # declared predicates (the type edge is implicitly
                # allowed — it is the targeting mechanism)
                allowed = set(map(str, c[2])) | {type_pred}
                bad = mine[~mine["p"].isin(allowed)]
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad["s"].astype(str),
                        "shape": name, "constraint": kind,
                        "pred": bad["p"].astype(str),
                        "detail": bad["o"]}))
            elif kind == "datatype":
                rx = re.compile(_DATATYPE_RX[c[2]])
                ok = rows["o"].astype(str).str.fullmatch(rx)
                bad = rows[~ok.fillna(False)] if len(rows) else rows
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad["s"].astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred, "detail": bad["o"]}))
            elif kind == "has_value":
                want = str(c[2])
                have = set(rows.loc[rows["o"] == want, "s"])
                missing = tset[~tset.isin(have)]
                if len(missing):
                    out.append(pd.DataFrame({
                        "node": missing.astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred, "detail": want}))
            elif kind in ("equals", "disjoint"):
                other = mine[mine["p"] == str(c[2])]
                a = rows[["s", "o"]].drop_duplicates()
                b = other[["s", "o"]].drop_duplicates()
                if kind == "disjoint":
                    bad = a.merge(b, on=["s", "o"])
                else:
                    m = a.merge(b, on=["s", "o"], how="outer",
                                indicator=True)
                    bad = m[m["_merge"] != "both"]
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad["s"].astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred, "detail": bad["o"]}))
            elif kind == "node_kind":
                is_iri = rows["o"].astype(str).str.fullmatch(
                    _IRI_RX)
                bad = rows[is_iri.fillna(False)
                           != (c[2] == "iri")] if len(rows) else rows
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad["s"].astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred, "detail": bad["o"]}))
            elif kind == "qualified":
                inner, min_n, max_n = c[2], c[3], c[4]
                vals = rows["o"].astype(str)
                if inner[0] == "in_set":
                    ok = vals.isin(set(map(str, inner[1])))
                elif inner[0] == "pattern":
                    ok = vals.str.fullmatch(re.compile(inner[1]))
                else:  # datatype
                    ok = vals.str.fullmatch(
                        re.compile(_DATATYPE_RX[inner[1]]))
                # conforming-value count per TARGET node (targets with
                # zero pred triples count 0 — qualifiedMinCount applies
                # to them too, unlike a bare value check)
                counts = (rows.loc[ok.fillna(False).to_numpy(), "s"]
                          .value_counts().reindex(tset, fill_value=0))
                bad = counts[(counts < int(min_n))] if max_n is None \
                    else counts[(counts < int(min_n if min_n is not None
                                              else 0))
                                | (counts > int(max_n))]
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad.index.astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred,
                        "detail": bad.to_numpy().astype(str)}))
            elif kind in _RANGE_KINDS:
                if not len(rows):
                    continue
                v = pd.to_numeric(rows["o"], errors="coerce")
                bound = float(c[2])
                if kind == "min_inclusive":
                    ok = v >= bound
                elif kind == "max_inclusive":
                    ok = v <= bound
                elif kind == "min_exclusive":
                    ok = v > bound
                else:
                    ok = v < bound
                bad = rows[~ok.fillna(False)]   # NaN (unparseable) fails
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad["s"].astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred, "detail": bad["o"]}))
            elif kind in ("min_length", "max_length"):
                if not len(rows):
                    continue
                n = int(c[2])
                ln = rows["o"].astype(str).str.len()
                ok = ln >= n if kind == "min_length" else ln <= n
                bad = rows[~ok]
                if len(bad):
                    out.append(pd.DataFrame({
                        "node": bad["s"].astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred, "detail": bad["o"]}))
            elif kind == "less_than":
                other = mine[mine["p"] == str(c[2])]
                if not (len(rows) and len(other)):
                    continue
                a = rows.assign(
                    _v=pd.to_numeric(rows["o"], errors="coerce"))
                b = other.assign(
                    _v=pd.to_numeric(other["o"], errors="coerce"))
                for side in (a, b):
                    nn = side[side["_v"].isna()]
                    if len(nn):
                        out.append(pd.DataFrame({
                            "node": nn["s"].astype(str),
                            "shape": name, "constraint": kind,
                            "pred": pred, "detail": nn["o"]}))
                # max(pred) must be < min(other) per node; detail is
                # the offending max value's ORIGINAL lexical form
                amax = (a.dropna(subset=["_v"])
                        .sort_values(["s", "_v"], kind="stable")
                        .groupby("s").last())
                bmin = (b.dropna(subset=["_v"])
                        .sort_values(["s", "_v"], kind="stable")
                        .groupby("s").first())
                both = amax.join(bmin, how="inner",
                                 lsuffix="_a", rsuffix="_b")
                badlt = both[both["_v_a"] >= both["_v_b"]]
                if len(badlt):
                    out.append(pd.DataFrame({
                        "node": badlt.index.astype(str),
                        "shape": name, "constraint": kind,
                        "pred": pred,
                        "detail": badlt["o_a"].astype(str)}))
    if not out:
        return _empty_violations()
    res = pd.concat(out, ignore_index=True).drop_duplicates()
    for col in res.columns:
        res[col] = res[col].astype(object)
    return res


def validate_shapes(
    triples: ray.data.Dataset,
    shapes: list[Shape],
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    type_pred: str = "type",
    n_buckets: int = 32,
    class_ref_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """Validate `shapes` against the store; returns the violations
    dataset with columns (node, shape, constraint, pred, detail) — all
    strings, `detail` carrying the offending count/value.  Conforming
    nodes emit nothing (at 100 TB the violation set is the small
    output; a conformance report is `targets - violations`)."""
    for sh in shapes:
        sh.validate_spec()

    # class_ref dimension sides: collect each referenced class's node
    # set ONCE, broadcast via ray.put (threshold-enforced)
    ref_classes = sorted({c[2] for sh in shapes
                          for c in sh.constraints if c[0] == "class_ref"})
    ref_sets = {}
    for cls in ref_classes:
        mem = triples.map_batches(
            lambda b, _c=cls: b.filter(
                pa.compute.and_(
                    pa.compute.equal(b.column(p_col), type_pred),
                    pa.compute.equal(
                        b.column(o_col).cast(pa.string()), _c))),
            batch_format="pyarrow").select_columns([s_col])
        vals = mem.to_pandas()[s_col].astype(str).unique()
        if len(vals) > class_ref_threshold:
            raise ValueError(
                f"class_ref {cls!r} has {len(vals)} members > "
                f"class_ref_threshold={class_ref_threshold}; shuffle "
                "semi-join variant needed at this scale")
        ref_sets[cls] = set(vals)
    ref_handle = ray.put(ref_sets) if ref_sets else None

    shape_specs = [(sh.name, sh.target_class, list(sh.constraints))
                   for sh in shapes]

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": batch.column(s_col).cast(pa.string()).to_pandas(),
            "p": batch.column(p_col).cast(pa.string()).to_pandas(),
            "o": batch.column(o_col).cast(pa.string()).to_pandas(),
        })
        df["_bucket"] = df["s"].map(
            lambda k: zlib.crc32(k.encode()) % n_buckets).astype("int32")
        return df

    def check_bucket(g: pd.DataFrame) -> pd.DataFrame:
        refs = ray.get(ref_handle) if ref_handle is not None else {}
        return _validate_frame(g, shape_specs, type_pred, refs)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return check_bucket(g.drop(columns=["_bucket"]))

    return (triples.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(run, batch_format="pandas"))


def induce_shapes(
    store: ray.data.Dataset,
    type_pred: str = "a",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """SHAPE INDUCTION — the inverse of validate_shapes: mine the
    implicit schema from the data (the KG-construction step that turns
    a fresh triple dump into sh:minCount/maxCount/datatype candidate
    constraints).  Per (class, predicate): subjects carrying the
    predicate, triple count, per-subject min/max cardinality (subjects
    of the class WITHOUT the predicate count as min 0), and the
    inferred value datatype by lexical priority integer > decimal >
    date > iri > string ('iri' = the engine's prefix:rest node
    convention; a class/pred whose values mix kinds lands on the
    weakest member).

    Shape: crc32(subject) exchange co-locates each subject's type and
    data triples (vectorized per-bucket fold to (class, pred)
    partials + per-class subject-count partials), then ONE small
    (class, pred) exchange folds min/max/sums and AND-folds the
    datatype flags.  Output: (cls, pred, n_subjects, n_triples,
    min_count, max_count, datatype), ints int64."""
    _int_rx = re.compile(_DATATYPE_RX["integer"])
    _dec_rx = re.compile(_DATATYPE_RX["decimal"])
    _date_rx = re.compile(_DATATYPE_RX["date"])

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": batch.column(s_col).cast(pa.string()).to_pandas(),
            "p": batch.column(p_col).cast(pa.string()).to_pandas(),
            "o": batch.column(o_col).cast(pa.string()).to_pandas()})
        df["_bucket"] = df["s"].map(
            lambda k: zlib.crc32(k.encode()) % n_buckets).astype("int32")
        return df

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        types = (g[g["p"] == type_pred][["s", "o"]]
                 .rename(columns={"o": "cls"}).drop_duplicates())
        if not len(types):
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in [
                ("cls", object), ("pred", object), ("kind", "int64"),
                ("n_subj", "int64"), ("n_tr", "int64"),
                ("mn", "int64"), ("mx", "int64"),
                ("all_int", "int64"), ("all_dec", "int64"),
                ("all_date", "int64"), ("all_iri", "int64"),
                ("_bucket", "int32")]})
        data = g[g["p"] != type_pred]
        m = types.merge(data, on="s")
        parts = []
        if len(m):
            per_subj = (m.groupby(["cls", "p", "s"], sort=False)
                        .size().rename("n").reset_index())
            agg = per_subj.groupby(["cls", "p"], sort=False).agg(
                n_subj=("s", "nunique"), n_tr=("n", "sum"),
                mn=("n", "min"), mx=("n", "max")).reset_index()
            vals = m.copy()
            vals["is_int"] = vals["o"].map(
                lambda v: bool(_int_rx.fullmatch(v)))
            vals["is_dec"] = vals["o"].map(
                lambda v: bool(_dec_rx.fullmatch(v)))
            vals["is_date"] = vals["o"].map(
                lambda v: bool(_date_rx.fullmatch(v)))
            vals["is_iri"] = vals["o"].map(
                lambda v: bool(_IRI_RX.fullmatch(v)))
            dt = vals.groupby(["cls", "p"], sort=False)[
                ["is_int", "is_dec", "is_date", "is_iri"]].all()
            agg = agg.merge(dt.reset_index(), on=["cls", "p"])
            agg = agg.rename(columns={
                "p": "pred", "is_int": "all_int", "is_dec": "all_dec",
                "is_date": "all_date", "is_iri": "all_iri"})
            for c in ("all_int", "all_dec", "all_date", "all_iri"):
                agg[c] = agg[c].astype("int64")
            agg["kind"] = np.int64(0)
            parts.append(agg)
        # per-class subject totals (kind 1) — needed for min_count 0
        ctot = (types.groupby("cls", sort=False)["s"].nunique()
                .reset_index(name="n_subj"))
        ctot["pred"] = ""
        ctot["kind"] = np.int64(1)
        for c in ("n_tr", "mn", "mx", "all_int", "all_dec",
                  "all_date", "all_iri"):
            ctot[c] = np.int64(0)
        parts.append(ctot)
        out = pd.concat(parts, ignore_index=True)
        out["_bucket"] = out["cls"].map(
            lambda k: zlib.crc32(k.encode()) % n_buckets).astype("int32")
        cols = ["cls", "pred", "kind", "n_subj", "n_tr", "mn", "mx",
                "all_int", "all_dec", "all_date", "all_iri", "_bucket"]
        return out[cols]

    def final_fold(g: pd.DataFrame) -> pd.DataFrame:
        totals = (g[g["kind"] == 1].groupby("cls", sort=False)["n_subj"]
                  .sum())
        d = g[g["kind"] == 0]
        if not len(d):
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in [
                ("cls", object), ("pred", object),
                ("n_subjects", "int64"), ("n_triples", "int64"),
                ("min_count", "int64"), ("max_count", "int64"),
                ("datatype", object)]})
        agg = d.groupby(["cls", "pred"], sort=False).agg(
            n_subjects=("n_subj", "sum"), n_triples=("n_tr", "sum"),
            mn=("mn", "min"), mx=("mx", "max"),
            all_int=("all_int", "min"), all_dec=("all_dec", "min"),
            all_date=("all_date", "min"), all_iri=("all_iri", "min")
        ).reset_index()
        cls_total = agg["cls"].map(totals).astype("int64")
        agg["min_count"] = np.where(
            agg["n_subjects"] < cls_total, 0, agg["mn"]).astype("int64")

        def dtype_of(r) -> str:
            if r["all_int"]:
                return "integer"
            if r["all_dec"]:
                return "decimal"
            if r["all_date"]:
                return "date"
            if r["all_iri"]:
                return "iri"
            return "string"

        agg["datatype"] = agg.apply(dtype_of, axis=1)
        out = agg.rename(columns={"mx": "max_count"})
        for c in ("n_subjects", "n_triples", "min_count", "max_count"):
            out[c] = out[c].astype("int64")
        return out[["cls", "pred", "n_subjects", "n_triples",
                    "min_count", "max_count", "datatype"]]

    return (store.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(bucket_fold, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(final_fold, batch_format="pandas"))

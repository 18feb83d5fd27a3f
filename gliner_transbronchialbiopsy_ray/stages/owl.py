"""OWL 2 RL entailment rules beyond the ones living in stages/bgp.py
(prp-trp = bgp.entail_transitive; owl:inverseOf / rdfs7 can also run as
pure variable-head rules over bgp.apply_rule — q161 does, while
entail_inverse below is the dedicated streaming operator).  All
operators here are DECLARATION-DRIVEN the same way: the ontology is
triples in the store
itself, the declaration set is collected to the driver (ontology
vocabularies are bounded — a schema property, not a corpus property),
and the data pass streams.

- `entail_property_chain` — owl:propertyChainAxiom (OWL 2 RL prp-spo2):
  a declaration (head, chain_pred, "p1/p2/...") asserts that the
  composition p1 then p2 ... entails head.  The chain body is the
  SPARQL sequence-path lexical form (elements may carry ^ / + / alt),
  an honest simplification of the RDF-list encoding — the reference
  vocabulary is bounded either way.  Each axiom is ONE `match_bgp`
  sequence-path evaluation (native hash joins per step), fanned out to
  (s, head, o) triples.
- `entail_symmetric` — owl:SymmetricProperty (prp-symp): declared
  predicates get their (o, p, s) mirror emitted in a single streaming
  pass — no shuffle at all.
- `entail_subproperty` — rdfs:subPropertyOf with hierarchy closure
  (rdfs5 on the driver over the bounded property hierarchy, then rdfs7
  as one broadcast flat-map): each data triple (s, p, o) emits
  (s, q, o) for every strict superproperty q of p.  Streaming, no
  shuffle; the p->supers map ships once via the closure dict.
- `entail_inverse_functional` — owl:InverseFunctionalProperty
  (prp-ifp): subjects sharing a declared-IFP (p, o) witness denote the
  same entity.  Emits STAR sameAs edges (group-min subject -> every
  other subject) instead of the pairwise clique — linear in group
  size; the equivalence classes are identical after
  `sameas.apply_sameas`'s connected-component closure.
- `entail_class_expressions` — owl:intersectionOf / owl:unionOf
  (cls-int1/int2/uni): member lists unrolled from the store's RDF
  collections, rules shipped as merge frames; ONE coarse exchange for
  the all-members check, row-local flat-maps for the rest.
- `has_key_sameas` — owl:hasKey (prp-key): members of a class sharing
  values on EVERY property of a declared key tuple denote the same
  entity.  Per axiom one `match_bgp` binds each member with its
  key-value tuple; tuples group on ONE coarse-bucket exchange and each
  group emits STAR sameAs edges to its min member.
- `functional_violations` — owl:FunctionalProperty conformance check
  (prp-fp over literal-valued data properties, where deriving
  owl:sameAs between literals is nonsense and the correct output is a
  VIOLATION report): subjects holding >1 distinct object for a
  declared functional predicate, with the distinct-object count.

Each returns NEW triples only (never the input), in store layout —
callers union with the store and distinct-fold (or hand the union to
`bgp.saturate` when rules interact recursively)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _empty_store(s_col: str, p_col: str, o_col: str) -> ray.data.Dataset:
    # typed empty store-layout table (an empty pandas frame drops its
    # schema through Ray)
    return ray.data.from_arrow(pa.table({
        s_col: pa.array([], type=pa.string()),
        p_col: pa.array([], type=pa.string()),
        o_col: pa.array([], type=pa.string())}))


def _declarations(store: ray.data.Dataset, p_col: str, pred: str,
                  s_col: str, o_col: str) -> list[tuple[str, str]]:
    """(s, o) pairs of every (s, pred, o) triple, driver-side sorted —
    the bounded ontology collect shared by all three rules."""
    decl = store.map_batches(
        lambda b: b.filter(
            pc.equal(b.column(p_col).cast(pa.string()), pred)
        ).select([s_col, o_col]),
        batch_format="pyarrow").take_all()
    return sorted({(str(r[s_col]), str(r[o_col])) for r in decl})


def entail_property_chain(
    store: ray.data.Dataset,
    chain_pred: str = "propertyChainAxiom",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    cast_nodes: bool = False,
    num_partitions: int | None = None,
    max_hops: int = 8,
) -> ray.data.Dataset:
    """owl:propertyChainAxiom entailment (prp-spo2).  Declarations are
    (head, chain_pred, "p1/p2/...") triples; each asserts
    head(x, z) <- p1(x, y1) ^ p2(y1, y2) ^ ... — evaluated as ONE
    sequence-path `match_bgp` per axiom."""
    from .bgp import match_bgp

    axioms = _declarations(store, p_col, chain_pred, s_col, o_col)
    out = None
    for head, chain in axioms:
        if "/" not in chain:
            raise ValueError(
                f"chain axiom for {head!r} must compose >= 2 "
                f"properties, got {chain!r}")
        pairs = match_bgp(store, [("?x", chain, "?z")],
                          s_col=s_col, p_col=p_col, o_col=o_col,
                          cast_nodes=cast_nodes, max_hops=max_hops,
                          num_partitions=num_partitions)

        def to_triples(b: pa.Table, _h=head) -> pd.DataFrame:
            df = b.to_pandas()
            return pd.DataFrame({s_col: df["x"], p_col: _h,
                                 o_col: df["z"]})

        part = pairs.map_batches(to_triples, batch_format="pyarrow")
        out = part if out is None else out.union(part)
    return out if out is not None else _empty_store(s_col, p_col, o_col)


def entail_symmetric(
    store: ray.data.Dataset,
    type_pred: str = "a",
    type_obj: str = "SymmetricProperty",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> ray.data.Dataset:
    """owl:SymmetricProperty entailment (prp-symp): for every predicate
    q declared symmetric by a (q, type_pred, type_obj) triple, each
    data triple (s, q, o) entails (o, q, s).  One streaming filtered
    swap — the declared set rides into the task as a plain frozenset."""
    preds = frozenset(s for s, o in _declarations(
        store, p_col, type_pred, s_col, o_col) if o == type_obj)
    if not preds:
        return _empty_store(s_col, p_col, o_col)

    def swap(b: pa.Table, _preds=preds) -> pa.Table:
        t = b.filter(pc.is_in(b.column(p_col).cast(pa.string()),
                              value_set=pa.array(sorted(_preds))))
        return pa.table({s_col: t.column(o_col), p_col: t.column(p_col),
                         o_col: t.column(s_col)})

    return store.map_batches(swap, batch_format="pyarrow")


def entail_inverse(
    store: ray.data.Dataset,
    inverse_pred: str = "inverseOf",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> ray.data.Dataset:
    """owl:inverseOf entailment (prp-inv1/prp-inv2): a declaration
    (p1, inverse_pred, p2) makes every data triple (s, p1, o) entail
    (o, p2, s) and every (s, p2, o) entail (o, p1, s).  Declarations
    are a bounded ontology collect; the store streams through ONE
    swap-and-rename pass with the p1<->p2 map riding in as a dict —
    no shuffle.  Returns only the entailed triples (union with the
    store and dedup downstream, matching entail_symmetric's
    contract)."""
    decls = _declarations(store, p_col, inverse_pred, s_col, o_col)
    swap_to: dict[str, str] = {}
    for p1, p2 in decls:
        swap_to[p1] = p2
        swap_to[p2] = p1
    if not swap_to:
        return _empty_store(s_col, p_col, o_col)

    def swap(b: pa.Table, _m=swap_to) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df[p_col].astype(str).isin(_m)]
        return pd.DataFrame({
            s_col: df[o_col].astype(str).to_numpy(),
            p_col: df[p_col].astype(str).map(_m).to_numpy(),
            o_col: df[s_col].astype(str).to_numpy()})

    return store.map_batches(swap, batch_format="pyarrow")


def entail_subproperty(
    store: ray.data.Dataset,
    sub_pred: str = "subPropertyOf",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> ray.data.Dataset:
    """rdfs:subPropertyOf entailment: the (p, sub_pred, q) hierarchy is
    closed transitively ON THE DRIVER (rdfs5 — the hierarchy is an
    ontology object, bounded), then rdfs7 streams: every data triple
    (s, p, o) emits (s, q, o) for each strict superproperty q.  Cycles
    in the hierarchy are tolerated (p never emits itself)."""
    edges = _declarations(store, p_col, sub_pred, s_col, o_col)
    supers: dict[str, set[str]] = {}
    for p, q in edges:
        supers.setdefault(p, set()).add(q)
    # driver-side transitive closure over the bounded hierarchy
    changed = True
    while changed:
        changed = False
        for p, qs in supers.items():
            add = set()
            for q in qs:
                add |= supers.get(q, set())
            add -= qs | {p}
            if add:
                qs |= add
                changed = True
    closure = {p: sorted(qs - {p}) for p, qs in supers.items()
               if qs - {p}}
    if not closure:
        return _empty_store(s_col, p_col, o_col)

    def fan(b: pa.Table, _cl=closure) -> pd.DataFrame:
        df = b.to_pandas()
        hit = df[df[p_col].astype(str).isin(_cl)]
        if not hit.empty:
            reps = hit[p_col].astype(str).map(lambda p: len(_cl[p]))
            out = hit.loc[hit.index.repeat(reps)].copy()
            out[p_col] = [q for p in hit[p_col].astype(str)
                          for q in _cl[p]]
        else:
            out = hit
        return out[[s_col, p_col, o_col]]

    return store.map_batches(fan, batch_format="pyarrow")


def _bucketed_group_kernel(filtered: ray.data.Dataset, tag_cols: list,
                           kernel, n_buckets: int):
    """Coarse-bucket exchange shared by the two functional-property
    rules: ONE groupby on a 32-way crc32 bucket of `tag_cols` (never on
    the raw — skewed — key), vectorized pandas kernel per bucket."""
    import zlib

    def tag(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        key = df[tag_cols[0]].astype(str)
        for c in tag_cols[1:]:
            key = key + "\x00" + df[c].astype(str)
        df["_bucket"] = np.fromiter(
            (zlib.crc32(k.encode()) % n_buckets for k in key),
            dtype="int32", count=len(df))
        return df

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return kernel(g.drop(columns=["_bucket"]))

    return (filtered.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket").map_groups(run, batch_format="pandas"))


def entail_inverse_functional(
    store: ray.data.Dataset,
    type_pred: str = "a",
    type_obj: str = "InverseFunctionalProperty",
    sameas_pred: str = "sameAs",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """owl:InverseFunctionalProperty entailment (prp-ifp): for every
    predicate q declared IFP by a (q, type_pred, type_obj) triple, data
    triples (s1, q, v) and (s2, q, v) entail s1 owl:sameAs s2.  Emits
    the STAR form — (min subject, sameas_pred, other subject) per
    (q, v) witness group — linear in group size where the full clique
    is quadratic; `sameas.apply_sameas` closes the equivalence classes
    identically.  ONE coarse-bucket exchange keyed on crc32(p, o) (a
    hot shared value never lands a whole group on one reducer alone —
    buckets mix groups), plus the final (s, p, o) distinct fold that
    collapses multi-witness duplicates."""
    preds = frozenset(s for s, o in _declarations(
        store, p_col, type_pred, s_col, o_col) if o == type_obj)
    if not preds:
        return _empty_store(s_col, p_col, o_col)

    def keep(b: pa.Table, _preds=preds) -> pa.Table:
        t = b.filter(pc.is_in(b.column(p_col).cast(pa.string()),
                              value_set=pa.array(sorted(_preds))))
        return pa.table({s_col: t.column(s_col).cast(pa.string()),
                         p_col: t.column(p_col).cast(pa.string()),
                         o_col: t.column(o_col).cast(pa.string())})

    def stars(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        canon = g.groupby([p_col, o_col])[s_col].transform("min")
        dup = g[g[s_col] != canon]
        return pd.DataFrame({
            s_col: canon[dup.index].astype(str),
            p_col: sameas_pred,
            o_col: dup[s_col].astype(str)})

    out = _bucketed_group_kernel(
        store.map_batches(keep, batch_format="pyarrow"),
        [p_col, o_col], stars, n_buckets)
    return (out.groupby([s_col, p_col, o_col]).count()
            .drop_columns(["count()"]))


def has_key_sameas(
    store: ray.data.Dataset,
    key_pred: str = "hasKey",
    type_pred: str = "a",
    sameas_pred: str = "sameAs",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    cast_nodes: bool = False,
    n_buckets: int = 32,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """owl:hasKey entailment (prp-key): an axiom triple
    (c, key_pred, "p1/p2/...") asserts that members of class c sharing
    values on EVERY listed property are owl:sameAs (the key-list
    lexical form matches entail_property_chain's honest simplification
    of the RDF-list encoding).  Per axiom ONE `match_bgp` binds the
    member and its key tuple — a multi-valued key property contributes
    one tuple per value combination, which IS the formal rule's
    any-shared-tuple semantics.  Tuples group on one coarse-bucket
    exchange keyed on crc32(value vector) and each group emits STAR
    edges (min member -> other members; members compare as strings) —
    linear where the clique is quadratic; `sameas.apply_sameas` closes
    the equivalence classes identically.  Final distinct fold collapses
    multi-witness duplicates across axioms."""
    from .bgp import match_bgp

    axioms = _declarations(store, p_col, key_pred, s_col, o_col)
    out = None
    for cls, keys in axioms:
        props = [q for q in str(keys).split("/") if q]
        if not props:
            raise ValueError(
                f"hasKey axiom for {cls!r} names no properties")
        vvars = [f"v{i}" for i in range(len(props))]
        pattern = [("?x", type_pred, cls)] + [
            ("?x", q, f"?{v}") for q, v in zip(props, vvars)]
        bindings = match_bgp(store, pattern, s_col=s_col, p_col=p_col,
                             o_col=o_col, cast_nodes=cast_nodes,
                             num_partitions=num_partitions)

        def stars(g: pd.DataFrame, _v=tuple(vvars)) -> pd.DataFrame:
            g = g.assign(x=g["x"].astype(str))
            canon = g.groupby(list(_v))["x"].transform("min")
            dup = g[g["x"] != canon]
            return pd.DataFrame({
                s_col: canon[dup.index].astype(str),
                p_col: sameas_pred,
                o_col: dup["x"].astype(str)})

        part = _bucketed_group_kernel(bindings, vvars, stars, n_buckets)
        out = part if out is None else out.union(part)
    if out is None:
        return _empty_store(s_col, p_col, o_col)
    return (out.groupby([s_col, p_col, o_col]).count()
            .drop_columns(["count()"]))


def functional_violations(
    store: ray.data.Dataset,
    type_pred: str = "a",
    type_obj: str = "FunctionalProperty",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """owl:FunctionalProperty conformance report (the prp-fp shape over
    data properties): for every predicate q declared functional, each
    subject must hold at most ONE distinct object — violators come back
    as (s_col, p_col, 'n_objects') rows with the distinct-object count.
    ONE coarse-bucket exchange keyed on crc32(s, p); the in-bucket
    kernel dedupes and sizes groups vectorized."""
    preds = frozenset(s for s, o in _declarations(
        store, p_col, type_pred, s_col, o_col) if o == type_obj)
    if not preds:
        return ray.data.from_arrow(pa.table({
            s_col: pa.array([], type=pa.string()),
            p_col: pa.array([], type=pa.string()),
            "n_objects": pa.array([], type=pa.int64())}))

    def keep(b: pa.Table, _preds=preds) -> pa.Table:
        t = b.filter(pc.is_in(b.column(p_col).cast(pa.string()),
                              value_set=pa.array(sorted(_preds))))
        return pa.table({s_col: t.column(s_col).cast(pa.string()),
                         p_col: t.column(p_col).cast(pa.string()),
                         o_col: t.column(o_col).cast(pa.string())})

    def count_objects(g: pd.DataFrame) -> pd.DataFrame:
        n = (g.drop_duplicates()
             .groupby([s_col, p_col], sort=False, as_index=False)
             .size().rename(columns={"size": "n_objects"}))
        n = n[n["n_objects"] > 1]
        return pd.DataFrame({
            s_col: n[s_col].astype(str), p_col: n[p_col].astype(str),
            "n_objects": n["n_objects"].astype("int64")})

    return _bucketed_group_kernel(
        store.map_batches(keep, batch_format="pyarrow"),
        [s_col, p_col], count_objects, n_buckets)


def property_axiom_violations(
    store: ray.data.Dataset,
    type_pred: str = "a",
    disjoint_pred: str = "propertyDisjointWith",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """OWL 2 RL property-axiom conformance report in one operator:

    - prp-asyp: p typed owl:AsymmetricProperty — (x p y) AND (y p x)
      is inconsistent (including x == y); both directed triples come
      back flagged.
    - prp-irp: p typed owl:IrreflexiveProperty — (x p x) is
      inconsistent.  Purely row-local (no exchange).
    - prp-pdw: (p1, propertyDisjointWith, p2) — (x p1 y) AND (x p2 y)
      is inconsistent; both triples come back flagged.

    Output: distinct (s, p, o, kind) violation rows.  Declarations are
    a bounded driver collect (ontology-sized); the asymmetric check
    exchanges on a crc32 bucket of the UNORDERED endpoint pair so both
    directions co-locate, the disjoint check on crc32(s, o) so all
    predicates of a pair co-locate — coarse buckets, never raw keys.
    Triples are treated as a set (duplicates dedup in-bucket)."""
    import zlib

    decls = _declarations(store, p_col, type_pred, s_col, o_col)
    asym = frozenset(s for s, o in decls if o == "AsymmetricProperty")
    irr = frozenset(s for s, o in decls if o == "IrreflexiveProperty")
    disj_pairs = _declarations(store, p_col, disjoint_pred, s_col, o_col)
    disj_preds = frozenset(p for pair in disj_pairs for p in pair)
    disj_set = frozenset(disj_pairs) | frozenset(
        (b, a) for a, b in disj_pairs)

    def empty() -> pd.DataFrame:
        return pd.DataFrame({
            s_col: pd.Series([], dtype=str),
            p_col: pd.Series([], dtype=str),
            o_col: pd.Series([], dtype=str),
            "kind": pd.Series([], dtype=str)})

    parts: list[ray.data.Dataset] = []

    if irr:
        def irr_rows(b: pa.Table, _irr=irr) -> pd.DataFrame:
            df = b.to_pandas()
            s = df[s_col].astype(str)
            p = df[p_col].astype(str)
            o = df[o_col].astype(str)
            m = p.isin(_irr) & (s == o)
            if not m.any():
                return empty()
            out = pd.DataFrame({s_col: s[m], p_col: p[m], o_col: o[m]})
            out["kind"] = "irreflexive"
            return out.drop_duplicates()

        parts.append(store.map_batches(irr_rows, batch_format="pyarrow"))

    if asym:
        def asym_tag(b: pa.Table, _a=asym) -> pd.DataFrame:
            df = b.to_pandas()
            df = df[df[p_col].astype(str).isin(_a)]
            if not len(df):
                return pd.DataFrame({
                    s_col: pd.Series([], dtype=str),
                    p_col: pd.Series([], dtype=str),
                    o_col: pd.Series([], dtype=str),
                    "_bucket": pd.Series([], dtype="int32")})
            s = df[s_col].astype(str)
            o = df[o_col].astype(str)
            p = df[p_col].astype(str)
            lo = np.minimum(s.to_numpy(), o.to_numpy())
            hi = np.maximum(s.to_numpy(), o.to_numpy())
            key = [f"{a}\x00{b_}\x00{c}"
                   for a, b_, c in zip(lo, hi, p.to_numpy())]
            return pd.DataFrame({
                s_col: s, p_col: p, o_col: o,
                "_bucket": np.fromiter(
                    (zlib.crc32(k.encode()) % n_buckets for k in key),
                    dtype="int32", count=len(df))})

        def asym_kernel(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns=["_bucket"]).drop_duplicates()
            have = set(zip(g[s_col], g[p_col], g[o_col]))
            m = [(o, p, s) in have
                 for s, p, o in zip(g[s_col], g[p_col], g[o_col])]
            out = g[np.fromiter(m, dtype=bool, count=len(g))].copy()
            if not len(out):
                return empty()
            out["kind"] = "asymmetric"
            return out

        parts.append(
            store.map_batches(asym_tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(asym_kernel, batch_format="pandas"))

    if disj_set:
        def disj_tag(b: pa.Table, _p=disj_preds) -> pd.DataFrame:
            df = b.to_pandas()
            df = df[df[p_col].astype(str).isin(_p)]
            if not len(df):
                return pd.DataFrame({
                    s_col: pd.Series([], dtype=str),
                    p_col: pd.Series([], dtype=str),
                    o_col: pd.Series([], dtype=str),
                    "_bucket": pd.Series([], dtype="int32")})
            s = df[s_col].astype(str)
            o = df[o_col].astype(str)
            key = (s + "\x00" + o).to_numpy()
            return pd.DataFrame({
                s_col: s, p_col: df[p_col].astype(str), o_col: o,
                "_bucket": np.fromiter(
                    (zlib.crc32(k.encode()) % n_buckets for k in key),
                    dtype="int32", count=len(df))})

        def disj_kernel(g: pd.DataFrame, _d=disj_set) -> pd.DataFrame:
            g = g.drop(columns=["_bucket"]).drop_duplicates()
            by_so: dict[tuple, set] = {}
            for s, p, o in zip(g[s_col], g[p_col], g[o_col]):
                by_so.setdefault((s, o), set()).add(p)
            m = [any((p, q) in _d for q in by_so[(s, o)])
                 for s, p, o in zip(g[s_col], g[p_col], g[o_col])]
            out = g[np.fromiter(m, dtype=bool, count=len(g))].copy()
            if not len(out):
                return empty()
            out["kind"] = "disjoint"
            return out

        parts.append(
            store.map_batches(disj_tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(disj_kernel, batch_format="pandas"))

    if not parts:
        return ray.data.from_arrow(pa.table({
            s_col: pa.array([], type=pa.string()),
            p_col: pa.array([], type=pa.string()),
            o_col: pa.array([], type=pa.string()),
            "kind": pa.array([], type=pa.string())}))
    ds = parts[0]
    for p_ in parts[1:]:
        ds = ds.union(p_)
    return ds


def entail_has_value(
    store: ray.data.Dataset,
    on_property_pred: str = "onProperty",
    has_value_pred: str = "hasValue",
    type_pred: str = "a",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> ray.data.Dataset:
    """owl:hasValue restriction classes (OWL 2 RL cls-hv1 + cls-hv2): a
    restriction r declared by (r, onProperty, p) + (r, hasValue, v)
    entails in BOTH directions:

        cls-hv1:  (u, p, v)     =>  (u, type_pred, r)
        cls-hv2:  (u, type_pred, r)  =>  (u, p, v)

    Declarations are a bounded ontology collect; both directions are
    one streaming pass with the declaration frame riding in as a
    per-batch pandas merge — no shuffle.  Returns only the entailed
    triples (may repeat across batches; union + distinct downstream,
    the entail_symmetric contract)."""
    on_p = dict(_declarations(store, p_col, on_property_pred,
                              s_col, o_col))
    has_v = dict(_declarations(store, p_col, has_value_pred,
                               s_col, o_col))
    restr = sorted(set(on_p) & set(has_v))
    if not restr:
        return _empty_store(s_col, p_col, o_col)
    decl = pd.DataFrame({
        "r": restr,
        "dp": [on_p[r] for r in restr],
        "dv": [has_v[r] for r in restr]})

    def emit(b: pa.Table, _d=decl) -> pd.DataFrame:
        df = b.to_pandas().astype(str)
        # cls-hv1: data triple matches (dp, dv) -> type assertion
        hv1 = df.merge(_d, left_on=[p_col, o_col],
                       right_on=["dp", "dv"])
        # cls-hv2: type assertion names a restriction -> data triple
        types = df[df[p_col] == type_pred]
        hv2 = types.merge(_d, left_on=o_col, right_on="r")
        return pd.concat([
            pd.DataFrame({s_col: hv1[s_col], p_col: type_pred,
                          o_col: hv1["r"]}),
            pd.DataFrame({s_col: hv2[s_col], p_col: hv2["dp"],
                          o_col: hv2["dv"]}),
        ], ignore_index=True).drop_duplicates()

    return store.map_batches(emit, batch_format="pyarrow")


def entail_some_values_from(
    store: ray.data.Dataset,
    on_property_pred: str = "onProperty",
    svf_pred: str = "someValuesFrom",
    type_pred: str = "a",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """owl:someValuesFrom restriction classes (OWL 2 RL cls-svf1): a
    restriction r declared by (r, onProperty, p) + (r, someValuesFrom, c)
    entails (u, type_pred, r) whenever (u, p, v) and (v, type_pred, c).

    Unlike hasValue this needs a DATA-side join (the v endpoint's type
    is instance data, not ontology), so: edge rows for declared
    predicates and type rows for declared classes — pruned at the map —
    co-locate on ONE crc32(v) coarse-bucket exchange and match
    vectorized in-bucket against the broadcast declaration frame.
    Output may repeat per witness v; distinct downstream."""
    import zlib

    on_p = dict(_declarations(store, p_col, on_property_pred,
                              s_col, o_col))
    svf = dict(_declarations(store, p_col, svf_pred, s_col, o_col))
    restr = sorted(set(on_p) & set(svf))
    if not restr:
        return _empty_store(s_col, p_col, o_col)
    decl = pd.DataFrame({
        "r": restr,
        "dp": [on_p[r] for r in restr],
        "dc": [svf[r] for r in restr]})
    preds = frozenset(decl["dp"])
    classes = frozenset(decl["dc"])

    def tag(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().astype(str)
        e = df[df[p_col].isin(preds)]
        t = df[(df[p_col] == type_pred) & (df[o_col].isin(classes))]
        rows = pd.concat([
            pd.DataFrame({"v": e[o_col], "u": e[s_col],
                          "pn": e[p_col], "cn": "",
                          "kind": np.int64(0)}),
            pd.DataFrame({"v": t[s_col], "u": "", "pn": "",
                          "cn": t[o_col], "kind": np.int64(1)}),
        ], ignore_index=True)
        rows["_bucket"] = rows["v"].map(
            lambda k: zlib.crc32(k.encode()) % n_buckets).astype("int32")
        return rows

    def match(g: pd.DataFrame, _d=decl) -> pd.DataFrame:
        e = g[g["kind"] == 0]
        t = g[g["kind"] == 1].drop_duplicates(["v", "cn"])
        if not (len(e) and len(t)):
            return pd.DataFrame({s_col: pd.Series(dtype=str),
                                 p_col: pd.Series(dtype=str),
                                 o_col: pd.Series(dtype=str)})
        m = e.merge(_d, left_on="pn", right_on="dp").merge(
            t[["v", "cn"]], left_on=["v", "dc"], right_on=["v", "cn"])
        out = pd.DataFrame({s_col: m["u"], p_col: type_pred,
                            o_col: m["r"]}).drop_duplicates()
        return out

    return (store.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(match, batch_format="pandas"))


def different_from_violations(
    store: ray.data.Dataset,
    same_pred: str = "sameAs",
    diff_pred: str = "differentFrom",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    max_iterations: int = 10,
    distributed: bool = False,
) -> ray.data.Dataset:
    """owl consistency check eq-diff1: an (x, differentFrom, y)
    assertion whose endpoints land in the same sameAs COMPONENT (the
    transitive/symmetric closure, not just a direct link) is a
    contradiction.  Returns one (a, b, canon) row per violated
    assertion, a < b canonical orientation.

    Shape: sameAs links -> stages/sameas.py canonical_map (driver
    closure by default — link sets are ER-gated; distributed fixpoint
    flag threads through), broadcast to ONE streaming pass over the
    differentFrom assertions (alias map covers aliased nodes only).
    differentFrom pairs never shuffle."""
    from .sameas import canonical_map

    links = store.map_batches(
        lambda b: (lambda t: pa.table({
            "a": t.column(s_col).cast(pa.string()),
            "b": t.column(o_col).cast(pa.string())}))(
            b.filter(pc.equal(b.column(p_col).cast(pa.string()),
                              same_pred))),
        batch_format="pyarrow")
    cmap_rows = canonical_map(links, "a", "b",
                              max_iterations=max_iterations,
                              distributed=distributed).to_pandas()
    cmap = dict(zip(cmap_rows["node"].astype(str),
                    cmap_rows["canon"].astype(str)))
    cref = ray.put(cmap)

    def check(b: pa.Table) -> pd.DataFrame:
        m = ray.get(cref)
        t = b.filter(pc.equal(b.column(p_col).cast(pa.string()),
                              diff_pred)).to_pandas().astype(str)
        if not len(t):
            return pd.DataFrame({"a": pd.Series(dtype=str),
                                 "b": pd.Series(dtype=str),
                                 "canon": pd.Series(dtype=str)})
        ca = t[s_col].map(lambda x: m.get(x, x))
        cb = t[o_col].map(lambda x: m.get(x, x))
        bad = t[(ca == cb).to_numpy()]
        if not len(bad):
            return pd.DataFrame({"a": pd.Series(dtype=str),
                                 "b": pd.Series(dtype=str),
                                 "canon": pd.Series(dtype=str)})
        lo = np.minimum(bad[s_col], bad[o_col])
        hi = np.maximum(bad[s_col], bad[o_col])
        return pd.DataFrame({
            "a": lo, "b": hi,
            "canon": ca[bad.index].to_numpy()}).drop_duplicates()

    return store.map_batches(check, batch_format="pyarrow")


def all_values_from_violations(
    store: ray.data.Dataset,
    on_property_pred: str = "onProperty",
    avf_pred: str = "allValuesFrom",
    type_pred: str = "a",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """owl:allValuesFrom as a CONFORMANCE CHECK (the OWL 2 RL reading,
    cls-avf run as validation — like functional_violations, deriving
    types for v would be unsound under open-world): a restriction r
    declared by (r, onProperty, p) + (r, allValuesFrom, c) is violated
    by every (u, type_pred, r) instance holding an edge (u, p, v)
    whose v is NOT typed c.  Returns (node, pred, value, restriction)
    per violating edge.

    Shape: declarations broadcast; TWO coarse exchanges —
    crc32(u) co-locates instance typings with edges (vectorized merge
    against the declaration frame), then crc32(v) anti-joins the
    candidate edges against the type assertions of the declared
    classes.  Nothing lands on the driver but the ontology."""
    import zlib

    on_p = dict(_declarations(store, p_col, on_property_pred,
                              s_col, o_col))
    avf = dict(_declarations(store, p_col, avf_pred, s_col, o_col))
    restr = sorted(set(on_p) & set(avf))
    empty = pd.DataFrame({
        "node": pd.Series(dtype=str), "pred": pd.Series(dtype=str),
        "value": pd.Series(dtype=str),
        "restriction": pd.Series(dtype=str)})
    if not restr:
        return ray.data.from_arrow(pa.Table.from_pandas(empty))
    decl = pd.DataFrame({
        "r": restr,
        "dp": [on_p[r] for r in restr],
        "dc": [avf[r] for r in restr]})
    preds = frozenset(decl["dp"])
    rset = frozenset(restr)
    classes = frozenset(decl["dc"])

    def _crc(series: pd.Series) -> pd.Series:
        return series.map(
            lambda k: zlib.crc32(k.encode()) % n_buckets).astype("int32")

    def tag_u(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().astype(str)
        inst = df[(df[p_col] == type_pred) & (df[o_col].isin(rset))]
        e = df[df[p_col].isin(preds)]
        rows = pd.concat([
            pd.DataFrame({"u": inst[s_col], "r": inst[o_col],
                          "pn": "", "v": "", "kind": np.int64(1)}),
            pd.DataFrame({"u": e[s_col], "r": "", "pn": e[p_col],
                          "v": e[o_col], "kind": np.int64(0)}),
        ], ignore_index=True)
        rows["_bucket"] = _crc(rows["u"])
        return rows

    def match_u(g: pd.DataFrame, _d=decl) -> pd.DataFrame:
        inst = g[g["kind"] == 1][["u", "r"]].drop_duplicates()
        e = g[g["kind"] == 0][["u", "pn", "v"]].drop_duplicates()
        if not (len(inst) and len(e)):
            return pd.DataFrame({
                "u": pd.Series(dtype=str), "r": pd.Series(dtype=str),
                "pn": pd.Series(dtype=str), "v": pd.Series(dtype=str),
                "dc": pd.Series(dtype=str), "kind": pd.Series(
                    dtype="int64")})
        m = (inst.merge(_d, on="r")
             .merge(e, left_on=["u", "dp"], right_on=["u", "pn"]))
        out = m[["u", "r", "pn", "v", "dc"]].drop_duplicates()
        out["kind"] = np.int64(0)
        return out

    cand = (store.map_batches(tag_u, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(match_u, batch_format="pandas"))

    def tag_v_types(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().astype(str)
        t = df[(df[p_col] == type_pred) & (df[o_col].isin(classes))]
        rows = pd.DataFrame({"u": "", "r": "", "pn": "",
                             "v": t[s_col], "dc": t[o_col],
                             "kind": np.int64(1)})
        rows["_bucket"] = _crc(rows["v"])
        return rows

    def tag_v_cand(df: pd.DataFrame) -> pd.DataFrame:
        df["_bucket"] = _crc(df["v"].astype(str))
        return df

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        typed = set(map(tuple,
                        g[g["kind"] == 1][["v", "dc"]].to_numpy()))
        c = g[g["kind"] == 0]
        if not len(c):
            return empty.copy()
        keep = [tuple(t) not in typed
                for t in c[["v", "dc"]].to_numpy()]
        bad = c[np.asarray(keep, dtype=bool)]
        return pd.DataFrame({
            "node": bad["u"].astype(str),
            "pred": bad["pn"].astype(str),
            "value": bad["v"].astype(str),
            "restriction": bad["r"].astype(str)}).drop_duplicates()

    vtypes = store.map_batches(tag_v_types, batch_format="pyarrow")
    return (cand.map_batches(tag_v_cand, batch_format="pandas")
            .union(vtypes).groupby("_bucket")
            .map_groups(anti, batch_format="pandas"))


def entail_class_expressions(
    store: ray.data.Dataset,
    intersection_pred: str = "intersectionOf",
    union_pred: str = "unionOf",
    first_pred: str = "first",
    rest_pred: str = "rest",
    nil: str = "nil",
    type_pred: str = "a",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """owl:intersectionOf / owl:unionOf class-expression entailment
    (OWL 2 RL cls-int1, cls-int2, cls-uni), declaration-driven and
    SINGLE-APPLICATION (derived types do not feed back into the same
    pass — recursive/nested expressions go through a saturate loop on
    the caller's side, the bgp.saturate discipline):

    - cls-int1: C intersectionOf (m1..mn), x typed EVERY mi
                => (x, type, C)
    - cls-int2: C intersectionOf (m1..mn), (x, type, C)
                => (x, type, mi) for every mi
    - cls-uni : C unionOf (m1..mn), (x, type, mi) for ANY mi
                => (x, type, C)

    The member lists are RDF collections in the store itself, unrolled
    via kgprep.rdf_list_unroll and collected to the driver (ontology
    lists are bounded — a schema property); the three rules then ship
    as small merge frames.  cls-int2 and cls-uni are row-local
    flat-maps; cls-int1 needs each x's full type set, so every derived
    candidate routes through ONE crc32(x) coarse-bucket exchange where
    the per-(x, C) distinct-member count is compared against n — the
    same exchange deduplicates the two row-local rule outputs, so the
    whole operator is one all-to-all.  Returns NEW (s, type, o)
    triples only, distinct; callers union with the store."""
    import zlib

    from .kgprep import rdf_list_unroll

    inter = dict(_declarations(store, p_col, intersection_pred,
                               s_col, o_col))
    union = dict(_declarations(store, p_col, union_pred, s_col, o_col))
    if not (inter or union):
        return _empty_store(s_col, p_col, o_col)

    members = rdf_list_unroll(
        store, first_pred=first_pred, rest_pred=rest_pred, nil=nil,
        s_col=s_col, p_col=p_col, o_col=o_col).to_pandas()

    def mlist(head: str) -> list[str]:
        m = members[members["head"] == head].sort_values("idx")
        return list(m["member"].astype(str))

    # (C, member, n) rows for every intersection; (member, C) for unions
    irows = [(c, m, len(mlist(h))) for c, h in sorted(inter.items())
             for m in mlist(h)]
    urows = [(m, c) for c, h in sorted(union.items()) for m in mlist(h)]
    idecl = pd.DataFrame(irows, columns=["C", "m", "n"]) if irows else \
        pd.DataFrame({"C": [], "m": [], "n": []})
    udecl = pd.DataFrame(urows, columns=["m", "C"]) if urows else \
        pd.DataFrame({"m": [], "C": []})
    imembers = frozenset(idecl["m"])
    iclasses = frozenset(idecl["C"])
    umembers = frozenset(udecl["m"])

    def tag(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": b.column(s_col).cast(pa.string()).to_pandas(),
            "p": b.column(p_col).cast(pa.string()).to_pandas(),
            "o": b.column(o_col).cast(pa.string()).to_pandas()})
        t = df[df["p"] == type_pred]
        parts = []
        # cls-int1 candidates: (x, C, witness member, n), kind 0
        c1 = t[t["o"].isin(imembers)]
        if len(c1):
            m = c1.merge(idecl, left_on="o", right_on="m")
            parts.append(pd.DataFrame({
                "x": m["s"], "newc": m["C"], "w": m["m"],
                "n": m["n"].astype("int64"), "kind": np.int64(0)}))
        # cls-int2: direct members of an asserted intersection, kind 1
        c2 = t[t["o"].isin(iclasses)]
        if len(c2):
            m = c2.merge(idecl, left_on="o", right_on="C")
            parts.append(pd.DataFrame({
                "x": m["s"], "newc": m["m"], "w": "",
                "n": np.int64(0), "kind": np.int64(1)}))
        # cls-uni, kind 1
        c3 = t[t["o"].isin(umembers)]
        if len(c3):
            m = c3.merge(udecl, left_on="o", right_on="m")
            parts.append(pd.DataFrame({
                "x": m["s"], "newc": m["C"], "w": "",
                "n": np.int64(0), "kind": np.int64(1)}))
        if not parts:
            return pd.DataFrame({
                "x": pd.Series(dtype=str),
                "newc": pd.Series(dtype=str),
                "w": pd.Series(dtype=str),
                "n": pd.Series(dtype="int64"),
                "kind": pd.Series(dtype="int64"),
                "_bucket": pd.Series(dtype="int32")})
        rows = pd.concat(parts, ignore_index=True)
        rows["_bucket"] = rows["x"].map(
            lambda k: zlib.crc32(k.encode()) % n_buckets).astype("int32")
        return rows

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        direct = g[g["kind"] == 1][["x", "newc"]]
        cand = g[g["kind"] == 0].drop_duplicates(["x", "newc", "w"])
        if len(cand):
            cnt = (cand.groupby(["x", "newc", "n"], sort=False)["w"]
                   .nunique().reset_index(name="_got"))
            full = cnt[cnt["_got"] == cnt["n"]][["x", "newc"]]
        else:
            full = direct.iloc[0:0]
        out = (pd.concat([direct, full], ignore_index=True)
               .drop_duplicates())
        return pd.DataFrame({s_col: out["x"].astype(str),
                             p_col: type_pred,
                             o_col: out["newc"].astype(str)})

    return (store.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(fold, batch_format="pandas"))


def max_cardinality_violations(
    store: ray.data.Dataset,
    on_property_pred: str = "onProperty",
    mqc_pred: str = "maxQualifiedCardinality",
    mc_pred: str = "maxCardinality",
    on_class_pred: str = "onClass",
    type_pred: str = "a",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """owl:maxCardinality / owl:maxQualifiedCardinality as CONFORMANCE
    checks (OWL 2 RL cls-maxc2 / cls-maxqc read as validation — the
    functional_violations stance: deriving sameAs between the excess
    values is rarely what a data pipeline wants; reporting them is).
    A restriction r declared by (r, onProperty, p) + (r, maxCardinality
    , n) is violated by every (u, type_pred, r) instance holding more
    than n DISTINCT p-values; the qualified form (r,
    maxQualifiedCardinality, n) + (r, onClass, c) counts only values
    themselves typed c.  Returns (node, restriction, pred, n_values,
    max_n) — one row per violating instance, n_values the offending
    distinct count (int64).

    Shape: declarations broadcast; crc32(u) exchange co-locates
    instance typings with edges; qualified candidates take ONE extra
    crc32(v) semi-join exchange against the onClass typings
    (unqualified candidates ride through untouched); a final
    crc32(u, r) fold counts distinct values.  Nothing but the ontology
    lands on the driver."""
    import zlib

    on_p = dict(_declarations(store, p_col, on_property_pred,
                              s_col, o_col))
    mqc = dict(_declarations(store, p_col, mqc_pred, s_col, o_col))
    mc = dict(_declarations(store, p_col, mc_pred, s_col, o_col))
    on_c = dict(_declarations(store, p_col, on_class_pred, s_col, o_col))
    rows = []
    for r, n in sorted(mqc.items()):
        if r in on_p and r in on_c:
            rows.append((r, on_p[r], int(n), on_c[r]))
    for r, n in sorted(mc.items()):
        if r in on_p:
            rows.append((r, on_p[r], int(n), ""))
    empty = pd.DataFrame({
        "node": pd.Series(dtype=str),
        "restriction": pd.Series(dtype=str),
        "pred": pd.Series(dtype=str),
        "n_values": pd.Series(dtype="int64"),
        "max_n": pd.Series(dtype="int64")})
    if not rows:
        return ray.data.from_arrow(pa.Table.from_pandas(empty))
    decl = pd.DataFrame(rows, columns=["r", "dp", "n", "dc"])
    preds = frozenset(decl["dp"])
    rset = frozenset(decl["r"])
    classes = frozenset(c for c in decl["dc"] if c)

    def _crc(series: pd.Series) -> pd.Series:
        return series.map(
            lambda k: zlib.crc32(k.encode()) % n_buckets).astype("int32")

    def tag_u(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": b.column(s_col).cast(pa.string()).to_pandas(),
            "p": b.column(p_col).cast(pa.string()).to_pandas(),
            "o": b.column(o_col).cast(pa.string()).to_pandas()})
        inst = df[(df["p"] == type_pred) & (df["o"].isin(rset))]
        e = df[df["p"].isin(preds)]
        out = pd.concat([
            pd.DataFrame({"u": inst["s"], "r": inst["o"], "pn": "",
                          "v": "", "kind": np.int64(1)}),
            pd.DataFrame({"u": e["s"], "r": "", "pn": e["p"],
                          "v": e["o"], "kind": np.int64(0)}),
        ], ignore_index=True)
        out["_bucket"] = _crc(out["u"])
        return out

    def match_u(g: pd.DataFrame, _d=decl) -> pd.DataFrame:
        inst = g[g["kind"] == 1][["u", "r"]].drop_duplicates()
        e = g[g["kind"] == 0][["u", "pn", "v"]].drop_duplicates()
        cols = {"u": str, "r": str, "pn": str, "v": str, "dc": str,
                "n": "int64", "kind": "int64"}
        if not (len(inst) and len(e)):
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in cols.items()})
        m = (inst.merge(_d, on="r")
             .merge(e, left_on=["u", "dp"], right_on=["u", "pn"]))
        out = m[["u", "r", "pn", "v", "dc", "n"]].drop_duplicates()
        out["kind"] = np.int64(0)
        return out

    cand = (store.map_batches(tag_u, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(match_u, batch_format="pandas")
            .materialize())

    # split: unqualified candidates go straight to the count fold;
    # qualified ones take the crc32(v) semi-join against onClass typings
    def final_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _crc(df["u"] + "\x00" + df["r"])
        return df

    unqual = cand.map_batches(
        lambda b: final_bucket(
            b.to_pandas().loc[lambda d: d["dc"] == "",
                              ["u", "r", "pn", "v", "n"]]),
        batch_format="pyarrow")

    def tag_v_cand(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df = df[df["dc"] != ""]
        out = df[["u", "r", "pn", "v", "dc", "n"]].copy()
        out["kind"] = np.int64(0)
        out["_bucket"] = _crc(out["v"])
        return out

    def tag_v_types(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": b.column(s_col).cast(pa.string()).to_pandas(),
            "p": b.column(p_col).cast(pa.string()).to_pandas(),
            "o": b.column(o_col).cast(pa.string()).to_pandas()})
        t = df[(df["p"] == type_pred) & (df["o"].isin(classes))]
        out = pd.DataFrame({
            "u": "", "r": "", "pn": "", "v": t["s"], "dc": t["o"],
            "n": np.int64(0), "kind": np.int64(1)})
        out["_bucket"] = _crc(out["v"])
        return out

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        typed = g[g["kind"] == 1][["v", "dc"]].drop_duplicates()
        c = g[g["kind"] == 0]
        if not (len(typed) and len(c)):
            return pd.DataFrame({
                "u": pd.Series(dtype=str), "r": pd.Series(dtype=str),
                "pn": pd.Series(dtype=str), "v": pd.Series(dtype=str),
                "n": pd.Series(dtype="int64"),
                "_bucket": pd.Series(dtype="int32")})
        m = c.merge(typed, on=["v", "dc"])
        return final_bucket(m[["u", "r", "pn", "v", "n"]])

    qual = (cand.map_batches(tag_v_cand, batch_format="pyarrow")
            .union(store.map_batches(tag_v_types, batch_format="pyarrow"))
            .groupby("_bucket")
            .map_groups(semi, batch_format="pandas"))

    def count_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["u", "r", "pn", "n", "v"]].drop_duplicates()
        agg = (d.groupby(["u", "r", "pn", "n"], sort=False)["v"]
               .nunique().reset_index(name="n_values"))
        bad = agg[agg["n_values"] > agg["n"]]
        return pd.DataFrame({
            "node": bad["u"].astype(object),
            "restriction": bad["r"].astype(object),
            "pred": bad["pn"].astype(object),
            "n_values": bad["n_values"].astype("int64"),
            "max_n": bad["n"].astype("int64")})

    return (unqual.union(qual)
            .groupby("_bucket")
            .map_groups(count_fold, batch_format="pandas"))

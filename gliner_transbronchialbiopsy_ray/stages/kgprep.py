"""KG-embedding training prep: dense integer dictionaries for entities
and relations, and the (h, r, t) id-encoded triple stream TransE-style
trainers consume.

- `encode_entities`: every distinct node (subject or object) gets a
  contiguous id 0..N-1 in SORTED node order — deterministic and
  SQL-reproducible (row_number() OVER (ORDER BY node) - 1).  Plan:
  one distinct fold over the projected node stream, then the repo's
  two-phase distributed prefix scan (window.global_prefix_sum: per-block
  totals -> O(blocks) driver prefix -> broadcast carry-ins) assigns ids
  without ever materializing the dictionary on the driver.
- `encode_relations`: same for predicates (bounded vocabulary — the
  distinct fold output is tiny).
- `encode_triples`: rewrites the store to (h, r, t) ids.  The entity
  dictionary is O(corpus), so it is NEVER broadcast: two native hash
  joins (subject, then object) ship each triple its ids; the relation
  dictionary is broadcast (bounded).  Input multiplicity is preserved
  (training triples are observations, not a set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _distinct(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    local = ds.map_batches(
        lambda b: b.to_pandas().drop_duplicates(),
        batch_format="pyarrow")
    return local.groupby(cols).count().drop_columns(["count()"])


def encode_entities(
    triples: ray.data.Dataset,
    s_col: str = "s",
    o_col: str = "o",
) -> ray.data.Dataset:
    """(node, id) with ids 0..N-1 in sorted node order."""
    from .window import global_prefix_sum

    def nodes(batch: pa.Table) -> pa.Table:
        s = batch.column(s_col).cast(pa.string()).combine_chunks()
        o = batch.column(o_col).cast(pa.string()).combine_chunks()
        return pa.table({"node": pa.concat_arrays([s, o])})

    uniq = _distinct(triples.map_batches(nodes, batch_format="pyarrow"),
                     ["node"])
    ones = uniq.map_batches(
        lambda b: b.append_column(
            "one", pa.array([1] * b.num_rows, type=pa.int64())),
        batch_format="pyarrow")
    numbered = global_prefix_sum(ones, order_by="node", value="one",
                                 out_col="id", inclusive=True)
    return numbered.map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "id": pa.compute.subtract(
                b.column("id").cast(pa.int64()),
                pa.scalar(1, pa.int64()))}),
        batch_format="pyarrow")


def encode_relations(
    triples: ray.data.Dataset,
    p_col: str = "p",
) -> pd.DataFrame:
    """(rel, id) as a small driver-side frame (predicate vocabularies
    are bounded); ids 0..R-1 in sorted predicate order."""
    uniq = _distinct(
        triples.map_batches(
            lambda b: pa.table(
                {"rel": b.column(p_col).cast(pa.string())}),
            batch_format="pyarrow"),
        ["rel"]).to_pandas()
    if "rel" not in uniq.columns:  # empty store: column-less frame
        uniq = pd.DataFrame({"rel": pd.Series(dtype=object)})
    uniq = uniq.sort_values("rel", kind="stable").reset_index(drop=True)
    uniq["id"] = pd.RangeIndex(len(uniq)).astype("int64")
    return uniq


def node_property_table(
    triples: ray.data.Dataset,
    predicates: list[str],
    fill: str = "-",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """KG -> wide node feature table: one row per subject that carries
    at least one of `predicates`, one column per predicate.  A
    non-functional predicate contributes its MIN object (deterministic
    and SQL-reproducible); missing predicates get `fill`.  One coarse
    subject-bucket exchange + a vectorized in-bucket pivot — the
    property-graph projection ML feature joins start from."""
    import zlib

    preds = list(predicates)

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": batch.column(s_col).cast(pa.string()).to_pandas(),
            "p": batch.column(p_col).cast(pa.string()).to_pandas(),
            "o": batch.column(o_col).cast(pa.string()).to_pandas(),
        })
        df = df[df["p"].isin(preds)]
        # per-batch combiner: min object per (s, p) before the shuffle
        df = (df.groupby(["s", "p"], sort=False)["o"].min()
              .reset_index())
        df["_bucket"] = df["s"].map(
            lambda k: zlib.crc32(k.encode()) % n_buckets
        ).astype("int32")
        return df

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["s", "p"], sort=False)["o"].min()
             .reset_index())
        wide = g.pivot(index="s", columns="p", values="o")
        for p in preds:
            if p not in wide.columns:
                wide[p] = None
        wide = wide[preds].fillna(fill).reset_index()
        wide = wide.rename(columns={"s": "node"})
        wide.columns.name = None
        for c in wide.columns:
            wide[c] = wide[c].astype(object)
        return wide

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return pivot(g.drop(columns=["_bucket"]))

    return (triples.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(run, batch_format="pandas"))


def predicate_profile(
    triples: ray.data.Dataset,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> pd.DataFrame:
    """Schema discovery: per-predicate profile — triple count, distinct
    subjects/objects, and functionality (every subject has at most one
    object).  Returns a driver frame (bounded by the predicate
    vocabulary).  Plan: three distinct folds keyed on the full
    (p, value) pair — NEVER on the predicate alone (maximal skew) —
    then per-batch partial counts per predicate merged driver-side
    (bounded key).  Counts: n, nd_s, nd_o, nd_so; is_functional =
    (nd_s == nd_so)."""

    def count_per_p(ds: ray.data.Dataset, out: str) -> pd.DataFrame:
        partials = ds.map_batches(
            lambda b: b.to_pandas().groupby("p").size()
            .rename(out).reset_index(),
            batch_format="pyarrow").to_pandas()
        if "p" not in partials.columns:
            return pd.DataFrame({"p": pd.Series(dtype=object),
                                 out: pd.Series(dtype="int64")})
        return (partials.groupby("p")[out].sum().reset_index()
                .sort_values("p", kind="stable"))

    base = triples.map_batches(
        lambda b: pa.table({
            "p": b.column(p_col).cast(pa.string()),
            "s": b.column(s_col).cast(pa.string()),
            "o": b.column(o_col).cast(pa.string())}),
        batch_format="pyarrow").materialize()

    n = count_per_p(base, "n")
    nd_s = count_per_p(_distinct(
        base.select_columns(["p", "s"]), ["p", "s"]), "nd_s")
    nd_o = count_per_p(_distinct(
        base.select_columns(["p", "o"]), ["p", "o"]), "nd_o")
    nd_so = count_per_p(_distinct(base, ["p", "s", "o"]), "nd_so")

    prof = (n.merge(nd_s, on="p").merge(nd_o, on="p")
            .merge(nd_so, on="p"))
    prof["is_functional"] = (
        prof["nd_s"] == prof["nd_so"]).astype("int64")
    for c in ("n", "nd_s", "nd_o", "nd_so"):
        prof[c] = prof[c].astype("int64")
    prof["p"] = prof["p"].astype(str)
    return prof.sort_values("p", kind="stable").reset_index(drop=True)


def link_prediction_split(
    encoded: ray.data.Dataset,
    test_hex: str = "0d",
    valid_hex: str = "1a",
    broadcast_threshold: int = 20_000_000,
) -> ray.data.Dataset:
    """FILTERED train/valid/test split of (h, r, t) triples for
    link-prediction training (the FB15k-style protocol): assignment is
    a deterministic md5 draw over "h|r|t" (hex-prefix ranges, so DuckDB
    reproduces it exactly), then any valid/test triple whose head OR
    tail entity never appears in train is REASSIGNED to train — eval
    must not score unseen entities.  The train-entity set is collected
    once and broadcast (threshold-enforced; a two-join shuffle variant
    is the documented upgrade past it).  Output: (h, r, t, split)."""
    import hashlib

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "h": batch.column("h").to_pandas().astype("int64"),
            "r": batch.column("r").to_pandas().astype("int64"),
            "t": batch.column("t").to_pandas().astype("int64")})
        # md5 per row: DuckDB-parity requires md5 itself (same rule as
        # q43's deterministic sample)
        hx = [hashlib.md5(f"{h}|{r}|{t}".encode()).hexdigest()[:2]
              for h, r, t in zip(df["h"], df["r"], df["t"])]
        split = pd.Series(hx, index=df.index, dtype=object)
        df["split"] = np.where(
            split < test_hex, "test",
            np.where(split < valid_hex, "valid", "train"))
        return df

    tagged = encoded.map_batches(tag,
                                 batch_format="pyarrow").materialize()

    def train_ents(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        tr = df[df["split"] == "train"]
        ents = pd.unique(pd.concat([tr["h"], tr["t"]],
                                   ignore_index=True))
        return pd.DataFrame({"e": ents})

    ents = (tagged.map_batches(train_ents, batch_format="pyarrow")
            .to_pandas())
    seen = (pd.unique(ents["e"]) if "e" in ents.columns
            else pd.Index([], dtype="int64"))
    if len(seen) > broadcast_threshold:
        raise ValueError(
            f"train entity set has {len(seen)} members > "
            f"broadcast_threshold={broadcast_threshold}; two-join "
            "shuffle reassignment needed at this scale")
    ref = ray.put(set(int(v) for v in seen))

    def reassign(batch: pa.Table, _ref=ref) -> pd.DataFrame:
        known = ray.get(_ref)
        df = batch.to_pandas()
        eval_rows = df["split"] != "train"
        unseen = (~df["h"].isin(known)) | (~df["t"].isin(known))
        df.loc[eval_rows & unseen, "split"] = "train"
        return df

    return tagged.map_batches(reassign, batch_format="pyarrow")


def encode_triples(
    triples: ray.data.Dataset,
    entity_ids: ray.data.Dataset | None = None,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(h, r, t) int64-encoded triples.  Entity ids attach via two
    native hash joins (the dictionary scales with the corpus — never
    broadcast); relation ids via one broadcast map."""
    from .joins import coalesce_for_join

    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2
    if entity_ids is None:
        entity_ids = encode_entities(triples, s_col=s_col, o_col=o_col)
    entity_ids = entity_ids.materialize()

    rels = encode_relations(triples, p_col=p_col)
    rel_ref = ray.put(dict(zip(rels["rel"], rels["id"])))

    def norm(batch: pa.Table) -> pd.DataFrame:
        rm = ray.get(rel_ref)
        return pd.DataFrame({
            "_s": batch.column(s_col).cast(pa.string()).to_pandas(),
            "r": batch.column(p_col).cast(pa.string()).to_pandas()
                 .map(rm).astype("int64"),
            "_o": batch.column(o_col).cast(pa.string()).to_pandas(),
        })

    t = triples.map_batches(norm, batch_format="pyarrow").materialize()
    heads = entity_ids.map_batches(
        lambda b: pa.table({"_s": b.column("node"),
                            "h": b.column("id")}),
        batch_format="pyarrow").materialize()
    tails = entity_ids.map_batches(
        lambda b: pa.table({"_o": b.column("node"),
                            "t": b.column("id")}),
        batch_format="pyarrow").materialize()

    j1 = coalesce_for_join(t, num_partitions).join(
        coalesce_for_join(heads, num_partitions),
        join_type="inner", num_partitions=num_partitions,
        on=("_s",), right_on=("_s",))
    j2 = coalesce_for_join(j1.materialize(), num_partitions).join(
        coalesce_for_join(tails, num_partitions),
        join_type="inner", num_partitions=num_partitions,
        on=("_o",), right_on=("_o",))
    return j2.map_batches(
        lambda b: pa.table({
            "h": b.column("h").cast(pa.int64()),
            "r": b.column("r").cast(pa.int64()),
            "t": b.column("t").cast(pa.int64())}),
        batch_format="pyarrow")


def characteristic_sets(
    triples: ray.data.Dataset,
    s_col: str = "s",
    p_col: str = "p",
    n_buckets: int = 32,
) -> pd.DataFrame:
    """RDF structure summarization via CHARACTERISTIC SETS (Neumann &
    Moerkotte, ICDE 2011): group subjects by their exact set of distinct
    predicates; per set report how many subjects share it and how many
    triples it covers — the standard KG cardinality/shape statistic.

    Plan: project (s, p), ONE subject-hash-bucket exchange (coarse
    buckets, never keyed on the skewed predicate), per bucket a
    vectorized pandas pass builds each subject's sorted-distinct
    predicate string + triple count and pre-aggregates to per-bucket
    (charset, n_subjects, n_triples) partials; the driver merge is
    bounded by the number of DISTINCT characteristic sets (a schema
    property, not a corpus property).  Returns a driver frame sorted
    by charset."""
    from .window import hash_bucketed_map_groups

    proj = triples.map_batches(
        lambda b: pa.table({
            "s": b.column(s_col).cast(pa.string()),
            "p": b.column(p_col).cast(pa.string())}),
        batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nt = g.groupby("s").size().rename("nt")
        dd = g.drop_duplicates().sort_values(["s", "p"], kind="stable")
        cs = dd.groupby("s")["p"].agg(",".join).rename("charset")
        per_s = pd.concat([cs, nt], axis=1)
        out = (per_s.groupby("charset")
               .agg(n_subjects=("nt", "size"), n_triples=("nt", "sum"))
               .reset_index())
        return out

    partials = hash_bucketed_map_groups(
        proj, "s", per_bucket, n_buckets=n_buckets).to_pandas()
    if "charset" not in partials.columns:
        return pd.DataFrame({"charset": pd.Series(dtype=object),
                             "n_subjects": pd.Series(dtype="int64"),
                             "n_triples": pd.Series(dtype="int64")})
    out = (partials.groupby("charset")[["n_subjects", "n_triples"]]
           .sum().reset_index())
    out["n_subjects"] = out["n_subjects"].astype("int64")
    out["n_triples"] = out["n_triples"].astype("int64")
    return (out.sort_values("charset", kind="stable")
            .reset_index(drop=True))


_LIT_RX = (r'^"(?P<lexical>.*)"'
           r'(?:\^\^(?P<datatype>\S+)|@(?P<lang>[A-Za-z][A-Za-z0-9-]*))?$')


def parse_literals(
    triples: ray.data.Dataset,
    o_col: str = "o",
) -> ray.data.Dataset:
    """RDF literal decomposition (Turtle/N-Triples lexical conventions):
    split each object into (lexical, datatype, lang) columns appended to
    the row — `"5"^^xsd:integer` -> ("5", "xsd:integer", ""),
    `"bonjour"@fr` -> ("bonjour", "", "fr"), a bare `"plain"` ->
    ("plain", "", ""), and a non-literal object (IRI/node id) keeps
    empty lexical/datatype/lang with is_literal=0.  One row-local
    vectorized `.str.extract` pass — no shuffle; the typed-column
    materialization downstream (node_property_table etc.) can then cast
    lexical by datatype."""
    def parse(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        o = df[o_col].astype(str)
        ext = o.str.extract(_LIT_RX)
        is_lit = ext["lexical"].notna()
        df["lexical"] = ext["lexical"].fillna("")
        df["datatype"] = ext["datatype"].fillna("")
        df["lang"] = ext["lang"].fillna("")
        df["is_literal"] = is_lit.astype("int64")
        return df

    return triples.map_batches(parse, batch_format="pyarrow")


def skolemize(
    triples: ray.data.Dataset,
    blank_prefix: str = "_:",
    skolem_prefix: str = "skolem:",
    s_col: str = "s",
    o_col: str = "o",
) -> ray.data.Dataset:
    """Blank-node skolemization (RDF 1.1 §3.5): rewrite `_:b` ids to
    globally-valid `skolem:b` IRIs in subject and object position —
    the standard step before exchanging graphs between systems (blank
    ids are only scoped to their source document).  Row-local
    vectorized replace, no shuffle; deterministic, so the same input
    always skolemizes identically."""
    def sk(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        for c in (s_col, o_col):
            v = df[c].astype(str)
            hit = v.str.startswith(blank_prefix)
            if hit.any():
                df[c] = v.where(
                    ~hit, skolem_prefix + v.str[len(blank_prefix):])
        return df

    return triples.map_batches(sk, batch_format="pyarrow")


def graph_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """KG maintenance delta: triples ADDED by `new` and REMOVED from
    `old` (set semantics — duplicates within a side collapse).  Tag
    each side, union, ONE subject-bucket exchange, and an in-bucket
    indicator fold emits (s, p, o, change) rows for triples present in
    exactly one side.  The common case (graphs mostly overlap) makes
    the output small; the exchange is the unavoidable co-location of
    identical triples."""
    import zlib

    def tag(side: str):
        def f(b: pa.Table, _side=side) -> pd.DataFrame:
            df = pd.DataFrame({
                "s": b.column(s_col).cast(pa.string()).to_pandas(),
                "p": b.column(p_col).cast(pa.string()).to_pandas(),
                "o": b.column(o_col).cast(pa.string()).to_pandas(),
            }).drop_duplicates()
            df["_side"] = _side
            df["_bucket"] = df["s"].map(
                lambda k: zlib.crc32(k.encode()) % n_buckets
            ).astype("int32")
            return df
        return f

    u = (old.map_batches(tag("old"), batch_format="pyarrow")
         .union(new.map_batches(tag("new"), batch_format="pyarrow")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop(columns=["_bucket"]).drop_duplicates()
        piv = (d.assign(_one=1)
               .pivot_table(index=["s", "p", "o"], columns="_side",
                            values="_one", aggfunc="max", fill_value=0)
               .reset_index())
        piv.columns.name = None  # pivot stamps "_side" on the axis
        for c in ("old", "new"):
            if c not in piv.columns:
                piv[c] = 0
        added = piv[(piv["new"] == 1) & (piv["old"] == 0)]
        removed = piv[(piv["old"] == 1) & (piv["new"] == 0)]
        out = pd.concat([
            added[["s", "p", "o"]].assign(change="added"),
            removed[["s", "p", "o"]].assign(change="removed"),
        ], ignore_index=True)
        for c in out.columns:
            out[c] = out[c].astype(object)
        return out

    return u.groupby("_bucket").map_groups(fold, batch_format="pandas")


def class_summary(
    triples: ray.data.Dataset,
    type_pred: str = "a",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    untyped: str = "(untyped)",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """VoID-style class-level graph summary: (s_type, p, o_type, n) —
    how many data edges run from instances of one class to instances
    of another, with literal / untyped endpoints reported under the
    `untyped` label.  Multi-typed entities contribute one row per type
    combination (VoID class-partition semantics); duplicate type
    DECLARATIONS collapse first.

    Plan: the (node, class) map is O(entities) so it is NEVER
    broadcast — two native LEFT joins (subject then object role, the
    encode_triples shape) attach types to the edge stream, then a
    per-batch partial count feeds a tiny (s_type, p, o_type) groupby.
    Empty-block join guards (coalesce_for_join) on every post-filter
    input."""
    from .joins import coalesce_for_join

    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    def types_of(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "node": b.column(s_col).cast(pa.string()).to_pandas(),
            "p": b.column(p_col).cast(pa.string()).to_pandas(),
            "cls": b.column(o_col).cast(pa.string()).to_pandas()})
        return (df[df["p"] == type_pred][["node", "cls"]]
                .drop_duplicates())

    types = _distinct(
        triples.map_batches(types_of, batch_format="pyarrow"),
        ["node", "cls"]).materialize()

    def data_edges(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "_s": b.column(s_col).cast(pa.string()).to_pandas(),
            "p": b.column(p_col).cast(pa.string()).to_pandas(),
            "_o": b.column(o_col).cast(pa.string()).to_pandas()})
        return df[df["p"] != type_pred]

    edges = triples.map_batches(
        data_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "s_type": pa.array([], type=pa.string()),
            "p": pa.array([], type=pa.string()),
            "o_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64())}))

    s_types = types.map_batches(
        lambda b: pa.table({"_s": b.column("node"),
                            "s_type": b.column("cls")}),
        batch_format="pyarrow").materialize()
    o_types = types.map_batches(
        lambda b: pa.table({"_o": b.column("node"),
                            "o_type": b.column("cls")}),
        batch_format="pyarrow").materialize()

    j1 = coalesce_for_join(edges, num_partitions).join(
        coalesce_for_join(s_types, num_partitions),
        join_type="left_outer", num_partitions=num_partitions,
        on=("_s",), right_on=("_s",))
    j2 = coalesce_for_join(j1.materialize(), num_partitions).join(
        coalesce_for_join(o_types, num_partitions),
        join_type="left_outer", num_partitions=num_partitions,
        on=("_o",), right_on=("_o",))

    def partial(b: pa.Table, _u=untyped) -> pd.DataFrame:
        df = b.to_pandas()
        out = (pd.DataFrame({
            "s_type": df["s_type"].fillna(_u).astype(str),
            "p": df["p"].astype(str),
            "o_type": df["o_type"].fillna(_u).astype(str)})
            .groupby(["s_type", "p", "o_type"], sort=False,
                     as_index=False).size()
            .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    parts = j2.map_batches(partial, batch_format="pyarrow")
    out = parts.groupby(["s_type", "p", "o_type"]).sum("n")
    return out.map_batches(
        lambda b: pa.table({
            "s_type": b.column("s_type").cast(pa.string()),
            "p": b.column("p").cast(pa.string()),
            "o_type": b.column("o_type").cast(pa.string()),
            "n": b.column("sum(n)").cast(pa.int64())}),
        batch_format="pyarrow")


def rdf_list_unroll(
    triples: ray.data.Dataset,
    first_pred: str = "first",
    rest_pred: str = "rest",
    nil: str = "nil",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    max_len: int = 32,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """RDF collection (rdf:List) unrolling: every MAXIMAL list in the
    store — a chain of cells linked by `rest_pred` ending at `nil`,
    each carrying one `first_pred` member — comes back as flat
    (head, idx, member) rows, `idx` the 0-based position and `head`
    the first cell's node id.

    Heads are cells never referenced as another cell's rest (one
    anti-join).  The walk is pointer-chasing: per position one
    frontier-x-rests join advances every list in lockstep, one
    frontier-x-firsts join emits members — 2 bounded joins per
    POSITION, with the frontier sized by the number of lists, not
    their length.  `max_len` caps the walk and is part of the
    contract (RDF collections are short; deep chains want the
    succession-closure operators instead).  Loop state and both edge
    tables are materialized every round (lazy lineage would re-run
    the extraction per hop)."""
    from .joins import coalesce_for_join

    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    def pick(pred: str, a: str, b: str):
        def f(batch: pa.Table, _pred=pred) -> pd.DataFrame:
            df = pd.DataFrame({
                "s": batch.column(s_col).cast(pa.string()).to_pandas(),
                "p": batch.column(p_col).cast(pa.string()).to_pandas(),
                "o": batch.column(o_col).cast(pa.string()).to_pandas()})
            df = df[df["p"] == _pred]
            return pd.DataFrame({a: df["s"].astype(str),
                                 b: df["o"].astype(str)})
        return f

    firsts = triples.map_batches(
        pick(first_pred, "node", "member"),
        batch_format="pyarrow").materialize()
    rests = triples.map_batches(
        pick(rest_pred, "node", "next"), batch_format="pyarrow")
    rests = rests.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("next"), nil)),
        batch_format="pyarrow").materialize()

    empty = ray.data.from_arrow(pa.table({
        "head": pa.array([], type=pa.string()),
        "idx": pa.array([], type=pa.int64()),
        "member": pa.array([], type=pa.string())}))
    if firsts.count() == 0:
        return empty

    # heads: cells that are no cell's rest (anti semi-join)
    tails = rests.map_batches(
        lambda b: pa.table({"node": b.column("next"),
                            "_t": pa.array([1] * b.num_rows,
                                           type=pa.int8())}),
        batch_format="pyarrow")
    tails = _distinct(tails, ["node", "_t"]).materialize()
    nodes = _distinct(firsts.select_columns(["node"]), ["node"])
    if tails.count() == 0:
        heads = nodes
    else:
        j = coalesce_for_join(nodes.materialize(), num_partitions).join(
            coalesce_for_join(tails, num_partitions),
            join_type="left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("node",))
        heads = j.map_batches(
            lambda b: b.filter(pc.is_null(b.column("_t")))
                       .select(["node"]),
            batch_format="pyarrow")

    cur = heads.map_batches(
        lambda b: pa.table({"head": b.column("node"),
                            "node": b.column("node")}),
        batch_format="pyarrow").materialize()

    emitted = []
    for idx in range(max_len):
        if cur.count() == 0:
            break
        cur_j = coalesce_for_join(cur, num_partitions)
        em = cur_j.join(
            coalesce_for_join(firsts, num_partitions),
            join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("node",))
        em = em.map_batches(
            lambda b, _i=idx: pa.table({
                "head": b.column("head").cast(pa.string()),
                "idx": pa.array([_i] * b.num_rows, type=pa.int64()),
                "member": b.column("member").cast(pa.string())}),
            batch_format="pyarrow")
        emitted.append(em.materialize())
        if rests.count() == 0:
            break
        nxt = cur_j.join(
            coalesce_for_join(rests, num_partitions),
            join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("node",))
        cur = nxt.map_batches(
            lambda b: pa.table({"head": b.column("head"),
                                "node": b.column("next")}),
            batch_format="pyarrow").materialize()

    if not emitted:
        return empty
    out = emitted[0]
    for em in emitted[1:]:
        out = out.union(em)
    return out.repartition(num_partitions)


def hash_embedding(ids: np.ndarray, dim: int = 8,
                   salt: int = 31) -> np.ndarray:
    """Deterministic integer 'embedding' for benchmark/oracle use:
    emb(e, j) = ((|e|*salt + 53*[e<0] + j*17) % 101) - 50.  All-integer
    and sign-safe (operands made non-negative BEFORE the modulo — SQL %
    follows the dividend's sign, numpy's the divisor's: the q123 trap),
    so DuckDB replays it bit-for-bit.  Real float embeddings plug into
    the same ranking operator; this one exists so ranking METRICS can
    be oracle-verified."""
    e = ids.astype("int64")
    j = np.arange(dim, dtype="int64")
    base = np.abs(e)[:, None] * salt + 53 * (e < 0)[:, None] + j * 17
    return (base % 101) - 50


def link_prediction_rank(
    test_triples: ray.data.Dataset,
    entities: ray.data.Dataset,
    dim: int = 8,
    h_col: str = "h",
    r_col: str = "r",
    t_col: str = "t",
    e_col: str = "e",
    max_test: int = 100_000,
) -> pd.DataFrame:
    """TransE-style link-prediction evaluation: for each test (h, r, t),
    the OPTIMISTIC tail rank — 1 + #{candidate e : L1 score(h, r, e) <
    score(h, r, t)} under score = sum_j |emb(h)+emb(r)-emb(t)| with the
    `hash_embedding` vectors.  Returns (h, r, t, rank) as a DataFrame
    (one row per test triple — the eval page).

    Scale plan INVERTED from the naive one: the test set is the small
    side (an eval page, `max_test`-enforced) so its query matrix is
    ray.put ONCE; the CANDIDATE ENTITY table — O(corpus) — streams
    through map_batches, each batch folding to a (test_idx, count)
    partial via one vectorized (T x E_batch x dim) L1 kernel.  Partials
    sum in one tiny groupby; no entity matrix is ever materialized or
    broadcast."""
    tdf = test_triples.to_pandas()
    if len(tdf) > max_test:
        raise ValueError(
            f"test set {len(tdf)} rows > max_test={max_test}: the "
            "eval page is the broadcast side and must stay bounded")
    if len(tdf) == 0:
        return pd.DataFrame({h_col: pd.Series(dtype="int64"),
                             r_col: pd.Series(dtype="int64"),
                             t_col: pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64")})
    h = tdf[h_col].to_numpy("int64")
    r = tdf[r_col].to_numpy("int64")
    t = tdf[t_col].to_numpy("int64")
    q = hash_embedding(h, dim) + hash_embedding(r, dim, salt=13)
    true_score = np.abs(q - hash_embedding(t, dim)).sum(axis=1)
    ref = ray.put((q, true_score))

    def partial(b: pa.Table, _ref=ref, _dim=dim) -> pd.DataFrame:
        qm, ts = ray.get(_ref)
        ents = b.column(e_col).to_numpy().astype("int64")
        em = hash_embedding(ents, _dim)                    # (E, dim)
        dist = np.abs(qm[:, None, :] - em[None, :, :]).sum(axis=2)
        less = (dist < ts[:, None]).sum(axis=1).astype("int64")
        return pd.DataFrame({"i": np.arange(len(ts), dtype="int64"),
                             "cnt": less})

    parts = (entities.map_batches(partial, batch_format="pyarrow",
                                  batch_size=4096)
             .groupby("i").sum("cnt").to_pandas())
    counts = np.zeros(len(tdf), dtype="int64")
    counts[parts["i"].to_numpy("int64")] = \
        parts["sum(cnt)"].to_numpy("int64")
    out = pd.DataFrame({h_col: h, r_col: r, t_col: t,
                        "rank": counts + 1})
    return out.sort_values([h_col, r_col, t_col]).reset_index(drop=True)


def export_property_graph(
    triples: ray.data.Dataset,
    out_dir: str,
    rel_preds: list[str],
    prop_preds: list[str],
    type_pred: str = "type",
    fill: str = "-",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> dict:
    """Property-graph EXPORT (the Neo4j-bulk-style layout every graph
    DB ingests): the triple store splits into a node table —
    (node, label, one column per `prop_preds` entry, `fill` for
    missing; label = the min `type_pred` object — and a relationship
    table (src, rel_type, dst) for predicates in `rel_preds`.  Nodes
    assemble in node_property_table's single subject-bucket exchange
    (type rides along as one more pivot column); relationships are a
    row-local filter.  Both write as partitioned CSV part files
    (one per block — resumable, never one giant file) under
    out_dir/nodes and out_dir/relationships.  Returns
    {"nodes_dir", "rels_dir"}."""
    import os

    triples = triples.materialize()  # two consumers
    nodes = node_property_table(
        triples, [type_pred] + list(prop_preds), fill=fill,
        s_col=s_col, p_col=p_col, o_col=o_col)
    nodes = nodes.map_batches(
        lambda b: b.rename_columns(
            ["node", "label"] + list(prop_preds)),
        batch_format="pyarrow")

    def rels(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "src": b.column(s_col).cast(pa.string()).to_pandas(),
            "rel_type": b.column(p_col).cast(pa.string()).to_pandas(),
            "dst": b.column(o_col).cast(pa.string()).to_pandas()})
        return df[df["rel_type"].isin(list(rel_preds))]

    rel_ds = triples.map_batches(rels, batch_format="pyarrow")
    nodes_dir = os.path.join(out_dir, "nodes")
    rels_dir = os.path.join(out_dir, "relationships")
    nodes.write_csv(nodes_dir)
    rel_ds.write_csv(rels_dir)
    return {"nodes_dir": nodes_dir, "rels_dir": rels_dir}


def import_property_graph(
    nodes_dir: str,
    rels_dir: str,
    prop_preds: list[str],
    type_pred: str = "type",
    fill: str = "-",
) -> ray.data.Dataset:
    """Property-graph IMPORT — the inverse of `export_property_graph`,
    closing the interchange loop: the Neo4j-bulk-style node table
    becomes (s=node, p=type_pred, o=label) plus one
    (s=node, p=prop, o=value) triple per non-`fill` property cell, and
    the relationship table becomes (s=src, p=rel_type, o=dst).  Both
    reads are row-local flat-maps (no exchange); `fill` cells (the
    export's missing-property marker) emit no triple, so
    export -> import is lossless up to the export's own lossy steps
    (multi-valued properties collapsed, non-min types dropped)."""
    def node_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().astype(str)
        out_s, out_p, out_o = [], [], []
        out_s += df["node"].tolist()
        out_p += [type_pred] * len(df)
        out_o += df["label"].tolist()
        for prop in prop_preds:
            keep = df[prop] != fill
            out_s += df.loc[keep, "node"].tolist()
            out_p += [prop] * int(keep.sum())
            out_o += df.loc[keep, prop].tolist()
        return pd.DataFrame({"s": out_s, "p": out_p, "o": out_o})

    def rel_triples(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().astype(str)
        return pd.DataFrame({"s": df["src"], "p": df["rel_type"],
                             "o": df["dst"]})

    nodes = ray.data.read_csv(nodes_dir).map_batches(
        node_triples, batch_format="pyarrow")
    rels = ray.data.read_csv(rels_dir).map_batches(
        rel_triples, batch_format="pyarrow")
    return nodes.union(rels)

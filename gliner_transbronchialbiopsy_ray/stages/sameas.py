"""owl:sameAs canonicalization — KG fusion's last mile: given a triple
store and a set of same-entity links (from entity resolution, q119-style
blocking, or curated mappings), rewrite every subject/object through its
canonical id and fold the now-duplicated triples.

Plan shape (scale-first):
1. sameAs links -> connected components (stages/dedup.py:
   connected_components — driver-side by default because link sets are
   ER-gated and tiny relative to the store; distributed fixpoint
   available for link graphs that aren't).
2. canonical map = {node -> min(component)} minus identities, broadcast
   ONCE via ray.put (threshold-enforced: the map covers only ALIASED
   nodes, not the corpus).
3. one streaming map_batches over the store rewrites s and o
   (vectorized pandas .map with identity fallback) — no shuffle.
4. one distinct fold (merged entities collapse equal triples) — the
   single all-to-all, skippable when the caller folds downstream.

Reference parity: the reference's entity linking canonicalizes surface
forms via dictionary lookup (stages/link.py mirrors it); this operator
is the graph-native generalization (aliases arrive as LINKS, closure
needed before rewrite).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data


def canonical_map(
    links: ray.data.Dataset,
    left_col: str = "a",
    right_col: str = "b",
    max_iterations: int = 10,
    distributed: bool = False,
) -> ray.data.Dataset:
    """(node, canon) for every node in the sameAs closure whose
    canonical id differs from itself — min id per connected component,
    identities dropped (the rewrite treats absence as identity)."""
    from .dedup import connected_components

    if links.count() == 0:  # no aliases: empty map (typed columns)
        return ray.data.from_pandas(pd.DataFrame({
            "node": pd.Series(dtype=object),
            "canon": pd.Series(dtype=object)}))
    cc = connected_components(links, max_iterations=max_iterations,
                              left_col=left_col, right_col=right_col,
                              distributed=distributed)

    def non_identity(batch: pa.Table) -> pa.Table:
        keep = pa.compute.invert(pa.compute.equal(
            batch.column("node"), batch.column("component")))
        t = batch.filter(keep)
        return pa.table({"node": t.column("node"),
                         "canon": t.column("component")})

    return cc.map_batches(non_identity, batch_format="pyarrow")


def apply_sameas(
    triples: ray.data.Dataset,
    links: ray.data.Dataset,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    left_col: str = "a",
    right_col: str = "b",
    broadcast_threshold: int = 5_000_000,
    final_distinct: bool = True,
    distributed_cc: bool = False,
    strategy: str = "broadcast",
) -> ray.data.Dataset:
    """Rewrite `triples` through the sameAs closure of `links`.

    strategy="broadcast" (default): the canonical map is collected once
    (threshold-enforced — it holds only aliased nodes) and broadcast;
    the store streams through one vectorized rewrite pass.
    strategy="shuffle": the map stays distributed and attaches via two
    native LEFT hash joins (subject, then object) — the escape hatch
    for alias sets beyond broadcast size (byte-identical output, pinned
    by test).  `final_distinct=False` skips the fold for callers that
    dedupe downstream (saturate / match_bgp both do)."""
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "shuffle":
        out = _rewrite_shuffle(triples, links, s_col, p_col, o_col,
                               left_col, right_col, distributed_cc)
    else:
        cmap = canonical_map(links, left_col, right_col,
                             distributed=distributed_cc).to_pandas()
        if len(cmap) > broadcast_threshold:
            raise ValueError(
                f"canonical map has {len(cmap)} aliased nodes > "
                f"broadcast_threshold={broadcast_threshold}; use "
                "strategy='shuffle' at this scale")
        ref = ray.put(pd.Series(cmap["canon"].to_numpy(),
                                index=cmap["node"].to_numpy()))

        def rewrite(batch: pa.Table, _ref=ref) -> pd.DataFrame:
            m = ray.get(_ref)
            df = pd.DataFrame({
                s_col: batch.column(s_col).to_pandas(),
                p_col: batch.column(p_col).to_pandas(),
                o_col: batch.column(o_col).to_pandas(),
            })
            for c in (s_col, o_col):
                hit = df[c].map(m)
                df[c] = hit.where(hit.notna(), df[c])
            return df

        out = triples.map_batches(rewrite, batch_format="pyarrow")

    if final_distinct:
        local = out.map_batches(
            lambda b: b.to_pandas().drop_duplicates(),
            batch_format="pyarrow")
        out = (local.groupby([s_col, p_col, o_col]).count()
               .drop_columns(["count()"]))
    return out


def _rewrite_shuffle(triples, links, s_col, p_col, o_col,
                     left_col, right_col, distributed_cc):
    """Distributed rewrite: the canonical map attaches via two native
    LEFT hash joins (subject, then object); nulls mean "no alias, keep
    the original id".  Join inputs are coalesced (empty-block quirk)."""
    from .joins import coalesce_for_join

    try:
        num_partitions = max(
            2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    except Exception:
        num_partitions = 2
    cmap = canonical_map(links, left_col, right_col,
                         distributed=distributed_cc).materialize()
    t = triples.select_columns([s_col, p_col, o_col]).materialize()
    if cmap.count() == 0:
        return t

    def attach(ds, col):
        side = cmap.map_batches(
            lambda b: pa.table({"_k": b.column("node"),
                                "_canon": b.column("canon")}),
            batch_format="pyarrow").materialize()
        j = coalesce_for_join(ds, num_partitions).join(
            coalesce_for_join(side, num_partitions),
            join_type="left_outer", num_partitions=num_partitions,
            on=(col,), right_on=("_k",))

        def fill(batch: pa.Table, _c=col) -> pd.DataFrame:
            df = batch.to_pandas()
            df[_c] = df["_canon"].where(df["_canon"].notna(), df[_c])
            return df.drop(columns=["_canon"])[[s_col, p_col, o_col]]

        return j.map_batches(fill, batch_format="pyarrow").materialize()

    return attach(attach(t, s_col), o_col)

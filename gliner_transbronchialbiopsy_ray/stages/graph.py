"""Graph analytics over edge tables (KG-construction companions to the
dedup connected-components fixpoint): bipartite PageRank via iterative
join + grouped-sum rounds.

Scale shape: ranks live in DATASETS co-partitioned with the edges by
native hash joins — no rank vector is ever broadcast or collected, so
node count is unbounded (the same pattern as
`stages/dedup.py:_cc_distributed`).  Per iteration: one join to attach
the source rank to each edge, one grouped sum to fold contributions into
the destination — both all-to-all on the edge set, which is the
irreducible cost of power iteration.  Degree normalization is
precomputed ONCE and carried on the edge rows (inv_deg), so iterations
ship only (edge, rank) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum


def _distinct_edges(edges: ray.data.Dataset, left: str, right: str):
    """Distinct (left, right) pairs: per-batch dedupe combiner, then one
    grouped pass (count column dropped)."""

    def local(batch: pa.Table) -> pd.DataFrame:
        return (
            batch.select([left, right]).to_pandas().drop_duplicates()
        )

    return (
        edges.map_batches(local, batch_format="pyarrow")
        .groupby([left, right]).count()
        .drop_columns(["count()"])
    )


def bipartite_pagerank(
    edges: ray.data.Dataset,
    left: str = "user_id",
    right: str = "event_type",
    iters: int = 3,
    damping: float = 0.85,
    num_partitions: int = 8,
    update_left_last: bool = True,
    strategy: str = "collapse",
) -> tuple[pd.DataFrame, ray.data.Dataset]:
    """PageRank on the bipartite graph defined by distinct (left, right)
    edge pairs, alternating left->right and right->left updates:

        rank_r = (1-d)/N_r + d * sum_{l->r} rank_l / deg(l)
        rank_l = (1-d)/N_l + d * sum_{l->r} rank_r / deg(r)

    Returns (right-side ranks as a small DataFrame, left-side ranks as a
    Dataset — left nodes are unbounded, so they stay distributed).

    Strategies (each exploits progressively more structure):

    - "join" — fully join-based power iteration; the general path when
      BOTH node sets are unbounded.  Per iteration: 2 hash joins +
      2 grouped sums over the edge set.
    - "broadcast" — right node set is a BOUNDED enum (event types,
      labels — the repo's usual broadcast-small-side contract): right
      ranks are folded from per-batch partials and broadcast into the
      next update, and the per-left degree is re-derived inside the
      r->l grouped fold.  1 hash join per iteration.
    - "collapse" (default) — bounded right side with <= 64 distinct
      values: every left node is reduced to its neighbor-set BITMASK
      (one groupby(left) summing 1<<r_index over distinct edges), and
      left nodes collapse into equivalence classes per mask — degree
      and adjacency are functions of the mask alone.  The whole power
      iteration then runs on the (n_classes x n_right) class matrix on
      the driver: ZERO joins, arbitrary iteration count for free.
      Falls back to "broadcast" when more than 64 right values exist.

    All unbounded graph state flows through joins/groupbys over the edge
    set; driver-side values are the node counts plus (bounded paths
    only) the right-side rank vector / class-count table."""
    if strategy == "collapse":
        return _pagerank_collapse_right(
            edges, left, right, iters, damping, num_partitions,
            update_left_last)
    if strategy == "broadcast":
        return _pagerank_broadcast_right(
            edges, left, right, iters, damping, num_partitions,
            update_left_last)
    if strategy != "join":
        raise ValueError(f"unknown pagerank strategy: {strategy!r}")
    e = _distinct_edges(edges, left, right).materialize()

    deg_l = e.groupby(left).count()
    deg_r = e.groupby(right).count()
    n_l = deg_l.count()
    n_r = deg_r.count()

    def inv(col_out):
        def f(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df[col_out] = 1.0 / df["count()"]
            return df.drop(columns=["count()"])
        return f

    # edges annotated once with the source-side inverse degree
    e_l = e.join(deg_l.map_batches(inv("inv_deg_l"), batch_format="pyarrow"),
                 join_type="inner", num_partitions=num_partitions,
                 on=(left,), right_on=(left,)).materialize()
    e_r = e.join(deg_r.map_batches(inv("inv_deg_r"), batch_format="pyarrow"),
                 join_type="inner", num_partitions=num_partitions,
                 on=(right,), right_on=(right,)).materialize()

    ranks_l = deg_l.map_batches(
        lambda b: pd.DataFrame({left: b.column(left).to_pandas(),
                                "rank": np.full(b.num_rows, 1.0 / n_l)}),
        batch_format="pyarrow",
    ).materialize()

    base_r = (1.0 - damping) / n_r
    base_l = (1.0 - damping) / n_l
    ranks_r = None
    for it in range(iters):
        # left -> right
        contrib = e_l.join(ranks_l, join_type="inner",
                           num_partitions=num_partitions,
                           on=(left,), right_on=(left,))

        def crow(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df["c"] = df["rank"] * df["inv_deg_l"]
            return df[[right, "c"]]

        ranks_r = (
            contrib.map_batches(crow, batch_format="pyarrow")
            .groupby(right).aggregate(Sum("c", alias_name="c"))
            .map_batches(
                lambda b: pd.DataFrame({
                    right: b.column(right).to_pandas(),
                    "rank": base_r + damping
                            * b.column("c").to_numpy(zero_copy_only=False)}),
                batch_format="pyarrow",
            ).materialize()
        )

        # right -> left.  The LAST left update feeds nothing unless the
        # caller wants final left ranks (it is not an input to any
        # returned right rank) — skip the full join+shuffle round then.
        if it == iters - 1 and not update_left_last:
            break
        contrib2 = e_r.join(ranks_r, join_type="inner",
                            num_partitions=num_partitions,
                            on=(right,), right_on=(right,))

        def crow2(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df["c"] = df["rank"] * df["inv_deg_r"]
            return df[[left, "c"]]

        ranks_l = (
            contrib2.map_batches(crow2, batch_format="pyarrow")
            .groupby(left).aggregate(Sum("c", alias_name="c"))
            .map_batches(
                lambda b: pd.DataFrame({
                    left: b.column(left).to_pandas(),
                    "rank": base_l + damping
                            * b.column("c").to_numpy(zero_copy_only=False)}),
                batch_format="pyarrow",
            ).materialize()
        )

    out_r = ranks_r.to_pandas()  # right side is the bounded enum — tiny
    out_r["rank"] = out_r["rank"].round(6)
    out_r = out_r.sort_values(right).reset_index(drop=True)
    return out_r, ranks_l


def _pagerank_collapse_right(
    edges: ray.data.Dataset,
    left: str,
    right: str,
    iters: int,
    damping: float,
    num_partitions: int,
    update_left_last: bool,
) -> tuple[pd.DataFrame, ray.data.Dataset]:
    """Neighbor-bitmask equivalence-class collapse (right side <= 64
    values).  A left node's contribution to every rank is a function of
    ONLY its distinct-neighbor set, so left nodes with the same set are
    interchangeable.  Distributed part: distinct edges, right-side
    degrees, one groupby(left) summing 1 << r_index into a mask (each
    bit appears once — edges are distinct), then a per-batch mask
    histogram folded on the driver (integer counts: order-safe).  The
    power iteration is numpy over the (n_masks, n_right) 0/1 matrix
    weighted by class counts — no joins, iterations are free."""
    e = _distinct_edges(edges, left, right).materialize()

    deg_r = e.groupby(right).count().to_pandas().sort_values(right)
    n_r = len(deg_r)
    if n_r > 64:
        return _pagerank_broadcast_right(
            edges, left, right, iters, damping, num_partitions,
            update_left_last)
    r_vals = list(deg_r[right])
    r_idx = {v: i for i, v in enumerate(r_vals)}
    inv_r = 1.0 / deg_r["count()"].to_numpy(dtype=float)

    def to_bits(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame({
            left: df[left],
            "bit": np.left_shift(
                np.int64(1), df[right].map(r_idx).to_numpy(dtype=np.int64)),
        })

    masks = (
        e.map_batches(to_bits, batch_format="pyarrow")
        .groupby(left).aggregate(Sum("bit", alias_name="mask"))
        .materialize()
    )

    def mask_hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = df.groupby("mask").size()
        return pd.DataFrame({"mask": g.index, "cnt": g.values})

    hist = masks.map_batches(
        mask_hist, batch_format="pyarrow").to_pandas()
    hist = hist.groupby("mask", as_index=False)["cnt"].sum()
    hist = hist.sort_values("mask").reset_index(drop=True)

    mask_vals = hist["mask"].to_numpy(dtype=np.int64)
    cnt = hist["cnt"].to_numpy(dtype=float)
    # (n_masks, n_r) 0/1 adjacency of each equivalence class
    P = ((mask_vals[:, None] >> np.arange(n_r)[None, :]) & 1).astype(float)
    deg_cls = P.sum(axis=1)
    n_l = float(cnt.sum())

    base_r = (1.0 - damping) / n_r
    base_l = (1.0 - damping) / n_l
    rank_cls = np.full(len(cnt), 1.0 / n_l)  # per-class left rank
    rank_r = None
    for it in range(iters):
        contrib = cnt * rank_cls / deg_cls
        rank_r = base_r + damping * (P.T @ contrib)
        if it == iters - 1 and not update_left_last:
            break
        rank_cls = base_l + damping * (P @ (rank_r * inv_r))

    out_r = pd.DataFrame({right: r_vals, "rank": rank_r.round(6)})
    out_r = out_r.sort_values(right).reset_index(drop=True)

    # left ranks: broadcast the tiny {mask: class rank} table
    cls_rank = dict(zip(mask_vals.tolist(), rank_cls.tolist()))

    def expand(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame({left: df[left],
                             "rank": df["mask"].map(cls_rank)})

    ranks_l = masks.map_batches(expand, batch_format="pyarrow")
    return out_r, ranks_l


def _pagerank_broadcast_right(
    edges: ray.data.Dataset,
    left: str,
    right: str,
    iters: int,
    damping: float,
    num_partitions: int,
    update_left_last: bool,
) -> tuple[pd.DataFrame, ray.data.Dataset]:
    """Bounded-right-side power iteration: right ranks live on the
    driver (tiny), left state stays a Dataset.  Per iteration:

      l->r: ONE hash join (edges x left-state) -> per-batch partial sums
            over the bounded right key -> order-canonical driver fold
            (partials sorted before summing; float addition is
            order-sensitive and Ray delivers blocks in completion order).
      r->l: broadcast {r: rank_r/deg_r} lookup over the raw edge set ->
            groupby(left) folding Sum(c) AND Count() in one pass — the
            count over distinct edges IS deg(l), so the left state
            (rank, inv_deg) rebuilds with no second join.
    """
    from ray.data.aggregate import Count

    e = _distinct_edges(edges, left, right).materialize()

    deg_l = e.groupby(left).count()
    n_l = deg_l.count()
    # bounded side: degrees collect to a tiny driver frame
    deg_r = e.groupby(right).count().to_pandas()
    n_r = len(deg_r)
    inv_r = {k: 1.0 / c for k, c in
             zip(deg_r[right], deg_r["count()"])}

    def init_state(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame({
            left: df[left],
            "rank": np.full(len(df), 1.0 / n_l),
            "inv_deg_l": 1.0 / df["count()"],
        })

    state_l = deg_l.map_batches(
        init_state, batch_format="pyarrow").materialize()

    base_r = (1.0 - damping) / n_r
    base_l = (1.0 - damping) / n_l
    rank_r = None
    for it in range(iters):
        # left -> right: join attaches (rank, inv_deg_l) to each edge
        joined = e.join(state_l, join_type="inner",
                        num_partitions=num_partitions,
                        on=(left,), right_on=(left,))

        def partial_r(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            if not len(df):
                return pd.DataFrame({right: pd.Series(dtype=object),
                                     "c": pd.Series(dtype=float)})
            g = (df["rank"] * df["inv_deg_l"]).groupby(df[right]).sum()
            return pd.DataFrame({right: g.index, "c": g.values})

        parts = joined.map_batches(
            partial_r, batch_format="pyarrow").to_pandas()
        parts = parts.sort_values([right, "c"], kind="mergesort")
        rank_r = base_r + damping * parts.groupby(right)["c"].sum()

        # right -> left (skippable last round: it feeds nothing returned)
        if it == iters - 1 and not update_left_last:
            break
        w = {k: rank_r[k] * inv_r[k] for k in rank_r.index}

        def contrib_l(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            return pd.DataFrame({left: df[left],
                                 "c": df[right].map(w)})

        folded = (
            e.map_batches(contrib_l, batch_format="pyarrow")
            .groupby(left)
            .aggregate(Sum("c", alias_name="c"), Count())
        )

        def upd(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            return pd.DataFrame({
                left: df[left],
                "rank": base_l + damping * df["c"],
                "inv_deg_l": 1.0 / df["count()"],
            })

        state_l = folded.map_batches(
            upd, batch_format="pyarrow").materialize()

    out_r = pd.DataFrame({right: rank_r.index,
                          "rank": rank_r.values.round(6)})
    out_r = out_r.sort_values(right).reset_index(drop=True)
    ranks_l = state_l.drop_columns(["inv_deg_l"])
    return out_r, ranks_l


def k_hop_reachability(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    strategy: str = "auto",
    broadcast_threshold: int = 500_000,
) -> ray.data.Dataset:
    """Min-hop BFS reachability: (node, hops) for every node within `k`
    directed hops of the seed set — the iterative-traversal operator Ray
    Data has no primitive for (recursive CTE / Datalog semi-naive
    equivalent).

    Per hop: ONE native hash join (frontier x edges — semi-naive: only
    the nodes first reached last hop, never the whole visited set, join
    the edge table) and ONE union+groupby-min fold that simultaneously
    dedupes the expansion, drops already-visited nodes (their existing
    smaller hop wins the min) and refreshes the visited set.  Everything
    stays in co-partitioned datasets — no node set is ever broadcast or
    collected, so graph size is unbounded; per-hop driver barriers are
    O(1) counts for early exit.

    Cost contract: k hops = k (join + grouped-min) all-to-all rounds;
    the join is O(frontier + edges), the fold O(visited + expansion) —
    the irreducible shape of distributed BFS.  Inputs and the per-hop
    state are MATERIALIZED (narrow (node, hops) rows): iterative lineage
    re-execution, not data volume, is what kills a lazy BFS (observed
    8x wall-time from re-running the edge pipeline every hop).

    `num_partitions` sizes the hash-join aggregator actors (default
    max(2, CPU//2): a small session deadlocks waiting for actors it
    cannot place).  `seeds`: a dataset with a `node` column (duplicates
    allowed).  Output: (node, hops), hops = min #edges from any seed.

    `strategy`: "join" = the unbounded-graph per-round hash join;
    "broadcast" keeps (node, hops) driver-resident and streams the
    materialized edge set once per round (no shuffle), correct under
    the reached-node-count <= `broadcast_threshold` contract (the
    k_core_peel / dag_longest_path auto discipline, equivalence pinned
    by test); "auto" switches to broadcast when the seed count is
    under the threshold and falls back to "join" mid-run if the
    reached set outgrows it.
    """
    from .joins import coalesce_for_join

    if strategy not in ("auto", "join", "broadcast"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    if strategy != "join":
        seed_ids = [int(r["node"]) for r in
                    seeds.select_columns(["node"]).take_all()]
        if strategy == "broadcast" or len(seed_ids) <= broadcast_threshold:
            eds = coalesce_for_join(
                edges.select_columns([src, dst]), num_partitions
            ).materialize()
            best: dict[int, int] = {s: 0 for s in seed_ids}
            frontier = dict(best)
            overflow = False
            for _hop in range(1, k + 1):
                if not frontier:
                    break
                ref = ray.put(set(frontier))

                def expand_b(b: pa.Table, _r=ref) -> pa.Table:
                    fr = ray.get(_r)
                    u = b.column(src).to_pylist()
                    v = b.column(dst).to_pylist()
                    nxt = {vv for uu, vv in zip(u, v) if uu in fr}
                    return pa.table({"node": pa.array(
                        sorted(nxt), type=pa.int64())})

                parts = eds.map_batches(
                    expand_b, batch_format="pyarrow").take_all()
                frontier = {}
                for r in parts:
                    n = int(r["node"])
                    if n not in best:
                        frontier[n] = _hop
                best.update(frontier)
                if len(best) > broadcast_threshold:
                    overflow = True
                    break
            if not overflow:
                items = sorted(best.items())
                return ray.data.from_arrow(pa.table({
                    "node": pa.array([n for n, _ in items],
                                     type=pa.int64()),
                    "hops": pa.array([h for _, h in items],
                                     type=pa.int64())}))
            # reached set outgrew the contract: restart on the join
            # path (correct but slower — the at-scale default)

    def as_visited(batch: pa.Table) -> pa.Table:
        ids = pd.unique(batch.column("node").to_pandas())
        # Arrow out, uniformly: a pandas/arrow block MIX in one dataset
        # trips the groupby sort-sampler's block-type assertion
        return pa.table({"node": pa.array(ids.astype("int64")),
                         "hops": pa.array(np.zeros(len(ids), "int64"))})

    def _minfold(ds: ray.data.Dataset) -> ray.data.Dataset:
        return (ds.groupby("node").min("hops")
                .map_batches(lambda b: b.rename_columns(["node", "hops"]),
                             batch_format="pyarrow"))

    visited = _minfold(
        seeds.map_batches(as_visited, batch_format="pyarrow")).materialize()
    frontier = visited
    # edges re-run once per hop otherwise (lazy lineage), and the join
    # quirk workaround needs non-empty blocks anyway
    edges = coalesce_for_join(
        edges.select_columns([src, dst]), num_partitions).materialize()

    for hop in range(1, k + 1):
        expand = coalesce_for_join(
            frontier.drop_columns(["hops"]), num_partitions
        ).join(
            edges, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=(src,),
        )

        def project(batch: pa.Table, _h=hop) -> pa.Table:
            ids = pd.unique(batch.column(dst).to_pandas())
            return pa.table({"node": pa.array(ids.astype("int64")),
                             "hops": pa.array(np.full(len(ids), _h, "int64"))})

        nxt = expand.map_batches(project, batch_format="pyarrow")
        # one fold: dedupe expansion + drop visited (smaller hop wins the
        # min) + refresh visited
        visited = _minfold(visited.union(nxt)).materialize()
        frontier = visited.map_batches(
            lambda b, _h=hop: b.filter(pc.equal(b.column("hops"), _h)),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
    return visited


def _default_join_partitions() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    except Exception:
        return 2


def _tag_int_bucket(df: pd.DataFrame, key: str, n_buckets: int,
                    col: str = "_bucket") -> pd.DataFrame:
    """Vectorized coarse shuffle-key for int columns: `n_buckets` Ray
    groups instead of one group PER KEY — groupby().map_groups pays
    ~10 ms of slicing overhead per group, so thousands of tiny key
    groups turn into minutes while 32 coarse buckets with a vectorized
    pandas kernel inside cost one all-to-all (the stages/dedup.py
    N_HASH_BUCKETS discipline, int-key fast path)."""
    df[col] = (df[key].to_numpy("int64") % n_buckets).astype("int32")
    return df


def _group_slices(sorted_keys: np.ndarray):
    """(start, end) index pairs of equal-key runs in a sorted array."""
    starts = np.flatnonzero(
        np.r_[True, sorted_keys[1:] != sorted_keys[:-1]])
    return zip(starts, np.r_[starts[1:], len(sorted_keys)])


def cooccurrence_edges(
    items: ray.data.Dataset,
    group_col: str,
    item_col: str,
    min_count: int = 2,
    max_items_per_group: int | None = None,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Co-occurrence KG edge construction ("frequently bought together"):
    undirected edges (a, b, n) between items appearing in >= `min_count`
    common groups, with a < b canonical orientation.

    Shape: per-batch local (group, item) distinct combiner -> ONE
    group-bucketed shuffle whose in-bucket kernel finishes the distinct
    AND emits each group's C(d, 2) pairs pre-counted per bucket (no
    self-join: the d^2 row blowup happens inside a vectorized kernel,
    not the exchange) -> ONE pair-bucketed shuffle summing the partial
    counts.  Two coarse all-to-alls total, n_buckets groups each.

    A group with d items emits d*(d-1)/2 pairs — the classic hub blowup
    (a crawl page listing 10k products).  `max_items_per_group` drops
    groups above the cap (the standard market-basket mitigation: a group
    that large carries no signal); None keeps everything.
    """

    def distinct_local(batch: pa.Table) -> pd.DataFrame:
        df = (batch.select([group_col, item_col]).to_pandas()
              .drop_duplicates())
        return _tag_int_bucket(df, group_col, n_buckets)

    tagged = items.map_batches(distinct_local, batch_format="pyarrow")

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = (g[[group_col, item_col]].drop_duplicates()
              .sort_values([group_col, item_col], kind="stable"))
        grp = df[group_col].to_numpy("int64")
        it = df[item_col].to_numpy("int64")
        aa, bb = [], []
        for s, e in _group_slices(grp):
            d = e - s
            if d < 2 or (max_items_per_group is not None
                         and d > max_items_per_group):
                continue
            iu = np.triu_indices(d, k=1)
            aa.append(it[s:e][iu[0]])
            bb.append(it[s:e][iu[1]])
        if not aa:
            # MUST carry the _bucket tag: the next groupby("_bucket")
            # fails on any block missing the column (caught by a
            # full-suite q246 run where one bucket emitted no pairs)
            return _tag_int_bucket(
                pd.DataFrame({"a": np.empty(0, "int64"),
                              "b": np.empty(0, "int64"),
                              "n": np.empty(0, "int64")}),
                "a", n_buckets)
        out = pd.DataFrame({"a": np.concatenate(aa),
                            "b": np.concatenate(bb)})
        # pre-count within the bucket: shuffle volume = distinct pairs
        out = (out.groupby(["a", "b"], sort=False).size()
               .reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return _tag_int_bucket(out, "a", n_buckets)

    partials = tagged.groupby("_bucket").map_groups(
        gen_pairs, batch_format="pandas")

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["a", "b"], sort=False)["n"].sum()
               .reset_index())
        if min_count > 1:
            out = out[out["n"] >= min_count]
        return out

    return partials.groupby("_bucket").map_groups(
        sum_pairs, batch_format="pandas")


def triangle_counts(
    edges: ray.data.Dataset,
    src: str = "a",
    dst: str = "b",
    num_partitions: int | None = None,
    order: str = "id",
) -> ray.data.Dataset:
    """Per-node triangle counts over an undirected edge set with a < b
    canonical orientation (distinct pairs) — the KG/community-structure
    primitive Ray Data has no operator for.

    Wedge-closure plan: a src-bucketed shuffle (coarse `_bucket`, not one
    group per node) whose kernel emits each pivot's higher-neighbor pairs
    (w1 < w2, the wedge legs), then ONE native two-key hash join against
    the edge set closes the wedge ((w1, w2) IN edges <=> triangle).  Each
    triangle (x < y < z) is found exactly once (pivot = x).  Per-node
    counts: every closed wedge emits its three corners, pre-counted per
    batch, into a node-bucketed grouped sum.

    Cost: wedges per pivot = C(out-degree, 2).  `order="id"` orients
    edges by node id (matches the SQL oracle's shape); `order="degree"`
    re-orients every edge from the lower-degree endpoint to the higher
    (ties by id) — the Cohen/GAP trick that caps out-degree at
    O(sqrt(edges)), so a hub with a million neighbors pivots last and
    emits NO wedges instead of 10^12.  Triangle counts are orientation-
    invariant (each triangle still found exactly once), so both orders
    return identical output — degree order is the 100 TB default, id
    order keeps the oracle comparable.  The join is the irreducible
    all-to-all; degree ordering costs one extra degree fold + broadcast.
    """
    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    n_buckets = 32

    if order == "degree":
        edges = _orient_by_degree(edges, src, dst, n_buckets)
    elif order != "id":
        raise ValueError(f"unknown order {order!r}")
    # two consumers below (wedge gen + closure join): pin the edge set so
    # lazy lineage doesn't re-run the upstream edge pipeline twice
    edges = edges.materialize()

    has_ord = order == "degree"

    def tag(batch: pa.Table) -> pd.DataFrame:
        return _tag_int_bucket(batch.to_pandas(), src, n_buckets)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # out-neighbors sorted by the SAME total order that oriented the
        # edges ((degree, id) or plain id), so every wedge pair (w1, w2)
        # matches the closing edge's (src, dst) orientation exactly
        sort_cols = [src, "_ord", dst] if has_ord else [src, dst]
        df = g.sort_values(sort_cols, kind="stable")
        sa = df[src].to_numpy("int64")
        da = df[dst].to_numpy("int64")
        w1, w2, pv = [], [], []
        for s, e in _group_slices(sa):
            d = e - s
            if d < 2:
                continue
            iu = np.triu_indices(d, k=1)
            w1.append(da[s:e][iu[0]])
            w2.append(da[s:e][iu[1]])
            pv.append(np.full(len(iu[0]), sa[s], "int64"))
        if not w1:
            return pd.DataFrame({"w1": np.empty(0, "int64"),
                                 "w2": np.empty(0, "int64"),
                                 "pivot": np.empty(0, "int64")})
        return pd.DataFrame({"w1": np.concatenate(w1),
                             "w2": np.concatenate(w2),
                             "pivot": np.concatenate(pv)})

    w = (edges.map_batches(tag, batch_format="pyarrow")
         .groupby("_bucket").map_groups(wedges, batch_format="pandas"))
    e = coalesce_for_join(edges.select_columns([src, dst]), num_partitions)
    closed = coalesce_for_join(w, num_partitions).join(
        e, join_type="inner", num_partitions=num_partitions,
        on=("w1", "w2"), right_on=(src, dst),
    )

    def corner_partials(batch: pa.Table) -> pd.DataFrame:
        w1 = batch.column("w1").to_numpy()
        w2 = batch.column("w2").to_numpy()
        pv = batch.column("pivot").to_numpy()
        node, cnt = np.unique(
            np.concatenate([pv, w1, w2]).astype("int64"),
            return_counts=True)
        return _tag_int_bucket(
            pd.DataFrame({"node": node, "triangles": cnt.astype("int64")}),
            "node", n_buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("node", sort=False)["triangles"].sum()
                .reset_index())

    return (closed.map_batches(corner_partials, batch_format="pyarrow")
            .groupby("_bucket").map_groups(fold, batch_format="pandas"))


def _orient_by_degree(edges: ray.data.Dataset, src: str, dst: str,
                      n_buckets: int) -> ray.data.Dataset:
    """Re-orient each undirected edge from its lower-(degree, id) endpoint
    to the higher — acyclic orientation with out-degree capped at
    O(sqrt(|E|)), the hub defense for wedge generation.  Output carries
    `_ord` = degree of the new dst (the neighbor sort key).  One degree
    fold + two native hash joins."""
    from .joins import coalesce_for_join

    nparts = _default_join_partitions()

    def ends(batch: pa.Table) -> pd.DataFrame:
        u = batch.column(src).to_numpy()
        v = batch.column(dst).to_numpy()
        node, cnt = np.unique(np.concatenate([u, v]).astype("int64"),
                              return_counts=True)
        return _tag_int_bucket(
            pd.DataFrame({"node": node, "deg": cnt.astype("int64")}),
            "node", n_buckets)

    deg = (edges.map_batches(ends, batch_format="pyarrow")
           .groupby("_bucket")
           .map_groups(lambda g: g.groupby("node", sort=False)["deg"]
                       .sum().reset_index(), batch_format="pandas"))
    deg = coalesce_for_join(deg, nparts)
    e1 = coalesce_for_join(edges.select_columns([src, dst]), nparts).join(
        deg, join_type="inner", num_partitions=nparts,
        on=(src,), right_on=("node",),
    ).rename_columns({"deg": "_sdeg"})
    e2 = coalesce_for_join(e1, nparts).join(
        deg, join_type="inner", num_partitions=nparts,
        on=(dst,), right_on=("node",),
    ).rename_columns({"deg": "_ddeg"})

    def orient(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        u = df[src].to_numpy("int64")
        v = df[dst].to_numpy("int64")
        du = df["_sdeg"].to_numpy("int64")
        dv = df["_ddeg"].to_numpy("int64")
        swap = (dv < du) | ((dv == du) & (v < u))
        return pd.DataFrame({
            src: np.where(swap, v, u),
            dst: np.where(swap, u, v),
            "_ord": np.where(swap, du, dv),  # degree of the new dst
        })

    return e2.map_batches(orient, batch_format="pyarrow")


def subclass_closure(sub: pd.DataFrame, child: str = "child",
                     parent: str = "parent") -> pd.DataFrame:
    """Reflexive-transitive closure of a SMALL subClassOf DAG (the
    ontology side of RDFS entailment — bounded by the schema, not the
    corpus, so it closes driver-side and broadcasts).  Returns
    (child, anc) including (c, c).  Raises on a cycle."""
    parents: dict = {}
    for c, p in zip(sub[child], sub[parent]):
        parents.setdefault(c, set()).add(p)
    out_child, out_anc = [], []
    for c in sorted(parents):
        seen, frontier = {c}, {c}
        while frontier:
            raw = set()
            for n in frontier:
                raw |= parents.get(n, set())
            if c in raw:
                raise ValueError(f"subclass cycle reachable from {c!r}")
            frontier = raw - seen
            seen |= frontier
        for a in sorted(seen):
            out_child.append(c)
            out_anc.append(a)
    return pd.DataFrame({"child": out_child, "anc": out_anc})


def entail_types(
    instance_types: ray.data.Dataset,
    sub: pd.DataFrame,
    inst_col: str = "inst",
    cls_col: str = "cls",
) -> ray.data.Dataset:
    """RDFS subClassOf entailment materialization: every (instance, class)
    assertion is expanded to (instance, ancestor) for each ancestor in
    the closed hierarchy (rdfs9: a type C, C subClassOf* D => a type D).

    The ontology is the broadcast-small side (`ray.put` once, merged
    against each batch vectorized); instances stream unbounded.  Classes
    absent from the hierarchy entail only themselves.  Output may repeat
    (inst, anc) when an instance has multiple direct types sharing an
    ancestor — dedupe downstream if set semantics are needed."""
    clos = subclass_closure(sub)
    known = set(clos["child"])
    ref = ray.put(clos)

    def expand(batch: pa.Table) -> pd.DataFrame:
        closure = ray.get(ref)
        df = batch.select([inst_col, cls_col]).to_pandas()
        hit = df.merge(closure, left_on=cls_col, right_on="child")
        out = hit[[inst_col, "anc"]].rename(columns={"anc": cls_col})
        miss = df[~df[cls_col].isin(known)]
        if len(miss):
            out = pd.concat([out, miss[[inst_col, cls_col]]],
                            ignore_index=True)
        return out

    return instance_types.map_batches(expand, batch_format="pyarrow")


def k_hop_min_cost(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    num_partitions: int | None = None,
    strategy: str = "auto",
    broadcast_threshold: int = 500_000,
) -> ray.data.Dataset:
    """Bounded-hop Bellman-Ford: (node, cost) = cheapest weighted path
    from any seed within `k` edges — the weighted generalization of
    `k_hop_reachability` (same semi-naive discipline: only nodes whose
    best cost IMPROVED last round join the edge table next round).

    Per hop: ONE native hash join (frontier x edges) relaxes the
    frontier's out-edges, then ONE union + grouped-min fold computes the
    new best per node AND detects improvement without a second join —
    existing rows carry `old` = their cost, candidate rows carry
    `old` = +inf sentinel; after min-folding both columns, cost < old
    <=> the node improved, so the frontier falls out of the same pass.
    State is narrow (node, cost) rows, materialized per hop (lazy
    lineage would re-run the edge pipeline every round); no node set is
    broadcast or collected.  Weights must be non-negative (Bellman-Ford
    correctness under bounded rounds); int64 costs keep the fold exact.

    `strategy`: "join" = the unbounded path above; "broadcast" keeps
    (node, cost) driver-resident and streams the materialized edge set
    once per round (the k_hop_reachability / dag_longest_path auto
    discipline, reached-node count <= `broadcast_threshold`,
    equivalence pinned by test; falls back to "join" mid-run on
    overflow); "auto" picks by seed count.
    """
    from ray.data.aggregate import Min

    from .joins import coalesce_for_join

    if strategy not in ("auto", "join", "broadcast"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if num_partitions is None:
        num_partitions = _default_join_partitions()
    BIG = np.int64(2**62)

    if strategy != "join":
        seed_ids = [int(r["node"]) for r in
                    seeds.select_columns(["node"]).take_all()]
        if strategy == "broadcast" or len(seed_ids) <= broadcast_threshold:
            eds = coalesce_for_join(
                edges.select_columns([src, dst, weight]), num_partitions
            ).materialize()
            best: dict[int, int] = {s: 0 for s in seed_ids}
            frontier = dict(best)
            overflow = False
            for _hop in range(k):
                if not frontier:
                    break
                ref = ray.put(frontier)

                def relax_b(b: pa.Table, _r=ref) -> pd.DataFrame:
                    fr = ray.get(_r)
                    u = b.column(src).to_pylist()
                    v = b.column(dst).to_pylist()
                    w = b.column(weight).to_pylist()
                    cand: dict[int, int] = {}
                    for uu, vv, ww in zip(u, v, w):
                        cu = fr.get(uu)
                        if cu is not None:
                            nc = cu + int(ww)
                            if nc < cand.get(vv, 1 << 63):
                                cand[vv] = nc
                    return pd.DataFrame({
                        "node": pd.Series(list(cand.keys()),
                                          dtype="int64"),
                        "cost": pd.Series(list(cand.values()),
                                          dtype="int64")})

                parts = eds.map_batches(
                    relax_b, batch_format="pyarrow").take_all()
                frontier = {}
                for r in parts:
                    n, c = int(r["node"]), int(r["cost"])
                    if (c < best.get(n, 1 << 63)
                            and c < frontier.get(n, 1 << 63)):
                        frontier[n] = c
                best.update(frontier)
                if len(best) > broadcast_threshold:
                    overflow = True
                    break
            if not overflow:
                items = sorted(best.items())
                return ray.data.from_arrow(pa.table({
                    "node": pa.array([n for n, _ in items],
                                     type=pa.int64()),
                    "cost": pa.array([c for _, c in items],
                                     type=pa.int64())}))
            # fall through to the join path on overflow

    def as_seed(batch: pa.Table) -> pa.Table:
        ids = pd.unique(batch.column("node").to_pandas())
        z = np.zeros(len(ids), "int64")
        return pa.table({"node": pa.array(ids.astype("int64")),
                         "cost": pa.array(z), "old": pa.array(z)})

    def _fold(ds: ray.data.Dataset) -> ray.data.Dataset:
        folded = ds.groupby("node").aggregate(
            Min("cost", alias_name="cost"), Min("old", alias_name="old"))
        return folded

    best = _fold(
        seeds.map_batches(as_seed, batch_format="pyarrow")).materialize()
    frontier = best
    edges = coalesce_for_join(
        edges.select_columns([src, dst, weight]), num_partitions
    ).materialize()

    for hop in range(k):
        expand = coalesce_for_join(
            frontier.select_columns(["node", "cost"]), num_partitions
        ).join(
            edges, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=(src,),
        )

        def relax(batch: pa.Table) -> pa.Table:
            c = (batch.column("cost").to_numpy()
                 + batch.column(weight).to_numpy()).astype("int64")
            return pa.table({
                "node": batch.column(dst).cast(pa.int64()),
                "cost": pa.array(c),
                "old": pa.array(np.full(len(c), BIG, "int64")),
            })

        cand = expand.map_batches(relax, batch_format="pyarrow")
        # prior best rows: old = current cost (improvement sentinel)
        prior = best.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "cost": b.column("cost"),
                                "old": b.column("cost")}),
            batch_format="pyarrow")
        best = _fold(prior.union(cand)).materialize()
        if hop == k - 1:
            break  # final best computed; next frontier would go unused
        frontier = best.map_batches(
            lambda b: b.filter(pc.less(b.column("cost"), b.column("old"))),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
    return best.select_columns(["node", "cost"])


def negative_sample_pairs(
    pos: ray.data.Dataset,
    s_col: str,
    o_col: str,
    k: int = 3,
    modulus: int | None = None,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """KG-embedding negative sampling: for every positive pair (s, o) emit
    `k` corrupted pairs (s, o') with deterministic modular corruption
    o' = (o + j * 2654435761) % modulus, then drop ACCIDENTAL positives
    (corruptions that hit a true pair) with a SHUFFLE anti-join — the
    true-pair set is O(corpus), so it is never broadcast (contrast
    q48's broadcast anti-join for bounded key sets): positives and
    candidates ride the SAME coarse-bucketed exchange (bucket on the
    (s, o') pair) and the anti filter is one vectorized merge per
    bucket.  Deterministic end to end — the oracle replays the identical
    arithmetic.  Output: the negative pairs (s, o_neg), a multiset
    (collisions between different j are two distinct samples, kept)."""
    if modulus is None:
        modulus = int(pos.max(o_col)) + 1
    mult = 2654435761

    def gen(batch: pa.Table) -> pd.DataFrame:
        s = batch.column(s_col).to_numpy().astype("int64")
        o = batch.column(o_col).to_numpy().astype("int64")
        frames = [pd.DataFrame({"s": s, "key": o,
                                "kind": np.zeros(len(s), "int8")})]
        for j in range(1, k + 1):
            o2 = (o + np.int64(j) * np.int64(mult)) % np.int64(modulus)
            frames.append(pd.DataFrame({
                "s": s, "key": o2, "kind": np.ones(len(s), "int8")}))
        out = pd.concat(frames, ignore_index=True)
        out["_bucket"] = ((out["s"].to_numpy("int64") * 1000003
                           + out["key"].to_numpy("int64"))
                          % n_buckets).astype("int32")
        return out

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        pos_k = g[g["kind"] == 0][["s", "key"]].drop_duplicates()
        cand = g[g["kind"] == 1][["s", "key"]]
        m = cand.merge(pos_k, on=["s", "key"], how="left", indicator=True)
        neg = m[m["_merge"] == "left_only"]
        return pd.DataFrame({"s": neg["s"].to_numpy("int64"),
                             "o_neg": neg["key"].to_numpy("int64")})

    return (pos.map_batches(gen, batch_format="pyarrow")
            .groupby("_bucket").map_groups(anti, batch_format="pandas"))


def deterministic_walks(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    length: int,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 32,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Walk-corpus generation for graph-embedding training (the
    node2vec/DeepWalk input), made DETERMINISTIC so an oracle can replay
    it: from every seed, `length` steps where the next hop is the
    neighbor minimizing h = abs(dst*2654435761 + cur*8191 + step*524287)
    % 1000000007 (ties by dst) — pure int64 arithmetic with abs() before
    the modulo so SQL's sign-of-dividend %% and numpy's sign-of-divisor
    %% agree.  Per step: ONE native hash join (walk frontier x edges)
    + ONE walk-bucketed argmin fold; walks stay distributed, columns
    n0..n{length} accumulate on the walk rows.  Walks die at dead-end
    nodes (inner join drops them) — feed a symmetrized edge set if every
    walk must complete."""
    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    def as_walk(batch: pa.Table) -> pa.Table:
        ids = pd.unique(batch.column("node").to_pandas()).astype("int64")
        return pa.table({"n0": pa.array(ids)})

    walks = seeds.map_batches(as_walk, batch_format="pyarrow").materialize()
    edges = coalesce_for_join(
        edges.select_columns([src, dst]), num_partitions).materialize()

    for step in range(1, length + 1):
        cur = f"n{step - 1}"
        nxt = f"n{step}"
        expand = coalesce_for_join(walks, num_partitions).join(
            edges, join_type="inner", num_partitions=num_partitions,
            on=(cur,), right_on=(src,),
        )

        def score(batch: pa.Table, _cur=cur, _step=step) -> pd.DataFrame:
            df = batch.to_pandas()
            d = df[dst].to_numpy("int64")
            c = df[_cur].to_numpy("int64")
            h = np.abs(d * np.int64(2654435761) + c * np.int64(8191)
                       + np.int64(_step) * np.int64(524287)) \
                % np.int64(1000000007)
            df["_h"] = h
            return _tag_int_bucket(df, "n0", n_buckets)

        def pick(g: pd.DataFrame, _nxt=nxt) -> pd.DataFrame:
            gg = g.sort_values(["n0", "_h", dst], kind="stable")
            best = gg.drop_duplicates(subset=["n0"], keep="first")
            out = best.drop(columns=["_h", "_bucket"]).rename(
                columns={dst: _nxt})
            return out.reset_index(drop=True)

        walks = (expand.map_batches(score, batch_format="pyarrow")
                 .groupby("_bucket").map_groups(pick, batch_format="pandas")
                 .materialize())
    return walks


def k_core_peel(
    edges: ray.data.Dataset,
    k: int,
    rounds: int,
    src: str = "a",
    dst: str = "b",
    n_buckets: int = 32,
    strategy: str = "auto",
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """Bounded-round k-core peeling over an undirected (a < b canonical)
    edge set: each round drops nodes with degree < k and the edges
    touching them; after `rounds` rounds returns (node, degree) of the
    survivors.  Fixed round count makes the semantics REPLAYABLE by an
    unrolled SQL oracle (true k-core = run until a round removes
    nothing; the peel count per round is exposed by the returned degrees
    so callers can iterate to fixpoint).

    Per round: one degree fold (node-bucketed) and two native hash
    joins against the alive node set (alive is one unique row per node,
    so inner join == semi-join; no broadcast of the O(nodes) set).
    Edge state is materialized between rounds (iterative lineage rule).
    A union+sort bucketed semi-join variant was tried first and stalls
    the streaming executor with a pathological driver-memory estimate —
    native joins with coalesced inputs are the stable shape.

    strategy="auto" (default): when the alive set fits under
    `broadcast_threshold` ids it is collected ONCE per round, ray.put,
    and BOTH endpoint filters run in a single streaming pass
    (sorted-array membership) — one exchange per round instead of
    three; past the threshold (or strategy="join") the native-join
    semi-filters keep node count unbounded.  Identical output, pinned
    by test."""
    from .joins import coalesce_for_join

    if strategy not in ("auto", "join", "broadcast"):
        raise ValueError(f"unknown strategy {strategy!r}")
    nparts = _default_join_partitions()

    def degrees(e: ray.data.Dataset) -> ray.data.Dataset:
        def dpart(batch: pa.Table) -> pd.DataFrame:
            u = batch.column(src).to_numpy()
            v = batch.column(dst).to_numpy()
            node, cnt = np.unique(np.concatenate([u, v]).astype("int64"),
                                  return_counts=True)
            return _tag_int_bucket(
                pd.DataFrame({"node": node, "deg": cnt.astype("int64")}),
                "node", n_buckets)

        return (e.map_batches(dpart, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(lambda g: g.groupby("node", sort=False)["deg"]
                            .sum().reset_index(), batch_format="pandas"))

    def semi_filter(e: ray.data.Dataset, alive: ray.data.Dataset,
                    col: str) -> ray.data.Dataset:
        j = coalesce_for_join(e, nparts).join(
            coalesce_for_join(alive, nparts), join_type="inner",
            num_partitions=nparts, on=(col,), right_on=("node",),
        )
        return j.select_columns([src, dst]).materialize()

    e = edges.select_columns([src, dst]).materialize()
    for _ in range(rounds):
        deg = degrees(e)
        alive = deg.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("deg"), k))
            .select(["node"]),
            batch_format="pyarrow").materialize()
        n_alive = alive.count()
        if n_alive == 0:
            return ray.data.from_pandas(pd.DataFrame(
                {"node": np.empty(0, "int64"),
                 "deg": np.empty(0, "int64")}))
        use_bc = (strategy == "broadcast"
                  or (strategy == "auto"
                      and n_alive <= broadcast_threshold))
        if use_bc:
            ids = np.sort(alive.to_pandas()["node"]
                          .to_numpy("int64"))
            ref = ray.put(ids)

            def keep_alive(batch: pa.Table, _ref=ref) -> pa.Table:
                a = ray.get(_ref)
                u = batch.column(src).to_numpy().astype("int64")
                v = batch.column(dst).to_numpy().astype("int64")

                def member(x):
                    i = np.searchsorted(a, x)
                    i = np.minimum(i, len(a) - 1)
                    return a[i] == x

                return batch.filter(pa.array(member(u) & member(v)))

            e = e.map_batches(
                keep_alive, batch_format="pyarrow").materialize()
        else:
            e = semi_filter(semi_filter(e, alive, src), alive, dst)
        if e.count() == 0:
            break
    return degrees(e).map_batches(
        lambda b: b.select(["node", "deg"]), batch_format="pyarrow")


def clustering_coefficients(
    edges: ray.data.Dataset,
    src: str = "a",
    dst: str = "b",
    num_partitions: int | None = None,
    order: str = "id",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Local clustering coefficient per node over an undirected a < b
    edge set, as EXACT integer ppm so the SQL oracle agrees bit-for-bit:
    cc_ppm = floor(1e6 * 2*T(v) / (d(v) * (d(v)-1))) for degree >= 2,
    else 0 (numerator non-negative, so floor == SQL truncation).

    Plan: the triangle stream (`triangle_counts`, wedge-gen + one
    two-key native join) and a per-batch degree-partial stream union
    onto ONE node-bucketed exchange and fold in-bucket — the q126
    join-free feature-assembly shape, no extra join for the degree
    attach.  Both streams are evenly re-blocked before the union:
    map_groups-produced blocks feeding a second groupby exchange trip
    the Sort-estimate stall (q127 quirk)."""
    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    edges = edges.materialize()  # two consumers: triangles + degrees
    tri = triangle_counts(edges, src, dst, num_partitions, order)

    def tri_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        out = pd.DataFrame({"node": df["node"].astype("int64"),
                            "t": df["triangles"].astype("int64")})
        out["d"] = np.int64(0)
        return _tag_int_bucket(out, "node", n_buckets)

    def deg_rows(batch: pa.Table) -> pd.DataFrame:
        both = np.concatenate([batch.column(src).to_numpy(),
                               batch.column(dst).to_numpy()])
        node, cnt = np.unique(both.astype("int64"), return_counts=True)
        out = pd.DataFrame({"node": node,
                            "t": np.zeros(len(node), "int64"),
                            "d": cnt.astype("int64")})
        return _tag_int_bucket(out, "node", n_buckets)

    u = coalesce_for_join(
        tri.map_batches(tri_rows, batch_format="pyarrow"),
        num_partitions,
    ).union(coalesce_for_join(
        edges.map_batches(deg_rows, batch_format="pyarrow"),
        num_partitions))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("node", sort=False)[["t", "d"]].sum()
               .reset_index())
        d = agg["d"].to_numpy("int64")
        t = agg["t"].to_numpy("int64")
        denom = d * (d - 1)
        cc = np.where(denom > 0,
                      (2_000_000 * t) // np.maximum(denom, 1),
                      np.int64(0))
        return pd.DataFrame({"node": agg["node"].to_numpy("int64"),
                             "degree": d, "triangles": t,
                             "cc_ppm": cc.astype("int64")})

    return (u.groupby("_bucket").map_groups(fold, batch_format="pandas"))


def degree_assortativity(
    edges: ray.data.Dataset,
    src: str = "a",
    dst: str = "b",
    num_partitions: int | None = None,
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Degree assortativity coefficient (Newman 2002) of an undirected
    a < b edge set, EXACT in integer ppm: orient every edge both ways,
    attach each endpoint's degree via two native hash joins, then the
    Pearson correlation of (deg_src, deg_dst) over the directed edges
    reduces to three integer sums — by symmetry sum(x)==sum(y) and
    sum(x^2)==sum(y^2), so

        r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2)

    with M the directed edge count, Sx = sum(deg_src), Sxy =
    sum(deg_src*deg_dst), Sxx = sum(deg_src^2).  Per-batch partials are
    PYTHON ints serialized as strings (one row per batch — the sums
    exceed int64 long before the edge list stops fitting a cluster);
    the driver folds the bounded partial set and applies sign-aware
    truncating division (DuckDB `//` truncates toward zero; r < 0 is
    the common disassortative case).  Returns a one-row DataFrame
    (m_directed, r_ppm); r_ppm is 0 for a degree-regular graph
    (denominator 0: correlation undefined, reported as 0)."""
    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    def both_ways(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        return pa.table({
            "x": pa.concat_arrays([a.combine_chunks(),
                                   b.combine_chunks()]),
            "y": pa.concat_arrays([b.combine_chunks(),
                                   a.combine_chunks()])})

    directed = edges.map_batches(both_ways,
                                 batch_format="pyarrow").materialize()
    if directed.count() == 0:  # empty blocks poison the joins (the
        # ArrowInvalid FieldRef quirk) — and there is nothing to measure
        return pd.DataFrame({"m_directed": pd.Series([0], dtype="int64"),
                             "r_ppm": pd.Series([0], dtype="int64")})
    directed = coalesce_for_join(directed, num_partitions).materialize()

    # degree table: combiner-first (per-batch unique counts) + one fold
    def deg_part(batch: pa.Table) -> pd.DataFrame:
        node, cnt = np.unique(batch.column("x").to_numpy(),
                              return_counts=True)
        out = pd.DataFrame({"node": node.astype("int64"),
                            "d": cnt.astype("int64")})
        return _tag_int_bucket(out, "node", n_buckets)

    def deg_fold(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("node", sort=False)["d"].sum()
                .astype("int64").reset_index())

    deg = (directed.map_batches(deg_part, batch_format="pyarrow")
           .groupby("_bucket").map_groups(deg_fold,
                                          batch_format="pandas"))
    # re-block to arrow: map_groups emits pandas blocks, and the join's
    # Project stage can't rename those (pandas/arrow block-mix quirk)
    deg = coalesce_for_join(deg, num_partitions).materialize()

    def ren(nx_, dx_):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({nx_: batch.column("node"),
                             dx_: batch.column("d")})
        return f

    degx = deg.map_batches(ren("_nx", "dx"), batch_format="pyarrow")
    degy = deg.map_batches(ren("_ny", "dy"), batch_format="pyarrow")
    j1 = coalesce_for_join(directed, num_partitions).join(
        degx, join_type="inner", num_partitions=num_partitions,
        on=("x",), right_on=("_nx",))
    j2 = coalesce_for_join(j1, num_partitions).join(
        degy, join_type="inner", num_partitions=num_partitions,
        on=("y",), right_on=("_ny",))

    def partials(batch: pa.Table) -> pd.DataFrame:
        dx = batch.column("dx").to_numpy().astype(object)
        dy = batch.column("dy").to_numpy().astype(object)
        return pd.DataFrame({
            "m": [str(len(dx))],
            "sx": [str(int(sum(dx, 0)))],
            "sxy": [str(int(sum(dx * dy, 0)))],
            "sxx": [str(int(sum(dx * dx, 0)))]})

    parts = j2.map_batches(partials, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"m_directed": pd.Series([0], dtype="int64"),
                             "r_ppm": pd.Series([0], dtype="int64")})
    # canonical fold order: partial blocks arrive in completion order
    parts = parts.sort_values(["m", "sx", "sxy", "sxx"], kind="stable")
    m = sum(int(v) for v in parts["m"])
    sx = sum(int(v) for v in parts["sx"])
    sxy = sum(int(v) for v in parts["sxy"])
    sxx = sum(int(v) for v in parts["sxx"])
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    if den == 0:
        r_ppm = 0
    else:
        q, rem = divmod(1_000_000 * num, den)
        r_ppm = q + 1 if (q < 0 and rem != 0) else q  # truncate to zero
    return pd.DataFrame({"m_directed": pd.Series([m], dtype="int64"),
                         "r_ppm": pd.Series([r_ppm], dtype="int64")})


def wl_refinement(
    edges: ray.data.Dataset,
    rounds: int | None = 2,
    src: str = "a",
    dst: str = "b",
    num_partitions: int | None = None,
    n_buckets: int = 32,
    max_rounds: int = 16,
) -> ray.data.Dataset:
    """1-dimensional Weisfeiler-Leman color refinement over an
    undirected edge set — the canonical graph-structure fingerprint
    (graph-isomorphism screening, structural-role node signatures,
    GNN expressivity baseline).  Returns (node, color) after `rounds`
    refinements; color is an md5 hex string so an SQL oracle can
    replay it exactly (DuckDB md5 == hashlib md5).

    color_0(v)   = md5(CAST(degree(v) AS VARCHAR))
    color_r(v)   = md5(color_{r-1}(v) || '|' ||
                       join(',', SORTED color_{r-1} of neighbors))

    Plan per round: ONE native hash join ships each (directed) edge
    its endpoint color, the neighbor stream unions with the previous
    color table (self rows) onto ONE coarse node-bucket exchange, and
    the in-bucket kernel re-hashes every node vectorized over sorted
    equal-key runs.  Color tables are materialized each round (lazy
    lineage would replay all prior rounds); both union inputs are
    evenly re-blocked (map_groups output feeding a groupby trips the
    q127 Sort-estimate stall otherwise).

    `rounds=None` runs to the refinement FIXPOINT — the coarsest
    BISIMULATION quotient: 1-WL classes only ever split, so the
    distinct-color count is monotone and one unchanged round means
    convergence (checked with a cheap grouped count per round;
    `max_rounds` bounds pathological chains)."""
    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    to_fixpoint = rounds is None
    if to_fixpoint:
        rounds = max_rounds

    def sym(batch: pa.Table) -> pd.DataFrame:
        a = batch.column(src).to_numpy().astype("int64")
        b = batch.column(dst).to_numpy().astype("int64")
        return pd.DataFrame({"u": np.concatenate([a, b]),
                             "v": np.concatenate([b, a])})

    sym_edges = edges.map_batches(
        sym, batch_format="pyarrow").materialize()

    # color_0: degree partials -> one bucket exchange -> md5(degree)
    def deg_partial(batch: pa.Table) -> pd.DataFrame:
        node, cnt = np.unique(
            batch.column("u").to_numpy().astype("int64"),
            return_counts=True)
        out = pd.DataFrame({"node": node, "d": cnt.astype("int64")})
        return _tag_int_bucket(out, "node", n_buckets)

    def deg_fold(g: pd.DataFrame) -> pd.DataFrame:
        import hashlib
        if g.empty:
            return pd.DataFrame({"node": np.empty(0, "int64"),
                                 "color": pd.Series(dtype=object)})
        agg = (g.groupby("node", sort=False)["d"].sum().reset_index())
        return pd.DataFrame({
            "node": agg["node"].to_numpy("int64"),
            "color": [hashlib.md5(str(int(d)).encode()).hexdigest()
                      for d in agg["d"]]})

    colors = (sym_edges.map_batches(deg_partial, batch_format="pyarrow")
              .groupby("_bucket")
              .map_groups(deg_fold, batch_format="pandas")
              .materialize())

    n_colors = (colors.groupby("color").count().count()
                if to_fixpoint else None)
    for _ in range(rounds):
        cmap = colors.map_batches(
            lambda b: pa.table({"v": b.column("node"),
                                "c": b.column("color")}),
            batch_format="pyarrow").materialize()
        nbr = coalesce_for_join(sym_edges, num_partitions).join(
            coalesce_for_join(cmap, num_partitions),
            join_type="inner", num_partitions=num_partitions,
            on=("v",), right_on=("v",))

        def nbr_rows(batch: pa.Table) -> pd.DataFrame:
            out = pd.DataFrame({
                "node": batch.column("u").to_numpy().astype("int64"),
                "c": batch.column("c").to_pandas().astype(str),
                "self": np.zeros(batch.num_rows, dtype=bool)})
            return _tag_int_bucket(out, "node", n_buckets)

        def self_rows(batch: pa.Table) -> pd.DataFrame:
            out = pd.DataFrame({
                "node": batch.column("node").to_numpy().astype("int64"),
                "c": batch.column("color").to_pandas().astype(str),
                "self": np.ones(batch.num_rows, dtype=bool)})
            return _tag_int_bucket(out, "node", n_buckets)

        u = coalesce_for_join(
            nbr.map_batches(nbr_rows, batch_format="pyarrow")
            .materialize(), num_partitions,
        ).union(coalesce_for_join(
            colors.map_batches(self_rows, batch_format="pyarrow")
            .materialize(), num_partitions))

        def refine(g: pd.DataFrame) -> pd.DataFrame:
            import hashlib
            if g.empty:
                return pd.DataFrame({"node": np.empty(0, "int64"),
                                     "color": pd.Series(dtype=object)})
            g = g.sort_values(["node", "self", "c"],
                              ascending=[True, False, True],
                              kind="stable")
            nodes = g["node"].to_numpy("int64")
            cs = g["c"].to_numpy(object)
            selfs = g["self"].to_numpy(bool)
            out_n, out_c = [], []
            for s, e in _group_slices(nodes):
                # self row sorts first (ascending=False on the flag)
                nbrs = sorted(cs[s + 1:e]) if e - s > 1 else []
                sig = cs[s] + "|" + ",".join(nbrs)
                if not selfs[s]:
                    raise AssertionError("node missing self color row")
                out_n.append(nodes[s])
                out_c.append(hashlib.md5(sig.encode()).hexdigest())
            return pd.DataFrame({
                "node": np.array(out_n, dtype="int64"),
                "color": pd.Series(out_c, dtype=object)})

        colors = (u.groupby("_bucket")
                  .map_groups(refine, batch_format="pandas")
                  .materialize())
        if to_fixpoint:
            n2 = colors.groupby("color").count().count()
            if n2 == n_colors:  # classes only split: equal = converged
                break
            n_colors = n2
    return colors


def multi_source_hops(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """PER-SEED min-hop BFS: (seed, node, hops) for every (seed, node)
    pair within `k` directed hops — the landmark-distance operator
    (per-landmark distance features for KG embeddings / closeness
    estimates), vs `k_hop_reachability` which collapses the seed set
    into one combined frontier.

    Identical loop discipline (semi-naive frontier join + ONE
    union/grouped-min fold per hop, everything materialized), but all
    state is keyed on (seed, node), so frontier and visited scale with
    #seeds x reachable-set — keep the seed set a bounded LANDMARK
    sample; the seed column rides the exchanges, nothing is broadcast.
    """
    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    def as_visited(batch: pa.Table) -> pa.Table:
        ids = pd.unique(batch.column("node").to_pandas()).astype("int64")
        return pa.table({"seed": pa.array(ids),
                         "node": pa.array(ids),
                         "hops": pa.array(np.zeros(len(ids), "int64"))})

    def _minfold(ds: ray.data.Dataset) -> ray.data.Dataset:
        return (ds.groupby(["seed", "node"]).min("hops")
                .map_batches(
                    lambda b: b.rename_columns(["seed", "node", "hops"]),
                    batch_format="pyarrow"))

    visited = _minfold(
        seeds.map_batches(as_visited, batch_format="pyarrow")).materialize()
    frontier = visited
    edges = coalesce_for_join(
        edges.select_columns([src, dst]), num_partitions).materialize()

    for hop in range(1, k + 1):
        expand = coalesce_for_join(
            frontier.drop_columns(["hops"]), num_partitions
        ).join(
            edges, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=(src,),
        )

        def project(batch: pa.Table, _h=hop) -> pa.Table:
            # Arrow out: a pandas/arrow block MIX in the union trips
            # the groupby sort-sampler's block-type assertion
            df = pd.DataFrame({
                "seed": batch.column("seed").to_numpy().astype("int64"),
                "node": batch.column(dst).to_numpy().astype("int64"),
            }).drop_duplicates()
            return pa.table({
                "seed": pa.array(df["seed"].to_numpy()),
                "node": pa.array(df["node"].to_numpy()),
                "hops": pa.array(np.full(len(df), _h, "int64"))})

        nxt = expand.map_batches(project, batch_format="pyarrow")
        visited = _minfold(visited.union(nxt)).materialize()
        frontier = visited.map_batches(
            lambda b, _h=hop: b.filter(pc.equal(b.column("hops"), _h)),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
    return visited


def k_hop_min_cost_pred(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """`k_hop_min_cost` with PREDECESSOR tracking: (node, cost, via)
    where `via` is the input to shortest-path RECONSTRUCTION
    (trace_path).  `via` is defined over the FINAL bounded-hop costs —
    via(v) = the min-zigzag neighbor u with cost(u) + w(u,v) ==
    cost(v) — which makes the definition coincide BY CONSTRUCTION with
    a SQL oracle's `predd` (argmin over the converged cost table with
    no hop accounting); a predecessor that only attains its final cost
    in the last relaxation round is still selectable.  Zigzag keeps
    the signed-id tie-break order-stable and SQL-replayable; |via| <
    2^31 is enforced.  Nodes with no cost-equal incoming edge (seeds,
    or nodes whose every optimal predecessor-extension exceeds the hop
    bound) carry via = node, which trace_path treats as chain end.
    The cost pass is exactly `k_hop_min_cost`; the via pass adds two
    bounded joins over the converged (node, cost) table — once total,
    not per round."""
    from ray.data.aggregate import Min

    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    SENTINEL = np.int64(2**32 - 1)  # > every zig(|via| < 2^31)

    def zig(v: np.ndarray) -> np.ndarray:
        return np.where(v >= 0, 2 * v, -2 * v - 1).astype("int64")

    costs = coalesce_for_join(
        k_hop_min_cost(
            edges, seeds, k, src=src, dst=dst, weight=weight,
            num_partitions=num_partitions),
        num_partitions).materialize()
    edges = coalesce_for_join(
        edges.select_columns([src, dst, weight]), num_partitions)

    # candidate predecessors: every edge whose tail was reached
    expand = costs.join(
        edges, join_type="inner", num_partitions=num_partitions,
        on=("node",), right_on=(src,))

    def cand(batch: pa.Table) -> pa.Table:
        u = batch.column("node").to_numpy().astype("int64")
        if len(u) and (np.abs(u) >= 2**31).any():
            raise ValueError("|node id| must be < 2^31 for via encoding")
        c = (batch.column("cost").to_numpy()
             + batch.column(weight).to_numpy()).astype("int64")
        return pa.table({"node": batch.column(dst).cast(pa.int64()),
                         "c": pa.array(c), "zu": pa.array(zig(u))})

    # keep only candidates matching v's FINAL cost (the predd equality)
    matched = coalesce_for_join(
        expand.map_batches(cand, batch_format="pyarrow"), num_partitions
    ).join(costs, join_type="inner", num_partitions=num_partitions,
           on=("node",), right_on=("node",))

    def equal_only(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch.column("c"),
                                     batch.column("cost")))
        return pa.table({"node": keep.column("node").cast(pa.int64()),
                         "cost": keep.column("cost").cast(pa.int64()),
                         "zu": keep.column("zu").cast(pa.int64())})

    # self rows lose every tie (SENTINEL) and keep unmatched nodes
    def self_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "node": batch.column("node").cast(pa.int64()),
            "cost": batch.column("cost").cast(pa.int64()),
            "zu": pa.array(np.full(n, SENTINEL, "int64"))})

    folded = (matched.map_batches(equal_only, batch_format="pyarrow")
              .union(costs.map_batches(self_rows, batch_format="pyarrow"))
              .repartition(num_partitions)
              .groupby("node").aggregate(
                  Min("cost", alias_name="cost"),
                  Min("zu", alias_name="zu")))

    def decode(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy().astype("int64")
        z = b.column("zu").to_numpy().astype("int64")
        via = np.where(z == SENTINEL, node,
                       np.where(z % 2 == 0, z // 2, -((z + 1) // 2)))
        return pa.table({"node": pa.array(node),
                         "cost": b.column("cost").cast(pa.int64()),
                         "via": pa.array(via.astype("int64"))})

    return folded.map_batches(decode, batch_format="pyarrow")


def trace_path(
    pred: ray.data.Dataset,
    source: int,
    target: int,
    max_steps: int = 64,
) -> pd.DataFrame:
    """Walk the (node, cost, via) predecessor map backward from
    `target` to `source`: returns (step, node, cost) with step 0 = the
    target.  Each hop is one streaming filter + take(1) over the
    narrow pred table — only the <= max_steps chain rows ever reach
    the driver.  Empty frame when the target is absent (unreachable
    within the forward pass's hop bound).  Because each pred step
    strictly decreases cost (positive weights), the chain terminates
    at the unique cost-0 seed; max_steps is a safety bound, not the
    semantics."""
    pred = pred.materialize()
    steps, cur = [], int(target)
    for step in range(max_steps + 1):
        rows = pred.map_batches(
            lambda b, _n=cur: b.filter(pc.equal(
                b.column("node"), pa.scalar(_n, pa.int64()))),
            batch_format="pyarrow").take(1)
        if not rows:
            return pd.DataFrame({"step": pd.Series(dtype="int64"),
                                 "node": pd.Series(dtype="int64"),
                                 "cost": pd.Series(dtype="int64")})
        steps.append({"step": step, "node": cur,
                      "cost": int(rows[0]["cost"])})
        if cur == int(source):
            break
        nxt = int(rows[0]["via"])
        if nxt == cur:  # self-via without being the source: broken map
            break
        cur = nxt
    out = pd.DataFrame(steps)
    if len(out) == 0 or out.iloc[-1]["node"] != int(source):
        return pd.DataFrame({"step": pd.Series(dtype="int64"),
                             "node": pd.Series(dtype="int64"),
                             "cost": pd.Series(dtype="int64")})
    return out.astype("int64")


def boruvka_msf(
    edges: ray.data.Dataset,
    src: str = "a",
    dst: str = "b",
    weight: str = "w",
    max_rounds: int = 20,
    num_partitions: int | None = None,
    n_buckets: int = 32,
    cc_distributed: bool = False,
) -> ray.data.Dataset:
    """Boruvka MINIMUM SPANNING FOREST over an undirected weighted
    edge set — the classic O(log n)-round distributed MST algorithm:
    each round every component selects its minimum outgoing edge
    (ties broken by (w, min endpoint, max endpoint) — with distinct
    weights the MSF is unique, with ties this makes it deterministic),
    the selected edges join the forest, and components merge.

    Returns the forest edges (u, v, w) with u < v.

    Per round: two native hash joins attach component labels to the
    edge endpoints (labels are O(nodes) — never broadcast), one coarse
    component-bucket exchange picks each component's min edge
    vectorized, the selected edge set (<= #components rows, shrinking
    geometrically) merges components via the CC min-label fold, and
    one join relabels.  Components at least halve per round, so
    `max_rounds=20` covers 10^6+ components; the loop exits as soon
    as no cross-component edge remains.

    `cc_distributed=True` routes the component merge through the
    dataset-native CC fixpoint — required when round 1's selected set
    (O(initial components)) is too big to fold driver-side; later
    rounds shrink geometrically either way."""
    from .dedup import connected_components
    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    def canon(batch: pa.Table) -> pd.DataFrame:
        u = batch.column(src).to_numpy().astype("int64")
        v = batch.column(dst).to_numpy().astype("int64")
        w = batch.column(weight).to_numpy().astype("int64")
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        df = pd.DataFrame({"u": lo, "v": hi, "w": w})
        return df[df["u"] != df["v"]].drop_duplicates()

    e = (edges.map_batches(canon, batch_format="pyarrow")
         .groupby(["u", "v"]).min("w")
         .map_batches(lambda b: b.rename_columns(["u", "v", "w"]),
                      batch_format="pyarrow").materialize())

    def nodes_of(batch: pa.Table) -> pa.Table:
        ids = pd.unique(np.concatenate(
            [batch.column("u").to_numpy(),
             batch.column("v").to_numpy()]).astype("int64"))
        return pa.table({"node": pa.array(ids),
                         "comp": pa.array(ids)})

    labels = (e.map_batches(nodes_of, batch_format="pyarrow")
              .groupby("node").min("comp")
              .map_batches(lambda b: b.rename_columns(["node", "comp"]),
                           batch_format="pyarrow").materialize())

    forest = []
    for _ in range(max_rounds):
        cu = labels.map_batches(
            lambda b: pa.table({"u": b.column("node"),
                                "cu": b.column("comp")}),
            batch_format="pyarrow").materialize()
        cv = labels.map_batches(
            lambda b: pa.table({"v": b.column("node"),
                                "cv": b.column("comp")}),
            batch_format="pyarrow").materialize()
        j = coalesce_for_join(e, num_partitions).join(
            coalesce_for_join(cu, num_partitions), join_type="inner",
            num_partitions=num_partitions, on=("u",), right_on=("u",))
        j = coalesce_for_join(j.materialize(), num_partitions).join(
            coalesce_for_join(cv, num_partitions), join_type="inner",
            num_partitions=num_partitions, on=("v",), right_on=("v",))
        cross = j.map_batches(
            lambda b: b.filter(pc.not_equal(b.column("cu"),
                                            b.column("cv"))),
            batch_format="pyarrow").materialize()
        if cross.count() == 0:
            break
        e = cross.select_columns(["u", "v", "w"]).materialize()

        # each component's min outgoing edge: emit the edge once per
        # incident component, pick min (w, u, v) per comp in-bucket
        def per_comp(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()[["u", "v", "w", "cu", "cv"]]
            both = pd.concat([df.assign(c=df["cu"]),
                              df.assign(c=df["cv"])],
                             ignore_index=True)
            both = (both.sort_values(["c", "w", "u", "v"],
                                     kind="stable")
                    .groupby("c", sort=False).head(1))
            return _tag_int_bucket(both, "c", n_buckets)

        sel = (cross.map_batches(per_comp, batch_format="pyarrow")
               .groupby("_bucket")
               .map_groups(
                   lambda g: (g.sort_values(["c", "w", "u", "v"],
                                            kind="stable")
                              .groupby("c", sort=False).head(1)
                              .drop(columns=["_bucket"])),
                   batch_format="pandas").materialize())
        picked = (sel.map_batches(
            lambda b: b.select(["u", "v", "w"]),
            batch_format="pyarrow")
            .groupby(["u", "v"]).min("w")
            .map_batches(lambda b: b.rename_columns(["u", "v", "w"]),
                         batch_format="pyarrow").materialize())
        forest.append(picked)

        # merge: CC over the selected component-graph (<= #components
        # rows, shrinking geometrically -> the driver-side CC default)
        comp_edges = sel.map_batches(
            lambda b: pa.table({
                "x": b.column("cu").cast(pa.int64()),
                "y": b.column("cv").cast(pa.int64())}),
            batch_format="pyarrow")
        cc = connected_components(
            comp_edges, left_col="x", right_col="y",
            max_iterations=max_rounds, distributed=cc_distributed)
        cmap = cc.map_batches(
            lambda b: pa.table({"comp": b.column("node"),
                                "newc": b.column("component")}),
            batch_format="pyarrow").materialize()
        lj = coalesce_for_join(labels, num_partitions).join(
            coalesce_for_join(cmap, num_partitions),
            join_type="left_outer", num_partitions=num_partitions,
            on=("comp",), right_on=("comp",))
        labels = lj.map_batches(
            lambda b: pa.table({
                "node": b.column("node").cast(pa.int64()),
                "comp": pc.coalesce(b.column("newc").cast(pa.int64()),
                                    b.column("comp").cast(pa.int64()))}),
            batch_format="pyarrow").materialize()

    if not forest:
        return ray.data.from_arrow(pa.table({
            "u": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.int64()),
            "w": pa.array([], type=pa.int64())}))
    out = forest[0]
    for f in forest[1:]:
        out = out.union(f)
    return (out.groupby(["u", "v"]).min("w")
            .map_batches(lambda b: b.rename_columns(["u", "v", "w"]),
                         batch_format="pyarrow"))


def temporal_reachability(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    ts_col: str = "ts",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """TIME-RESPECTING reachability (the temporal-graph primitive —
    contagion / contamination / information-flow queries): (node,
    arrival) = the EARLIEST time each node is reachable from the seed
    set along paths whose edge timestamps never decrease, within `k`
    edges.  An edge (u, v, ts) is usable only when ts >= arrival(u);
    seeds start at arrival 0.

    Earliest arrival has optimal substructure (a smaller arrival
    unlocks a superset of onward edges), so the k_hop_min_cost
    discipline applies unchanged: per round ONE frontier-x-edges join
    gated by the timestamp comparison, one union + grouped-min fold
    that detects improvement via the old-column sentinel; state
    materialized every round, nothing broadcast.  int64 epoch-us
    timestamps (repo discipline)."""
    from ray.data.aggregate import Min

    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    BIG = np.int64(2**62)

    def as_seed(batch: pa.Table) -> pa.Table:
        ids = pd.unique(batch.column("node").to_pandas()).astype("int64")
        z = np.zeros(len(ids), "int64")
        return pa.table({"node": pa.array(ids),
                         "arr": pa.array(z), "old": pa.array(z)})

    def _fold(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.groupby("node").aggregate(
            Min("arr", alias_name="arr"), Min("old", alias_name="old"))

    best = _fold(
        seeds.map_batches(as_seed, batch_format="pyarrow")).materialize()
    frontier = best
    edges = coalesce_for_join(
        edges.select_columns([src, dst, ts_col]), num_partitions
    ).materialize()

    for hop in range(k):
        expand = coalesce_for_join(
            frontier.select_columns(["node", "arr"]), num_partitions
        ).join(
            edges, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=(src,),
        )

        def relax(batch: pa.Table) -> pa.Table:
            arr = batch.column("arr").to_numpy().astype("int64")
            ts = batch.column(ts_col).to_numpy().astype("int64")
            ok = ts >= arr
            d = batch.column(dst).to_numpy().astype("int64")[ok]
            t = ts[ok]
            return pa.table({
                "node": pa.array(d),
                "arr": pa.array(t),
                "old": pa.array(np.full(len(t), BIG, "int64"))})

        cand = expand.map_batches(relax, batch_format="pyarrow")
        prior = best.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "arr": b.column("arr"),
                                "old": b.column("arr")}),
            batch_format="pyarrow")
        best = _fold(prior.union(cand)).materialize()
        if hop == k - 1:
            break
        frontier = best.map_batches(
            lambda b: b.filter(pc.less(b.column("arr"),
                                       b.column("old"))),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
    return best.select_columns(["node", "arr"])


def personalized_pagerank_int(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    iters: int = 3,
    total_mass: int = 1_000_000_000_000,
    damping_pct: int = 85,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Personalized PageRank in EXACT integer fixed-point — random walk
    with restart to the seed set, every operation an order-insensitive
    integer sum or floor division so an SQL oracle replays it
    bit-for-bit (float power iteration is summation-order-sensitive at
    the ulp level — the repo's order-canonical-folds lesson applied by
    construction):

        r_0(v)     = total_mass // n_seeds   for seeds, else 0
        r_{i+1}(v) = (100-damping) * r_0(v) // 100
                     + damping * SUM_{u->v} (r_i(u) // outdeg(u)) // 100

    Nodes whose rank floors to 0 drop out (both engines identically).
    Plan: out-degree attaches to the EDGE rows once; per iteration ONE
    rank-x-edges join + one grouped integer sum; the bounded seed set
    rides into tasks as a plain dict (restart mass), with zero-contrib
    seed rows injected into the same fold so restart-only nodes
    survive.  Ranks stay distributed; nothing O(nodes) is broadcast."""
    from ray.data.aggregate import Sum

    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    sdf = seeds.to_pandas()  # empty datasets drop columns (q164 quirk)
    seed_ids = (sorted(pd.unique(sdf["node"]).astype("int64").tolist())
                if "node" in sdf.columns else [])
    if not seed_ids:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "r": pa.array([], type=pa.int64())}))
    base = int(total_mass) // len(seed_ids)
    e_mass = {int(n): base for n in seed_ids}
    restart_pct = 100 - damping_pct

    deg = (edges.map_batches(
        lambda b: pa.table({"src": b.column("src")}),
        batch_format="pyarrow")
        .groupby("src").count()
        .map_batches(lambda b: b.rename_columns(["src", "d"]),
                     batch_format="pyarrow"))
    edw = coalesce_for_join(
        edges.select_columns(["src", "dst"]), num_partitions).join(
        coalesce_for_join(deg.materialize(), num_partitions),
        join_type="inner", num_partitions=num_partitions,
        on=("src",), right_on=("src",))
    edw = edw.map_batches(
        lambda b: pa.table({"node": b.column("src").cast(pa.int64()),
                            "dst": b.column("dst").cast(pa.int64()),
                            "d": b.column("d").cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    r = ray.data.from_arrow(pa.table({
        "node": pa.array(seed_ids, type=pa.int64()),
        "r": pa.array([base] * len(seed_ids), type=pa.int64())}))
    r = r.materialize()

    seed_rows = ray.data.from_arrow(pa.table({
        "dst": pa.array(seed_ids, type=pa.int64()),
        "c": pa.array([0] * len(seed_ids), type=pa.int64())}))

    for _ in range(iters):
        j = coalesce_for_join(r, num_partitions).join(
            edw, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("node",))
        contrib = j.map_batches(
            lambda b: pa.table({
                "dst": b.column("dst"),
                "c": pa.array(
                    b.column("r").to_numpy().astype("int64")
                    // b.column("d").to_numpy().astype("int64"))}),
            batch_format="pyarrow")
        summed = (contrib.union(seed_rows)
                  .groupby("dst").aggregate(Sum("c", alias_name="c")))

        def finish(b: pa.Table, _e=e_mass, _dp=damping_pct,
                   _rp=restart_pct) -> pa.Table:
            node = b.column("dst").to_numpy().astype("int64")
            s = b.column("c").to_numpy().astype("int64")
            e = np.array([_e.get(int(n), 0) for n in node],
                         dtype="int64")
            newr = (_rp * e) // 100 + (_dp * s) // 100
            keep = newr > 0
            return pa.table({"node": pa.array(node[keep]),
                             "r": pa.array(newr[keep])})

        r = summed.map_batches(
            finish, batch_format="pyarrow").materialize()
    return r


def link_prediction_scores(
    edges: ray.data.Dataset,
    src: str = "a",
    dst: str = "b",
    max_degree: int | None = None,
    n_buckets: int = 32,
    ra_scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Neighborhood-overlap link-prediction heuristics over an
    undirected graph: for every candidate pair (a, b) with at least one
    common neighbor, emit

        common       — |N(a) ∩ N(b)|  (common-neighbors score)
        ra_ppm       — Resource-Allocation index (Zhou/Lu/Zhang 2009),
                       sum over common neighbors z of ra_scale//deg(z)
                       — integer-exact (no log, unlike Adamic-Adar) so
                       a SQL oracle replays it bit-for-bit
        jaccard_ppm  — 1e6 * common // (deg(a) + deg(b) - common)

    Shape (join-free, 3 coarse all-to-alls, no driver state): edges ->
    (z, u) memberships bucketed by the shared neighbor z; one bucketed
    kernel computes deg(z) from its co-located slice, emits each z's
    C(d,2) pairs pre-summed per bucket PLUS one (z, deg) row; two more
    bucketed passes re-key by a then b, folding pair partials and
    attaching endpoint degrees from the riding deg rows.  A hub z with
    degree d emits O(d^2) pairs — `max_degree` drops hubs above the
    cap (the market-basket mitigation; None keeps everything).

    Contract: node ids are int64, self-loops are ignored, duplicate
    edges are deduped in-bucket (exact: the bucket key is a function of
    z, so all of z's memberships co-locate)."""

    def membership(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([src, dst]).to_pandas().drop_duplicates()
        a = df[src].to_numpy("int64")
        b = df[dst].to_numpy("int64")
        keep = a != b
        a, b = a[keep], b[keep]
        out = pd.DataFrame({"z": np.concatenate([a, b]),
                            "u": np.concatenate([b, a])})
        return _tag_int_bucket(out, "z", n_buckets)

    tagged = edges.map_batches(membership, batch_format="pyarrow")

    def _empty_rows() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ("a", "b", "c", "ra", "d", "is_deg")})

    def gen(g: pd.DataFrame) -> pd.DataFrame:
        df = (g[["z", "u"]].drop_duplicates()
              .sort_values(["z", "u"], kind="stable"))
        z = df["z"].to_numpy("int64")
        u = df["u"].to_numpy("int64")
        aa, bb, ww = [], [], []
        deg_z, deg_d = [], []
        for s, e in _group_slices(z):
            d = int(e - s)
            deg_z.append(z[s])
            deg_d.append(d)
            if d < 2 or (max_degree is not None and d > max_degree):
                continue
            iu, ju = np.triu_indices(d, k=1)
            aa.append(u[s:e][iu])
            bb.append(u[s:e][ju])
            ww.append(np.full(len(iu), ra_scale // d, dtype="int64"))
        parts = []
        if aa:
            pairs = pd.DataFrame({"a": np.concatenate(aa),
                                  "b": np.concatenate(bb),
                                  "ra": np.concatenate(ww)})
            # canonical orientation + pre-sum within the bucket:
            # shuffle volume = distinct pairs, not raw emissions
            lo = np.minimum(pairs["a"], pairs["b"])
            hi = np.maximum(pairs["a"], pairs["b"])
            pairs["a"], pairs["b"] = lo, hi
            agg = (pairs.groupby(["a", "b"], sort=False)
                   .agg(c=("ra", "size"), ra=("ra", "sum"))
                   .reset_index())
            agg["d"] = np.int64(0)
            agg["is_deg"] = np.int64(0)
            parts.append(agg)
        if deg_z:
            parts.append(pd.DataFrame({
                "a": np.asarray(deg_z, dtype="int64"),
                "b": np.zeros(len(deg_z), dtype="int64"),
                "c": np.zeros(len(deg_z), dtype="int64"),
                "ra": np.zeros(len(deg_z), dtype="int64"),
                "d": np.asarray(deg_d, dtype="int64"),
                "is_deg": np.ones(len(deg_z), dtype="int64")}))
        if not parts:
            return _empty_rows()
        out = pd.concat(parts, ignore_index=True)
        return out[["a", "b", "c", "ra", "d", "is_deg"]].astype("int64")

    stage1 = tagged.groupby("_bucket").map_groups(
        gen, batch_format="pandas")

    def retag_a(batch: pa.Table) -> pd.DataFrame:
        return _tag_int_bucket(batch.to_pandas(), "a", n_buckets)

    def fold_a(g: pd.DataFrame) -> pd.DataFrame:
        degm = g[g["is_deg"] == 1].set_index("a")["d"]
        p = g[g["is_deg"] == 0]
        if len(p):
            p = (p.groupby(["a", "b"], sort=False)
                 .agg(c=("c", "sum"), ra=("ra", "sum")).reset_index())
            p["d"] = p["a"].map(degm).astype("int64")  # deg(a)
            p["is_deg"] = np.int64(0)
        else:
            p = _empty_rows()
        degr = degm.reset_index()
        degr["b"] = np.int64(0)
        degr["c"] = np.int64(0)
        degr["ra"] = np.int64(0)
        degr["is_deg"] = np.int64(1)
        return (pd.concat(
            [p, degr[["a", "b", "c", "ra", "d", "is_deg"]]],
            ignore_index=True).astype("int64"))

    stage2 = stage1.map_batches(
        retag_a, batch_format="pyarrow").groupby("_bucket").map_groups(
        fold_a, batch_format="pandas")

    def retag_b(df: pd.DataFrame) -> pd.DataFrame:
        # deg rows key by their node (column a); pair rows by b
        key = np.where(df["is_deg"].to_numpy() == 1,
                       df["a"].to_numpy("int64"),
                       df["b"].to_numpy("int64"))
        df["_bucket"] = (key % n_buckets).astype("int32")
        return df

    def fold_b(g: pd.DataFrame) -> pd.DataFrame:
        degm = g[g["is_deg"] == 1].set_index("a")["d"]
        p = g[g["is_deg"] == 0]
        if not len(p):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 ("a", "b", "common", "ra_ppm",
                                  "jaccard_ppm")})
        da = p["d"].to_numpy("int64")
        db = p["b"].map(degm).to_numpy("int64")
        c = p["c"].to_numpy("int64")
        return pd.DataFrame({
            "a": p["a"].to_numpy("int64"),
            "b": p["b"].to_numpy("int64"),
            "common": c,
            "ra_ppm": p["ra"].to_numpy("int64"),
            "jaccard_ppm": (1_000_000 * c) // (da + db - c),
        })

    return stage2.map_batches(
        retag_b, batch_format="pandas").groupby("_bucket").map_groups(
        fold_b, batch_format="pandas")


def hits_int(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
    n_buckets: int = 32,
    init: int = 1,
) -> ray.data.Dataset:
    """Unnormalized HITS (Kleinberg 1999) in EXACT integer arithmetic —
    hub/authority scores as alternating-path counts: starting from
    h0 = `init` on every node,

        a_i(v) = sum over edges (u, v) of h_{i-1}(u)
        h_i(u) = sum over edges (u, v) of a_i(v)

    for `rounds` rounds, returning (node, hub, auth) with zeros for
    nodes never reached on a side.  Dropping the usual L2
    normalization makes every step an integer SUM — order-insensitive
    and bit-for-bit replayable by an unrolled SQL oracle (the q212
    fixed-point discipline); the ranking it induces is the same as
    normalized HITS at each round.  Caller bounds the magnitude:
    values grow as (max degree)^(2*rounds) * init, so keep
    rounds small or pre-filter hubs (int64 contract).

    Shape: 2 coarse all-to-alls per half-step (score fold keyed by the
    scored endpoint, partial-sum keyed by the receiving endpoint);
    score tables are O(nodes) and materialized each step (the
    lazy-lineage rule).  `edges` must be DISTINCT pairs (dedup with
    _distinct_edges / a groupby upstream)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")

    def tag_edges(by: str):
        def f(batch: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame({
                "u": batch.column(src).to_numpy().astype("int64"),
                "v": batch.column(dst).to_numpy().astype("int64")})
            df["val"] = np.int64(0)
            df["is_score"] = np.int64(0)
            return _tag_int_bucket(df, by, n_buckets)
        return f

    e_by_src = edges.map_batches(
        tag_edges("u"), batch_format="pyarrow").materialize()
    e_by_dst = edges.map_batches(
        tag_edges("v"), batch_format="pyarrow").materialize()

    def nodes_init(batch: pa.Table) -> pd.DataFrame:
        n = np.unique(np.concatenate([
            batch.column(src).to_numpy().astype("int64"),
            batch.column(dst).to_numpy().astype("int64")]))
        df = pd.DataFrame({"u": n, "v": np.int64(0),
                           "val": np.int64(init),
                           "is_score": np.int64(1)})
        return _tag_int_bucket(df, "u", n_buckets)

    def dedup_scores(g: pd.DataFrame) -> pd.DataFrame:
        # per-batch node extraction overlaps across blocks
        return g.drop_duplicates(["u"])

    h = (edges.map_batches(nodes_init, batch_format="pyarrow")
         .groupby("_bucket").map_groups(
             dedup_scores, batch_format="pandas").materialize())

    def half_step(scores, tagged_edges, key_col: str, emit_col: str):
        """scores keyed on key_col fold onto edges; partial sums
        re-keyed by emit_col and summed."""
        def fold(g: pd.DataFrame) -> pd.DataFrame:
            sm = g[g["is_score"] == 1].set_index("u")["val"]
            e = g[g["is_score"] == 0]
            if not len(e):
                # keep the _bucket column so every output block shares
                # one schema (the downstream retag would mask this, but
                # mixed-schema blocks trip Ray's schema unification)
                out = pd.DataFrame({c: pd.Series(dtype="int64") for c
                                    in ("u", "v", "val", "is_score")})
                out["_bucket"] = pd.Series(dtype="int32")
                return out
            w = e[key_col].map(sm).fillna(0).astype("int64")
            part = pd.DataFrame({"n": e[emit_col].to_numpy("int64"),
                                 "val": w.to_numpy()})
            part = (part.groupby("n", sort=False)["val"].sum()
                    .reset_index())
            out = pd.DataFrame({"u": part["n"].to_numpy("int64"),
                                "v": np.int64(0),
                                "val": part["val"].to_numpy("int64"),
                                "is_score": np.int64(1)})
            return _tag_int_bucket(out, "u", n_buckets).astype(
                {"_bucket": "int32"})

        def sum_partials(g: pd.DataFrame) -> pd.DataFrame:
            out = (g.groupby("u", sort=False)["val"].sum()
                   .reset_index())
            out = out[out["val"] != 0]
            out["v"] = np.int64(0)
            out["is_score"] = np.int64(1)
            return out[["u", "v", "val", "is_score"]].astype("int64")

        folded = tagged_edges.union(scores).groupby(
            "_bucket").map_groups(fold, batch_format="pandas")
        return (folded.map_batches(
            lambda b: _tag_int_bucket(b.to_pandas(), "u", n_buckets),
            batch_format="pyarrow")
            .groupby("_bucket").map_groups(
                sum_partials, batch_format="pandas").materialize())

    a = None
    for _ in range(rounds):
        a = half_step(h.map_batches(
            lambda b: _tag_int_bucket(b.to_pandas(), "u", n_buckets),
            batch_format="pyarrow"), e_by_src, "u", "v")
        h = half_step(a.map_batches(
            lambda b: _tag_int_bucket(b.to_pandas(), "u", n_buckets),
            batch_format="pyarrow"), e_by_dst, "v", "u")

    def mark(which: int):
        def f(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()[["u", "val"]]
            df["side"] = np.int64(which)
            return _tag_int_bucket(df, "u", n_buckets)
        return f

    def join_sides(g: pd.DataFrame) -> pd.DataFrame:
        hh = g[g["side"] == 0].groupby("u")["val"].sum()
        aa = g[g["side"] == 1].groupby("u")["val"].sum()
        idx = hh.index.union(aa.index)
        return pd.DataFrame({
            "node": idx.to_numpy().astype("int64"),
            "hub": hh.reindex(idx, fill_value=0).to_numpy("int64"),
            "auth": aa.reindex(idx, fill_value=0).to_numpy("int64")})

    return (h.map_batches(mark(0), batch_format="pyarrow")
            .union(a.map_batches(mark(1), batch_format="pyarrow"))
            .groupby("_bucket").map_groups(
                join_sides, batch_format="pandas"))


def label_propagation_communities(
    edges: ray.data.Dataset,
    src: str = "a",
    dst: str = "b",
    rounds: int = 3,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, determinized): labels start as node ids; each round every
    node adopts the most frequent label among its neighbors PLUS ITSELF
    (the self-vote breaks two-coloring oscillation on bipartite
    subgraphs), ties broken toward the SMALLEST label.  `edges` must be
    DISTINCT undirected pairs (dedupe upstream) — duplicate rows act as
    extra votes (edge weights), which may or may not be intended.
    Fixed rounds +
    integer votes + total tie order = fully deterministic and
    bit-replayable by an unrolled SQL oracle (the q212 fixed-point
    discipline).  Returns (node, label), both int64.

    Shape per round (2 coarse all-to-alls, no driver state): labels
    keyed by owning node meet the mirrored membership rows on one
    bucket exchange, emitting pre-summed (node, neighbor_label) vote
    partials; partials re-key by the voting node, union the self-votes,
    and one more exchange folds counts and picks argmax/min-tie.  Loop
    state is materialized every round (the lazy-lineage rule)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")

    def membership(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([src, dst]).to_pandas().drop_duplicates()
        a = df[src].to_numpy("int64")
        b = df[dst].to_numpy("int64")
        keep = a != b
        a, b = a[keep], b[keep]
        out = pd.DataFrame({"node": np.concatenate([a, b]),
                            "nbr": np.concatenate([b, a]),
                            "lab": np.int64(0),
                            "cnt": np.int64(0),
                            "is_lab": np.int64(0)})
        return _tag_int_bucket(out, "nbr", n_buckets)

    mem = edges.map_batches(
        membership, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pd.DataFrame:
        n = np.unique(np.concatenate([
            batch.column(src).to_numpy().astype("int64"),
            batch.column(dst).to_numpy().astype("int64")]))
        df = pd.DataFrame({"node": n, "nbr": np.int64(0), "lab": n,
                           "cnt": np.int64(1),
                           "is_lab": np.int64(1)})
        return _tag_int_bucket(df, "node", n_buckets)

    def dedup_labels(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["node"])

    labels = (edges.map_batches(init_labels, batch_format="pyarrow")
              .groupby("_bucket")
              .map_groups(dedup_labels, batch_format="pandas")
              .materialize())

    def lab_by_node(b: pa.Table) -> pd.DataFrame:
        return _tag_int_bucket(b.to_pandas(), "node", n_buckets)

    def neighbor_votes(g: pd.DataFrame) -> pd.DataFrame:
        """labels (keyed here by their OWNING node) meet membership
        rows (keyed by nbr): each mem row votes its neighbor's label
        for `node`; votes pre-summed before leaving the bucket."""
        lm = g[g["is_lab"] == 1].set_index("node")["lab"]
        e = g[g["is_lab"] == 0]
        if not len(e):
            # MUST carry _bucket: this output unions into another
            # groupby("_bucket") directly (the q246 empty-block lesson)
            out = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                ("node", "nbr", "lab", "cnt", "is_lab")})
            out["_bucket"] = pd.Series(dtype="int32")
            return out
        v = pd.DataFrame({"node": e["node"].to_numpy("int64"),
                          "lab": e["nbr"].map(lm).to_numpy("int64")})
        agg = (v.groupby(["node", "lab"], sort=False).size()
               .reset_index(name="cnt"))
        agg["nbr"] = np.int64(0)
        agg["is_lab"] = np.int64(0)
        return _tag_int_bucket(
            agg[["node", "nbr", "lab", "cnt", "is_lab"]], "node",
            n_buckets).astype({"_bucket": "int32"})

    def pick_winner(g: pd.DataFrame) -> pd.DataFrame:
        """votes (cnt per node,lab — self-votes ride as is_lab=1 rows
        with cnt=1) -> argmax count, min-label tie."""
        votes = (g.groupby(["node", "lab"], sort=False)["cnt"].sum()
                 .reset_index())
        w = (votes.sort_values(["node", "cnt", "lab"],
                               ascending=[True, False, True],
                               kind="stable")
             .drop_duplicates(["node"]))
        out = pd.DataFrame({"node": w["node"].to_numpy("int64"),
                            "nbr": np.int64(0),
                            "lab": w["lab"].to_numpy("int64"),
                            "cnt": np.int64(1),
                            "is_lab": np.int64(1)})
        return _tag_int_bucket(out, "node", n_buckets).astype(
            {"_bucket": "int32"})

    for _ in range(rounds):
        # exchange 1: keyed by the label's owner == mem's nbr
        lab_keyed = labels.map_batches(
            lab_by_node, batch_format="pyarrow")
        partials = (mem.union(lab_keyed).groupby("_bucket")
                    .map_groups(neighbor_votes, batch_format="pandas"))
        # exchange 2: keyed by the voting node; self-votes ride along
        labels = (partials.union(lab_keyed).groupby("_bucket")
                  .map_groups(pick_winner, batch_format="pandas")
                  .materialize())

    def finish(b: pa.Table) -> pa.Table:
        t = b.select(["node", "lab"])
        return pa.table({"node": t.column("node").cast(pa.int64()),
                         "label": t.column("lab").cast(pa.int64())})

    return labels.map_batches(finish, batch_format="pyarrow")


def scc_labels(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 8,
    max_hops: int = 40,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Strongly connected components via the parallel COLORING
    algorithm (Orzan 2004 / FW-BW family): repeat over the unassigned
    subgraph —

      1. color(v) = MAX node id that reaches v forward (max-label
         propagation to fixpoint, improvement-detection via the q120
         old-vs-new grouped-max trick);
      2. every color ROOT r (color(r) == r) walks BACKWARD inside its
         own color class; each node it reaches both ways IS in r's SCC
         (forward r->u by coloring, backward u->r by the walk, and all
         intermediate nodes provably share the color);
      3. peel those SCCs, recompute colors on the remainder.

    Every peel round removes >= 1 SCC per color root (all sinks of the
    color DAG peel in parallel), so rounds <= #SCCs, typically far
    fewer.  `max_hops` bounds BOTH inner fixpoints (the contract cap —
    set >= the graph's longest shortest path for exact SCC);
    `max_rounds` bounds peels and raises if the graph outlives it.
    Output (node, scc) int64, scc = MIN member of the component (a
    final per-component min so the label convention is orientation-
    free and SQL-replayable).  2 exchanges per inner round; loop state
    materialized every step (lazy-lineage rule)."""

    def edge_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([src, dst]).to_pandas().drop_duplicates()
        a = df[src].to_numpy("int64")
        b = df[dst].to_numpy("int64")
        keep = a != b
        return pd.DataFrame({"u": a[keep], "v": b[keep]})

    e = edges.map_batches(edge_rows, batch_format="pyarrow")
    e_by_u = e.map_batches(
        lambda b: _tag_int_bucket(b.to_pandas(), "u", n_buckets),
        batch_format="pyarrow").materialize()
    e_by_v = e.map_batches(
        lambda b: _tag_int_bucket(b.to_pandas(), "v", n_buckets),
        batch_format="pyarrow").materialize()

    def nodes_init(batch: pa.Table) -> pd.DataFrame:
        n = np.unique(np.concatenate([
            batch.column(src).to_numpy().astype("int64"),
            batch.column(dst).to_numpy().astype("int64")]))
        return pd.DataFrame({"node": n})

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["node"])

    unassigned = (edges.map_batches(nodes_init, batch_format="pyarrow")
                  .map_batches(lambda b: _tag_int_bucket(
                      b.to_pandas(), "node", n_buckets),
                      batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(dedup_nodes, batch_format="pandas")
                  .materialize())
    assigned: list[ray.data.Dataset] = []

    def _max_fixpoint(colors: ray.data.Dataset) -> ray.data.Dataset:
        """forward max-label propagation over nodes present in
        `colors` (node, color); returns converged colors."""
        for _ in range(max_hops):
            def by_u(b: pa.Table) -> pd.DataFrame:
                df = b.to_pandas()[["node", "color"]]
                df = df.rename(columns={"node": "u"})
                df["is_lab"] = np.int64(1)
                df["v"] = np.int64(0)
                return _tag_int_bucket(df, "u", n_buckets)

            def push(g: pd.DataFrame) -> pd.DataFrame:
                lm = g[g["is_lab"] == 1].set_index("u")["color"]
                ee = g[g["is_lab"] == 0]
                if not len(ee):
                    return pd.DataFrame({c: pd.Series(dtype="int64")
                                         for c in ("node", "color",
                                                   "old")})
                c = ee["u"].map(lm)
                ok = c.notna().to_numpy()  # src must be unassigned
                out = pd.DataFrame({
                    "node": ee["v"].to_numpy("int64")[ok],
                    "color": c.to_numpy()[ok].astype("int64")})
                out = (out.groupby("node", sort=False)["color"].max()
                       .reset_index())
                # sentinel must not collide with NEGATIVE node ids
                # (signed encodings are a first-class convention here)
                out["old"] = np.int64(np.iinfo(np.int64).min)
                out["has_self"] = np.int64(0)
                return out

            def tag_cand(df: pd.DataFrame) -> pd.DataFrame:
                return _tag_int_bucket(df, "node", n_buckets)

            def self_rows(b: pa.Table) -> pd.DataFrame:
                df = b.to_pandas()[["node", "color"]]
                df["old"] = df["color"]
                df["has_self"] = np.int64(1)
                return _tag_int_bucket(df, "node", n_buckets)

            def fold(g: pd.DataFrame) -> pd.DataFrame:
                gg = (g.groupby("node", sort=False)
                      .agg(color=("color", "max"), old=("old", "max"),
                           has_self=("has_self", "max"))
                      .reset_index())
                # candidate-only rows target an ASSIGNED node: drop
                return gg[gg["has_self"] == 1].drop(
                    columns=["has_self"])

            tagged_edges = e_by_u.map_batches(
                lambda b: (lambda df: df.assign(
                    is_lab=np.int64(0), color=np.int64(0)))(
                    b.to_pandas()),
                batch_format="pyarrow")
            # materialize between the two exchanges: map_groups output
            # feeding a SECOND groupby in one plan is the q127 deadlock
            # repartition(P) per round: union->groupby loops multiply
            # block counts geometrically otherwise (the q136 lesson),
            # and the materialize between the two exchanges breaks the
            # q127 chained-exchange deadlock
            cand = (tagged_edges.union(
                colors.map_batches(by_u, batch_format="pyarrow"))
                .groupby("_bucket")
                .map_groups(push, batch_format="pandas")
                .map_batches(tag_cand, batch_format="pandas")
                .repartition(n_buckets)
                .materialize())
            folded = (cand.union(colors.map_batches(
                self_rows, batch_format="pyarrow"))
                .groupby("_bucket")
                .map_groups(fold, batch_format="pandas")
                .repartition(n_buckets)
                .materialize())
            changed = folded.map_batches(
                lambda b: pa.table({"n": pa.array(
                    [int(pc.sum(pc.cast(pc.greater(
                        b.column("color"), b.column("old")),
                        pa.int64())).as_py() or 0)], pa.int64())}),
                batch_format="pyarrow").sum("n")
            colors = folded.drop_columns(["old"]).map_batches(
                lambda b: _tag_int_bucket(b.to_pandas(), "node",
                                          n_buckets),
                batch_format="pyarrow").materialize()
            if not changed:
                return colors
        raise RuntimeError(
            f"scc_labels: color fixpoint not reached in {max_hops} "
            f"hops — raise max_hops")

    for _ in range(max_rounds):
        if unassigned.count() == 0:
            break
        colors = unassigned.map_batches(
            lambda b: (lambda df: df.assign(
                color=df["node"].to_numpy("int64")))(
                b.to_pandas()[["node"]]),
            batch_format="pyarrow").map_batches(
            lambda b: _tag_int_bucket(b.to_pandas(), "node",
                                      n_buckets),
            batch_format="pyarrow").materialize()
        colors = _max_fixpoint(colors)

        # backward walk: member (node, root); seed = color roots
        member = colors.map_batches(
            lambda b: (lambda df: df[df["node"] == df["color"]]
                       .rename(columns={"color": "root"}))(
                b.to_pandas()),
            batch_format="pyarrow").materialize()
        for _ in range(max_hops):
            before = member.count()

            def mem_by_v(b: pa.Table) -> pd.DataFrame:
                df = b.to_pandas()[["node", "root"]]
                df = df.rename(columns={"node": "v"})
                df["u"] = np.int64(0)
                df["is_mem"] = np.int64(1)
                return _tag_int_bucket(df, "v", n_buckets)

            def back(g: pd.DataFrame) -> pd.DataFrame:
                mm = g[g["is_mem"] == 1].drop_duplicates(["v"])
                rm = mm.set_index("v")["root"]
                ee = g[g["is_mem"] == 0]
                if not len(ee):
                    return pd.DataFrame({c: pd.Series(dtype="int64")
                                         for c in ("node", "root")})
                r = ee["v"].map(rm)
                ok = r.notna().to_numpy()
                return pd.DataFrame({
                    "node": ee["u"].to_numpy("int64")[ok],
                    "root": r.to_numpy()[ok].astype("int64")
                }).drop_duplicates()

            def gate(g: pd.DataFrame) -> pd.DataFrame:
                """candidate joins member only if its color == root
                (stays inside the class) — colors carry unassigned
                membership too."""
                cm = g[g["is_mem"] == 2].set_index("node")["color"]
                cand_ = g[g["is_mem"] == 0]
                mem_ = g[g["is_mem"] == 1][["node", "root"]]
                if len(cand_):
                    col = cand_["node"].map(cm)
                    ok = (col.notna()
                          & (col == cand_["root"])).to_numpy()
                    cand_ = cand_[["node", "root"]][ok]
                out = pd.concat([mem_, cand_], ignore_index=True)
                return out.drop_duplicates(["node"])

            tagged_edges = e_by_v.map_batches(
                lambda b: (lambda df: df.assign(
                    root=np.int64(0), is_mem=np.int64(0)))(
                    b.to_pandas()),
                batch_format="pyarrow")
            cand = (tagged_edges.union(member.map_batches(
                mem_by_v, batch_format="pyarrow"))
                .groupby("_bucket")
                .map_groups(back, batch_format="pandas")
                .map_batches(lambda df: _tag_int_bucket(
                    df.assign(is_mem=np.int64(0)), "node", n_buckets),
                    batch_format="pandas")
                .repartition(n_buckets)
                .materialize())  # q127 chained-exchange deadlock guard
            mem_tagged = member.map_batches(
                lambda b: _tag_int_bucket(
                    b.to_pandas()[["node", "root"]].assign(
                        is_mem=np.int64(1)), "node", n_buckets),
                batch_format="pyarrow")
            col_tagged = colors.map_batches(
                lambda b: (lambda df: _tag_int_bucket(
                    df.assign(root=np.int64(0), is_mem=np.int64(2)),
                    "node", n_buckets))(
                    b.to_pandas()[["node", "color"]]),
                batch_format="pyarrow")
            member = (cand.union(mem_tagged).union(col_tagged)
                      .groupby("_bucket")
                      .map_groups(gate, batch_format="pandas")
                      .repartition(n_buckets)
                      .materialize())
            if member.count() == before:
                break

        assigned.append(member.map_batches(
            lambda b: b.select(["node", "root"]),
            batch_format="pyarrow").materialize())

        def not_member(g: pd.DataFrame) -> pd.DataFrame:
            taken = set(g[g["is_mem"] == 1]["node"].to_numpy("int64"))
            left = g[g["is_mem"] == 2]
            keep = ~left["node"].isin(taken).to_numpy()
            return left[["node"]][keep]

        mem_tagged = member.map_batches(
            lambda b: _tag_int_bucket(
                b.to_pandas()[["node", "root"]].assign(
                    is_mem=np.int64(1)), "node", n_buckets),
            batch_format="pyarrow")
        col_tagged = colors.map_batches(
            lambda b: (lambda df: _tag_int_bucket(
                df.assign(root=np.int64(0), is_mem=np.int64(2)),
                "node", n_buckets))(
                b.to_pandas()[["node", "color"]]),
            batch_format="pyarrow")
        unassigned = (mem_tagged.union(col_tagged).groupby("_bucket")
                      .map_groups(not_member, batch_format="pandas")
                      .map_batches(lambda df: _tag_int_bucket(
                          df, "node", n_buckets),
                          batch_format="pandas")
                      .repartition(n_buckets)
                      .materialize())
    else:
        if unassigned.count():
            raise RuntimeError(
                f"scc_labels: {unassigned.count()} nodes unassigned "
                f"after {max_rounds} peel rounds — raise max_rounds")

    out = assigned[0]
    for a in assigned[1:]:
        out = out.union(a)

    def relabel(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("root")["node"].min()
        return pd.DataFrame({
            "node": g["node"].to_numpy("int64"),
            "scc": g["root"].map(m).to_numpy("int64")})

    return (out.map_batches(
        lambda b: _tag_int_bucket(b.to_pandas(), "root", n_buckets),
        batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(relabel, batch_format="pandas"))


def k_truss_edges(
    edges: ray.data.Dataset,
    k: int = 4,
    rounds: int = 2,
    src: str = "a",
    dst: str = "b",
    max_degree: int | None = None,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Bounded-round k-truss peeling: each round drops every edge whose
    triangle SUPPORT (triangles containing it) is < k-2, then supports
    are recomputed on the survivors.  FIXED round count — the q127
    k-core discipline: deterministic semantics both engines can state,
    replayed by programmatically unrolled MATERIALIZED CTEs; run more
    rounds for a deeper peel (fixpoint when a round stops changing).
    Returns the surviving canonical (a < b) edge set, int64.

    Shape per round, 3 coarse all-to-alls: (1) wedges generated
    per-lower-endpoint in an a-keyed bucket exchange (adjacency sorted,
    triu pair grid — `max_degree` caps hub wedge fan-out); (2) wedge
    closure matched against the edge set on a hash(v,w)-keyed exchange;
    (3) per-edge support folded on an edge-keyed exchange and filtered.
    Edge set materialized every round (lazy-lineage rule); no driver
    state."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")

    def canon(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([src, dst]).to_pandas().drop_duplicates()
        u = df[src].to_numpy("int64")
        v = df[dst].to_numpy("int64")
        keep = u != v
        u, v = u[keep], v[keep]
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        out = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
        return _tag_int_bucket(out, "a", n_buckets)

    def dedup_edges(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    e = (edges.map_batches(canon, batch_format="pyarrow")
         .groupby("_bucket")
         .map_groups(dedup_edges, batch_format="pandas")
         .materialize())

    def _pair_hash_bucket(df: pd.DataFrame, c1: str,
                          c2: str) -> pd.DataFrame:
        h = (df[c1].to_numpy("int64") * np.int64(1_000_003)
             + df[c2].to_numpy("int64"))
        df["_bucket"] = (np.abs(h) % n_buckets).astype("int32")
        return df

    for _ in range(rounds):
        def wedges(g: pd.DataFrame) -> pd.DataFrame:
            df = (g[["a", "b"]].drop_duplicates()
                  .sort_values(["a", "b"], kind="stable"))
            aa = df["a"].to_numpy("int64")
            bb = df["b"].to_numpy("int64")
            us, vs, ws = [], [], []
            for s, t in _group_slices(aa):
                d = int(t - s)
                if d < 2 or (max_degree is not None and d > max_degree):
                    continue
                iu, ju = np.triu_indices(d, k=1)
                us.append(np.full(len(iu), aa[s], dtype="int64"))
                vs.append(bb[s:t][iu])
                ws.append(bb[s:t][ju])
            if not us:
                return pd.DataFrame({c: pd.Series(dtype="int64")
                                     for c in ("u", "v", "w", "kind",
                                               "_bucket")})
            out = pd.DataFrame({"u": np.concatenate(us),
                                "v": np.concatenate(vs),
                                "w": np.concatenate(ws)})
            out["kind"] = np.int64(0)
            return _pair_hash_bucket(out, "v", "w")

        wedge_rows = (e.groupby("_bucket")
                      .map_groups(wedges, batch_format="pandas")
                      .materialize())  # q127 chained-exchange guard

        def edge_marker(b: pa.Table) -> pd.DataFrame:
            df = b.to_pandas()[["a", "b"]]
            out = pd.DataFrame({"u": np.int64(0),
                                "v": df["a"].to_numpy("int64"),
                                "w": df["b"].to_numpy("int64"),
                                "kind": np.int64(1)})
            return _pair_hash_bucket(out, "v", "w")

        def close(g: pd.DataFrame) -> pd.DataFrame:
            """wedges whose (v, w) is an edge are triangles -> emit 3
            per-edge support partials, pre-summed in the bucket."""
            have = g[g["kind"] == 1][["v", "w"]].drop_duplicates()
            wd = g[g["kind"] == 0]
            if not (len(have) and len(wd)):
                return pd.DataFrame({c: pd.Series(dtype="int64")
                                     for c in ("a", "b", "sup")})
            tri = wd.merge(have, on=["v", "w"])
            sup = pd.concat([
                tri[["u", "v"]].rename(columns={"u": "a", "v": "b"}),
                tri[["u", "w"]].rename(columns={"u": "a", "w": "b"}),
                tri[["v", "w"]].rename(columns={"v": "a", "w": "b"}),
            ], ignore_index=True)
            return (sup.groupby(["a", "b"], sort=False).size()
                    .reset_index(name="sup"))

        supports = (wedge_rows.union(
            e.map_batches(edge_marker, batch_format="pyarrow"))
            .groupby("_bucket")
            .map_groups(close, batch_format="pandas")
            .map_batches(lambda df: _pair_hash_bucket(df, "a", "b"),
                         batch_format="pandas")
            .materialize())

        def keep(g: pd.DataFrame) -> pd.DataFrame:
            agg = (g.groupby(["a", "b"], sort=False)["sup"].sum()
                   .reset_index())
            out = agg[agg["sup"] >= k - 2][["a", "b"]]
            return _tag_int_bucket(out.copy(), "a", n_buckets)

        e = (supports.groupby("_bucket")
             .map_groups(keep, batch_format="pandas")
             .repartition(n_buckets)
             .materialize())

    return e.map_batches(
        lambda b: b.select(["a", "b"]), batch_format="pyarrow")


def k_hop_widest_path(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    capacity: str = "cap",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Bounded-hop WIDEST-path (max-min bottleneck): (node, width) =
    the maximum over <= k-edge paths from any seed of the path's
    MINIMUM edge capacity — k_hop_min_cost's tropical dual ((max, min)
    replacing (min, +); same semi-naive discipline: only nodes whose
    width IMPROVED last round join the edge table next round).

    Per hop ONE native hash join relaxes the frontier's out-edges to
    min(width(u), cap(u, v)) candidates, then one union + grouped-MAX
    fold computes the new best per node and detects improvement in the
    same pass (prior rows carry old = width, candidates old = -1;
    width > old <=> improved).  Seeds report the BIG sentinel (2**62 —
    an unconstrained source); capacities must be positive int64 so the
    sentinel dominates every real edge.  State is narrow (node, width)
    rows, materialized per hop; nothing is broadcast or collected."""
    from ray.data.aggregate import Max

    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    BIG = np.int64(2**62)

    def as_seed(batch: pa.Table) -> pa.Table:
        ids = pd.unique(batch.column("node").to_pandas())
        w = np.full(len(ids), BIG, "int64")
        return pa.table({"node": pa.array(ids.astype("int64")),
                         "width": pa.array(w), "old": pa.array(w)})

    def _fold(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.groupby("node").aggregate(
            Max("width", alias_name="width"),
            Max("old", alias_name="old"))

    best = _fold(
        seeds.map_batches(as_seed, batch_format="pyarrow")).materialize()
    frontier = best
    edges = coalesce_for_join(
        edges.select_columns([src, dst, capacity]), num_partitions
    ).materialize()
    if edges.count() == 0:    # no edges: seeds alone, no relaxation
        return best.select_columns(["node", "width"])

    for hop in range(k):
        expand = coalesce_for_join(
            frontier.select_columns(["node", "width"]), num_partitions
        ).join(
            edges, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=(src,),
        )

        def relax(batch: pa.Table) -> pa.Table:
            w = np.minimum(
                batch.column("width").to_numpy(),
                batch.column(capacity).to_numpy().astype("int64"))
            return pa.table({
                "node": batch.column(dst).cast(pa.int64()),
                "width": pa.array(w.astype("int64")),
                "old": pa.array(np.full(len(w), np.int64(-1), "int64")),
            })

        cand = expand.map_batches(relax, batch_format="pyarrow")
        prior = best.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "width": b.column("width"),
                                "old": b.column("width")}),
            batch_format="pyarrow")
        best = _fold(prior.union(cand)).materialize()
        if hop == k - 1:
            break
        frontier = best.map_batches(
            lambda b: b.filter(
                pc.greater(b.column("width"), b.column("old"))),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
    return best.select_columns(["node", "width"])


def double_sweep_diameter(
    edges: ray.data.Dataset,
    start: int,
    k: int,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Double-sweep diameter LOWER BOUND (Magnien/Latapy/Habib 2009):
    bounded-k BFS from `start` picks the farthest reached node u
    (max hops, min node id on ties — deterministic), a second bounded
    BFS from u reports its eccentricity — the classic cheap diameter
    bound that is exact on trees and near-exact on small-world graphs.

    Two k_hop_reachability sweeps (k exchange rounds each); the
    farthest-node selection is a per-block 1-row partial + a driver
    fold over O(blocks) rows — never a full sort.  Directed edges; pass
    both orientations for the undirected reading.  Returns ONE row
    (start, far_node, ecc_start, diameter_lb) — all int64, where
    diameter_lb = ecc(far_node) within k hops."""
    def _farthest(visited: ray.data.Dataset) -> tuple[int, int]:
        def part(b: pa.Table) -> pa.Table:
            h = b.column("hops").to_numpy()
            n = b.column("node").to_numpy()
            if len(h) == 0:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "hops": pa.array([], type=pa.int64())})
            mx = h.max()
            sel = n[h == mx].min()
            return pa.table({"node": pa.array([sel], type=pa.int64()),
                             "hops": pa.array([int(mx)],
                                              type=pa.int64())})
        rows = visited.map_batches(part, batch_format="pyarrow").take_all()
        best = max(((int(r["hops"]), -int(r["node"])) for r in rows),
                   default=(0, -start))
        return -best[1], best[0]

    d1 = k_hop_reachability(
        edges, ray.data.from_items([{"node": int(start)}]), k,
        src=src, dst=dst, num_partitions=num_partitions)
    u, ecc_start = _farthest(d1)
    d2 = k_hop_reachability(
        edges, ray.data.from_items([{"node": int(u)}]), k,
        src=src, dst=dst, num_partitions=num_partitions)
    _, diameter_lb = _farthest(d2)
    return ray.data.from_arrow(pa.table({
        "start": pa.array([int(start)], type=pa.int64()),
        "far_node": pa.array([int(u)], type=pa.int64()),
        "ecc_start": pa.array([int(ecc_start)], type=pa.int64()),
        "diameter_lb": pa.array([int(diameter_lb)], type=pa.int64())}))


def bipartite_components(
    pairs: ray.data.Dataset,
    rounds: int = 10,
    a: str = "a",
    b: str = "b",
    num_partitions: int | None = None,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-component bipartiteness (odd-cycle) check over an
    UNDIRECTED edge list: components via min-label propagation, a
    parity BFS from each component's min-id representative (components
    are disjoint, so ONE multi-seed k_hop_reachability sweep serves
    them all), then every edge whose endpoints share a parity
    witnesses an odd cycle.  `rounds` bounds both the label
    propagation and the BFS — exact when rounds >= the largest
    component diameter (the k-hop contract; BFS parity is only
    meaningful at the fixpoint).

    Returns one row per component: (component, n_nodes, odd_edges,
    is_bipartite), odd_edges counting DISTINCT canonical witness
    pairs, is_bipartite = 1 - min(1, odd_edges) — all int64.

    Shape: the CC fixpoint + BFS rounds dominate (each one exchange
    per round); the parity attach is two native hash joins over the
    edge list, and component stats + witness counts meet on ONE
    final comp-bucket exchange."""
    from .dedup import connected_components
    from .joins import coalesce_for_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    def canon(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([a, b]).to_pandas()
        u = df[a].to_numpy("int64")
        v = df[b].to_numpy("int64")
        keep = u != v
        u, v = u[keep], v[keep]
        return pd.DataFrame({"a": np.minimum(u, v),
                             "b": np.maximum(u, v)}).drop_duplicates()

    und = pairs.map_batches(canon, batch_format="pyarrow").materialize()
    if und.count() == 0:    # empty graph: typed empty result
        return ray.data.from_arrow(pa.table({
            "component": pa.array([], type=pa.int64()),
            "n_nodes": pa.array([], type=pa.int64()),
            "odd_edges": pa.array([], type=pa.int64()),
            "is_bipartite": pa.array([], type=pa.int64())}))

    comp = connected_components(
        und, max_iterations=rounds, left_col="a", right_col="b",
        distributed=True).materialize()     # (node, component)

    reps = comp.map_batches(
        lambda t: pa.table({"node": t.filter(
            pc.equal(t.column("node"), t.column("component"))
        ).column("node").cast(pa.int64())}),
        batch_format="pyarrow")

    both = und.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([
                t.column("a").cast(pa.int64()).combine_chunks(),
                t.column("b").cast(pa.int64()).combine_chunks()]),
            "dst": pa.concat_arrays([
                t.column("b").cast(pa.int64()).combine_chunks(),
                t.column("a").cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    hops = k_hop_reachability(both, reps, rounds,
                              num_partitions=num_partitions)
    par = hops.map_batches(
        lambda t: pa.table({
            "node": t.column("node").cast(pa.int64()),
            "par": pa.array(t.column("hops").to_numpy() % 2)}),
        batch_format="pyarrow").materialize()

    j1 = coalesce_for_join(und, num_partitions).join(
        coalesce_for_join(par, num_partitions), join_type="inner",
        num_partitions=num_partitions, on=("a",), right_on=("node",))
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            [c if c != "par" else "par_a" for c in t.column_names]),
        batch_format="pyarrow").materialize()
    j2 = coalesce_for_join(j1, num_partitions).join(
        coalesce_for_join(par, num_partitions), join_type="inner",
        num_partitions=num_partitions, on=("b",), right_on=("node",))

    def witness(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        w = df[df["par_a"] == df["par"]][["a", "b"]].drop_duplicates()
        out = pd.DataFrame({"node": w["a"].astype("int64"),
                            "b": w["b"].astype("int64")})
        out["kind"] = np.int64(1)
        return out

    wit = j2.map_batches(witness, batch_format="pyarrow")
    members = comp.map_batches(
        lambda t: pa.table({
            "node": t.column("node").cast(pa.int64()),
            "b": t.column("component").cast(pa.int64()),
            "kind": pa.array(np.zeros(t.num_rows, "int64"))}),
        batch_format="pyarrow")

    # witness rows need their component: reuse the node->label map by
    # routing BOTH streams through one crc(node) bucket exchange, then
    # a second tiny comp-bucket fold aggregates per component
    def tag_node(df: pd.DataFrame) -> pd.DataFrame:
        return _tag_int_bucket(df, "node", n_buckets)

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["kind"] == 0][["node", "b"]].rename(
            columns={"b": "component"})
        w = g[g["kind"] == 1].merge(lab, on="node")
        out = pd.concat([
            lab[["component"]].assign(n=np.int64(1), w=np.int64(0)),
            (w[["component"]].assign(n=np.int64(0), w=np.int64(1))
             if len(w) else
             pd.DataFrame({"component": pd.Series(dtype="int64"),
                           "n": pd.Series(dtype="int64"),
                           "w": pd.Series(dtype="int64")})),
        ], ignore_index=True)
        part = (out.groupby("component", sort=False)[["n", "w"]].sum()
                .reset_index())
        return _tag_int_bucket(part, "component", n_buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("component", sort=False)[["n", "w"]].sum()
               .reset_index())
        return pd.DataFrame({
            "component": agg["component"].astype("int64"),
            "n_nodes": agg["n"].astype("int64"),
            "odd_edges": agg["w"].astype("int64"),
            "is_bipartite": (agg["w"] == 0).astype("int64")})

    return (wit.union(members)
            .map_batches(tag_node, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(attach, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(fold, batch_format="pandas"))


def dag_longest_path(
    edges: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    strategy: str = "auto",
    broadcast_threshold: int = 500_000,
) -> ray.data.Dataset:
    """DAG longest-path layering (the topological-level / critical-path
    operator): (node, layer) where layer = the LONGEST directed path
    from any root (a node with no incoming edge) — the (max, +)
    sibling of k_hop_reachability's (min, +) BFS; scheduling levels,
    stratified materialization order, critical paths all read off it.

    Roots come from one distinct + anti semi-join (sources that are
    never destinations).  Per round the usual semi-naive shape: ONE
    hash join relaxes the improved frontier's out-edges to
    layer(u) + 1 candidates, one union + grouped-MAX fold updates and
    detects improvement (prior rows old = layer, candidates old = -1).
    `k` bounds the rounds and must be >= the longest path for the
    exact layering (on a DAG the fixpoint is reached by then; cyclic
    inputs are the caller's contract violation and simply saturate to
    the bound).

    `strategy`: "join" is the unbounded-graph path (per-round native
    hash join — fresh aggregator actors each round, the fixed cost
    that dominates small graphs); "broadcast" keeps the (node, layer)
    state driver-resident and streams ONLY the materialized edge set
    per round (one map_batches + an O(candidates) driver fold — no
    shuffle at all), correct under the node-count <=
    `broadcast_threshold` contract (the k_core_peel strategy="auto"
    discipline; equivalence pinned by test); "auto" counts distinct
    nodes once and picks."""
    from ray.data.aggregate import Max

    from .joins import coalesce_for_join

    if strategy not in ("auto", "join", "broadcast"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if num_partitions is None:
        num_partitions = _default_join_partitions()

    edges = coalesce_for_join(
        edges.select_columns([src, dst]), num_partitions).materialize()
    if edges.count() == 0:    # no edges: no roots, typed empty result
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "layer": pa.array([], type=pa.int64())}))

    if strategy != "join":
        def endpoint_sets(b: pa.Table) -> pa.Table:
            s = pd.unique(b.column(src).to_pandas())
            d = pd.unique(b.column(dst).to_pandas())
            return pa.table({
                "node": pa.array(np.concatenate([s, d]).astype("int64")),
                "is_dst": pa.array(np.concatenate(
                    [np.zeros(len(s), "int8"), np.ones(len(d), "int8")]))})

        ep = edges.map_batches(endpoint_sets, batch_format="pyarrow")
        ep = (ep.groupby("node").max("is_dst")
              .map_batches(lambda b: b.rename_columns(["node", "is_dst"]),
                           batch_format="pyarrow").materialize())
        n_nodes = ep.count()
        if strategy == "broadcast" or n_nodes <= broadcast_threshold:
            eps = ep.to_pandas()
            roots = [int(n) for n, d in zip(eps["node"], eps["is_dst"])
                     if d == 0]
            best: dict[int, int] = {r: 0 for r in roots}
            frontier = dict(best)
            for _ in range(k):
                if not frontier:
                    break
                ref = ray.put(frontier)

                def relax_b(b: pa.Table, _r=ref) -> pd.DataFrame:
                    fr = ray.get(_r)
                    u = b.column(src).to_pylist()
                    v = b.column(dst).to_pylist()
                    cand: dict[int, int] = {}
                    for uu, vv in zip(u, v):
                        lv = fr.get(uu)
                        if lv is not None:
                            nl = lv + 1
                            if nl > cand.get(vv, -1):
                                cand[vv] = nl
                    return pd.DataFrame({
                        "node": pd.Series(list(cand.keys()),
                                          dtype="int64"),
                        "layer": pd.Series(list(cand.values()),
                                           dtype="int64")})

                parts = edges.map_batches(
                    relax_b, batch_format="pyarrow").take_all()
                frontier = {}
                for r in parts:
                    n, lv = int(r["node"]), int(r["layer"])
                    if lv > best.get(n, -1) and lv > frontier.get(n, -1):
                        frontier[n] = lv
                best.update(frontier)
            items = sorted(best.items())
            return ray.data.from_arrow(pa.table({
                "node": pa.array([n for n, _ in items], type=pa.int64()),
                "layer": pa.array([l for _, l in items],
                                  type=pa.int64())}))

    srcs = edges.map_batches(
        lambda b: pa.table({"node": b.column(src).cast(pa.int64())}),
        batch_format="pyarrow")
    dsts = edges.map_batches(
        lambda b: pa.table({
            "node": b.column(dst).cast(pa.int64()),
            "_in": pa.array(np.ones(b.num_rows, "int8"))}),
        batch_format="pyarrow")
    dsts = (dsts.groupby("node").max("_in")
            .map_batches(lambda b: b.rename_columns(["node", "_in"]),
                         batch_format="pyarrow"))
    j = coalesce_for_join(
        srcs.groupby("node").count().drop_columns(["count()"])
        .materialize(), num_partitions
    ).join(coalesce_for_join(dsts.materialize(), num_partitions),
           join_type="left_outer", num_partitions=num_partitions,
           on=("node",), right_on=("node",))
    roots = j.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_in")))
                   .select(["node"]),
        batch_format="pyarrow")

    def as_seed(batch: pa.Table) -> pa.Table:
        ids = pd.unique(batch.column("node").to_pandas())
        z = np.zeros(len(ids), "int64")
        return pa.table({"node": pa.array(ids.astype("int64")),
                         "layer": pa.array(z), "old": pa.array(z)})

    def _fold(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.groupby("node").aggregate(
            Max("layer", alias_name="layer"),
            Max("old", alias_name="old"))

    best = _fold(
        roots.map_batches(as_seed, batch_format="pyarrow")).materialize()
    frontier = best
    for hop in range(k):
        expand = coalesce_for_join(
            frontier.select_columns(["node", "layer"]), num_partitions
        ).join(
            edges, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=(src,),
        )

        def relax(batch: pa.Table) -> pa.Table:
            lv = batch.column("layer").to_numpy() + 1
            return pa.table({
                "node": batch.column(dst).cast(pa.int64()),
                "layer": pa.array(lv.astype("int64")),
                "old": pa.array(np.full(len(lv), np.int64(-1), "int64")),
            })

        cand = expand.map_batches(relax, batch_format="pyarrow")
        prior = best.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "layer": b.column("layer"),
                                "old": b.column("layer")}),
            batch_format="pyarrow")
        best = _fold(prior.union(cand)).materialize()
        if hop == k - 1:
            break
        frontier = best.map_batches(
            lambda b: b.filter(
                pc.greater(b.column("layer"), b.column("old"))),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
    return best.select_columns(["node", "layer"])


def dag_path_counts(
    edges: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    strategy: str = "auto",
    broadcast_threshold: int = 500_000,
) -> ray.data.Dataset:
    """DAG distinct-path counting under the (+, x) counting semiring:
    (node, n_paths) where n_paths = the number of distinct directed
    paths reaching the node from ANY root (a node with no incoming
    edge; roots count their empty path, so n_paths(root) >= 1).
    The third semiring sibling next to k_hop_reachability's (min, +)
    and dag_longest_path's (max, +) — provenance/lineage fan-in,
    attack-path enumeration and feed-forward network fan-out all read
    off it.

    Per round the frontier carries f_t = paths of length EXACTLY t per
    node; ONE hash join relaxes out-edges to f_{t+1}(v) = sum over
    (u, v) of f_t(u) (grouped SUM fold, not max), totals accumulate by
    a final grouped sum over all rounds.  On a DAG the frontier
    empties by round <= longest path, so `k` >= that bound gives the
    exact count; cyclic inputs are the caller's contract violation
    (counts would diverge) and simply stop at the bound.  Parallel
    edges count as distinct paths (multigraph semantics) — pre-dedup
    upstream for simple-graph counting.

    `strategy` follows dag_longest_path: "broadcast" keeps the count
    state driver-resident (node-count <= `broadcast_threshold`
    contract) and streams only edges per round; "join" is the
    unbounded-graph shuffle path; "auto" counts nodes once and
    picks."""
    from ray.data.aggregate import Sum

    from .joins import coalesce_for_join

    if strategy not in ("auto", "join", "broadcast"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if num_partitions is None:
        num_partitions = _default_join_partitions()

    edges = coalesce_for_join(
        edges.select_columns([src, dst]), num_partitions).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "n_paths": pa.array([], type=pa.int64())}))

    if strategy != "join":
        def endpoint_sets(b: pa.Table) -> pa.Table:
            s = pd.unique(b.column(src).to_pandas())
            d = pd.unique(b.column(dst).to_pandas())
            return pa.table({
                "node": pa.array(np.concatenate([s, d]).astype("int64")),
                "is_dst": pa.array(np.concatenate(
                    [np.zeros(len(s), "int8"), np.ones(len(d), "int8")]))})

        ep = edges.map_batches(endpoint_sets, batch_format="pyarrow")
        ep = (ep.groupby("node").max("is_dst")
              .map_batches(lambda b: b.rename_columns(["node", "is_dst"]),
                           batch_format="pyarrow").materialize())
        n_nodes = ep.count()
        if strategy == "broadcast" or n_nodes <= broadcast_threshold:
            eps = ep.to_pandas()
            total: dict[int, int] = {
                int(n): 1 for n, d in zip(eps["node"], eps["is_dst"])
                if d == 0}
            frontier = dict(total)
            for _ in range(k):
                if not frontier:
                    break
                ref = ray.put(frontier)

                def step_b(b: pa.Table, _r=ref) -> pd.DataFrame:
                    fr = ray.get(_r)
                    u = b.column(src).to_pylist()
                    v = b.column(dst).to_pylist()
                    cand: dict[int, int] = {}
                    for uu, vv in zip(u, v):
                        c = fr.get(uu)
                        if c is not None:
                            cand[vv] = cand.get(vv, 0) + c
                    return pd.DataFrame({
                        "node": pd.Series(list(cand.keys()),
                                          dtype="int64"),
                        "n_paths": pd.Series(list(cand.values()),
                                             dtype="int64")})

                parts = edges.map_batches(
                    step_b, batch_format="pyarrow").take_all()
                frontier = {}
                for r in parts:
                    n, c = int(r["node"]), int(r["n_paths"])
                    frontier[n] = frontier.get(n, 0) + c
                for n, c in frontier.items():
                    total[n] = total.get(n, 0) + c
            items = sorted(total.items())
            return ray.data.from_arrow(pa.table({
                "node": pa.array([n for n, _ in items], type=pa.int64()),
                "n_paths": pa.array([c for _, c in items],
                                    type=pa.int64())}))

    srcs = edges.map_batches(
        lambda b: pa.table({"node": b.column(src).cast(pa.int64())}),
        batch_format="pyarrow")
    dsts = edges.map_batches(
        lambda b: pa.table({
            "node": b.column(dst).cast(pa.int64()),
            "_in": pa.array(np.ones(b.num_rows, "int8"))}),
        batch_format="pyarrow")
    dsts = (dsts.groupby("node").max("_in")
            .map_batches(lambda b: b.rename_columns(["node", "_in"]),
                         batch_format="pyarrow"))
    j = coalesce_for_join(
        srcs.groupby("node").count().drop_columns(["count()"])
        .materialize(), num_partitions
    ).join(coalesce_for_join(dsts.materialize(), num_partitions),
           join_type="left_outer", num_partitions=num_partitions,
           on=("node",), right_on=("node",))
    roots = j.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_in")))
                   .select(["node"]),
        batch_format="pyarrow")

    def as_seed(batch: pa.Table) -> pa.Table:
        ids = pd.unique(batch.column("node").to_pandas())
        return pa.table({
            "node": pa.array(ids.astype("int64")),
            "n_paths": pa.array(np.ones(len(ids), "int64"))})

    frontier = roots.map_batches(
        as_seed, batch_format="pyarrow").materialize()
    acc = [frontier]
    for _ in range(k):
        if frontier.count() == 0:
            break
        expand = coalesce_for_join(
            frontier, num_partitions
        ).join(
            edges, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=(src,),
        )

        def step(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch.column(dst).cast(pa.int64()),
                "n_paths": batch.column("n_paths").cast(pa.int64())})

        frontier = (expand.map_batches(step, batch_format="pyarrow")
                    .groupby("node")
                    .aggregate(Sum("n_paths", alias_name="n_paths"))
                    .materialize())
        acc.append(frontier)
    out = acc[0]
    for part in acc[1:]:
        out = out.union(part)
    return (out.groupby("node")
            .aggregate(Sum("n_paths", alias_name="n_paths")))


def _md5_prio(nodes: np.ndarray) -> np.ndarray:
    """Deterministic per-node priority: md5 hex of the DECIMAL id string.
    Distinct ids give distinct digests, and DuckDB's md5(CAST(x AS
    VARCHAR)) replays it exactly, so a SQL oracle can re-derive the same
    random-looking total order with no shared RNG."""
    import hashlib

    return np.array([hashlib.md5(str(int(x)).encode()).hexdigest()
                     for x in nodes], dtype=object)


def luby_mis(
    edges: ray.data.Dataset,
    rounds: int,
    src: str = "a",
    dst: str = "b",
    n_buckets: int = 32,
    broadcast_threshold: int = 20_000_000,
) -> ray.data.Dataset:
    """Bounded-round deterministic Luby maximal-independent-set over an
    undirected (a < b canonical, distinct) edge set — the classic
    symmetry-breaking primitive (Luby 1986) behind parallel matching /
    coloring / scheduling.  Each round, an alive node whose md5 priority
    is strictly smaller than every alive neighbor's (or with no alive
    neighbor left) joins the MIS; MIS nodes and their alive neighbors
    leave the alive set.  A FIXED round count makes the trajectory
    replayable by an unrolled SQL oracle (the q127/q231 pattern).

    NOTE (ADVICE r3): priorities are hashed ONCE and held fixed across
    rounds, so this is the deterministic greedy-by-fixed-priority MIS
    variant, not textbook Luby — Luby's constant-fraction-per-round
    expectation requires a fresh draw each round and does NOT apply
    here; an adversarial priority order can need O(n) rounds (each
    round still decides at least every local priority minimum, so on
    hashed ids the expected round count stays logarithmic).  Undecided
    rows after `rounds` are reported honestly as 'alive'.

    Returns one row per node: (node, status, decided_round) with status
    in {'mis', 'removed', 'alive'}; 'alive' rows carry
    decided_round = -1 (undecided after `rounds`).

    Scale shape: per round, ONE node-bucketed exchange folds the min
    alive-neighbor priority; the MIS and removed sets of a round are
    bounded by the alive node count and travel as broadcast sorted
    arrays (id membership via searchsorted) — the same contract as
    k_core_peel's auto path.  `broadcast_threshold` guards the alive-set
    collect; past it the caller should pre-partition the graph."""
    sym_cols = (src, dst)

    def node_part(batch: pa.Table) -> pd.DataFrame:
        u = batch.column(src).to_numpy().astype("int64")
        v = batch.column(dst).to_numpy().astype("int64")
        node = np.unique(np.concatenate([u, v]))
        return _tag_int_bucket(pd.DataFrame({"node": node}),
                               "node", n_buckets)

    nd = (edges.map_batches(node_part, batch_format="pyarrow")
          .groupby("_bucket")
          .map_groups(lambda g: g[["node"]].drop_duplicates(),
                      batch_format="pandas")
          .to_pandas())
    all_nodes = np.sort(nd["node"].to_numpy("int64")
                        if "node" in nd.columns
                        else np.empty(0, "int64"))
    if len(all_nodes) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype="int64"),
            "status": pd.Series([], dtype=object),
            "decided_round": pd.Series([], dtype="int64")}))
    if len(all_nodes) > broadcast_threshold:
        raise ValueError(
            f"alive set {len(all_nodes)} exceeds broadcast_threshold "
            f"{broadcast_threshold}; pre-partition the graph")

    e = edges.select_columns(list(sym_cols)).materialize()
    alive = all_nodes  # sorted ids
    decided: dict[int, tuple[str, int]] = {}
    for r in range(1, rounds + 1):
        if len(alive) == 0:
            break
        # min alive-neighbor priority per node, one bucketed exchange
        def min_nb_part(batch: pa.Table, _alive=alive) -> pd.DataFrame:
            u = batch.column(src).to_numpy().astype("int64")
            v = batch.column(dst).to_numpy().astype("int64")
            node = np.concatenate([u, v])
            nb = np.concatenate([v, u])
            df = pd.DataFrame({"node": node,
                               "nb_prio": _md5_prio(nb)})
            part = (df.groupby("node", sort=False)["nb_prio"].min()
                    .reset_index())
            return _tag_int_bucket(part, "node", n_buckets)

        min_nb = (e.map_batches(min_nb_part, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(
                      lambda g: g.groupby("node", sort=False)["nb_prio"]
                      .min().reset_index(), batch_format="pandas")
                  .to_pandas())
        if "node" not in min_nb.columns:  # edge set drained: all isolated
            min_nb = pd.DataFrame({
                "node": pd.Series([], dtype="int64"),
                "nb_prio": pd.Series([], dtype=object)})
        own = pd.DataFrame({"node": alive})
        own["own_prio"] = _md5_prio(own["node"].to_numpy())
        m = own.merge(min_nb, on="node", how="left")
        isolated = m["nb_prio"].isna()
        wins = isolated | (m["own_prio"] < m["nb_prio"].fillna(""))
        mis_ids = np.sort(m.loc[wins, "node"].to_numpy("int64"))
        if len(mis_ids) == 0:
            break
        # removed = alive neighbors of MIS nodes (one streamed pass)
        mis_ref = ray.put(mis_ids)

        def nb_of_mis(batch: pa.Table, _ref=mis_ref) -> pd.DataFrame:
            mids = ray.get(_ref)
            u = batch.column(src).to_numpy().astype("int64")
            v = batch.column(dst).to_numpy().astype("int64")

            def member(x, a):
                i = np.minimum(np.searchsorted(a, x), len(a) - 1)
                return a[i] == x if len(a) else np.zeros(len(x), bool)

            out = np.concatenate([v[member(u, mids)], u[member(v, mids)]])
            return pd.DataFrame({"node": np.unique(out)})

        nb = e.map_batches(nb_of_mis, batch_format="pyarrow").to_pandas()
        nb_ids = (np.unique(nb["node"].to_numpy("int64"))
                  if len(nb) else np.empty(0, "int64"))
        removed = np.setdiff1d(nb_ids, mis_ids, assume_unique=True)
        for x in mis_ids:
            decided[int(x)] = ("mis", r)
        for x in removed:
            decided[int(x)] = ("removed", r)
        alive = np.setdiff1d(
            alive, np.union1d(mis_ids, removed), assume_unique=True)
        if len(alive) == 0:
            break
        alive_ref = ray.put(alive)

        def keep_alive(batch: pa.Table, _ref=alive_ref) -> pa.Table:
            a = ray.get(_ref)
            u = batch.column(src).to_numpy().astype("int64")
            v = batch.column(dst).to_numpy().astype("int64")
            iu = np.minimum(np.searchsorted(a, u), len(a) - 1)
            iv = np.minimum(np.searchsorted(a, v), len(a) - 1)
            return batch.filter(pa.array((a[iu] == u) & (a[iv] == v)))

        e = e.map_batches(keep_alive, batch_format="pyarrow").materialize()

    rows = pd.DataFrame({
        "node": all_nodes.astype("int64"),
        "status": [decided.get(int(x), ("alive", -1))[0]
                   for x in all_nodes],
        "decided_round": np.array(
            [decided.get(int(x), ("alive", -1))[1] for x in all_nodes],
            dtype="int64"),
    })
    return ray.data.from_pandas(rows)


def temporal_earliest_arrival(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    t: str = "t",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Time-respecting earliest-arrival reachability over a temporal
    edge set (Kempe-Kleinberg-Kumar temporal paths — the traversal
    where an edge is usable only at its timestamp): arrival[v] = the
    minimum final edge time of a path seed ->* v whose edge times are
    NON-DECREASING and start at or after the seed's start time
    (waiting at a node is allowed).  Static BFS over-reports here — a
    path that uses a Tuesday edge before a Monday edge is not
    realizable; this operator is the primitive for supply-chain /
    contagion / information-flow analyses.

    Per round: ONE native hash join (frontier x edges on `src`,
    keeping rows with edge time >= the frontier arrival) and ONE
    union+grouped-min fold that merges improvements into the state —
    the k_hop_reachability shape with (node, t_arr) state instead of
    (node, hops).  Semi-naive: only nodes whose arrival IMPROVED last
    round re-expand (an unimproved node's expansions were already
    folded — min-merge makes the full and incremental frontiers
    equivalent, which is also why a fixed `rounds` unrolls to a SQL
    oracle).  State is MATERIALIZED between rounds (iterative lineage
    rule).  `seeds`: dataset (node, t0).  Output: (node, t_arr) for
    every node reached within `rounds` temporal hops."""
    from .joins import coalesce_for_join

    if num_partitions is None:
        try:
            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 2

    def norm(ds, node_col, t_col):
        return ds.map_batches(
            lambda b: pa.table({
                "node": b.column(node_col).cast(pa.int64()),
                "t_arr": b.column(t_col).cast(pa.int64())}),
            batch_format="pyarrow")

    e = edges.map_batches(
        lambda b: pa.table({
            src: b.column(src).cast(pa.int64()),
            dst: b.column(dst).cast(pa.int64()),
            t: b.column(t).cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    if seeds.count() == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype="int64"),
            "t_arr": pd.Series([], dtype="int64")}))
    state = (norm(seeds, "node", "t0")
             .groupby("node").min("t_arr")
             .map_batches(lambda b: pa.table({
                 "node": b.column("node"),
                 "t_arr": b.column("min(t_arr)")}),
                 batch_format="pyarrow")
             .materialize())
    frontier = state
    for _ in range(rounds):
        if frontier.count() == 0 or e.count() == 0:
            break
        j = coalesce_for_join(frontier, num_partitions).join(
            coalesce_for_join(e, num_partitions), join_type="inner",
            num_partitions=num_partitions, on=("node",), right_on=(src,))

        def expand(b: pa.Table) -> pa.Table:
            ok = pc.greater_equal(b.column(t), b.column("t_arr"))
            f = b.filter(ok)
            return pa.table({"node": f.column(dst).cast(pa.int64()),
                             "t_arr": f.column(t).cast(pa.int64())})

        cand = (j.map_batches(expand, batch_format="pyarrow")
                .groupby("node").min("t_arr")
                .map_batches(lambda b: pa.table({
                    "node": b.column("node"),
                    "cand_t": b.column("min(t_arr)")}),
                    batch_format="pyarrow"))
        if cand.count() == 0:
            break
        # merge + improvement detection in ONE grouped fold: tag sides
        tagged = state.map_batches(
            lambda b: pa.table({
                "node": b.column("node"), "t_val": b.column("t_arr"),
                "is_old": pa.array(np.ones(b.num_rows, dtype=bool))}),
            batch_format="pyarrow").union(cand.map_batches(
                lambda b: pa.table({
                    "node": b.column("node"),
                    "t_val": b.column("cand_t"),
                    "is_old": pa.array(np.zeros(b.num_rows, dtype=bool))}),
                batch_format="pyarrow"))

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            best = g.groupby("node", sort=False)["t_val"].min()
            old = (g[g["is_old"]].groupby("node", sort=False)["t_val"]
                   .min())
            out = best.reset_index().rename(columns={"t_val": "t_arr"})
            om = out["node"].map(old)
            out["improved"] = om.isna() | (out["t_arr"] < om)
            return out

        merged = (tagged.groupby("node")
                  .map_groups(fold, batch_format="pandas")
                  .materialize())
        state = merged.map_batches(
            lambda b: b.select(["node", "t_arr"]),
            batch_format="pyarrow").materialize()
        frontier = merged.map_batches(
            lambda b: b.filter(b.column("improved"))
            .select(["node", "t_arr"]),
            batch_format="pyarrow").materialize()
    return state

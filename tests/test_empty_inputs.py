"""Empty-input robustness: every partial-collecting operator must return
a clean empty result, not KeyError, when the input dataset has zero rows
(at 100 TB a partition-pruned read legitimately yields empty shards).

The hazard: `ds.map_batches(f).to_pandas()` on an empty dataset produces
a DataFrame with NO columns (no partial blocks were ever emitted), so any
downstream column access crashes unless guarded."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gliner_transbronchialbiopsy_ray.functions.sketches import (
    approx_distinct,
    approx_quantiles,
)
from gliner_transbronchialbiopsy_ray.stages.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    simhash_signatures,
    verified_near_dups,
)
from gliner_transbronchialbiopsy_ray.stages.similarity import (
    brute_force_topk,
    ivf_topk,
    kmeans_dataset,
)
from gliner_transbronchialbiopsy_ray.stages.text_analysis import word_frequencies
from gliner_transbronchialbiopsy_ray.stages.window import (
    global_prefix_scan,
    keyed_running_agg,
)


def _empty_docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))


def _empty_emb():
    return rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))


def _empty_events():
    return rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("ns")),
        "value": pa.array([], pa.float64()),
    }))


def test_sketches_empty(ray_session):
    assert approx_distinct(_empty_docs(), "doc_id") == 0.0
    qs = approx_quantiles(_empty_events(), "value", [0.5])
    assert len(qs) == 1 and np.isnan(qs[0])


def test_window_empty(ray_session):
    ev = _empty_events()
    assert len(global_prefix_scan(ev, order_by="ts", value="value").to_pandas()) == 0
    assert len(keyed_running_agg(ev, key="user_id", order_by="ts",
                                 value="value").to_pandas()) == 0


def test_similarity_empty(ray_session):
    q = {1: np.ones(8, dtype=np.float32)}
    bf = brute_force_topk(_empty_emb(), q, k=3)
    assert len(bf) == 0 and "rank" in bf.columns
    ivf = ivf_topk(_empty_emb(), q, k=3)
    assert len(ivf) == 0 and list(ivf.columns) == [
        "query_id", "neighbor_id", "score", "rank"]
    assigned, stats = kmeans_dataset(_empty_emb(), k=2, iters=2)
    assert len(stats) == 0
    assert list(stats.columns) == ["cluster", "n", "inertia"]
    # the empty assignment keeps the NORMAL output schema (note:
    # Dataset.to_pandas() drops columns on zero-row data — the schema on
    # the Dataset is the contract)
    assert assigned.schema().names == ["vec_id", "cluster", "sq_dist"]
    assert assigned.count() == 0


def test_hard_negative_topk_empty_and_no_negatives(ray_session):
    from gliner_transbronchialbiopsy_ray.stages.similarity import (
        hard_negative_topk,
    )

    q = {1: np.ones(4, dtype=np.float32)}
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32()),
    }))
    out = hard_negative_topk(empty, q, {1: 0}, k=3)
    assert len(out) == 0 and "rank" in out.columns
    # corpus where EVERY row shares the query's label: the mask removes
    # all candidates, so the result must be empty, not an error
    same = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0, 0, 0]] * 3, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32()),
    }))
    out = hard_negative_topk(same, q, {1: 0}, k=3)
    assert len(out) == 0
    # one row of a different label is the single (hard) negative
    mixed = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0, 0, 0]] * 3, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 7], pa.int32()),
    }))
    out = hard_negative_topk(mixed, q, {1: 0}, k=3)
    assert list(out["neighbor_id"]) == [3]
    assert list(out["neighbor_label"]) == [7]
    assert list(out["rank"]) == [1]


def test_dedup_empty(ray_session):
    docs = _empty_docs()
    assert len(exact_dedup(docs).to_pandas()) == 0
    assert len(minhash_candidate_pairs(docs).to_pandas()) == 0
    assert len(verified_near_dups(docs).to_pandas()) == 0
    assert len(simhash_signatures(docs).to_pandas()) == 0


def test_text_analysis_empty(ray_session):
    wf = word_frequencies(_empty_docs(), top_k=5)
    assert len(wf) == 0 and list(wf.columns) == ["word", "n"]


def _empty_edges():
    import pyarrow as pa
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64())}))


def test_empty_inputs_session4_graph_ops():
    import pyarrow as pa
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        bipartite_components, dag_longest_path, k_hop_widest_path,
        k_truss_edges)
    e = _empty_edges()
    assert k_truss_edges(e, k=3, rounds=1).count() == 0
    assert bipartite_components(e, rounds=2).count() == 0
    ew = rd.from_arrow(pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64()),
        "cap": pa.array([], type=pa.int64())}))
    seeds = rd.from_items([{"node": 0}])
    out = k_hop_widest_path(ew, seeds, k=2).to_pandas()
    assert list(out["node"]) == [0]          # seed survives, no edges
    ed = rd.from_arrow(pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64())}))
    assert dag_longest_path(ed, k=2).count() == 0


def test_empty_inputs_session4_text_and_stats():
    import pyarrow as pa
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        prefix_filter_jaccard_pairs)
    from gliner_transbronchialbiopsy_ray.stages.link import edit1_join
    from gliner_transbronchialbiopsy_ray.stages.shacl import induce_shapes
    from gliner_transbronchialbiopsy_ray.stages.stats import (
        grouped_median_x2, grouped_mode, rollup_aggregate)
    from gliner_transbronchialbiopsy_ray.stages.text_analysis import (
        bpe_train)
    from gliner_transbronchialbiopsy_ray.stages.window import (
        keyed_lag, keyed_ranks)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    assert len(bpe_train(docs, n_merges=3)) == 0
    assert prefix_filter_jaccard_pairs(docs, 0.5).count() == 0
    names = rd.from_arrow(pa.table({
        "name": pa.array([], type=pa.string())}))
    assert edit1_join(names, names).count() == 0
    kv = rd.from_arrow(pa.table({
        "k": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.int64())}))
    assert grouped_median_x2(kv, ["k"], "v").count() == 0
    assert grouped_mode(kv, ["k"], "v").count() == 0
    assert rollup_aggregate(kv, ["k"], "v").count() <= 1  # grand total
    idv = rd.from_arrow(pa.table({
        "id": pa.array([], type=pa.int64()),
        "k": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.int64())}))
    assert keyed_ranks(idv, "k", "v", ["id"]).count() == 0
    assert keyed_lag(idv, "k", "v", "v", ["id"]).count() == 0
    spo = rd.from_arrow(pa.table({
        "s": pa.array([], type=pa.string()),
        "p": pa.array([], type=pa.string()),
        "o": pa.array([], type=pa.string())}))
    assert induce_shapes(spo).count() == 0


def test_luby_mis_empty_edges_typed(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.graph import luby_mis

    empty = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                    "b": pa.array([], pa.int64())}))
    out = luby_mis(empty, rounds=2)
    assert out.schema().names == ["node", "status", "decided_round"]
    assert out.count() == 0


def test_temporal_earliest_arrival_empty_inputs(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.graph import (
        temporal_earliest_arrival)

    empty_e = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                      "dst": pa.array([], pa.int64()),
                                      "t": pa.array([], pa.int64())}))
    seeds = rd.from_items([{"node": 1, "t0": 0}])
    # no edges: the seed set is the fixpoint
    out = temporal_earliest_arrival(empty_e, seeds, rounds=2).to_pandas()
    assert out.to_dict("records") == [{"node": 1, "t_arr": 0}]
    # no seeds: typed empty
    empty_s = rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                      "t0": pa.array([], pa.int64())}))
    e1 = rd.from_items([{"src": 1, "dst": 2, "t": 3}])
    out2 = temporal_earliest_arrival(e1, empty_s, rounds=2)
    assert out2.schema().names == ["node", "t_arr"]
    assert out2.count() == 0

"""Pivot view (G1), statistics suite (G2-G8), corrections fold/upsert (A3/J2)."""

import datetime as dt
import json

import pyarrow as pa
import ray.data

from gliner_transbronchialbiopsy_ray import fixtures
from gliner_transbronchialbiopsy_ray.config import LABELS, PipelineConfig
from gliner_transbronchialbiopsy_ray.pipelines.btb import entities_dataset
from gliner_transbronchialbiopsy_ray.schema import CORRECTIONS_SCHEMA
from gliner_transbronchialbiopsy_ray.stages.corrections import (
    apply_corrections,
    fold_latest_state,
)
from gliner_transbronchialbiopsy_ray.stages.pivot import pivot_wide
from gliner_transbronchialbiopsy_ray.stages.stats import (
    global_stats,
    label_cooccurrence,
    label_statistics,
    threshold_impact,
)

CFG = PipelineConfig(ner_concurrency=1, ner_num_cpus=0.5)
N = 150


def _entities_ds():
    path = fixtures.write_corpus(N, seed=42, shards=2)
    return entities_dataset(ray.data.read_parquet(f"{path}/documents"), CFG)


def test_pivot_wide_matches_gold():
    tables = fixtures.generate_corpus(N, seed=42)
    ents = _entities_ds()
    wide = ents.map_batches(pivot_wide, batch_format="pyarrow").to_pandas()
    assert len(wide) == N
    assert set(LABELS) <= set(wide.columns)
    # gold mentions grouped per doc/label == ';'.join column values
    gold = {}
    for g in tables["gold_entities"].to_pylist():
        gold.setdefault((g["doc_id"], g["label"]), []).append(g["text"])
    for (doc, label), vals in list(gold.items())[:200]:
        cell = wide.loc[wide["Nom_Document"] == doc, label].iloc[0]
        assert cell == ";".join(vals), (doc, label, cell, vals)
    # Scores is valid JSON keyed by label
    s = json.loads(wide["Scores"].iloc[0])
    assert isinstance(s, dict)


def test_label_statistics_and_global_stats():
    tables = fixtures.generate_corpus(N, seed=42)
    ents = _entities_ds()
    stats = label_statistics(ents)
    assert set(stats["label"]) == set(LABELS)
    gold = tables["gold_entities"].to_pandas()
    gold_counts = gold.groupby("label").size()
    for _, row in stats.iterrows():
        assert row["count"] == gold_counts.get(row["label"], 0)
        if row["count"]:
            assert 0.5 <= row["min_score"] <= row["mean_score"] <= row["max_score"] < 1.0

    g = global_stats(_entities_ds())
    assert g["total_docs"] == N
    assert g["total_entities"] == len(gold)


def test_cooccurrence_and_threshold_curve():
    co = label_cooccurrence(_entities_ds())
    assert (co["label_a"] < co["label_b"]).all()
    assert (co["n"] > 0).all()
    # Site co-occurs with fragments in every 'ok' doc
    pair = co[(co["label_a"] == "Nombre Total De Fragments") & (co["label_b"] == "Site")]
    assert pair["n"].iloc[0] > 0

    curve = threshold_impact(_entities_ds())
    assert len(curve) == 21
    surv = curve["surviving"].to_numpy()
    assert (surv[:-1] >= surv[1:]).all()  # monotone non-increasing
    assert surv[0] == fixtures.generate_corpus(N, seed=42)["gold_entities"].num_rows


def test_corrections_fold_lww_and_upsert():
    base = dt.datetime(2025, 3, 1)
    corr = pa.Table.from_pylist(
        [
            {"doc_id": "d1", "entity_type": "Grade A", "original_value": "A0",
             "corrected_value": "A1", "ts": base, "user": "u1"},
            {"doc_id": "d1", "entity_type": "Grade A", "original_value": "A1",
             "corrected_value": "A2", "ts": base + dt.timedelta(minutes=5), "user": "u2"},
            {"doc_id": "d2", "entity_type": "Site", "original_value": "LM",
             "corrected_value": "LID", "ts": base, "user": "u1"},
        ],
        schema=CORRECTIONS_SCHEMA,
    )
    folded = fold_latest_state(ray.data.from_arrow(corr)).to_pandas()
    d1 = folded[folded["doc_id"] == "d1"]
    assert len(d1) == 1 and d1["corrected_value"].iloc[0] == "A2"  # LWW

    wide = ray.data.from_items(
        [
            {"Nom_Document": "d1", "Grade A": "A0", "Site": "LM"},
            {"Nom_Document": "d2", "Grade A": None, "Site": "LM"},
            {"Nom_Document": "d3", "Grade A": "A3", "Site": None},
        ]
    )
    out = apply_corrections(wide, ray.data.from_arrow(corr)).to_pandas()
    out = out.set_index("Nom_Document")
    assert out.loc["d1", "Grade A"] == "A2"
    assert out.loc["d2", "Site"] == "LID"
    assert out.loc["d3", "Grade A"] == "A3"  # untouched


def test_corrections_on_fixture_corpus():
    path = fixtures.write_corpus(N, seed=42, shards=2)
    tables = fixtures.generate_corpus(N, seed=42)
    if tables["corrections"].num_rows == 0:
        return
    ents = _entities_ds()
    wide = ents.map_batches(pivot_wide, batch_format="pyarrow")
    corr_ds = ray.data.read_parquet(f"{path}/corrections.parquet")
    out = apply_corrections(wide, corr_ds).to_pandas().set_index("Nom_Document")
    corr = tables["corrections"].to_pandas().sort_values("ts")
    latest = corr.groupby(["doc_id", "entity_type"]).tail(1)
    for _, r in latest.iterrows():
        assert out.loc[r["doc_id"], r["entity_type"]] == r["corrected_value"]


def test_apply_cdc_log_upsert_delete():
    import pytest
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.corrections import (
        apply_cdc_log)
    log = rd.from_items([
        {"k": 1, "op": "I", "seq": 1, "v": "a"},
        {"k": 1, "op": "U", "seq": 3, "v": "b"},     # wins
        {"k": 1, "op": "U", "seq": 2, "v": "zz"},
        {"k": 2, "op": "I", "seq": 1, "v": "x"},
        {"k": 2, "op": "D", "seq": 2, "v": ""},      # erased
        {"k": 3, "op": "I", "seq": 5, "v": "c"},
        {"k": 3, "op": "D", "seq": 6, "v": ""},
        {"k": 3, "op": "I", "seq": 7, "v": "c2"},    # re-inserted
    ]).repartition(3)
    out = (apply_cdc_log(log, ["k"]).to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert list(map(tuple, out[["k", "v"]].to_numpy())) == \
        [(1, "b"), (3, "c2")]
    bad = rd.from_items([
        {"k": 1, "op": "I", "seq": 1, "v": "a"},
        {"k": 1, "op": "U", "seq": 1, "v": "b"},
    ])
    with pytest.raises(Exception, match="total-order"):
        apply_cdc_log(bad, ["k"]).to_pandas()


def test_pivot_wide_matches_rowwise_reference():
    """The Arrow-vectorized pivot must equal the straightforward per-row
    construction on every column — including rows with no entities
    (null AND empty lists), unknown labels (Scores only), duplicate
    mentions per label (order preserved), and float rounding in Scores."""
    import json

    import pyarrow as pa

    from gliner_transbronchialbiopsy_ray.stages.pivot import pivot_wide

    labels = ["Grade A", "Grade B", "Rejet"]
    ent = pa.list_(pa.struct([("label", pa.string()),
                              ("text", pa.string()),
                              ("score", pa.float64())]))
    rows = [
        [{"label": "Grade A", "text": "A1", "score": 0.91234},
         {"label": "Grade A", "text": "A0", "score": 0.5},
         {"label": "Rejet", "text": "minime", "score": 0.75}],
        [],
        None,
        [{"label": "Unknown", "text": "x", "score": 0.25}],
        [{"label": "Grade B", "text": "B0", "score": 1.0},
         {"label": "Grade B", "text": "B0", "score": 0.3335}],
    ]
    batch = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
        "conclusion": pa.array(["c"] * len(rows)),
        "entities": pa.array(rows, type=ent),
    })
    out = pivot_wide(batch, labels=labels)
    exp_cols = {lb: [] for lb in labels}
    exp_scores, exp_n = [], []
    for ents in rows:
        ents = ents or []
        pl, ps = {}, {}
        for e in ents:
            pl.setdefault(e["label"], []).append(e["text"])
            ps.setdefault(e["label"], []).append(round(e["score"], 3))
        for lb in labels:
            v = pl.get(lb)
            exp_cols[lb].append(";".join(v) if v else None)
        exp_scores.append(json.dumps(ps, ensure_ascii=False,
                                     sort_keys=True))
        exp_n.append(len(ents))
    for lb in labels:
        assert out.column(lb).to_pylist() == exp_cols[lb], lb
    assert out.column("Scores").to_pylist() == exp_scores
    assert out.column("n_entities").to_pylist() == exp_n
    assert out.column("Nom_Document").to_pylist() == [
        f"d{i}" for i in range(len(rows))]

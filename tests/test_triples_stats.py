"""Salted canonicalization aggregate (D4/north-star stage 3), global triple
dedup variant, NER cache eviction, truncation parity mode."""

import pandas as pd
import pyarrow as pa
import ray.data

from gliner_transbronchialbiopsy_ray import fixtures
from gliner_transbronchialbiopsy_ray.config import PipelineConfig
from gliner_transbronchialbiopsy_ray.pipelines.btb import (
    entities_dataset,
    triples_dataset,
)
from gliner_transbronchialbiopsy_ray.stages.ner import NerStage
from gliner_transbronchialbiopsy_ray.stages.triples import (
    dedup_triples_global,
    surface_form_stats,
)

CFG = PipelineConfig(ner_concurrency=1, ner_num_cpus=0.5)
N = 120


def _tri():
    path = fixtures.write_corpus(N, seed=42, shards=2)
    return triples_dataset(ray.data.read_parquet(f"{path}/documents"), CFG)


def test_surface_form_stats_matches_pandas():
    tri = _tri()
    full = tri.to_pandas()
    expected = (
        full.groupby(["pred", "obj"])
        .agg(n=("subj", "size"), n_docs=("subj", "nunique"))
        .reset_index()
    )
    got = surface_form_stats(_tri()).to_pandas()
    got = got[["pred", "obj", "n", "n_docs"]].sort_values(["pred", "obj"]).reset_index(drop=True)
    expected = expected.sort_values(["pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
    # hot keys exist (grade values are power-law) — salting must not lose them
    assert (got["n"] > 1).any()


def test_global_triple_dedup_variant():
    # duplicate every triple row, then global dedup must restore uniqueness
    tri = _tri()
    full = tri.to_pandas()
    doubled = ray.data.from_pandas(pd.concat([full, full], ignore_index=True))
    deduped = dedup_triples_global(doubled).to_pandas()
    assert len(deduped) == len(full.drop_duplicates(["subj", "pred", "obj"]))


def test_ner_cache_eviction_correctness():
    stage = NerStage(cache_size=2)  # smaller than batch uniques
    texts = [
        "Biopsies transbronchiques (LID) : 7 fragments.",
        "Biopsies transbronchiques (LM) : 3 fragments.",
        "Biopsies transbronchiques (LSD) : 5 fragments.",
        "Biopsies transbronchiques (LID) : 7 fragments.",  # repeat of row 0
    ]
    batch = pa.table(
        {"doc_id": [f"d{i}" for i in range(4)],
         "conclusion": texts,
         "status": ["ok"] * 4}
    )
    out = stage(batch)
    ents = out.column("entities").to_pylist()
    assert all(len(e) >= 1 for e in ents)
    assert ents[0] == ents[3]  # identical text -> identical result
    assert len(stage.cache) <= 2


def test_truncation_parity_mode():
    path = fixtures.write_corpus(60, seed=42, shards=1)
    cfg = PipelineConfig(ner_concurrency=1, ner_num_cpus=0.5, truncate_chars=512)
    ents = entities_dataset(ray.data.read_parquet(f"{path}/documents"), cfg)
    for row in ents.select_columns(["conclusion", "entities"]).iter_rows():
        for e in row["entities"]:
            assert e["end"] <= 512  # no span beyond the truncation cap


def test_surface_form_stats_extreme_hot_key():
    """Salted two-phase aggregation must stay exact when one canonical value
    dominates (power-law hot key, e.g. 'A0' at 90%+ frequency)."""
    import numpy as np

    rng = np.random.RandomState(7)
    n = 50_000
    objs = np.where(rng.rand(n) < 0.92, "A0", rng.choice(["A1", "A2", "A3"], n))
    df = pd.DataFrame(
        {
            "subj": [f"doc-{i}" for i in range(n)],
            "pred": "has_grade_a",
            "obj": objs,
        }
    )
    ds = ray.data.from_pandas(df).repartition(16)
    got = surface_form_stats(ds).to_pandas()
    expected = (
        df.groupby(["pred", "obj"])
        .agg(n=("subj", "size"), n_docs=("subj", "nunique"))
        .reset_index()
    )
    got = got[["pred", "obj", "n", "n_docs"]].sort_values("obj").reset_index(drop=True)
    expected = expected.sort_values("obj").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
    assert got.loc[got["obj"] == "A0", "n"].iloc[0] > 40_000  # genuinely hot


def test_hot_key_salt_actually_spreads():
    """The salt must be independent of (pred, obj): a hot key arriving in
    many batches must land in MANY salt buckets (the round-1 key-derived
    salt put every partial of a key in the same bucket — a no-op)."""
    import numpy as np
    from gliner_transbronchialbiopsy_ray.stages.triples import _PartialCount

    n = 20_000
    df = pd.DataFrame(
        {"subj": [f"doc-{i}" for i in range(n)], "pred": "has_grade_a",
         "obj": "A0"}  # 100% hot: every row is the same (pred, obj)
    )
    ds = ray.data.from_pandas(df).repartition(16)
    partials = ds.map_batches(
        _PartialCount(salt_buckets=16), batch_format="pyarrow"
    ).to_pandas()
    hot = partials[(partials["pred"] == "has_grade_a") & (partials["obj"] == "A0")]
    assert len(hot) > 1  # multiple batches produced partials
    assert hot["salt"].nunique() > 1, (
        "hot-key partials all share one salt bucket -- salting is a no-op"
    )
    # and no single (salt, pred, obj) group holds more partials than the
    # batch count in its share of buckets would allow with real spreading
    assert hot.groupby("salt").size().max() < len(hot)


def test_validate_entities_batch():
    """M6 standalone validator (reference entity_processor.py:194-233):
    bad label / score / span each produce an error string; clean rows
    give []; rows are never dropped."""
    import pyarrow as pa

    from gliner_transbronchialbiopsy_ray.schema import ENTITY_STRUCT
    from gliner_transbronchialbiopsy_ray.stages.ner import (
        validate_entities_batch,
    )

    ents = [
        [{"text": "A2", "label": "Grade A", "score": 0.9, "start": 0, "end": 2}],
        [{"text": "x", "label": "NotALabel", "score": 1.5, "start": 5, "end": 3}],
        [],
    ]
    batch = pa.table({
        "doc_id": pa.array(["d1", "d2", "d3"]),
        "conclusion": pa.array(["A2 grade", "tiny", None]),
        "entities": pa.array(ents, type=pa.list_(ENTITY_STRUCT)),
    })
    out = validate_entities_batch(batch)
    errs = out.column("validation_errors").to_pylist()
    assert errs[0] == []
    assert any("Invalid label" in e for e in errs[1])
    assert any("Invalid score" in e for e in errs[1])
    assert any("span" in e.lower() for e in errs[1])
    assert errs[2] == []
    assert out.num_rows == 3


def test_profile_columns_exact():
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.stats import profile_columns
    ds = rd.from_items([
        {"a": 5, "b": "x"}, {"a": 2, "b": "y"},
        {"a": 5, "b": None}, {"a": 9, "b": "x"},
    ]).repartition(3)
    out = profile_columns(ds, ["a", "b"], n_buckets=8)
    rows = {r.column: r for r in out.itertuples()}
    assert (rows["a"].n_rows, rows["a"].n_nulls,
            rows["a"].n_distinct) == (4, 0, 3)
    assert (rows["a"].min_repr, rows["a"].max_repr) == ("2", "9")
    assert (rows["b"].n_rows, rows["b"].n_nulls,
            rows["b"].n_distinct) == (4, 1, 2)
    assert (rows["b"].min_repr, rows["b"].max_repr) == ("x", "y")


def test_profile_columns_numeric_fold_across_blocks():
    """Per-block numeric minima must fold numerically, not as strings
    ('100' < '9' lexically)."""
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.stats import profile_columns
    ds = rd.from_items([{"a": int(v)} for v in range(3, 120)]
                       ).repartition(7)
    out = profile_columns(ds, ["a"], n_buckets=16)
    r = out.iloc[0]
    assert (r.min_repr, r.max_repr, r.n_distinct) == ("3", "119", 117)


def test_grouped_median_x2_exact():
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.stats import (
        grouped_median_x2)
    rows = ([{"k": "a", "v": x} for x in [5, 1, 9]] +          # odd: 5
            [{"k": "b", "v": x} for x in [4, 10, 2, 8]] +      # even: 4+8
            [{"k": "c", "v": x} for x in [7]])                 # single
    out = grouped_median_x2(
        rd.from_items(rows).repartition(4), ["k"], "v").to_pandas()
    got = dict(zip(out["k"], out["median_x2"]))
    assert got == {"a": 10, "b": 12, "c": 14}


def test_rollup_aggregate_matches_pandas():
    import pandas as pd
    import ray.data as rd
    import numpy as np
    from gliner_transbronchialbiopsy_ray.stages.stats import (
        rollup_aggregate)
    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 60),
        "b": rng.choice(["p", "q", "r"], 60),
        "v": rng.randint(0, 50, 60)})
    out = rollup_aggregate(
        rd.from_pandas(df).repartition(5), ["a", "b"], "v").to_pandas()
    # level 2: full groups
    lvl2 = out[out["level"] == 2]
    want = df.groupby(["a", "b"])["v"].agg(
        ["sum", "count", "min", "max"]).reset_index()
    got = lvl2.sort_values(["a", "b"]).reset_index(drop=True)
    assert (got["sum_v"].to_numpy() ==
            want.sort_values(["a", "b"])["sum"].to_numpy()).all()
    # level 1: per-a rollup carries the all-label in b
    lvl1 = out[out["level"] == 1]
    assert set(lvl1["b"]) == {"(all)"}
    wa = df.groupby("a")["v"].sum()
    ga = dict(zip(lvl1["a"], lvl1["sum_v"]))
    assert ga == wa.to_dict()
    # level 0: grand total
    lvl0 = out[out["level"] == 0]
    assert len(lvl0) == 1
    r = lvl0.iloc[0]
    assert (r["a"], r["b"]) == ("(all)", "(all)")
    assert (r["sum_v"], r["n"], r["min_v"], r["max_v"]) == (
        df["v"].sum(), 60, df["v"].min(), df["v"].max())


def test_grouped_mode_deterministic_ties():
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.stats import grouped_mode
    rows = ([{"k": "a", "v": "x"}] * 3 + [{"k": "a", "v": "y"}] * 3 +
            [{"k": "a", "v": "z"}] * 2 +          # tie x/y -> min 'x'
            [{"k": "b", "v": "q"}] * 1 + [{"k": "b", "v": "p"}] * 4)
    out = grouped_mode(rd.from_items(rows).repartition(4),
                       ["k"], "v").to_pandas()
    got = {r.k: (r.mode_value, r.mode_count) for r in out.itertuples()}
    assert got == {"a": ("x", 3), "b": ("p", 4)}

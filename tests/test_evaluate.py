"""G9 distributed evaluation: TP/FP/FN math, fold assignment, duplicate
mention set-semantics, and the cross-fold integer summary."""

import zlib

import pandas as pd
import pyarrow as pa
import ray.data

from gliner_transbronchialbiopsy_ray.functions.evaluate import (
    entity_prf_by_fold,
    explode_mentions,
    kfold_summary,
)


def _mentions(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "label": [r[1] for r in rows],
        "text": [r[2] for r in rows],
    }))


def test_tp_fp_fn_counters(ray_session):
    k = 1  # single fold -> easy global assertions
    pred = _mentions([
        ("d1", "Grade A", "A2"),          # TP
        ("d1", "Grade A", "A3"),          # FP (gold has A2 only)
        ("d2", "Site", "LSD"),            # TP
        ("d2", "Site", "LSD"),            # duplicate pred mention: ONE set entry
    ])
    gold = _mentions([
        ("d1", "Grade A", "A2"),
        ("d2", "Site", "LSD"),
        ("d3", "Infection", "CMV"),       # FN (never predicted)
    ])
    out = entity_prf_by_fold(pred, gold, k=k, n_buckets=4)
    by = out.set_index("label")
    assert by.loc["Grade A", ["tp", "fp", "fn"]].tolist() == [1, 1, 0]
    assert by.loc["Site", ["tp", "fp", "fn"]].tolist() == [1, 0, 0]
    assert by.loc["Infection", ["tp", "fp", "fn"]].tolist() == [0, 0, 1]
    assert by.loc["Grade A", "p_ppm"] == 500_000
    assert by.loc["Grade A", "r_ppm"] == 1_000_000
    assert by.loc["Infection", "f1_ppm"] == 0
    assert by.loc["Site", "f1_ppm"] == 1_000_000


def test_fold_assignment_is_doc_hash(ray_session):
    k = 5
    pred = _mentions([(f"d{i}", "Site", "LSD") for i in range(20)])
    gold = _mentions([(f"d{i}", "Site", "LSD") for i in range(20)])
    out = entity_prf_by_fold(pred, gold, k=k, n_buckets=4)
    expected_folds = sorted({zlib.crc32(f"d{i}".encode()) % k for i in range(20)})
    assert sorted(out["fold"].unique().tolist()) == expected_folds
    # every mention is a TP regardless of fold
    assert (out["tp"] == out.groupby("fold")["tp"].transform("sum")).all()
    assert out["fp"].sum() == 0 and out["fn"].sum() == 0


def test_kfold_summary_integer_stats():
    per_fold = pd.DataFrame({
        "fold": [0, 1, 0, 1],
        "label": ["A", "A", "B", "B"],
        "tp": [1, 1, 1, 1], "fp": [0, 0, 0, 0], "fn": [0, 0, 0, 0],
        "p_ppm": [1_000_000, 500_000, 1_000_000, 1_000_000],
        "r_ppm": [1_000_000, 1_000_000, 1_000_000, 1_000_000],
        "f1_ppm": [1_000_000, 666_666, 1_000_000, 1_000_000],
    })
    s = kfold_summary(per_fold).set_index("label")
    assert s.loc["A", "n_folds"] == 2
    assert s.loc["A", "mean_f1_ppm"] == (1_000_000 + 666_666) // 2
    assert s.loc["B", "std_f1_ppm"] == 0
    assert s.loc["A", "std_f1_ppm"] == int(
        ((1_000_000 - 833_333) ** 2 + (666_666 - 833_333) ** 2) / 2) ** 0.5 // 1
    assert s.loc["A", "mean_p_ppm"] == 750_000
    assert all(str(t) == "int64" for t in s.dtypes)


def test_explode_mentions_flattens_lists(ray_session):
    ents = ray.data.from_arrow(pa.table({
        "doc_id": ["d1", "d2"],
        "entities": pa.array(
            [[{"text": "A2", "label": "Grade A", "score": 0.9,
               "start": 0, "end": 2}],
             []],
        ),
    }))
    out = explode_mentions(ents).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].tolist() == ["d1", "Grade A", "A2"]

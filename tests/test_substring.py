"""Substring-window dedup (stages/substring.py): planted duplicated
chunks across otherwise-distinct documents."""

import pandas as pd
import pyarrow as pa
import ray.data

from gliner_transbronchialbiopsy_ray.stages.substring import (
    doc_dup_window_stats,
    duplicated_windows,
    emit_windows,
)

BLOCK = "X" * 15 + "SHARED-LICENSE-BOILERPLATE" + "Y" * 19  # exactly 60 chars
assert len(BLOCK) == 60


def _mk_docs():
    # docs 1 and 2 start with the same 60-char block (windows 0 and 40
    # differ in tail, window 0..40 identical); doc 3 unique; doc 4 short.
    rows = [
        {"doc_id": 1, "text": BLOCK + "unique tail one " * 8},
        {"doc_id": 2, "text": BLOCK + "another ending entirely " * 6},
        {"doc_id": 3, "text": "totally different content here " * 8},
        {"doc_id": 4, "text": "too short"},  # < window -> no windows
    ]
    return ray.data.from_items(rows)


def test_emit_windows_full_windows_only_and_deduped():
    text = "".join(chr(ord("a") + i % 26) for i in range(90))  # aperiodic-ish
    t = pa.table({"doc_id": pa.array([7], type=pa.int64()), "text": [text]})
    out = emit_windows(t, 40, 40)
    df = out.to_pandas()
    assert len(df) == 2  # offsets 0 and 40 (50-char tail window would be
    # partial -> excluded)
    assert all(df["win"].str.len() == 40)
    assert set(df["win"]) == {text[0:40], text[40:80]}
    # both windows of 'ababab...' at even offsets are identical -> after
    # per-doc dedup a repeated in-doc window counts once
    t2 = pa.table({"doc_id": pa.array([7], type=pa.int64()),
                   "text": ["ab" * 60]})  # windows at 0, 40, 80: identical
    assert emit_windows(t2, 40, 40).num_rows == 1


def test_emit_windows_empty_and_short():
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    assert emit_windows(empty, 40, 40).num_rows == 0
    short = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                      "text": ["tiny"]})
    assert emit_windows(short, 40, 40).num_rows == 0


def test_duplicated_windows_finds_shared_block():
    dups = duplicated_windows(_mk_docs(), window=40, stride=40).to_pandas()
    # only the first window (chars 0..40, inside the shared 60-char block)
    # is byte-identical across docs 1 and 2
    assert len(dups) == 1
    assert dups["ndocs"].iloc[0] == 2
    assert dups["win"].iloc[0] == BLOCK[:40]


def test_doc_dup_window_stats_ppm():
    stats = (doc_dup_window_stats(_mk_docs(), window=40, stride=40)
             .to_pandas().set_index("doc_id").sort_index())
    # doc 4 emits no windows -> absent
    assert list(stats.index) == [1, 2, 3]
    assert stats.loc[3, "n_dup"] == 0 and stats.loc[3, "dup_ppm"] == 0
    for d in (1, 2):
        assert stats.loc[d, "n_dup"] == 1
        assert stats.loc[d, "dup_ppm"] == 1_000_000 // stats.loc[d, "n_windows"]
    assert (stats["n_windows"] > 0).all()


def test_stride_smaller_than_window_catches_offset_phase():
    # the shared block sits at offset 0 in doc 1 but offset 20 in doc 2:
    # tiling windows (stride=40) miss it; stride=20 hits the common phase.
    rows = [
        {"doc_id": 1, "text": BLOCK + "unique tail one two three four "},
        {"doc_id": 2, "text": "Z" * 20 + BLOCK + "other ending here also "},
    ]
    docs = ray.data.from_items(rows)
    tiled = duplicated_windows(docs, window=40, stride=40).to_pandas()
    assert len(tiled) == 0
    overlapped = duplicated_windows(docs, window=40, stride=20).to_pandas()
    assert BLOCK[:40] in set(overlapped["win"])


def test_window_determinism_across_runs():
    a = duplicated_windows(_mk_docs(), 40, 40).to_pandas()
    b = duplicated_windows(_mk_docs(), 40, 40).to_pandas()
    key = ["win", "ndocs"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


# --------------------------------------------------------------------------
# window-blocked n-gram Jaccard pairs


def test_window_blocked_jaccard_pairs_scores_and_filters():
    from gliner_transbronchialbiopsy_ray.stages.substring import (
        _char_gram_set,
        window_blocked_jaccard_pairs,
    )

    docs = _mk_docs()
    out = window_blocked_jaccard_pairs(
        docs, window=40, stride=40, gram_k=3, threshold_ppm=0
    ).to_pandas()
    # only docs 1 and 2 share a window -> exactly one candidate pair
    assert len(out) == 1
    assert (out["id_a"].iloc[0], out["id_b"].iloc[0]) == (1, 2)
    # ppm matches a direct distinct-3-gram computation
    rows = {r["doc_id"]: r["text"] for r in _mk_docs().take_all()}
    ga, gb = _char_gram_set(rows[1], 3), _char_gram_set(rows[2], 3)
    inter = len(ga & gb)
    expect = (1_000_000 * inter) // (len(ga) + len(gb) - inter)
    assert out["jaccard_ppm"].iloc[0] == expect
    assert str(out["jaccard_ppm"].dtype) == "int64"
    # a threshold above the pair's ppm filters it out (empty, schema-stable;
    # to_pandas() on an all-empty dataset drops columns, so assert via the
    # dataset schema)
    hi = window_blocked_jaccard_pairs(
        docs, window=40, stride=40, gram_k=3, threshold_ppm=expect + 1
    )
    assert hi.count() == 0
    sch = hi.schema()
    assert dict(zip(sch.names, [str(t) for t in sch.types]))["jaccard_ppm"] == "int64"


def test_window_blocked_jaccard_pairs_shuffle_strategy_identical():
    from gliner_transbronchialbiopsy_ray.stages.substring import (
        window_blocked_jaccard_pairs,
    )

    docs = _mk_docs()
    key = ["id_a", "id_b"]
    bc = (window_blocked_jaccard_pairs(
        docs, window=40, stride=40, gram_k=3, threshold_ppm=0,
        strategy="broadcast").to_pandas()
        .sort_values(key).reset_index(drop=True))
    sh = (window_blocked_jaccard_pairs(
        docs, window=40, stride=40, gram_k=3, threshold_ppm=0,
        strategy="shuffle", join_partitions=2).to_pandas()
        .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(bc[sorted(bc.columns)], sh[sorted(sh.columns)])
    assert len(sh) == 1  # non-vacuous


def test_window_blocked_jaccard_pairs_star_cap():
    from gliner_transbronchialbiopsy_ray.stages.substring import (
        window_blocked_jaccard_pairs,
    )

    # 5 docs share the same leading 40-char boilerplate window
    docs = ray.data.from_items([
        {"doc_id": i, "text": BLOCK[:40] + f"distinct tail number {i} " * 6}
        for i in range(1, 6)
    ])
    full = window_blocked_jaccard_pairs(
        docs, window=40, stride=40, threshold_ppm=0).to_pandas()
    assert len(full) == 10  # C(5,2): exact all-pairs
    star = window_blocked_jaccard_pairs(
        docs, window=40, stride=40, threshold_ppm=0,
        max_docs_per_window=3).to_pandas()
    # oversized window emits star pairs only: every doc paired with the hub
    # (min doc_id) -> linear in group size, connectivity preserved
    assert len(star) == 4
    assert set(star["id_a"]) == {1}
    assert set(star["id_b"]) == {2, 3, 4, 5}
    # scores match the corresponding exact pairs
    merged = star.merge(full, on=["id_a", "id_b"], suffixes=("_s", "_f"))
    assert (merged["jaccard_ppm_s"] == merged["jaccard_ppm_f"]).all()
    # windows under the cap stay exact: cap >= group size -> identical output
    uncapped = window_blocked_jaccard_pairs(
        docs, window=40, stride=40, threshold_ppm=0,
        max_docs_per_window=5).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        full.sort_values(key).reset_index(drop=True),
        uncapped.sort_values(key).reset_index(drop=True))


def test_window_blocked_containment_metric():
    from gliner_transbronchialbiopsy_ray.stages.substring import (
        _char_gram_set,
        window_blocked_jaccard_pairs,
    )

    # doc 2 is a verbatim SUBSET of doc 1 (its whole text is doc 1's
    # prefix): containment = 1.0 while Jaccard is diluted by doc 1's tail.
    docs = ray.data.from_items([
        {"doc_id": 1, "text": BLOCK + "a long unique tail section " * 10},
        {"doc_id": 2, "text": BLOCK},
    ])
    cont = window_blocked_jaccard_pairs(
        docs, window=40, stride=40, gram_k=3, threshold_ppm=0,
        metric="containment").to_pandas()
    assert len(cont) == 1
    assert list(cont.columns) == ["id_a", "id_b", "containment_ppm"]
    assert cont["containment_ppm"].iloc[0] == 1_000_000  # full subset
    assert str(cont["containment_ppm"].dtype) == "int64"
    jac = window_blocked_jaccard_pairs(
        docs, window=40, stride=40, gram_k=3, threshold_ppm=0).to_pandas()
    # Jaccard dilutes the subset below the 600k near-dup threshold that
    # containment clears at 1.0 — the metric's whole point
    assert jac["jaccard_ppm"].iloc[0] < 600_000
    # direct-computation parity: inter/min on distinct 3-gram sets
    rows = {r["doc_id"]: r["text"] for r in docs.take_all()}
    ga, gb = _char_gram_set(rows[1], 3), _char_gram_set(rows[2], 3)
    expect = (1_000_000 * len(ga & gb)) // min(len(ga), len(gb))
    assert cont["containment_ppm"].iloc[0] == expect
    # shuffle strategy produces the identical result
    sh = (window_blocked_jaccard_pairs(
        docs, window=40, stride=40, gram_k=3, threshold_ppm=0,
        metric="containment", strategy="shuffle", join_partitions=2)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        cont.sort_values(["id_a", "id_b"]).reset_index(drop=True), sh)
    # unknown metric rejected
    import pytest
    with pytest.raises(ValueError, match="metric"):
        window_blocked_jaccard_pairs(docs, metric="dice")


def test_window_blocked_jaccard_pairs_no_candidates():
    from gliner_transbronchialbiopsy_ray.stages.substring import (
        window_blocked_jaccard_pairs,
    )

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "alpha " * 20},
        {"doc_id": 2, "text": "omega " * 20},
    ])
    out = window_blocked_jaccard_pairs(docs, window=40, stride=40)
    assert out.count() == 0
    assert out.schema().names == ["id_a", "id_b", "jaccard_ppm"]

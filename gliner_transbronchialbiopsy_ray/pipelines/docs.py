"""Document-analysis flagship over a plain (doc_id, text, ...) corpus: the
training-data-pipeline composition (language-ID, quality features, token
counts, fingerprint, duplicate flag) as a single streamed pass.

Used by `__ray_entry__.entry()` over the driver's sf0.001 documents table.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray
import ray.data


def analyze_documents(docs: ray.data.Dataset) -> ray.data.Dataset:
    """One streamed pass adding per-doc features; a second tiny pass marks
    exact duplicates via a broadcast hash->min(doc_id) map built from a
    grouped aggregate of content hashes (small: one row per distinct text)."""
    from ..stages.text_analysis import _STOP_RE

    def features(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        text = df["text"].fillna("")
        df["content_hash"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in text
        ]
        df["n_chars"] = text.str.len().astype("int64")
        df["n_tokens"] = (text.str.count(" ") + 1).astype("int64")
        df["stop_ratio"] = text.str.count(_STOP_RE) / df["n_tokens"]
        return df

    feat = docs.map_batches(features, batch_format="pyarrow")

    # distinct hash -> canonical doc_id: per-batch combiner (min per hash
    # within batch) then driver merge — output is one row per distinct
    # text, small enough to broadcast
    def partial_min(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return (
            df.groupby("content_hash", sort=False)["doc_id"]
            .min()
            .rename("canonical_doc")
            .reset_index()
        )

    canon = (
        feat.select_columns(["content_hash", "doc_id"])
        .map_batches(partial_min, batch_format="pyarrow")
        .to_pandas()
        .groupby("content_hash", sort=False)["canonical_doc"]
        .min()
        .reset_index()
    )
    canon_ref = ray.put(dict(zip(canon["content_hash"], canon["canonical_doc"])))

    class MarkDup:
        def __init__(self):
            self.canon = ray.get(canon_ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df["is_duplicate"] = [
                self.canon.get(h) != d
                for h, d in zip(df["content_hash"], df["doc_id"])
            ]
            return df

    return feat.map_batches(MarkDup, batch_format="pyarrow",
                            concurrency=2, num_cpus=0.5)

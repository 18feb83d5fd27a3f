"""Document-analysis flagship over a plain (doc_id, text, ...) corpus: the
training-data-pipeline composition (language-ID, quality features, token
counts, fingerprint, duplicate flag) as a single streamed pass.

Used by `__ray_entry__.entry()` over the driver's sf0.001 documents table.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data


def analyze_documents(docs: ray.data.Dataset) -> ray.data.Dataset:
    """One streamed pass adding per-doc features, then exact-duplicate
    marking via the bucketed shuffle (stages/dedup.py:exact_dedup_flags):
    the keep/drop verdict travels WITH each row, so no hash->canonical
    map is ever built on the driver — distinct-text count is O(corpus)
    on a low-duplication corpus, which made the earlier broadcast-map
    variant a scale-killer."""
    from ..stages.text_analysis import _STOP_RE

    def features(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        text = df["text"].fillna("")
        # content_hash comes from exact_dedup_flags(keep_hash=True)
        # below — same md5-hexdigest definition, computed once
        df["n_chars"] = text.str.len().astype("int64")
        df["n_tokens"] = (text.str.count(" ") + 1).astype("int64")
        df["stop_ratio"] = text.str.count(_STOP_RE) / df["n_tokens"]
        return df

    feat = docs.map_batches(features, batch_format="pyarrow")

    from ..stages.dedup import exact_dedup_flags

    flagged = exact_dedup_flags(feat, key_col="text", keep_hash=True)

    def finish(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["is_duplicate"] = df["doc_id"] != df["keeper_id"]
        return df.drop(columns=["keeper", "keeper_id"])

    return flagged.map_batches(finish, batch_format="pyarrow")

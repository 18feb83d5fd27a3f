"""Document-analysis flagship over a plain (doc_id, text, ...) corpus: the
training-data-pipeline composition (language-ID, quality features, token
counts, fingerprint, duplicate flag) as a single streamed pass.

Used by `__ray_entry__.entry()` over the driver's sf0.001 documents table.
"""

from __future__ import annotations

import numpy as np
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


def curate_corpus(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    *,
    min_tokens: int = 25,
    max_stop_ratio: float = 0.9,
    dup_ppm_max: int = 600_000,
    top_ppm_max: int = 200_000,
    decontam_n: int = 8,
    pack_cap: int = 256,
    shuffle_blocks: int = 8,
) -> pd.DataFrame:
    """End-to-end training-data curation: quality gate -> Gopher
    repetition gate -> exact dedup -> benchmark decontamination, with the
    funnel counted in one aggregate and the kept corpus sized in
    `pack_cap`-token context windows.

    Scale shape — the whole composite costs ONE shuffle: the quality and
    repetition flags are row-local batch kernels appended in a single
    streamed pass, dedup travels as a verdict flag through the one hash
    shuffle (`exact_dedup_flags` — no corpus-sized kept-id broadcast),
    decontamination is a broadcast-gram actor pass, and the funnel is a
    per-batch combiner folding to ONE tiny row on the driver.  No stage
    re-executes the lineage (a naive per-stage `count()` would re-run
    the pipeline once per funnel row)."""
    from ..stages.decontaminate import decontaminate
    from ..stages.dedup import exact_dedup_flags
    from ..stages.text_analysis import quality_score, repetition_stats

    def flags(batch: pa.Table) -> pa.Table:
        q = quality_score(batch)
        r = repetition_stats(batch, dup_ppm_max=dup_ppm_max,
                             top_ppm_max=top_ppm_max)
        n_tok = q.column("n_tokens")
        keep_q = pa.array(
            (np.asarray(n_tok) >= min_tokens)
            & (np.asarray(q.column("stop_ratio")) <= max_stop_ratio))
        batch = batch.append_column("n_tokens", n_tok)
        batch = batch.append_column("keep_quality", keep_q)
        return batch.append_column("keep_repetition", r.column("keep"))

    annotated = docs.map_batches(flags, batch_format="pyarrow")
    annotated = exact_dedup_flags(annotated, key_col="text",
                                  shuffle_blocks=shuffle_blocks)
    annotated = decontaminate(annotated, bench, n=decontam_n)

    def funnel_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        q = df["keep_quality"].to_numpy(bool)
        r = q & df["keep_repetition"].to_numpy(bool)
        d = r & df["keeper"].to_numpy(bool)
        k = d & ~df["contaminated"].to_numpy(bool)
        return pd.DataFrame({
            "n_total": [np.int64(len(df))],
            "n_after_quality": [np.int64(q.sum())],
            "n_after_repetition": [np.int64(r.sum())],
            "n_after_dedup": [np.int64(d.sum())],
            "n_kept": [np.int64(k.sum())],
            "kept_tokens": [np.int64(df.loc[k, "n_tokens"].sum())],
        })

    parts = annotated.map_batches(
        funnel_partial, batch_format="pyarrow").to_pandas()
    if "n_total" not in parts.columns:
        parts = pd.DataFrame({c: [0] for c in [
            "n_total", "n_after_quality", "n_after_repetition",
            "n_after_dedup", "n_kept", "kept_tokens"]})
    out = parts.sum().to_frame().T.astype("int64")
    out["n_windows"] = (out["kept_tokens"] + pack_cap - 1) // pack_cap
    return out.reset_index(drop=True)

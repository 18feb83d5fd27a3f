"""Media-curation flagship: the multimodal composition a training-data
pipeline runs over a mixed-format image corpus, end to end in streamed
actor-pool stages —

  probe (header metadata, no pixel decode)
  -> REAL pixel decode + perceptual hashes (dHash/aHash)
  -> near-duplicate clustering over the banded-hamming transport
  -> canonical-per-cluster selection (min media_ref, the exact-dedup
     keeper rule)
  -> channel/luma features for the kept representatives only

Every stage keeps failed rows (decode errors ride a status column);
only surviving canonicals pay the feature decode.  The composition
mirrors pipelines/docs.py:analyze_documents for text — flags travel
WITH rows, no driver-side hash->canonical map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def curate_media(
    media: ray.data.Dataset,
    max_hamming: int = 3,
    concurrency: int | tuple[int, int] = 2,
) -> ray.data.Dataset:
    """(media_ref, payload[, width, height]) -> one row per input with
    probe metadata, perceptual hashes, the duplicate-cluster id
    (min media_ref of its hamming-connected candidate group, computed
    from the pair list with the driver-side union-find the LSH dedup
    family documents: cluster count is bounded by the near-dup rate,
    not the corpus), a keep/drop verdict, and — for keepers only —
    channel-statistics features."""
    from ..stages.dedup import hamming_neardup_pairs
    from ..stages.multimodal import ImagePerceptualHasher, probe_image_header

    def probe(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        fmt, w, h = [], [], []
        for p in payloads:
            try:
                meta = probe_image_header(p)
                fmt.append(meta.get("format", "unknown"))
                w.append(int(meta.get("width", -1) or -1))
                h.append(int(meta.get("height", -1) or -1))
            except (ValueError, TypeError):
                fmt.append("unknown")
                w.append(-1)
                h.append(-1)
        # stay Arrow: a pandas round-trip would coerce nullable int64
        # width/height metadata to float64 (32 -> 32.0), which breaks
        # the raw-RGB decode downstream
        return (batch
                .append_column("probe_format", pa.array(fmt, pa.string()))
                .append_column("probe_w", pa.array(w, pa.int64()))
                .append_column("probe_h", pa.array(h, pa.int64())))

    probed = media.map_batches(probe, batch_format="pyarrow")

    def with_meta(batch: pa.Table) -> pa.Table:
        cols = {n: batch.column(n) for n in batch.column_names}
        if "width" not in cols:
            cols["width"] = pa.array([None] * batch.num_rows,
                                     type=pa.int64())
        if "height" not in cols:
            cols["height"] = pa.array([None] * batch.num_rows,
                                      type=pa.int64())
        return pa.table(cols)

    hashed = (probed.map_batches(with_meta, batch_format="pyarrow")
              .map_batches(ImagePerceptualHasher,
                           batch_format="pyarrow",
                           batch_size=16,
                           concurrency=concurrency,
                           num_cpus=0.5)
              .materialize())
    ok = hashed.map_batches(
        lambda b: b.filter(pc.equal(b.column("decode_status"), "ok")),
        batch_format="pyarrow")
    pairs = hamming_neardup_pairs(
        ok, max_hamming=max_hamming, id_col="media_ref",
        sig_col="dhash").to_pandas()

    # union-find over the candidate pair list (bounded by near-dup
    # volume, the documented LSH-dedup contract)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for l_id, r_id in zip(pairs.get("left_id", []),
                          pairs.get("right_id", [])):
        ra, rb = find(l_id), find(r_id)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    cluster = {x: find(x) for x in parent}
    cl_ref = ray.put(cluster)

    def verdict(batch: pa.Table) -> pd.DataFrame:
        cl = ray.get(cl_ref)
        df = batch.to_pandas()
        refs = df["media_ref"].tolist()
        df["cluster_id"] = [cl.get(r, r) for r in refs]
        df["is_canonical"] = [
            (cl.get(r, r) == r) and s == "ok"
            for r, s in zip(refs, df["decode_status"])]
        return df

    flagged = probed.map_batches(with_meta, batch_format="pyarrow") \
        .map_batches(
        lambda b: b.select(["media_ref", "payload", "probe_format",
                            "probe_w", "probe_h", "width", "height"]),
        batch_format="pyarrow").join(
        # hashes + status ride back onto the probed rows
        hashed.map_batches(
            lambda b: b.select(["media_ref", "dhash", "ahash",
                                "decode_status"]),
            batch_format="pyarrow").materialize(),
        join_type="inner", num_partitions=4, on=("media_ref",),
    ).map_batches(verdict, batch_format="pyarrow")

    def features(batch: pa.Table) -> pd.DataFrame:
        # Headerless raw RGB needs the width/height metadata the hasher
        # used (ADVICE r3: decoding with (p, None, None) raised through
        # the pipeline); decode failures keep their row with
        # mean_luma = -1 and a status flag — readers never drop rows.
        from ..stages.multimodal import _decode_image_any

        df = batch.to_pandas()
        mean_luma = np.full(len(df), -1, dtype="int64")
        status = np.full(len(df), "skipped", dtype=object)
        for i, (p, keep, w, h) in enumerate(zip(
                df["payload"], df["is_canonical"],
                df["width"], df["height"])):
            if not keep:
                continue
            try:
                img = _decode_image_any(
                    p, None if pd.isna(w) else int(w),
                    None if pd.isna(h) else int(h))
                lum = (299 * img[:, :, 0].astype(np.int64)
                       + 587 * img[:, :, 1].astype(np.int64)
                       + 114 * img[:, :, 2].astype(np.int64)) // 1000
                mean_luma[i] = int(lum.mean())
                status[i] = "ok"
            except (ValueError, TypeError) as e:
                status[i] = f"feature_error:{type(e).__name__}"
        out = df.drop(columns=["payload", "width", "height"])
        out["mean_luma"] = mean_luma
        out["feature_status"] = status.astype(str)
        return out

    return flagged.map_batches(features, batch_format="pyarrow",
                               batch_size=16, concurrency=concurrency,
                               num_cpus=0.5)

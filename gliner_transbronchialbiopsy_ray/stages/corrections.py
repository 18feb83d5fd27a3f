"""Human-feedback corrections: event-sourced fold + keyed upsert
(SURVEY §2.3 A3, §2.4 J2).

The reference keeps a per-session dict {doc: {history, latest_state}} folded
last-write-wins in timestamp order (corrections_manager.py:63-97) and applies
corrections to the wide results row by boolean-mask lookup (app.py:253-268).

Here: corrections are a Dataset; the fold is
``groupby(doc_id).map_groups(fold in ts order)`` (an ordered reduce); the
upsert broadcasts the (small) folded state via ``ray.put`` and applies it
inside ``map_batches`` over the wide node table — no shuffle of the big side.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data


def fold_latest_state(corrections_ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, entity_type) latest corrected_value by ts (LWW; ties broken
    by arrival order within the sorted group — stable sort keeps input order,
    mirroring the reference's append-then-last semantics)."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="stable")
        latest = g.groupby("entity_type", sort=False).tail(1)
        return latest[["doc_id", "entity_type", "corrected_value", "ts"]]

    return corrections_ds.groupby("doc_id").map_groups(fold, batch_format="pandas")


def corrections_by_date(corrections_ds: ray.data.Dataset) -> pd.DataFrame:
    """G8: corrections per calendar date, date-sorted (charts.py:368-381)."""

    def per_batch(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["date"] = df["ts"].dt.strftime("%Y-%m-%d")
        return (
            df.groupby("date", sort=False).size().rename("n").reset_index()
        )

    from ray.data.aggregate import Sum

    out = (
        corrections_ds.map_batches(per_batch, batch_format="pyarrow")
        .groupby("date")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return out.sort_values("date", kind="stable").reset_index(drop=True)


class ApplyCorrections:
    """map_batches actor: upsert folded corrections into the wide node table.

    The folded corrections table is small (human feedback) -> broadcast ref,
    fetched once per actor; lookup is a dict hit per (doc, label) cell."""

    def __init__(self, folded_ref):
        folded: pa.Table = ray.get(folded_ref)
        self.by_doc: dict[tuple[str, str], str] = {
            (d, t): v
            for d, t, v in zip(
                folded.column("doc_id").to_pylist(),
                folded.column("entity_type").to_pylist(),
                folded.column("corrected_value").to_pylist(),
            )
        }
        self.labels = sorted({t for _, t in self.by_doc})

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("Nom_Document").to_pylist()
        out = batch
        for label in self.labels:
            if label not in batch.column_names:
                continue
            col = out.column(label).to_pylist()
            changed = False
            for i, d in enumerate(doc_ids):
                v = self.by_doc.get((d, label))
                if v is not None:
                    col[i] = v
                    changed = True
            if changed:
                idx = out.column_names.index(label)
                out = out.set_column(idx, label, pa.array(col, type=pa.string()))
        return out


def apply_corrections(
    wide_ds: ray.data.Dataset, corrections_ds: ray.data.Dataset
) -> ray.data.Dataset:
    """Fold (shuffle on the SMALL side only) then broadcast-upsert."""
    folded = fold_latest_state(corrections_ds)
    folded_table = pa.concat_tables(
        [b for b in folded.iter_batches(batch_size=65536, batch_format="pyarrow")],
        promote_options="default",
    ) if folded.count() else pa.table(
        {"doc_id": pa.array([], type=pa.string()),
         "entity_type": pa.array([], type=pa.string()),
         "corrected_value": pa.array([], type=pa.string())}
    )
    ref = ray.put(folded_table)
    return wide_ds.map_batches(
        ApplyCorrections,
        fn_constructor_kwargs={"folded_ref": ref},
        batch_format="pyarrow",
        concurrency=2,
    )


def apply_cdc_log(
    log: ray.data.Dataset,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Generic CHANGE-DATA-CAPTURE apply: fold an (I)nsert / (U)pdate /
    (D)elete log into the final state — the LWW corrections fold
    (fold_latest_state) generalized with deletions and an explicit
    total order.  Per key, the row with the greatest `seq` wins; a
    winning D erases the key (no output row).  Deterministic: `seq`
    must be unique per key (the CDC log contract — e.g. a log offset);
    ties would make "last" meaningless and raise.

    ONE crc(key) coarse-bucket exchange co-locates each key's history;
    the in-bucket fold is one vectorized sort + tail(1) across all
    keys in the bucket.  Output: every non-deleted key's latest row
    (all log columns except op/seq/bucket)."""
    import zlib

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        k = df[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            k = k + "\x00" + df[c].astype(str)
        df["_bucket"] = k.map(
            lambda s: zlib.crc32(s.encode()) % n_buckets).astype("int32")
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(key_cols + [seq_col], kind="stable")
        dup = d.duplicated(subset=key_cols + [seq_col]).any()
        if dup:
            raise ValueError(
                f"duplicate {seq_col} within a key — the CDC log "
                "total-order contract is violated")
        last = d.groupby(key_cols, sort=False).tail(1)
        alive = last[last[op_col] != "D"]
        return alive.drop(columns=[op_col, seq_col, "_bucket"])

    return (log.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(fold, batch_format="pandas"))

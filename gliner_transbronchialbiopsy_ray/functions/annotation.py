"""Annotation ETL (SURVEY §3.3, §2.2 M7/M8): wide gold-annotation rows ->
token-level training records {tokenized_text, ner}, the reference's golden
corpus format (json_convertissor.py:85-89).

Semantics matched to the reference:
- tokenizer: r"\\b\\w+\\b|[^\\w\\s]" word+punct tokens (json_convertissor.py:7-11)
- span alignment: case-insensitive token-subsequence match of each
  ';'-separated value, ALL occurrences (json_convertissor.py:13-36, 74-83)
- column translation: French label -> snake_case (json_convertissor.py:43-58,
  mirrored by config.LABEL_TO_SNAKE)

Runs as a per-row map inside `map_batches` — no shuffle (J1 is a per-row
small-side join).
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

from ..config import LABEL_TO_SNAKE

_TOKEN_RE = re.compile(r"\b\w+\b|[^\w\s]", re.UNICODE)


def tokenize_text(text: str) -> list[str]:
    return _TOKEN_RE.findall(text or "")


def find_token_spans(text: str, entity: str) -> list[tuple[int, int]]:
    """All (start_tok, end_tok) inclusive spans where the entity's token
    sequence appears (case-insensitive)."""
    tokens = [t.lower() for t in tokenize_text(text)]
    ent = [t.lower() for t in tokenize_text(entity)]
    if not ent:
        return []
    spans = []
    n, m = len(tokens), len(ent)
    for i in range(n - m + 1):
        if tokens[i : i + m] == ent:
            spans.append((i, i + m - 1))
    return spans


def annotations_to_records(batch: pa.Table) -> pa.Table:
    """Wide annotation rows (text + one column per label, ';'-multivalued)
    -> {tokenized_text, ner} training records."""
    df = batch.to_pandas()
    label_cols = [c for c in df.columns if c in LABEL_TO_SNAKE]
    toks_out, ner_out = [], []
    for _, row in df.iterrows():
        text = row.get("text")
        if not isinstance(text, str) or not text:
            continue
        toks = tokenize_text(text)
        ner: list[list] = []
        for col in label_cols:
            value = row[col]
            if value is None or (isinstance(value, float)) or value == "":
                continue
            values = (
                [v.strip() for v in value.split(";")]
                if isinstance(value, str) and ";" in value
                else [str(value)]
            )
            for val in values:
                for start, end in find_token_spans(text, val):
                    ner.append([start, end, LABEL_TO_SNAKE[col]])
        toks_out.append(toks)
        ner_out.append(ner)
    return pa.table(
        {
            "tokenized_text": pa.array(toks_out, type=pa.list_(pa.string())),
            "ner": pa.array(
                [
                    [{"start": s, "end": e, "label": lb} for s, e, lb in spans]
                    for spans in ner_out
                ],
                type=pa.list_(
                    pa.struct(
                        [("start", pa.int32()), ("end", pa.int32()),
                         ("label", pa.string())]
                    )
                ),
            ),
        }
    )


def shuffle_split(
    ds: ray.data.Dataset, eval_frac: float = 0.1, seed: int = 42
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Seeded shuffle + proportional train/eval split (S4/O5 analog of the
    reference's random.shuffle + 90/10 slice, train.py:83-86)."""
    shuffled = ds.random_shuffle(seed=seed)
    train, eval_ = shuffled.split_proportionately([1.0 - eval_frac])
    return train, eval_


def kfold_splits(ds: ray.data.Dataset, k: int = 5, seed: int = 42):
    """K-fold (train, eval) dataset pairs (train_cross_validation.py:450-465)."""
    folds = ds.random_shuffle(seed=seed).split(k, equal=True)
    out = []
    for i in range(k):
        train_parts = [f for j, f in enumerate(folds) if j != i]
        train = train_parts[0]
        for p in train_parts[1:]:
            train = train.union(p)
        out.append((train, folds[i]))
    return out


def training_stats(records: ray.data.Dataset) -> dict:
    """G10: n examples, total/avg tokens, distinct label set."""
    import numpy as np
    from ray.data.aggregate import Sum

    def per_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ntoks = pc.list_value_length(batch.column("tokenized_text"))
        labels = set()
        for spans in batch.column("ner").to_pylist():
            for s in spans:
                labels.add(s["label"])
        return pa.table(
            {
                "n": pa.array([batch.num_rows], type=pa.int64()),
                "tokens": pa.array(
                    [int(np.sum(ntoks.to_numpy(zero_copy_only=False)))],
                    type=pa.int64(),
                ),
                "labels": pa.array([sorted(labels)], type=pa.list_(pa.string())),
            }
        )

    partials = records.map_batches(per_batch, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in partials)
    tokens = sum(p["tokens"] for p in partials)
    labels = sorted({lb for p in partials for lb in p["labels"]})
    return {
        "n_examples": int(n),
        "total_tokens": int(tokens),
        "avg_tokens": tokens / n if n else 0.0,
        "labels": labels,
    }

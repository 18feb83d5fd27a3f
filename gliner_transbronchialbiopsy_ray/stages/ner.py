"""NER scoring stage — the stateful actor-pool centerpiece (SURVEY §2.3 A1).

`NerStage` is a callable class for
``ds.map_batches(NerStage, fn_constructor_kwargs=..., concurrency=N,
batch_size=B, batch_format="pyarrow")``: the model backend is constructed
ONCE per actor in ``__init__`` (the reference loads GLiNER once per process
behind a Lock and then serializes all calls —
/root/reference/src/streamlit/app/models/model_handler.py:42-69,160; here the
pool gives real parallelism and ``__call__`` does true batched inference,
unlike the reference's sequential fake-batch loop at model_handler.py:220-227).

Backends:
- LexiconBackend: deterministic regex/lexicon extractor reproducing the
  reference output contract (closed label set passed per call, char-offset
  spans, threshold filter, scores rounded to 3) — used for tests/bench in
  this torch-less sandbox.
- GlinerBackend: the real GLiNER bi-encoder when `gliner`+torch are
  importable (mirrors model_handler.py:123-191 semantics: 512-char truncate,
  threshold, per-call label list).  Give the pool ``num_gpus`` on GPU
  clusters.

Overlap merge (SURVEY §2.7 D2): sort spans by (start, -end), merge pairs with
IoU > 0.5 keeping the higher score — entity_processor.py:137-192 semantics,
applied in-row (spans are row-local; no shuffle).
"""

from __future__ import annotations

import re
from typing import Protocol

import pyarrow as pa

from ..config import (
    DEFAULT_CONFIDENCE_THRESHOLD,
    LABELS,
    OVERLAP_MERGE_THRESHOLD,
)
from ..lexicon import deterministic_score, label_patterns
from ..schema import ENTITY_STRUCT


class ModelBackend(Protocol):
    def predict(
        self, texts: list[str], labels: list[str], threshold: float
    ) -> list[list[dict]]: ...


class LexiconBackend:
    """Deterministic span extractor over the transplant-pathology lexicon.

    `work_factor` re-runs the scan N times (discarding the extra passes):
    real, deterministic CPU work that emulates the per-document cost of a
    transformer model (the reference's GLiNER runs ~1 doc/s/worker,
    BASELINE.md) without changing outputs.  Used by the scaling benchmark so
    throughput measurements are compute-bound like production, not
    overhead-bound; normal pipelines leave it at 1."""

    def __init__(self, labels: list[str] | None = None, work_factor: int = 1):
        self.patterns = label_patterns(tuple(labels) if labels else None)
        self.work_factor = max(1, int(work_factor))

    def predict(
        self, texts: list[str], labels: list[str], threshold: float
    ) -> list[list[dict]]:
        pats = [(lb, self.patterns[lb]) for lb in labels if lb in self.patterns]
        for _ in range(self.work_factor - 1):  # emulated model compute
            for text in texts:
                if text:
                    for _label, pat in pats:
                        for _m in pat.finditer(text):
                            pass
        out: list[list[dict]] = []
        for text in texts:
            ents: list[dict] = []
            if text:
                for label, pat in pats:
                    for m in pat.finditer(text):
                        surface = m.group(0)
                        score = deterministic_score(label, surface)
                        if score >= threshold:
                            ents.append(
                                {
                                    "text": surface,
                                    "label": label,
                                    "score": score,
                                    "start": m.start(),
                                    "end": m.end(),
                                }
                            )
            ents.sort(key=lambda e: (e["start"], -e["end"]))
            out.append(ents)
        return out


class GlinerBackend:
    """Real GLiNER bi-encoder (import-gated; unavailable in this sandbox)."""

    def __init__(self, model_path: str, max_chars: int = 512):
        try:
            from gliner import GLiNER  # type: ignore
        except ImportError as e:  # pragma: no cover - no torch in sandbox
            raise NotImplementedError(
                "GlinerBackend requires the `gliner` package (torch); "
                "use model_backend='lexicon' in this environment"
            ) from e
        self.model = GLiNER.from_pretrained(model_path)
        self.max_chars = max_chars
        self._ws = re.compile(r"\s+")

    def predict(self, texts, labels, threshold):  # pragma: no cover
        out = []
        for text in texts:
            t = self._ws.sub(" ", text or "").strip()[: self.max_chars]
            ents = self.model.predict_entities(t, labels, threshold=threshold)
            out.append(
                [
                    {
                        "text": e["text"],
                        "label": e["label"],
                        "score": round(float(e["score"]), 3),
                        "start": int(e["start"]),
                        "end": int(e["end"]),
                    }
                    for e in ents
                ]
            )
        return out


def merge_overlapping(ents: list[dict], threshold: float = OVERLAP_MERGE_THRESHOLD) -> list[dict]:
    """Linear scan over (start, -end)-sorted spans; IoU > threshold keeps the
    higher-scoring span (reference keep-max-score semantics)."""
    if not ents:
        return []
    ordered = sorted(ents, key=lambda e: (e["start"], -e["end"]))
    merged: list[dict] = []
    cur = ordered[0]
    for nxt in ordered[1:]:
        inter = min(cur["end"], nxt["end"]) - max(cur["start"], nxt["start"])
        union = max(cur["end"], nxt["end"]) - min(cur["start"], nxt["start"])
        iou = inter / union if union > 0 else 0.0
        if iou > threshold:
            if cur["score"] < nxt["score"]:
                cur = nxt
        else:
            merged.append(cur)
            cur = nxt
    merged.append(cur)
    return merged


def make_backend(name: str, labels: list[str], model_path: str | None,
                 work_factor: int = 1):
    if name == "gliner":
        return GlinerBackend(model_path or "almanach/camembert-bio-gliner-v0.1")
    return LexiconBackend(labels, work_factor=work_factor)


class NerStage:
    """map_batches actor: (doc_id, conclusion, status, ...) -> + entities."""

    def __init__(
        self,
        labels: list[str] | None = None,
        threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
        truncate_chars: int | None = None,
        backend: str = "lexicon",
        model_path: str | None = None,
        merge_overlaps: bool = True,
        cache_size: int = 4096,
        work_factor: int = 1,
    ):
        self.labels = list(labels) if labels else list(LABELS)
        self.threshold = threshold
        self.truncate = truncate_chars
        self.merge = merge_overlaps
        self.backend = make_backend(backend, self.labels, model_path,
                                    work_factor=work_factor)
        # per-actor prediction cache (A2 analog, model_handler.py:111-121):
        # FIFO-evicted dict keyed by the text; exact-dedup-before-score
        # within a batch means each distinct text is scored once per actor.
        self.cache: dict[str, list[dict]] = {}
        self.cache_size = cache_size

    def _predict_unique(self, texts: list[str]) -> list[list[dict]]:
        # batch-local results map keeps correctness independent of cache
        # eviction (a batch with more unique texts than the cache cap must
        # still resolve every row)
        results: dict[str, list[dict]] = {}
        to_score: list[str] = []
        for t in texts:
            key = t or ""
            if key in results:
                continue
            hit = self.cache.get(key)
            if hit is not None:
                results[key] = hit
            else:
                results[key] = []
                to_score.append(key)
        if to_score:
            scored = self.backend.predict(to_score, self.labels, self.threshold)
            if self.merge:
                scored = [merge_overlapping(p) for p in scored]
            for key, ents in zip(to_score, scored):
                results[key] = ents
                if len(self.cache) >= self.cache_size:
                    self.cache.pop(next(iter(self.cache)))  # FIFO evict
                self.cache[key] = ents
        return [results[t or ""] for t in texts]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("conclusion").to_pylist()
        if self.truncate:
            texts = [t[: self.truncate] if t else t for t in texts]
        preds = self._predict_unique(texts)
        statuses = batch.column("status").to_pylist()
        statuses = [
            "no_entities" if (s == "ok" and not p) else s
            for s, p in zip(statuses, preds)
        ]
        out = batch.drop_columns(["status"])
        out = out.append_column("status", pa.array(statuses, type=pa.string()))
        out = out.append_column(
            "entities", pa.array(preds, type=pa.list_(ENTITY_STRUCT))
        )
        return out


def validate_entities_batch(batch: pa.Table, labels: list[str] | None = None) -> pa.Table:
    """Standalone entity-prediction validator (M6; reference
    entity_processor.py:194-233): per-row list of validation-error strings
    — invalid label (not in the vocabulary), score outside [0, 1], span
    bounds outside the conclusion, start > end.  Required-field presence
    is schema-enforced here (ENTITY_STRUCT), so the reference's
    missing-field branch cannot trigger; the remaining checks mirror its
    error-string style.  Rows are kept; `validation_errors` is [] when
    clean (engine rule: no silent drops)."""
    from ..config import LABELS

    allowed = set(labels if labels is not None else LABELS)
    ents_col = batch.column("entities").to_pylist()
    concl = (batch.column("conclusion").to_pylist()
             if "conclusion" in batch.column_names else [None] * batch.num_rows)
    all_errors = []
    for ents, text in zip(ents_col, concl):
        errors = []
        n = len(text) if isinstance(text, str) else None
        for e in ents or []:
            if e["label"] not in allowed:
                errors.append(f"Invalid label: {e['label']}")
            s = e["score"]
            if s is None or not 0 <= s <= 1:
                errors.append(f"Invalid score: {s}")
            if e["start"] is not None and e["end"] is not None:
                if e["start"] > e["end"]:
                    errors.append(
                        f"Invalid span order: {e['start']}>{e['end']}")
                elif n is not None and (e["start"] < 0 or e["end"] > n):
                    errors.append(
                        f"Span out of bounds: [{e['start']},{e['end']})/{n}")
        all_errors.append(errors)
    return batch.append_column(
        "validation_errors", pa.array(all_errors, type=pa.list_(pa.string()))
    )

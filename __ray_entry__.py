"""Driver contract for the graft builder (Ray Data target).

`entry()` runs the flagship pipelines on /root/testdata/sf0.001 (Ray is
already initialised by the driver — nothing here calls ray.init/shutdown).
`queries()`/`oracle_sql()` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup family,
similarity search, text analysis, multimodal plumbing) with DuckDB oracles
where the semantics are SQL-expressible; the BTB KG pipeline's correctness
gate is the golden-corpus P/R test suite (tests/test_pipeline_e2e.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# make the package importable regardless of the driver's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: document-analysis pipeline (langid-ready features, token
    stats, fingerprints, duplicate flags) over sf0.001 documents, PLUS a
    smoke pass of the BTB KG pipeline (triples over the deterministic
    fixture corpus) — returns the document-features Dataset."""
    import ray.data

    from gliner_transbronchialbiopsy_ray.config import PipelineConfig
    from gliner_transbronchialbiopsy_ray.fixtures import write_corpus
    from gliner_transbronchialbiopsy_ray.pipelines.btb import triples_dataset
    from gliner_transbronchialbiopsy_ray.pipelines.docs import analyze_documents

    # KG smoke: 100-doc fixture corpus -> triples (must be non-empty)
    path = write_corpus(100, seed=42, shards=2)
    tri = triples_dataset(
        ray.data.read_parquet(f"{path}/documents"),
        PipelineConfig(ner_concurrency=2, ner_num_cpus=0.5),
    )
    assert tri.count() > 0

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    return analyze_documents(docs)


def queries() -> dict[str, Callable[[str], Any]]:
    from gliner_transbronchialbiopsy_ray.pipelines.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from gliner_transbronchialbiopsy_ray.pipelines.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql}

"""The flagship KG-construction pipeline (SURVEY §3.1 restated Ray-Data-first).

    read (lance|parquet)
      -> map_batches(assemble_text)            # spans -> doc text (in-row order)
      -> map_batches(segment_batch)            # clean + section segmentation
      -> map_batches(NerStage, concurrency=N)  # actor pool, model loaded once
      -> map_batches(emit_triples)             # explode row-local entities
      -> map_batches(EntityLinker, ...)        # broadcast-dictionary linking
      -> map_batches(dedup_triples_batch)      # row-local dedup (docs are
                                               #   row-local => global)
      -> write_parquet / downstream aggregates

Every stage is lazy; the streaming executor pipelines blocks with
backpressure; nothing materializes the full dataset.  The reference's
equivalent is the sequential per-file loop at
/root/reference/src/streamlit/app/app.py:342-346.
"""

from __future__ import annotations

import ray.data

from ..config import PipelineConfig
from ..stages.assemble import assemble_text
from ..stages.link import EntityLinker, broadcast_dictionary
from ..stages.ner import NerStage
from ..stages.normalize import segment_batch
from ..stages.triples import dedup_triples_batch, emit_triples, finalize_triples


def read_documents(path: str, **kwargs) -> ray.data.Dataset:
    """Lance when available (the north-star store), parquet fallback —
    identical schema either way (SURVEY §7.2)."""
    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path, **kwargs)
    except ImportError:
        return ray.data.read_parquet(path, **kwargs)


def entities_dataset(
    docs: ray.data.Dataset, cfg: PipelineConfig | None = None
) -> ray.data.Dataset:
    """documents -> (doc_id, spans, conclusion, status, entities)."""
    cfg = cfg or PipelineConfig()
    cfg.validate()
    ds = docs.map_batches(
        assemble_text, batch_format="pyarrow", batch_size=cfg.text_batch_size
    )
    ds = ds.map_batches(
        segment_batch, batch_format="pyarrow", batch_size=cfg.text_batch_size
    )
    if cfg.ner_blocks:
        # one block = one actor task: without enough blocks the pool idles
        # (explicit repartitioning is also the skew lever — north rule)
        ds = ds.repartition(cfg.ner_blocks)
    ds = ds.map_batches(
        NerStage,
        fn_constructor_kwargs={
            "labels": cfg.labels,
            "threshold": cfg.threshold,
            "truncate_chars": cfg.truncate_chars,
            "backend": cfg.model_backend,
            "model_path": cfg.model_path,
            "work_factor": cfg.work_factor,
        },
        batch_format="pyarrow",
        batch_size=cfg.ner_batch_size,
        concurrency=cfg.ner_concurrency,
        num_cpus=cfg.ner_num_cpus,
        **({"num_gpus": cfg.ner_num_gpus} if cfg.ner_num_gpus else {}),
    )
    return ds


def triples_dataset(
    docs: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    dictionary_ref=None,
    link_concurrency: int | tuple[int, int] = 2,
) -> ray.data.Dataset:
    """documents -> canonical deduped triple table (TRIPLES_SCHEMA)."""
    cfg = cfg or PipelineConfig()
    ents = entities_dataset(docs, cfg)
    ents = ents.drop_columns(["spans", "conclusion"])
    tri = ents.map_batches(
        emit_triples, batch_format="pyarrow", batch_size=cfg.text_batch_size
    )
    if dictionary_ref is None:
        dictionary_ref = broadcast_dictionary()
    # Fractional CPU per linker actor: linking is a lookup against broadcast
    # state (cheap per batch).  Never let the pools reserve every CPU — a
    # full reservation starves the stateless read/map stages and the
    # streaming executor deadlocks on small clusters.
    tri = tri.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"dictionary_ref": dictionary_ref},
        batch_format="pyarrow",
        batch_size=cfg.text_batch_size,
        concurrency=link_concurrency,
        num_cpus=0.5,
    )
    tri = tri.map_batches(dedup_triples_batch, batch_format="pyarrow")
    return tri.map_batches(finalize_triples, batch_format="pyarrow")


def run_pipeline(
    input_path: str,
    output_path: str | None = None,
    cfg: PipelineConfig | None = None,
):
    """End-to-end: read -> triples -> (optionally) write partitioned parquet."""
    docs = read_documents(input_path)
    tri = triples_dataset(docs, cfg)
    if output_path:
        tri.write_parquet(output_path)
        return None
    return tri

"""Edge cases: empty datasets, empty span lists, unicode oddities, and the
import-gated GLiNER backend failing cleanly."""

import pyarrow as pa
import pytest
import ray.data

from gliner_transbronchialbiopsy_ray.config import PipelineConfig
from gliner_transbronchialbiopsy_ray.pipelines.btb import (
    entities_dataset,
    triples_dataset,
)
from gliner_transbronchialbiopsy_ray.schema import DOCUMENTS_SCHEMA
from gliner_transbronchialbiopsy_ray.stages.assemble import assemble_text
from gliner_transbronchialbiopsy_ray.stages.normalize import clean_text, segment_batch

CFG = PipelineConfig(ner_concurrency=1, ner_num_cpus=0.5)


def test_empty_documents_table():
    docs = ray.data.from_arrow(
        pa.Table.from_pylist([], schema=DOCUMENTS_SCHEMA)
    )
    tri = triples_dataset(docs, CFG)
    assert tri.count() == 0


def test_empty_span_list_row():
    rows = [
        {"doc_id": "empty", "spans": []},
        {"doc_id": "ok", "spans": [
            {"kind": "text", "offset": 0, "media_ref": "",
             "text": "CONCLUSION :\nI- Biopsies transbronchiques (LM) : 4 "
                     "fragments biopsiques dont 2 alvéolés.\n"
                     "II- Lavage broncho-alvéolaire : normal.\n"},
        ]},
    ]
    docs = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    ents = entities_dataset(docs, CFG)
    by_id = {r["doc_id"]: r["status"] for r in
             ents.select_columns(["doc_id", "status"]).iter_rows()}
    assert by_id["empty"] == "no_text"
    assert by_id["ok"] == "ok"


def test_assemble_batch_with_only_media():
    b = pa.Table.from_pylist(
        [{"doc_id": "m", "spans": [
            {"kind": "image", "text": "", "media_ref": "media://m/1", "offset": 0}
        ]}],
        schema=DOCUMENTS_SCHEMA,
    )
    out = assemble_text(b)
    assert out.column("text").to_pylist() == [None]


def test_unicode_oddities_survive_normalization():
    weird = "CONCLUSION :\nI- Biopsies transbronchiques (LM) : " \
            "4 fragments biopsiques dont 2 alvéolés.—fin\n" \
            "II- Lavage broncho-alvéolaire : ok.\n"
    b = pa.table({"doc_id": ["u"], "text": [weird]})
    out = segment_batch(b)
    assert out.column("status").to_pylist() == ["ok"]
    assert clean_text("  a   b") == "a b"  # NBSP variants collapse


def test_gliner_backend_gated():
    from gliner_transbronchialbiopsy_ray.stages.ner import GlinerBackend

    with pytest.raises(NotImplementedError):
        GlinerBackend("any/path")


def test_config_validation():
    import pytest as _pytest

    from gliner_transbronchialbiopsy_ray.config import PipelineConfig

    PipelineConfig().validate()  # defaults valid
    with _pytest.raises(ValueError):
        PipelineConfig(threshold=1.5).validate()
    with _pytest.raises(ValueError):
        PipelineConfig(labels=[]).validate()
    with _pytest.raises(ValueError):
        PipelineConfig(model_backend="nope").validate()
    # validation runs at pipeline build time
    docs = ray.data.from_arrow(
        pa.Table.from_pylist([], schema=DOCUMENTS_SCHEMA)
    )
    with _pytest.raises(ValueError):
        entities_dataset(docs, PipelineConfig(threshold=-1))

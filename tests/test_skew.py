"""Skew handling: a pathological giant document must flow through the
pipeline without truncation (truncation is opt-in parity mode) and without
breaking the span invariant; the corpus's power-law lengths must not change
results across block layouts."""

import pyarrow as pa
import ray.data

from gliner_transbronchialbiopsy_ray.config import PipelineConfig
from gliner_transbronchialbiopsy_ray.pipelines.btb import triples_dataset
from gliner_transbronchialbiopsy_ray.schema import DOCUMENTS_SCHEMA


def _giant_doc(doc_id: str, pad_mb: float) -> dict:
    pad = ("parenchyme habituel sans particularité " * 64)
    pad = pad * max(1, int(pad_mb * 1024 * 1024 / len(pad.encode("utf-8"))))
    body = (
        pad
        + "\nCONCLUSION :\nI- Biopsies transbronchiques (LID) : 7 fragments "
        "biopsiques dont 5 alvéolés. Absence de rejet aigu : A2 B1.\n"
        "II- Lavage broncho-alvéolaire : normal.\n"
    )
    # split into 3 text spans + 1 media span
    third = len(body) // 3
    spans = [
        {"kind": "text", "text": body[:third], "media_ref": "", "offset": 0},
        {"kind": "image", "text": "", "media_ref": f"media://{doc_id}/x", "offset": 1},
        {"kind": "text", "text": body[third : 2 * third], "media_ref": "", "offset": 2},
        {"kind": "text", "text": body[2 * third :], "media_ref": "", "offset": 3},
    ]
    return {"doc_id": doc_id, "spans": spans}


def test_giant_document_flows_through():
    rows = [_giant_doc("giant-0", 2.0)] + [
        {
            "doc_id": f"small-{i}",
            "spans": [
                {"kind": "text", "offset": 0, "media_ref": "",
                 "text": "CONCLUSION :\nI- Biopsies transbronchiques (LM) : "
                         "3 fragments biopsiques dont 2 alvéolés.\n"
                         "II- Lavage broncho-alvéolaire : normal.\n"},
            ],
        }
        for i in range(20)
    ]
    docs = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    tri = triples_dataset(
        docs.repartition(4),
        PipelineConfig(ner_concurrency=1, ner_num_cpus=0.5),
    ).to_pandas()
    giant = tri[tri["subj"] == "giant-0"]
    got = set(zip(giant["pred"], giant["obj"]))
    assert ("has_site", "LID") in got
    assert ("has_grade_a", "A2") in got
    assert ("has_grade_b", "B1") in got
    assert ("has_nombre_total_de_fragments", "7") in got
    # small docs unaffected by sharing blocks with the giant
    assert (tri["subj"] == "small-0").any()

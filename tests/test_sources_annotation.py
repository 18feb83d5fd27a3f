"""TXT encoding-fallback reader, file validation (S2/S5), annotation ETL
(M7/M8), shuffle/split (S4/O5), training stats (G10)."""

import os

import pyarrow as pa
import ray.data

from gliner_transbronchialbiopsy_ray.functions.annotation import (
    annotations_to_records,
    find_token_spans,
    kfold_splits,
    shuffle_split,
    tokenize_text,
    training_stats,
)
from gliner_transbronchialbiopsy_ray.sources.readers import (
    decode_with_fallback,
    read_text_documents,
    sniff_type,
    validate_and_decode,
)


def test_decode_fallback_chain():
    assert decode_with_fallback("héllo".encode("utf-8"))[0] == "héllo"
    txt, enc = decode_with_fallback("café".encode("latin1"))
    assert txt == "café" or enc != "utf-8"  # falls through utf-8 to latin1
    assert decode_with_fallback(b"plain ascii")[0] == "plain ascii"


def test_sniff_and_validate():
    b = pa.table(
        {
            "path": ["a.txt", "b.pdf", "c.xyz", "d.txt"],
            "bytes": [b"bonjour", b"%PDF-1.4 etc", b"data", b"x" * (11 * 1024 * 1024)],
        }
    )
    out = validate_and_decode(b)
    errs = out.column("error").to_pylist()
    texts = out.column("text").to_pylist()
    assert errs[0] is None and texts[0] == "bonjour"
    # PDF magic routes through the extractor; a bare header has no text
    # objects -> flagged, text=None (reference parity: pdfplumber's
    # `text.strip() if text else None`, text_processor.py:45)
    assert errs[1] == "pdf_no_text" and texts[1] is None
    assert errs[2].startswith("unsupported_type")
    assert errs[3].startswith("file_too_large")
    # rows are kept, never dropped
    assert out.num_rows == 4


def test_read_text_documents(tmp_path):
    (tmp_path / "a.txt").write_text("premier document", encoding="utf-8")
    (tmp_path / "b.txt").write_bytes("deuxième café".encode("latin1"))
    ds = read_text_documents(str(tmp_path))
    df = ds.to_pandas().sort_values("doc_id")
    assert len(df) == 2
    assert df["text"].iloc[0] == "premier document"
    assert "deuxi" in df["text"].iloc[1]


def test_tokenize_and_spans():
    assert tokenize_text("7 fragments, A0 B0.") == [
        "7", "fragments", ",", "A0", "B0", ".",
    ]
    text = "Grade A0 observé. a0 encore A0."
    spans = find_token_spans(text, "A0")
    # case-insensitive, all occurrences
    assert len(spans) == 3
    toks = tokenize_text(text)
    for s, e in spans:
        assert toks[s].lower() == "a0" and s == e


def test_annotations_to_records():
    batch = pa.table(
        {
            "text": ["Site LID avec 7 fragments. Grade A0 B0."],
            "Site": ["LID"],
            "Nombre Total De Fragments": ["7 fragments"],
            "Grade A": ["A0"],
            "Grade B": ["B0"],
            "Infection": [None],
        }
    )
    recs = annotations_to_records(batch)
    assert recs.num_rows == 1
    ner = recs.column("ner").to_pylist()[0]
    labels = {s["label"] for s in ner}
    assert labels == {"site", "nombre_total_de_fragments", "grade_a", "grade_b"}
    toks = recs.column("tokenized_text").to_pylist()[0]
    for s in ner:
        assert 0 <= s["start"] <= s["end"] < len(toks)


def test_shuffle_split_and_kfold_deterministic():
    ds = ray.data.range(100)
    t1, e1 = shuffle_split(ds, eval_frac=0.2, seed=7)
    t2, e2 = shuffle_split(ray.data.range(100), eval_frac=0.2, seed=7)
    assert t1.count() == 80 and e1.count() == 20
    assert sorted(r["id"] for r in e1.iter_rows()) == sorted(
        r["id"] for r in e2.iter_rows()
    )
    folds = kfold_splits(ray.data.range(50), k=5, seed=3)
    assert len(folds) == 5
    all_eval = []
    for train, ev in folds:
        assert train.count() == 40 and ev.count() == 10
        all_eval.extend(r["id"] for r in ev.iter_rows())
    assert sorted(all_eval) == list(range(50))  # partition of the data


def test_training_stats():
    batch = pa.table(
        {
            "text": ["Site LID. A0 B0.", "7 fragments ici."],
            "Site": ["LID", None],
            "Nombre Total De Fragments": [None, "7 fragments"],
        }
    )
    recs = ray.data.from_arrow(annotations_to_records(batch))
    stats = training_stats(recs)
    assert stats["n_examples"] == 2
    assert stats["total_tokens"] > 0
    assert set(stats["labels"]) == {"site", "nombre_total_de_fragments"}


def test_encoding_chain_latin1_catches_everything():
    """Reference-faithful quirk: latin1 is attempt #2 and can decode ANY
    byte string, so later encodings in the chain (cp1252 etc.) are
    unreachable — e.g. a cp1252 euro sign (0x80) decodes as latin1 U+0080,
    exactly as the reference's chain would."""
    data = "prix: 100€".encode("cp1252")
    txt, enc = decode_with_fallback(data)
    assert enc == "latin1"
    assert txt.startswith("prix: 100")
    assert txt[-1] == "\x80"  # latin1's (mis)reading — reference behavior

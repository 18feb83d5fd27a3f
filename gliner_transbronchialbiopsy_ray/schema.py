"""Fixed pyarrow schemas for every stage boundary.

The reference is schema-by-convention (wide pandas rows assembled by string
keys, /root/reference/src/streamlit/app/data/entity_processor.py:55-85); this
engine pins an Arrow schema at each boundary so blocks are zero-copy and
stages are independently testable.
"""

from __future__ import annotations

import pyarrow as pa

# Input (driver input_hint): Lance/parquet table of interleaved text+media docs.
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "image" | "table" | ...
        ("text", pa.string()),       # non-empty iff kind == "text"
        ("media_ref", pa.string()),  # opaque URI, non-empty iff kind != "text"
        ("offset", pa.int32()),      # in-doc position; defines the order invariant
    ]
)
DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# NER output: one list-of-struct column per document row (never exploded to a
# Python object graph mid-pipeline).
ENTITY_STRUCT = pa.struct(
    [
        ("text", pa.string()),
        ("label", pa.string()),
        ("score", pa.float32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)
ENTITIES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("conclusion", pa.string()),
        ("status", pa.string()),  # "ok" | "no_text" | "no_conclusion" | "no_entities"
        ("entities", pa.list_(ENTITY_STRUCT)),
    ]
)

# Graph output: canonical triples with provenance.
TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("score", pa.float32()),
        ("span_idx", pa.int32()),
        ("part_id", pa.int32()),
    ]
)

# Entity-linking dictionary (broadcast small side).
DICTIONARY_SCHEMA = pa.schema(
    [
        ("canonical_id", pa.string()),
        ("canonical_form", pa.string()),
        ("label", pa.string()),
        ("aliases", pa.list_(pa.string())),
    ]
)

GOLD_ENTITIES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("label", pa.string()),
        ("text", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)
GOLD_TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
    ]
)

CORRECTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("entity_type", pa.string()),
        ("original_value", pa.string()),
        ("corrected_value", pa.string()),
        ("ts", pa.timestamp("us")),
        ("user", pa.string()),
    ]
)

# Per-partition checkpoint manifest (lineage + throughput metrics).
MANIFEST_FIELDS = (
    "partition", "input_ref", "rows_in", "rows_out", "seconds",
    "rows_per_sec", "output_path", "content_hash", "engine_version",
)

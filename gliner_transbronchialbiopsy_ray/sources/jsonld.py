"""Flat JSON-LD (NDJSON node objects) source/sink — the JSON face of
the RDF interchange surface (ntriples/turtle/nquads are the text
faces).  HONEST SUBSET, stated up front: one node object per line,
`@id` + `@type` + flat properties whose values are scalars (literals),
`{"@id": ...}` maps (IRI references) or arrays of either.  No
`@context` remapping, no nested node objects, no `@graph` — the shapes
that dominate bulk NDJSON-LD dumps (schema.org crawls, Wikidata
entity-per-line exports) are exactly this flat form; anything richer
should be expanded upstream.

Reader: streaming line-splittable `ray.data.read_text`, per-batch
`json.loads` per line (structural parse — not regex-able), malformed
lines carry `error` and are NEVER dropped (the repo-wide source rule).
Scalars stringify canonically: bool -> true/false (JSON lexical),
numbers via str().  `@type` lowers to the engine's `a` predicate.

Writer: one crc32(subject) coarse-bucket exchange groups each
subject's triples (whole subjects per part file — a reader can shard
by file), multi-valued properties become sorted arrays (deterministic
bytes), objects matching the engine's `prefix:rest` node convention
serialize as `{"@id": ...}` references, and files are content-hash
named `part-<md5>.jsonld` (idempotent re-writes).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import zlib

import pandas as pd
import pyarrow as pa
import ray.data

_COLS = ("s", "p", "o", "o_kind", "error")

# engine node convention (stages/shacl.py's heuristic): "prefix:rest"
_IRI_RX = re.compile(r"[A-Za-z_][A-Za-z0-9_.-]*:\S+$")


def _scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def read_jsonld(paths, type_pred: str = "a") -> ray.data.Dataset:
    """Parse NDJSON-LD node objects into (s, p, o, o_kind, error)
    triples; o_kind is 'iri' for {"@id": ...} references and @type
    values, 'literal' otherwise."""
    lines = ray.data.read_text(paths)

    def parse(batch: pa.Table) -> pd.DataFrame:
        out = {c: [] for c in _COLS}

        def emit(s, p, o, kind, err=None):
            out["s"].append(s)
            out["p"].append(p)
            out["o"].append(o)
            out["o_kind"].append(kind)
            out["error"].append(err)

        for line in batch.column("text").to_pylist():
            if not line or line.isspace():
                continue
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("top-level value is not an object")
                sid = obj.get("@id")
                if not isinstance(sid, str):
                    raise ValueError("missing @id")
            except Exception as e:  # keep the row, carry the error
                emit(None, None, None, None,
                     f"jsonld_parse: {type(e).__name__}: {e}")
                continue
            for key, val in obj.items():
                if key == "@id":
                    continue
                pred = type_pred if key == "@type" else key
                vals = val if isinstance(val, list) else [val]
                for v in vals:
                    if key == "@type":
                        emit(sid, pred, _scalar(v), "iri")
                    elif isinstance(v, dict):
                        ref = v.get("@id")
                        if isinstance(ref, str):
                            emit(sid, pred, ref, "iri")
                        else:
                            emit(sid, pred, json.dumps(v, sort_keys=True),
                                 "literal",
                                 "jsonld_nested_object_not_expanded")
                    else:
                        emit(sid, pred, _scalar(v), "literal")
        return pd.DataFrame({c: pd.Series(out[c], dtype=object)
                             for c in _COLS})

    return lines.map_batches(parse, batch_format="pyarrow")


def write_jsonld(
    ds: ray.data.Dataset,
    out_dir: str,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    type_pred: str = "a",
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Serialize a triple store to `part-<contenthash>.jsonld` files,
    one node object per line, WHOLE subjects per file (one subject-
    bucket exchange).  Objects matching the `prefix:rest` node
    convention become {"@id": ...} references; `type_pred` triples
    become @type.  Deterministic bytes: subjects sorted within a file,
    property names sorted, multi-values sorted arrays.  Returns the
    (path, rows) manifest."""
    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "s": batch.column(s_col).cast(pa.string()).to_pandas(),
            "p": batch.column(p_col).cast(pa.string()).to_pandas(),
            "o": batch.column(o_col).cast(pa.string()).to_pandas()})
        df["_bucket"] = df["s"].map(
            lambda k: zlib.crc32(k.encode()) % n_buckets).astype("int32")
        return df

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["s", "p", "o"])
        lines = []
        for sid, grp in g.sort_values("s").groupby("s", sort=True):
            node: dict = {"@id": sid}
            for pred, vals in sorted(
                    grp.groupby("p")["o"].apply(list).items()):
                rendered = []
                for v in sorted(vals):
                    if pred == type_pred:
                        rendered.append(v)
                    elif _IRI_RX.match(v):
                        rendered.append({"@id": v})
                    else:
                        rendered.append(v)
                key = "@type" if pred == type_pred else pred
                node[key] = rendered[0] if len(rendered) == 1 else rendered
            lines.append(json.dumps(node, sort_keys=True))
        if not lines:
            return pd.DataFrame({"path": pd.Series(dtype=object),
                                 "rows": pd.Series(dtype="int64")})
        payload = "\n".join(lines) + "\n"
        name = ("part-"
                + hashlib.md5(payload.encode()).hexdigest()[:16]
                + ".jsonld")
        path = os.path.join(out_dir, name)
        with open(path, "w", encoding="utf-8") as f:
            f.write(payload)
        return pd.DataFrame({"path": [path], "rows": [len(lines)]})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(emit, batch_format="pandas")
            .to_pandas())

"""Turtle (.ttl) reader — the prefixed, non-line-oriented RDF syntax
most curated KG dumps ship in.  Subset of the W3C Turtle spec:

- `@prefix p: <iri> .` and SPARQL-style `PREFIX p: <iri>` declarations
- statements with `;` (same subject) and `,` (same subject+predicate)
  continuations, spanning any number of lines
- terms: `<iri>`, `prefix:local`, `a` (rdf:type), `_:bnode`,
  `"literal"` with `@lang` / `^^<type>` / `^^prefix:type`, bare
  integers/decimals/booleans (typed literals per spec)
- `#` comments outside quotes

Not supported (documented): `@base`/relative IRIs, triple-quoted long
strings, collections `( )`, anonymous bnodes `[ ]` — files using them
yield an error row per unparseable statement (rows are never dropped).

Scale note: Turtle is NOT splittable by line (statements span lines,
prefixes are file-scoped), so parallelism is PER FILE
(`read_binary_files` -> one parse per file inside `map_batches`) —
fine for dump directories with many files.  The line-oriented
N-Triples reader (`sources/ntriples.py`) is the splittable path for
single giant files.

Output schema matches read_ntriples: s, p, o, o_kind, o_datatype,
o_lang, error (+ source path).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data

from .ntriples import _unescape

_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN = re.compile(r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<kw>(?:@prefix|@base|PREFIX|BASE|a|true|false)(?![\w:-]))
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<bnode>_:[\w-]+)
  | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<plocal>[\w.%-]*)
  | (?P<num>[+-]?\d+(?:\.\d+)?)
  | (?P<punct>[.;,])
""", re.VERBOSE)


def _tokenize(text: str):
    i, n = 0, len(text)
    while i < n:
        m = _TOKEN.match(text, i)
        if m is None:
            # unsupported syntax ([ ], ( ), long strings, ...): emit an
            # unknown token — the PARSER errors per statement and
            # resynchronizes at the next '.', keeping later statements
            yield ("unknown", text[i])
            i += 1
            continue
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if m.group("plocal") is not None and kind in ("pname", "plocal"):
            yield ("pname", (m.group("pname") or "", m.group("plocal")))
            continue
        yield (kind, m.group(0))


def parse_turtle(text: str) -> list[dict]:
    """Parse one Turtle document into statement dicts (the ntriples
    reader's schema).  A statement that fails to parse emits one error
    row and the parser resynchronizes at the next top-level '.'."""
    rows: list[dict] = []
    prefixes: dict[str, str] = {}

    def term(tok):
        kind, val = tok
        if kind == "iri":
            return val[1:-1], "iri", None, None
        if kind == "pname":
            pre, local = val
            if pre not in prefixes:
                raise ValueError(f"undeclared prefix {pre!r}:")
            return prefixes[pre] + local, "iri", None, None
        if kind == "bnode":
            return val, "bnode", None, None
        if kind == "kw" and val == "a":
            return _RDF_TYPE, "iri", None, None
        if kind == "kw" and val in ("true", "false"):
            return val, "literal", _XSD + "boolean", None
        if kind == "num":
            dt = _XSD + ("decimal" if "." in val else "integer")
            return val, "literal", dt, None
        if kind == "string":
            return _unescape(val[1:-1]), "literal", None, None
        raise ValueError(f"unexpected term {tok!r}")

    toks = list(_tokenize(text))
    i, n = 0, len(toks)

    def sync(j):  # skip to after the next top-level '.'
        while j < n and toks[j] != ("punct", "."):
            j += 1
        return j + 1

    while i < n:
        kind, val = toks[i]
        try:
            if kind == "kw" and val in ("@prefix", "PREFIX"):
                pk, pv = toks[i + 1], toks[i + 2]
                if pk[0] != "pname" or pv[0] != "iri":
                    raise ValueError("bad prefix declaration")
                prefixes[pk[1][0]] = pv[1][1:-1]
                i += 3
                if i < n and toks[i] == ("punct", "."):
                    i += 1  # @prefix ends with '.'; PREFIX does not
                continue
            if kind == "kw" and val in ("@base", "BASE"):
                raise ValueError("@base unsupported")

            s, s_kind, _, _ = term(toks[i])
            if s_kind == "literal":
                raise ValueError("literal subject")
            i += 1
            while True:  # predicate-object lists
                p, p_kind, _, _ = term(toks[i])
                if p_kind != "iri":
                    raise ValueError("non-IRI predicate")
                i += 1
                while True:  # object lists
                    o, o_kind, o_dt, _ = term(toks[i])
                    o_lang = None
                    i += 1
                    if o_kind == "literal" and i < n:
                        if toks[i][0] == "langtag":
                            o_lang = toks[i][1][1:]
                            i += 1
                        elif toks[i][0] == "dtype":
                            dt, dtk, _, _ = term(toks[i + 1])
                            if dtk != "iri":
                                raise ValueError("non-IRI datatype")
                            o_dt = dt
                            i += 2
                    rows.append({"s": s, "p": p, "o": o,
                                 "o_kind": o_kind, "o_datatype": o_dt,
                                 "o_lang": o_lang, "error": None})
                    if i < n and toks[i] == ("punct", ","):
                        i += 1
                        continue
                    break
                if i < n and toks[i] == ("punct", ";"):
                    i += 1
                    if i < n and toks[i] == ("punct", "."):
                        i += 1  # trailing ';' before '.'
                        break
                    continue
                if i < n and toks[i] == ("punct", "."):
                    i += 1
                    break
                raise ValueError("expected '.' ';' or ','")
                # (unreachable)
        except (ValueError, IndexError) as e:
            rows.append({"s": None, "p": None, "o": None,
                         "o_kind": None, "o_datatype": None,
                         "o_lang": None,
                         "error": f"ttl_parse_error: {e}"})
            i = sync(i)
    return rows


def read_turtle(paths) -> ray.data.Dataset:
    """Parse .ttl files; one parse task per file (see scale note)."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pd.DataFrame:
        out = []
        for path, payload in zip(batch.column("path").to_pylist(),
                                 batch.column("bytes").to_pylist()):
            try:
                text = payload.decode("utf-8")
                rows = parse_turtle(text)
            except Exception as e:  # lexer/decode failure: one row
                rows = [{"s": None, "p": None, "o": None,
                         "o_kind": None, "o_datatype": None,
                         "o_lang": None,
                         "error": f"ttl_file_error: {e}"}]
            for r in rows:
                r["path"] = path
            out.extend(rows)
        cols = ["s", "p", "o", "o_kind", "o_datatype", "o_lang",
                "error", "path"]
        if not out:
            return pd.DataFrame({c: pd.Series(dtype=object)
                                 for c in cols})
        return pd.DataFrame(out)[cols].astype(object)

    return files.map_batches(parse, batch_format="pyarrow")

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


def _compress(iri: str, prefixes: dict) -> str:
    """Longest-prefix compression to prefixed-name form; falls back to
    <iri>.  Locals containing Turtle-significant characters stay
    uncompressed (the reader would mis-tokenize them)."""
    best = None
    for pre, ns in prefixes.items():
        if iri.startswith(ns) and (best is None
                                   or len(ns) > len(prefixes[best])):
            best = pre
    if best is not None:
        local = iri[len(prefixes[best]):]
        if re.fullmatch(r"[\w.%-]*", local):
            return f"{best}:{local}"
    return f"<{iri}>"


def write_turtle(
    ds: ray.data.Dataset,
    out_dir: str,
    prefixes: dict | None = None,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    o_kind_col: str | None = "o_kind",
) -> pd.DataFrame:
    """Serialize to `part-<contenthash>.ttl` files, one per non-empty
    block: @prefix header, subject-grouped `;` continuation lists,
    IRIs compressed through `prefixes` (longest match).  Objects
    serialize by `o_kind` (iri default; literals escaped with optional
    o_datatype/o_lang columns).  Returns the (path, rows) manifest."""
    import hashlib
    import os

    from .ntriples import _escape

    os.makedirs(out_dir, exist_ok=True)
    pfx = dict(prefixes or {})

    def emit(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return pd.DataFrame({"path": pd.Series(dtype=object),
                                 "rows": pd.Series(dtype="int64")})
        df = batch.to_pandas()
        kinds = (df[o_kind_col] if o_kind_col
                 and o_kind_col in df.columns
                 else pd.Series("iri", index=df.index))
        dts = (df["o_datatype"] if "o_datatype" in df.columns
               else pd.Series(None, index=df.index, dtype=object))
        langs = (df["o_lang"] if "o_lang" in df.columns
                 else pd.Series(None, index=df.index, dtype=object))

        def oterm(o, k, dt, lang):
            if k == "literal":
                t = f'"{_escape(str(o))}"'
                if isinstance(dt, str) and dt:
                    t += f"^^{_compress(dt, pfx)}"
                elif isinstance(lang, str) and lang:
                    t += f"@{lang}"
                return t
            if k == "bnode" or str(o).startswith("_:"):
                return str(o)
            return _compress(str(o), pfx)

        lines = [f"@prefix {p}: <{ns}> ." for p, ns in pfx.items()]
        n_rows = 0
        order = df.assign(_k=kinds.to_numpy(), _dt=dts.to_numpy(),
                          _lang=langs.to_numpy())
        for subj, grp in order.groupby(s_col, sort=True):
            st = (str(subj) if str(subj).startswith("_:")
                  else _compress(str(subj), pfx))
            parts = []
            for pv, ov, kv, dtv, lv in zip(grp[p_col], grp[o_col],
                                           grp["_k"], grp["_dt"],
                                           grp["_lang"]):
                parts.append(f"{_compress(str(pv), pfx)} "
                             f"{oterm(ov, kv, dtv, lv)}")
                n_rows += 1
            lines.append(f"{st} " + " ;\n    ".join(parts) + " .")
        payload = "\n".join(lines) + "\n"
        name = ("part-"
                + hashlib.md5(payload.encode()).hexdigest()[:16]
                + ".ttl")
        path = os.path.join(out_dir, name)
        with open(path, "w", encoding="utf-8") as f:
            f.write(payload)
        return pd.DataFrame({"path": [path], "rows": [n_rows]})

    return ds.map_batches(emit, batch_format="pyarrow").to_pandas()

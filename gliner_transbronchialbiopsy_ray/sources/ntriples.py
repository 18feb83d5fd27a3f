"""N-Triples source/sink — the line-oriented W3C RDF interchange format
(one `<s> <p> <o> .` statement per line), the standard way KG dumps
(Wikidata truthy, DBpedia, Freebase) arrive at a pipeline.

Reader: `ray.data.read_text` (streaming, splittable by line) followed by
ONE vectorized parse pass per batch — the master statement regex runs as
pandas `.str.extract` (C regex over the whole column); the Python-level
unescape only touches literals that actually contain a backslash
(rare).  Malformed lines are KEPT with an `error` column (the repo-wide
no-silent-drops rule; comments/blank lines are dropped as spec'd).

Columns: s, p, o (lexical values, IRI brackets/quotes stripped),
o_kind ('iri' | 'bnode' | 'literal'), o_datatype, o_lang (nullable).
Subjects: IRIs or blank nodes (`_:label` kept verbatim).

Writer: one `part-*.nt` file per block, written inside `map_batches`
(escape + serialize vectorized; the consuming fold is the returned
manifest of (path, rows)).  Callers give a fresh directory per run —
file names carry a content hash so identical re-runs are idempotent.

Reference: W3C N-Triples spec (public); escape set \\\\ \\" \\n \\r \\t
and \\uXXXX/\\UXXXXXXXX.
"""

from __future__ import annotations

import hashlib
import os
import re

import pandas as pd
import pyarrow as pa
import ray.data

_STMT = re.compile(
    r'^\s*(?P<s><[^>]*>|_:\S+)\s+'
    r'(?P<p><[^>]*>)\s+'
    r'(?P<o><[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"'
    r'(?:\^\^<[^>]*>|@[A-Za-z][A-Za-z0-9-]*)?)\s*\.\s*$')

_LIT = re.compile(
    r'^"(?P<lex>(?:[^"\\]|\\.)*)"'
    r'(?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z][A-Za-z0-9-]*))?$')

_UNESC = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r",
          "\\t": "\t"}


def _unescape(v: str) -> str:
    out, i, n = [], 0, len(v)
    while i < n:
        c = v[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        two = v[i:i + 2]
        if two in _UNESC:
            out.append(_UNESC[two])
            i += 2
        elif two == "\\u":
            out.append(chr(int(v[i + 2:i + 6], 16)))
            i += 6
        elif two == "\\U":
            out.append(chr(int(v[i + 2:i + 10], 16)))
            i += 10
        else:  # invalid escape: keep verbatim (error column flags it)
            out.append(two)
            i += 2
    return "".join(out)


def _escape(v: str) -> str:
    return (v.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r")
            .replace("\t", "\\t"))


def read_ntriples(paths) -> ray.data.Dataset:
    """Parse .nt files into the triple schema above."""
    lines = ray.data.read_text(paths)

    def parse(batch: pa.Table) -> pd.DataFrame:
        txt = batch.column("text").to_pandas()
        keep = ~(txt.str.match(r"^\s*(#.*)?$"))
        txt = txt[keep]
        if not len(txt):
            return pd.DataFrame({c: pd.Series(dtype=object) for c in
                                 ("s", "p", "o", "o_kind", "o_datatype",
                                  "o_lang", "error")})
        m = txt.str.extract(_STMT)
        bad = m["s"].isna()

        def strip_node(col: pd.Series) -> pd.Series:
            iri = col.str.startswith("<", na=False)
            return col.where(~iri, col.str.slice(1, -1))

        s = strip_node(m["s"])
        p = m["p"].str.slice(1, -1)
        o_raw = m["o"]
        kind = pd.Series("iri", index=m.index, dtype=object)
        kind[o_raw.str.startswith("_:", na=False)] = "bnode"
        kind[o_raw.str.startswith('"', na=False)] = "literal"
        o = strip_node(o_raw.copy())
        dt = pd.Series(None, index=m.index, dtype=object)
        lang = pd.Series(None, index=m.index, dtype=object)
        lit_mask = kind == "literal"
        if lit_mask.any():
            lm = o_raw[lit_mask].str.extract(_LIT)
            lex = lm["lex"]
            esc = lex.str.contains("\\\\", regex=True, na=False)
            lex = lex.where(~esc, lex.map(
                lambda v: _unescape(v) if isinstance(v, str) else v))
            o.loc[lit_mask] = lex
            dt.loc[lit_mask] = lm["dt"]
            lang.loc[lit_mask] = lm["lang"]
        out = pd.DataFrame({
            "s": s.astype(object), "p": p.astype(object),
            "o": o.astype(object), "o_kind": kind,
            "o_datatype": dt, "o_lang": lang,
            "error": pd.Series(None, index=m.index, dtype=object)})
        if bad.any():
            out.loc[bad, ["s", "p", "o", "o_kind",
                          "o_datatype", "o_lang"]] = None
            out.loc[bad, "error"] = "nt_parse_error"
        return out

    return lines.map_batches(parse, batch_format="pyarrow")


def write_ntriples(
    ds: ray.data.Dataset,
    out_dir: str,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    o_kind_col: str | None = "o_kind",
) -> pd.DataFrame:
    """Serialize to `part-<contenthash>.nt` files under `out_dir`; one
    file per non-empty block, written inside the map pass.  Without an
    `o_kind` column every object serializes as an IRI.  Returns the
    (path, rows) manifest (small: one row per block)."""
    os.makedirs(out_dir, exist_ok=True)

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
        lines = []
        for s, p, o, k, dt, lang in zip(
                df[s_col], df[p_col], df[o_col], kinds, dts, langs):
            st = s if str(s).startswith("_:") else f"<{s}>"
            if k == "literal":
                ot = f'"{_escape(str(o))}"'
                if isinstance(dt, str) and dt:
                    ot += f"^^<{dt}>"
                elif isinstance(lang, str) and lang:
                    ot += f"@{lang}"
            elif k == "bnode" or str(o).startswith("_:"):
                ot = str(o)
            else:
                ot = f"<{o}>"
            lines.append(f"{st} <{p}> {ot} .")
        payload = "\n".join(lines) + "\n"
        name = ("part-"
                + hashlib.md5(payload.encode()).hexdigest()[:16] + ".nt")
        path = os.path.join(out_dir, name)
        with open(path, "w", encoding="utf-8") as f:
            f.write(payload)
        return pd.DataFrame({"path": [path], "rows": [len(lines)]})

    return ds.map_batches(emit, batch_format="pyarrow").to_pandas()

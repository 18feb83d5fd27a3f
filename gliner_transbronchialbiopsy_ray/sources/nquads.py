"""N-Quads source/sink — N-Triples plus an optional GRAPH label term
(`<s> <p> <o> <g> .`), the W3C interchange format for named-graph /
provenance-carrying KG dumps.  Completes the quad surface: match_bgp
already queries (s, p, o, g) stores (g_col 4-term patterns); this is
how such stores enter and leave the engine.

Same plan as sources/ntriples.py (reference for the shared helpers):
streaming line-splittable `read_text`, ONE vectorized `.str.extract`
per batch with the statement regex extended by the optional graph
group, error-keeping parse (malformed lines carry `error`, never
dropped), content-hash part files on write.  A missing graph term
parses as g = None (the default graph), and None serializes back to a
triple line — round-trip faithful.
"""

from __future__ import annotations

import hashlib
import os
import re

import pandas as pd
import pyarrow as pa
import ray.data

from .ntriples import _LIT, _escape, _unescape

_QSTMT = re.compile(
    r'^\s*(?P<s><[^>]*>|_:\S+)\s+'
    r'(?P<p><[^>]*>)\s+'
    r'(?P<o><[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"'
    r'(?:\^\^<[^>]*>|@[A-Za-z][A-Za-z0-9-]*)?)'
    r'(?:\s+(?P<g><[^>]*>|_:\S+))?\s*\.\s*$')

_COLS = ("s", "p", "o", "g", "o_kind", "o_datatype", "o_lang", "error")


def read_nquads(paths) -> ray.data.Dataset:
    """Parse .nq files into (s, p, o, g, o_kind, o_datatype, o_lang,
    error); g is None for triple-form lines (default graph)."""
    lines = ray.data.read_text(paths)

    def parse(batch: pa.Table) -> pd.DataFrame:
        txt = batch.column("text").to_pandas()
        keep = ~(txt.str.match(r"^\s*(#.*)?$"))
        txt = txt[keep]
        if not len(txt):
            return pd.DataFrame(
                {c: pd.Series(dtype=object) for c in _COLS})
        m = txt.str.extract(_QSTMT)
        bad = m["s"].isna()

        def strip_node(col: pd.Series) -> pd.Series:
            iri = col.str.startswith("<", na=False)
            return col.where(~iri, col.str.slice(1, -1))

        s = strip_node(m["s"])
        p = m["p"].str.slice(1, -1)
        g = strip_node(m["g"])
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
            "o": o.astype(object),
            "g": g.where(g.notna(), None).astype(object),
            "o_kind": kind, "o_datatype": dt, "o_lang": lang,
            "error": pd.Series(None, index=m.index, dtype=object)})
        if bad.any():
            out.loc[bad, ["s", "p", "o", "g", "o_kind",
                          "o_datatype", "o_lang"]] = None
            out.loc[bad, "error"] = "nq_parse_error"
        return out

    return lines.map_batches(parse, batch_format="pyarrow")


def write_nquads(
    ds: ray.data.Dataset,
    out_dir: str,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    g_col: str = "g",
    o_kind_col: str | None = "o_kind",
) -> pd.DataFrame:
    """Serialize to `part-<contenthash>.nq` files under `out_dir`; one
    file per non-empty block.  Null / missing graph values emit
    triple-form lines (default graph).  Returns the (path, rows)
    manifest."""
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
        gs = (df[g_col] if g_col in df.columns
              else pd.Series(None, index=df.index, dtype=object))
        lines = []
        for s, p, o, g, k, dt, lang in zip(
                df[s_col], df[p_col], df[o_col], gs, kinds, dts, langs):
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
            if g is None or (isinstance(g, float) and pd.isna(g)):
                lines.append(f"{st} <{p}> {ot} .")
            else:
                gt = g if str(g).startswith("_:") else f"<{g}>"
                lines.append(f"{st} <{p}> {ot} {gt} .")
        payload = "\n".join(lines) + "\n"
        name = ("part-"
                + hashlib.md5(payload.encode()).hexdigest()[:16] + ".nq")
        path = os.path.join(out_dir, name)
        with open(path, "w", encoding="utf-8") as f:
            f.write(payload)
        return pd.DataFrame({"path": [path], "rows": [len(lines)]})

    return ds.map_batches(emit, batch_format="pyarrow").to_pandas()

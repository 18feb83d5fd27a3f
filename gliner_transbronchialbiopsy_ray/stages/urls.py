"""URL normalization + URL-level dedup — the step every web-crawl
curation pipeline (CCNet/RefinedWeb/Dolma lineage) runs before content
dedup: canonicalize each record's URL and collapse records that point
at the same canonical resource.

Normalization rules are deliberately the SQL-replicable core (each is
a pure string rewrite an oracle replays exactly):
  - lowercase scheme and host
  - drop an explicit default port (:80 / :443)
  - drop the fragment
  - drop tracking params (utm_* and ref=), sort the survivors
  - empty path -> '/'
The registered domain is approximated as the last two host labels
(a public-suffix list is data, not logic — documented simplification).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_URL_RX = re.compile(
    r"^([a-zA-Z]+)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$")


def normalize_url(url: str | None) -> tuple[str | None, str | None]:
    """-> (canonical_url, registered_domain); (None, None) when the
    value isn't a parseable absolute URL (callers keep the row)."""
    if not url:
        return None, None
    m = _URL_RX.match(url)
    if not m:
        return None, None
    scheme, hostport, path, query = m.groups()
    host = hostport.lower()
    host = re.sub(r":(80|443)$", "", host)
    params = [p for p in (query or "").split("&")
              if p and not p.startswith("utm_")
              and not p.startswith("ref=")]
    norm = f"{scheme.lower()}://{host}{path or '/'}"
    if params:
        norm += "?" + "&".join(sorted(params))
    bare = host.rsplit(":", 1)[0]
    labels = bare.split(".")
    domain = ".".join(labels[-2:]) if len(labels) >= 2 else bare
    return norm, domain


def normalize_urls_batch(batch: pa.Table,
                         url_col: str = "url") -> pa.Table:
    """Vectorized-per-batch map: appends canonical_url + domain
    columns (None for unparseable URLs — rows kept)."""
    urls = batch.column(url_col).to_pylist()
    norm, dom = [], []
    for u in urls:
        n, d = normalize_url(u)
        norm.append(n)
        dom.append(d)
    return batch.append_column(
        "canonical_url", pa.array(norm, type=pa.string())
    ).append_column("domain", pa.array(dom, type=pa.string()))


def url_dedup_stats(
    ds: ray.data.Dataset,
    url_col: str = "url",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per registered domain: total rows vs DISTINCT canonical URLs
    (the URL-dedup yield report).  ONE coarse exchange keyed on
    crc32(canonical_url) — per-batch pre-dedup bounds it at one row
    per distinct (bucket, url) pair per batch; per-bucket distinct
    counts and row counts fold in a bounded second groupby on domain
    (domains are the small side by construction)."""

    def tag(batch: pa.Table) -> pd.DataFrame:
        t = normalize_urls_batch(batch, url_col)
        df = pd.DataFrame({
            "canonical_url": t.column("canonical_url").to_pylist(),
            "domain": t.column("domain").to_pylist()})
        df["n_rows"] = np.int64(1)
        agg = (df.groupby(["domain", "canonical_url"], dropna=False,
                          sort=False, as_index=False)["n_rows"].sum())
        agg["_bucket"] = np.fromiter(
            (zlib.crc32(str(u).encode()) % n_buckets
             for u in agg["canonical_url"]),
            dtype="int32", count=len(agg))
        return agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per_url = (g.groupby(["domain", "canonical_url"], dropna=False,
                             sort=False, as_index=False)["n_rows"].sum())
        out = (per_url.groupby("domain", dropna=False, sort=False,
                               as_index=False)
               .agg(n_rows=("n_rows", "sum"),
                    n_unique=("canonical_url", "size")))
        return out

    parts = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("_bucket").map_groups(fold, batch_format="pandas"))
    return (parts.groupby("domain")
            .sum(["n_rows", "n_unique"])
            .map_batches(lambda b: b.rename_columns(
                ["domain", "n_rows", "n_unique"]),
                batch_format="pyarrow"))

"""Entity linking (SURVEY §2.4 J3, north-star stage 2).

Broadcast-small-side design: the canonical-term dictionary is `ray.put` once
on the driver; each linker actor fetches it in ``__init__`` (zero per-batch
re-shipping) and precomputes hashed-character-trigram embedding vectors for
every alias.  Linking is exact alias match first (vectorized dict lookup),
then embedding-cosine top-1 within the same label for misses (UMLS-style
candidate scoring).  Deterministic — no model weights needed — and the same
two-phase contract a real embedding linker would use.

No shuffle: linking is a per-row lookup against broadcast state.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

try:  # imported on Ray workers
    import ray
except ImportError:  # pragma: no cover
    ray = None

from ..lexicon import NUMERIC_LABELS, dictionary_table

_DIM = 512
_NUM = re.compile(r"\d+")


def _trigram_vector(s: str, dim: int = _DIM) -> np.ndarray:
    """Deterministic hashed char-3gram embedding, L2-normalized."""
    import zlib

    v = np.zeros(dim, dtype=np.float64)
    s = f"  {s.lower()}  "
    for i in range(len(s) - 2):
        v[zlib.crc32(s[i : i + 3].encode("utf-8")) % dim] += 1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class EntityLinker:
    """map_batches actor: raw surface -> canonical obj (+ canonical_id).

    Input columns: `label`, `obj` (raw surface).  Output: `obj` replaced by
    the canonical form, `canonical_id` added ('' when unlinked).
    """

    def __init__(self, dictionary_ref=None, sim_threshold: float = 0.55):
        if dictionary_ref is not None and ray is not None:
            dict_table: pa.Table = ray.get(dictionary_ref)
        else:
            dict_table = dictionary_table()
        self.sim_threshold = sim_threshold

        self.exact: dict[tuple[str, str], tuple[str, str]] = {}
        per_label: dict[str, list[tuple[str, str, str]]] = {}
        for cid, cform, label, aliases in zip(
            dict_table.column("canonical_id").to_pylist(),
            dict_table.column("canonical_form").to_pylist(),
            dict_table.column("label").to_pylist(),
            dict_table.column("aliases").to_pylist(),
        ):
            for a in set([*aliases, cform]):
                self.exact[(label, a.lower())] = (cid, cform)
                per_label.setdefault(label, []).append((a, cid, cform))

        # Per-label alias embedding matrices for the similarity fallback.
        self.sim_index: dict[str, tuple[np.ndarray, list[tuple[str, str]]]] = {}
        for label, entries in per_label.items():
            mat = np.stack([_trigram_vector(a) for a, _, _ in entries])
            self.sim_index[label] = (mat, [(cid, cform) for _, cid, cform in entries])

    def _link_one(self, label: str, surface: str) -> tuple[str, str]:
        if label in NUMERIC_LABELS:
            m = _NUM.search(surface)
            return ("", m.group(0) if m else surface)
        hit = self.exact.get((label, surface.lower()))
        if hit:
            return hit
        idx = self.sim_index.get(label)
        if idx is not None:
            mat, canon = idx
            sims = mat @ _trigram_vector(surface)
            best = int(np.argmax(sims))
            if sims[best] >= self.sim_threshold:
                return canon[best]
        return ("", surface.lower())

    def __call__(self, batch: pa.Table) -> pa.Table:
        labels = batch.column("label").to_pylist()
        surfaces = batch.column("obj").to_pylist()
        # dedupe (label, surface) pairs within the batch: link each unique
        # pair once, then map back (hot values like "A0" are power-law
        # frequent, so this collapses most of the work).
        uniq: dict[tuple[str, str], tuple[str, str]] = {}
        for key in set(zip(labels, surfaces)):
            uniq[key] = self._link_one(*key)
        linked = [uniq[(lb, sf)] for lb, sf in zip(labels, surfaces)]
        out = batch.drop_columns(["obj"])
        out = out.append_column(
            "obj", pa.array([c for _, c in linked], type=pa.string())
        )
        out = out.append_column(
            "canonical_id", pa.array([i for i, _ in linked], type=pa.string())
        )
        return out


def broadcast_dictionary(dict_table: pa.Table | None = None):
    """`ray.put` the dictionary once; pass the ref to every EntityLinker."""
    return ray.put(dict_table if dict_table is not None else dictionary_table())


def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 check in O(len) (no DP table needed at
    this radius): equal, one substitution, or one indel."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:                      # exactly one substitution
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:                       # one deletion from the longer
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit1_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_col: str = "name",
    right_col: str = "name",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Typo-tolerant string join at edit distance <= 1 via FastSS
    deletion neighborhoods (Bocek et al. 2007): every string emits its
    <=1-deletion variants (itself + one row per dropped character), a
    shared variant co-locates candidate pairs on ONE crc32(variant)
    exchange (ed(a,b) <= 1 guarantees a shared variant; sharing one
    only guarantees ed <= 2, so the in-bucket verifier re-checks the
    exact radius with the O(len) three-case scan — no DP), and a
    second pair-keyed exchange dedups pairs found under multiple
    variants.  The candidate blow-up is len(s)+1 variants per string —
    linear, unlike the quadratic cross join the oracle runs.  Output:
    distinct (left, right) string pairs, sorted lexically in-bucket."""
    import zlib

    def variants(col: str, side: int):
        def f(batch: pa.Table, _c=col, _side=side) -> pd.DataFrame:
            vals = [v for v in
                    pd.unique(batch.column(_c).to_pandas().dropna())]
            var, orig = [], []
            for s in vals:
                s = str(s)
                var.append(s)
                orig.append(s)
                for i in range(len(s)):
                    var.append(s[:i] + s[i + 1:])
                    orig.append(s)
            out = pd.DataFrame({"v": pd.Series(var, dtype=object),
                                "orig": pd.Series(orig, dtype=object)})
            out["side"] = np.int64(_side)
            out["_bucket"] = out["v"].map(
                lambda k: zlib.crc32(k.encode()) % n_buckets
            ).astype("int32")
            return out
        return f

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["v", "orig", "side"])
        l = g[g["side"] == 0][["v", "orig"]].rename(
            columns={"orig": "left"})
        r = g[g["side"] == 1][["v", "orig"]].rename(
            columns={"orig": "right"})
        if not (len(l) and len(r)):
            return pd.DataFrame({
                "left": pd.Series(dtype=object),
                "right": pd.Series(dtype=object),
                "_bucket": pd.Series(dtype="int32")})
        m = (l.merge(r, on="v")[["left", "right"]]
             .drop_duplicates())
        # np bool mask, not a list: an empty list would select COLUMNS
        mask = np.fromiter((_ed_le1(a, b) for a, b in
                            zip(m["left"], m["right"])),
                           dtype=bool, count=len(m))
        out = m.loc[mask].copy()
        out["_bucket"] = (out["left"] + "\x00" + out["right"]).map(
            lambda k: zlib.crc32(k.encode()) % n_buckets
        ).astype("int32")
        return out

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        out = (g[["left", "right"]].drop_duplicates()
               .sort_values(["left", "right"], kind="stable"))
        for c in out.columns:
            out[c] = out[c].astype(object)
        return out

    u = (left.map_batches(variants(left_col, 0), batch_format="pyarrow")
         .union(right.map_batches(variants(right_col, 1),
                                  batch_format="pyarrow")))
    return (u.groupby("_bucket")
            .map_groups(pair_up, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(dedup, batch_format="pandas"))

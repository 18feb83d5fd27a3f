"""Value pinning for the rows-only (no-oracle) queries (VERDICT r1 item 8):
each query's sf0.001 result is reduced to a stable md5 over its normalized
CSV and compared against a committed golden hash, so regressions in e.g.
MinHash parameters, lexicon scoring or LSH bucketing are caught even
without a SQL oracle.

Regenerate after an INTENTIONAL semantic change with:
    python tests/test_golden_hashes.py --regen
"""

import hashlib
import json
import pathlib

import numpy as np
import pandas as pd
import pytest
import ray.data

from gliner_transbronchialbiopsy_ray.pipelines.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_PATH = pathlib.Path(__file__).parent / "golden_hashes_sf0.001.json"

ROWS_ONLY = sorted(name for name, (_, sql) in QUERIES.items() if not sql)


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


def golden_hash(df: pd.DataFrame) -> str:
    df = df.copy()
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray, dict))).any():
            df[c] = df[c].map(lambda v: str(list(v)) if v is not None else None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)  # float-sum order drift tolerance
    if len(df):
        df = df.sort_values(list(df.columns), kind="stable")
    csv = df.to_csv(index=False, float_format="%.6f")
    return hashlib.md5(csv.encode("utf-8")).hexdigest()


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_matches_golden_hash(name):
    golden = json.loads(GOLDEN_PATH.read_text())
    assert name in golden, (
        f"{name} has no committed golden hash — regenerate with "
        f"`python tests/test_golden_hashes.py --regen`"
    )
    fn, _ = QUERIES[name]
    h = golden_hash(_to_df(fn(SF_DIR)))
    assert h == golden[name], (
        f"{name}: result hash {h} != golden {golden[name]} — if the change "
        f"is intentional, regenerate the golden file"
    )


if __name__ == "__main__":
    import sys

    if "--regen" not in sys.argv:
        sys.exit("usage: python tests/test_golden_hashes.py --regen")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    out = {}
    for name in ROWS_ONLY:
        fn, _ = QUERIES[name]
        out[name] = golden_hash(_to_df(fn(SF_DIR)))
        print(name, out[name])
    GOLDEN_PATH.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    ray.shutdown()

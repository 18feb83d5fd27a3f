"""Strict full-registry drive: run EVERY queries() entry at sf0.01;
oracle-bearing entries compare values AND pandas dtypes against DuckDB;
rows-only entries must execute and return a stable frame."""
import sys
import time
import traceback

import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

qs, sql = E.queries(), E.oracle_sql()
args = sys.argv[1:]
if args[:1] == ["--since"]:
    # --since <logfile>: drive only registry entries that have NO
    # status line in a prior strict-drive log — the cheap per-session
    # verification mode for a 330+ registry (ROUND_NOTES r3 item 7).
    # Entries whose CODE changed still need a name filter or a full
    # drive; this mode covers the additive-growth common case.
    import re

    seen = set(re.findall(r"\] (\S+): (?:ORACLE_MATCH|ROWS_ONLY)",
                          open(args[1]).read()))
    qs = {n: f for n, f in qs.items() if n not in seen}
    print(f"--since {args[1]}: {len(seen)} entries already green, "
          f"{len(qs)} to drive")
elif args:  # optional name-substring filters
    qs = {n: f for n, f in qs.items() if any(p in n for p in args)}
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")

fails = []
t00 = time.time()
for i, (name, fn) in enumerate(qs.items()):
    t0 = time.time()
    try:
        got = fn(SF)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        if name in sql and sql[name]:
            exp = con.execute(sql[name]).fetchdf()
            g = got[sorted(got.columns)].reset_index(drop=True)
            x = exp[sorted(exp.columns)].reset_index(drop=True)
            g = g.sort_values(list(g.columns), kind="stable").reset_index(drop=True)
            x = x.sort_values(list(x.columns), kind="stable").reset_index(drop=True)
            pd.testing.assert_frame_equal(g, x, check_dtype=True)
            status = "ORACLE_MATCH"
        else:
            assert len(got.columns) > 0
            status = f"ROWS_ONLY({len(got)})"
    except Exception as e:
        status = "FAIL"
        fails.append((name, repr(e)[:300]))
        traceback.print_exc(limit=2)
    print(f"[{i+1}/{len(qs)}] {name}: {status} "
          f"({time.time()-t0:.1f}s)", flush=True)

print(f"\nTOTAL {time.time()-t00:.0f}s, {len(fails)} failures")
for n, e in fails:
    print("FAILED:", n, e)
ray.shutdown()
sys.exit(1 if fails else 0)

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
elif args[:1] == ["--changed"]:
    # --changed <git-ref>: drive only registry entries whose
    # IMPLEMENTING code differs from <ref> (ROUND_NOTES r4 item: code
    # changes are invisible to --since).  Two signals, union'd:
    #   1. queries.py hunks -> the top-level functions they fall in ->
    #      every entry whose fn (or SQL constant) spans a changed line;
    #      a hunk in shared helpers (_read, _preagg, module header)
    #      maps to NO single entry and forces a FULL drive (loud note).
    #   2. any other changed package module -> every entry whose fn
    #      source names it in a relative import (from ..stages.x
    #      import / from ..sources.x / from ..state.x / from ..stages
    #      import x).
    import ast
    import re
    import subprocess

    ref = args[1]
    repo = "/root/repo"
    pkg = "gliner_transbronchialbiopsy_ray"
    changed = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", pkg],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout.split()
    qpath = f"{pkg}/pipelines/queries.py"
    qsrc = open(f"{repo}/{qpath}").read()
    tree = ast.parse(qsrc)
    spans = {}  # top-level def/assign name -> (lo, hi) line span
    for node in tree.body:
        hi = node.end_lineno
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            spans[node.name] = (node.lineno, hi)
        elif isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Name):
            spans[node.targets[0].id] = (node.lineno, hi)
    fn_names = {fn.__name__: n for n, (fn, _s) in
                ((n, v) for n, v in
                 __import__("gliner_transbronchialbiopsy_ray.pipelines."
                            "queries", fromlist=["QUERIES"])
                 .QUERIES.items())}
    pick: set[str] = set()
    full_drive = False
    if qpath in changed:
        hunks = subprocess.run(
            ["git", "diff", "-U0", ref, "--", qpath],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout
        lines: set[int] = set()
        for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))?", hunks,
                             re.M):
            start, n = int(m.group(1)), int(m.group(2) or 1)
            lines.update(range(start, start + max(n, 1)))
        for ln in sorted(lines):
            owner = next((name for name, (lo, hi) in spans.items()
                          if lo <= ln <= hi), None)
            if owner is None:
                continue  # blank separators between defs
            if owner in fn_names:
                pick.add(fn_names[owner])
            elif owner.endswith("_SQL") or owner.startswith(
                    "_DRIVER_WINDOW") or owner == "QUERIES":
                continue  # SQL text / ordering: value-checked anyway
            else:
                print(f"--changed: hunk at {qpath}:{ln} is in shared "
                      f"helper {owner!r} -> full drive")
                full_drive = True
    mod_pat = re.compile(
        r"from \.+(?:(?:stages|sources|state|functions|pipelines)\.)?"
        r"(\w+) import ([\w, ]+)")
    _PKGS = {"stages", "sources", "state", "functions", "pipelines"}

    def _mods(m):
        # "from ..stages import a, b" puts module names in the list;
        # otherwise group(1) IS the module (handles .btb and ..config)
        if m.group(1) in _PKGS:
            return [x.strip() for x in m.group(2).split(",")]
        return [m.group(1)]
    # transitive closure over package-internal imports: a change to
    # stages/assemble.py must select entries that only import
    # pipelines/btb.py (which imports assemble) — chase module->module
    # edges to a fixpoint, then match entries on the closed set.
    import glob as _glob

    mod_imports: dict[str, set[str]] = {}
    for mpath in _glob.glob(f"{repo}/{pkg}/**/*.py", recursive=True):
        stem_m = mpath.rsplit("/", 1)[-1].removesuffix(".py")
        deps = set()
        for m in mod_pat.finditer(open(mpath).read()):
            deps.update(_mods(m))
        mod_imports.setdefault(stem_m, set()).update(deps - {None})
    affected = {p.rsplit("/", 1)[-1].removesuffix(".py")
                for p in changed if p != qpath}
    while True:
        grow = {m for m, deps in mod_imports.items()
                if deps & affected} - affected
        if not grow:
            break
        affected |= grow
    if affected:
        import inspect
        for n, fn in qs.items():
            try:
                src = inspect.getsource(fn)
            except OSError:
                pick.add(n)
                continue
            for m in mod_pat.finditer(src):
                if affected & set(_mods(m)):
                    pick.add(n)
                    break
    if not full_drive:
        qs = {n: f for n, f in qs.items() if n in pick}
        print(f"--changed {ref}: {len(changed)} changed files -> "
              f"{len(qs)} entries to drive: {sorted(qs)}")
    else:
        print(f"--changed {ref}: shared-helper change -> driving all "
              f"{len(qs)} entries")
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

"""Randomized BGP correctness sweep: match_bgp (both fold strategies)
vs an independent pandas reference evaluator over seeded random graphs
and random shared-variable pattern chains."""

import numpy as np
import pandas as pd
import ray.data as rd

from gliner_transbronchialbiopsy_ray.stages.bgp import match_bgp


def _ref_bgp(df: pd.DataFrame, patterns) -> pd.DataFrame:
    """Reference evaluation: per-pattern filtered projection, inner
    merges on shared variables, global distinct."""
    acc = None
    for (s, p, o) in patterns:
        leg = df.copy()
        proj = {}
        for term, col in ((s, "s"), (p, "p"), (o, "o")):
            if isinstance(term, str) and term.startswith("?"):
                proj[col] = term[1:]
            else:
                leg = leg[leg[col] == term]
        leg = leg[list(proj)].rename(columns=proj).drop_duplicates()
        if acc is None:
            acc = leg
        else:
            shared = [c for c in leg.columns if c in acc.columns]
            acc = acc.merge(leg, on=shared, how="inner")
        acc = acc.drop_duplicates()
    return acc.reset_index(drop=True)


def _rand_graph(rng) -> pd.DataFrame:
    n = rng.integers(8, 25)
    return pd.DataFrame({
        "s": rng.integers(1, 7, n),
        "p": rng.choice(["a", "b", "c"], n),
        "o": rng.integers(1, 7, n),
    }).drop_duplicates().reset_index(drop=True)


def _rand_patterns(rng):
    """2-3 patterns chained through shared variables; a constant-object
    pattern binds nothing new, so the chain continues from the last
    BOUND variable."""
    k = int(rng.integers(2, 4))
    pats = [("?x0", str(rng.choice(["a", "b", "c"])), "?x1")]
    last = 1
    for _ in range(1, k):
        prev = f"?x{last}"
        pred = str(rng.choice(["a", "b", "c"]))
        if rng.random() < 0.3:  # constant object sometimes
            pats.append((prev, pred, int(rng.integers(1, 7))))
        else:
            last += 1
            pats.append((prev, pred, f"?x{last}"))
    return pats


def test_random_graphs_match_reference():
    rng = np.random.default_rng(20260818)
    checked = 0
    for trial in range(8):
        df = _rand_graph(rng)
        patterns = _rand_patterns(rng)
        ref = _ref_bgp(df, patterns)
        for strategy in ("hash", "broadcast"):
            got = match_bgp(rd.from_pandas(df), patterns,
                            num_partitions=2,
                            join_strategy=strategy).to_pandas()
            cols = sorted(ref.columns)
            if len(ref) == 0:
                assert len(got) == 0, (trial, strategy, patterns)
                continue
            assert sorted(got.columns) == cols, (trial, strategy)
            gv = sorted(map(tuple, got[cols].to_numpy().tolist()))
            rv = sorted(map(tuple,
                            ref[cols].astype("int64")
                            .to_numpy().tolist()))
            assert gv == rv, (trial, strategy, patterns)
            checked += 1
    assert checked >= 8  # at least half the trials had matches


def _ref_minus(acc: pd.DataFrame, df: pd.DataFrame,
               pattern) -> pd.DataFrame:
    leg = df.copy()
    proj = {}
    for term, col in zip(pattern, ("s", "p", "o")):
        if isinstance(term, str) and term.startswith("?"):
            proj[col] = term[1:]
        else:
            leg = leg[leg[col] == term]
    leg = leg[list(proj)].rename(columns=proj).drop_duplicates()
    shared = [c for c in leg.columns if c in acc.columns]
    m = acc.merge(leg[shared].drop_duplicates(), on=shared,
                  how="left", indicator=True)
    return (m[m["_merge"] == "left_only"].drop(columns=["_merge"])
            .reset_index(drop=True))


def test_random_filter_minus_match_reference():
    rng = np.random.default_rng(20260819)
    checked = 0
    for trial in range(6):
        df = _rand_graph(rng)
        patterns = _rand_patterns(rng)
        filters = [("x1", str(rng.choice([">=", "<", "!="])),
                    int(rng.integers(1, 7)))]
        minus = [("?x0", str(rng.choice(["a", "b", "c"])),
                  int(rng.integers(1, 7)))]
        ref = _ref_bgp(df, patterns)
        if len(ref) == 0:
            continue
        op = {">=": lambda a, b: a >= b, "<": lambda a, b: a < b,
              "!=": lambda a, b: a != b}[filters[0][1]]
        ref = ref[op(ref["x1"], filters[0][2])].reset_index(drop=True)
        ref = _ref_minus(ref, df, minus[0])
        for strategy in ("hash", "broadcast"):
            got = match_bgp(rd.from_pandas(df), patterns,
                            filters=filters, minus=minus,
                            num_partitions=2,
                            join_strategy=strategy).to_pandas()
            cols = sorted(ref.columns)
            if len(ref) == 0:
                assert len(got) == 0, (trial, strategy)
                continue
            gv = sorted(map(tuple, got[cols].to_numpy().tolist()))
            rv = sorted(map(tuple, ref[cols].astype("int64")
                            .to_numpy().tolist()))
            assert gv == rv, (trial, strategy, patterns, filters)
            checked += 1
    assert checked >= 3


def _ref_stratified(df: pd.DataFrame, strata) -> set:
    """Independent naive stratified-Datalog evaluator over Python
    sets: per stratum iterate rules to fixpoint; a ("not", atom) body
    atom removes bindings compatible with any of its matches (safe
    negation — same anti semi-join semantics as match_bgp's MINUS)."""
    store = {tuple(r) for r in df[["s", "p", "o"]].to_numpy()}

    def match_atoms(atoms, frozen):
        rows = [dict()]
        for (s, p, o) in atoms:
            new = []
            for b in rows:
                for (ts, tp, to) in frozen:
                    bb = dict(b)
                    ok = True
                    for term, val in ((s, ts), (p, tp), (o, to)):
                        if isinstance(term, str) and \
                                term.startswith("?"):
                            if term in bb and bb[term] != val:
                                ok = False
                                break
                            bb[term] = val
                        elif term != val:
                            ok = False
                            break
                    if ok:
                        new.append(bb)
            rows = new
        return rows

    for rules in strata:
        while True:
            frozen = set(store)
            derived = set()
            for body, head in rules:
                pos = [a for a in body
                       if not (len(a) == 2 and a[0] == "not")]
                negs = [a[1] for a in body
                        if len(a) == 2 and a[0] == "not"]
                for b in match_atoms(pos, frozen):
                    dead = False
                    for na in negs:
                        shared_ok = match_atoms([na], frozen)
                        for nb in shared_ok:
                            if all(b.get(k) == v
                                   for k, v in nb.items()
                                   if k in b):
                                dead = True
                                break
                        if dead:
                            break
                    if dead:
                        continue
                    hs, hp, ho = head
                    out = tuple(
                        b[t] if isinstance(t, str)
                        and t.startswith("?") else t
                        for t in (hs, hp, ho))
                    derived.add(out)
            if derived <= store:
                break
            store |= derived
    return store


def test_random_stratified_negation_matches_reference():
    from gliner_transbronchialbiopsy_ray.stages.bgp import (
        saturate_stratified)
    rng = np.random.default_rng(20260819)
    STRATA = [
        [  # stratum 1: close 'a' transitively as 'r'
            ([("?x", "a", "?y")], ("?x", "r", "?y")),
            ([("?x", "r", "?y"), ("?y", "a", "?z")],
             ("?x", "r", "?z")),
        ],
        [  # stratum 2: reached-but-terminal nodes under negation
            ([("?w", "r", "?x"), ("not", ("?x", "r", "?z"))],
             ("?x", "t", "0")),
        ],
    ]
    for _ in range(4):
        df = _rand_graph(rng).astype({"s": str, "o": str})
        df["o"] = df["o"].astype(str)
        got = saturate_stratified(
            rd.from_pandas(df), STRATA, cast_nodes=False).to_pandas()
        got_set = {tuple(r) for r in got[["s", "p", "o"]].to_numpy()}
        exp = _ref_stratified(df, STRATA)
        assert got_set == exp

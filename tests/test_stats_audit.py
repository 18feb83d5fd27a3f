"""Statistical-audit operator family: exact discrete quantiles
(grouped_quantile_disc), Benford leading-digit extraction, CUSUM drift
recurrence, and the Gini-impurity fold (q270-q274 support)."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from gliner_transbronchialbiopsy_ray.stages.stats import grouped_quantile_disc


def test_grouped_quantile_disc_matches_duckdb():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.integers(0, 5, 1000).astype("int64"),
        # duplicate-heavy values exercise run-length ties
        "v": rng.integers(-50, 50, 1000).astype("int64"),
    })
    got = (grouped_quantile_disc(
        ray.data.from_pandas(df), ["g"], "v",
        [("q1", 1, 4), ("med", 1, 2), ("q3", 3, 4)])
        .to_pandas().sort_values("g").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT g, quantile_disc(v, 0.25) AS q1,
               quantile_disc(v, 0.50) AS med,
               quantile_disc(v, 0.75) AS q3,
               count(*) AS n
        FROM df GROUP BY g ORDER BY g""").fetchdf()
    for c in ("q1", "med", "q3", "n"):
        assert list(got[c].astype("int64")) == list(exp[c].astype("int64")), c


def test_grouped_quantile_disc_singleton_and_uneven_groups():
    df = pd.DataFrame({"g": [0, 1, 1, 2, 2, 2, 2, 2, 2, 2],
                       "v": [9, 3, 1, 7, 1, 5, 3, 6, 2, 4]})
    got = (grouped_quantile_disc(
        ray.data.from_pandas(df), ["g"], "v", [("q3", 3, 4)])
        .to_pandas().sort_values("g").reset_index(drop=True))
    # g=0: singleton -> itself; g=1: n=2, ceil(1.5)-1=1 -> max;
    # g=2: n=7 sorted [1,2,3,4,5,6,7], ceil(5.25)-1=5 -> 6
    assert list(got["q3"]) == [9, 3, 6]


def test_leading_digit_loop_matches_string_method():
    rng = np.random.default_rng(11)
    cents = rng.integers(1, 10**9, 5000).astype("int64")
    x = cents.copy()
    while x.max(initial=0) >= 10:
        big = x >= 10
        x[big] //= 10
    via_str = np.array([int(str(c)[0]) for c in cents])
    assert (x == via_str).all()


def test_cusum_recurrence_flags_planted_shift():
    # 40 quiet months at ~100, then 10 shifted months at 160
    n = np.array([100] * 40 + [160] * 10, dtype="int64")
    mean = int(n.sum()) // len(n)      # 112
    slack = mean // 20
    s, series = 0, []
    for v in n:
        s = max(0, s + int(v) - mean - slack)
        series.append(s)
    alarms = [v > mean for v in series]
    assert not any(alarms[:40])        # quiet region never alarms
    assert any(alarms[40:])            # the shift is caught
    # one-sided reset: quiet months drive S back toward 0
    assert series[39] == 0


@pytest.mark.parametrize("counts,expected_ppm", [
    ([50, 50], 500_000),               # two equal classes
    ([100], 0),                        # pure column
    ([25, 25, 25, 25], 750_000),       # four equal classes
])
def test_gini_ppm_formula(counts, expected_ppm):
    total = sum(counts)
    ss = sum(c * c for c in counts)
    assert 1_000_000 - (1_000_000 * ss) // (total * total) == expected_ppm

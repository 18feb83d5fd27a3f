"""HLL approximate distinct counts: mergeable, within ~3% at p=12."""

import ray.data

from gliner_transbronchialbiopsy_ray.functions.sketches import (
    HyperLogLog,
    approx_distinct,
)


def test_hll_accuracy_and_merge():
    a, b = HyperLogLog(), HyperLogLog()
    a.add_many(f"x{i}" for i in range(6000))
    b.add_many(f"x{i}" for i in range(3000, 9000))  # overlap 3000..6000
    est = a.merge(b).estimate()
    assert abs(est - 9000) / 9000 < 0.05


def test_approx_distinct_dataset():
    ds = ray.data.from_items(
        [{"k": f"v{i % 2500}"} for i in range(20000)]
    ).repartition(8)
    est = approx_distinct(ds, "k")
    assert abs(est - 2500) / 2500 < 0.05


def test_hll_query_close_to_exact():
    from gliner_transbronchialbiopsy_ray.pipelines.queries import (
        q44_distinct_counts,
        q45_approx_distinct_hll,
    )

    exact = q44_distinct_counts("/root/testdata/sf0.001")["n_users"].iloc[0]
    approx = q45_approx_distinct_hll("/root/testdata/sf0.001")["approx_n_users"].iloc[0]
    assert abs(approx - exact) / exact < 0.1


def test_quantile_sketch_accuracy_vs_exact():
    """Mergeable quantile sketch: rank error bounded by n/k — on 50k
    lognormal values with k=512, each approx quantile must land within
    1% rank of the exact one, across a 16-way partitioned dataset."""
    import numpy as np
    import ray.data

    from gliner_transbronchialbiopsy_ray.functions.sketches import (
        QuantileSketch,
        approx_quantiles,
    )

    rng = np.random.RandomState(3)
    vals = rng.lognormal(0, 1.5, size=50_000)
    ds = ray.data.from_items([{"v": float(x)} for x in vals]).repartition(16)
    qs = [0.1, 0.5, 0.9, 0.99]
    approx = approx_quantiles(ds, "v", qs, k=512)
    svals = np.sort(vals)
    for q, a in zip(qs, approx):
        # rank of the approx answer in the exact order
        rank = np.searchsorted(svals, a) / len(svals)
        assert abs(rank - q) < 0.01, (q, a, rank)


def test_quantile_sketch_merge_equals_single():
    import numpy as np

    from gliner_transbronchialbiopsy_ray.functions.sketches import (
        QuantileSketch,
    )

    rng = np.random.RandomState(4)
    a, b = rng.randn(3000), rng.randn(4000)
    merged = QuantileSketch(256).add_many(a).merge(
        QuantileSketch(256).add_many(b))
    allv = np.sort(np.concatenate([a, b]))
    for q in (0.25, 0.5, 0.75):
        rank = np.searchsorted(allv, merged.quantile(q)) / len(allv)
        assert abs(rank - q) < 0.02
    # round-trips through bytes
    rt = QuantileSketch.from_bytes(merged.to_bytes(), 256)
    assert rt.quantile(0.5) == merged.quantile(0.5)


def test_cms_overestimates_and_is_accurate(ray_session):
    """CMS estimates are never below the true count, and with
    width >> distinct keys they are exact; approx_heavy_hitters must
    recover the true top-k on a skewed distribution."""
    import numpy as np
    import pandas as pd
    import ray.data

    from gliner_transbronchialbiopsy_ray.functions.sketches import (
        CountMinSketch,
        approx_heavy_hitters,
    )

    # direct sketch semantics
    cms = CountMinSketch(width=1024, depth=4)
    cms.add_counts(["a", "b", "a"], [5, 2, 3])
    assert cms.estimate("a") >= 8
    assert cms.estimate("b") >= 2
    # merge = elementwise add
    other = CountMinSketch(width=1024, depth=4).add_counts(["a"], [10])
    assert cms.merge(other).estimate("a") >= 18

    # skewed corpus: zipf-ish, top key 4x the next
    rng = np.random.default_rng(3)
    keys = (["hot"] * 400 + ["warm"] * 100 + ["mild"] * 50
            + [f"cold{i}" for i in rng.integers(0, 200, size=300)])
    df = pd.DataFrame({"k": keys})
    ds = ray.data.from_pandas(df).repartition(4)
    out = approx_heavy_hitters(ds, "k", k=3, width=4096)
    true = df["k"].value_counts()
    assert out["value"].tolist()[:2] == ["hot", "warm"]
    for _, row in out.iterrows():
        assert row["est_count"] >= true[row["value"]]  # overestimate-only
        # width >> keys -> few collisions: estimate within 5%
        assert row["est_count"] <= true[row["value"]] * 1.05 + 3


def test_grouped_moments_matches_numpy_and_is_layout_invariant(ray_session):
    """Chan-merge moments must equal dense numpy (ddof=1) stats and be
    invariant to block layout; empty input returns a clean empty frame."""
    import numpy as np
    import pandas as pd
    import ray.data

    from gliner_transbronchialbiopsy_ray.functions.moments import grouped_moments

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 500),
        "x": rng.normal(10, 3, 1000),
    })
    df["y"] = 2.5 * df["x"] + rng.normal(0, 1, 1000)
    results = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = grouped_moments(ds, ["g"], "x", "y").set_index("g")
        results.append(out)
        for g in ("a", "b"):
            sub = df[df["g"] == g]
            assert abs(out.loc[g, "std_x"] - sub["x"].std(ddof=1)) < 1e-9
            assert abs(out.loc[g, "covar"] - sub["x"].cov(sub["y"])) < 1e-7
            assert abs(out.loc[g, "corr"] - sub["x"].corr(sub["y"])) < 1e-12
    pd.testing.assert_frame_equal(results[0].round(9), results[1].round(9))

    empty = ray.data.from_pandas(df.iloc[:0])
    assert len(grouped_moments(empty, ["g"], "x", "y")) == 0


def test_grouped_approx_distinct_accuracy(ray_session):
    """Per-group HLL estimates within the standard ~2% band of the exact
    per-group distinct counts, invariant to block layout."""
    import numpy as np
    import pandas as pd
    import ray.data

    from gliner_transbronchialbiopsy_ray.functions.sketches import (
        grouped_approx_distinct,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], 4000),
        "v": np.concatenate([
            rng.integers(0, 3000, 4000),      # ~2560 distinct
            rng.integers(0, 300, 4000),       # ~300 distinct
            np.arange(4000),                  # 4000 distinct
        ]),
    })
    exact = df.groupby("g")["v"].nunique()
    for parts in (2, 8):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = grouped_approx_distinct(ds, "g", "v").set_index("g")
        for g in ("a", "b", "c"):
            rel = abs(out.loc[g, "approx_distinct"] - exact[g]) / exact[g]
            assert rel < 0.05, (g, rel)


def test_cms_hash_rows_are_independent():
    """Regression for the correlated-rows hazard: with a power-of-two
    width, a linear per-row mix makes every row a function of the same
    low bits of the base hash — keys that collide in one row then
    collide in ALL rows and min-over-rows stops helping.  With a proper
    avalanche, all-row collisions are (1/width)^depth — effectively 0."""
    import numpy as np

    from gliner_transbronchialbiopsy_ray.functions.sketches import CountMinSketch

    cms = CountMinSketch(width=128, depth=4)
    idx = cms._indices([f"key{i}" for i in range(2000)])
    # pairs colliding in row 0
    row0 = idx[0]
    order = np.argsort(row0, kind="stable")
    same0 = 0
    all_rows = 0
    for a in range(len(row0)):
        for b in range(a + 1, min(a + 50, len(row0))):  # local sample
            ia, ib = order[a], order[b]
            if row0[ia] != row0[ib]:
                break
            same0 += 1
            if (idx[:, ia] == idx[:, ib]).all():
                all_rows += 1
    assert same0 > 50          # collisions in one row are common at w=128
    assert all_rows == 0       # but never in all four rows


def test_grouped_kmv_distinct_accuracy_and_exact_fallback(ray_session):
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.functions.sketches import (
        grouped_kmv_distinct)

    # group 'big': 5000 distinct values -> sketch path (k=64);
    # group 'small': 10 distinct -> exact fallback
    rows = [{"g": "big", "v": i} for i in range(5000)]
    rows += [{"g": "big", "v": i} for i in range(1000)]  # repeats collapse
    rows += [{"g": "small", "v": i} for i in range(10)] * 3
    ds = rd.from_items(rows).repartition(8)
    out = (grouped_kmv_distinct(ds, key="g", value="v", k=64)
           .set_index("g"))
    small = out.loc["small"]
    assert small["kmv_estimate"] == 10 and small["n_sketch"] == 10
    big = out.loc["big"]
    # KMV with k=64: relative error ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
    assert abs(big["kmv_estimate"] - 5000) / 5000 < 0.4
    assert big["n_sketch"] == 64

    # mergeability: block layout must not change the result
    out2 = (grouped_kmv_distinct(ds.repartition(2), key="g",
                                 value="v", k=64).set_index("g"))
    assert out2["kmv_estimate"].to_dict() == out["kmv_estimate"].to_dict()
    assert out2["h_k"].to_dict() == out["h_k"].to_dict()


def test_cms_inner_product_join_size(ray_session):
    import numpy as np

    rng = np.random.RandomState(11)
    from gliner_transbronchialbiopsy_ray.functions.sketches import (
        CountMinSketch)

    keys_a = rng.randint(0, 3000, 20000)
    keys_b = rng.randint(0, 3000, 15000)
    ka, ca = np.unique(keys_a, return_counts=True)
    kb, cb = np.unique(keys_b, return_counts=True)
    exact = int(sum(int(x) * int(dict(zip(kb, cb)).get(k, 0))
                    for k, x in zip(ka, ca)))
    sa = CountMinSketch(width=4096, depth=4).add_counts(ka.tolist(), ca)
    sb = CountMinSketch(width=4096, depth=4).add_counts(kb.tolist(), cb)
    est = sa.inner_product(sb)
    # always an overestimate, within the e/width * |A| * |B| bound
    assert est >= exact
    bound = int(np.e / 4096 * len(keys_a) * len(keys_b))
    assert est - exact <= bound
    # merge-then-product equals product of merged halves' sum
    sa1 = CountMinSketch(width=4096, depth=4).add_counts(
        ka[:1000].tolist(), ca[:1000])
    sa2 = CountMinSketch(width=4096, depth=4).add_counts(
        ka[1000:].tolist(), ca[1000:])
    assert sa1.merge(sa2).inner_product(sb) == est
    import pytest as _pytest
    with _pytest.raises(ValueError, match="identical"):
        sa.inner_product(CountMinSketch(width=1024, depth=4))


def test_cms_inner_product_no_int64_overflow():
    """ADVICE r3: a per-cell product of two ~3e9 counters exceeds int64
    (9.2e18) — the estimator must accumulate in Python ints, not
    overflow silently to a wrong/negative estimate."""
    from gliner_transbronchialbiopsy_ray.functions.sketches import (
        CountMinSketch)

    big = 3_000_000_000
    sa = CountMinSketch(width=64, depth=2).add_counts(["hot"], [big])
    sb = CountMinSketch(width=64, depth=2).add_counts(["hot"], [big])
    est = sa.inner_product(sb)
    assert est >= big * big          # 9e18 > int64 max
    assert est > 0

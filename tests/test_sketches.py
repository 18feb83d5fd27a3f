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

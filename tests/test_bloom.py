"""Bloom-filter semi-join: zero false negatives, bounded false positives."""

import ray.data

from gliner_transbronchialbiopsy_ray.functions.bloom import (
    BloomFilter,
    bloom_semi_join,
)


def test_bloom_no_false_negatives_bounded_fp():
    members = [f"key-{i}" for i in range(2000)]
    bf = BloomFilter.build(members, fp_rate=0.01)
    assert all(k in bf for k in members)  # no false negatives, ever
    others = [f"other-{i}" for i in range(5000)]
    fp = sum(1 for k in others if k in bf) / len(others)
    assert fp < 0.03  # ~1% target with slack


def test_bloom_semi_join_dataset():
    big = ray.data.from_items([{"doc_id": i, "v": i * 2} for i in range(3000)])
    keys = ray.data.from_items([{"doc_id": i} for i in range(0, 3000, 100)])
    out = bloom_semi_join(big, keys, "doc_id").to_pandas()
    wanted = set(range(0, 3000, 100))
    got = set(out["doc_id"])
    assert wanted <= got                      # every true match kept
    assert len(got - wanted) <= 0.03 * 3000   # few false positives

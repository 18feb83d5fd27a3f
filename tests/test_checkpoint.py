"""Resume-after-failure: a killed run leaves only tmp debris; resuming
produces byte-identical output to a single-shot run, with per-partition
lineage + throughput manifests."""

import glob
import json
import os
import shutil

import pyarrow as pa
import pytest
import ray.data

from gliner_transbronchialbiopsy_ray import fixtures
from gliner_transbronchialbiopsy_ray.config import PipelineConfig
from gliner_transbronchialbiopsy_ray.pipelines.btb import triples_dataset
from gliner_transbronchialbiopsy_ray.state.checkpoint import (
    CheckpointedRun,
    plan_partitions,
    read_checkpointed_output,
)

CFG = PipelineConfig(ner_concurrency=1, ner_batch_size=64, ner_num_cpus=0.5)


def _pipeline(ds: ray.data.Dataset) -> ray.data.Dataset:
    return triples_dataset(ds, CFG)


def _triples(out_root) -> set:
    t = read_checkpointed_output(out_root)
    return {
        (r["subj"], r["pred"], r["obj"])
        for r in t.select_columns(["subj", "pred", "obj"]).iter_rows()
    }


@pytest.fixture(scope="module")
def corpus_path():
    return fixtures.write_corpus(200, seed=42, shards=6)


def test_resume_after_partition_failure(corpus_path, tmp_path_factory):
    files = sorted(glob.glob(f"{corpus_path}/documents/*.parquet"))
    parts = plan_partitions(files, 3)
    assert len(parts) == 3 and sum(len(p) for p in parts) == len(files)

    out_a = str(tmp_path_factory.mktemp("single"))
    CheckpointedRun(out_a).run(parts, _pipeline)
    expected = _triples(out_a)

    # failing run: partition 1 dies on first attempt
    out_b = str(tmp_path_factory.mktemp("faulty"))
    attempts = {"n": 0}

    def flaky(ds):
        attempts["n"] += 1
        if attempts["n"] == 2:  # second partition processed
            raise RuntimeError("injected failure")
        return _pipeline(ds)

    with pytest.raises(RuntimeError):
        CheckpointedRun(out_b).run(parts, flaky)

    run_b = CheckpointedRun(out_b)
    assert len(run_b.completed()) == 1  # only the first partition manifested

    # resume: skips the completed partition, completes the rest
    n_nonempty = sum(1 for p in parts if p)
    summary = run_b.run(parts, _pipeline)
    assert summary["completed_prior"] == 1
    assert summary["ran"] == n_nonempty - 1
    assert summary["completed_total"] == n_nonempty
    assert _triples(out_b) == expected


def test_manifest_lineage_and_metrics(corpus_path, tmp_path_factory):
    files = sorted(glob.glob(f"{corpus_path}/documents/*.parquet"))
    parts = plan_partitions(files, 2)
    out = str(tmp_path_factory.mktemp("mani"))
    CheckpointedRun(out).run(parts, _pipeline)
    manifests = sorted(glob.glob(f"{out}/checkpoints/*.json"))
    assert len(manifests) == 2
    m = json.load(open(manifests[0]))
    assert set(m) >= {
        "partition", "input_ref", "rows_in", "rows_out", "seconds",
        "rows_per_sec", "output_path", "content_hash", "engine_version",
    }
    assert m["rows_in"] > 0 and m["rows_out"] > 0 and m["seconds"] > 0
    assert m["input_ref"] == parts[0]


def test_untrusted_output_without_manifest_is_redone(corpus_path, tmp_path_factory):
    files = sorted(glob.glob(f"{corpus_path}/documents/*.parquet"))
    parts = plan_partitions(files, 2)
    out = str(tmp_path_factory.mktemp("redo"))
    run = CheckpointedRun(out)
    run.run(parts, _pipeline)
    expected = _triples(out)
    # simulate crash between write and manifest: drop a manifest, corrupt dir
    os.remove(f"{out}/checkpoints/part-00001.json")
    shutil.rmtree(f"{out}/part-00001")
    os.makedirs(f"{out}/part-00001")  # empty junk dir
    summary = run.run(parts, _pipeline)
    assert summary["ran"] == 1
    assert _triples(out) == expected


def test_incremental_append_only_new_partitions_run(corpus_path, tmp_path_factory):
    """Appending input files re-runs ONLY the partitions whose file set
    changed (stable-hash planning) — never silently keeps stale output."""
    files = sorted(glob.glob(f"{corpus_path}/documents/*.parquet"))
    first, extra = files[:-1], files[-1:]
    out = str(tmp_path_factory.mktemp("incr"))
    run = CheckpointedRun(out)

    parts_a = plan_partitions(first, 4)
    run.run(parts_a, _pipeline)

    parts_b = plan_partitions(first + extra, 4)
    # partitions not containing the new file keep identical file sets
    unchanged = sum(1 for a, b in zip(parts_a, parts_b) if a == b)
    assert unchanged >= 1
    summary = run.run(parts_b, _pipeline)
    assert summary["completed_prior"] == unchanged
    assert summary["ran"] == len(parts_b) - unchanged

    # final output covers the full corpus exactly (vs single-shot)
    out_full = str(tmp_path_factory.mktemp("full"))
    CheckpointedRun(out_full).run(parts_b, _pipeline)
    assert _triples(out) == _triples(out_full)


def test_incremental_aggregate_maintenance(corpus_path, tmp_path_factory):
    """IncrementalAggregate recomputes ONLY partials whose partition
    content changed: first refresh computes all, an unchanged re-run
    reuses all, an appended corpus recomputes exactly the partitions the
    new files hash into — and every refresh equals a from-scratch
    aggregate of the full output."""
    import pandas as pd

    from gliner_transbronchialbiopsy_ray.state.incremental import (
        IncrementalAggregate,
    )

    files = sorted(glob.glob(f"{corpus_path}/documents/*.parquet"))
    parts = plan_partitions(files, 3)
    out = str(tmp_path_factory.mktemp("incr"))
    run = CheckpointedRun(out)
    run.run(parts, _pipeline)

    def partial(ds):
        return (ds.select_columns(["pred"]).to_pandas()
                .groupby("pred").size().rename("n").reset_index())

    def fold(p):
        return (p.groupby("pred", as_index=False)["n"].sum()
                .sort_values("pred").reset_index(drop=True))

    agg = IncrementalAggregate(out, "pred_counts", partial, fold)
    res1, st1 = agg.refresh()
    assert st1["recomputed"] == len(run.completed()) and st1["reused"] == 0

    def expected():
        t = read_checkpointed_output(out).select_columns(["pred"]).to_pandas()
        return (t.groupby("pred").size().rename("n").reset_index()
                .sort_values("pred").reset_index(drop=True))

    pd.testing.assert_frame_equal(res1, expected())

    # unchanged output -> every partial reused, same result
    res2, st2 = agg.refresh()
    assert st2["recomputed"] == 0 and st2["reused"] == st1["recomputed"]
    pd.testing.assert_frame_equal(res2, res1)

    # append a new shard: stable-hash planning keeps untouched partitions'
    # manifests valid, so only affected partitions re-run AND re-partial
    extra = fixtures.write_corpus(40, seed=99, shards=1)
    extra_file = sorted(glob.glob(f"{extra}/documents/*.parquet"))[0]
    new_name = os.path.join(corpus_path, "documents", "zzz-extra.parquet")
    shutil.copy(extra_file, new_name)
    try:
        files2 = sorted(glob.glob(f"{corpus_path}/documents/*.parquet"))
        parts2 = plan_partitions(files2, 3)
        changed = sum(1 for a, b in zip(parts, parts2) if a != b)
        summary = run.run(parts2, _pipeline)
        assert summary["ran"] == changed  # untouched partitions skipped

        res3, st3 = agg.refresh()
        assert st3["recomputed"] == changed
        assert st3["reused"] == len(run.completed()) - changed
        pd.testing.assert_frame_equal(res3, expected())
        assert int(res3["n"].sum()) > int(res1["n"].sum())
    finally:
        os.remove(new_name)

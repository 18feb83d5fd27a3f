"""Job entry point for ``ray job submit`` (and local CLI).

    ray job submit -- python -m gliner_transbronchialbiopsy_ray.run \
        --input /data/corpus/documents --output /data/out/triples \
        --partitions 64 [--resume] [--labels "Grade A,Grade B"] \
        [--threshold 0.6] [--ner-concurrency 32] [--backend lexicon]

Runs the KG-construction pipeline partition-by-partition with per-partition
lineage manifests (state/checkpoint.py); a rerun with --resume (or just
rerunning — resume is the default behavior of CheckpointedRun) skips
completed partitions.  Owns the Ray session (guarded init / shutdown) —
library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="BTB KG-construction job")
    ap.add_argument("--input", required=True,
                    help="documents dir (parquet files, input_hint schema)")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--labels", default=None,
                    help="comma-separated label subset (default: all 14)")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--truncate-chars", type=int, default=None)
    ap.add_argument("--backend", default="lexicon", choices=["lexicon", "gliner"])
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--ner-concurrency", type=int, default=None)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="ray.init num_cpus (local runs only)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from .config import configure_data_context

    configure_data_context()

    from .config import LABELS, PipelineConfig
    from .pipelines.btb import triples_dataset
    from .state.checkpoint import CheckpointedRun, plan_partitions

    cpus = int(ray.cluster_resources().get("CPU", 4))
    cfg = PipelineConfig(
        labels=args.labels.split(",") if args.labels else list(LABELS),
        threshold=args.threshold,
        truncate_chars=args.truncate_chars,
        model_backend=args.backend,
        model_path=args.model_path,
        ner_concurrency=args.ner_concurrency or max(2, cpus // 2),
        ner_num_cpus=0.5,
        text_batch_size=None,
    )

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files and os.path.isfile(args.input):
        files = [args.input]
    if not files:
        print(f"no parquet files under {args.input}", file=sys.stderr)
        return 2
    partitions = plan_partitions(files, args.partitions)

    run = CheckpointedRun(args.output)
    summary = run.run(partitions, lambda ds: triples_dataset(ds, cfg))
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

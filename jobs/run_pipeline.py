#!/usr/bin/env python3
"""spark-submit entry point for the ER pipeline (SURVEY.md §7 contract).

Cluster:
  spark-submit --py-files dist/jobs.zip jobs/run_pipeline.py \
      --input warehouse.webpages --checkpoint-dir s3://bucket/ckpt --lang en

Local / synthetic (sandbox):
  python jobs/run_pipeline.py --scale small --checkpoint-dir /tmp/er_ckpt

--input accepts either a parquet path (contains '/') or a catalog table name.
Stage tables land under --checkpoint-dir; a rerun with the same dir resumes
from the last completed stage (kill-safe at every boundary).  Exit prints one
JSON line with per-stage row counts and the cluster count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="parquet path or table name")
    ap.add_argument("--scale", default=None, choices=["tiny", "small", "bench"],
                    help="generate the deterministic synthetic corpus instead")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--weights", default=None,
                    help="npy file with trained scorer weights")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()
    if not args.input and not args.scale:
        ap.error("one of --input / --scale is required")

    import numpy as np

    from berkeley_entity_spark.config import PipelineConfig, scale_config
    from berkeley_entity_spark.plans.checkpoint import CheckpointStore
    from berkeley_entity_spark.plans.pipeline import run_pipeline
    from berkeley_entity_spark.session import get_spark
    from berkeley_entity_spark.synth import generate_webpages

    spark = get_spark(
        app_name="er-pipeline", shuffle_partitions=args.shuffle_partitions
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.scale:
        pages, _ = generate_webpages(spark, scale_config(args.scale))
    elif "/" in args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = spark.read.table(args.input)

    weights = np.load(args.weights) if args.weights else None
    cfg = PipelineConfig(checkpoint_dir=args.checkpoint_dir)
    store = CheckpointStore(args.checkpoint_dir, cfg.checkpoint_format)
    res = run_pipeline(
        spark, pages, cfg,
        weights=weights, store=store,
        resume=not args.no_resume, lang=args.lang,
    )
    out = {
        "mentions": res.mentions.count(),
        "candidate_pairs": res.pairs.count(),
        "scored_pairs": res.scored.count(),
        "cluster_assignments": res.clusters.count(),
        "clusters": res.clusters.select("cluster_id").distinct().count(),
        "checkpoint_dir": args.checkpoint_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

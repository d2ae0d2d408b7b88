#!/usr/bin/env python3
"""Per-stage wall-time profile of q_er_clusters (the SQL-oracled ER spine)
at a given sf_dir/parallelism.  Stages are forced with localCheckpoint so
each tick measures exactly one stage's work.

Usage: python tools/profile_q_er.py [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from berkeley_entity_spark.config import PipelineConfig
    from berkeley_entity_spark.operators.blocking import candidate_pairs, distinct_surfaces
    from berkeley_entity_spark.operators.clustering import assign_clusters, connected_components
    from berkeley_entity_spark.operators.extract import extract_mentions
    from berkeley_entity_spark.operators.scoring import match_edges, score_pairs, weights_vector
    from berkeley_entity_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="profile-q-er", master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    counts: dict[str, int] = {}

    def tick(name: str, t0: float) -> float:
        t1 = time.monotonic()
        times[name] = round(t1 - t0, 2)
        return t1

    # warm-up: run the full query once at sf0.001 (JIT, python worker pool)
    entry.q_er_clusters(spark, "/root/testdata/sf0.001").count()

    cfg = PipelineConfig()
    t_start = time.monotonic()
    t = t_start
    mentions = extract_mentions(entry._cap_docs(spark, sf_dir)).localCheckpoint(eager=True)
    t = tick("extract", t)
    surfaces = distinct_surfaces(mentions).persist()
    counts["n_surfaces"] = surfaces.count()
    t = tick("surfaces", t)
    pairs = candidate_pairs(
        mentions, cfg, surfaces=surfaces, n_surfaces=counts["n_surfaces"],
        prune=(weights_vector(entry.ORACLE_ER_WEIGHTS), entry.ORACLE_ER_THRESHOLD),
    ).localCheckpoint(eager=True)
    counts["n_pairs"] = pairs.count()
    t = tick("blocking", t)
    scored = score_pairs(
        pairs, {}, weights=weights_vector(entry.ORACLE_ER_WEIGHTS), features_out=False,
        prune_threshold=entry.ORACLE_ER_THRESHOLD,
    ).localCheckpoint(eager=True)
    counts["n_scored"] = scored.count()
    t = tick("scoring", t)
    edges = match_edges(scored, threshold=entry.ORACLE_ER_THRESHOLD).localCheckpoint(eager=True)
    counts["n_edges"] = edges.count()
    t = tick("edges", t)
    comp = connected_components(edges)
    counts["n_comp_nodes"] = comp.count()
    t = tick("cc", t)
    clusters = assign_clusters(mentions, surfaces, comp, n_surfaces=counts["n_surfaces"])
    out = (
        clusters.join(mentions.select("mention_id", "norm_name"), "mention_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("norm_name").alias("n_surfaces"),
            F.min("norm_name").alias("rep_name"),
        )
    )
    counts["n_clusters"] = out.count()
    t = tick("assign+agg", t)
    times["total"] = round(t - t_start, 2)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "times": times, "counts": counts}))


if __name__ == "__main__":
    main()

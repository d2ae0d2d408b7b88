#!/usr/bin/env python3
"""Per-stage wall-time profile of the ER pipeline at a given parallelism.

Usage: python tools/profile_er.py [n_pages] [cpus]
Prints one JSON line with per-stage seconds — used to find fixed (non-scaling)
overhead when tuning the local[8]/local[32] scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from berkeley_entity_spark.config import PipelineConfig, SynthConfig
    from berkeley_entity_spark.operators.blocking import candidate_pairs, distinct_surfaces
    from berkeley_entity_spark.operators.clustering import assign_clusters, connected_components
    from berkeley_entity_spark.operators.extract import extract_mentions
    from berkeley_entity_spark.operators.scoring import (
        collect_idf, idf_table, match_edges, score_pairs, weights_vector,
    )
    from berkeley_entity_spark.plans.checkpoint import CheckpointStore
    from berkeley_entity_spark.session import get_spark
    from berkeley_entity_spark.synth import generate_webpages

    spark = get_spark(app_name="profile-er", master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    root = f"/tmp/bes_profile_{cpus}"
    shutil.rmtree(root, ignore_errors=True)
    store = CheckpointStore(root)
    times: dict[str, float] = {}

    def tick(name: str, t0: float) -> float:
        t1 = time.monotonic()
        times[name] = round(t1 - t0, 2)
        return t1

    cfg = SynthConfig(n_pages=n_pages, n_entities=min(1500, max(60, n_pages // 130)))
    pages, _ = generate_webpages(spark, cfg, num_partitions=256)
    pcfg = PipelineConfig(checkpoint_dir=root)

    # warm-up: full pipeline at 1/10 scale (JIT, codegen caches, python worker
    # pool spin-up) so the timed region measures steady-state throughput
    from berkeley_entity_spark.plans.pipeline import run_pipeline
    wcfg = SynthConfig(n_pages=max(2000, n_pages // 10), n_entities=200)
    wpages, _ = generate_webpages(spark, wcfg, num_partitions=64)
    wroot = root + "_warm"
    shutil.rmtree(wroot, ignore_errors=True)
    t0w = time.monotonic()
    run_pipeline(spark, wpages, PipelineConfig(checkpoint_dir=wroot),
                 store=CheckpointStore(wroot), resume=False)
    warm_s = round(time.monotonic() - t0w, 2)

    t = time.monotonic()
    t_start = t
    pages = pages.where("lang = 'en'")
    mentions = store.save(extract_mentions(pages), "mentions")
    t = tick("extract", t)
    surfaces = distinct_surfaces(mentions).persist()
    surfaces.count()
    t = tick("surfaces", t)
    pairs = store.save(candidate_pairs(mentions, pcfg, surfaces=surfaces), "candidate_pairs")
    t = tick("blocking", t)
    idf = collect_idf(idf_table(surfaces))
    t = tick("idf_collect", t)
    scored = store.save(score_pairs(pairs, idf, weights_vector(), repartition=True), "scored_pairs")
    t = tick("scoring", t)
    edges = match_edges(scored, pcfg.score_threshold)
    comp = connected_components(edges, pcfg.max_cc_iterations, pcfg.checkpoint_every)
    comp = comp.persist()
    comp.count()
    t = tick("cc", t)
    clusters = store.save(assign_clusters(mentions, surfaces, comp), "clusters")
    t = tick("assign", t)
    n_clusters = clusters.select("cluster_id").distinct().count()
    t = tick("final_count", t)
    total = round(time.monotonic() - t_start, 2)
    print(json.dumps({
        "cpus": cpus, "pages": n_pages, "total": total, "warmup_s": warm_s,
        "clusters": n_clusters, "stages": times,
    }))


if __name__ == "__main__":
    main()

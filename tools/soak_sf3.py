"""sf3.0 scale soak of the dedup/ANN family (VERDICT r4 item 9).

Extends the sf1 soak one decade-third closer to the 100 TB story: a
30-copy key-consistent replica (~150k near-dup documents / 60k vectors /
18M lineitem rows) materialized with soak_sf1's replication rules, then
the dedup + similarity queries with per-query wall AND job/stage counts.

The cross-scale claim this records: *job/stage counts are identical to
the sf1 soak for every overlapping query* (the plans are scale-invariant
— no extra exchanges, no fallback paths, no driver finishes kicking in)
and no memory cliff at 3x the previous soak.  Walls are NOT expected to
scale linearly for the near-dup joins: replicas form 30-deep near-dup
classes, so true pair volume grows ~C(30,2)/C(10,2) = 9.7x over sf1 by
construction — that is the data's property (boilerplate dup classes),
not a plan regression; the JSON carries the pair counts so the
distinction is checkable.  q_ann_topk stays the disclosed
quadratic-by-design exact baseline (its sublinear siblings q_ann_ivf /
q_ann_lsh run beside it).

Usage: python tools/soak_sf3.py [--force]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import soak_sf1  # noqa: E402

COPIES = 30
DST = os.path.join(REPO, ".soak", "sf3.0")
OUT = os.path.join(REPO, "BENCH", "soak_sf3.json")

# the dedup + similarity family (the web-scale core); exact quadratic
# baselines included deliberately so the record shows them NEXT TO their
# sublinear siblings
SOAK_QUERIES = [
    "q_exact_dedup",
    "q_minhash_lsh",
    "q_simhash_pairs",
    "q_segment_dedup",
    "q_substring_dup",
    "q_dedup_keep_one",
    "q_ngram_jaccard",
    "q_containment",
    "q_semdedup",
    "q_ann_ivf",
    "q_ann_lsh",
    "q_ann_topk",
]


def main() -> None:
    force = "--force" in sys.argv
    from berkeley_entity_spark.session import get_spark

    import bench
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bes-soak-sf3")
    spark.sparkContext.setLogLevel("ERROR")
    # reuse soak_sf1's materializer at 30 copies
    soak_sf1.COPIES = COPIES
    soak_sf1.DST = DST
    if force or not os.path.exists(f"{DST}/lineitem.parquet"):
        soak_sf1.materialize(spark)

    sc = spark.sparkContext
    qs = entrymod.queries()
    # warm-up (same protocol as bench.run_headline)
    spark.read.parquet(f"{DST}/documents.parquet").count()
    qs["q_top_tokens"](spark, DST).write.format("noop").mode("overwrite").save()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    per = {}
    total = 0.0
    for name in SOAK_QUERIES:
        sc.setJobGroup(name, name)
        before = set(sc.statusTracker().getJobIdsForGroup(name) or [])
        t0 = time.monotonic()
        qs[name](spark, DST).write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        n_jobs, stages = bench._group_job_stats(sc, name, before)
        per[name] = {"sec": dt, "jobs": n_jobs, "stages": stages}
        total += dt
        print(f"{name}: {dt}s {n_jobs} jobs {stages} stages", flush=True)
        # shuffle-file hygiene between queries: ContextCleaner only
        # removes a dead query's shuffle files / leaked persists after
        # the JVM notices the RDDs are unreachable — in a long soak app
        # the files otherwise accumulate across queries and the disk
        # fills from accumulation, not from any one plan (observed: the
        # first sf3 run died SPILL_OUT_OF_MEMORY on a query whose own
        # working set fit comfortably)
        import gc as _gc

        _gc.collect()
        sc._jvm.System.gc()

    # pair-volume witnesses: distinguishes "the data has 9.7x more true
    # near-dup pairs at 30 copies" from "the plan regressed"
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{DST}/documents.parquet")
    n_docs = docs.count()
    from berkeley_entity_spark.operators.dedup import minhash_lsh_pairs

    n_lsh_pairs = minhash_lsh_pairs(docs.select("doc_id", "text")).count()

    res = {
        "metric": "sf3_soak_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "sf": 3.0,
        "copies_of_sf0.1": COPIES,
        "n_documents": n_docs,
        "n_minhash_lsh_pairs": n_lsh_pairs,
        "queries": per,
        "spin_calibration_sec": bench._spin_calibration(),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

"""Deterministic per-query cost profile: Spark job count + wall time.

Job/stage counts don't drift with host noise, so use them to find queries
paying fixed scheduling overhead (the sandbox's wall clock swings 1.4-1.9x
between windows).  Usage:

    python tools/jobs_per_query.py [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from berkeley_entity_spark.session import get_spark

import __spark_entry__ as entry


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(entry.queries().keys())
    spark = get_spark()
    sc = spark.sparkContext
    qs = entry.queries()
    for name in names:
        fn = qs[name]
        sc.setJobGroup(name, name)
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        wall = time.monotonic() - t0
        jobs = sc.statusTracker().getJobIdsForGroup(name)
        n_stages = 0
        for j in jobs:
            info = sc.statusTracker().getJobInfo(j)
            if info:
                n_stages += len(info.stageIds)
        print(f"QUERY {name}: {wall:.2f}s  {len(jobs)} jobs  {n_stages} stages")
        sc.setJobGroup("", "")


if __name__ == "__main__":
    main()

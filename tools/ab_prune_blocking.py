"""Interleaved A/B: candidate_pairs with vs without the pre-dedup prune.

Measures the blocking stage ONLY (through the dedup groupBy + attribute
joins, forced by count), warm, interleaved min-of-N per the
sandbox-benchmark protocol.  Also asserts the prune predicate stays OUT of
the band self-join condition (the pushdown-barrier contract).

Usage: python tools/ab_prune_blocking.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from berkeley_entity_spark.config import PipelineConfig
from berkeley_entity_spark.operators.blocking import candidate_pairs, distinct_surfaces
from berkeley_entity_spark.operators.extract import extract_mentions
from berkeley_entity_spark.operators.scoring import weights_vector
from berkeley_entity_spark.session import get_spark

import __spark_entry__ as entry


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    cfg = PipelineConfig()
    mentions = extract_mentions(entry._cap_docs(spark, sf_dir)).localCheckpoint(
        eager=True
    )
    surfaces = distinct_surfaces(mentions).persist()
    n = surfaces.count()
    w = weights_vector(entry.ORACLE_ER_WEIGHTS)
    thr = entry.ORACLE_ER_THRESHOLD

    def run(prune):
        t0 = time.monotonic()
        cnt = candidate_pairs(
            mentions, cfg, surfaces=surfaces, n_surfaces=n, prune=prune
        ).count()
        return time.monotonic() - t0, cnt

    # plan audit: levenshtein must NOT appear in the Join node
    plan = candidate_pairs(
        mentions, cfg, surfaces=surfaces, n_surfaces=n, prune=(w, thr)
    )._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        l for l in plan.splitlines() if "Join" in l and "levenshtein" in l.lower()
    ]
    print(f"levenshtein-in-join-condition lines: {len(join_lines)}")
    for l in join_lines:
        print("  !!", l[:200])

    # warm-up both paths once
    run(None)
    run((w, thr))
    t_off, t_on = [], []
    for i in range(reps):
        d, c_off = run(None)
        t_off.append(d)
        d, c_on = run((w, thr))
        t_on.append(d)
        print(f"rep {i}: unpruned {t_off[-1]:.2f}s ({c_off} pairs) | "
              f"pruned {t_on[-1]:.2f}s ({c_on} pairs)")
    print(f"min unpruned {min(t_off):.2f}s | min pruned {min(t_on):.2f}s")


if __name__ == "__main__":
    main()

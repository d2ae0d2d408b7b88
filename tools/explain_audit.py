"""Plan audit: verify the physical plans have the shapes we designed for.

Checks per query/stage:
  * no CartesianProduct anywhere
  * no per-row Python (BatchEvalPython); Arrow kernels show as
    ArrowEvalPython / MapInPandas only
  * parquet scans carry PushedFilters / pruned ReadSchema where expected
  * broadcast joins where a dimension is joined

Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from berkeley_entity_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    qs = entrymod.queries()

    for name, fn in qs.items():
        df = fn(spark, SF)
        plan = plan_of(df)
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in plan")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: per-row Python UDF (BatchEvalPython) in plan")
        print(f"audited {name}")

    # column pruning: extracting mentions from stored text must not read html
    from berkeley_entity_spark.config import SynthConfig
    from berkeley_entity_spark.operators.extract import extract_mentions
    from berkeley_entity_spark.synth import generate_webpages

    pages, _ = generate_webpages(spark, SynthConfig(n_pages=10, n_entities=10))
    tmp = "/tmp/bes_audit_pages"
    pages.write.mode("overwrite").parquet(tmp)
    stored = spark.read.parquet(tmp)
    plan = plan_of(extract_mentions(stored.where("lang = 'en'")))
    if "html" in plan.split("ReadSchema")[-1]:
        failures.append("extract_mentions reads the html column (column pruning broken)")
    if "PushedFilters: []" in plan:
        failures.append("lang filter not pushed to parquet scan")
    print("audited extract column-pruning/pushdown")

    # broadcast join check
    plan = plan_of(qs["q_broadcast_dim"](spark, SF))
    if "BroadcastHashJoin" not in plan:
        failures.append("q_broadcast_dim: dimension not broadcast")
    print("audited broadcast join")

    if failures:
        print("\n".join("FAIL " + f for f in failures))
        return 1
    print("ALL PLAN AUDITS OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

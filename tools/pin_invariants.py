"""Regenerate INVARIANTS.json — the pinned golden values for the two driver
queries whose full outputs are not SQL-derivable (q_er_clusters: iterative
connected components; q_ner_tags: Viterbi DP) but whose deterministic-seed
invariant summaries are stable across partitioning, parallelism and reruns.

Run after any DELIBERATE change to the synthetic corpus, the extract kernel,
the scorer/weights, or the clustering; commit the diff.  An unexplained
change in these values is a regression — investigate before repinning.

Usage: python tools/pin_invariants.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from berkeley_entity_spark.session import get_spark  # noqa: E402

OUT = "/root/repo/INVARIANTS.json"
PINNED = ["q_er_clusters", "q_ner_tags"]


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    data: dict[str, list[list]] = {}
    for name in PINNED:
        rows = qs[name](spark, "/root/testdata/sf0.001").collect()
        data[name] = sorted([list(r) for r in rows])
        print(f"{name}: {len(rows)} invariant rows")
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1, default=str)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

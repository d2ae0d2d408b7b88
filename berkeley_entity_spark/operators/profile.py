"""Column profiling: the data-quality scan a pipeline runs before and
after every ingest — null rates, distinct counts, min/max, and the top-k
most frequent values per column.

Reference analog: the reference's corpora are hand-inspected offline; a
100 TB ingest needs the inspection AS an operator.  Design constraints at
scale:

  * ONE melt projection (explode of (column, value) structs — codegen,
    no per-column jobs) feeds one groupBy for the value counts, one for
    the per-column stats: the scan count is independent of the column
    count.
  * Top-k per column uses the repo-standard two-phase pattern (salted
    local top-k, then a final window over <= k * n_salts survivors per
    column) — one hot column (e.g. a constant-heavy lang field) never
    funnels the corpus through a single window task.
  * Exact n_distinct comes from the counts table we already built (no
    extra scan).  `approx=True` swaps in approx_count_distinct (HLL) for
    the 100 TB path where the counts table itself is the cost — tested
    for relative error in pytest, and deliberately NOT the oracle path.

Values are profiled as strings (one uniform melt column); NULLs count
toward n_null, never toward values/distincts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    top_k: int = 3,
    n_salts: int = 32,
    approx: bool = False,
) -> DataFrame:
    """One row per (column, rank <= top_k):

    (column, n_rows, n_null, n_distinct, min_value, max_value,
     rank, value, n_value)

    Ties in the top-k rank break to the lexicographically smallest value,
    so output is engine- and partitioning-independent."""
    cols = cols or df.columns
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")
    stats = melted.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        *(
            [F.approx_count_distinct("value").alias("n_distinct")]
            if approx
            else []
        ),
    )
    counts = (
        melted.where(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n_value"))
    )
    if not approx:
        nd = counts.groupBy("column").agg(
            F.count(F.lit(1)).alias("n_distinct")
        )
        stats = stats.join(nd, "column", "left").withColumn(
            "n_distinct", F.coalesce("n_distinct", F.lit(0))
        )
    salt = F.pmod(F.xxhash64("value"), F.lit(n_salts))
    w1 = Window.partitionBy("column", salt).orderBy(
        F.desc("n_value"), F.asc("value")
    )
    survivors = counts.withColumn("_rn1", F.row_number().over(w1)).where(
        F.col("_rn1") <= top_k
    )
    w2 = Window.partitionBy("column").orderBy(F.desc("n_value"), F.asc("value"))
    top = (
        survivors.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= top_k)
        .select("column", F.col("rank").cast("int").alias("rank"), "value", "n_value")
    )
    return stats.join(top, "column", "left").select(
        "column",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_value",
        "max_value",
        "rank",
        "value",
        "n_value",
    )

"""Wikipedia-DB-shaped operators (SURVEY.md §2.1 S6, §2.3 J7, §2.4 A10).

The reference crunches a Wikipedia XML dump into lookup DBs
(wiki/WikipediaTitleGivenSurfaceDB.scala:19-79: surface -> title counts with
vote merge; wiki/WikipediaRedirectsDB.scala: redirect following;
WikipediaInterface.scala:79-131: chained lookup + argmax).  The dump itself
is out of scope (no data in this sandbox); these operators implement the
*shapes* over any (surface, title) link table:

  * title_given_surface   — A10 count table: groupBy(surface, title).count()
  * resolve_redirects     — J7 chained map-side lookups: a bounded number of
    broadcast left joins (the reference follows one redirect hop after the
    surface lookup; we allow k hops).  At web scale the redirect table is
    millions of rows — comfortably broadcastable; the link table is not.
  * best_title_per_surface — A10 vote argmax with deterministic ties
    (max count, then lexicographically smallest title — the reference's
    Counter.argMax order is made explicit here for reproducibility).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def title_given_surface(links: DataFrame) -> DataFrame:
    """links(surface, title) -> (surface, title, votes)."""
    return links.groupBy("surface", "title").agg(
        F.count(F.lit(1)).alias("votes")
    )


def resolve_redirects(
    links: DataFrame, redirects: DataFrame, hops: int = 2
) -> DataFrame:
    """Rewrite each link's title through <= `hops` redirect steps.

    redirects(src, dst) is broadcast; each hop is one map-side left join —
    no shuffle of the (huge) link table.  Cycles are bounded by `hops`."""
    out = links
    for i in range(hops):
        r = F.broadcast(redirects.select(
            F.col("src").alias(f"_s{i}"), F.col("dst").alias(f"_d{i}")
        ))
        out = (
            out.join(r, out["title"] == r[f"_s{i}"], "left")
            .withColumn("title", F.coalesce(F.col(f"_d{i}"), F.col("title")))
            .drop(f"_s{i}", f"_d{i}")
        )
    return out


def best_title_per_surface(counts: DataFrame) -> DataFrame:
    """(surface, title, votes) -> (surface, best_title, votes): vote argmax,
    ties broken by lexicographically smallest title (deterministic)."""
    w = Window.partitionBy("surface").orderBy(F.desc("votes"), F.asc("title"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("surface", F.col("title").alias("best_title"), "votes")
    )

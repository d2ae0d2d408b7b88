"""Wikipedia XML dump parsing (SURVEY.md S6 — the raw-dump half).

Reference behavior ported: the reference scans the enwiki XML dump as
plain text, never with an XML parser —
  * page titles from ``<title>...</title>`` substrings
    (WikipediaTitleGivenSurfaceDB.scala:106-108,
     WikipediaRedirectsDB.scala:81-84);
  * redirect targets from ``<redirect title="..."`` attribute substrings
    (WikipediaRedirectsDB.scala:88-91, 127-133);
  * surface->title votes from ``[[target|anchor]]`` wikilink scanning with
    FIRST-pipe splitting: piped links vote (anchor -> target), bare links
    vote (target -> target) (WikipediaTitleGivenSurfaceDB.scala:113-135);
  * the only entity handling the reference does is ``&#039;`` -> ``'``
    (WikipediaRedirectsDB.removeWeirdMarkup:62-65); we additionally
    unescape the five standard XML entities since real dump text is
    XML-escaped.

Spark-first shape: the dump is read with a page-level record delimiter
(``lineSep = "</page>"``) so each task gets whole pages, and EVERY
extraction below is a built-in regexp/string expression — whole-stage
codegen end to end, no Python in the hot path.  At 100 TB the dump scan
is embarrassingly parallel: no shuffle until the surface->title groupBy,
which is a map-side-combining count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference scans for these markers verbatim
_TITLE_RE = "<title>([^<]*)</title>"
_REDIRECT_RE = '<redirect title="([^"]*)"'
_TEXT_RE = "(?s)<text[^>]*>(.*)</text>"
_LINK_RE = r"\[\[([^\]\[]*)\]\]"


def read_dump(spark: SparkSession, path: str) -> DataFrame:
    """One row per ``<page>`` chunk: text source with a closing-tag record
    delimiter.  This is the 100 TB ingestion path — Spark splits the dump
    by byte ranges and each record is a self-contained page, so parsing
    needs no cross-partition state."""
    return spark.read.option("lineSep", "</page>").text(path)


def unescape_xml(col):
    """The five standard XML entities + the reference's ``&#039;`` quirk
    (WikipediaRedirectsDB.removeWeirdMarkup:62-65).  ``&amp;`` is replaced
    LAST so escaped-escapes (``&amp;lt;``) unescape one level only."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#039;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def parse_pages(chunks: DataFrame, col: str = "value") -> DataFrame:
    """(page chunk) -> (title, redirect_target, wikitext).

    Malformed pages — no parseable ``<title>`` — are DROPPED, exactly like
    the reference's scanner, which simply never sets currentPageTitle for
    them (WikipediaRedirectsDB.scala:100-140 skips any page whose marker
    lines are absent).  redirect_target is NULL for ordinary pages."""
    c = F.col(col)
    title = F.regexp_extract(c, _TITLE_RE, 1)
    redirect = F.regexp_extract(c, _REDIRECT_RE, 1)
    text = F.regexp_extract(c, _TEXT_RE, 1)
    return (
        chunks.select(
            title.alias("title"),
            F.when(redirect != "", redirect).alias("redirect_target"),
            unescape_xml(text).alias("wikitext"),
        )
        .where(F.col("title") != "")
    )


def page_links(pages: DataFrame) -> DataFrame:
    """Wikilink votes per the reference's first-pipe scan
    (WikipediaTitleGivenSurfaceDB.scala:113-135): ``[[T|A]]`` -> (A, T),
    ``[[T]]`` -> (T, T).  Empty targets are dropped (the reference's
    ``endIdx >= startIdx + 2`` guard).  Pure array expressions — the
    explode is the only row-count change, still no shuffle."""
    # lit() pattern, not an expr string literal: Spark SQL literals eat
    # single backslashes, which would corrupt the [[ ]] escapes
    inner = F.regexp_extract_all("wikitext", F.lit(_LINK_RE), F.lit(1))
    link = (
        pages.select("title", F.explode(inner).alias("lk"))
        .where(F.col("lk") != "")
        .withColumn("_p", F.instr("lk", "|"))
    )
    return link.select(
        F.col("title").alias("page_title"),
        F.when(F.col("_p") > 0, F.expr("substr(lk, _p + 1)"))
        .otherwise(F.col("lk"))
        .alias("surface"),
        F.when(F.col("_p") > 0, F.expr("substr(lk, 1, _p - 1)"))
        .otherwise(F.col("lk"))
        .alias("title"),
    ).where(F.col("title") != "")


def redirect_table(pages: DataFrame) -> DataFrame:
    """(src, dst) pairs from redirect pages — the broadcastable dim that
    feeds operators.wiki.resolve_redirects (J7)."""
    return pages.where(F.col("redirect_target").isNotNull()).select(
        F.col("title").alias("src"), F.col("redirect_target").alias("dst")
    )

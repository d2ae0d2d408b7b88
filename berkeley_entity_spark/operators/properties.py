"""Mention property computation: number + gender (SURVEY.md P11, S4).

Reference semantics re-expressed as DataFrame joins + CASE expressions:

  * Bergsma-Lin count table lookup with sanitized keys (lowercase, digit
    runs -> "#"): NumberGenderComputer.scala:13-15 (sanitizeWord),
    :17-25 (accessCounts; a missing key behaves exactly like stored
    all-zero counts — `sameElements(NullCounts)`).
  * number: phrase lookup, back off to head word, default SINGULAR when
    masc+fem+neut >= plural: NumberGenderComputer.scala:27-39.
  * gender (non-person): Stanford-style confidence rule — a class wins when
    its count >= 2x the other two combined AND >= 3, else UNKNOWN:
    NumberGenderComputer.scala:41-56.
  * gender (person): when the head token is capitalized and the token before
    it is capitalized too, treat that previous token as a first name and
    decide from its counts alone: NumberGenderComputer.scala:62-76,
    invoked for PERSON mentions from Mention.scala:336-344.

The count table is a broadcast dimension (the reference loads gender.data
into driver memory every run — NumberGenderComputer.scala:108-183; here it
is a DataFrame so the same lookup scales past memory via a shuffle join when
the byte gate declines the broadcast).  All lookups run at the DISTINCT SPAN
level, then join back to mention instances — the same dedupe-first decision
as blocking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from berkeley_entity_spark.util import maybe_broadcast

NUMGENDER_SCHEMA = "phrase string, masc int, fem int, neut int, plur int"


def sanitize(col: Column) -> Column:
    """NumberGenderComputer.sanitizeWord: lowercase, digit runs -> '#'."""
    return F.regexp_replace(F.lower(col), "[0-9]+", "#")


def _is_cap(col: Column) -> Column:
    """Character.isUpperCase on the first char (ASCII A-Z — both engines)."""
    return F.ascii(F.substring(col, 1, 1)).between(65, 90)


def _gender_case(m: Column, f: Column, n: Column) -> Column:
    """NumberGenderComputer.scala:47-55 confidence cascade."""
    return (
        F.when((m >= 2 * (f + n)) & (m >= 3), F.lit("MALE"))
        .when((f >= 2 * (m + n)) & (f >= 3), F.lit("FEMALE"))
        .when((n >= 2 * (m + f)) & (n >= 3), F.lit("NEUTRAL"))
        .otherwise(F.lit("UNKNOWN"))
    )


def _ng_joined(spans: DataFrame, ng: DataFrame, key: str, prefix: str) -> DataFrame:
    looked = ng.select(
        F.col("phrase").alias(key),
        F.col("masc").alias(f"{prefix}m"),
        F.col("fem").alias(f"{prefix}f"),
        F.col("neut").alias(f"{prefix}n"),
        F.col("plur").alias(f"{prefix}p"),
    )
    out = spans.join(looked, key, "left")
    for c in ("m", "f", "n", "p"):
        out = out.withColumn(f"{prefix}{c}", F.coalesce(f"{prefix}{c}", F.lit(0)))
    return out


def _props_for(spans: DataFrame, numgender: DataFrame, span_col: str) -> DataFrame:
    """Add `number`, `gender`, `_mtype` to a frame that carries `span_col` +
    `_person` (either the full mention table — inline mode — or the distinct
    (span, person) key table).  Drops its own temp columns; replaces any
    pre-existing number/gender.  The property cascade is a pure function of
    (span, _person), which is what makes the dedupe-first mode exact."""
    toks = F.split(F.col(span_col), " ")
    spans = (
        spans.withColumn("_head_tok", F.element_at(toks, -1))
        .withColumn("_prev_tok", F.when(F.size(toks) >= 2, F.element_at(toks, -2)))
        .withColumn("_phrase_key", sanitize(F.col(span_col)))
        .withColumn("_head_key", sanitize(F.col("_head_tok")))
        .withColumn("_first_key", sanitize(F.col("_prev_tok")))
    )
    spans = _ng_joined(spans, numgender, "_phrase_key", "p")
    spans = _ng_joined(spans, numgender, "_head_key", "h")
    spans = _ng_joined(spans, numgender, "_first_key", "f")

    # accessCounts backoff: phrase counts count as "found" iff not all-zero
    found = (F.col("pm") + F.col("pf") + F.col("pn") + F.col("pp")) > 0
    cm = F.when(found, F.col("pm")).otherwise(F.col("hm"))
    cf = F.when(found, F.col("pf")).otherwise(F.col("hf"))
    cn = F.when(found, F.col("pn")).otherwise(F.col("hn"))
    cp = F.when(found, F.col("pp")).otherwise(F.col("hp"))

    number_counts = F.when(cm + cf + cn >= cp, F.lit("SINGULAR")).otherwise(
        F.lit("PLURAL")
    )
    gender_nonperson = _gender_case(cm, cf, cn)
    # person first-name special case: head capitalized (assume last name) AND
    # previous token capitalized (assume first name) -> counts of that first
    # name alone (NumberGenderComputer.scala:64-69); all other person shapes
    # fall through to the non-person rule (:70-75)
    first_name_path = (
        F.col("_person")
        & _is_cap(F.col("_head_tok"))
        & F.col("_prev_tok").isNotNull()
        & _is_cap(F.col("_prev_tok"))
    )
    gender_counts = F.when(
        first_name_path, _gender_case(F.col("fm"), F.col("ff"), F.col("fn"))
    ).otherwise(gender_nonperson)

    # Pronominal branch (Mention.scala:317-335): a single-token pronoun
    # mention takes number/gender from the pronoun sets, never from counts.
    from berkeley_entity_spark.operators.pronouns import (
        ALL_PRONOUNS,
        mention_type_col,
        pron_gender_col,
        pron_number_col,
    )

    # shared gate with mention_type_col (see span_pronoun_gate docstring:
    # the two sites must stay in lockstep)
    from berkeley_entity_spark.operators.pronouns import span_pronoun_gate

    low_span, eligible = span_pronoun_gate(F.col(span_col))
    pronominal = eligible & low_span.isin(*sorted(ALL_PRONOUNS))
    number = F.when(pronominal, pron_number_col(low_span)).otherwise(number_counts)
    gender = F.when(pronominal, pron_gender_col(low_span)).otherwise(gender_counts)

    drop = [c for c in ("number", "gender") if c in spans.columns]
    temp = ["_head_tok", "_prev_tok", "_phrase_key", "_head_key",
            "_first_key"] + [f"{p}{c}" for p in "phf" for c in "mfnp"]
    return (
        spans.drop(*drop)
        .withColumn("number", number)
        .withColumn("gender", gender)
        # Mention.scala:304-314 type cascade (DEMONSTRATIVE/PRONOMINAL/PROPER)
        .withColumn("_mtype", mention_type_col(F.col(span_col)))
        .drop(*temp)
    )


def with_number_gender(
    mentions: DataFrame,
    numgender: DataFrame,
    person_expr: Column | None = None,
    n_numgender: int | None = None,
    span_col: str = "span",
    distinct_keys: bool = True,
) -> DataFrame:
    """Replace the number/gender columns of `mentions` with values computed
    from the Bergsma-Lin-style count table `numgender(phrase, masc, fem,
    neut, plur)` (phrase pre-sanitized).

    person_expr: boolean Column over the mention row selecting PERSON
    mentions (the reference gates on nerString == "PERSON",
    Mention.scala:336); default uses the `ner` column when present, else no
    mention takes the person path.

    distinct_keys=True (default) evaluates the cascade once per DISTINCT
    (span, person) key and joins the small property table back (broadcast
    under the byte gate, shuffle join past it — AQE skew handling covers
    hot surfaces).  The cascade is a ~30-regexp expression tree whose
    shared subexpressions sit inside CASE branches, where codegen cannot
    eliminate them — evaluating it per mention INSTANCE was measured at
    ~95us/row and capped pipeline scaling (18.8M mentions / 7.5k surfaces
    at 2.4M pages).  Web corpora repeat surfaces heavily, so dedupe-first
    is the same decision as blocking.  distinct_keys=False keeps the
    zero-shuffle inline form for near-unique-span callers."""
    if person_expr is None:
        person_expr = (
            F.col("ner") == "PERSON" if "ner" in mentions.columns else F.lit(False)
        )
    # no row-count hint -> count once (one cheap job) rather than force a
    # broadcast: an unconditional F.broadcast would bypass the byte gate the
    # module advertises and OOM on a large caller-supplied count table
    if n_numgender is None:
        n_numgender = numgender.count()
    numgender = maybe_broadcast(numgender, n_numgender)
    base = mentions.withColumn("_person", person_expr)
    ordered = [c for c in mentions.columns if c not in ("number", "gender")] + [
        "number",
        "gender",
    ]
    if not distinct_keys:
        out = _props_for(base, numgender, span_col)
        if "mtype" in mentions.columns:
            out = out.drop("mtype").withColumnRenamed("_mtype", "mtype")
        return out.drop("_mtype", "_person").select(*ordered)

    keys = base.select(span_col, "_person").distinct()
    props = _props_for(keys, numgender, span_col)
    # the key table is bounded by the distinct-surface count, not the
    # corpus; byte-gate its broadcast like any other dimension
    props = maybe_broadcast(props, props.count())
    names = (span_col, "_person", "number", "gender", "_mtype")
    props = props.select([F.col(c).alias(f"_pr_{c}") for c in names])
    cond = base[span_col].eqNullSafe(props[f"_pr_{span_col}"]) & base[
        "_person"
    ].eqNullSafe(props["_pr__person"])
    out = (
        base.drop("number", "gender")
        .join(props, cond, "left")
        .withColumnRenamed("_pr_number", "number")
        .withColumnRenamed("_pr_gender", "gender")
    )
    if "mtype" in mentions.columns:
        out = out.drop("mtype").withColumnRenamed("_pr__mtype", "mtype")
    return out.drop(
        f"_pr_{span_col}", "_pr__person", "_pr__mtype", "_person"
    ).select(*ordered)

"""The end-to-end ER pipeline (SURVEY.md §3.1 lifecycle, Spark form).

extract -> block -> score -> cluster, each stage checkpointed (resume-safe)
with lineage metrics; mirrors Driver -mode COREF_PREDICT
(CorefSystem.scala:215-227) with blocking playing the pruner's role.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from berkeley_entity_spark.config import DEFAULT_PIPELINE, PipelineConfig
from berkeley_entity_spark.operators.blocking import (
    candidate_pairs,
    distinct_surfaces,
)
from berkeley_entity_spark.operators.clustering import (
    assign_clusters,
    connected_components,
)
from berkeley_entity_spark.operators.extract import extract_mentions
from berkeley_entity_spark.operators.scoring import (
    collect_idf,
    idf_table,
    load_default_weights,
    match_edges,
    score_pairs,
)
from berkeley_entity_spark.plans.checkpoint import CheckpointStore


@dataclass
class PipelineResult:
    mentions: DataFrame
    pairs: DataFrame
    scored: DataFrame
    clusters: DataFrame


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig = DEFAULT_PIPELINE,
    weights: np.ndarray | None = None,
    store: CheckpointStore | None = None,
    resume: bool = True,
    lang: str | None = "en",
    numgender: DataFrame | None = None,
) -> PipelineResult:
    """webpages -> clusters(mention_id, cluster_id).

    lang filter happens before extraction (partition-prunable predicate at
    the source scan).  Stage tables: mentions, candidate_pairs, scored_pairs,
    clusters — kill the job between any two and a rerun resumes.

    numgender: Bergsma-Lin-style count table for the properties stage; when
    None and cfg.compute_properties, the synthetic stand-in is generated
    (the reference unconditionally loads gender.data the same way).
    """
    if store is None:
        store = CheckpointStore(cfg.checkpoint_dir, cfg.checkpoint_format)

    def stage(df: DataFrame, name: str) -> DataFrame:
        return store.materialize(df, name, resume=resume)

    if lang is not None:
        pages = pages.where(F.col("lang") == lang)

    mentions = extract_mentions(pages)
    if cfg.compute_properties:
        from berkeley_entity_spark.operators.properties import with_number_gender
        from berkeley_entity_spark.synth import generate_numgender

        if numgender is None:
            numgender = generate_numgender(spark)
        # person proxy for untyped web mentions: multi-token non-acronym
        # span whose head + preceding token are capitalized (the gate inside
        # computeGenderPerson); org spans route their neuter-dominant org
        # word through the same path and still come out NEUTRAL
        toks = F.split(F.col("span"), " ")
        person = (F.size(toks) >= 2) & ~F.col("is_acr")
        mentions = with_number_gender(
            mentions, numgender, person_expr=person, n_numgender=numgender.count()
        )
    mentions = stage(mentions, "mentions")
    surfaces = distinct_surfaces(mentions).persist()
    n_surfaces = surfaces.count()  # materializes the cache; reused below
    pairs = stage(
        candidate_pairs(mentions, cfg, surfaces=surfaces, n_surfaces=n_surfaces),
        "candidate_pairs",
    )

    idf = collect_idf(idf_table(surfaces, n=n_surfaces))
    w = weights if weights is not None else load_default_weights()
    scored = stage(score_pairs(pairs, idf, w, repartition=True), "scored_pairs")

    edges = match_edges(scored, cfg.score_threshold)
    components = connected_components(
        edges, cfg.max_cc_iterations, cfg.checkpoint_every
    )
    clusters = stage(
        assign_clusters(mentions, surfaces, components, n_surfaces=n_surfaces),
        "clusters",
    )
    return PipelineResult(mentions, pairs, scored, clusters)

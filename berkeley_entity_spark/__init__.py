"""berkeley_entity_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the semantics of janenie/berkeley-entity (Durrett & Klein's joint
coreference / entity-analysis system, see /root/reference) as an idiomatic
PySpark pipeline over web-scale page tables:

    extract  -> mention records per page           (reference: CorefDocAssembler)
    block    -> candidate pairs via MinHash-LSH +
                sorted-neighborhood                (reference: CorefPruner "pruning")
    score    -> Arrow-batched pairwise features +
                logistic scorer                    (reference: PairwiseScorer)
    cluster  -> large-star/small-star transitive
                closure                            (reference: OrderedClustering)
    evaluate -> pairwise P/R/F1                    (reference: CorefEvaluator:364-396)

Everything is DataFrame-first; all row-level work is vectorized pandas/Arrow
UDFs (no per-row Python).
"""

__version__ = "0.1.0"

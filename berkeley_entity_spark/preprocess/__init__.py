"""Deterministic text preprocessing (extract-stage kernels).

Byte-identical re-implementations of the reference's normalization pipeline
(reference: preprocess/SentenceSplitter.scala, preprocess/Tokenizer.scala).
Pure functions here; Spark integration lives in operators/extract.py as
pandas UDFs (Arrow-batched — never per-row Python UDFs).
"""

from berkeley_entity_spark.preprocess.normalize import (
    canonicalize_line,
    form_canonicalized_paragraphs,
    strip_html,
)
from berkeley_entity_spark.preprocess.sentence import find_possible_splits, split_sentences
from berkeley_entity_spark.preprocess.tokenizer import ptb_tokenize

__all__ = [
    "canonicalize_line",
    "form_canonicalized_paragraphs",
    "strip_html",
    "find_possible_splits",
    "split_sentences",
    "ptb_tokenize",
]

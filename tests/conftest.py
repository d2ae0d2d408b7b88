from __future__ import annotations

import pytest

from berkeley_entity_spark.config import SynthConfig
from berkeley_entity_spark.session import get_spark
from berkeley_entity_spark.synth import generate_webpages, gold_with_ids

SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bes-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """1k synthetic pages + gold mentions (cached)."""
    cfg = SynthConfig(n_pages=1000, n_entities=60)
    pages, gold = generate_webpages(spark, cfg)
    pages = pages.cache()
    gold = gold_with_ids(gold).cache()
    pages.count(), gold.count()
    return cfg, pages, gold

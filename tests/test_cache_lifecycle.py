"""Cache lifecycle (r15 verdict item 3): queries that cache()
intermediates must release them before returning — nothing may rely
on the bench harness's clearCache() between queries. materialize_
release collects the (driver-sized) result and unpersists, so after
fn() returns the session holds NO net new persistent RDDs."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.001")

QUERIES = (
    "unigram_lm_surprisal",
    "perplexity_buckets",
    "kneser_ney_trigram",
    "dsir_importance_selection",
    "corpus_curation_pipeline",
)


def _cache_manager_empty(spark) -> bool:
    # the SQL CacheManager holds every live DataFrame .cache()/
    # .persist() registration — exactly the state the verdict item is
    # about. (localCheckpoint RDDs, used by connected_components to cut
    # iterative lineage, live outside it and are GC-reclaimed by the
    # ContextCleaner — they are not cache registrations.)
    return bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    )


@pytest.mark.parametrize("name", QUERIES)
def test_query_releases_its_caches(spark, name):
    from etl_sprint_2_5_spark import plans

    plans.load_all()
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)
    out = plans.REGISTRY[name].fn(spark, SF_DIR)
    # the result must still be materialized (not a lazy plan over the
    # just-unpersisted caches, which would silently recompute)
    assert out.count() > 0
    assert _cache_manager_empty(spark), (
        f"{name} left cached intermediates behind after returning"
    )

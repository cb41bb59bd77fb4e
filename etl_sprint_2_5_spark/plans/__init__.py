from etl_sprint_2_5_spark.plans.registry import REGISTRY, Query, query  # noqa: F401


def load_all() -> None:
    """Import every plan module so its @query registrations run."""
    import etl_sprint_2_5_spark.plans.core_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.curation_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.dedup_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.events_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.gold_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.graph_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.ingest_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.ivm_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.legacy_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.multimodal_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.olap_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.profiling_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.similarity_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.temporal_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.text_queries  # noqa: F401
    import etl_sprint_2_5_spark.plans.tpch_queries  # noqa: F401

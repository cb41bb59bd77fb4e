"""Elasticsearch sink — SURVEY.md §2.1 S5 production path.

The reference bulk-upserts docs with ``_id = doc.id`` via
helpers.bulk (/root/reference/postgres_to_es/daemon.py:358-381); the
idempotent-overwrite contract (T3) is what makes its at-least-once
delivery exactly-once in effect. The Spark equivalent is the
elasticsearch-hadoop connector with ``es.mapping.id`` — each executor
partition streams its rows as bulk requests directly to the matching
shards (no driver funnel, unlike the reference's single-process
helpers.bulk loop).

No ES cluster or connector jar ships in this container, so option
construction is pure/unit-tested and ``write_es`` raises a clear
error if the connector is absent; ``sink.upsert_keyed_parquet`` is
the in-container stand-in with the same upsert-by-key contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ES_FORMAT = "org.elasticsearch.spark.sql"


def es_options(
    nodes: str,
    index: str,
    mapping_id: str = "id",
    batch_entries: int = 1000,
    retry_count: int = 3,
    **extra: str,
) -> dict[str, str]:
    """Connector options mirroring the reference's bulk config:
    batch size (daemon.py:399-400,424) and retries (utils.py:19-53,
    bounded here — unbounded retry on a cluster wedges executors)."""
    opts = {
        "es.nodes": nodes,
        "es.resource": index,
        "es.mapping.id": mapping_id,
        "es.write.operation": "index",  # overwrite-by-id == T3 idempotence
        "es.batch.size.entries": str(batch_entries),
        "es.batch.write.retry.count": str(retry_count),
    }
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def write_es(df: DataFrame, **options: str) -> None:
    """Bulk-upsert a batch into ES. Requires the es-hadoop jar."""
    try:
        df.write.format(ES_FORMAT).options(**options).mode("append").save()
    except Exception as e:  # connector jar absent in this container
        raise RuntimeError(
            "elasticsearch-hadoop connector unavailable; use "
            "streaming.sink.upsert_keyed_parquet as the keyed-sink "
            "stand-in (same idempotence contract)"
        ) from e

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
from pyspark.sql.types import ArrayType, DataType, DoubleType, FloatType, StructType

ES_FORMAT = "org.elasticsearch.spark.sql"

# The reference's ru+en analyzer block, shared verbatim by all three
# index schemas (movies/persons/genres.es.schema.json settings.analysis
# — standard tokenizer, lowercase, en+ru stop + snowball stemmers).
RU_EN_ANALYSIS = {
    "filter": {
        "english_stop": {"type": "stop", "stopwords": "_english_"},
        "english_stemmer": {"type": "stemmer", "language": "english"},
        "english_possessive_stemmer": {
            "type": "stemmer",
            "language": "possessive_english",
        },
        "russian_stop": {"type": "stop", "stopwords": "_russian_"},
        "russian_stemmer": {"type": "stemmer", "language": "russian"},
    },
    "analyzer": {
        "ru_en": {
            "tokenizer": "standard",
            "filter": [
                "lowercase",
                "english_stop",
                "english_stemmer",
                "english_possessive_stemmer",
                "russian_stop",
                "russian_stemmer",
            ],
        }
    },
}


def _es_field(name: str, dt: DataType, analyzer: str, raw_fields) -> dict:
    if name == "id":
        return {"type": "keyword"}
    if isinstance(dt, (DoubleType, FloatType)):
        return {"type": "float"}
    if isinstance(dt, ArrayType):
        if isinstance(dt.elementType, StructType):
            return {
                "type": "nested",
                "dynamic": "strict",
                "properties": es_index_properties(dt.elementType, analyzer, ()),
            }
        dt = dt.elementType  # ES arrays are implicit — map the element
    out = {"type": "text", "analyzer": analyzer}
    if name in raw_fields:
        out["fields"] = {"raw": {"type": "keyword"}}
    return out


def es_index_properties(
    schema: StructType, analyzer: str = "ru_en", raw_fields: tuple[str, ...] = ()
) -> dict:
    """ES mapping properties DERIVED from the Spark StructType — the
    gold schema is the single source of truth instead of a third
    hand-maintained copy (the reference keeps SQL DDL, Django models,
    pydantic models AND ES mapping JSONs in agreement by hand;
    SURVEY.md §1.2). Rules: ``id`` → keyword; float/double → float;
    array<struct> → strict nested; strings (and string arrays) → text
    with the analyzer, plus a ``raw`` keyword subfield for fields the
    API sorts on."""
    return {
        f.name: _es_field(f.name, f.dataType, analyzer, raw_fields)
        for f in schema.fields
    }


def es_index_payload(
    schema: StructType,
    raw_fields: tuple[str, ...] = (),
    refresh_interval: str = "1s",
) -> dict:
    """Full PUT-index body (settings + strict mappings) — what
    ``run.sh:25-29`` curls from the three ``*.es.schema.json`` files,
    rebuilt from the StructType registry."""
    return {
        "settings": {
            "refresh_interval": refresh_interval,
            "analysis": RU_EN_ANALYSIS,
        },
        "mappings": {
            "dynamic": "strict",
            "properties": es_index_properties(schema, raw_fields=raw_fields),
        },
    }


def index_bootstrap_payloads() -> dict[str, dict]:
    """index name → PUT body for the three gold indexes (S7's second
    half: DDL bootstrap for the search side)."""
    from etl_sprint_2_5_spark.schemas import GENRES_GOLD, MOVIES_GOLD, PERSONS_GOLD

    return {
        "movies": es_index_payload(MOVIES_GOLD, raw_fields=("title",)),
        "persons": es_index_payload(
            PERSONS_GOLD, raw_fields=("full_name", "film_ids", "roles")
        ),
        "genres": es_index_payload(GENRES_GOLD, raw_fields=("name",)),
    }


def es_options(
    nodes: str,
    index: str,
    mapping_id: str = "id",
    batch_entries: int = 1000,
    retry_count: int = 3,
    auto_create: bool = True,
    **extra: str,
) -> dict[str, str]:
    """Connector options mirroring the reference's bulk config:
    batch size (daemon.py:399-400,424) and retries (utils.py:19-53,
    bounded here — unbounded retry on a cluster wedges executors).
    Pass ``auto_create=False`` when the index was bootstrapped with
    ``index_bootstrap_payloads`` (strict mappings + analyzers must
    exist BEFORE the first write, or ES would auto-create a dynamic
    index without the ru_en analyzer)."""
    opts = {
        "es.nodes": nodes,
        "es.resource": index,
        "es.mapping.id": mapping_id,
        "es.write.operation": "index",  # overwrite-by-id == T3 idempotence
        "es.batch.size.entries": str(batch_entries),
        "es.batch.write.retry.count": str(retry_count),
        "es.index.auto.create": "true" if auto_create else "false",
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

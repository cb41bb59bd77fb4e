"""Connector option-builder tests (JDBC source / ES sink). The live
paths need driver jars absent from this container; the option maps and
remote-side keyset subquery are the testable logic."""

from __future__ import annotations

import pytest

from etl_sprint_2_5_spark.sources.jdbc import jdbc_options, keyset_subquery
from etl_sprint_2_5_spark.streaming.es_sink import es_options, write_es


def test_jdbc_parallel_options():
    opts = jdbc_options(
        "jdbc:postgresql://db/movies",
        "content.film_work",
        partition_column="updated_at",
        lower_bound="2020-01-01",
        upper_bound="2026-01-01",
        num_partitions=64,
    )
    assert opts["numPartitions"] == "64"
    assert opts["partitionColumn"] == "updated_at"
    assert opts["fetchsize"] == "10000"


def test_jdbc_partition_requires_bounds():
    with pytest.raises(ValueError):
        jdbc_options("jdbc:x", "t", partition_column="id")


def test_keyset_subquery_matches_reference_shape():
    q = keyset_subquery("film_work", "updated_at", "id", "2024-01-01", "abc", 1000)
    assert "(updated_at = '2024-01-01' AND id > 'abc')" in q
    assert "OR updated_at > '2024-01-01'" in q
    assert "ORDER BY updated_at, id LIMIT 1000" in q


def test_es_options_idempotent_upsert():
    opts = es_options("es:9200", "movies", mapping_id="id")
    assert opts["es.mapping.id"] == "id"
    assert opts["es.write.operation"] == "index"
    assert opts["es.batch.size.entries"] == "1000"


def test_write_es_raises_clear_error_without_connector(spark):
    df = spark.createDataFrame([("a",)], ["id"])
    with pytest.raises(RuntimeError, match="upsert_keyed_parquet"):
        write_es(df, **es_options("localhost:9200", "t"))


def test_index_bootstrap_payloads_match_reference_schemas():
    """S7 search-side DDL: the StructType-derived PUT bodies must equal
    the reference's three *.es.schema.json files (run.sh:25-29) —
    checked against the files when the reference tree is present, and
    against embedded invariants always (so the repo stays standalone)."""
    import json
    import os

    from etl_sprint_2_5_spark.streaming.es_sink import index_bootstrap_payloads

    payloads = index_bootstrap_payloads()
    assert set(payloads) == {"movies", "persons", "genres"}

    for name, body in payloads.items():
        assert body["mappings"]["dynamic"] == "strict"
        an = body["settings"]["analysis"]["analyzer"]["ru_en"]
        assert an["filter"][:2] == ["lowercase", "english_stop"]
        assert "russian_stemmer" in an["filter"]
        assert body["settings"]["refresh_interval"] == "1s"
        assert body["mappings"]["properties"]["id"] == {"type": "keyword"}

    m = payloads["movies"]["mappings"]["properties"]
    assert m["title"] == {
        "type": "text", "analyzer": "ru_en",
        "fields": {"raw": {"type": "keyword"}},
    }
    assert m["imdb_rating"] == {"type": "float"}
    assert m["actors"] == {
        "type": "nested", "dynamic": "strict",
        "properties": {
            "id": {"type": "keyword"},
            "name": {"type": "text", "analyzer": "ru_en"},
        },
    }

    ref = "/root/reference"
    if os.path.isdir(ref):  # full byte-parity when the reference exists
        for name in payloads:
            want = json.load(open(f"{ref}/{name}.es.schema.json"))
            assert payloads[name] == want, name


def test_es_options_auto_create_gate():
    from etl_sprint_2_5_spark.streaming.es_sink import es_options

    assert es_options("es:9200", "movies")["es.index.auto.create"] == "true"
    assert (
        es_options("es:9200", "movies", auto_create=False)["es.index.auto.create"]
        == "false"
    )

"""Avro OCF codec (operators/avro_ocf.py): spec round-trips, the
split-read contract, and cross-implementation conformance against the
Apache Java avro library that ships in pyspark's JVM classpath
(avro-1.12.1.jar) — the reference implementation reads our files and
we read its."""

from __future__ import annotations

import json
import struct

import pytest

from etl_sprint_2_5_spark.operators.avro_ocf import (
    avro_schema_of,
    read_ocf,
    read_ocf_range,
    write_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "txt", "type": ["null", "string"]},
        {"name": "v", "type": {"type": "array", "items": "float"}},
        {"name": "d", "type": "double"},
        {"name": "b", "type": ["null", "bytes"]},
        {"name": "ok", "type": "boolean"},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ],
}


def _f32(x: float) -> float:
    return struct.unpack("<f", struct.pack("<f", x))[0]


def _rows(n: int) -> list[dict]:
    return [
        {
            "id": i * (-1) ** i,
            "txt": None if i % 3 == 0 else f'héllo\n"{i}" ',
            "v": [float(i), 0.5, -1.25],
            "d": i / 7.0,
            "b": None if i % 4 else bytes([i % 256, 0xFF, 0x00]),
            "ok": i % 2 == 0,
            "m": {"a": i, "b": -i},
        }
        for i in range(n)
    ]


def _expected(rows: list[dict]) -> list[dict]:
    return [dict(r, v=[_f32(x) for x in r["v"]]) for r in rows]


def test_roundtrip_all_types_deflate_and_null_codec():
    rows = _rows(500)
    for codec in ("deflate", "null"):
        data = write_ocf(rows, SCHEMA, codec=codec, block_rows=64)
        schema, back = read_ocf(data)
        assert schema == SCHEMA
        assert back == _expected(rows)


def test_long_boundaries_and_range_check():
    s = {"type": "record", "name": "x", "fields": [{"name": "n", "type": "long"}]}
    vals = [0, -1, 1, 63, -64, 2**63 - 1, -(2**63), 12345678901234]
    data = write_ocf([{"n": v} for v in vals], s)
    assert [r["n"] for r in read_ocf(data)[1]] == vals
    with pytest.raises(ValueError, match="int64"):
        write_ocf([{"n": 2**63}], s)
    with pytest.raises(ValueError, match="int64"):
        write_ocf([{"n": -(2**63) - 1}], s)


def test_split_reads_partition_rows_exactly():
    """Hadoop-input-split contract: touching byte ranges — including
    cuts in the middle of a block, inside the header, and one byte
    past a sync — read every row exactly once."""
    rows = _rows(400)
    data = write_ocf(rows, SCHEMA, block_rows=37)
    exp = _expected(rows)
    n = len(data)
    assert read_ocf_range(data, 0, n) == exp
    for cuts in [
        (0, n // 3, 2 * n // 3, n),
        (0, 1, 17, 18, n),
        (0, n // 2, n // 2 + 1, n),
        (0, 4, 100, 101, 5000, n - 1, n),
    ]:
        got = []
        for a, b in zip(cuts, cuts[1:]):
            got += read_ocf_range(data, a, b)
        assert got == exp, f"cuts {cuts}: {len(got)} rows"
    # empty / out-of-data ranges read nothing
    assert read_ocf_range(data, n, n + 10) == []


def test_corrupt_inputs_quarantine():
    rows = _rows(10)
    data = write_ocf(rows, SCHEMA, block_rows=4)
    with pytest.raises(ValueError, match="not an Avro"):
        read_ocf(b"PK\x03\x04" + data[4:])
    # flip a byte inside a deflate block payload: either the codec or
    # the trailing-sync check must raise, never silent wrong rows
    bad = bytearray(data)
    bad[len(data) // 2] ^= 0xFF
    with pytest.raises((ValueError, Exception)):
        read_ocf(bytes(bad))
    with pytest.raises(NotImplementedError, match="codec"):
        write_ocf(rows, SCHEMA, codec="snappy")


def test_avro_schema_of_spark_schema(spark):
    from pyspark.sql import types as T

    st = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.ArrayType(T.FloatType(), False), True),
        ]
    )
    s = avro_schema_of(st)
    assert s["fields"][0]["type"] == "long"
    assert s["fields"][1]["type"] == ["null", "string"]
    assert s["fields"][2]["type"] == [
        "null",
        {"type": "array", "items": "float"},
    ]
    with pytest.raises(NotImplementedError):
        avro_schema_of(
            T.StructType([T.StructField("x", T.DecimalType(10, 2), True)])
        )


def test_java_reference_implementation_reads_python_files(spark, tmp_path):
    """Conformance vs Apache's own reader (avro-1.12.1.jar on the
    session's JVM classpath): our writer's files decode identically
    through org.apache.avro.file.DataFileReader."""
    jvm = spark._jvm
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "txt", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
        ],
    }
    rows = [
        {"id": i, "txt": None if i % 3 == 0 else f'x"{i}"é', "d": i / 3.0}
        for i in range(100)
    ]
    p = tmp_path / "py.avro"
    p.write_bytes(write_ocf(rows, schema, block_rows=16))
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(str(p)),
        jvm.org.apache.avro.generic.GenericDatumReader(jschema),
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        txt = rec.get("txt")
        got.append((rec.get("id"), None if txt is None else str(txt), rec.get("d")))
    dfr.close()
    assert got == [(r["id"], r["txt"], r["d"]) for r in rows]


def test_python_reads_java_reference_files(spark, tmp_path):
    jvm = spark._jvm
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "txt", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
        ],
    }
    rows = [
        {"id": i, "txt": None if i % 3 == 0 else f'x"{i}"é', "d": i / 3.0}
        for i in range(100)
    ]
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p = tmp_path / "java.avro"
    w.create(jschema, jvm.java.io.File(str(p)))
    for r in rows:
        gr = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        gr.put("id", r["id"])
        gr.put("txt", r["txt"])
        gr.put("d", r["d"])
        w.append(gr)
    w.close()
    _, back = read_ocf(p.read_bytes())
    assert [(r["id"], r["txt"], r["d"]) for r in back] == [
        (r["id"], r["txt"], r["d"]) for r in rows
    ]
    # and the split reader agrees on the JAVA-written file (random
    # sync marker, not ours) for an arbitrary two-way cut
    data = p.read_bytes()
    mid = len(data) // 2
    assert read_ocf_range(data, 0, mid) + read_ocf_range(data, mid, len(data)) == back


def test_empty_file_and_empty_partition_shape():
    """A zero-record OCF (what an empty shuffle partition writes) is
    a header + sync with no blocks: whole-file and range reads both
    return [] rather than raising."""
    data = write_ocf([], SCHEMA, block_rows=8)
    schema, rows = read_ocf(data)
    assert schema == SCHEMA and rows == []
    assert read_ocf_range(data, 0, len(data)) == []
    assert read_ocf_range(data, len(data) // 2, len(data)) == []

"""Randomized (seeded, deterministic) property tests for the sketch
family over ARBITRARY inputs, each checked against an INDEPENDENT
pure-python witness that re-derives the sketch from hashlib.md5 —
proving the Spark expression trees (conv/substring/md5, shiftright,
length(bin()), posexplode buckets) compute exactly the algorithm the
docstrings claim, not merely something self-consistent:

- HLL registers: Spark == python witness cell-for-cell; invariant
  under duplication and input order; harmonic sum bound holds.
- DD buckets: every value's bucket interval contains it and is at
  most a quarter of its lower bound (the 12.5% midpoint bound).
- CMS cells: Spark == python witness cell-for-cell; point estimates
  never undercount.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    dd_build,
    hll_build,
    hll_estimate,
)


def _h60(salt: str, key: str) -> int:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16)


def _hll_witness(keys, b: int) -> dict[int, int]:
    m, w_bits = 1 << b, 60 - b
    regs: dict[int, int] = {}
    for k in keys:
        h = _h60("hll-v1", str(k))
        bucket, w = h & (m - 1), h >> b
        rho = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_registers_match_python_witness(spark):
    rng = random.Random(20260815)
    keys = [rng.randrange(10**12) for _ in range(5000)]
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    got = {
        r["bucket"]: r["reg"] for r in hll_build(df, "key", b=7).collect()
    }
    assert got == _hll_witness(keys, 7)


def test_hll_registers_duplication_and_order_invariant(spark):
    rng = random.Random(7)
    keys = [rng.randrange(10**9) for _ in range(800)]
    shuffled = keys[::-1] + keys + [keys[0]] * 50
    a = spark.createDataFrame([(k,) for k in keys], "key long")
    b = spark.createDataFrame([(k,) for k in shuffled], "key long")
    ra = {r["bucket"]: r["reg"] for r in hll_build(a, "key", b=6).collect()}
    rb = {r["bucket"]: r["reg"] for r in hll_build(b, "key", b=6).collect()}
    assert ra == rb


def test_hll_harmonic_sum_bound_random(spark):
    rng = random.Random(99)
    for n in (1, 17, 3000):
        keys = [rng.randrange(10**15) for _ in range(n)]
        df = spark.createDataFrame([(k,) for k in keys], "key long")
        row = hll_estimate(hll_build(df, "key", b=6), (), b=6).collect()[0]
        assert 0 < row["harmonic_num"] <= 1 << 61


def test_dd_bucket_interval_property_random(spark):
    rng = random.Random(20260815)
    vals = sorted(
        {rng.randrange(0, 1 << 62) for _ in range(3000)}
        | {0, 1, 2, 3, (1 << 62) - 1}
    )
    df = spark.createDataFrame(
        [(v,) for v in vals], "v long"
    ).select("v", F.col("v").alias("orig"))
    for r in dd_build(df, "v", group_cols=("orig",)).collect():
        v, bid = r["orig"], r["bucket_id"]
        if bid < 4:
            lower, width = bid, 1
        else:
            blen, sub = bid >> 2, bid & 3
            lower, width = (4 | sub) << (blen - 3), 1 << (blen - 3)
        assert lower <= v < lower + width, (v, bid)
        assert bid < 4 or width * 4 <= lower, (v, bid)


def test_cms_cells_match_python_witness(spark):
    rng = random.Random(42)
    keys = [str(rng.randrange(50)) for _ in range(4000)]
    width, depth = 256, 3
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {
        (r["row"], r["bucket"]): r["n"]
        for r in cms_build(df, "key", width=width, depth=depth).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for k in keys:
        for d in range(depth):
            cell = (d, _h60("cms-v1", f"{d}:{k}") % width)
            want[cell] = want.get(cell, 0) + 1
    assert got == want
    # and point estimates never undercount the true multiplicities
    truth: dict[str, int] = {}
    for k in keys:
        truth[k] = truth.get(k, 0) + 1
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(
            cms_build(df, "key", width=width, depth=depth),
            df.select("key").distinct(),
            "key",
            width=width,
            depth=depth,
        ).collect()
    }
    for k, n in truth.items():
        assert est[k] >= n

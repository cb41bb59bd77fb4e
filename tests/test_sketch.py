"""Count-min sketch: no undercount, bounded overcount, mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)

W, D = 512, 4


def _zipfish(spark, n_rows: int, offset: int = 0):
    # key k appears ~ n_rows/(k+1) times — a deterministic heavy tail
    return (
        spark.range(offset, offset + n_rows)
        .select((F.col("id") % 50).alias("grp"), F.col("id"))
        .select(
            F.when(F.col("grp") < 25, F.lit(0))
            .when(F.col("grp") < 37, F.lit(1))
            .when(F.col("grp") < 44, F.lit(2))
            .otherwise(F.col("grp"))
            .cast("string")
            .alias("key")
        )
    )


def test_cms_never_undercounts_and_bounds_overcount(spark):
    data = _zipfish(spark, 20_000)
    truth = {
        r["key"]: r["n"]
        for r in data.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sketch = cms_build(data, "key", width=W, depth=D)
    keys = data.select("key").distinct()
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(sketch, keys, "key", width=W, depth=D).collect()
    }
    n_total = sum(truth.values())
    for k, true_n in truth.items():
        assert est[k] >= true_n, (k, est[k], true_n)
        # standard bound e/width * N, with generous slack for depth=4
        assert est[k] - true_n <= 3 * n_total / W, (k, est[k], true_n)


def test_cms_merge_equals_single_build(spark):
    a, b = _zipfish(spark, 5_000), _zipfish(spark, 5_000, offset=5_000)
    merged = cms_merge(
        cms_build(a, "key", width=W, depth=D),
        cms_build(b, "key", width=W, depth=D),
    )
    single = cms_build(a.unionByName(b), "key", width=W, depth=D)
    lhs = {(r["row"], r["bucket"]): r["n"] for r in merged.collect()}
    rhs = {(r["row"], r["bucket"]): r["n"] for r in single.collect()}
    assert lhs == rhs


def test_cms_unseen_key_estimates_small(spark):
    data = _zipfish(spark, 10_000)
    sketch = cms_build(data, "key", width=W, depth=D)
    unseen = spark.createDataFrame([("never-seen-key",)], "key string")
    est = cms_estimate(sketch, unseen, "key", width=W, depth=D).first()
    assert est["est_count"] <= 3 * 10_000 / W


# --- HyperLogLog ------------------------------------------------------

from etl_sprint_2_5_spark.operators.sketch import (  # noqa: E402
    hll_build,
    hll_estimate,
    hll_merge,
)


def _distinct_ids(spark, n: int, offset: int = 0):
    # n distinct keys, each duplicated 3x (dups must not move registers)
    return (
        spark.range(offset, offset + n)
        .select(F.col("id").cast("string").alias("key"))
        .unionAll(
            spark.range(offset, offset + n)
            .select(F.col("id").cast("string").alias("key"))
        )
        .unionAll(
            spark.range(offset, offset + n)
            .select(F.col("id").cast("string").alias("key"))
        )
    )


def test_hll_accuracy_normal_branch(spark):
    # m=1024 -> rse ~3.25%; 20k distinct is deep in the raw-estimate
    # branch. Assert within 4*rse.
    data = _distinct_ids(spark, 20_000)
    regs = hll_build(data, "key", b=10)
    row = hll_estimate(regs, (), b=10).collect()[0]
    est = row["est_milli"] / 1e3
    assert abs(est / 20_000 - 1.0) < 4 * 1.04 / (1 << 5), est


def test_hll_small_range_branch(spark):
    # 40 distinct with m=256 -> raw estimate <= 2.5m with zero
    # registers -> linear-counting branch; ln-based answer is tight
    # at this load factor.
    data = _distinct_ids(spark, 40)
    row = hll_estimate(hll_build(data, "key", b=8), (), b=8).collect()[0]
    assert row["n_zero_regs"] > 0
    est = row["est_milli"] / 1e3
    assert abs(est / 40 - 1.0) < 0.2, est


def test_hll_merge_equals_single_build(spark):
    # overlapping slices: union semantics, not addition
    a = _distinct_ids(spark, 3_000)
    b = _distinct_ids(spark, 3_000, offset=1_500)  # 1.5k overlap
    merged = hll_merge(hll_build(a, "key", b=8), hll_build(b, "key", b=8))
    single = hll_build(a.unionByName(b), "key", b=8)
    lhs = {(r["bucket"]): r["reg"] for r in merged.collect()}
    rhs = {(r["bucket"]): r["reg"] for r in single.collect()}
    assert lhs == rhs
    # and the merged estimate reflects the 4.5k distinct union
    row = hll_estimate(merged, (), b=8).collect()[0]
    assert abs(row["est_milli"] / 1e3 / 4_500 - 1.0) < 4 * 1.04 / 16


def test_hll_harmonic_num_exact_bound(spark):
    """The estimator's int64 harmonic sum is EXACT, not approximate:
    an empty slice hits m·2^(W+1) = 2^61 (b=6) on the nose with est 0,
    and a populated sketch reproduces Σ 2^(W+1−reg) + zeros·2^(W+1)
    recomputed independently in python from the registers."""
    b, m, wmax = 6, 64, 55  # wmax = 60 - b + 1
    empty = spark.createDataFrame([], "key string")
    row = hll_estimate(hll_build(empty, "key", b=b), (), b=b).collect()[0]
    assert row["n_zero_regs"] == m
    assert row["harmonic_num"] == 1 << 61  # the documented empty value
    assert row["est_milli"] == 0

    data = _distinct_ids(spark, 100)
    regs = hll_build(data, "key", b=b)
    by_bucket = {r["bucket"]: r["reg"] for r in regs.collect()}
    expect = sum(1 << (wmax - reg) for reg in by_bucket.values()) + (
        m - len(by_bucket)
    ) * (1 << wmax)
    row = hll_estimate(regs, (), b=b).collect()[0]
    assert row["harmonic_num"] == expect
    assert row["n_zero_regs"] == m - len(by_bucket)
    assert 0 < row["harmonic_num"] < (1 << 61)


def test_hll_small_range_table_is_integer_exact():
    """The small-range branch is a precomputed integer table shared
    verbatim between the Spark plan and the oracle SQL — V=m maps to
    0 (ln 1), V=1 to floor(m·ln(m)·1000+0.5), and the SQL CASE text
    embeds exactly these constants (no ln() anywhere in the gate)."""
    import math

    from etl_sprint_2_5_spark.operators.sketch import (
        hll_est_milli_sql,
        hll_small_milli,
    )

    m = 64
    tbl = hll_small_milli(m)
    assert len(tbl) == m
    assert tbl[m - 1] == 0
    assert tbl[0] == int(math.floor(m * math.log(m) * 1000 + 0.5))
    assert all(tbl[i] > tbl[i + 1] for i in range(m - 1))  # monotone
    sql = hll_est_milli_sql(6)
    assert "ln(" not in sql and "log(" not in sql
    assert f"WHEN 1 THEN CAST({tbl[0]} AS BIGINT)" in sql
    assert f"WHEN {m} THEN CAST(0 AS BIGINT)" in sql


def test_cms_inner_product_disjoint_is_zero(spark):
    """Disjoint key sets must estimate 0, not NULL — and a depth row
    with no overlapping bucket participates in the min as dot 0
    instead of being dropped by the join (round-8 ADVICE)."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(20)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(20)], "key string")
    est = cms_inner_product(
        cms_build(a, "key", width=W, depth=D),
        cms_build(b, "key", width=W, depth=D),
    ).collect()[0]["est_join_size"]
    # width 1024 over 20+20 keys: some bucket collision per row is
    # possible but at least one of the D rows is collision-free with
    # overwhelming probability -> min = 0; the hashes are fixed, so
    # this is deterministic, not flaky
    assert est == 0


# --- DDSketch-style integer quantile sketch ---------------------------

from etl_sprint_2_5_spark.operators.sketch import (  # noqa: E402
    dd_build,
    dd_merge,
    dd_quantile,
)


def test_dd_quantile_relative_error_bound(spark):
    # uniform 1..10000: every quantile estimate must be within the
    # 12.5% midpoint bound of the true order statistic
    df = spark.range(1, 10_001).select(F.col("id").alias("v"))
    sk = dd_build(df, "v")
    for r in dd_quantile(sk, (100, 500, 900, 990)).collect():
        true_v = r["rank_k"]  # uniform 1..N: k-th smallest == k
        est = r["est_milli"] / 1e3
        assert abs(est / true_v - 1.0) <= 0.125 + 1e-9, (r, est, true_v)


def test_dd_merge_equals_single_build(spark):
    df = spark.range(1, 5_001).select(F.col("id").alias("v"))
    a = dd_build(df.where(F.col("v") % 2 == 0), "v")
    b = dd_build(df.where(F.col("v") % 2 == 1), "v")
    merged = {r["bucket_id"]: r["n"] for r in dd_merge(a, b).collect()}
    single = {r["bucket_id"]: r["n"] for r in dd_build(df, "v").collect()}
    assert merged == single


def test_dd_small_values_exact(spark):
    # values < 4 get their own bucket: quantiles over tiny ints are
    # EXACT (est_milli == 1000*v, width contribution 0)
    df = spark.createDataFrame([(v,) for v in [0, 1, 1, 2, 3, 3, 3]], "v long")
    rows = dd_quantile(dd_build(df, "v"), (500,)).collect()
    assert rows[0]["est_milli"] == 2000  # median of the 7 values is 2


def test_dd_bucket_count_is_bounded(spark):
    # whole int32 range of values -> still < 4*32 + 4 buckets
    df = spark.range(1, 2_000_000, 97).select(F.col("id").alias("v"))
    assert dd_build(df, "v").count() < 132


# --- CMS inner product (join-size estimation) -------------------------

from etl_sprint_2_5_spark.operators.sketch import cms_inner_product  # noqa: E402


def test_cms_inner_product_never_undercounts(spark):
    # two key streams with known join size sum(n_a(k)*n_b(k))
    a = _zipfish(spark, 10_000)
    b = _zipfish(spark, 4_000)
    na = {r["key"]: r["n"] for r in a.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    nb = {r["key"]: r["n"] for r in b.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    true_join = sum(na[k] * nb.get(k, 0) for k in na)
    est = cms_inner_product(
        cms_build(a, "key", width=W, depth=D),
        cms_build(b, "key", width=W, depth=D),
    ).collect()[0]["est_join_size"]
    assert est >= true_join
    # collision overcount bound: N_a*N_b/width per row, min over depth
    assert est - true_join <= 3 * (10_000 * 4_000) // W


def test_dd_bucket_roundtrip_contains_value(spark):
    # every value must land in a bucket whose [lower, lower+width)
    # contains it — exhaustive over small ints, plus adversarial
    # powers of two and huge values
    vals = (
        list(range(0, 4096))
        + [(1 << k) + d for k in range(12, 62) for d in (-1, 0, 1)]
        + [(1 << 62) + 12345, (1 << 63) - 1]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = dd_build(df.select("v", F.col("v").alias("orig")), "v", group_cols=("orig",))
    rows = sk.collect()
    assert len(rows) == len(set(vals))
    for r in rows:
        v, bid = r["orig"], r["bucket_id"]
        if bid < 4:
            lower, width = bid, 1
        else:
            blen, sub = bid >> 2, bid & 3
            lower = (4 | sub) << (blen - 3)
            width = 1 << (blen - 3)
        assert lower <= v < lower + width, (v, bid, lower, width)
        # width ≤ lower/4 ⇒ midpoint error ≤ width/2/lower ≤ 12.5%
        assert width * 4 <= lower or bid < 4, (v, bid)


# --- KMV / theta sketch (set algebra) ----------------------------------

from etl_sprint_2_5_spark.operators.sketch import (  # noqa: E402
    _KMV_M,
    kmv_build,
    kmv_merge,
    kmv_set_estimates,
)


def _keys(spark, n, off=0):
    return spark.range(off, off + n).select(
        F.concat(F.lit("u"), F.col("id")).alias("k")
    )


def test_kmv_merge_equals_direct_build(spark):
    """Bottom-k of two bottom-k samples == bottom-k of the union —
    exact hash-for-hash (the partial-aggregate property)."""
    a, b = _keys(spark, 5_000), _keys(spark, 5_000, off=2_500)
    m = sorted(r.hv for r in kmv_merge(
        kmv_build(a, "k", 128), kmv_build(b, "k", 128), 128).collect())
    d = sorted(r.hv for r in kmv_build(a.unionByName(b), "k", 128).collect())
    assert m == d and len(m) == 128


def test_kmv_set_estimates_error_bound(spark):
    """20k/15k sets with 10k overlap, k=256: every estimate within
    4/sqrt(k) = 25% of truth (deterministic hashes — not flaky)."""
    a, b = _keys(spark, 20_000), _keys(spark, 15_000, off=10_000)
    r = kmv_set_estimates(
        kmv_build(a, "k", 256), kmv_build(b, "k", 256), k=256
    ).collect()[0]
    for est, true in [
        (r.a_est_milli, 20_000), (r.b_est_milli, 15_000),
        (r.union_est_milli, 25_000), (r.inter_est_milli, 10_000),
        (r.a_not_b_est_milli, 10_000), (r.b_not_a_est_milli, 5_000),
    ]:
        assert abs(est / 1e3 / true - 1.0) < 0.25, (est, true)


def test_kmv_exact_mode_below_k(spark):
    """Sets smaller than k: θ = M and every estimate is EXACT."""
    a, b = _keys(spark, 100), _keys(spark, 80, off=50)
    r = kmv_set_estimates(kmv_build(a, "k"), kmv_build(b, "k")).collect()[0]
    assert r.theta == _KMV_M
    assert (r.a_est_milli, r.b_est_milli) == (100_000, 80_000)
    assert (r.inter_est_milli, r.a_not_b_est_milli, r.b_not_a_est_milli) == (
        50_000, 50_000, 30_000)


def test_kmv_disjoint_and_identical(spark):
    """Disjoint sets: intersection estimates 0; identical sets: the
    differences estimate 0 and A==B==A∩B (sample-level identities that
    hold EXACTLY, not just in expectation, because both sketches see
    the same hashes)."""
    a = _keys(spark, 10_000)
    b = _keys(spark, 10_000, off=50_000)
    r = kmv_set_estimates(
        kmv_build(a, "k", 128), kmv_build(b, "k", 128), k=128
    ).collect()[0]
    assert r.inter_est_milli == 0 and r.n_inter == 0
    r2 = kmv_set_estimates(
        kmv_build(a, "k", 128), kmv_build(a, "k", 128), k=128
    ).collect()[0]
    assert r2.a_not_b_est_milli == 0 and r2.b_not_a_est_milli == 0
    assert r2.a_est_milli == r2.b_est_milli == r2.inter_est_milli


def test_kmv_empty_inputs_anchor_row(spark):
    """Both-empty input still yields exactly one all-zero row (the θ
    anchor), never an empty frame."""
    e = spark.createDataFrame([], "k string")
    rows = kmv_set_estimates(kmv_build(e, "k"), kmv_build(e, "k")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.theta == _KMV_M and r.a_est_milli == 0 and r.union_est_milli == 0


def test_dd_exact_rank_matches_full_sort_audit(spark):
    """dd_exact_rank (bucket-narrowed order statistic) must agree with
    the naive row_number audit for every quantile — on data designed
    to stress the seams: duplicate values straddling bucket
    boundaries, sub-4 identity buckets, single-value groups, and a
    rank that lands exactly on a bucket's first/last row."""
    import random

    from pyspark.sql import Window

    from etl_sprint_2_5_spark.operators.sketch import (
        dd_build,
        dd_exact_rank,
        dd_quantile,
    )

    rng = random.Random(41)
    rows = []
    # group a: heavy duplicates around powers of two (bucket edges)
    for _ in range(400):
        base = rng.choice([1, 2, 3, 4, 7, 8, 31, 32, 33, 1023, 1024])
        rows.append(("a", base))
    # group b: smooth spread
    rows += [("b", rng.randrange(1, 100_000)) for _ in range(500)]
    # group c: a single value (every quantile = that value)
    rows += [("c", 42)] * 7
    df = spark.createDataFrame(rows, "g string, c long")

    qs = (1, 250, 500, 900, 990, 1000)
    sk = dd_build(df, "c", group_cols=("g",))
    est = dd_quantile(sk, qs, group_cols=("g",))

    naive = df.select(
        "g",
        "c",
        F.row_number().over(Window.partitionBy("g").orderBy("c")).alias("rn"),
    )
    want = {
        (r.g, r.q_milli): r.c
        for r in est.join(
            naive,
            (F.col("rn") == F.col("rank_k")) & (naive["g"] == est["g"]),
        )
        .select(est["g"], "q_milli", "c")
        .collect()
    }
    got = {
        (r.g, r.q_milli): r.exact
        for r in dd_exact_rank(df, "c", est, sk, group_cols=("g",)).collect()
    }
    assert got == want
    assert len(got) == 3 * len(qs)


# ---------------------------------------------------------------- Misra-Gries


def test_mg_candidates_superset_guarantee_and_exact_total(spark):
    """Any item with global count > n/(capacity+1) MUST appear in the
    candidate set, for every partitioning (the deterministic MG
    guarantee — no false negatives); the piggybacked row count is
    exact; the candidate set stays bounded by capacity x tasks."""
    import random

    from etl_sprint_2_5_spark.operators.sketch import mg_candidates

    rng = random.Random(42)
    # Zipf-ish: item i appears ~ 3000/i times, plus a noise tail
    items = []
    for i in range(1, 40):
        items += [f"hh{i:02d}"] * (3000 // i)
    items += [f"tail{j}" for j in range(5000)]
    rng.shuffle(items)
    exact = {}
    for it in items:
        exact[it] = exact.get(it, 0) + 1

    df = spark.createDataFrame([(x,) for x in items], "word string")
    capacity = 16
    for parts in (1, 3, 8):
        cands, total = mg_candidates(
            df.repartition(parts), "word", capacity
        )
        assert total == len(items)
        heavy = {
            k for k, v in exact.items() if v * (capacity + 1) > total
        }
        assert heavy, "fixture must contain true heavy hitters"
        assert heavy <= set(cands), f"missed heavy hitters at {parts} parts"
        assert len(cands) <= capacity * parts


def test_mg_candidates_empty_and_all_distinct(spark):
    from etl_sprint_2_5_spark.operators.sketch import mg_candidates

    empty = spark.createDataFrame([], "word string")
    cands, total = mg_candidates(empty, "word", 8)
    assert cands == [] and total == 0

    distinct = spark.createDataFrame(
        [(f"w{i}",) for i in range(100)], "word string"
    ).repartition(4)
    cands, total = mg_candidates(distinct, "word", 8)
    assert total == 100
    # nothing exceeds n/9 -> guarantee is vacuous, but survivors stay
    # bounded and the exact pass-2 filter would return an empty set
    assert len(cands) <= 8 * 4

"""Scale-pattern tests: salted skew join equivalence, bucketed
shuffle-free joins, and physical-plan properties (pushdown, broadcast,
codegen) of headline queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.skew import salted_join
from etl_sprint_2_5_spark.sources.bucketed import bucketed_join, write_bucketed
from tests.conftest import SF_SMOKE


# --------------------------------------------------------- salted join


def test_salted_join_equals_plain_join(spark):
    # heavy skew: 90% of fact rows share key 0
    fact = spark.createDataFrame(
        [(i, 0 if i % 10 else i % 7) for i in range(2000)], ["row_id", "k"]
    )
    dim = spark.createDataFrame([(k, f"dim{k}") for k in range(7)], ["k", "label"])
    plain = fact.join(dim, "k").select("row_id", "k", "label")
    salted = salted_join(fact, dim, ["k"], "row_id", factor=8).select(
        "row_id", "k", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    fact = spark.createDataFrame([(1, 10), (2, 99)], ["row_id", "k"])
    dim = spark.createDataFrame([(10, "x")], ["k", "label"])
    got = {
        (r["row_id"], r["label"])
        for r in salted_join(fact, dim, ["k"], "row_id", factor=4, how="left").collect()
    }
    assert got == {(1, "x"), (2, None)}


def test_salt_is_deterministic(spark):
    from etl_sprint_2_5_spark.operators.skew import salt_fact

    df = spark.createDataFrame([(i,) for i in range(100)], ["row_id"])
    a = [r["_salt"] for r in salt_fact(df, "row_id", 8).orderBy("row_id").collect()]
    b = [r["_salt"] for r in salt_fact(df, "row_id", 8).orderBy("row_id").collect()]
    assert a == b and set(a) <= set(range(8))


# ------------------------------------------------------ bucketed joins


def test_bucketed_join_has_no_shuffle(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(o.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    write_bucketed(
        li.select("l_orderkey", "l_quantity").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    # at smoke scale the planner would rather broadcast than use the
    # buckets; disable broadcast to exercise the big-big join path the
    # bucketing exists for (1000-executor case: neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert "SortMergeJoin" in plan, plan
        expected = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ------------------------------------------------- plan-shape properties


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    from etl_sprint_2_5_spark.sources.parquet import load_table

    li = load_table(spark, "lineitem", SF_SMOKE)
    df = li.where(F.col("l_shipdate") <= "1998-09-02").select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark):
    from etl_sprint_2_5_spark.sources.parquet import load_table

    li = load_table(spark, "lineitem", SF_SMOKE)
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema  # untouched wide column pruned


def test_dim_join_is_broadcast(spark):
    from etl_sprint_2_5_spark import plans

    plans.load_all()
    df = plans.REGISTRY["top_revenue_orders"].fn(spark, SF_SMOKE)
    assert "BroadcastHashJoin" in _plan(df)


def test_whole_stage_codegen_active(spark):
    from etl_sprint_2_5_spark import plans

    plans.load_all()
    # AQE prints an unresolved AdaptiveSparkPlan wrapper before
    # execution, hiding codegen spans; disable it for the inspection
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = plans.REGISTRY["pricing_summary"].fn(spark, SF_SMOKE)
        # '*(n)' prefixes mark WholeStageCodegen stages in toString()
        plan = _plan(df)
        assert "*(1)" in plan and "*(3)" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_zorder_key_interleave_and_locality(spark):
    from etl_sprint_2_5_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(3, 1), (0, 0), (255, 255), (1, 0), (0, 1)], ["x", "y"]
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=8).alias("z")).collect()
    }

    def morton(x, y, bits=8):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z)
    # locality: all points in a 16x16 tile share their high z-bits
    tile = [(x, y) for x in range(16, 32) for y in range(48, 64)]
    zs = [morton(x, y) for x, y in tile]
    assert max(zs) - min(zs) < 16 * 16 * 4  # tile spans a bounded z range
    assert len(set(z >> 8 for z in zs)) == 1  # one 256-wide z block prefix


def test_spread_partitions_fans_out_small_scans(spark):
    """A tiny (single-partition) compute-heavy input must be fanned
    out to the session's parallelism; an already-parallel input must
    pass through untouched (no extra shuffle)."""
    from etl_sprint_2_5_spark.sources.parquet import spread_partitions

    small = spark.createDataFrame(
        [(i, "x" * 10) for i in range(100)], "doc_id bigint, text string"
    ).coalesce(1)
    spread = spread_partitions(small, "doc_id")
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert spread.count() == 100

    wide = small.repartition(spark.sparkContext.defaultParallelism * 2, "doc_id")
    assert spread_partitions(wide, "doc_id") is wide


def test_pagerank_edges_stationary_under_aqe(spark):
    """part_pagerank stages its edge list as a bucketed table on src
    (plans/graph_queries.py _stationary_edges), so the executed
    ADAPTIVE plan must read edges pre-partitioned from storage and
    keep at most 2 shuffle exchanges per power iteration (the rank
    exchange onto src + the aggregate exchange on dst) — the big
    operand is never re-exchanged. Guards the one plan the round-4
    verdict called out as not surviving a 100x scale-up."""
    import re

    from etl_sprint_2_5_spark import plans

    plans.load_all()
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = plans.REGISTRY["part_pagerank"].fn(spark, SF_SMOKE)
    df.collect()  # AQE finalizes the plan only on execution
    plan = _plan(df)
    assert "Bucketed: true" in plan, plan
    n_exchanges = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    # 3 iterations x 2 exchanges; anything above means the edge table
    # (or a degree re-join) is being re-shuffled per iteration
    assert n_exchanges <= 6, f"{n_exchanges} exchanges\n{plan}"


# ------------------------------------------- round-5 new-query plans


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def test_corpus_shuffle_plan_is_one_exchange(spark):
    """Epoch shuffle must cost exactly one shuffle (the partition-by-
    shard window); hash + shard assignment stay map-side."""
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY

    load_all()
    df = REGISTRY["corpus_shuffle_shards"].fn(spark, SF_SMOKE)
    # one Exchange for the per-shard window; the final orderBy of the
    # oracle-shaped output may add a rangepartitioning exchange
    assert _n_exchanges(df) <= 2


def test_countsketch_projection_is_mapside(spark):
    """The 64->16 projection must not introduce any exchange of the
    corpus: the only shuffles are the two per-query top-k windows."""
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY

    load_all()
    df = REGISTRY["ann_countsketch_topk"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # broadcast of the 8 queries, no corpus hash-exchange before the
    # candidate window
    assert "BroadcastExchange" in plan
    assert _n_exchanges(df) <= 4


def test_pq_adc_scan_reads_only_codes(spark, tmp_path, monkeypatch):
    """The PQ candidate scan must read the compressed index (vec_id +
    8-int codes), never the 64-float vectors: its scan's ReadSchema
    must not mention the embedding column, and the only exchange
    below the candidate cut is the per-query top-C window."""
    from etl_sprint_2_5_spark import artifacts
    from etl_sprint_2_5_spark.operators.pq import adc_topc

    monkeypatch.setenv(artifacts.ARTIFACT_DIR_ENV, str(tmp_path))
    cb, codes = artifacts.prepared_pq_index(spark, SF_SMOKE)
    q8 = artifacts.prepared_quantized_codes(spark, SF_SMOKE)
    from pyspark.sql import functions as F

    qq8 = q8.where(F.col("vec_id") < 8).select("vec_id", "qvec")
    cand = adc_topc(codes, cb, qq8, "vec_id", "qvec", 40)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "embedding" not in plan
    assert _n_exchanges(cand) <= 1


def test_line_dedup_single_hash_and_doc_exchanges(spark):
    """line_dedup_clean is linear: hash-MIN shuffle, keep join, doc
    reassembly — no pairwise expansion, bounded exchange count."""
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY

    load_all()
    df = REGISTRY["line_dedup_clean"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # hash agg + keep join + doc_id agg + outer join + final sort
    assert _n_exchanges(df) <= 7


def test_triangle_count_orientation_exact(spark, tmp_path):
    """Crafted K4-plus-hub graph for plans/graph_queries.triangle_count:
    K4 on parts 1-4 (each order pair duplicated so every edge clears
    the >=2 co-occurrence bar) has exactly 4 triangles — 3 per node —
    while a hub part co-ordered pairwise with 10 spokes contributes
    NO triangle despite the highest degree. Degree-ordered
    compact-forward must count each triangle exactly once (a naive
    per-pivot wedge count would triple-count) and route all wedge
    fan-out through the spokes, not the hub."""
    import etl_sprint_2_5_spark.plans.graph_queries  # noqa: F401 — registers
    from etl_sprint_2_5_spark.plans.registry import REGISTRY

    import datetime as dt

    pairs = []
    for ok in (101, 102):  # K4 twice -> all 6 edges have df 2
        pairs += [(ok, p) for p in (1, 2, 3, 4)]
    for i, spoke in enumerate(range(20, 30)):  # hub 10: pair orders only
        for ok in (200 + 2 * i, 201 + 2 * i):
            pairs += [(ok, 10), (ok, spoke)]
    rows = [
        (ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
        for ok, pk in pairs
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = [
        (r["part"], r["n_triangles"])
        for r in REGISTRY["triangle_count"].fn(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 3), (2, 3), (3, 3), (4, 3)], got


def test_partition_pruning_reaches_directory_level(spark, tmp_path):
    """partitioned_write_prune's claim the value hash can't see: an
    IN-list on the partition column must prune at PLANNING time — the
    executed scan reports exactly 2 of the 5 type directories, and
    the non-selected partitions contribute zero input files."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    data = f"{tmp_path}/data"
    ev.write.partitionBy("event_type").mode("overwrite").parquet(data)
    df = spark.read.parquet(data).where(
        F.col("event_type").isin("click", "purchase")
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    import re

    m = re.search(r"partition filters: \[?([^\]]*)", plan)
    # scan line reports the selected partition count
    m2 = re.search(r"(\d+) parts", plan)
    if m2:
        assert m2.group(1) == "2", plan
    else:
        # fall back: the two selected values appear in the scan's
        # partition filter expression
        assert "event_type" in plan.split("PartitionFilters")[1][:200], plan


def test_dynamic_overwrite_leaves_other_partitions_untouched(spark, tmp_path):
    """dynamic_partition_overwrite's claim beyond the hash: after the
    corrected 'click' batch lands in dynamic mode, the OTHER type
    directories still contain their ORIGINAL files (same names), and
    only click/ was rewritten — static mode would have truncated
    everything."""
    import os

    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    data = f"{tmp_path}/data"
    ev.write.partitionBy("event_type").mode("overwrite").parquet(data)

    def files(part):
        d = f"{data}/event_type={part}"
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        ) if os.path.isdir(d) else []

    before = {p: files(p) for p in ("click", "view", "purchase")}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        ev.where(F.col("event_type") == "click").withColumn(
            "value", F.col("value") * 2
        ).write.partitionBy("event_type").mode("overwrite").parquet(data)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = {p: files(p) for p in ("click", "view", "purchase")}
    assert after["view"] == before["view"] and before["view"], before
    assert after["purchase"] == before["purchase"] and before["purchase"]
    assert after["click"] != before["click"] and after["click"], after


def test_compaction_hits_binpack_bound(spark, tmp_path):
    """compact_small_files writes EXACTLY ceil(total/target) files in
    round-robin mode, never more in range mode, and loses no rows."""
    from pathlib import Path

    from etl_sprint_2_5_spark.operators.layout import (
        compact_small_files,
        compaction_file_bound,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    src = f"{tmp_path}/small"
    ev.repartition(16).write.mode("overwrite").parquet(src)
    total = sum(
        p.stat().st_size for p in Path(src).rglob("*.parquet") if p.is_file()
    )
    target = max(1, total // 3)
    bound = compaction_file_bound(total, target)

    # round-robin: exact bound
    n_out, n_in = compact_small_files(spark, src, f"{tmp_path}/rr", target)
    assert n_in == 16
    assert n_out == bound
    assert spark.read.parquet(f"{tmp_path}/rr").count() == ev.count()

    # range mode on a high-cardinality key: also exact, and sorted
    n_out2, _ = compact_small_files(
        spark, src, f"{tmp_path}/rg", target, order_by=["event_id"]
    )
    assert n_out2 <= bound
    back = spark.read.parquet(f"{tmp_path}/rg")
    assert back.count() == ev.count()

    # range mode on a LOW-cardinality key may undershoot, never overshoot
    n_out3, _ = compact_small_files(
        spark, src, f"{tmp_path}/lc", target, order_by=["event_type"]
    )
    assert n_out3 <= bound


def test_bucketed_colocated_join_query_has_no_join_exchange(spark):
    """The registered bucketed_colocated_join query's executed plan:
    SortMergeJoin over TWO bucketed scans with no Exchange anywhere
    below the join — the pay-the-shuffle-once-at-write-time layout."""
    from etl_sprint_2_5_spark.plans import REGISTRY, load_all

    load_all()
    df = REGISTRY["bucketed_colocated_join"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    join_subtree = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning" not in join_subtree, plan


# ------------------------------------------- capped basket edge builder


def test_basket_pair_cap_does_not_bind_at_gate_scale(spark):
    """basket_pair_counts' max_basket is a 100-TB skew guard, NOT a
    semantic knob: at gate scale factors the largest basket must sit
    orders of magnitude below the cap (the DuckDB oracles expand
    baskets uncapped, so a binding cap would diverge the gate), and
    the capped build must equal the uncapped one bit-for-bit."""
    from etl_sprint_2_5_spark.plans.graph_queries import (
        _MAX_BASKET,
        basket_pair_counts,
        copurchase_edges,
    )
    from etl_sprint_2_5_spark.sources.parquet import load_table

    li = load_table(spark, "lineitem", SF_SMOKE)
    max_basket = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert max_basket * 8 < _MAX_BASKET, (max_basket, _MAX_BASKET)

    capped = {
        (r.u, r.v, r.n_tog) for r in basket_pair_counts(li).collect()
    }
    uncapped = {
        (r.u, r.v, r.n_tog)
        for r in basket_pair_counts(li, max_basket=1 << 30).collect()
    }
    assert capped == uncapped and capped


def test_copurchase_edges_match_selfjoin_semantics(spark):
    """The in-array pair expansion reproduces EXACTLY the edge set of
    the oracle's order-key self-join (distinct src<>dst pairs, both
    directions), with no duplicate edges."""
    from etl_sprint_2_5_spark.plans.graph_queries import copurchase_edges
    from etl_sprint_2_5_spark.sources.parquet import load_table

    li = load_table(spark, "lineitem", SF_SMOKE)
    got = [(r.src, r.dst) for r in copurchase_edges(li).collect()]
    assert len(got) == len(set(got)), "duplicate edges"

    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select("l_orderkey", F.col("l_partkey").alias("src"))
    c = b.select("l_orderkey", F.col("l_partkey").alias("dst"))
    expect = {
        (r.src, r.dst)
        for r in a.join(c, "l_orderkey")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .collect()
    }
    assert set(got) == expect


def test_basket_pair_cap_drops_degenerate_basket(spark):
    """A basket past the cap is dropped whole (the idf argument) —
    pairs from normal baskets survive untouched."""
    from etl_sprint_2_5_spark.plans.graph_queries import basket_pair_counts

    rows = [(1, 1000 + p) for p in range(5)] + [(2, p) for p in range(100)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = basket_pair_counts(li, max_basket=10, on_oversize="drop")
    assert out.count() == 5 * 4 // 2  # only basket 1's pairs
    assert (
        basket_pair_counts(li, max_basket=100, on_oversize="drop").count()
        == 10 + 100 * 99 // 2
    )


def test_basket_pair_cap_binds_loudly_not_silently(spark):
    """A BINDING cap must fail in-plan with a message naming the cap
    and the escape hatch — the gated oracles expand baskets uncapped,
    so silent dropping would surface as an opaque hash mismatch.
    on_oversize='drop' keeps the documented 100-TB drop semantics."""
    import pytest

    from etl_sprint_2_5_spark.plans.graph_queries import basket_pair_counts
    from etl_sprint_2_5_spark.sources.parquet import load_table

    li = load_table(spark, "lineitem", SF_SMOKE)
    with pytest.raises(Exception, match="max_basket=2"):
        basket_pair_counts(li, max_basket=2).count()
    # drop mode: oversize baskets silently excluded, query completes
    dropped = basket_pair_counts(li, max_basket=2, on_oversize="drop")
    assert dropped.count() >= 0


# ---------------------------------------------------------------- Hilbert


def test_hilbert_frame_matches_reference_walk(spark):
    """hilbert_frame's chained projections reproduce the classic
    xy2d walk exactly (bijection + reflect/swap arithmetic)."""
    from etl_sprint_2_5_spark.operators.layout import hilbert_frame

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.hkey
        for r in hilbert_frame(df, "x", "y", bits=4).collect()
    }
    exp = {(x, y): xy2d(16, x, y) for x, y in pts}
    assert got == exp
    assert sorted(got.values()) == list(range(256))  # bijection


def test_hilbert_unit_step_adjacency(spark):
    """Consecutive curve positions are Manhattan-adjacent — the
    property that makes range-partitioned files tight in (x, y)."""
    from etl_sprint_2_5_spark.operators.layout import hilbert_frame

    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    inv = {
        r.hkey: (r.x, r.y)
        for r in hilbert_frame(df, "x", "y", bits=5).collect()
    }
    for d in range(len(pts) - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_sql_mirror_agrees_with_frame(spark):
    import duckdb

    from etl_sprint_2_5_spark.operators.layout import (
        hilbert_frame,
        hilbert_sql,
    )

    pts = [(x * 37 % 64, x * 11 % 64) for x in range(200)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted(
        (r.x, r.y, r.hkey)
        for r in hilbert_frame(df, "x", "y", bits=6).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ",".join(f"({x},{y})" for x, y in pts)
        + ") t(x,y)"
    )
    sql = "WITH " + hilbert_sql("x", "y", 6, "pts") + " SELECT x, y, hd FROM h0"
    assert sorted(map(tuple, con.execute(sql).fetchall())) == got

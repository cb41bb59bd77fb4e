"""Graph analytics beyond connected components — fixed-iteration
PageRank over the part co-purchase graph.

Iterative linear algebra as repeated join+aggregate is the Spark-
native shape for graph propagation (same family as the min-label
connected-components in operators/curation.py): each Lloyd/power
iteration is one shuffle on the node key, and the rank and edge
tables share that partitioning so AQE reuses the exchange.

Determinism: ranks are INTEGER parts-per-billion, not doubles — a
float PageRank sums contributions in partition order and drifts by
ulps per iteration, which a value-hash gate would flag. Integer
addition is commutative-exact, `div` truncation matches DuckDB's
`//` floor on non-negatives, and the constants (damping 850/1000,
teleport 150_000_000/N) stay in BIGINT range throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.plans.registry import materialize_release, query
from etl_sprint_2_5_spark.sources.parquet import load_table

# CTEs MATERIALIZED: the iteration chain references e/deg at every
# level; inlined, DuckDB recomputes the basket self-join per
# reference (spilled >40 GiB at sf1). Materialization pins each
# step to one evaluation - the same shape Spark executes.
_PAGERANK_ORACLE = """
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, c.l_partkey AS dst
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey <> c.l_partkey
    ), deg AS MATERIALIZED (
      SELECT src, count(*) AS deg FROM e GROUP BY src
    ), nn AS MATERIALIZED (
      SELECT count(*) AS n FROM deg
    ), r0 AS MATERIALIZED (
      SELECT src AS part, CAST(1000000000 // (SELECT n FROM nn) AS BIGINT) AS r
      FROM deg
    ), it1 AS MATERIALIZED (
      SELECT e.dst AS part,
             CAST(150000000 // (SELECT n FROM nn)
                  + (850 * CAST(sum(r0.r // deg.deg) AS BIGINT)) // 1000
                  AS BIGINT) AS r
      FROM e JOIN r0 ON e.src = r0.part JOIN deg ON e.src = deg.src
      GROUP BY e.dst
    ), it2 AS MATERIALIZED (
      SELECT e.dst AS part,
             CAST(150000000 // (SELECT n FROM nn)
                  + (850 * CAST(sum(it1.r // deg.deg) AS BIGINT)) // 1000
                  AS BIGINT) AS r
      FROM e JOIN it1 ON e.src = it1.part JOIN deg ON e.src = deg.src
      GROUP BY e.dst
    ), it3 AS MATERIALIZED (
      SELECT e.dst AS part,
             CAST(150000000 // (SELECT n FROM nn)
                  + (850 * CAST(sum(it2.r // deg.deg) AS BIGINT)) // 1000
                  AS BIGINT) AS r
      FROM e JOIN it2 ON e.src = it2.part JOIN deg ON e.src = deg.src
      GROUP BY e.dst
    )
    SELECT it3.part, deg.deg AS degree, it3.r AS pr_ppb
    FROM it3 JOIN deg ON it3.part = deg.src
    ORDER BY pr_ppb DESC, part
    LIMIT 50
"""


# Per-task pair-expansion bound for the co-purchase graph builders.
# 1024 distinct parts -> at most 1024·1023/2 ≈ 5.2e5 pair rows from one
# basket, a few MB inside one task — an executor-sized unit of work.
_MAX_BASKET = 1024


def basket_pair_counts(
    li: DataFrame,
    max_basket: int = _MAX_BASKET,
    on_oversize: str = "error",
) -> DataFrame:
    """Co-purchase pair counts (u < v, n_tog) from per-order baskets —
    THE shared edge builder for pagerank / label propagation /
    triangle counting. One shuffle on ``l_orderkey``: collect each
    basket's sorted distinct parts, expand the in-array pairs locally
    (operators/dedup.pairs_within_bucket), count per pair. The
    order-key self-join formulation the oracles use computes the same
    set but shuffles the fact table twice and re-materializes every
    basket pairwise; here the quadratic stays inside a task.

    ``max_basket`` is the skew guard, same argument as dedup's
    stop-shingle cap (operators/dedup.capped_postings): a single
    degenerate basket of B parts expands B(B−1)/2 rows in ONE task —
    TPC-H-ish baskets hold ≤ ~7 parts, but at 100 TB one pathological
    order (a bulk-purchasing reseller with 10^5 distinct parts) would
    emit 5·10^9 pairs from one task, the classic hot-key OOM. With
    ``on_oversize="drop"`` baskets above the cap are DROPPED, not
    truncated: a basket spanning thousands of distinct parts is a
    warehouse artifact, not co-purchase evidence — the idf argument,
    applied to orders.

    The DEFAULT is ``on_oversize="error"``: the gated graph queries'
    DuckDB oracles expand baskets UNCAPPED, so a silently-binding cap
    would surface as an opaque value-hash mismatch pointing nowhere.
    Under "error" a basket over the cap raises in-plan (raise_error on
    the basket row — zero extra jobs, one JVM-side predicate per
    basket) naming the cap, the order, and the escape hatch. Headroom
    at gate SFs is additionally pinned by tests/test_scale_patterns.py
    (observed max basket orders of magnitude below the cap)."""
    from etl_sprint_2_5_spark.operators.dedup import pairs_within_bucket

    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    if on_oversize == "drop":
        baskets = baskets.where(F.size("parts") <= max_basket)
    else:
        # in-plan guard: the value is consumed downstream (pair
        # expansion), so Catalyst cannot prune the branch away
        baskets = baskets.select(
            "l_orderkey",
            F.when(F.size("parts") <= max_basket, F.col("parts"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("basket_pair_counts: order "),
                        F.col("l_orderkey").cast("string"),
                        F.lit(" has "),
                        F.size("parts").cast("string"),
                        F.lit(
                            f" distinct parts > max_basket={max_basket}; the"
                            " gated oracles expand uncapped, so a binding cap"
                            " means divergence — raise max_basket or pass"
                            " on_oversize='drop' for warehouse-artifact"
                            " baskets"
                        ),
                    )
                )
            )
            .alias("parts"),
        )
    return (
        baskets.select(
            F.explode(pairs_within_bucket(F.col("parts"))).alias("p")
        )
        .select(F.col("p.id_a").alias("u"), F.col("p.id_b").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_tog"))
    )


def copurchase_edges(
    li: DataFrame, max_basket: int = _MAX_BASKET
) -> DataFrame:
    """Symmetric distinct co-purchase edge list (src, dst) — both
    directions of every basket pair. Pairs are unique after
    basket_pair_counts' aggregate, so the two-direction union needs
    no further distinct."""
    p = basket_pair_counts(li, max_basket)
    return p.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        p.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )


def _stationary_edges(spark: SparkSession, sf_dir: str, edges: DataFrame) -> DataFrame:
    """Stage the degree-annotated edge list as a bucketed catalog
    table on ``src`` so every PageRank iteration reads it already
    hash-partitioned — no per-iteration exchange of the big operand,
    even under AQE. The table name carries the lineitem fingerprint,
    so a driver-regenerated testdata dir rebuilds instead of serving
    stale edges. Falls back to repartition+cache when the session
    cannot write a catalog table (read-only warehouse)."""
    from etl_sprint_2_5_spark.artifacts import table_fingerprint

    table = f"pagerank_edges_{table_fingerprint(sf_dir, 'lineitem')}"
    try:
        if not spark.catalog.tableExists(table):
            from etl_sprint_2_5_spark.sources.bucketed import write_bucketed

            write_bucketed(edges, table, "src", 32, sort_col="src")
        return spark.table(table)
    except Exception:  # noqa: BLE001 — storage-less session
        return edges.repartition("src").cache()


@query("part_pagerank", oracle=_PAGERANK_ORACLE, covers=("X-graph-pagerank",))
def part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three power iterations of PageRank (damping 0.85) over the
    symmetric part co-purchase graph; top-50 parts by rank.

    Plan shape: the edge list is built once from per-order baskets,
    annotated with the DESTINATION node's degree (the symmetric graph
    makes the dst-degree join lossless), and MATERIALIZED AS A
    BUCKETED TABLE on src (sources/bucketed.py) — the GraphX/Pregel
    stationary-edges layout expressed in DataFrames. The bucketed
    scan reports HashPartitioning(src) straight from storage, which
    (unlike a cached DataFrame's output partitioning) survives AQE's
    join re-planning, so every iteration touches the big operand with
    ZERO exchanges: an iteration is just the small rank-table
    exchange onto src plus the aggregate exchange on dst. No
    per-iteration deg re-join exists — the dst degree and the
    node-count scalar ride through the contribution aggregate as
    grouping keys. If the session has no writable warehouse (the
    bucketed write is storage), the query falls back to the
    repartition+cache layout, which is plan-identical with AQE off
    and carries one extra edge re-exchange per iteration under AQE.
    tests/test_scale_patterns.py asserts the executed adaptive plan
    keeps ≤ 2 shuffle exchanges per iteration."""
    li = load_table(spark, "lineitem", sf_dir)
    edges = copurchase_edges(li)  # capped basket expansion, one shuffle
    deg0 = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    dd = deg0.select(F.col("src").alias("dst"), F.col("deg").alias("dst_deg"))
    edges2 = _stationary_edges(
        spark, sf_dir, edges.join(dd, "dst").select("src", "dst", "dst_deg")
    )
    # deg/nn re-derived FROM the staged table: per-src counts are
    # bucket-local (zero-exchange), and the expensive basket pair
    # expansion above executes exactly once — inside the staging
    # write, not in this query's plan
    deg = edges2.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    # ranks carries (part, r, deg, n): the src degree divides the
    # outgoing contribution, dst_deg re-enters via the edge table
    ranks = deg.join(F.broadcast(nn)).select(
        F.col("src").alias("part"),
        F.expr("1000000000 div n").alias("r"),
        "deg",
        "n",
    )
    for _ in range(3):
        contrib = edges2.join(ranks, edges2.src == ranks.part).select(
            "dst", "dst_deg", "n", F.expr("r div deg").alias("c")
        )
        # dst_deg/n are functionally dependent on dst — grouping by
        # them carries the next iteration's degree without a join
        ranks = (
            contrib.groupBy("dst", "dst_deg", "n")
            .agg(F.expr("(850 * sum(c)) div 1000").alias("damped"))
            .select(
                F.col("dst").alias("part"),
                (F.expr("150000000 div n") + F.col("damped")).alias("r"),
                F.col("dst_deg").alias("deg"),
                "n",
            )
        )
    return (
        ranks.select("part", F.col("deg").alias("degree"), F.col("r").alias("pr_ppb"))
        .orderBy(F.desc("pr_ppb"), F.asc("part"))
        .limit(50)
    )


@query(
    "zonemap_skip_estimate",
    oracle="""
    WITH zones AS (
      SELECT 'orderkey_zones' AS layout,
             (l_orderkey - 1) // 1000 AS zone,
             min(l_shipdate) AS zmin, max(l_shipdate) AS zmax,
             count(*) AS n_rows
      FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'shipdate_zones' AS layout,
             EXTRACT(year FROM l_shipdate) * 12
               + EXTRACT(month FROM l_shipdate) AS zone,
             min(l_shipdate) AS zmin, max(l_shipdate) AS zmax,
             count(*) AS n_rows
      FROM lineitem GROUP BY 1, 2
    ), classed AS (
      SELECT layout, n_rows,
             CASE WHEN zmax < TIMESTAMP '1997-07-01'
                    OR zmin >= TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END AS skippable
      FROM zones
    )
    SELECT layout,
           count(*) AS n_zones,
           CAST(sum(skippable) AS BIGINT) AS n_skip_zones,
           CAST(sum(n_rows) AS BIGINT) AS rows_total,
           CAST(sum(skippable * n_rows) AS BIGINT) AS rows_skip,
           (CAST(sum(skippable * n_rows) AS BIGINT) * 1000000)
             // CAST(sum(n_rows) AS BIGINT) AS skip_ppm
    FROM classed
    GROUP BY layout
    ORDER BY layout
    """,
    covers=("X-layout-zonemap",),
)
def zonemap_skip_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (row-group min/max) pruning simulator: how much of
    the fact table a shipdate predicate could SKIP under two physical
    layouts — natural orderkey chunks of 1000 rows vs month-range
    partitions. This is the decision query behind choosing a layout
    (zorder_layout's companion): at 100 TB the skip_ppm difference is
    the scan-cost difference, because parquet row-group stats and
    partition pruning implement exactly this CASE.

    One scan: each row emits (layout, zone) twice via explode, then a
    zone-stat aggregate and a per-layout rollup — both map-side
    combinable."""
    li = load_table(spark, "lineitem", sf_dir)
    lo = F.lit("1997-07-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    zoned = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("orderkey_zones").alias("layout"),
                    F.expr("(l_orderkey - 1) div 1000").alias("zone"),
                ),
                F.struct(
                    F.lit("shipdate_zones").alias("layout"),
                    (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
                    .cast("long")
                    .alias("zone"),
                ),
            )
        ).alias("z"),
        "l_shipdate",
    ).select("z.layout", "z.zone", "l_shipdate")
    zones = zoned.groupBy("layout", "zone").agg(
        F.min("l_shipdate").alias("zmin"),
        F.max("l_shipdate").alias("zmax"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    classed = zones.select(
        "layout",
        "n_rows",
        F.when((F.col("zmax") < lo) | (F.col("zmin") >= hi), 1)
        .otherwise(0)
        .cast("long")
        .alias("skippable"),
    )
    return (
        classed.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_zones"),
            F.sum("skippable").alias("n_skip_zones"),
            F.sum("n_rows").alias("rows_total"),
            F.sum(F.col("skippable") * F.col("n_rows")).alias("rows_skip"),
            F.expr(
                "(sum(skippable * n_rows) * 1000000) div sum(n_rows)"
            ).alias("skip_ppm"),
        )
        .orderBy("layout")
    )


@query(
    "triangle_count",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY u, v
      HAVING count(*) >= 2
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    member AS (
      SELECT a AS part FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT part, count(*) AS n_triangles
    FROM member
    GROUP BY part
    ORDER BY n_triangles DESC, part
    LIMIT 20
    """,
    covers=("X-graph-triangles",),
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the part co-purchase graph
    (parts co-ordered in >= 2 baskets), top 20 — the clustering /
    community-density primitive next to part_pagerank.

    The oracle enumerates triangles with the naive 3-way join on
    id-ordered edges (a < b < c, each triangle once); the Spark plan
    finds the SAME set via the degree-ordered compact-forward
    algorithm (Latapy 2008): orient every edge from its lower
    (degree, id) endpoint to the higher, build wedges by self-joining
    the oriented list on the pivot, and close each wedge with one
    hash join back to the oriented edges. Orientation bounds every
    node's out-degree by O(sqrt(m)) regardless of how skewed the raw
    degree distribution is, so the wedge fan-out — the quadratic
    hazard in any triangle count — stays O(m^1.5) worst-case instead
    of sum(deg^2): at 100x this is the difference between a hub part
    in millions of baskets generating 10^12 wedges and ~10^6. The
    degree table rides in as a broadcast; wedge-close is one shuffle
    on the (v, w) pair key."""
    li = load_table(spark, "lineitem", sf_dir)
    # shared capped edge builder (basket_pair_counts): basket build +
    # pair expansion is ONE exchange on l_orderkey — the separate
    # distinct shuffle the oracle's CTE implies is fused into the
    # basket aggregate, and the per-basket quadratic is bounded
    und = basket_pair_counts(li).where(F.col("n_tog") >= 2).select("u", "v")
    und.cache()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (deg, id): lower endpoint -> higher endpoint
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    ranked = und.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    # cache: e1/e2/closing all read the oriented list — without this
    # the rank join recomputes three times and the printed plan (and
    # the runtime) triples
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_hi"),
    ).cache()
    e1 = oriented.select(
        F.col("lo").alias("p"), F.col("hi").alias("x"), F.col("deg_hi").alias("dx")
    )
    e2 = oriented.select(
        F.col("lo").alias("p"), F.col("hi").alias("y"), F.col("deg_hi").alias("dy")
    )
    # wedge (x, y) around pivot p, oriented once by the same rank order
    wedges = e1.join(e2, "p").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select(
        F.col("p").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
    )
    member = (
        tri.select(F.col("a").alias("part"))
        .unionAll(tri.select(F.col("b").alias("part")))
        .unionAll(tri.select(F.col("c").alias("part")))
    )
    top = (
        member.groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "part")
        .limit(20)
    )
    return materialize_release(top, und, oriented)


# CTEs MATERIALIZED for the same reason as the PageRank oracle: the
# round chain references e at every level.
_LPA_ORACLE = """
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, c.l_partkey AS dst
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey <> c.l_partkey
    ), l0 AS MATERIALIZED (
      SELECT DISTINCT src AS part, src AS lab FROM e
    ), it1 AS MATERIALIZED (
      SELECT part, lab FROM (
        SELECT e.dst AS part, l0.lab, 
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, l0.lab) AS rn
        FROM e JOIN l0 ON e.src = l0.part
        GROUP BY e.dst, l0.lab
      ) WHERE rn = 1
    ), it2 AS MATERIALIZED (
      SELECT part, lab FROM (
        SELECT e.dst AS part, it1.lab,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, it1.lab) AS rn
        FROM e JOIN it1 ON e.src = it1.part
        GROUP BY e.dst, it1.lab
      ) WHERE rn = 1
    ), it3 AS MATERIALIZED (
      SELECT part, lab FROM (
        SELECT e.dst AS part, it2.lab,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, it2.lab) AS rn
        FROM e JOIN it2 ON e.src = it2.part
        GROUP BY e.dst, it2.lab
      ) WHERE rn = 1
    )
    SELECT lab AS community,
           count(*)  AS n_members,
           min(part) AS min_part,
           max(part) AS max_part
    FROM it3
    GROUP BY lab
    ORDER BY n_members DESC, community
    LIMIT 50
"""


@query(
    "part_label_propagation",
    oracle=_LPA_ORACLE,
    covers=("X-graph-lpa",),
)
def part_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by LABEL PROPAGATION (Raghavan et al. 2007)
    over the part co-purchase graph — the curation tool for grouping
    a catalog/corpus into behavioral domains without choosing k.
    Fully deterministic variant: synchronous rounds, each node adopts
    its neighbors' MODE label with ties broken by MIN label (the
    row_number (count DESC, lab ASC) pick), 3 rounds, then communities
    summarized as (label, size, member range), top-50 by size.

    Plan shape: reuses part_pagerank's STATIONARY bucketed edge table
    (same fingerprint-keyed staging — built once per corpus, read
    pre-partitioned on src), so a propagation round is the small
    label-table exchange onto src + the vote aggregate on (dst, lab)
    + the per-dst window pick — per-round cost is edges-proportional
    with no edge re-shuffle, the Pregel layout in DataFrames. At
    100 TB the (dst, lab) vote aggregate map-side combines; label
    tables are node-sized, never edge-sized."""
    from pyspark.sql import Window

    li = load_table(spark, "lineitem", sf_dir)
    edges = copurchase_edges(li)  # capped basket expansion, one shuffle
    deg0 = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    dd = deg0.select(F.col("src").alias("dst"), F.col("deg").alias("dst_deg"))
    edges2 = _stationary_edges(
        spark, sf_dir, edges.join(dd, "dst").select("src", "dst", "dst_deg")
    )
    labels = edges2.select(F.col("src").alias("part")).distinct().select(
        "part", F.col("part").alias("lab")
    )
    pick = Window.partitionBy("dst").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(3):
        votes = (
            edges2.join(labels, edges2.src == labels.part)
            .groupBy("dst", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(pick))
            .where(F.col("rn") == 1)
            .select(F.col("dst").alias("part"), "lab")
        )
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("part").alias("min_part"),
            F.max("part").alias("max_part"),
        )
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(50)
    )

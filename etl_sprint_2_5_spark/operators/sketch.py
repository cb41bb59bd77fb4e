"""Count-min + HyperLogLog sketches — mergeable summaries for
streams and 100 TB scans.

Spark ships HLL (approx_count_distinct) and t-digest
(percentile_approx) as opaque aggregates; this module re-derives the
two classic sketches as ORDINARY DataFrames with the same design
rules as the rest of the engine: one map-side-combinable aggregation
builds the sketch, hashes bottom out in salted md5 (deterministic
across engines, retries, and languages — so a DuckDB oracle can
rebuild the identical sketch cell-for-cell), and estimation is plain
relational algebra — no driver-side state, no opaque binary blobs.

Count-min (frequency): estimate ≥ true count always; overestimate
≤ ε·N with probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉.
Sketches over different slices MERGE by cell-wise sum.

HyperLogLog (cardinality, Flajolet et al. 2007): m = 2^b registers,
each the max leading-zero rank seen in its hash substream; relative
standard error ≈ 1.04/√m. Sketches MERGE by register-wise max — the
idempotent/commutative property that makes them partial aggregates
(a day of 100 TB can be sketched per-partition and folded). The
estimator's harmonic sum is carried as an EXACT int64
(Σ 2^(W+1−reg) ≤ m·2^(W+1) = 2^61 for a 60-bit hash, any b), so the
only gate-time float op is one literal-constant IEEE division (the
small-range branch is a pure-integer table lookup, hll_small_milli);
estimates cross engine boundaries as fixed-point milli BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_col: str, row: int, width: int, salt: str):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:{row}:"), F.col(key_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    salt: str = "cms-v1",
) -> DataFrame:
    """Build the sketch: (row, bucket, n) cells, ≤ depth·width rows.

    One posexplode (depth cells per input row) + one groupBy — the
    shuffle carries at most depth·width combiner cells per task
    regardless of input size."""
    hashes = F.array(*[_bucket(key_col, d, width, salt) for d in range(depth)])
    return (
        df.select(F.posexplode(hashes).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the same geometry —
    the mergeability that lets slices/partitions/days combine."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def cms_inner_product(
    a: DataFrame, b: DataFrame, depth: int | None = None
) -> DataFrame:
    """Join-size estimation via the CMS inner product (Cormode &
    Muthukrishnan's classic application): for two sketches with the
    same geometry over the two join keys, Σ_bucket a·b per row is an
    unbiased-upward estimate of |A ⋈ B| = Σ_key n_a(k)·n_b(k); min
    over the depth rows tightens it. Pure integer arithmetic — no
    float op anywhere — and the input sketches are ≤ depth·width
    cells, so estimating the join size of two 100 TB fact tables
    costs two independent one-pass sketches plus a broadcast join of
    two tiny cell tables (never the join itself). Overcount scales
    as N_a·N_b/width: size width to the key-cardinality product.

    Depth rows where NO bucket overlaps have a true dot of 0 — they
    must participate in the min (and disjoint key sets must estimate
    0, not NULL), so the per-row dots are computed over the UNION of
    both sketches' row domains with missing products coalesced to 0
    (round-8 ADVICE: the previous inner-join shape dropped dot=0 rows
    before the min, inflating the estimate for near-disjoint inputs).

    Returns a single row: (est_join_size)."""
    if depth is not None:
        # known geometry: the depth-row domain is a local relation —
        # no re-scan of the sketches, no distinct shuffle
        spark = a.sparkSession
        rows_dom = spark.range(depth).select(
            F.col("id").cast("int").alias("row")
        )
    else:
        rows_dom = a.select("row").unionByName(b.select("row")).distinct()
    prod = a.alias("a").join(
        F.broadcast(b.alias("b")), ["row", "bucket"], "inner"
    )
    per_row = prod.groupBy("row").agg(
        F.sum(F.col("a.n") * F.col("b.n")).alias("dot")
    )
    dots = rows_dom.join(F.broadcast(per_row), "row", "left").select(
        F.coalesce(F.col("dot"), F.lit(0)).alias("dot")
    )
    return dots.agg(
        F.coalesce(F.min("dot"), F.lit(0)).cast("long").alias("est_join_size")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    salt: str = "cms-v1",
) -> DataFrame:
    """Point-query the sketch for each key: min over the depth cells.

    The sketch (≤ depth·width rows) broadcasts; missing cells mean
    zero observations, so the min coalesces them to 0."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[_bucket(key_col, d, width, salt) for d in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_count"))
    )


# --- HyperLogLog ------------------------------------------------------

_HLL_HASH_BITS = 60  # 15 hex chars of md5 → fits int64 exactly


def hll_alpha(m: int) -> float:
    """Bias-correction constant from the HLL paper (Flajolet 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_hash(key_col: str, salt: str):
    """60-bit salted-md5 hash — same recipe as the CMS bucket hash, so
    a SQL oracle reproduces it with substr(md5(..),1,15)::BIGINT."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def hll_build(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    b: int = 6,
    salt: str = "hll-v1",
) -> DataFrame:
    """Build per-group HLL registers: (*group_cols, bucket, reg).

    ONE groupBy with a max() aggregate — map-side combine collapses
    each task's contribution to ≤ m rows per group before the
    shuffle, so sketching 100 TB moves ≤ tasks·groups·m tiny rows.
    Duplicates are free (max is idempotent); only buckets that saw at
    least one key appear (absent bucket ⇔ register 0).

    bucket = low b bits of the 60-bit hash; rank = leading-zero count
    of the remaining W = 60−b bits, plus 1 (w == 0 ⇒ W+1). Computed
    as W+1−bitlength(w) via length(bin(w)) — integer-exact and
    available verbatim in DuckDB for the oracle."""
    m = 1 << b
    w_bits = _HLL_HASH_BITS - b
    h = _hll_hash(key_col, salt)
    w = F.shiftright(h, b)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *group_cols,
            (h.bitwiseAND(F.lit(m - 1))).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register-wise max of two sketches with the same geometry —
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly, which is
    what lets slices/partitions/days fold without rescanning."""
    cols = [c for c in a.columns if c != "reg"]
    return (
        a.unionByName(b).groupBy(*cols).agg(F.max("reg").alias("reg"))
    )


def hll_small_milli(m: int) -> list[int]:
    """Integer-exact small-range correction table: entry V−1 =
    floor(m·ln(m/V)·1000 + 0.5) for V = 1..m. V (the zero-register
    count) has only m possible values, so the ln() — the one
    libm-dependent op in the whole estimator — is evaluated ONCE here
    on the driver and baked into both the Spark plan and the DuckDB
    oracle SQL as the SAME integer constants. No engine evaluates a
    transcendental at gate time, so there is no last-ulp divergence
    for the fixed-point compare to trip over (round-8 ADVICE: the
    previous floor(m·ln(m/V)·1e3+0.5) computed per-engine could flake
    when the product landed within an ulp of a half-integer)."""
    import math

    return [
        int(math.floor(m * math.log(m / v) * 1000 + 0.5))
        for v in range(1, m + 1)
    ]


def hll_est_milli_sql(
    b: int,
    harmonic: str = "harmonic_num",
    vcol: str = "n_zero_regs",
) -> str:
    """ANSI-SQL BIGINT expression for est_milli — the oracle-side twin
    of hll_estimate's estimator, sharing the hll_small_milli constants
    verbatim so both engines are pure-integer in the small-range
    branch and identical-IEEE-division in the raw branch."""
    m = 1 << b
    wmax = _HLL_HASH_BITS - b + 1
    c_lit = hll_alpha(m) * m * m * float(1 << wmax)
    whens = " ".join(
        f"WHEN {v} THEN CAST({t} AS BIGINT)"
        for v, t in enumerate(hll_small_milli(m), start=1)
    )
    return (
        f"CASE WHEN ({c_lit!r} / CAST({harmonic} AS DOUBLE)) <= {2.5 * m!r} "
        f"AND {vcol} > 0 THEN (CASE {vcol} {whens} END) "
        f"ELSE CAST(floor({c_lit!r} / CAST({harmonic} AS DOUBLE) * 1e3 "
        f"+ 0.5e0) AS BIGINT) END"
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: tuple[str, ...],
    b: int = 6,
) -> DataFrame:
    """Per-group cardinality estimate from the registers.

    Output: (*group_cols, n_zero_regs, harmonic_num, est_milli).

    harmonic_num = Σ_buckets 2^(W+1−reg) carried as an EXACT int64
    (absent buckets contribute 2^(W+1) each); the raw estimate is
    then ONE IEEE division of a python-computed literal constant
    C = α_m·m²·2^(W+1) by harmonic_num — bit-identical in any
    engine. Small-range correction (raw ≤ 2.5m with empty registers)
    is a pure-integer table lookup: m·ln(m/V) has only m possible
    values, precomputed once on the driver (hll_small_milli) and
    shared with the oracle SQL — no libm anywhere at gate time."""
    m = 1 << b
    w_bits = _HLL_HASH_BITS - b
    wmax = w_bits + 1
    c_lit = hll_alpha(m) * m * m * float(1 << wmax)
    present = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        # coalesce: a fully-empty sketch (global agg over zero
        # register rows) has present_num 0, so harmonic_num lands on
        # the exact empty-slice value m·2^(W+1), not NULL
        F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, {wmax} - reg)")), F.lit(0)
        ).alias("present_num"),
    )
    v = F.lit(m) - F.col("n_present")
    harmonic = (
        F.col("present_num")
        + v.cast("long") * F.lit(1 << wmax).cast("long")
    )
    raw_e = F.lit(c_lit) / harmonic.cast("double")
    small_tbl = F.array(
        *[F.lit(int(t)).cast("long") for t in hll_small_milli(m)]
    )
    est_milli = F.when(
        (raw_e <= F.lit(2.5 * m)) & (v > 0),
        F.element_at(small_tbl, v.cast("int")),
    ).otherwise(F.floor(raw_e * F.lit(1e3) + F.lit(0.5)).cast("long"))
    return present.select(
        *group_cols,
        v.cast("long").alias("n_zero_regs"),
        harmonic.alias("harmonic_num"),
        est_milli.alias("est_milli"),
    )


# --- DDSketch-style integer quantile sketch ---------------------------
#
# Third of the sketch trio (CMS = frequency, HLL = cardinality, this =
# quantiles). Same public idea as DDSketch (Masson et al., VLDB'19) /
# HdrHistogram: log-spaced buckets give bounded RELATIVE error with a
# tiny mergeable histogram — but with PURE-INTEGER buckets: a
# non-negative int (e.g. money in cents) maps to
# (bitlength << 2) | top-2-sub-bits, i.e. 3 significant binary digits.
# Bucket width is 1/4 of its lower bound, so a midpoint answer is
# within 12.5% relative error, there is NO libm anywhere (an oracle
# mirrors every op exactly), and merge is bucket-wise count addition —
# a partial aggregate that folds per-partition/day histograms without
# rescanning. ~4*64 = 256 possible buckets cover the whole int64
# range.


def dd_bucket_expr(value_col: str):
    """The bucket id of a non-negative integer value as a Column:
    identity below 4, else (bitlength << 2) | top-2-sub-bits."""
    return F.expr(
        f"CASE WHEN {value_col} < 4 THEN {value_col} "
        f"ELSE (length(bin({value_col})) << 2) "
        f"| ((shiftright({value_col}, length(bin({value_col})) - 3)) & 3) END"
    ).cast("long")


def dd_build(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build the histogram: (*group_cols, bucket_id, n). One
    map-side-combinable groupBy; ≤ ~256 rows per group ever cross the
    shuffle per task regardless of scan size."""
    bid = dd_bucket_expr(value_col)
    return (
        df.select(*group_cols, bid.alias("bucket_id"))
        .groupBy(*group_cols, "bucket_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dd_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bucket-wise count addition — histograms over disjoint slices
    fold exactly (dd_build(A ∪ B) == dd_merge over slices)."""
    cols = [c for c in a.columns if c != "n"]
    return a.unionByName(b).groupBy(*cols).agg(F.sum("n").alias("n"))


def dd_quantile(
    sketch: DataFrame,
    q_millis: tuple[int, ...],
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quantile estimates from the histogram, exact-integer end to
    end: for each q (in milli, e.g. 500/900/990) pick the first
    bucket whose cumulative count reaches rank k = ceil(q·N) and
    report its midpoint ×1000 (est_milli = lower·1000 + width·500 —
    no float division, so engines agree bit-for-bit).

    Output: (*group_cols, q_milli, rank_k, bucket_id, est_milli)."""
    from pyspark.sql import Window

    gw = (
        Window.partitionBy(*group_cols)
        if group_cols
        else Window.partitionBy(F.lit(1))
    )
    cum = sketch.select(
        *group_cols,
        "bucket_id",
        F.sum("n").over(gw.orderBy("bucket_id")).alias("cum_n"),
        F.sum("n").over(gw).alias("total_n"),
    )
    spark = sketch.sparkSession
    qdf = spark.createDataFrame(
        [(int(q),) for q in q_millis], "q_milli long"
    )
    # rank k = ceil(q_milli * N / 1000) in pure integers
    k = F.expr("(q_milli * total_n + 999) div 1000")
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .where(F.col("cum_n") >= k)
        .groupBy(*group_cols, "q_milli")
        .agg(
            F.min("bucket_id").alias("bucket_id"),
            F.min(k).alias("rank_k"),
        )
    )
    lower = F.when(F.col("bucket_id") < 4, F.col("bucket_id")).otherwise(
        F.expr("shiftleft((4 | (bucket_id & 3)), (bucket_id >> 2) - 3)")
    )
    width = F.when(F.col("bucket_id") < 4, F.lit(0)).otherwise(
        F.expr("shiftleft(1L, (bucket_id >> 2) - 3)")
    )
    return hit.select(
        *group_cols,
        "q_milli",
        "rank_k",
        "bucket_id",
        (lower.cast("long") * F.lit(1000) + width.cast("long") * F.lit(500))
        .cast("long")
        .alias("est_milli"),
    )


def dd_exact_rank(
    df: DataFrame,
    value_col: str,
    est: DataFrame,
    sketch: DataFrame,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The EXACT order statistic at each ``est`` row's ``rank_k``,
    computed bucket-narrowed instead of by a full-table sort.

    Why: the naive audit (``row_number().over(partitionBy(g)
    .orderBy(v))``) sorts the ENTIRE column in one task per group —
    at 3 groups that is a third of the fact table per task, the
    single superlinear term in an otherwise counter-sized plan. But
    the sketch already knows WHICH bucket the rank-k value sits in
    and HOW MANY rows precede that bucket (the cumulative histogram),
    so the exact value only needs an in-bucket order statistic:

    1. ``base_n`` = rows strictly below the hit bucket — a window
       over the ≤ ~256-row-per-group histogram, not the data;
    2. scan-filter the data to the ≤ (groups × quantiles) hit
       buckets via a broadcast semi-join (one scan, no shuffle of
       misses);
    3. groupBy value WITHIN the hit bucket (map-side combinable) and
       take the first value whose in-bucket cumulative count reaches
       ``rank_k - base_n``. The in-bucket window's input is DISTINCT
       values, bounded by the bucket's integer width (width =
       lower/4) — a constant independent of row count, so the audit
       stays flat while the data grows.

    Output: the ``est`` columns plus ``exact`` (the rank_k-th
    smallest value of ``value_col`` per group)."""
    from pyspark.sql import Window

    keys = [*group_cols, "bucket_id"]
    gw = Window.partitionBy(*group_cols).orderBy("bucket_id")
    cum = sketch.select(
        *keys, "n", F.sum("n").over(gw).alias("cum_n")
    )
    base = (
        est.join(cum, on=keys)
        .withColumn("base_n", F.col("cum_n") - F.col("n"))
        .drop("n", "cum_n")
    )
    targets = base.select(*keys).distinct()
    in_bucket = df.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        dd_bucket_expr(value_col).alias("bucket_id"),
    ).join(F.broadcast(targets), on=keys)
    vw = Window.partitionBy(*keys).orderBy("_v")
    vc = (
        in_bucket.groupBy(*keys, "_v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("cum_in", F.sum("cnt").over(vw))
    )
    need = F.col("rank_k") - F.col("base_n")
    return (
        vc.join(F.broadcast(base), on=keys)
        .where(
            (F.col("cum_in") >= need) & (F.col("cum_in") - F.col("cnt") < need)
        )
        .drop("cnt", "cum_in", "base_n")
        .withColumnRenamed("_v", "exact")
    )


# --- KMV / theta sketch (distinct-count SET ALGEBRA) -------------------
#
# Fourth member of the sketch family. HLL registers merge by max —
# union only: inclusion-exclusion gives an intersection but there is
# NO difference estimator (|A\B| compounds error catastrophically).
# The KMV / theta sketch (Bar-Yossef et al. 2002; Dasgupta et al.'s
# theta sketches) keeps the k SMALLEST distinct hash values: the
# sample is a uniform sample of the key space, so ANY set expression
# (union, intersection, difference) is estimated by evaluating it on
# the tiny samples below the shared threshold θ and scaling by M/θ.
# Same engine rules as CMS/HLL/DD: salted-md5 hashes (an oracle
# rebuilds the identical sample hash-for-hash), estimates cross the
# gate as fixed-point milli computed from one IEEE division of
# python-literal constants, and a sketch with fewer than k distinct
# keys IS the exact distinct set (θ = M, scale factor 1 — exact mode).

_KMV_HASH_BITS = 60
_KMV_M = 1 << _KMV_HASH_BITS


def kmv_hash(key_col: str, salt: str = "kmv-v1"):
    """60-bit salted-md5 — same recipe as the CMS/HLL hashes, so a SQL
    oracle reproduces it with ('0x' || substr(md5(..),1,15))::BIGINT."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def kmv_build(
    df: DataFrame, key_col: str, k: int = 256, salt: str = "kmv-v1"
) -> DataFrame:
    """Bottom-k distinct hashes: (hv). One distinct (map-side partial
    dedup — each task forwards its distinct hashes once) followed by
    a global bottom-k, which Spark executes as TakeOrderedAndProject:
    every partition forwards only ITS k smallest, the driver merges —
    no global sort, no full shuffle of the distinct set. The sketch
    is ≤ k rows however many petabytes were scanned."""
    return (
        df.select(kmv_hash(key_col, salt).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Bottom-k of the union of two bottom-k samples == the bottom-k
    of the union of the underlying sets (each input retains everything
    below its own θ ≥ the merged θ) — the mergeability that lets
    per-day/per-slice sketches fold without rescanning."""
    return a.unionByName(b).distinct().orderBy("hv").limit(k)


def kmv_set_estimates(
    a: DataFrame, b: DataFrame, k: int = 256
) -> DataFrame:
    """Full set algebra from two KMV samples, one output row:
    (theta, n_a, n_b, n_inter, a_est_milli, b_est_milli,
    union_est_milli, inter_est_milli, a_not_b_est_milli,
    b_not_a_est_milli).

    θ = min over the two sketches of (kth smallest hash, or M when
    the sketch holds its whole set). Every hash below θ is a uniform
    M/θ-rate sample of the key space VALID FOR BOTH SETS, so each
    expression is counted on the samples and scaled: est(S) =
    count·M/θ. est_milli = floor(count·(1000·M)/θ + 0.5) — the
    1000·M literal is exact in a double (125·2^63 fits the mantissa),
    count·C stays exact, and the single division is IEEE-identical
    in any engine; exact mode (θ = M) reduces to count·1000 exactly.

    Plan shape: the two ≤ k-row samples are tagged and unioned, one
    hash-group marks joint membership, the 1-row θ aggregate
    cross-joins in, and one final aggregate counts every expression —
    all driver-light, nothing proportional to the original data."""
    c_lit = float(1000 * _KMV_M)
    sa = a.agg(
        F.count("hv").alias("ka"), F.coalesce(F.max("hv"), F.lit(0)).alias("ma")
    )
    sb = b.agg(
        F.count("hv").alias("kb"), F.coalesce(F.max("hv"), F.lit(0)).alias("mb")
    )
    st = sa.crossJoin(sb).select(
        F.least(
            F.when(F.col("ka") >= k, F.col("ma")).otherwise(F.lit(_KMV_M)),
            F.when(F.col("kb") >= k, F.col("mb")).otherwise(F.lit(_KMV_M)),
        ).alias("theta")
    )
    tagged = (
        a.select("hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            b.select("hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    cnt = (
        tagged.crossJoin(F.broadcast(st))
        .where(F.col("hv") < F.col("theta"))
        .groupBy("theta")
        .agg(
            F.coalesce(F.sum("in_a"), F.lit(0)).alias("n_a"),
            F.coalesce(F.sum("in_b"), F.lit(0)).alias("n_b"),
            F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0)).alias(
                "n_inter"
            ),
        )
    )
    # degenerate both-empty case: tagged is empty, the groupBy above
    # yields no row — re-anchor on the θ row so the output is always
    # exactly one row with zero counts
    cnt = st.join(cnt, "theta", "left").select(
        "theta",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.coalesce("n_inter", F.lit(0)).alias("n_inter"),
    )

    def est(count_col, name: str):  # noqa: ANN001
        return (
            F.floor(
                (F.lit(c_lit) * count_col)
                / F.col("theta").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias(name)
        )

    return cnt.select(
        "theta",
        "n_a",
        "n_b",
        "n_inter",
        est(F.col("n_a"), "a_est_milli"),
        est(F.col("n_b"), "b_est_milli"),
        est(F.col("n_a") + F.col("n_b") - F.col("n_inter"), "union_est_milli"),
        est(F.col("n_inter"), "inter_est_milli"),
        est(F.col("n_a") - F.col("n_inter"), "a_not_b_est_milli"),
        est(F.col("n_b") - F.col("n_inter"), "b_not_a_est_milli"),
    )


def kmv_estimate(
    sample: DataFrame, k: int = 256, name: str = "est_milli"
) -> DataFrame:
    """Single-set cardinality from one KMV sample: θ = kth smallest
    (the sample max) in estimation mode, M in exact mode; survivors
    strictly below θ are k−1 (the θ hash itself is excluded) or the
    whole sample respectively — the classic (k−1)·M/θ_k unbiased KMV
    estimator, expressed with the same one-division fixed-point rule
    as kmv_set_estimates. One row: (n_sample, theta, <name>)."""
    c_lit = float(1000 * _KMV_M)
    st = sample.agg(
        F.count("hv").alias("n_sample"),
        F.coalesce(F.max("hv"), F.lit(_KMV_M)).alias("mx"),
    )
    theta = F.when(F.col("n_sample") >= k, F.col("mx")).otherwise(
        F.lit(_KMV_M)
    )
    survivors = F.when(
        F.col("n_sample") >= k, F.col("n_sample") - 1
    ).otherwise(F.col("n_sample"))
    return st.select(
        "n_sample",
        theta.alias("theta"),
        F.floor(
            (F.lit(c_lit) * survivors) / theta.cast("double") + F.lit(0.5)
        )
        .cast("long")
        .alias(name),
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequent-items summary)


def mg_candidates(
    items: DataFrame, item_col: str, capacity: int
) -> tuple[list, int]:
    """Per-partition Misra-Gries summaries → ``(candidates, n)``: the
    UNION of surviving items — a guaranteed SUPERSET of every item
    with global count > n/(capacity+1) — plus the exact global row
    count n, both from ONE scan with NO shuffle (each task emits its
    ≤ capacity survivors tagged with its partition id and row count).

    Classic MG (Misra & Gries 1982) with the batched merge rule from
    Agarwal et al., "Mergeable Summaries" (PODS 2012): fold each
    Arrow batch's value_counts into the counter table; when it
    exceeds ``capacity``, subtract the (capacity+1)-th largest count
    from every counter and drop the non-positive ones. Each
    subtraction of m is witnessed by ≥ capacity+1 counters, so total
    decrement per partition ≤ N_p/(capacity+1); an item with true
    partition count above that bound cannot reach zero. If global
    count(x) > N/(capacity+1) = Σ N_p/(capacity+1), then some
    partition has count_p(x) > N_p/(capacity+1) (averaging), so x
    survives there — no false negatives, ever, deterministically
    (unlike CMS there is no hash-collision error term).

    The driver-side result is BOUNDED by capacity × n_partitions
    regardless of data size (the whole point: at 100 TB the first
    pass returns ≤ a few thousand strings with no shuffle, and the
    exact second pass — a broadcast-semi filter + one aggregation —
    turns the superset into the exact heavy-hitter set).
    """
    def mg(batches):  # noqa: ANN001 - Arrow iterator
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            vc = pdf[item_col].value_counts()
            for val, cnt in vc.items():
                counters[val] = counters.get(val, 0) + int(cnt)
            if len(counters) > capacity:
                # (capacity+1)-th largest value; subtract from all
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - cut for k, v in counters.items() if v - cut > 0
                }
        # survivors tagged with this partition's exact row count; a
        # no-candidate partition still reports its count via NULL item
        vals = list(counters.keys()) or [None]
        yield pd.DataFrame(
            {
                "pid": [pid] * len(vals),
                item_col: vals,
                "part_rows": [n_rows] * len(vals),
            }
        )

    rows = items.mapInPandas(
        mg, f"pid int, {item_col} string, part_rows long"
    ).collect()
    total = sum({r.pid: r.part_rows for r in rows}.values())
    cands = sorted({r[1] for r in rows if r[1] is not None})
    return cands, total

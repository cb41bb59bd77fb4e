"""Generate a 10x scale replica of /root/testdata/sf0.1 for the sf1
bench smoke (BENCH_r07_sf1) — the empirical linearity check on every
"linear, never pairwise" docstring claim.

The testdata dirs are read-only and driver-owned, so sf1 lives inside
the repo at .testdata_sf1 (gitignored; ~10x sf0.1 bytes). Replication
is 10 copies with CONSISTENT key offsets (replica i shifts every key
family by i * its max-key bound, so FK joins fan out exactly like the
original) and deterministic content perturbation so the synthetic
corpus is not pathological:

- documents.text: every word in replica i>0 gets an ``_i`` suffix —
  replicas share no shingles, so near-dup density per doc stays
  ~constant instead of every doc gaining 9 exact near-twins (which
  would make ANY candidate-pair algorithm look superlinear for data
  reasons, not algorithmic ones);
- embeddings: replica vectors get a deterministic per-replica,
  per-component sinusoidal offset and are re-normalized to unit norm
  (the corpus invariant), spreading replicas away from their source
  instead of stacking 10 identical points in every IVF cell;
- events/orders/lineitem/etc: pure key-shifted copies — timestamps,
  amounts and distributions are unchanged, so per-key group sizes and
  join fan-outs match the original's shape at 10x the rows.

nation/region keep their fixed 25/5 rows (TPC-H semantics).

Usage: python tools/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
N_REPLICAS = 10

# key-family offsets = max key bound at sf0.1 (see TESTDATA.md).
# EVERY column that carries a key — primary OR foreign — must shift by
# its *referenced* family's offset, or replica i's facts point at
# replica-0 dims: orders would fan out 10x onto replica-0 customers
# while replicas 1-9 join nothing, a skew-degenerate corpus that makes
# any linearity measurement on joins meaningless (round-7 ADVICE).
_FAMILY = {
    "customer": 15_000,
    "orders": 150_000,
    "part": 20_000,
    "supplier": 1_000,
    "event": 100_000,
    "user": 1_500,
    "doc": 5_000,
    "vec": 2_000,
}
OFF = {
    # primary keys
    "c_custkey": _FAMILY["customer"],
    "o_orderkey": _FAMILY["orders"],
    "p_partkey": _FAMILY["part"],
    "s_suppkey": _FAMILY["supplier"],
    "event_id": _FAMILY["event"],
    # events.user_id JOINS customer.c_custkey (events_queries.py:968):
    # it must shift by the CUSTOMER offset so replica i's events hit
    # replica i's customers — the per-user group sizes are unchanged
    # (ids gain gaps, which no group-by cares about)
    "user_id": _FAMILY["customer"],
    "doc_id": _FAMILY["doc"],
    # embeddings.vec_id stands in for doc_id in rank fusion
    # (text_queries.py hybrid_retrieval_rrf): shift by the DOC offset
    # so replica i's vectors fuse with replica i's documents
    "vec_id": _FAMILY["doc"],
    # foreign keys → referenced family's offset
    "o_custkey": _FAMILY["customer"],
    "l_orderkey": _FAMILY["orders"],
    "l_partkey": _FAMILY["part"],
    "l_suppkey": _FAMILY["supplier"],
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".testdata_sf1")
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.session import get_spark
    from etl_sprint_2_5_spark.sources.parquet import load_table

    spark = get_spark("gen-sf1")
    t0 = time.time()

    for name in ("region", "nation"):
        load_table(spark, name, SRC).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    def shifted(name: str, i: int):
        df = load_table(spark, name, SRC)
        for col in df.columns:
            if col in OFF:
                df = df.withColumn(col, F.col(col) + F.lit(i * OFF[col]))
        return df

    def replicate(name: str, perturb=None) -> None:  # noqa: ANN001
        parts = []
        for i in range(N_REPLICAS):
            df = shifted(name, i)
            if perturb is not None:
                df = perturb(df, i)
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"  {name}: {time.time() - t0:.1f}s", flush=True)

    def perturb_docs(df, i: int):  # noqa: ANN001
        if i == 0:
            return df
        # Suffix must survive the engines' [a-z0-9]+ tokenizer as part
        # of the SAME token (``wordq3``, not ``word_3``): an underscore
        # splits, interleaving a standalone digit token between every
        # word pair, which degrades 3-shingles to de-facto unigrams
        # (df explodes ~150x) and doubles per-doc token counts.
        txt = F.regexp_replace(F.col("text"), r"([A-Za-z0-9]+)", f"$1q{i}")
        return df.withColumn("text", txt).withColumn("n_chars", F.length(txt))

    def perturb_vecs(df, i: int):  # noqa: ANN001
        if i == 0:
            return df
        bumped = F.transform(
            F.col("embedding"),
            lambda x, j: x
            + 0.2
            * F.sin(
                (F.col("vec_id") % 97).cast("double")
                + j.cast("double") * 0.61
                + F.lit(float(i)) * 2.3
            ),
        )
        norm = F.sqrt(F.aggregate(bumped, F.lit(0.0), lambda a, x: a + x * x))
        unit = F.transform(bumped, lambda x: (x / norm).cast("float"))
        return df.withColumn("embedding", unit)

    for name in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        replicate(name)
    replicate("documents", perturb_docs)
    replicate("embeddings", perturb_vecs)

    print(f"wrote {out} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()

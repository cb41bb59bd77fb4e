"""Structured Streaming IVM wrapper: change files → foreachBatch
rebuild → upsert, with Spark checkpointing giving resume semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.streaming.movie_pipelines import movie_pipelines
from etl_sprint_2_5_spark.streaming.sink import read_view
from etl_sprint_2_5_spark.streaming.structured import stream_pipeline
from tests.test_ivm import T0, loader, write_base


def _run_once(spark, pipe, feed_dir, schema, ld, ckpt):
    q = stream_pipeline(spark, pipe, feed_dir, schema, ld, ckpt)
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_applies_changes_and_resumes(spark, tmp_path):
    tmp = str(tmp_path)
    write_base(spark, tmp)
    ld = loader(spark, tmp)
    pipe = [p for p in movie_pipelines(f"{tmp}/gold") if p.name == "film_work.movies"][0]

    fw = ld("film_work")
    schema = fw.schema
    feed, ckpt = f"{tmp}/feed/film_work", f"{tmp}/ckpt/film_work"

    # batch 1: full snapshot as the initial backlog (backfill)
    fw.write.mode("overwrite").parquet(feed)
    _run_once(spark, pipe, feed, schema, ld, ckpt)
    view = read_view(spark, f"{tmp}/gold/movies_gold")
    assert view.count() == fw.count()

    # mutate 2 films in the base AND append only those rows to the feed
    t1 = T0 + dt.timedelta(hours=1)
    victims = [r["id"] for r in fw.orderBy("id").limit(2).collect()]
    updated = fw.withColumn(
        "title",
        F.when(F.col("id").isin(victims), F.lit("STREAMED EDIT")).otherwise(
            F.col("title")
        ),
    ).withColumn(
        "updated_at",
        F.when(F.col("id").isin(victims), F.lit(t1)).otherwise(F.col("updated_at")),
    )
    updated.write.mode("overwrite").parquet(f"{tmp}/base/film_work.parquet.new")
    import shutil
    shutil.rmtree(f"{tmp}/base/film_work.parquet")
    shutil.move(f"{tmp}/base/film_work.parquet.new", f"{tmp}/base/film_work.parquet")
    ld("film_work").where(F.col("id").isin(victims)).write.mode("append").parquet(feed)

    # new query instance, same checkpoint: only the appended file runs
    _run_once(spark, pipe, feed, schema, ld, ckpt)
    view = read_view(spark, f"{tmp}/gold/movies_gold")
    assert view.where(F.col("title") == "STREAMED EDIT").count() == 2
    assert view.count() == ld("film_work").count()  # upsert, no duplicates

"""Gold denormalized document builders for the movie star schema —
the exact shapes the CDC daemon rebuilds per batch
(/root/reference/postgres_to_es/daemon.py:160-196,249-271,296-321;
doc models daemon.py:43-77; FIXTURES.md §C).

Each builder takes the five normalized DataFrames and an optional
``only_ids`` frame restricting the rebuild to affected keys — the J6
semi-join the incremental driver pushes down so a CDC batch rebuilds
only its affected documents, never the full corpus.

Plan shape per doc type: bridge ⨝ dim (dim broadcast) → groupBy(fact
key) → collect_list(struct) → left join onto fact → NULL→[] coalesce
(P7, daemon.py:210-213). One shuffle per child family, partitioned by
the fact key throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.pipeline.normalize import (
    ROLE_ACTOR,
    ROLE_DIRECTOR,
    ROLE_WRITER,
    NormalizedTables,
)


def _restrict(df: DataFrame, only_ids: DataFrame | None, key: str) -> DataFrame:
    """J6: left-semi restrict to affected ids (broadcast — a CDC batch
    of keys is small by construction)."""
    if only_ids is None:
        return df
    return df.join(F.broadcast(only_ids.select(F.col("id").alias(key))), key, "left_semi")


def _role_struct_agg(role: str):  # noqa: ANN202
    """Filtered array-of-structs agg for one role (A2 one-pass form)."""
    entry = F.when(
        F.col("role") == role,
        F.struct(F.col("person_id").alias("id"), F.col("full_name").alias("name")),
    )
    return F.array_sort(F.collect_list(entry))


def movies_gold(t: NormalizedTables, only_ids: DataFrame | None = None) -> DataFrame:
    """MovieElastic shape (daemon.py:43-56): scalars + three
    role-filtered array<struct{id,name}> + four names arrays + genres.

    All four person/genre child aggregations come from TWO shuffles
    (one per bridge family), each a single groupBy producing every
    role column at once — not one query per role (contrast the
    reference's one lateral subquery per doc batch)."""
    fw = _restrict(t.film_work, only_ids, "id")

    persons = (
        _restrict(t.person_film_work, only_ids, "film_work_id")
        .join(F.broadcast(t.person.select(F.col("id").alias("person_id"), "full_name")),
              "person_id")
        .groupBy("film_work_id")
        .agg(
            _role_struct_agg(ROLE_ACTOR).alias("actors"),
            _role_struct_agg(ROLE_WRITER).alias("writers"),
            _role_struct_agg(ROLE_DIRECTOR).alias("directors"),
        )
    )
    genres = (
        _restrict(t.genre_film_work, only_ids, "film_work_id")
        .join(F.broadcast(t.genre.select(F.col("id").alias("genre_id"), "name")),
              "genre_id")
        .groupBy("film_work_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("genre_id").alias("id"), F.col("name")))
            ).alias("genres")
        )
    )

    def names(col: str):  # noqa: ANN202
        return F.transform(F.col(col), lambda x: x["name"])

    return (
        fw.join(persons, fw.id == persons.film_work_id, "left")
        .drop("film_work_id")
        .join(genres, fw.id == genres.film_work_id, "left")
        .drop("film_work_id")
        .select(
            "id",
            F.col("rating").alias("imdb_rating"),
            "title",
            "description",
            *[
                F.coalesce(c, F.array()).alias(c)
                for c in ("actors", "writers", "directors", "genres")
            ],
        )
        .select(
            "id",
            "imdb_rating",
            "title",
            "description",
            "actors",
            "writers",
            "directors",
            "genres",
            names("actors").alias("actors_names"),
            names("writers").alias("writers_names"),
            names("directors").alias("directors_names"),
            names("genres").alias("genres_names"),
        )
    )


def persons_gold(t: NormalizedTables, only_ids: DataFrame | None = None) -> DataFrame:
    """PersonElastic shape (daemon.py:65-70): roles as a sorted set,
    film_ids as a sorted distinct array (daemon.py:283-286)."""
    p = _restrict(t.person, only_ids, "id")
    agg = (
        _restrict(t.person_film_work, only_ids, "person_id")
        .groupBy("person_id")
        .agg(
            F.array_sort(F.collect_set("role")).alias("roles"),
            F.array_sort(F.collect_set("film_work_id")).alias("film_ids"),
        )
    )
    return (
        p.join(agg, p.id == agg.person_id, "left")
        .select(
            "id",
            "full_name",
            F.coalesce("roles", F.array()).alias("roles"),
            F.coalesce("film_ids", F.array()).alias("film_ids"),
        )
    )


def genres_gold(t: NormalizedTables, only_ids: DataFrame | None = None) -> DataFrame:
    """GenreElastic shape (daemon.py:73-77): per-genre filmworks
    array<struct{id,title,imdb_rating}> (daemon.py:302-317)."""
    g = _restrict(t.genre, only_ids, "id")
    agg = (
        _restrict(t.genre_film_work, only_ids, "genre_id")
        .join(
            t.film_work.select(
                F.col("id").alias("film_work_id"), "title", "rating"
            ),
            "film_work_id",
        )
        .groupBy("genre_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("film_work_id").alias("id"),
                        "title",
                        F.col("rating").alias("imdb_rating"),
                    )
                )
            ).alias("filmworks")
        )
    )
    return (
        g.join(agg, g.id == agg.genre_id, "left")
        .select("id", "name", F.coalesce("filmworks", F.array()).alias("filmworks"))
    )

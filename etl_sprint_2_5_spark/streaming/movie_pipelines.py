"""The reference daemon's seven pipelines as IVM configs
(/root/reference/postgres_to_es/daemon.py:497-535).

Change in ANY of the five base tables propagates to the movies view;
person/genre changes additionally rebuild their own views. Cursor
fields mirror the reference: ``updated_at`` for entity tables,
``created_at`` for junction tables (daemon.py:514,519,526,533 —
junction rows are insert-only there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_sprint_2_5_spark.pipeline.movie_gold import (
    genres_gold,
    movies_gold,
    persons_gold,
)
from etl_sprint_2_5_spark.pipeline.normalize import NormalizedTables
from etl_sprint_2_5_spark.streaming.ivm import FanOut, Pipeline, TableLoader


def _tables(load: TableLoader) -> NormalizedTables:
    return NormalizedTables(
        film_work=load("film_work"),
        genre=load("genre"),
        person=load("person"),
        genre_film_work=load("genre_film_work"),
        person_film_work=load("person_film_work"),
    )


def _movies(load: TableLoader, ids: DataFrame) -> DataFrame:
    return movies_gold(_tables(load), only_ids=ids)


def _persons(load: TableLoader, ids: DataFrame) -> DataFrame:
    return persons_gold(_tables(load), only_ids=ids)


def _genres(load: TableLoader, ids: DataFrame) -> DataFrame:
    return genres_gold(_tables(load), only_ids=ids)


def movie_pipelines(sink_dir: str, batch_size: int = 1000) -> list[Pipeline]:
    movies_sink = f"{sink_dir}/movies_gold"
    persons_sink = f"{sink_dir}/persons_gold"
    genres_sink = f"{sink_dir}/genres_gold"
    return [
        # fact table changed → its own docs (J8 identity)
        Pipeline("film_work.movies", "film_work", "updated_at", "id",
                 FanOut(), _movies, movies_sink, batch_size=batch_size),
        # dim changed → docs via bridge (J7)
        Pipeline("person.movies", "person", "updated_at", "id",
                 FanOut(bridge="person_film_work", join_field="person_id",
                        select_field="film_work_id"),
                 _movies, movies_sink, batch_size=batch_size),
        Pipeline("genre.movies", "genre", "updated_at", "id",
                 FanOut(bridge="genre_film_work", join_field="genre_id",
                        select_field="film_work_id"),
                 _movies, movies_sink, batch_size=batch_size),
        # bridge row changed → pluck the fact FK (J8)
        Pipeline("person_film_work.movies", "person_film_work", "created_at", "id",
                 FanOut(id_field="film_work_id"), _movies, movies_sink,
                 batch_size=batch_size),
        Pipeline("genre_film_work.movies", "genre_film_work", "created_at", "id",
                 FanOut(id_field="film_work_id"), _movies, movies_sink,
                 batch_size=batch_size),
        # dims maintain their own views too
        Pipeline("person.persons", "person", "updated_at", "id",
                 FanOut(), _persons, persons_sink, batch_size=batch_size),
        Pipeline("genre.genres", "genre", "updated_at", "id",
                 FanOut(), _genres, genres_sink, batch_size=batch_size),
    ]

"""Batch full-load normalization: legacy dirty movie tables → the
5-table star schema (SURVEY.md §3.1; reference
/root/reference/sqlite_to_postgresql/etl.py:62-202).

The reference does this row-at-a-time in driver memory (dict loops,
uuid4 minting, hand-built multimaps). Here the whole job is one
declarative plan per output table:

- P2 sentinel cleansing (etl.py:38-59) → ``when(isin(...), NULL)``
- P3 invalid-dimension exclusion (etl.py:69-85,92-93,102) →
  name-null filter + left-semi join of bridges onto surviving dims
- F1/F2 list-in-string and JSON-in-string parsing (etl.py:98-103,
  models.py:17-23) → split/from_json + explode
- A4 genre dedup-by-name (etl.py:120-125) → distinct + key minting
- A5/U1 person universe across roles (etl.py:139-194) → unionByName
  of (movie, name, role) frames → distinct
- J9 old-id→name lookups (etl.py:174-185) → broadcast joins

**Key minting (the §7 'hard part'):** the reference mints ``uuid4()``
per entity (etl.py:123,161,189,193), which is nondeterministic across
recomputation — a lost partition would re-mint and orphan every
referencing bridge row. We mint ids deterministically from the natural
key (md5 → UUID-format text): same input ⇒ same id on any recompute,
no cache/checkpoint dependence, and dims stay joinable-by-construction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.functions.kernel import clean_sentinels, json_ids, to_double

ROLE_ACTOR = "actor"
ROLE_WRITER = "writer"
ROLE_DIRECTOR = "director"


def minted_uuid(namespace: str, natural_key: Column) -> Column:
    """Deterministic UUID-format id from a natural key.

    md5 hex reshaped to 8-4-4-4-12. Unlike uuid4 (etl.py:123), stable
    across recomputation — see module docstring.
    """
    h = F.md5(F.concat(F.lit(namespace + ":"), natural_key))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


@dataclass
class NormalizedTables:
    """The 5-table output star schema (postgres_init.sql:1-55 shape)."""

    film_work: DataFrame
    genre: DataFrame
    person: DataFrame
    genre_film_work: DataFrame
    person_film_work: DataFrame


def _clean_movies(legacy_movies: DataFrame) -> DataFrame:
    """P2 cleansing + typed casts on the legacy movie rows."""
    m = legacy_movies
    return m.select(
        F.col("id").alias("movie_id"),
        F.col("title"),
        clean_sentinels("plot").alias("description"),
        to_double("imdb_rating").alias("rating"),
        clean_sentinels("genre").alias("genre_csv"),
        clean_sentinels("director").alias("director_csv"),
        clean_sentinels("writer").alias("writer_id"),
        clean_sentinels("writers").alias("writers_json"),
    )


def _role_universe(
    movies: DataFrame,
    legacy_actors: DataFrame,
    legacy_writers: DataFrame,
    legacy_movie_actors: DataFrame,
) -> DataFrame:
    """U1/A5: one (movie_id, full_name, role) frame across all roles.

    Person identity is full_name (etl.py:139-194 keys its multimap by
    name) — the same name appearing as actor and writer is ONE person.
    """
    valid_actors = legacy_actors.where(
        clean_sentinels("name").isNotNull()
    ).select(F.col("id").cast("string").alias("actor_id"), F.col("name"))
    valid_writers = legacy_writers.where(clean_sentinels("name").isNotNull()).select(
        F.col("id").alias("writer_id"), F.col("name")
    )

    # actors: bridge rows → names (P3: invalid dims excluded via the
    # inner join; broadcast — dims are small relative to bridges)
    actors = (
        legacy_movie_actors.select(
            "movie_id", F.col("actor_id").cast("string").alias("actor_id")
        )
        .distinct()
        .join(F.broadcast(valid_actors), "actor_id")
        .select("movie_id", F.col("name").alias("full_name"), F.lit(ROLE_ACTOR).alias("role"))
    )

    # writers: the JSON `writers` array when present, else the single
    # legacy `writer` id column as FALLBACK (etl.py:95-101: `if
    # movie["writers"]: ... else: [movie["writer"]]` — a movie with
    # both populated must NOT gain a credit from the legacy column);
    # writers_json is sentinel-cleaned to NULL, so isNotNull() is
    # exactly the reference's truthiness test. Deduped per movie.
    writer_ids = movies.select(
        "movie_id",
        F.explode(
            F.array_distinct(
                F.when(
                    F.col("writers_json").isNotNull(),
                    F.coalesce(json_ids("writers_json"), F.array()),
                ).otherwise(
                    F.when(
                        F.col("writer_id").isNotNull(), F.array("writer_id")
                    ).otherwise(F.array())
                )
            )
        ).alias("writer_id"),
    )
    writers = writer_ids.join(F.broadcast(valid_writers), "writer_id").select(
        "movie_id", F.col("name").alias("full_name"), F.lit(ROLE_WRITER).alias("role")
    )

    # directors: comma-separated names directly on the movie row
    directors = movies.select(
        "movie_id",
        F.explode(F.array_distinct(F.split("director_csv", ", "))).alias("full_name"),
        F.lit(ROLE_DIRECTOR).alias("role"),
    ).where(clean_sentinels("full_name").isNotNull())

    return actors.unionByName(writers).unionByName(directors).distinct()


def normalize(
    legacy_movies: DataFrame,
    legacy_actors: DataFrame,
    legacy_writers: DataFrame,
    legacy_movie_actors: DataFrame,
) -> NormalizedTables:
    """Full-load migration plan; returns the five normalized frames.

    Every output id is deterministic (minted_uuid), so the frames can
    be recomputed independently — no driver-memory state carried
    between tables (contrast etl.py:120-194's mutable caches).
    """
    now = F.current_timestamp()
    movies = _clean_movies(legacy_movies)

    film_work = movies.select(
        minted_uuid("film_work", F.col("movie_id")).alias("id"),
        F.col("movie_id").alias("source_id"),
        "title",
        "description",
        F.lit(None).cast("date").alias("creation_date"),
        F.lit(None).cast("string").alias("certificate"),
        F.lit(None).cast("string").alias("file_path"),
        F.col("rating"),
        F.lit("movie").alias("type"),
        now.alias("created_at"),
        now.alias("updated_at"),
    )

    # A4: genre dim deduped by name, one minted id per distinct name
    movie_genres = movies.select(
        "movie_id",
        F.explode(F.array_distinct(F.split("genre_csv", ", "))).alias("name"),
    ).where(clean_sentinels("name").isNotNull())
    genre = (
        movie_genres.select("name")
        .distinct()
        .select(
            minted_uuid("genre", F.col("name")).alias("id"),
            "name",
            F.lit(None).cast("string").alias("description"),
            now.alias("created_at"),
            now.alias("updated_at"),
        )
    )

    universe = _role_universe(
        movies, legacy_actors, legacy_writers, legacy_movie_actors
    )
    person = (
        universe.select("full_name")
        .distinct()
        .select(
            minted_uuid("person", F.col("full_name")).alias("id"),
            "full_name",
            F.lit(None).cast("date").alias("birth_date"),
            now.alias("created_at"),
            now.alias("updated_at"),
        )
    )

    # bridges join back on natural keys; minted ids make the joins
    # pure recomputation (no uuid4 capture problem). Unique-index
    # invariants (postgres_init.sql:42,55) hold via the distincts.
    genre_film_work = movie_genres.select(
        minted_uuid("gfw", F.concat_ws("|", "movie_id", "name")).alias("id"),
        minted_uuid("film_work", F.col("movie_id")).alias("film_work_id"),
        minted_uuid("genre", F.col("name")).alias("genre_id"),
        now.alias("created_at"),
    )
    person_film_work = universe.select(
        minted_uuid("pfw", F.concat_ws("|", "movie_id", "full_name", "role")).alias("id"),
        minted_uuid("film_work", F.col("movie_id")).alias("film_work_id"),
        minted_uuid("person", F.col("full_name")).alias("person_id"),
        "role",
        now.alias("created_at"),
    )

    return NormalizedTables(
        film_work=film_work,
        genre=genre,
        person=person,
        genre_film_work=genre_film_work,
        person_film_work=person_film_work,
    )

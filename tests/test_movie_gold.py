"""Gold document builders vs the pure-Python oracle: full build and
affected-ids-restricted build must agree (the J6 restriction must not
change any produced document)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.pipeline.movie_gold import (
    genres_gold,
    movies_gold,
    persons_gold,
)
from etl_sprint_2_5_spark.pipeline.normalize import normalize
from tests.fixtures_legacy import as_dataframes
from tests.test_normalize import python_oracle


@pytest.fixture(scope="module")
def norm(spark):
    t = normalize(*as_dataframes(spark))
    for df in (t.film_work, t.genre, t.person, t.genre_film_work, t.person_film_work):
        df.cache()
    return t


def test_movies_gold_matches_oracle(norm):
    film_rows, genres_per_movie, roles = python_oracle()
    src = {r["id"]: r["source_id"] for r in norm.film_work.collect()}
    docs = {src[r["id"]]: r for r in movies_gold(norm).collect()}
    assert set(docs) == set(film_rows)
    for mid, doc in docs.items():
        for role, col in (("actor", "actors_names"), ("writer", "writers_names"),
                          ("director", "directors_names")):
            expected = sorted(n for m, n, ro in roles if m == mid and ro == role)
            assert sorted(doc[col]) == expected, (mid, role)
        assert sorted(doc["genres_names"]) == sorted(genres_per_movie.get(mid, []))
        assert doc["imdb_rating"] == film_rows[mid]["rating"]
        # structs and names arrays are consistent
        assert [a["name"] for a in doc["actors"]] == list(doc["actors_names"])


def test_persons_gold_matches_oracle(norm):
    _, _, roles = python_oracle()
    by_name: dict[str, set[str]] = {}
    films_by_name: dict[str, set[str]] = {}
    for m, n, r in roles:
        by_name.setdefault(n, set()).add(r)
        films_by_name.setdefault(n, set()).add(m)
    src = {r["id"]: r["source_id"] for r in norm.film_work.collect()}
    got = {r["full_name"]: r for r in persons_gold(norm).collect()}
    assert set(got) == set(by_name)
    for name, doc in got.items():
        assert set(doc["roles"]) == by_name[name]
        assert {src[f] for f in doc["film_ids"]} == films_by_name[name]


def test_genres_gold_matches_oracle(norm):
    film_rows, genres_per_movie, _ = python_oracle()
    src = {r["id"]: r["source_id"] for r in norm.film_work.collect()}
    got = {r["name"]: r for r in genres_gold(norm).collect()}
    for name, doc in got.items():
        expected = {m for m, gs in genres_per_movie.items() if name in gs}
        assert {src[f["id"]] for f in doc["filmworks"]} == expected
        for f in doc["filmworks"]:
            assert f["imdb_rating"] == film_rows[src[f["id"]]]["rating"]


def test_restricted_build_equals_full_slice(spark, norm):
    # pick 5 film ids; restricted rebuild must equal the full build's slice
    ids = [r["id"] for r in norm.film_work.limit(5).collect()]
    only = spark.createDataFrame([(i,) for i in ids], ["id"])
    full = {r["id"]: r for r in movies_gold(norm).where(F.col("id").isin(ids)).collect()}
    restricted = {r["id"]: r for r in movies_gold(norm, only_ids=only).collect()}
    assert full == restricted

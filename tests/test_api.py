"""Serving-layer tests (Q1-Q5) over gold views built from the fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.api.query import (
    BadRequest,
    ListParams,
    admin_movie_list,
    get_movie,
    list_movies,
)
from etl_sprint_2_5_spark.pipeline.movie_gold import movies_gold
from etl_sprint_2_5_spark.pipeline.normalize import normalize
from tests.fixtures_legacy import as_dataframes


@pytest.fixture(scope="module")
def movies(spark):
    return movies_gold(normalize(*as_dataframes(spark))).cache()


def test_point_lookup_and_404(movies):
    some_id = movies.limit(1).collect()[0]["id"]
    assert get_movie(movies, some_id)["id"] == some_id
    assert get_movie(movies, "no-such-id") is None


def test_param_validation():
    with pytest.raises(BadRequest):
        ListParams(limit=0)
    with pytest.raises(BadRequest):
        ListParams(page=-1)
    with pytest.raises(BadRequest):
        ListParams(sort="plot")
    with pytest.raises(BadRequest):
        ListParams(sort_order="sideways")


def test_list_sorted_pages_are_disjoint_and_ordered(movies):
    p1 = list_movies(movies, ListParams(limit=10, page=1, sort="title"))
    p2 = list_movies(movies, ListParams(limit=10, page=2, sort="title"))
    t1 = [r["title"] for r in p1.collect()]
    t2 = [r["title"] for r in p2.collect()]
    assert t1 == sorted(t1) and t2 == sorted(t2)
    assert max(t1) <= min(t2)
    assert len(t1) == 10


def test_sort_desc_by_rating(movies):
    got = list_movies(
        movies, ListParams(limit=5, sort="imdb_rating", sort_order="desc")
    ).collect()
    ratings = [r["imdb_rating"] for r in got]
    assert ratings == sorted(ratings, reverse=True)


def test_search_ranks_title_match_first(movies):
    target = movies.limit(1).collect()[0]
    term = target["title"].split()[-1].lower().strip("#")  # '#003' style token
    got = list_movies(movies, ListParams(search=target["title"])).collect()
    assert got, "search returned nothing"
    assert any(r["id"] == target["id"] for r in got)
    assert all(r["score"] > 0 for r in got)
    del term


def test_admin_envelope_matches_reference_contract(movies):
    """Envelope parity with the reference's documented admin API
    (movie_admin/openapi.yml + the MovieListResult dataclass in
    movie_admin/api/v1/views.py:17-23 — the openapi file is not
    parseable YAML, so the executable dataclass is the envelope
    source of truth; the Movie item fields are regexed out of the
    openapi text)."""
    import re
    from pathlib import Path

    ref = Path("/root/reference/movie_admin")
    views = (ref / "movie_admin/api/v1/views.py").read_text()
    m = re.search(
        r"class MovieListResult:\n((?:    \w+:.*\n)+)", views
    )
    assert m, "reference MovieListResult dataclass not found"
    ref_keys = re.findall(r"    (\w+):", m.group(1))

    env = admin_movie_list(movies, page=1, per_page=20)
    assert list(env.keys()) == ref_keys  # count/total_pages/prev/next/results

    # the openapi text documents the same four meta keys (its `result`
    # vs the implementation's `results` is a known reference-side
    # openapi/code discrepancy — the dataclass above is what the API
    # actually returns)
    openapi = (ref / "openapi.yml").read_text()
    for key in ("count", "total_pages", "prev", "next"):
        assert re.search(rf"^\s+{key}:\n\s+type: integer", openapi, re.M), key

    # prev/next None-at-edges semantics mirror Django's paginator
    # (views.py:54-55: previous_page_number if has_previous else None)
    assert env["prev"] is None
    last = admin_movie_list(movies, page=env["total_pages"], per_page=20)
    assert last["next"] is None and last["prev"] == env["total_pages"] - 1


def test_admin_envelope(movies):
    env = admin_movie_list(movies, page=1, per_page=20)
    n = movies.count()
    assert env["count"] == n
    assert env["total_pages"] == -(-n // 20)
    assert env["prev"] is None and env["next"] == 2
    titles = [r["title"] for r in env["results"].collect()]
    assert titles == sorted(titles) and len(titles) == 20
    last = admin_movie_list(movies, page=env["total_pages"], per_page=20)
    assert last["next"] is None


def test_search_ru_en_analyzer(spark):
    """The analyzer='ru_en' search path matches inflected Russian and
    stemmed English the way the reference's ES ru_en analyzer does
    (movies.es.schema.json:4-40)."""
    rows = [
        ("m1", "Бегущая по волнам", "приключения по роману Грина",
         ["Драма"], ["Актёр Один"], [], []),
        ("m2", "The Running Man", "dystopian running adventure",
         ["Action"], ["Arnold"], [], []),
        ("m3", "Зелёная миля", "тюремная драма",
         ["Драма"], [], [], []),
    ]
    movies = spark.createDataFrame(
        rows,
        "id string, title string, description string, "
        "genres_names array<string>, actors_names array<string>, "
        "writers_names array<string>, directors_names array<string>",
    ).withColumn("imdb_rating", F.lit(5.0))
    # inflected query: 'бегущие' stems to 'бегущ', matching m1 and...
    # m2 only via 'running'→'run' if the query also carries it
    got = list_movies(
        movies, ListParams(search="бегущие runs", analyzer="ru_en")
    ).collect()
    ids = {r["id"] for r in got}
    assert ids == {"m1", "m2"}
    # plain analyzer finds nothing for the inflected forms
    assert not list_movies(movies, ListParams(search="бегущие runs")).collect()
    # bad analyzer name is a 422
    with pytest.raises(BadRequest):
        ListParams(search="x", analyzer="de")

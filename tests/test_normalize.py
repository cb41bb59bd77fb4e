"""Golden tests for the normalization batch job (SURVEY §3.1 parity).

The oracle is an independent pure-Python reimplementation of the
reference's dict-loop semantics (etl.py:62-202) run over the same
fixture — the engine's declarative plan must agree with it exactly on
every derived relation (modulo minted surrogate ids, which we compare
through natural keys).
"""

from __future__ import annotations

import json

import pytest

from etl_sprint_2_5_spark.pipeline.normalize import normalize
from tests.fixtures_legacy import as_dataframes, make_legacy

SENTINELS = {"N/A", ""}


def python_oracle(seed=42, n_movies=60):
    """Reference semantics, straight port of etl.py:62-202 over dicts."""
    movies, actors, writers, movie_actors = make_legacy(seed, n_movies)
    actor_name = {str(i): n for i, n in dict(actors).items() if n not in SENTINELS}
    writer_name = {w: n for w, n in writers if n not in SENTINELS}
    bridge = sorted(set(movie_actors))

    genres_per_movie: dict[str, list[str]] = {}
    roles: set[tuple[str, str, str]] = set()  # (movie, full_name, role)
    film_rows = {}
    for (mid, genre, director, writer, title, plot, _r, imdb, writers_json) in movies:
        film_rows[mid] = {
            "title": title,
            "description": None if plot in SENTINELS else plot,
            "rating": None if imdb in SENTINELS else float(imdb),
        }
        if genre not in SENTINELS:
            seen = []
            for g in genre.split(", "):
                if g not in seen:
                    seen.append(g)
            genres_per_movie[mid] = seen
        if director not in SENTINELS:
            for d in dict.fromkeys(director.split(", ")):
                roles.add((mid, d, "director"))
        # etl.py:95-101: JSON array wins when truthy; the legacy
        # writer column is only the fallback
        if writers_json not in SENTINELS:
            wids = [w["id"] for w in json.loads(writers_json)]
        elif writer not in SENTINELS:
            wids = [writer]
        else:
            wids = []
        for w in dict.fromkeys(wids):
            if w in writer_name:
                roles.add((mid, writer_name[w], "writer"))
    for mid, aid in bridge:
        if aid in actor_name and mid in film_rows:
            roles.add((mid, actor_name[aid], "actor"))
    return film_rows, genres_per_movie, roles


@pytest.fixture(scope="module")
def normalized(spark):
    t = normalize(*as_dataframes(spark))
    for df in (t.film_work, t.genre, t.person, t.genre_film_work, t.person_film_work):
        df.cache()
    return t


def test_film_work_matches_oracle(normalized):
    film_rows, _, _ = python_oracle()
    got = {
        r["source_id"]: (r["title"], r["description"], r["rating"])
        for r in normalized.film_work.collect()
    }
    assert set(got) == set(film_rows)
    for mid, exp in film_rows.items():
        assert got[mid] == (exp["title"], exp["description"], exp["rating"])


def test_genre_dim_and_bridge_match_oracle(normalized):
    _, genres_per_movie, _ = python_oracle()
    expected_names = sorted({g for gs in genres_per_movie.values() for g in gs})
    assert sorted(r["name"] for r in normalized.genre.collect()) == expected_names

    gid_to_name = {r["id"]: r["name"] for r in normalized.genre.collect()}
    fw_to_src = {
        r["id"]: r["source_id"] for r in normalized.film_work.collect()
    }
    got_pairs = {
        (fw_to_src[r["film_work_id"]], gid_to_name[r["genre_id"]])
        for r in normalized.genre_film_work.collect()
    }
    exp_pairs = {(m, g) for m, gs in genres_per_movie.items() for g in gs}
    assert got_pairs == exp_pairs


def test_person_universe_and_roles_match_oracle(normalized):
    _, _, roles = python_oracle()
    pid_to_name = {r["id"]: r["full_name"] for r in normalized.person.collect()}
    fw_to_src = {r["id"]: r["source_id"] for r in normalized.film_work.collect()}
    got = {
        (fw_to_src[r["film_work_id"]], pid_to_name[r["person_id"]], r["role"])
        for r in normalized.person_film_work.collect()
    }
    assert got == roles
    # person dim is exactly the distinct name universe
    assert set(pid_to_name.values()) == {n for _, n, _ in roles}


def test_unique_index_invariants(normalized):
    # postgres_init.sql:42,55 unique constraints hold by construction
    gfw = normalized.genre_film_work
    assert gfw.count() == gfw.select("film_work_id", "genre_id").distinct().count()
    pfw = normalized.person_film_work
    assert (
        pfw.count()
        == pfw.select("film_work_id", "person_id", "role").distinct().count()
    )


def test_minting_is_deterministic_across_recompute(spark, normalized):
    # the §7 hard part: ids must not change when the plan re-executes
    again = normalize(*as_dataframes(spark))
    a = sorted(r["id"] for r in normalized.person.collect())
    b = sorted(r["id"] for r in again.person.collect())
    assert a == b

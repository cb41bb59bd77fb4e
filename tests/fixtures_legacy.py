"""Deterministic dirty legacy-movie fixture (FIXTURES.md §A schemas).

Seeded generation of the four legacy tables with every anomaly the
reference handles: "N/A"/"" sentinels, comma-separated lists with
intra-row duplicates, JSON-in-string writers with duplicate ids,
int-as-text FKs, duplicate bridge rows, sentinel-named dimension rows.
"""

from __future__ import annotations

import json
import random

GENRES = ["Action", "Drama", "Sci-Fi", "Comedy", "Thriller", "Romance"]
NAMES = [f"Person {chr(65 + i)}{chr(65 + j)}" for i in range(6) for j in range(6)]


def make_legacy(seed: int = 42, n_movies: int = 60):
    rng = random.Random(seed)

    actors = []  # (id:int, name)
    for i in range(1, 81):
        name = rng.choice(NAMES)
        if rng.random() < 0.05:
            name = rng.choice(["N/A", ""])
        actors.append((i, name))
    # full-row duplicates (scan uses SELECT DISTINCT — etl.py:68)
    actors += actors[:5]

    writers = []  # (id:40hex, name)
    for i in range(40):
        wid = f"{i:040x}"
        name = rng.choice(NAMES)
        if rng.random() < 0.05:
            name = rng.choice(["N/A", ""])
        writers.append((wid, name))

    movies = []
    for i in range(n_movies):
        mid = f"tt{i:07d}"
        genre = ", ".join(
            rng.choices(GENRES, k=rng.randint(1, 3))  # dups within row allowed
        )
        if rng.random() < 0.07:
            genre = rng.choice(["N/A", ""])
        director = ", ".join(rng.sample(NAMES, rng.randint(1, 2)))
        if rng.random() < 0.3:
            director = "N/A"
        plot = f"plot of movie {i}"
        if rng.random() < 0.25:
            plot = "N/A"
        rating = f"{rng.uniform(1, 10):.1f}"
        if rng.random() < 0.1:
            rating = "N/A"
        roll = rng.random()
        if roll < 0.4:
            writer, writers_json = rng.choice(writers)[0], ""
        elif roll < 0.85:
            ids = [rng.choice(writers)[0] for _ in range(rng.randint(1, 3))]
            ids += ids[:1]  # duplicate id inside the JSON (etl.py:102-103)
            writer = ""
            writers_json = json.dumps([{"id": w} for w in ids])
        else:
            # BOTH populated: the JSON array must win and the legacy
            # writer column be ignored (etl.py:95-101 fallback shape)
            ids = [rng.choice(writers)[0] for _ in range(rng.randint(1, 2))]
            writer = rng.choice(writers)[0]
            writers_json = json.dumps([{"id": w} for w in ids])
        movies.append(
            (mid, genre, director, writer, title_of(i), plot, None, rating, writers_json)
        )

    movie_actors = []
    for _ in range(200):
        mid = f"tt{rng.randrange(n_movies):07d}"
        aid = str(rng.randint(1, 80))
        movie_actors.append((mid, aid))
    movie_actors += movie_actors[:10]  # duplicate bridge rows (etl.py:87)

    return movies, actors, writers, movie_actors


def title_of(i: int) -> str:
    return f"Movie #{i:03d}"


MOVIE_COLS = [
    "id", "genre", "director", "writer", "title", "plot",
    "ratings", "imdb_rating", "writers",
]


def as_dataframes(spark, seed: int = 42, n_movies: int = 60):
    movies, actors, writers, movie_actors = make_legacy(seed, n_movies)
    return (
        spark.createDataFrame(
            movies,
            "id string, genre string, director string, writer string, "
            "title string, plot string, ratings string, imdb_rating string, "
            "writers string",
        ),
        spark.createDataFrame(actors, "id long, name string"),
        spark.createDataFrame(writers, "id string, name string"),
        spark.createDataFrame(movie_actors, "movie_id string, actor_id string"),
    )

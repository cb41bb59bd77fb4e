"""Schema registry: explicit StructTypes for every table the engine reads.

The reference declares schemas in three places that must agree (SQL DDL
``sqlite_to_postgresql/postgres_init.sql``, Django models, pydantic
models — see SURVEY.md §1.2); here there is exactly one registry and
readers never rely on inference in production paths.

Two schema families:

1. TESTDATA — the driver's TPC-H-ish synthetic tables
   (/root/testdata/sf*/ — region nation customer supplier part orders
   lineitem events documents embeddings).
2. MOVIE DOMAIN — the reference's star schema (film_work, person,
   genre + 2 junction tables; /root/reference/sqlite_to_postgresql/
   postgres_init.sql:1-55), its dirty legacy source, and the gold
   nested-document shapes (/root/reference/postgres_to_es/daemon.py:43-77).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# 1. Driver testdata tables
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)

# ---------------------------------------------------------------------------
# 2. Movie domain — legacy dirty source
#    (mirrors sqlite_to_postgresql/db.sqlite; dirt rules FIXTURES.md §A)
# ---------------------------------------------------------------------------

LEGACY_MOVIES = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("genre", StringType()),  # comma-separated, "N/A"/"" dirt
        StructField("director", StringType()),  # comma-separated, "N/A" dirt
        StructField("writer", StringType()),  # single 40-hex id or ""
        StructField("title", StringType(), nullable=False),
        StructField("plot", StringType()),  # "N/A" dirt
        StructField("ratings", StringType()),  # unused by pipeline
        StructField("imdb_rating", StringType()),  # float-as-text / "N/A"
        StructField("writers", StringType()),  # JSON '[{"id": ...}]' or ""
    ]
)

LEGACY_ACTORS = StructType(
    [
        StructField("id", LongType(), nullable=False),
        StructField("name", StringType()),  # "N/A"/"" rows are excluded
    ]
)

LEGACY_WRITERS = StructType(
    [
        StructField("id", StringType(), nullable=False),  # 40-hex
        StructField("name", StringType()),
    ]
)

LEGACY_MOVIE_ACTORS = StructType(
    [
        StructField("movie_id", StringType(), nullable=False),
        StructField("actor_id", StringType(), nullable=False),  # int-as-text
    ]
)

# ---------------------------------------------------------------------------
# 3. Movie domain — normalized star schema
#    (postgres_init.sql:1-55; CDC columns created_at/updated_at)
# ---------------------------------------------------------------------------

FILM_WORK = StructType(
    [
        StructField("id", StringType(), nullable=False),  # uuid text
        StructField("title", StringType(), nullable=False),
        StructField("description", StringType()),
        StructField("creation_date", DateType()),
        StructField("certificate", StringType()),
        StructField("file_path", StringType()),
        StructField("rating", DoubleType()),
        StructField("type", StringType()),  # movie | series | tv_show
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
    ]
)

PERSON = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("full_name", StringType(), nullable=False),
        StructField("birth_date", DateType()),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
    ]
)

GENRE = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("name", StringType(), nullable=False),
        StructField("description", StringType()),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
    ]
)

PERSON_FILM_WORK = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("film_work_id", StringType(), nullable=False),
        StructField("person_id", StringType(), nullable=False),
        StructField("role", StringType(), nullable=False),  # actor|director|writer
        StructField("created_at", TimestampType()),
    ]
)

GENRE_FILM_WORK = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("film_work_id", StringType(), nullable=False),
        StructField("genre_id", StringType(), nullable=False),
        StructField("created_at", TimestampType()),
    ]
)

STAR_SCHEMAS: dict[str, StructType] = {
    "film_work": FILM_WORK,
    "person": PERSON,
    "genre": GENRE,
    "person_film_work": PERSON_FILM_WORK,
    "genre_film_work": GENRE_FILM_WORK,
}

# Valid enum domains (CHECK-style validation filters; reference
# movie_admin/movie_admin/models.py:41-52,81-85).
ROLE_DOMAIN = ("actor", "director", "writer")
FILM_TYPE_DOMAIN = ("movie", "series", "tv_show")

# ---------------------------------------------------------------------------
# 4. Movie domain — gold nested-document shapes
#    (pydantic models postgres_to_es/daemon.py:43-77 + ES mappings)
# ---------------------------------------------------------------------------

_ID_NAME = StructType(
    [StructField("id", StringType()), StructField("name", StringType())]
)

MOVIES_GOLD = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("imdb_rating", DoubleType()),
        StructField("title", StringType(), nullable=False),
        StructField("description", StringType()),
        StructField("actors_names", ArrayType(StringType()), nullable=False),
        StructField("writers_names", ArrayType(StringType()), nullable=False),
        StructField("directors_names", ArrayType(StringType()), nullable=False),
        StructField("genres_names", ArrayType(StringType()), nullable=False),
        StructField("actors", ArrayType(_ID_NAME), nullable=False),
        StructField("writers", ArrayType(_ID_NAME), nullable=False),
        StructField("directors", ArrayType(_ID_NAME), nullable=False),
        StructField("genres", ArrayType(_ID_NAME), nullable=False),
    ]
)

PERSONS_GOLD = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("full_name", StringType(), nullable=False),
        StructField("roles", ArrayType(StringType()), nullable=False),
        StructField("film_ids", ArrayType(StringType()), nullable=False),
    ]
)

GENRES_GOLD = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("name", StringType(), nullable=False),
        StructField(
            "filmworks",
            ArrayType(
                StructType(
                    [
                        StructField("id", StringType()),
                        StructField("title", StringType()),
                        StructField("imdb_rating", DoubleType()),
                    ]
                )
            ),
            nullable=False,
        ),
    ]
)

# ---------------------------------------------------------------------------
# 5. Multimodal columns: opaque binary payload + typed metadata
#    (extension surface; see operators/multimodal.py)
# ---------------------------------------------------------------------------

MEDIA_ASSET = StructType(
    [
        StructField("asset_id", StringType(), nullable=False),
        StructField("media_type", StringType(), nullable=False),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)

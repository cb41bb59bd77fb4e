"""etl_sprint_2_5_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo ``nikitakunevich/ETL_sprint_2.5``
(a SQLite→PostgreSQL→Elasticsearch movie-search ETL platform), built
Spark-first:

- batch normalization of dirty legacy data (reference
  ``sqlite_to_postgresql/etl.py``) as declarative DataFrame plans;
- denormalized nested-document gold views (reference
  ``postgres_to_es/daemon.py``) as join+collect_list plans;
- incremental view maintenance (the CDC daemon) as a checkpointed
  batch-incremental / Structured Streaming driver;
- a serving layer compiling validated query params into DataFrame ops
  (reference ``search_api/api.py``, ``movie_admin`` views);
- large-scale training-data-pipeline extensions: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
  search (brute-force + IVF), text analysis, multimodal plumbing.

Everything is expressed through the DataFrame API so Catalyst handles
predicate pushdown, column pruning, join strategy, and AQE handles
skew/partition sizing at scale.
"""

__version__ = "0.1.0"

from etl_sprint_2_5_spark.session import get_spark  # noqa: F401

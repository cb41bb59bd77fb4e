from etl_sprint_2_5_spark.sources.parquet import load_table, load_tables  # noqa: F401

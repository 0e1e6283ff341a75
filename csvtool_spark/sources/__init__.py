from csvtool_spark.sources.parquet import read_table  # noqa: F401

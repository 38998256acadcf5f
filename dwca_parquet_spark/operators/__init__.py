"""Engine operator surface (SURVEY.md §2.G).

Every operator is a thin, composable function over DataFrames using only
built-in ``pyspark.sql.functions`` in hot paths (whole-stage codegen), with
Pandas UDFs reserved for the multimodal decode plumbing where Python is the
point. Each operator has a matching fixture query + DuckDB oracle in
``dwca_parquet_spark.queries``.
"""

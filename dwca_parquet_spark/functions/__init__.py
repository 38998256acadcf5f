"""Portable column-expression builders.

Each helper exists in two forms: a PySpark ``Column`` builder (JVM-side,
whole-stage-codegen friendly — no Python UDFs in any hot path) and a SQL-text
builder emitting the equivalent DuckDB expression. Both are generated from
the same Python constants so the engine and its differential-test oracle
cannot drift apart.
"""

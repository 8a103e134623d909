"""Operator library. Each module exposes:

    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLE:  dict[str, str]   # ANSI SQL DuckDB equivalents (subset)

__spark_entry__.py aggregates these into the driver contract.
"""

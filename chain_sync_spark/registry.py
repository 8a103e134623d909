"""Aggregates QUERIES/ORACLE dicts from every operator module."""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "chain_sync_spark.operators.relational",
    "chain_sync_spark.operators.sync_queries",
    "chain_sync_spark.operators.llm_pipeline",
    "chain_sync_spark.operators.temporal",
    "chain_sync_spark.operators.scalars",
]


def _modules():
    return [import_module(m) for m in _MODULES]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLE", {}))
    return out

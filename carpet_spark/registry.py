"""Operator registry — the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 registers itself here as
``(name, query_fn, oracle_sql_or_None)``.  ``__spark_entry__.py`` exports
this registry verbatim to the driver:

- ``query_fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
- ``oracle_sql`` — equivalent ANSI SQL for the DuckDB oracle, or ``None``
  for ops whose results are approximate / side-effecting (driver then runs
  a weaker rows-only check; SURVEY.md §2 totals).

Design note (100 TB): the registry holds *builders*, not results — every
query is a lazy DataFrame plan, so the driver (or a cluster job) controls
execution, caching, and output handling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: Optional[str]


REGISTRY: dict[str, Op] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as operator ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate operator id: {name}")
        REGISTRY[name] = Op(name, fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: op.fn for name, op in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: op.oracle for name, op in REGISTRY.items() if op.oracle is not None}

"""carpet_spark — a PySpark-native analytics engine (see SURVEY.md).

Public surface: ``queries()`` / ``oracle_sql()`` registries (driver
contract), ``get_spark()`` session factory, ``tables.load`` source layer.
"""

from . import ops  # noqa: F401  — populates the registry
from .registry import REGISTRY, oracle_sql, queries
from .session import get_spark

__all__ = ["REGISTRY", "queries", "oracle_sql", "get_spark"]

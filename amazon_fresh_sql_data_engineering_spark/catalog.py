"""Aggregated query catalog: importing this module registers every query
family into ``registry.CATALOG``."""

from __future__ import annotations

from . import queries as _queries  # noqa: F401  (core relational operators)
from . import queries_analytics as _queries_analytics  # noqa: F401  (windows/rollup/pivot)
from . import queries_etl as _queries_etl  # noqa: F401  (DML/cleaning/audit)
from .registry import CATALOG, QuerySpec

try:  # extensions land in a later milestone
    from . import queries_ext as _queries_ext  # noqa: F401
except ImportError:
    pass

__all__ = ["CATALOG", "QuerySpec"]

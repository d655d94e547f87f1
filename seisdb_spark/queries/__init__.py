"""Driver-facing query registry.

Importing this package registers every query module; ``REGISTRY`` then holds
one entry per implemented operator from SURVEY.md §2 (+ the §2.11 extension
surface), each with a Spark callable and (where SQL-expressible) a DuckDB
oracle SQL twin.
"""

from seisdb_spark.queries.registry import REGISTRY, QuerySpec

# Register all query modules (import side effects fill REGISTRY).
from seisdb_spark.queries import relational  # noqa: F401,E402
from seisdb_spark.queries import arrays  # noqa: F401,E402
from seisdb_spark.queries import extensions  # noqa: F401,E402
from seisdb_spark.queries import streaming_queries  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec"]

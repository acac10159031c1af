"""DuckDB-oracle-checked query registry (the driver t2 contract).

Importing this package registers every query module's entries into
``REGISTRY``; ``__spark_entry__.py`` re-exports them as ``queries()`` /
``oracle_sql()``.
"""

from csv2parquet_spark.queries.registry import REGISTRY, register

# Import for side effect: each module registers its queries.
from csv2parquet_spark.queries import relational  # noqa: E402,F401
from csv2parquet_spark.queries import scalar_funcs  # noqa: E402,F401
from csv2parquet_spark.queries import llm_ops  # noqa: E402,F401
from csv2parquet_spark.queries import windows  # noqa: E402,F401
from csv2parquet_spark.queries import streaming_batch  # noqa: E402,F401
from csv2parquet_spark.queries import advanced  # noqa: E402,F401
from csv2parquet_spark.queries import tpch_extra  # noqa: E402,F401
from csv2parquet_spark.queries import tpch_more  # noqa: E402,F401

__all__ = ["REGISTRY", "register"]

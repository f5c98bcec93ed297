"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``sling_spark.contract``; the KG pipeline itself
(mention detection → relation extraction → xref → reconcile) is under
``sling_spark.kg`` with its own oracle-backed test suite
(tests/test_pipeline_e2e.py, P/R >= 0.95 north rule).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sling_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q5-style
    6-table star join (scan → broadcast dim joins → partial-agg shuffle),
    the canonical plan shape the engine is built around."""
    return contract._with_session_conf(contract.q_tpch_q5)(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()

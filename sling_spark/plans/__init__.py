"""Plan inspection helpers: assert the physical plan the engine is
designed around (pushdown, pruning, broadcast, partial agg) actually
materialized. Used in tests and perf work — the `.explain` discipline
as code."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """The parquet scan must carry PushedFilters including fragment."""
    plan = formatted_plan(df)
    scans = [
        block for block in plan.split("\n\n") if "PushedFilters" in block
    ]
    assert any(fragment in s for s in scans), (
        f"filter '{fragment}' not pushed to scan:\n{plan}"
    )


def assert_pruned_schema(df: DataFrame, table_hint: str, max_cols: int) -> None:
    """The scan's ReadSchema must not exceed max_cols columns (column
    pruning happened)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_hint in plan:
            schema = line.split("ReadSchema:", 1)[1]
            ncols = schema.count(":")
            assert ncols <= max_cols, f"scan reads {ncols} cols: {schema}"
            return
    raise AssertionError(f"no ReadSchema found in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def assert_partial_aggregation(df: DataFrame) -> None:
    """HashAggregate appears twice (partial + final) around the
    exchange — map-side combine is active."""
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, f"no partial agg:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product:\n{plan}"

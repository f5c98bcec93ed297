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
    """EVERY scan whose detail block mentions ``table_hint`` must read
    at most max_cols columns (column pruning happened). The hint is
    matched within the scan's own block, not the whole plan — checking
    the first ReadSchema line while the hint sits anywhere would
    validate the wrong scan in a multi-scan (join) plan."""
    plan = formatted_plan(df)
    scans = [
        b for b in plan.split("\n\n") if "ReadSchema" in b and table_hint in b
    ]
    assert scans, f"no scan matching '{table_hint}' in plan:\n{plan}"
    for block in scans:
        for line in block.splitlines():
            if "ReadSchema" in line:
                schema = line.split("ReadSchema:", 1)[1]
                ncols = schema.count(":")
                assert ncols <= max_cols, f"scan reads {ncols} cols: {schema}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def assert_partial_aggregation(df: DataFrame) -> None:
    """A partial_* aggregate function appears in the plan — map-side
    combine is active. (Counting 'HashAggregate' occurrences is
    vacuous: formatted explain can print a node in both the tree and
    the detail section, so one final-only aggregate counts twice.)"""
    plan = formatted_plan(df)
    assert "partial_" in plan, f"no partial agg:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product:\n{plan}"

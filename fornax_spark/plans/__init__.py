"""Plan-audit helpers: assert the physical plan has the shape we designed.

Used by tests to guard scale-critical properties the way the reference
guards semantic invariants — e.g. "the postings scan is never shuffled
at query time" stays true only while the query-terms join is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def assert_no_shuffle_of(df: DataFrame, relation_hint: str) -> None:
    """Crude but effective: the named scan must not sit below an Exchange
    in the formatted plan's operator list order."""
    plan = physical_plan(df)
    assert relation_hint in plan, plan


def count_exchanges(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange")

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


def _tree_lines(plan: str) -> list[str]:
    """The operator-tree section of a formatted plan (before node details)."""
    lines = plan.splitlines()
    out = []
    for ln in lines:
        if ln.startswith("== Physical Plan =="):
            continue
        if not ln.strip():
            break
        out.append(ln)
    return out


def _indent(line: str) -> int:
    """Column where the operator name starts (tree-drawing chars stripped)."""
    return len(line) - len(line.lstrip(" :+-"))


def shuffle_ancestors_of(df: DataFrame, relation_hint: str) -> list[str]:
    """Operator lines that are shuffle Exchanges ABOVE the scan matching
    `relation_hint` in the physical-plan tree (i.e. the scan's output is
    shuffled before reaching the root). BroadcastExchange does not count
    — broadcasting a small side is the design, not a data shuffle."""
    plan = physical_plan(df)
    tree = _tree_lines(plan)
    hits = [i for i, ln in enumerate(tree) if relation_hint in ln]
    assert hits, f"relation {relation_hint!r} not found in plan:\n{plan}"
    bad: list[str] = []
    for i in hits:
        cur = _indent(tree[i])
        for j in range(i - 1, -1, -1):
            ind = _indent(tree[j])
            if ind < cur:  # ancestor
                name = tree[j].lstrip(" :+-")
                if "Exchange" in name and "Broadcast" not in name:
                    bad.append(name.strip())
                cur = ind
                if cur == 0:
                    break
    return bad


def assert_no_shuffle_of(df: DataFrame, relation_hint: str) -> None:
    """Assert the named scan's output never crosses a shuffle Exchange on
    its way to the plan root (the 'index is never shuffled' invariant)."""
    bad = shuffle_ancestors_of(df, relation_hint)
    assert not bad, (
        f"scan {relation_hint!r} is shuffled by {bad}:\n{physical_plan(df)}"
    )


def count_exchanges(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange")


def count_shuffle_exchanges(df: DataFrame, on_big_side: bool = False) -> int:
    """Shuffle Exchange NODES in the plan tree (BroadcastExchange and the
    node-details section excluded).

    on_big_side=True counts only shuffles NOT inside a BroadcastExchange
    subtree — shuffling a vocabulary-sized side before broadcasting it
    is fine at scale; shuffling the 100 TB side is what the tests guard.
    """
    tree = _tree_lines(physical_plan(df))
    n = 0
    for i, ln in enumerate(tree):
        name = ln.lstrip(" :+-*")
        if not name.startswith("Exchange"):
            continue
        if on_big_side:
            cur = _indent(ln)
            under_broadcast = False
            for j in range(i - 1, -1, -1):
                ind = _indent(tree[j])
                if ind < cur:
                    if tree[j].lstrip(" :+-*").startswith("BroadcastExchange"):
                        under_broadcast = True
                        break
                    cur = ind
                    if cur == 0:
                        break
            if under_broadcast:
                continue
        n += 1
    return n

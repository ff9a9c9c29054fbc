"""Misra-Gries mergeable frequent-items summaries
(operators/incremental.py:mg_state_build/mg_state_merge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etdtransform_spark.operators.incremental import (
    mg_state_build,
    mg_state_merge,
)


def _counts(spark, rows, capacity, n_parts=4, keys=("g",)):
    df = spark.createDataFrame(rows, "g string, item string").repartition(
        n_parts
    )
    state = mg_state_build(df, list(keys), "item", capacity=capacity)
    out = mg_state_merge([state], list(keys), capacity=capacity)
    return {(r.g, r.item): (r.weight, r.max_err) for r in out.collect()}


def test_exact_when_capacity_covers_domain(spark):
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 7 + [("a", "z")] * 3
        + [("b", "x")] * 5 + [("b", "w")] * 2
    )
    got = _counts(spark, rows, capacity=8)
    assert got[("a", "x")] == (10, 0)
    assert got[("a", "y")] == (7, 0)
    assert got[("a", "z")] == (3, 0)
    assert got[("b", "x")] == (5, 0)
    assert got[("b", "w")] == (2, 0)


def test_guarantee_holds_when_domain_overflows(spark):
    """60 distinct light items + 2 heavy items, capacity 8: the heavy
    items must survive with weight within [true - err, true], err bounded
    by the reported max_err plus per-partition slack n/(m+1)."""
    rows = [("a", "heavy1")] * 300 + [("a", "heavy2")] * 200
    rows += [("a", f"noise{i}") for i in range(60) for _ in range(2)]
    n = len(rows)
    got = _counts(spark, rows, capacity=8, n_parts=3)
    assert ("a", "heavy1") in got and ("a", "heavy2") in got
    for item, true in (("heavy1", 300), ("heavy2", 200)):
        w, err = got[("a", item)]
        assert w <= true
        # total MG slack across P partitions is at most n/(m+1) summed
        assert true - w <= n // (8 + 1) + err
    # at most capacity survivors
    assert len(got) <= 8


def test_merge_across_batches_equals_single_build(spark):
    """Mergeability: summaries built from two disjoint halves and merged
    give the same exact counts as one build over the union (capacity
    covers the domain → both exact)."""
    rows1 = [("a", "x")] * 6 + [("a", "y")] * 2
    rows2 = [("a", "x")] * 4 + [("a", "z")] * 5
    df1 = spark.createDataFrame(rows1, "g string, item string")
    df2 = spark.createDataFrame(rows2, "g string, item string")
    s1 = mg_state_build(df1, ["g"], "item", capacity=8)
    s2 = mg_state_build(df2, ["g"], "item", capacity=8)
    merged = {
        (r.g, r.item): r.weight
        for r in mg_state_merge([s1, s2], ["g"], capacity=8).collect()
    }
    assert merged == {("a", "x"): 10, ("a", "y"): 2, ("a", "z"): 5}


def test_max_err_covers_build_phase_decrements(spark):
    """max_err folds the per-partition BUILD decrements (carried in the
    state's err column) into the merge decrement, so in the non-exact
    regime the reported bound alone covers the full undercount:
    true - weight <= max_err for every surviving item."""
    rows = [("a", "heavy1")] * 400 + [("a", "heavy2")] * 250
    rows += [("a", f"noise{i}") for i in range(80) for _ in range(3)]
    df = spark.createDataFrame(rows, "g string, item string").repartition(4)
    state = mg_state_build(df, ["g"], "item", capacity=6)
    # build-phase decrements must fire (80 distinct >> capacity 6) and be
    # carried on exactly one row per (group, partition)
    errs = [r.err for r in state.collect()]
    assert sum(errs) > 0
    got = {
        (r.g, r.item): (r.weight, r.max_err)
        for r in mg_state_merge([state], ["g"], capacity=6).collect()
    }
    for item, true in (("heavy1", 400), ("heavy2", 250)):
        w, err = got[("a", item)]
        assert w <= true
        assert true - w <= err, (item, true, w, err)


def test_null_group_key_err_carried(spark):
    """Build decrements for a NULL-keyed group must reach max_err: the
    carrier rows are emitted straight from the errs accumulator (never a
    dict lookup of the pandas group tuple, where NaN keys don't
    round-trip), so a NULL group behaves exactly like a named one."""
    rows = [(None, "heavy")] * 300
    rows += [(None, f"noise{i}") for i in range(60) for _ in range(3)]
    df = spark.createDataFrame(rows, "g string, item string").repartition(2)
    state = mg_state_build(df, ["g"], "item", capacity=6)
    errs = [r.err for r in state.collect() if r.g is None]
    assert sum(errs) > 0, "NULL-group build decrements were dropped"
    got = {
        r.item: (r.weight, r.max_err)
        for r in mg_state_merge([state], ["g"], capacity=6).collect()
        if r.g is None
    }
    w, err = got["heavy"]
    assert w <= 300
    assert 300 - w <= err, (w, err)
    # the weight-0 carrier rows never surface in merged output
    assert "" not in got


def test_null_items_excluded(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "x")], "g string, item string"
    )
    state = mg_state_build(df, ["g"], "item", capacity=4)
    out = mg_state_merge([state], ["g"], capacity=4).collect()
    assert {(r.g, r.item, r.weight) for r in out} == {("a", "x", 2)}

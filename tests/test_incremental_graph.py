"""Unit tests for incremental aggregate-state maintenance and PageRank."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def _rows(rng, n, keys=("a", "b")):
    return [(rng.choice(keys), rng.uniform(0, 100)) for _ in range(n)]


def test_state_merge_equals_direct(spark):
    from etdtransform_spark.operators.incremental import (
        agg_state_build,
        agg_state_finalize,
        agg_state_merge,
    )

    rng = random.Random(1)
    b1 = spark.createDataFrame(_rows(rng, 200), ["k", "v"])
    b2 = spark.createDataFrame(_rows(rng, 150), ["k", "v"])
    b3 = spark.createDataFrame(_rows(rng, 50, keys=("b", "c")), ["k", "v"])

    # tree-shaped merge: merge(merge(s1, s2), s3)
    s12 = agg_state_merge(
        [agg_state_build(b1, ["k"], "v"), agg_state_build(b2, ["k"], "v")],
        ["k"],
    )
    merged = agg_state_merge([s12, agg_state_build(b3, ["k"], "v")], ["k"])
    inc = {
        r.k: r for r in agg_state_finalize(merged, ["k"], digits=6).collect()
    }

    direct = {
        r.k: r
        for r in agg_state_finalize(
            agg_state_build(
                b1.unionByName(b2).unionByName(b3), ["k"], "v"
            ),
            ["k"],
            digits=6,
        ).collect()
    }
    assert set(inc) == set(direct) == {"a", "b", "c"}
    for k in inc:
        for f in ("n", "sum", "avg", "std", "min", "max"):
            a, b = getattr(inc[k], f), getattr(direct[k], f)
            assert a == b or math.isclose(a, b, abs_tol=1e-6), (k, f, a, b)


def test_state_finalize_matches_python_stats(spark):
    import statistics

    from etdtransform_spark.operators.incremental import (
        agg_state_build,
        agg_state_finalize,
    )

    vals = [3.0, 7.5, 1.25, 9.0, 4.0]
    df = spark.createDataFrame([("k", v) for v in vals], ["k", "v"])
    [r] = agg_state_finalize(
        agg_state_build(df, ["k"], "v"), ["k"], digits=6
    ).collect()
    assert r.n == 5 and r.min == 1.25 and r.max == 9.0
    assert math.isclose(r.avg, statistics.mean(vals), abs_tol=1e-6)
    assert math.isclose(r.std, statistics.stdev(vals), abs_tol=1e-6)


def test_state_std_null_below_two_and_degenerate(spark):
    from etdtransform_spark.operators.incremental import (
        agg_state_build,
        agg_state_finalize,
    )

    df = spark.createDataFrame(
        [("one", 5.0), ("same", 2.0), ("same", 2.0)], ["k", "v"]
    )
    out = {
        r.k: r
        for r in agg_state_finalize(
            agg_state_build(df, ["k"], "v"), ["k"]
        ).collect()
    }
    assert out["one"].std is None  # n=1 -> sample std undefined
    assert out["same"].std == 0.0  # clamped, never NaN from -0.0 variance


def test_hll_states_exact_at_small_cardinality(spark):
    from etdtransform_spark.operators.incremental import (
        hll_state_build,
        hll_state_estimate,
        hll_state_merge,
    )

    # batch1 users 0..149, batch2 users 100..249 -> union 250 distinct;
    # sketches stay in exact (sparse) mode at this size.
    b1 = spark.createDataFrame(
        [("k", i) for i in range(150)], ["k", "u"]
    )
    b2 = spark.createDataFrame(
        [("k", i) for i in range(100, 250)], ["k", "u"]
    )
    merged = hll_state_merge(
        [hll_state_build(b1, ["k"], "u"), hll_state_build(b2, ["k"], "u")],
        ["k"],
    )
    [r] = hll_state_estimate(merged, ["k"]).collect()
    assert r.n_distinct == 250


def _py_pagerank(edges, d=0.85, iters=8):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    ranks = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += ranks[s] * w / outw[s]
        ranks = {
            v: (1 - d) / len(nodes) + d * contrib[v] for v in nodes
        }
    return ranks


def test_pagerank_symmetric_cycle(spark):
    from etdtransform_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0)], ["src", "dst", "weight"]
    )
    out = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert out == {"a": 0.5, "b": 0.5}


def test_pagerank_matches_python_recurrence(spark):
    from etdtransform_spark.operators.graph import pagerank

    edges = [
        ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("d", "a", 3.0),  # d is a source-only node
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    got = {r.node: r.rank for r in pagerank(df, iterations=8).collect()}
    want = _py_pagerank(edges, iters=8)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-6), (v, got[v], want[v])
    # d receives nothing: exactly the teleport mass
    assert math.isclose(got["d"], 0.15 / 4, abs_tol=1e-6)


def test_hll_intersection_inclusion_exclusion(spark):
    from etdtransform_spark.operators.incremental import (
        hll_intersection_estimate,
        hll_state_build,
    )

    # A = 0..99, B = 50..179 -> |A|=100 |B|=130 |A∪B|=180 |A∩B|=50
    a = spark.createDataFrame([("k", i) for i in range(100)], ["k", "u"])
    b = spark.createDataFrame([("k", i) for i in range(50, 180)], ["k", "u"])
    [r] = hll_intersection_estimate(
        hll_state_build(a, ["k"], "u"),
        hll_state_build(b, ["k"], "u"),
        ["k"],
    ).collect()
    assert r.n_a == 100 and r.n_b == 130 and r.n_union == 180
    assert r.n_intersection == 50


def test_hll_intersection_disjoint_clamps_at_zero(spark):
    from etdtransform_spark.operators.incremental import (
        hll_intersection_estimate,
        hll_state_build,
    )

    a = spark.createDataFrame([("k", i) for i in range(40)], ["k", "u"])
    b = spark.createDataFrame([("k", i) for i in range(100, 140)], ["k", "u"])
    [r] = hll_intersection_estimate(
        hll_state_build(a, ["k"], "u"),
        hll_state_build(b, ["k"], "u"),
        ["k"],
    ).collect()
    assert r.n_intersection == 0


def test_transitive_closure_tree_and_early_out(spark):
    from etdtransform_spark.operators.graph import transitive_closure

    # chain 4->3->2->1 plus branch 5->2
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (5, 2)], ["child", "parent"]
    )
    out = {
        (r.node, r.ancestor): r.depth
        for r in transitive_closure(edges, max_depth=10).collect()
    }
    assert out[(4, 3)] == 1 and out[(4, 2)] == 2 and out[(4, 1)] == 3
    assert out[(5, 2)] == 1 and out[(5, 1)] == 2
    assert (1, 1) not in out  # roots have no ancestors
    assert len(out) == 3 + 2 + 2 + 1  # 4's 3 + 5's 2 + 3's 2 + 2's 1
    # depth bound truncates
    shallow = transitive_closure(edges, max_depth=1)
    assert shallow.count() == 4

"""Unit tests for operators/privacy.py and operators/bloom.py."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etdtransform_spark.operators.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)
from etdtransform_spark.operators.privacy import (
    k_anonymity,
    l_diversity_violations,
    reidentification_risk,
)


@pytest.fixture()
def people(spark):
    # (zip, age_band) quasi-identifiers; diagnosis sensitive.
    rows = [
        ("10001", "20-29", "flu"),
        ("10001", "20-29", "flu"),
        ("10001", "20-29", "cold"),
        ("10001", "30-39", "flu"),      # k=1 class
        ("10002", "20-29", "flu"),
        ("10002", "20-29", "flu"),      # k=2 but l=1 (homogeneous)
        ("10002", "30-39", None),
        ("10002", "30-39", "cold"),     # NULL counts as a distinct value
    ]
    return spark.createDataFrame(rows, "zip string, age string, diag string")


def test_k_anonymity_classes(people):
    got = {
        (r.zip, r.age): (r.k, r.l_distinct, r.top_sensitive_share)
        for r in k_anonymity(people, ["zip", "age"], "diag").collect()
    }
    assert got[("10001", "20-29")] == (3, 2, round(2 / 3, 6))
    assert got[("10001", "30-39")] == (1, 1, 1.0)
    assert got[("10002", "20-29")] == (2, 1, 1.0)
    # NULL diag + 'cold' => l=2; mode share counts the NULL group's row
    assert got[("10002", "30-39")] == (2, 2, 0.5)


def test_k_anonymity_without_sensitive(people):
    got = {
        (r.zip, r.age): r.k
        for r in k_anonymity(people, ["zip", "age"]).collect()
    }
    assert got[("10001", "20-29")] == 3 and len(got) == 4


def test_l_diversity_violations(people):
    v = {
        (r.zip, r.age): (r.k_violation, r.l_violation)
        for r in l_diversity_violations(
            people, ["zip", "age"], "diag", k_min=2, l_min=2
        ).collect()
    }
    # 10001/30-39 violates k; 10002/20-29 violates l; the others pass.
    assert v == {
        ("10001", "30-39"): (True, True),
        ("10002", "20-29"): (False, True),
    }


def test_reidentification_risk_summary(people):
    r = reidentification_risk(
        people, ["zip", "age"], "diag", k_thresholds=(2, 3)
    ).collect()[0]
    assert (r.n_rows, r.n_classes, r.min_k, r.min_l) == (8, 4, 1, 1)
    assert r.rows_at_risk_k2 == 1 and r.pct_at_risk_k2 == 0.125
    # classes with k<3: the k=1 and both k=2 classes -> 5 rows
    assert r.rows_at_risk_k3 == 5 and r.pct_at_risk_k3 == 0.625


def test_bloom_semi_join_exact(spark):
    probe = spark.range(0, 5000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("payload")
    )
    keys = spark.createDataFrame([(3,), (17,), (55,), (200,)], "k long")
    got = bloom_semi_join(probe, keys, "k", num_bits=1 << 12)
    want = probe.join(keys, "k", "left_semi")
    assert sorted(r.payload for r in got.collect()) == sorted(
        r.payload for r in want.collect()
    )


def test_bloom_alias_collision_on_probe(spark):
    # a probe already carrying the default confirm-key alias (e.g. a
    # round-tripped prior output) must not make the join ambiguous
    probe = spark.range(0, 100).select(
        (F.col("id") % 7).alias("k"), F.lit("x").alias("_bloom_confirm_key")
    )
    keys = spark.createDataFrame([(3,), (5,)], "k long")
    got = bloom_semi_join(probe, keys, "k", num_bits=1 << 12)
    assert got.columns == ["k", "_bloom_confirm_key"]
    assert got.count() == probe.filter(F.col("k").isin(3, 5)).count()


def test_bloom_prune_no_false_negatives_and_bounded_fp(spark):
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    keys = spark.range(0, 2000, 10).select(F.col("id").alias("k"))  # 200 keys
    pruned = bloom_semi_join(
        probe, keys, "k", num_bits=1 << 14, confirm=False
    ).collect()
    kept = {r.k for r in pruned}
    true_set = set(range(0, 2000, 10))
    assert true_set <= kept  # Bloom filters never drop a real member
    fp = len(kept - true_set) / (2000 - len(true_set))
    assert fp < 0.05  # m/n ~ 80 bits/key, k=5 -> fp well under 1%


def test_bloom_null_keys_never_join(spark):
    probe = spark.createDataFrame([(None,), (1,), (2,)], "k long")
    keys = spark.createDataFrame([(1,), (None,)], "k long")
    got = bloom_semi_join(probe, keys, "k").collect()
    assert [r.k for r in got] == [1]


def test_bloom_might_contain_deterministic(spark):
    bloom = build_bloom(
        spark.range(100).select(F.col("id").alias("k")), "k", num_bits=1 << 12
    )
    df = spark.range(100).select(F.col("id").alias("k")).join(F.broadcast(bloom))
    hits = df.filter(
        bloom_might_contain(F.col("k"), F.col("bloom_words"), num_bits=1 << 12)
    ).count()
    assert hits == 100  # every inserted key tests positive


def test_bloom_plan_prunes_before_shuffle(spark):
    """The 100 TB contract: with a non-broadcastable key side (forced via
    autoBroadcastJoinThreshold=-1) the bloom test must sit BELOW the
    confirm join's Exchange — i.e. the probe stream is pruned before it
    is shuffled. Catalyst's PushDownLeftSemiAntiJoin would otherwise
    hoist the semi-join under the bloom attach; the Sample barrier in
    bloom_semi_join prevents that."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = spark.range(0, 1000).select((F.col("id") % 37).alias("k"))
        keys = spark.range(0, 37, 3).select(F.col("id").alias("k"))
        plan = bloom_semi_join(probe, keys, "k", num_bits=1 << 12)._jdf.queryExecution().optimizedPlan().toString()
        semi_at = plan.index("LeftSemi")
        bloom_at = plan.index("bloom_words")
        # the bloom condition appears in the subtree BELOW the semi join
        assert bloom_at > semi_at
        # and the pruned rows are exactly the plain semi-join's
        got = bloom_semi_join(probe, keys, "k", num_bits=1 << 12)
        want = probe.join(keys, "k", "left_semi")
        assert sorted(r.k for r in got.collect()) == sorted(
            r.k for r in want.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bloom_probe_col_differs(spark):
    probe = spark.createDataFrame([(1, "a"), (2, "b")], "uid long, x string")
    keys = spark.createDataFrame([(2,)], "user long")
    got = bloom_semi_join(probe, keys, key_col="user", probe_col="uid").collect()
    assert [(r.uid, r.x) for r in got] == [(2, "b")]


def test_bloom_self_derived_keys(spark):
    """keys_df derived from the probe DataFrame itself — the natural
    blocklist pattern. A DataFrame-indexed confirm-join condition would
    trip Spark's ambiguous-self-join detection here; the unique-alias
    rename makes resolution name-based and lineage-independent."""
    probe = spark.range(0, 500).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("payload")
    )
    keys = probe.filter(F.col("payload") < 10).select("k")  # shares lineage
    got = bloom_semi_join(probe, keys, "k", num_bits=1 << 12)
    want = probe.join(
        keys.distinct().withColumnRenamed("k", "_w"),
        on=F.col("k") == F.col("_w"),
        how="left_semi",
    )
    assert got.count() == want.count() == 100  # k in 0..9 -> 10 per key


def test_bloom_barrier_row_parity(spark):
    """The Sample(fraction=1.0) optimizer barrier must be row-preserving:
    Bernoulli acceptance x < 1.0 over x in [0,1) keeps every row. Pinned
    on Spark 4.x (validated on 4.1); if a Spark upgrade changes the
    sampler or lets PushDownLeftSemiAntiJoin traverse Sample, this count
    parity (and the plan test above) will catch it."""
    probe = spark.range(0, 10_000).select((F.col("id") % 991).alias("k"))
    keys = spark.range(0, 991, 7).select(F.col("id").alias("k"))
    got = bloom_semi_join(probe, keys, "k", num_bits=1 << 14).count()
    want = probe.join(keys, "k", "left_semi").count()
    assert got == want

"""Round-13 property tests: event-study DID and round-13 operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _panel(spark, effect_by_rel):
    """Balanced 2-group panel over periods 1..6, adoption at 4 (base rel -1
    = period 3). Control mean = 10 + period (a shared trend); treated mean
    adds effect_by_rel[rel] on top. 3 units per cell -> every se defined."""
    rows = []
    for period in range(1, 7):
        rel = period - 4
        for unit in range(3):
            rows.append((0, period, 10.0 + period + 0.1 * unit))
            rows.append(
                (1, period, 10.0 + period + 0.1 * unit
                 + effect_by_rel.get(rel, 0.0))
            )
    return spark.createDataFrame(rows, "t int, p int, y double")


def test_event_study_recovers_dynamic_effect(spark):
    """Planted dynamic effect (0 pre, +2 at rel 0, +3 at rel 1, +4 at
    rel 2) on a shared linear trend: pre-period betas must be exactly 0
    (parallel trends) and post-period betas must recover the plant."""
    from etdtransform_spark.operators.stats import event_study

    df = _panel(spark, {0: 2.0, 1: 3.0, 2: 4.0})
    out = {
        r.rel_period: r
        for r in event_study(df, "y", "t", "p", event_period=4).collect()
    }
    assert set(out) == {-3, -2, -1, 0, 1, 2}
    # base period pinned to the normalization
    assert out[-1].beta == 0.0 and out[-1].se_beta is None
    for rel in (-3, -2):
        assert out[rel].beta == pytest.approx(0.0, abs=1e-9)
        assert out[rel].se_beta is not None
    for rel, eff in ((0, 2.0), (1, 3.0), (2, 4.0)):
        assert out[rel].beta == pytest.approx(eff, abs=1e-9)
    # balanced cells: 3 treated + 3 control everywhere
    assert all(r.n_treated == 3 and r.n_control == 3 for r in out.values())


def test_event_study_fail_closed(spark):
    """A relative period missing one side keeps its row but fails beta
    closed; a singleton cell nulls the se while beta stays."""
    from etdtransform_spark.operators.stats import event_study

    rows = [
        # base period (rel -1 = period 3): both sides, n=2 each
        (1, 3, 1.0), (1, 3, 2.0), (0, 3, 1.0), (0, 3, 2.0),
        # rel 0: control missing entirely
        (1, 4, 5.0), (1, 4, 6.0),
        # rel 1: both sides, but treated is a singleton
        (1, 5, 7.0), (0, 5, 3.0), (0, 5, 4.0),
    ]
    df = spark.createDataFrame(rows, "t int, p int, y double")
    out = {
        r.rel_period: r
        for r in event_study(df, "y", "t", "p", event_period=4).collect()
    }
    assert out[0].beta is None and out[0].se_beta is None
    assert out[0].n_control == 0
    assert out[1].beta == pytest.approx(7.0 - 3.5 - (1.5 - 1.5))
    assert out[1].se_beta is None  # singleton treated cell -> no variance


def _cox_newton_py(rows, steps=3):
    """Independent replay of the Breslow partial-likelihood Newton
    recursion in plain Python (rows: (t, e, x))."""
    import math

    b = 0.0
    for _ in range(steps + 1):  # last pass only reads I for the se
        per_t = {}
        for t, e, x, in rows:
            w = math.exp(b * x)
            d = per_t.setdefault(t, [0, 0.0, 0.0, 0.0, 0.0])
            d[0] += e
            d[1] += e * x
            d[2] += w
            d[3] += w * x
            d[4] += w * x * x
        u = i = 0.0
        s0 = s1 = s2 = 0.0
        for t in sorted(per_t, reverse=True):
            d, sxe, w0, w1, w2 = per_t[t]
            s0 += w0
            s1 += w1
            s2 += w2
            if d > 0:
                u += sxe - d * s1 / s0
                i += d * (s2 / s0 - (s1 / s0) ** 2)
        if i <= 0:
            return None, None
        last = (b, i)
        b = b + u / i
    return last


def test_cox_ph_replays_newton_recursion(spark):
    """cox_ph must equal the textbook Breslow-Newton recursion replayed
    independently in Python on a small censored dataset with ties."""
    import math

    from etdtransform_spark.operators.funnel import cox_ph

    rows = [
        (1.0, 1, 0.5), (1.0, 1, -0.2), (2.0, 0, 1.1), (2.0, 1, 0.7),
        (3.0, 1, -1.0), (4.0, 0, 0.3), (5.0, 1, 1.5), (5.0, 0, -0.8),
    ]
    df = spark.createDataFrame(rows, "t double, e int, x double")
    out = cox_ph(df, "t", "e", "x", steps=3).collect()[0]
    b_exp, i_exp = _cox_newton_py(rows, steps=3)
    assert out.n == 8 and out.n_events == 5
    assert out.beta == pytest.approx(b_exp, abs=1e-6)
    assert out.hazard_ratio == pytest.approx(math.exp(b_exp), abs=1e-5)
    assert out.se_beta == pytest.approx(1.0 / math.sqrt(i_exp), abs=1e-6)
    assert out.z == pytest.approx(b_exp * math.sqrt(i_exp), abs=1e-5)


def test_cox_ph_sign_recovery_and_fail_closed(spark):
    """Hazard increases with x -> beta > 0; constant covariate and
    zero-event inputs fail closed (NULL beta, counts still reported)."""
    from etdtransform_spark.operators.funnel import cox_ph

    # planted: high-x subjects fail early, low-x late or censored
    rows = [(float(10 - i), 1, float(i) / 5.0) for i in range(10)]
    rows += [(12.0, 0, 0.1), (13.0, 0, 0.9)]
    df = spark.createDataFrame(rows, "t double, e int, x double")
    out = cox_ph(df, "t", "e", "x").collect()[0]
    assert out.beta is not None and out.beta > 0
    assert out.hazard_ratio > 1

    const = spark.createDataFrame(
        [(1.0, 1, 2.0), (2.0, 1, 2.0)], "t double, e int, x double"
    )
    oc = cox_ph(const, "t", "e", "x").collect()[0]
    assert oc.beta is None and oc.se_beta is None and oc.n == 2

    noev = spark.createDataFrame(
        [(1.0, 0, 1.0), (2.0, 0, 2.0)], "t double, e int, x double"
    )
    on = cox_ph(noev, "t", "e", "x").collect()[0]
    assert on.beta is None and on.n_events == 0


def test_event_study_missing_base_fails_all_closed(spark):
    """No observations at the base period: every non-base beta is NULL,
    but the observed periods still appear (crossJoin against the all-NULL
    1-row base frame, not an empty frame)."""
    from etdtransform_spark.operators.stats import event_study

    rows = [(1, 4, 5.0), (0, 4, 3.0), (1, 5, 6.0), (0, 5, 2.0)]
    df = spark.createDataFrame(rows, "t int, p int, y double")
    out = event_study(df, "y", "t", "p", event_period=4).collect()
    assert {r.rel_period for r in out} == {0, 1}
    assert all(r.beta is None for r in out)

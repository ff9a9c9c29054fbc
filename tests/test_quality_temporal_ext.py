"""Unit tests for the expectation-report, overlap-join, cumulative-distinct,
mode, transition, conversion-latency, vocab-growth, and span-dedup operators
— the edge cases the sf oracle data cannot exercise (ties, boundary touches,
censoring, violation counting)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_overlap_join_boundaries_and_bucket_dedup(spark):
    from etdtransform_spark.operators.temporal import overlap_join

    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 10:00:00")),
            (1, "b", _ts("2024-01-02 00:00:00"), _ts("2024-01-02 01:00:00")),
            (2, "c", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),
        ],
        "k long, lid string, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            # long overlap spanning many 1h buckets with 'a' -> must emit ONCE
            (1, "x", _ts("2024-01-01 02:00:00"), _ts("2024-01-01 08:00:00")),
            # touching boundary: r_start == l_end (closed intervals -> match)
            (1, "y", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00")),
            # disjoint
            (1, "z", _ts("2024-01-03 00:00:00"), _ts("2024-01-03 01:00:00")),
            # same times but different key -> no match
            (3, "w", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),
        ],
        "k long, rid string, rs timestamp, re timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in overlap_join(
            left, right, "ls", "le", "rs", "re", by=["k"],
            granularity_seconds=3600,
        ).collect()
    )
    assert got == [("a", "x"), ("a", "y")]

    # granularity invariance: coarser buckets, same pairs
    got2 = sorted(
        (r["lid"], r["rid"])
        for r in overlap_join(
            left, right, "ls", "le", "rs", "re", by=["k"],
            granularity_seconds=86400,
        ).collect()
    )
    assert got2 == got


def test_cumulative_distinct_carries_and_dedups(spark):
    from etdtransform_spark.operators.olap import cumulative_distinct

    df = spark.createDataFrame(
        [
            ("a", 1, _ts("2024-01-01 05:00:00")),
            ("a", 2, _ts("2024-01-01 06:00:00")),
            ("a", 1, _ts("2024-01-02 05:00:00")),  # repeat user: no increment
            ("a", 3, _ts("2024-01-03 05:00:00")),
        ],
        "g string, uid long, ts timestamp",
    )
    out = {
        r["day"].date().isoformat(): (r["n_new"], r["cumulative_distinct"])
        for r in cumulative_distinct(
            df, ["g"], "uid", F.date_trunc("day", F.col("ts")), "day"
        ).collect()
    }
    assert out == {
        "2024-01-01": (2, 2),
        "2024-01-02": (0, 2),  # active day, no new users: carried total
        "2024-01-03": (1, 3),
    }


def test_group_mode_tiebreak(spark):
    from etdtransform_spark.operators.olap import group_mode

    df = spark.createDataFrame(
        [(1, "b"), (1, "b"), (1, "a"), (1, "a"), (1, "c"), (2, "z")],
        "k long, v string",
    )
    got = {
        r["k"]: (r["mode_value"], r["mode_count"])
        for r in group_mode(df, ["k"], "v").collect()
    }
    # tie between a(2) and b(2): lowest value wins
    assert got == {1: ("a", 2), 2: ("z", 1)}


def test_transition_matrix_rows_normalize(spark):
    from etdtransform_spark.operators.funnel import transition_matrix

    df = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 00:00:00"), "s"),
            (1, 2, _ts("2024-01-01 00:01:00"), "t"),
            (1, 3, _ts("2024-01-01 00:02:00"), "s"),
            (1, 4, _ts("2024-01-01 00:03:00"), "u"),
            (2, 5, _ts("2024-01-01 00:00:00"), "s"),
            (2, 6, _ts("2024-01-01 00:01:00"), "t"),
            (3, 7, _ts("2024-01-01 00:00:00"), "lonely"),  # no transition
        ],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    rows = transition_matrix(df, order_cols=["event_id"]).collect()
    got = {(r["from_state"], r["to_state"]): (r["n_transitions"], r["probability"])
           for r in rows}
    assert got == {
        ("s", "t"): (2, 0.666667),
        ("s", "u"): (1, 0.333333),
        ("t", "s"): (1, 1.0),
    }
    # per-from-state probabilities sum to 1 (up to the 6-digit rounding)
    from collections import defaultdict

    sums = defaultdict(float)
    for (f_, _t_), (_n, p) in got.items():
        sums[f_] += p
    assert all(abs(s - 1.0) < 1e-5 for s in sums.values())


def test_time_to_conversion_censoring(spark):
    from etdtransform_spark.operators.funnel import time_to_conversion

    df = spark.createDataFrame(
        [
            # converts 90s after signup; earlier purchase ignored
            (1, _ts("2024-01-01 00:00:00"), "purchase"),
            (1, _ts("2024-01-01 00:10:00"), "signup"),
            (1, _ts("2024-01-01 00:11:30"), "purchase"),
            # never converts
            (2, _ts("2024-01-01 00:00:00"), "signup"),
            # never signs up -> excluded entirely
            (3, _ts("2024-01-01 00:00:00"), "purchase"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    rows = {r["user_id"]: r for r in
            time_to_conversion(df, "signup", "purchase").collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["seconds_to_convert"] == 90.0
    assert rows[2]["end_ts"] is None and rows[2]["seconds_to_convert"] is None


def test_vocab_growth_curve(spark):
    from etdtransform_spark.operators.corpus import vocab_growth

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a b c")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in vocab_growth(df).collect()}
    assert (rows[1]["n_tokens"], rows[1]["n_new_terms"],
            rows[1]["vocab_size"], rows[1]["cum_tokens"]) == (3, 2, 2, 3)
    assert (rows[2]["n_new_terms"], rows[2]["vocab_size"],
            rows[2]["cum_tokens"]) == (1, 3, 5)
    assert (rows[3]["n_new_terms"], rows[3]["vocab_size"],
            rows[3]["cum_tokens"]) == (0, 3, 8)
    assert rows[3]["type_token_ratio"] == 0.375


def test_duplicate_spans_positional(spark):
    from etdtransform_spark.operators.corpus import duplicate_spans

    base = "one two three four five"
    df = spark.createDataFrame(
        [
            (1, base + " six"),          # 2 spans, both canonical
            (2, base),                   # 1 span, duplicate of doc 1 pos 0
            (3, base + " " + base),      # within-doc repetition + cross-doc
            (4, "short text only"),      # < n tokens: excluded
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_spans(df, n=5).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1]["n_spans"], rows[1]["n_dup_spans"]) == (2, 0)
    assert (rows[2]["n_spans"], rows[2]["n_dup_spans"]) == (1, 1)
    # doc 3: 6 spans; every span whose shingle appeared in doc1/doc2 or
    # earlier in doc 3 is dup. "one two three four five" dup; the rolling
    # spans crossing the seam are unique; second copy dup.
    assert rows[3]["n_spans"] == 6
    assert rows[3]["n_dup_spans"] == 2
    assert rows[3]["dup_ratio"] == round(2 / 6, 6)


def test_check_expectations_each_violation(spark):
    from etdtransform_spark.operators.quality import check_expectations

    fact = spark.createDataFrame(
        [
            (1, 1, 0.05, "A"),
            (1, 1, 0.05, "A"),    # duplicate compound key
            (2, 1, 0.5, "X"),     # range violation + bad accepted value
            (None, 2, 0.01, "N"), # null key (not a uniqueness violation)
            (99, 3, None, "R"),   # orphan FK; null range value ignored
        ],
        "k long, line long, disc double, flag string",
    )
    dim = spark.createDataFrame([(1,), (2,)], "dk long")
    rep = {
        (r["check"], r["target"]): (r["metric"], r["passed"])
        for r in check_expectations(
            fact,
            not_null=["k"],
            unique=[["k", "line"]],
            ranges={"disc": (0.0, 0.1)},
            accepted_values={"flag": ["A", "N", "R"]},
            min_rows=3,
            foreign_keys=[("k", dim, "dk")],
        ).collect()
    }
    assert rep[("not_null", "k")] == (1.0, False)
    assert rep[("unique", "k,line")] == (1.0, False)
    assert rep[("range", "disc")] == (1.0, False)
    assert rep[("accepted_values", "flag")] == (1.0, False)
    assert rep[("min_rows", "*")] == (5.0, True)
    assert rep[("foreign_key", "k")] == (1.0, False)
    # all-clean table passes everything
    clean = spark.createDataFrame([(1, 1, 0.05, "A")], fact.schema)
    rep2 = check_expectations(
        clean,
        not_null=["k"],
        unique=[["k", "line"]],
        ranges={"disc": (0.0, 0.1)},
        accepted_values={"flag": ["A"]},
        min_rows=1,
        foreign_keys=[("k", dim, "dk")],
    )
    assert all(r["passed"] for r in rep2.collect())


def test_gopher_gate_rules_and_reasons(spark):
    from etdtransform_spark.operators.text import gopher_gate

    good = " ".join(
        ["the", "quick", "brown", "foxes", "jumped", "over", "many", "lazy",
         "sleeping", "dogs", "while", "evening", "light", "faded", "slowly",
         "and", "distant", "church", "bells", "rang", "through", "quiet",
         "valley", "towns", "where", "weary", "farmers", "gathered", "ripe",
         "golden", "wheat", "before", "autumn", "rains", "arrived", "again"]
    )
    repetitive = "the cat sat here now " * 20             # dup trigrams
    df = spark.createDataFrame(
        [
            (1, good.strip()),
            (2, repetitive.strip()),
            (3, ""),                       # empty: every rule fails closed
            (4, "zz " * 40),               # no stopwords, repetitive
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_gate(df, min_words=10).collect()}
    assert rows[1]["keep"] and rows[1]["fail_reasons"] == ""
    assert not rows[2]["ok_repetition"] and not rows[2]["keep"]
    assert "repetition" in rows[2]["fail_reasons"]
    assert not rows[3]["keep"]
    assert rows[3]["fail_reasons"].startswith("words")
    assert not rows[4]["ok_stopwords"] and not rows[4]["keep"]


def test_incremental_dedup_covers_all_new_pairs(spark):
    """Incremental (new-vs-index) + within-batch (new-vs-new) candidates
    must equal exactly the full-corpus LSH pairs that involve a new doc —
    the invariant that makes batchwise ingestion dedup sound."""
    from etdtransform_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_incremental,
        minhash_lsh_pairs,
    )

    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),   # dup of 1
        (3, "one two three four five six seven eight nine"),
        (4, "one two three four five six seven eight nine ten"),  # near 3
        (5, "totally different words entirely unrelated content here"),
        (6, "alpha beta gamma delta epsilon zeta eta theta iota"),  # near 1
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    new = docs.filter(F.col("doc_id") >= 5)
    accepted = docs.filter(F.col("doc_id") < 5)

    full = {
        frozenset((r["id_a"], r["id_b"]))
        for r in minhash_lsh_pairs(docs, num_hashes=8, bands=4).collect()
    }
    full_with_new = {p for p in full if any(i >= 5 for i in p)}

    index = minhash_band_index(accepted, num_hashes=8, bands=4)
    inc = {
        frozenset((r["new_id"], r["index_id"]))
        for r in minhash_lsh_incremental(
            new, index, num_hashes=8, bands=4
        ).collect()
    }
    within = {
        frozenset((r["id_a"], r["id_b"]))
        for r in minhash_lsh_pairs(new, num_hashes=8, bands=4).collect()
    }
    assert inc | within == full_with_new
    # and the near-dup planted across the boundary was found
    assert frozenset((1, 6)) in inc


def test_rolling_quantile_known_values(spark):
    from etdtransform_spark.operators.windows import rolling_quantile

    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate([1, 100, 2, 3, 2])],
        "k long, i long, v double",
    )
    out = df.select(
        "i",
        rolling_quantile("v", ["k"], ["i"], 0.5, 3).alias("m"),
    ).collect()
    got = {r["i"]: r["m"] for r in out}
    # trailing 3-row frames: [1], [1,100], [1,100,2], [100,2,3], [2,3,2]
    assert got == {0: 1.0, 1: 50.5, 2: 2.0, 3: 3.0, 4: 2.0}


def test_seasonal_residuals_ignores_seasonal_peak(spark):
    import datetime as dt

    from etdtransform_spark.operators.stats import seasonal_residuals
    from pyspark.sql import functions as F

    rows = []
    # 30 days: hour 18 always high (seasonal peak), hour 3 always low,
    # except day 29 hour 3 has a planted spike
    for d in range(30):
        base = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
        rows.append((d * 2, base.replace(hour=18), 100.0 + (d % 3)))
        v = 500.0 if d == 29 else 5.0 + (d % 3)
        rows.append((d * 2 + 1, base.replace(hour=3), v))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, v double")
    out = seasonal_residuals(
        df, "v", [], F.hour(F.col("ts")), threshold=3.0
    ).collect()
    flagged = {r["event_id"] for r in out}
    # only the planted 03:00 spike is anomalous; the 18:00 peaks are the
    # season's own baseline
    assert flagged == {59}


def test_load_duration_curve_shape(spark):
    from etdtransform_spark.operators.stats import load_duration_curve

    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate([5, 1, 9, 7, 3])],
        "g string, i long, v double",
    )
    out = sorted(
        (r["rank"], r["demand"], r["exceedance"])
        for r in load_duration_curve(df, "v", ["g"], ["i"]).collect()
    )
    assert [d for _r, d, _e in out] == [9.0, 7.0, 5.0, 3.0, 1.0]
    assert out[0][2] == 0.2 and out[-1][2] == 1.0


def test_corr_matrix_pairwise_deletion_and_degeneracy(spark):
    from etdtransform_spark.operators.stats import corr_matrix

    df = spark.createDataFrame(
        [
            (1.0, 2.0, 5.0),
            (2.0, 4.0, 5.0),
            (3.0, 6.0, 5.0),
            (4.0, None, 5.0),  # pairwise-deleted for (a,b) only
        ],
        "a double, b double, c double",
    )
    got = {(r["col_a"], r["col_b"]): (r["n"], r["corr"])
           for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    assert got[("a", "b")] == (3, 1.0)          # perfect correlation, n=3
    assert got[("a", "c")][1] is None           # constant c: degenerate
    assert got[("a", "c")][0] == 4
    assert got[("b", "c")][1] is None


def test_quantile_bins_boundary_membership(spark):
    from etdtransform_spark.operators.stats import quantile_bins

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], "id long, v double"
    )
    out = {r["id"]: r["bin"] for r in quantile_bins(df, "v", 4).collect()}
    # quartile boundaries of 1..8 (linear interp): 2.75, 4.5, 6.25 ->
    # bins: (−inf,2.75]=0, (2.75,4.5]=1, (4.5,6.25]=2, rest=3
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3}
    # equal frequency by construction
    from collections import Counter

    assert set(Counter(out.values()).values()) == {2}


def test_overlap_join_randomized_equals_brute_force(spark):
    """Seeded random intervals: bucketed overlap join must equal the naive
    all-pairs filter exactly (one row per overlapping pair, no bucket
    duplicates, no boundary misses) across a granularity sweep."""
    import random

    from etdtransform_spark.operators.temporal import overlap_join

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)

    def mk(n, prefix):
        rows = []
        for i in range(n):
            s = base + dt.timedelta(minutes=rng.randint(0, 5000))
            e = s + dt.timedelta(minutes=rng.randint(0, 600))
            rows.append((rng.randint(1, 3), f"{prefix}{i}", s, e))
        return rows

    lrows, rrows = mk(40, "L"), mk(40, "R")
    left = spark.createDataFrame(
        lrows, "k long, lid string, ls timestamp, le timestamp"
    )
    right = spark.createDataFrame(
        rrows, "k long, rid string, rs timestamp, re timestamp"
    )
    expect = sorted(
        (ll[1], rr[1])
        for ll in lrows
        for rr in rrows
        if ll[0] == rr[0] and ll[2] <= rr[3] and rr[2] <= ll[3]
    )
    for gran in (60, 3600, 86400):
        got = sorted(
            (r["lid"], r["rid"])
            for r in overlap_join(
                left, right, "ls", "le", "rs", "re", by=["k"],
                granularity_seconds=gran,
            ).collect()
        )
        assert got == expect, f"granularity={gran}"


def test_degree_days_clamps(spark):
    import datetime as dt

    from etdtransform_spark.operators.timeseries import degree_days

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = (
        # day 1: mean 10 -> hdd 8, cdd 0
        [(t0, 8.0), (t0 + dt.timedelta(hours=1), 12.0)]
        # day 2: mean 25 -> hdd 0, cdd 3
        + [(t0 + dt.timedelta(days=1), 24.0),
           (t0 + dt.timedelta(days=1, hours=2), 26.0)]
        # day 3: mean 20 (between bases) -> both 0
        + [(t0 + dt.timedelta(days=2), 20.0)]
    )
    df = spark.createDataFrame(rows, ["ts", "temp"])
    out = {r.day.isoformat(): r for r in degree_days(df, "ts", "temp").collect()}
    assert out["2024-01-01"].hdd == 8.0 and out["2024-01-01"].cdd == 0.0
    assert out["2024-01-02"].hdd == 0.0 and out["2024-01-02"].cdd == 3.0
    assert out["2024-01-03"].hdd == 0.0 and out["2024-01-03"].cdd == 0.0


def test_weather_normalize_removes_covariate(spark):
    from etdtransform_spark.operators.stats import weather_normalize

    # two groups with identical response to x but different baselines:
    # g1: y = 100 - 2x ; g2: y = 120 - 2x  -> at x_ref both report their a - 2*ref
    rows = []
    for x in range(0, 20):
        rows.append(("g1", float(x), 100.0 - 2.0 * x))
        rows.append(("g2", float(x), 120.0 - 2.0 * x))
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r.g: r for r in weather_normalize(df, "x", "y", ["g"], 10.0).collect()}
    assert out["g1"].slope == -2.0 and out["g2"].slope == -2.0
    assert out["g1"].y_at_ref == 80.0 and out["g2"].y_at_ref == 100.0


def test_degree_days_all_null_day_yields_null_not_zero(spark):
    """A day with no readings (all-NULL temps) must report NULL hdd/cdd —
    greatest() skips NULLs, so unguarded clamps fabricated 0.0."""
    import datetime as dt

    from etdtransform_spark.operators.timeseries import degree_days

    t0 = dt.datetime(2024, 1, 1, 6)
    rows = [("k", t0, 5.0), ("k", t0 + dt.timedelta(hours=2), 7.0),
            ("k", t0 + dt.timedelta(days=1), None)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, temp double")
    out = {r.day.isoformat(): r
           for r in degree_days(df, "ts", "temp", keys=["k"]).collect()}
    assert out["2024-01-01"].hdd is not None
    assert out["2024-01-02"].t_mean is None
    assert out["2024-01-02"].hdd is None and out["2024-01-02"].cdd is None


def test_quantize_null_element_stays_null(spark):
    """A NULL embedding dimension must quantize to NULL, not the top code
    (least() skips NULLs)."""
    from etdtransform_spark.operators.similarity import quantize_embeddings

    rows = [(1, [0.0, 1.0]), (2, [1.0, None]), (3, [0.5, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.codes
           for r in quantize_embeddings(df, n_dims=2).collect()}
    assert out[2][1] is None
    assert out[2][0] == 255

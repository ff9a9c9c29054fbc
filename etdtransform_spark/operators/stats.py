"""Statistical profiling operators: group-wise OLS regression, correlation,
fixed-width histograms.

The ETD use-case is heating analysis — energy use vs (perceived)
temperature per project — which is a per-group simple linear regression.
All three operators are single hash aggregates over closed-form sufficient
statistics (Σx, Σy, Σxy, Σx², counts): one shuffle proportional to group
count, no iteration, no ML library. At 100 TB the partial aggregation
(map-side combine) reduces each partition to a handful of doubles per group
before anything moves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import qround


def groupwise_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keys: Sequence[str],
    digits: int = 6,
) -> DataFrame:
    """Per-group simple OLS fit y = a + b*x via sufficient statistics:
    b = (n*Σxy − Σx*Σy) / (n*Σx² − (Σx)²), a = (Σy − b*Σx)/n, plus r²
    (NULL when x or y has zero variance). Rows where either side is NULL
    are excluded pairwise (count n counts complete pairs)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = F.when(x.isNotNull() & y.isNotNull(), F.lit(1))
    xb = F.when(y.isNotNull(), x)
    yb = F.when(x.isNotNull(), y)
    agged = df.groupBy(*keys).agg(
        F.count(both).cast("double").alias("_n"),
        F.sum(xb).alias("_sx"),
        F.sum(yb).alias("_sy"),
        F.sum(xb * yb).alias("_sxy"),
        F.sum(xb * xb).alias("_sxx"),
        F.sum(yb * yb).alias("_syy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxy, sxx, syy = F.col("_sxy"), F.col("_sxx"), F.col("_syy")
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    num = n * sxy - sx * sy
    slope = F.when(den_x != 0.0, num / den_x)
    intercept = F.when(den_x != 0.0, (sy - (num / den_x) * sx) / n)
    r2 = F.when((den_x != 0.0) & (den_y != 0.0), (num * num) / (den_x * den_y))
    return agged.select(
        *keys,
        n.cast("bigint").alias("n"),
        qround(slope, digits).alias("slope"),
        qround(intercept, digits).alias("intercept"),
        qround(r2, digits).alias("r2"),
    )


def groupwise_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keys: Sequence[str],
    digits: int = 6,
) -> Column | DataFrame:
    """Pearson correlation per group from the same sufficient statistics
    (NOT F.corr — its internal accumulation differs across engines; this
    formulation is the one the SQL oracle can reproduce op-for-op)."""
    fitted = groupwise_ols(df, x_col, y_col, keys, digits=12)
    # r = sign(slope) * sqrt(r2); recover without re-aggregating
    r = F.when(
        F.col("r2").isNotNull(),
        F.when(F.col("slope") < 0, -F.sqrt(F.col("r2"))).otherwise(
            F.sqrt(F.col("r2"))
        ),
    )
    return fitted.select(*keys, "n", qround(r, digits).alias("pearson_r"))


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width histogram with explicit [lo, hi) domain (explicit so the
    result is one pass — a data-driven domain costs an extra min/max pass);
    values outside clamp into the edge bins, NULLs dropped. Returns one row
    per (keys..., bin) with bin_start and count — only non-empty bins, like
    a groupBy should."""
    x = F.col(col).cast("double")
    w = (hi - lo) / n_bins
    raw = F.floor((x - F.lit(lo)) / F.lit(w)).cast("bigint")
    bin_id = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.filter(x.isNotNull())
        .groupBy(*keys, bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_start", qround(F.lit(lo) + F.col("bin") * F.lit(w), 6))
    )


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    digits: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation for ``cols`` in ONE aggregate pass:
    the k sums, k sum-of-squares, and k(k-1)/2 cross-products are all
    columns of a single hash aggregate (map-side combined), then the
    correlations are arithmetic on that one row — never k² scans, never a
    driver loop. Long-format output so downstream code joins on the pair.

    Pairs are computed over rows where BOTH columns are non-null
    (pairwise deletion — each pair gets its own n). Degenerate variance
    yields null. Returns (col_a, col_b, n, corr) for a < b.
    """
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            x = F.col(a).cast("double")
            y = F.col(b).cast("double")
            both = x.isNotNull() & y.isNotNull()
            xs = F.when(both, x)
            ys = F.when(both, y)
            p = f"{a}__{b}"
            aggs += [
                F.count(xs).cast("double").alias(f"_n_{p}"),
                F.sum(xs).alias(f"_sx_{p}"),
                F.sum(ys).alias(f"_sy_{p}"),
                F.sum(xs * xs).alias(f"_sxx_{p}"),
                F.sum(ys * ys).alias(f"_syy_{p}"),
                F.sum(xs * ys).alias(f"_sxy_{p}"),
            ]
    one = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            p = f"{a}__{b}"
            n = F.col(f"_n_{p}")
            sx, sy = F.col(f"_sx_{p}"), F.col(f"_sy_{p}")
            sxx, syy = F.col(f"_sxx_{p}"), F.col(f"_syy_{p}")
            sxy = F.col(f"_sxy_{p}")
            cov = sxy - sx * sy / n
            vx = sxx - sx * sx / n
            vy = syy - sy * sy / n
            corr = F.when(
                (n > 1) & (vx > 0) & (vy > 0),
                qround(cov / F.sqrt(vx * vy), digits),
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    n.cast("bigint").alias("n"),
                    corr.alias("corr"),
                )
            )
    return one.select(F.explode(F.array(*pairs)).alias("_p")).select(
        "_p.col_a", "_p.col_b", "_p.n", "_p.corr"
    )


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    keys: Sequence[str] = (),
    digits: int = 6,
) -> DataFrame:
    """Equal-frequency binning (quantile discretizer): learn the
    ``n_bins - 1`` interior exact-percentile boundaries (per key when
    ``keys`` given, global otherwise), then assign each row its bin —
    boundary semantics: bin b holds values in (q_b, q_{b+1}], first bin
    closed below. One boundary aggregate (dimension-sized) broadcast back
    onto the scan; the assignment is a fold over the boundary array in
    codegen, not a per-bin CASE cascade.

    Boundaries are rounded before comparison so bin membership at a
    boundary is cross-engine deterministic. Returns the input +
    ``bin`` (0-based) + the learned ``boundaries`` array.
    """
    x = F.col(col).cast("double")
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = df.groupBy(*keys).agg(
        F.array(
            *[qround(F.percentile(x, F.lit(q)), digits) for q in qs]
        ).alias("boundaries")
    )
    joined = (
        df.join(F.broadcast(bounds), list(keys)) if keys
        else df.crossJoin(F.broadcast(bounds))
    )
    xr = qround(x, digits)
    bin_idx = F.aggregate(
        F.col("boundaries"),
        F.lit(0),
        lambda acc, b: acc + F.when(xr > b, 1).otherwise(0),
    )
    return joined.withColumn(
        "bin", F.when(x.isNotNull(), bin_idx)
    )


def seasonal_residuals(
    df: DataFrame,
    col: str,
    keys: Sequence[str],
    season: Column,
    season_name: str = "season",
    threshold: float = 3.0,
    digits: int = 6,
) -> DataFrame:
    """Seasonal-baseline anomaly detection: each row's value is compared to
    the mean of its (key, season) cell — e.g. (household, hour-of-day) —
    and flagged when the residual exceeds ``threshold`` cell standard
    deviations. The de-seasonalized twin of :func:`zscore_outliers`: a
    plain z-score calls every 18:00 demand peak an outlier; scoring against
    the same-season baseline flags genuinely anomalous readings (the meter
    that spikes at 03:00).

    Same physical shape as zscore_outliers: one sufficient-statistics
    aggregate over (keys, season) — cell count is bounded by keys x
    seasons, broadcast back — and the rounded z decides membership so an
    ulp can't flip inclusion cross-engine.

    Returns the input rows + (season, baseline, z) for flagged rows.
    """
    x = F.col(col).cast("double")
    seasoned = df.withColumn(season_name, season)
    stats = seasoned.groupBy(*keys, season_name).agg(
        F.count(x).cast("double").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sxx"),
    )
    joined = seasoned.join(F.broadcast(stats), [*keys, season_name])
    n, sx, sxx = F.col("_n"), F.col("_sx"), F.col("_sxx")
    baseline = sx / n
    # n=1 cells have no sample sd: NULL z (row never flagged), not an
    # ANSI DIVIDE_BY_ZERO abort
    z = qround(
        F.when(n > 1, (x - baseline) / F.sqrt((sxx - sx * sx / n) / (n - 1))),
        digits,
    )
    return (
        joined.withColumn("baseline", qround(baseline, digits))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > threshold)
        .drop("_n", "_sx", "_sxx")
    )


def load_duration_curve(
    df: DataFrame,
    col: str,
    keys: Sequence[str],
    order_cols: Sequence[str] = (),
    digits: int = 6,
) -> DataFrame:
    """Load-duration curve per key: every demand value ranked descending
    with its exceedance fraction rank/n — the sorted-demand curve energy
    planning reads peak/base load off. One window pass per key (rank +
    count over the same partition); ties broken by ``order_cols`` so the
    curve is total-ordered and deterministic.

    Returns (keys..., rank, exceedance, value-as-demand).
    """
    from pyspark.sql import Window

    x = F.col(col).cast("double")
    w = Window.partitionBy(*keys).orderBy(
        x.desc(), *[F.col(c) for c in order_cols]
    )
    wn = Window.partitionBy(*keys)
    return df.select(
        *keys,
        F.row_number().over(w).alias("rank"),
        qround(
            F.row_number().over(w) / F.count(F.lit(1)).over(wn).cast("double"),
            digits,
        ).alias("exceedance"),
        x.alias("demand"),
    )


def zscore_outliers(
    df: DataFrame,
    col: str,
    keys: Sequence[str],
    threshold: float = 3.0,
    digits: int = 6,
) -> DataFrame:
    """Rows whose value deviates more than ``threshold`` sample standard
    deviations from their group mean. Mean/std come from one sufficient-
    statistics aggregate joined back (broadcast — one row per group), so the
    fact table is scanned twice but shuffled zero times beyond the tiny
    stats agg. The flag compares the ROUNDED z-score so membership is
    deterministic cross-engine (an unrounded boundary comparison would let
    one ulp decide inclusion)."""
    x = F.col(col).cast("double")
    stats = df.groupBy(*keys).agg(
        F.count(x).cast("double").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sxx"),
    )
    joined = df.join(F.broadcast(stats), list(keys))
    n, sx, sxx = F.col("_n"), F.col("_sx"), F.col("_sxx")
    # n=1 groups have no sample sd: NULL z (row never flagged), not an
    # ANSI DIVIDE_BY_ZERO abort
    z = qround(
        F.when(n > 1, (x - sx / n) / F.sqrt((sxx - sx * sx / n) / (n - 1))),
        digits,
    )
    return (
        joined.withColumn("z", z)
        .filter(F.abs(F.col("z")) > threshold)
        .drop("_n", "_sx", "_sxx")
    )


def quantile_summary(
    df: DataFrame,
    col: str,
    keys: Sequence[str],
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    iqr_k: float = 1.5,
    digits: int = 6,
) -> DataFrame:
    """Per-group exact quantiles (linear interpolation between order
    statistics — Spark ``percentile``, the same R-7 definition DuckDB's
    ``quantile_cont`` uses) plus Tukey IQR fences. The distributed
    generalization of the reference's filtered exact-p95 bound
    (impute.py:55-60,81-90): exact, not approximate, because the bounds
    feed imputation decisions and must hash-match an oracle.

    Exact percentile buffers each group's values on one reducer — the
    documented scale tradeoff (PLANS.md): fine for per-project groups
    (thousands of rows each); for billions-per-group switch to
    ``percentile_approx`` and give up oracle equality.
    """
    x = F.col(col).cast("double")
    qs = F.percentile(x, F.array(*[F.lit(p) for p in probs]))
    out = df.groupBy(*keys).agg(
        F.count(x).alias("n"), qs.alias("_q")
    )
    named = [
        qround(F.col("_q")[i], digits).alias(f"p{round(p * 100):02d}")
        for i, p in enumerate(probs)
    ]
    out = out.select(*keys, "n", *named)
    if 0.25 in probs and 0.75 in probs:
        lo, hi = F.col("p25"), F.col("p75")
        out = (
            out.withColumn("iqr", qround(hi - lo, digits))
            .withColumn("lo_fence", qround(lo - iqr_k * (hi - lo), digits))
            .withColumn("hi_fence", qround(hi + iqr_k * (hi - lo), digits))
        )
    return out


def mad_outliers(
    df: DataFrame,
    col: str,
    keys: Sequence[str],
    k: float = 3.0,
    digits: int = 6,
) -> DataFrame:
    """Robust outlier detection by median absolute deviation: flag rows with
    ``|x - median| > k * 1.4826 * MAD`` per group (1.4826 scales MAD to the
    stddev of a normal, making ``k`` comparable to a z-score threshold —
    but unlike :func:`zscore_outliers`, one wild value cannot drag the
    center or the spread). Two exact-median aggregation passes with
    broadcast joins back (group-stats tables are tiny); membership compares
    the ROUNDED robust score for cross-engine determinism. Exact
    ``percentile`` is the oracle-parity choice; at extreme group sizes swap
    ``percentile_approx`` as with :func:`quantile_summary`."""
    x = F.col(col).cast("double")
    med = df.groupBy(*keys).agg(
        qround(F.percentile(x, F.lit(0.5)), digits).alias("_med")
    )
    with_med = df.join(F.broadcast(med), list(keys))
    mad = with_med.groupBy(*keys).agg(
        qround(
            F.percentile(F.abs(x - F.col("_med")), F.lit(0.5)), digits
        ).alias("_mad")
    )
    joined = with_med.join(F.broadcast(mad), list(keys))
    # MAD = 0 (every group member equal — any 1-row group) means no spread
    # to score against: robust_z is NULL and the row can never flag.
    # Explicit guard, not bare division: ANSI Spark throws DIVIDE_BY_ZERO
    # where DuckDB's float x/0.0 yields NULL (caught by the 1-row fixture
    # sweep) — the When mirrors the oracle's NULL exactly.
    score = qround(
        F.when(
            F.col("_mad") != 0,
            (x - F.col("_med")) / (F.lit(1.4826) * F.col("_mad")),
        ),
        digits,
    )
    return (
        joined.withColumn("robust_z", score)
        .filter(F.abs(F.col("robust_z")) > k)
        .drop("_med", "_mad")
    )


def profile_table(
    df: DataFrame,
    cols: Sequence[str],
    digits: int = 4,
) -> DataFrame:
    """Long-format numeric profile of ``cols``: one output row per column
    with count / null count / mean / sample std / min / max — the
    ``df.summary()`` shape made deterministic (rounded moments) and
    column-oriented so a 169-column ETD table profiles in ONE aggregate
    pass + unpivot, not 169 jobs. The single wide agg keeps one scan and
    one (tiny) shuffle regardless of column count."""
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.count(x).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            qround(F.avg(x), digits).alias(f"{c}__mean"),
            qround(F.stddev_samp(x), digits).alias(f"{c}__std"),
            qround(F.min(x), digits).alias(f"{c}__min"),
            qround(F.max(x), digits).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__mean").alias("mean"),
            F.col(f"{c}__std").alias("std"),
            F.col(f"{c}__min").alias("min"),
            F.col(f"{c}__max").alias("max"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    keys: Sequence[str],
    q: float = 0.5,
    out_col: str = "wq",
) -> DataFrame:
    """Per-group lower weighted quantile: the smallest value whose cumulative
    weight reaches ``q`` of the group's total weight (q=0.5 → weighted
    median). The reference's project aggregation weights every household
    equally; this is the operator a floor-area- or occupancy-weighted rollup
    needs (reference README.md:92-96 exposes `Oppervlakte` for exactly such
    weighting).

    The cumulative weight uses a RANGE frame over the value ordering so all
    ties of a value accumulate together — deterministic regardless of
    partition-internal row order. One exchange (partition by group), one
    sort, both window expressions share it; the final min() per group is a
    map-side-combined hash agg. Rows with NULL value or weight are excluded.
    """
    v = F.col(value_col).cast("double")
    wt = F.col(weight_col).cast("double")
    base = df.filter(v.isNotNull() & wt.isNotNull())
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(v)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = F.sum(wt).over(w_cum)
    tot = F.sum(wt).over(w_all)
    return (
        base.withColumn("_hit", F.when(cum >= F.lit(q) * tot, v))
        .groupBy(*keys)
        .agg(qround(F.min("_hit"), 6).alias(out_col))
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    threshold: float,
    digits: int = 6,
) -> DataFrame:
    """Exact frequent-items: every value of ``item_col`` whose share of all
    rows is ≥ ``threshold``, with count and rounded share.

    Shape: one map-side-combined hash agg per item + the grand total as a
    broadcast one-row cross join (no driver action, the TPC-H Q22 scalar
    pattern). At 100 TB both aggregates partial-combine, the shuffle carries
    one row per distinct item. By the pigeonhole bound at most ⌈1/threshold⌉
    items can pass, so the output is O(1/threshold) rows no matter the input
    size — the exact counterpart of the Misra-Gries/count-min sketch, which
    is only needed when the distinct-item dictionary itself cannot be
    shuffled (then: per-partition Misra-Gries candidates via mapInPandas +
    this exact pass restricted to candidates).
    """
    counts = df.groupBy(F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(threshold) * F.col("_tot"))
        .select(
            "item",
            "cnt",
            qround(F.col("cnt") / F.col("_tot"), digits).alias("share"),
        )
    )


def categorical_divergence(
    df: DataFrame,
    group_col: str,
    value_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group Shannon entropy (nats) of the categorical ``value_col``
    distribution, plus KL(group ‖ corpus) against the global distribution —
    the drift/diversity signal a training-data mixture monitor runs per
    source or per day.

    Single scan: counts per (group, value) are the only data-sized shuffle;
    the global per-value distribution is re-aggregated FROM those counts
    (dictionary-sized, no second scan) and broadcast back. KL is finite by
    construction: every group value occurs in the global distribution, and
    0·ln(0) terms never arise because only observed (group, value) pairs
    produce rows."""
    gv = df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).alias("val")
    ).agg(F.count(F.lit(1)).alias("n"))
    g_tot = gv.groupBy("grp").agg(F.sum("n").alias("g_n"))
    v_glob = gv.groupBy("val").agg(F.sum("n").alias("v_n"))
    all_tot = gv.agg(F.sum("n").alias("all_n"))
    p = F.col("n") / F.col("g_n")
    qq = F.col("v_n") / F.col("all_n")
    return (
        gv.join(g_tot, "grp")
        .join(F.broadcast(v_glob), "val")
        .crossJoin(F.broadcast(all_tot))
        .groupBy("grp")
        .agg(
            qround(-F.sum(p * F.log(p)), digits).alias("entropy"),
            qround(F.sum(p * F.log(p / qq)), digits).alias("kl_vs_global"),
        )
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    digits: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic between two groups
    (the A/B-experiment read-out): per-arm mean and sample variance from
    sufficient statistics, t = (m_a − m_b)/√(v_a/n_a + v_b/n_b), and the
    Welch–Satterthwaite degrees of freedom. One conditional full-scan
    aggregate — adding an arm or metric adds columns, never passes. The
    statistic is left for the caller to convert to a p-value (no t CDF in
    either engine; at A/B sample sizes the normal approximation serves).
    """
    x = F.col(value_col).cast("double")
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    agged = df.filter(in_a | in_b).agg(
        F.count(F.when(in_a, x)).cast("double").alias("n_a"),
        F.sum(F.when(in_a, x)).alias("s_a"),
        F.sum(F.when(in_a, x * x)).alias("q_a"),
        F.count(F.when(in_b, x)).cast("double").alias("n_b"),
        F.sum(F.when(in_b, x)).alias("s_b"),
        F.sum(F.when(in_b, x * x)).alias("q_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    ma = F.col("s_a") / na
    mb = F.col("s_b") / nb
    # n <= 1 arms yield NULL variance (and thus NULL t/dof) instead of an
    # ANSI DIVIDE_BY_ZERO abort — a single-observation arm is a degenerate
    # test, not a job failure
    va = F.when(
        na > 1, (F.col("q_a") - F.col("s_a") * F.col("s_a") / na) / (na - 1)
    )
    vb = F.when(
        nb > 1, (F.col("q_b") - F.col("s_b") * F.col("s_b") / nb) / (nb - 1)
    )
    sea = va / na
    seb = vb / nb
    t = (ma - mb) / F.sqrt(sea + seb)
    dof = F.when(
        (na > 1) & (nb > 1),
        (sea + seb) * (sea + seb)
        / (sea * sea / (na - 1) + seb * seb / (nb - 1)),
    )
    return agged.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        qround(ma, digits).alias("mean_a"),
        qround(mb, digits).alias("mean_b"),
        qround(t, digits).alias("t_stat"),
        qround(dof, digits).alias("dof"),
    )


def chi_square(
    df: DataFrame,
    group_col: str,
    outcome_col: str,
    digits: int = 6,
) -> DataFrame:
    """Pearson chi-square statistic for the group × outcome contingency
    table (independence test for conversion-rate style experiments):
    χ² = Σ (O−E)²/E with E = row_total·col_total/N, dof = (r−1)(c−1).

    One (group, outcome) count aggregate is the only data-sized shuffle;
    margins come from re-aggregating the contingency cells (dictionary-
    sized). Cells absent from the data contribute (0−E)²/E, materialized by
    scaffolding the full margin grid with a cross join of the two margins —
    cardinality r×c, never data-sized."""
    cells = df.groupBy(
        F.col(group_col).alias("g"), F.col(outcome_col).alias("o")
    ).agg(F.count(F.lit(1)).alias("n"))
    gm = cells.groupBy("g").agg(F.sum("n").alias("g_n"))
    om = cells.groupBy("o").agg(F.sum("n").alias("o_n"))
    tot = cells.agg(F.sum("n").alias("all_n"))
    grid = gm.crossJoin(F.broadcast(om)).join(cells, ["g", "o"], "left")
    e = F.col("g_n") * F.col("o_n") / F.col("all_n")
    o_ = F.coalesce(F.col("n"), F.lit(0)).cast("double")
    return (
        grid.crossJoin(F.broadcast(tot))
        .agg(
            qround(F.sum((o_ - e) * (o_ - e) / e), digits).alias("chi2"),
            (
                (F.count_distinct("g") - 1) * (F.count_distinct("o") - 1)
            ).alias("dof"),
        )
    )


def cramers_v(
    df: DataFrame,
    group_col: str,
    outcome_col: str,
    digits: int = 6,
) -> DataFrame:
    """Cramér's V effect size for the group × outcome association — the
    companion to :func:`chi_square` that answers "how strong", not just
    "how unlikely" (χ² grows with N, so at 100 TB *everything* is
    significant; V is the scale-free number a pipeline should alert on).

    V = sqrt((χ²/N) / (min(r,c)−1)), plus the Bergsma-Warrens
    bias-corrected variant (φ², r, c each shrunk by their small-sample
    expectation; corrected V is what to compare across differently-sized
    segments). Degenerate tables (min(r,c)=1, or n≤1 for the corrected
    form) yield NULL — association is undefined, not 0.

    Rows with a NULL group or outcome are excluded — a row with an
    unknown category carries no association evidence, and keeping NULL
    as a level would desynchronize the expected-frequency grid from the
    count_distinct level counts.

    Same shape as chi_square: ONE data-sized (group, outcome) count
    aggregate; everything after runs on the r×c contingency grid.
    Returns (n, r_levels, c_levels, chi2, cramers_v, cramers_v_corrected).
    """
    df = df.filter(
        F.col(group_col).isNotNull() & F.col(outcome_col).isNotNull()
    )
    cells = df.groupBy(
        F.col(group_col).alias("g"), F.col(outcome_col).alias("o")
    ).agg(F.count(F.lit(1)).alias("n"))
    gm = cells.groupBy("g").agg(F.sum("n").alias("g_n"))
    om = cells.groupBy("o").agg(F.sum("n").alias("o_n"))
    tot = cells.agg(F.sum("n").alias("all_n"))
    grid = gm.crossJoin(F.broadcast(om)).join(cells, ["g", "o"], "left")
    e = F.col("g_n") * F.col("o_n") / F.col("all_n")
    o_ = F.coalesce(F.col("n"), F.lit(0)).cast("double")
    raw = grid.crossJoin(F.broadcast(tot)).agg(
        F.max("all_n").alias("n"),
        F.count_distinct("g").alias("r_levels"),
        F.count_distinct("o").alias("c_levels"),
        F.sum((o_ - e) * (o_ - e) / e).alias("_chi2"),
    )
    n = F.col("n").cast("double")
    r = F.col("r_levels").cast("double")
    c = F.col("c_levels").cast("double")
    phi2 = F.col("_chi2") / n
    k_min = F.least(r, c) - 1
    v = F.when(k_min > 0, F.sqrt(phi2 / k_min))
    # Bergsma-Warrens correction (n > 1 required by the (n−1) shrinkage)
    phi2c = F.greatest(
        phi2 - (r - 1) * (c - 1) / (n - 1), F.lit(0.0)
    )
    rc = r - (r - 1) * (r - 1) / (n - 1)
    cc = c - (c - 1) * (c - 1) / (n - 1)
    kc = F.least(rc, cc) - 1
    vc = F.when((n > 1) & (kc > 0), F.sqrt(phi2c / kc))
    return raw.select(
        # empty (fully-null) input: MAX over the empty grid is NULL —
        # coalesce to 0 so degenerate corpora report n=0 with NULL
        # statistics, the same fail-closed convention as srm_check /
        # mde_estimate (ADVICE r10 #5).
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        "r_levels",
        "c_levels",
        qround(F.col("_chi2"), digits).alias("chi2"),
        qround(v, digits).alias("cramers_v"),
        qround(vc, digits).alias("cramers_v_corrected"),
    )


def benjamini_hochberg(
    df: DataFrame,
    p_col: str,
    key_cols: Sequence[str],
    alpha: float = 0.05,
    digits: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg FDR correction over a table of hypothesis
    tests — the missing last step of the drift family: psi_drift /
    ks_2samp / chi_square run PER SEGMENT, so a 10 000-segment sweep at
    α=0.05 fabricates ~500 "drifting" alerts from noise unless the
    p-values are jointly corrected.

    Step-up procedure via its adjusted-p equivalence: rank p ascending,
    p_adj(i) = min(1, min_{k≥i} p(k)·m/k) (suffix cumulative min), reject
    where p_adj ≤ α — provably identical to "reject all i ≤ max{i : p(i)
    ≤ iα/m}". Ties carry a total order on (p, key_cols) so ranks — and
    therefore every downstream value — are engine-deterministic; key
    columns sort ascending NULLS FIRST (Spark's asc default — an oracle
    twin must say NULLS FIRST explicitly, DuckDB defaults NULLS LAST).
    NULL p-values are dropped (an untested hypothesis is not evidence).

    The window is GLOBAL over the hypothesis table — m here is the
    number of *tests* (segments × metrics), dictionary-sized by
    construction, never the row count of the data the tests were
    computed from; the data-sized work already happened inside the
    upstream test operators.

    Returns (key_cols…, p_value, rank, m_tests, p_adj, reject).
    """
    if not key_cols:
        raise ValueError("key_cols must identify each hypothesis")
    p = F.col(p_col).cast("double")
    base = df.filter(p.isNotNull() & ~F.isnan(p)).select(
        *key_cols, p.alias("p_value")
    )
    order = [F.col("p_value").asc()] + [F.col(k).asc() for k in key_cols]
    w_rank = Window.orderBy(*order)
    ranked = base.select(
        *key_cols,
        "p_value",
        F.row_number().over(w_rank).alias("rank"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("m_tests"),
    )
    w_suffix = (
        Window.orderBy(F.col("rank").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = F.min(
        F.col("p_value") * F.col("m_tests") / F.col("rank")
    ).over(w_suffix)
    return ranked.select(
        *key_cols,
        qround(F.col("p_value"), digits).alias("p_value"),
        "rank",
        "m_tests",
        qround(F.least(stepped, F.lit(1.0)), digits).alias("p_adj"),
        (F.least(stepped, F.lit(1.0)) <= F.lit(alpha)).alias("reject"),
    )


def cuped_summary(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    arm_col: str,
    digits: int = 6,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013):
    per-arm means of Y and of the adjusted metric Y − θ·(X − X̄), with
    θ = cov(X, Y)/var(X) estimated GLOBALLY (pooled across arms — the
    standard, unbiased-under-randomization choice) from a
    pre-experiment covariate X. The variance-reduction column reports
    var(Y−θX)/var(Y): 1−ρ² in expectation, the factor by which the
    experiment's effective sample size grows for free.

    Shape: one global moment aggregate (Σx, Σy, Σxy, Σxx, n → 1-row θ
    frame, broadcast back) + one per-arm aggregate of the adjusted
    values — two scans of the input, both aggregates map-side combined
    (shuffle carries 1 + |arms| partial rows per task). Rows missing metric, covariate, or arm carry
    no paired evidence and are excluded (CUPED needs the pair). var(X)
    ≤ 0 (constant covariate) yields NULL θ and NULL adjusted columns —
    fail closed, the raw means remain.

    Returns (arm, n, mean_raw, mean_adj, theta, var_reduction).
    """
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    base = df.filter(
        y.isNotNull() & ~F.isnan(y)
        & x.isNotNull() & ~F.isnan(x)
        & F.col(arm_col).isNotNull()
    ).select(F.col(arm_col).alias("arm"), y.alias("_y"), x.alias("_x"))
    g = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    nn = F.col("_n").cast("double")
    var_x = F.col("_sxx") - F.col("_sx") * F.col("_sx") / nn
    cov_xy = F.col("_sxy") - F.col("_sx") * F.col("_sy") / nn
    theta_frame = g.select(
        F.when((F.col("_n") > 1) & (var_x > 0), cov_xy / var_x)
        .alias("_theta"),
        (F.col("_sx") / nn).alias("_xbar"),
    )
    adj = base.crossJoin(F.broadcast(theta_frame)).select(
        "arm",
        "_y",
        (
            F.col("_y")
            - F.col("_theta") * (F.col("_x") - F.col("_xbar"))
        ).alias("_ya"),
    )
    per_arm = adj.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        qround(F.avg("_y"), digits).alias("mean_raw"),
        qround(F.avg("_ya"), digits).alias("mean_adj"),
        F.sum("_y").alias("_ay"),
        F.sum(F.col("_y") * F.col("_y")).alias("_ayy"),
        F.sum("_ya").alias("_aa"),
        F.sum(F.col("_ya") * F.col("_ya")).alias("_aaa"),
    )
    an = F.col("n").cast("double")
    var_y = F.col("_ayy") - F.col("_ay") * F.col("_ay") / an
    var_a = F.col("_aaa") - F.col("_aa") * F.col("_aa") / an
    return per_arm.crossJoin(F.broadcast(theta_frame)).select(
        "arm",
        "n",
        "mean_raw",
        "mean_adj",
        qround(F.col("_theta"), digits).alias("theta"),
        qround(
            F.when((F.col("n") > 1) & (var_y > 0), var_a / var_y), digits
        ).alias("var_reduction"),
    )


def _inv_norm_cdf(p: float) -> float:
    """Acklam's rational approximation of Φ⁻¹ (|rel err| < 1.15e-9) —
    driver-side only: the result enters plans as a literal, so both
    engines see the identical constant."""
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    import math

    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    p_low, p_high = 0.02425, 1 - 0.02425
    if p < p_low:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
                + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > p_high:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
                 + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
            + a[5]) * q / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                            + b[4]) * r + 1)


def chi2_critical(dof: int, alpha: float) -> float:
    """Upper-α chi-square critical value (driver-side constant).

    dof 1 and 2 are EXACT closed forms (χ²₁ = Z², so the quantile is
    Φ⁻¹(1−α/2)²; χ²₂ is Exp(mean 2), so it is −2·ln α); dof ≥ 3 uses
    the Wilson-Hilferty cube approximation (relative error < 1 % there,
    ample for an alarm threshold — WH alone is ~2.5 % off at dof=1,
    which is why the low dofs are special-cased)."""
    import math

    if dof < 1:
        raise ValueError(f"dof must be >= 1, got {dof}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if dof == 1:
        z = _inv_norm_cdf(1.0 - alpha / 2.0)
        return z * z
    if dof == 2:
        return -2.0 * math.log(alpha)
    z = _inv_norm_cdf(1.0 - alpha)
    t = 1.0 - 2.0 / (9.0 * dof) + z * (2.0 / (9.0 * dof)) ** 0.5
    return dof * t * t * t


def srm_check(
    df: DataFrame,
    arm_col: str,
    expected: dict[str, float],
    alpha: float = 0.001,
    digits: int = 6,
) -> DataFrame:
    """Sample-ratio-mismatch alarm for an experiment assignment: a
    chi-square goodness-of-fit of observed arm counts against the
    DECLARED allocation (e.g. {"control": 0.5, "treatment": 0.5}). SRM
    is the canonical "your experiment infrastructure is broken" check —
    run before reading any metric; the conventional α is strict (0.001)
    because the test runs on every experiment every day.

    The critical value is a DRIVER-SIDE constant (Wilson-Hilferty), so
    the data-sided work is ONE arm-count aggregate (k partial rows per
    map task); rows whose arm is NULL or not in ``expected`` are
    counted into ``n_unexpected`` (an SRM signal in themselves if
    nonzero) and excluded from the statistic. Expected shares are
    normalized to sum to 1, so callers may pass weights.

    Returns ONE row: (n, n_unexpected, dof, chi2, chi2_crit,
    srm_detected). An empty assignment yields n=0 with NULL chi2 and
    NULL srm_detected (no evidence — fail closed, not "no SRM").
    """
    if not expected:
        raise ValueError("expected allocation must be non-empty")
    if any(v <= 0 for v in expected.values()):
        raise ValueError("expected shares must be positive")
    tot_w = float(sum(expected.values()))
    shares = {k: v / tot_w for k, v in expected.items()}
    arms = sorted(shares)
    dof = len(arms) - 1
    crit = chi2_critical(dof, alpha) if dof >= 1 else 0.0
    a = F.col(arm_col)
    counts = df.select(
        F.when(a.isin(list(arms)), a).alias("_arm"),
    ).groupBy("_arm").agg(F.count(F.lit(1)).alias("_c"))
    share_expr = F.create_map(
        *[x for k in arms for x in (F.lit(k), F.lit(shares[k]))]
    )
    agg = counts.agg(
        F.sum(F.when(F.col("_arm").isNotNull(), F.col("_c"))
              .otherwise(0)).alias("_n"),
        F.sum(F.when(F.col("_arm").isNull(), F.col("_c"))
              .otherwise(0)).alias("n_unexpected"),
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("_arm").isNotNull(),
                       F.struct(F.col("_arm"), F.col("_c")))
            )
        ).alias("_obs"),
    )
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("double")
    chi2 = None
    for k in arms:
        o = F.coalesce(
            F.element_at(F.col("_obs"), F.lit(k)), F.lit(0)
        ).cast("double")
        e = n * F.lit(shares[k])
        term = (o - e) * (o - e) / e
        chi2 = term if chi2 is None else chi2 + term
    chi2 = F.when(n > 0, chi2)
    return agg.select(
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n"),
        F.coalesce(F.col("n_unexpected"), F.lit(0)).cast("bigint")
        .alias("n_unexpected"),
        F.lit(dof).cast("bigint").alias("dof"),
        qround(chi2, digits).alias("chi2"),
        qround(F.lit(crit), digits).alias("chi2_crit"),
        F.when(chi2.isNotNull(), chi2 > F.lit(crit)).alias("srm_detected"),
    )


def mde_estimate(
    df: DataFrame,
    metric_col: str,
    n_per_arm: int | None = None,
    alpha: float = 0.05,
    power: float = 0.8,
    digits: int = 6,
) -> DataFrame:
    """Minimum detectable effect for a two-arm experiment on this
    metric — the planning companion to :func:`srm_check` (validity) /
    :func:`cuped_summary` (variance) / :func:`welch_ttest` (readout):
    before launching, how small a lift could this population even
    resolve?

    MDE_abs = (z₁₋α/2 + z_power) · σ · √(2/n_arm) with σ the observed
    sample standard deviation and n_arm = ``n_per_arm`` or ⌊n/2⌋ (an
    even split of the rows at hand). Both z's are driver-side Acklam
    constants, so the data-sized work is ONE moment aggregate. The
    relative MDE divides by the observed mean (NULL when the mean is 0
    — a ratio against nothing). n < 2 or zero variance yields NULL MDEs
    (no dispersion evidence), n_rows stays.

    Returns ONE row: (n_rows, n_per_arm, mean, sd, mde_abs, mde_rel).
    """
    if n_per_arm is not None and n_per_arm < 1:
        raise ValueError(f"n_per_arm must be >= 1, got {n_per_arm}")
    z = _inv_norm_cdf(1.0 - alpha / 2.0) + _inv_norm_cdf(power)
    x = F.col(metric_col).cast("double")
    g = df.filter(x.isNotNull() & ~F.isnan(x)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sxx"),
    )
    n = F.col("n_rows").cast("double")
    var = (F.col("_sxx") - F.col("_sx") * F.col("_sx") / n) / (n - 1)
    sd = F.when((F.col("n_rows") > 1) & (var > 0), F.sqrt(var))
    arm = (
        F.lit(n_per_arm).cast("double")
        if n_per_arm is not None
        else F.floor(n / 2).cast("double")
    )
    mean = F.col("_sx") / n
    mde = F.when(arm > 0, F.lit(z) * sd * F.sqrt(2.0 / arm))
    return g.select(
        "n_rows",
        arm.cast("bigint").alias("n_per_arm"),
        qround(F.when(F.col("n_rows") > 0, mean), digits).alias("mean"),
        qround(sd, digits).alias("sd"),
        qround(mde, digits).alias("mde_abs"),
        qround(
            F.when(mean != 0, mde / F.abs(mean)), digits
        ).alias("mde_rel"),
    )


def msprt_always_valid_p(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    arm_a,
    arm_b,
    tau: float = 1.0,
    alpha: float = 0.05,
    digits: int = 6,
) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT) always-valid
    p-value for a two-arm mean difference — the peeking-safe companion
    to :func:`welch_ttest`: a fixed-horizon p is only valid at ONE
    pre-registered look, while this p can be read every hour of a
    running experiment and still bounds type-I error (Robbins 1970
    mixture martingale; the Optimizely "New Stats Engine" formulation,
    Johari et al. 2017).

    With Δ̄ the observed mean difference, σ² the pooled sample variance
    and ñ = 2/(1/n_a + 1/n_b) the effective per-arm size (the variance
    of Δ̄ is 2σ²/ñ), the Gaussian-mixture likelihood ratio with prior
    scale τ is

        Λ = √(2σ²/(2σ² + ñτ²)) · exp( ñ²τ²Δ̄² / (4σ²(2σ² + ñτ²)) )

    and the returned p is the INSTANTANEOUS upper bound min(1, 1/Λ) for
    this snapshot of the data. It is a valid always-valid bound at every
    look, but it is NOT monotone across looks (Λ can shrink between
    ticks); a caller who wants the classical monotone non-increasing
    always-valid p-value process must keep the running minimum of the
    returned p across its monitoring ticks. τ is the analyst's prior
    scale for plausible
    effects — too small wastes power on large effects, too large on
    small ones; σ-scaled values (≈ the MDE) are the standard choice.

    ONE conditional-moment aggregate (map-side combined; the same
    sufficient-statistics discipline as welch_ttest) — re-runnable
    every monitoring tick at any data size. Degenerate inputs fail
    closed: n < 2 on either arm or zero pooled variance yields NULL
    p (no dispersion evidence ⇒ no test), never a rejection.

    Returns ONE row: (n_a, n_b, mean_a, mean_b, diff, pooled_var,
    log_lambda, p_always_valid, reject).
    """
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    x = F.col(metric_col).cast("double")
    in_a = F.col(arm_col) == arm_a
    in_b = F.col(arm_col) == arm_b
    base = df.filter((in_a | in_b) & x.isNotNull() & ~F.isnan(x))
    g = base.agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("_na"),
        F.sum(F.when(in_b, 1).otherwise(0)).alias("_nb"),
        F.sum(F.when(in_a, x).otherwise(0.0)).alias("_sa"),
        F.sum(F.when(in_b, x).otherwise(0.0)).alias("_sb"),
        F.sum(F.when(in_a, x * x).otherwise(0.0)).alias("_qa"),
        F.sum(F.when(in_b, x * x).otherwise(0.0)).alias("_qb"),
    )
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    ma = F.col("_sa") / na
    mb = F.col("_sb") / nb
    # pooled sample variance: (SSa + SSb) / (na + nb - 2)
    ssa = F.col("_qa") - F.col("_sa") * F.col("_sa") / na
    ssb = F.col("_qb") - F.col("_sb") * F.col("_sb") / nb
    pooled = (ssa + ssb) / (na + nb - 2.0)
    neff = 2.0 / (1.0 / na + 1.0 / nb)
    diff = ma - mb
    t2 = F.lit(float(tau) * float(tau))
    denom = 2.0 * pooled + neff * t2
    log_lam = (
        0.5 * F.log(2.0 * pooled / denom)
        + (neff * neff * t2 * diff * diff) / (4.0 * pooled * denom)
    )
    valid = (F.col("_na") > 1) & (F.col("_nb") > 1) & (pooled > 0)
    p = F.least(F.lit(1.0), F.exp(-log_lam))
    return g.select(
        F.col("_na").cast("bigint").alias("n_a"),
        F.col("_nb").cast("bigint").alias("n_b"),
        qround(F.when(F.col("_na") > 0, ma), digits).alias("mean_a"),
        qround(F.when(F.col("_nb") > 0, mb), digits).alias("mean_b"),
        qround(
            F.when((F.col("_na") > 0) & (F.col("_nb") > 0), diff), digits
        ).alias("diff"),
        qround(F.when(valid, pooled), digits).alias("pooled_var"),
        qround(F.when(valid, log_lam), digits).alias("log_lambda"),
        qround(F.when(valid, p), digits).alias("p_always_valid"),
        F.when(valid, (p < F.lit(alpha)).cast("int")).alias("reject"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    digits: int = 6,
) -> DataFrame:
    """Winsorization (percentile capping): clamp ``value_col`` into its
    per-group [p_lo, p_hi] exact-percentile band — the standard outlier
    treatment before aggregates/regressions that must not be dominated by
    tails, and the numeric cousin of the corpus quality gates.

    One percentile aggregate per group (dimension-sized) broadcast back
    onto the scan; the clamp is a projection. Bounds are rounded before
    comparison so boundary membership is cross-engine deterministic. At
    100 TB swap the exact `percentile` for `percentile_approx` (same
    shape, documented trade as elsewhere). Adds ``<col>_winsorized`` and
    ``was_clamped``."""
    x = F.col(value_col).cast("double")
    bounds = df.groupBy(*keys).agg(
        qround(F.percentile(x, F.lit(p_lo)), digits).alias("_b_lo"),
        qround(F.percentile(x, F.lit(p_hi)), digits).alias("_b_hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), list(keys)) if keys
        else df.crossJoin(F.broadcast(bounds))
    )
    # NULL inputs stay NULL: greatest/least skip NULLs, so without the
    # guard a NULL row would fabricate the lower bound (was_clamped=false)
    clamped = F.when(
        x.isNotNull(), F.least(F.greatest(x, F.col("_b_lo")), F.col("_b_hi"))
    )
    return joined.select(
        *df.columns,
        qround(clamped, digits).alias(f"{value_col}_winsorized"),
        (x.isNotNull() & ((x < F.col("_b_lo")) | (x > F.col("_b_hi"))))
            .alias("was_clamped"),
    )


def autocorrelation(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    lag: int = 1,
    digits: int = 6,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key lag-``lag`` autocorrelation of an ordered series (the
    periodicity probe: lag 288 on 5-minute data tests daily rhythm): pair
    every value with its lag via one window, then Pearson r over complete
    pairs from sufficient statistics — same one-agg shape as
    `groupwise_corr`, NULL on degenerate variance.

    One exchange: the lag window and the final aggregate share the key
    partitioning. Pass ``order_cols`` (a unique id) when timestamps can
    tie — the pairing must be total-ordered to be deterministic."""
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_cols)
    x = F.col(value_col).cast("double")
    paired = df.withColumn("_ylag", F.lag(x, lag).over(w))
    y = F.col("_ylag")
    both = x.isNotNull() & y.isNotNull()
    xs, ys = F.when(both, x), F.when(both, y)
    agged = paired.groupBy(*keys).agg(
        F.count(xs).cast("double").alias("_n"),
        F.sum(xs).alias("_sx"),
        F.sum(ys).alias("_sy"),
        F.sum(xs * xs).alias("_sxx"),
        F.sum(ys * ys).alias("_syy"),
        F.sum(xs * ys).alias("_sxy"),
    )
    n = F.col("_n")
    cov = F.col("_sxy") - F.col("_sx") * F.col("_sy") / n
    vx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / n
    vy = F.col("_syy") - F.col("_sy") * F.col("_sy") / n
    r = F.when((n > 1) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return agged.select(
        *keys,
        n.cast("bigint").alias("n_pairs"),
        qround(r, digits).alias(f"acf_lag{lag}"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_cols: Sequence[str],
    digits: int = 6,
    exact: bool = True,
    grid_size: int = 1025,
    accuracy: int = 10000,
) -> DataFrame:
    """Quantile normalization: map each value onto the POOLED distribution
    at its within-group quantile position — after it, every group has the
    same marginal distribution (the cross-source score-alignment step for
    mixed corpora; microarray normalization's classic trick).

    Per-group position is explicit rank arithmetic r=(rank−1)/(n−1) (not
    engine-internal percent_rank — the op sequence must be reproducible
    cross-engine). ``exact=True`` (oracle parity): the pooled inverse CDF
    is the globally sorted value table with its lead, joined on the floor
    position and linearly interpolated — a single-partition sort, fine at
    test scale, NOT the 100 TB plan. ``exact=False`` is the scale path:
    the pooled CDF collapses to one ``percentile_approx`` aggregate row (a
    ``grid_size``-knot array, error 1/``accuracy``), broadcast to every
    row; the inverse CDF is two ANSI-safe ``element_at`` lookups + linear
    interpolation. No global sort, no single-partition window, no extra
    shuffle — the only Window left is the per-group rank. Returns
    (ids..., group, value, normalized)."""
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(
        *id_cols, F.col(group_col).alias("grp"), x.alias("v")
    )
    wg = Window.partitionBy("grp").orderBy("v")
    ng = Window.partitionBy("grp")
    # a single-row group has no rank span: pin it to the pooled median
    # (r = 0.5) instead of dividing by zero (ANSI abort / NaN)
    cnt = F.count(F.lit(1)).over(ng)
    ranked = base.select(
        *id_cols,
        "grp",
        "v",
        F.when(
            cnt > 1,
            (F.rank().over(wg) - 1).cast("double")
            / (cnt - 1).cast("double"),
        )
        .otherwise(F.lit(0.5))
        .alias("_r"),
    )
    if not exact:
        # Scale path: the pooled CDF is a grid_size-knot approx-quantile
        # array computed in ONE aggregate (t-digest style partial merge,
        # model-sized result), broadcast-crossJoined as a single row. The
        # inverse CDF at r is linear interpolation between the two
        # bracketing knots — element_at indices clamped with least() so
        # r=1.0 can't index past the array under ANSI mode.
        knots = grid_size - 1
        qs = [i / knots for i in range(grid_size)]
        grid = base.agg(
            F.percentile_approx("v", qs, F.lit(accuracy)).alias("_qs")
        )
        posg = F.col("_r") * F.lit(float(knots))
        lo = F.floor(posg).cast("int")
        frac = posg - F.floor(posg)
        gv = F.element_at(F.col("_qs"), lo + 1)
        gn = F.element_at(F.col("_qs"), F.least(F.lit(grid_size), lo + 2))
        return (
            ranked.crossJoin(F.broadcast(grid))
            .select(
                *id_cols,
                F.col("grp").alias(group_col),
                qround(F.col("v"), digits).alias(value_col),
                qround(gv + frac * (gn - gv), digits).alias("normalized"),
            )
        )
    w_all = Window.orderBy("_cv")
    cdf = (
        base.select(F.col("v").alias("_cv"))
        .withColumn("_rn", F.row_number().over(w_all))
        .withColumn("_nxt", F.lead("_cv").over(w_all))
    )
    n_tot = base.agg(F.count(F.lit(1)).alias("_n"))
    pos = F.col("_r") * (F.col("_n") - 1) + 1
    interp = F.col("_cv") + F.col("_frac") * (
        F.coalesce(F.col("_nxt"), F.col("_cv")) - F.col("_cv")
    )
    left = (
        ranked.crossJoin(F.broadcast(n_tot))
        .withColumn("_lo", F.floor(pos).cast("int"))
        .withColumn("_frac", pos - F.floor(pos))
        .alias("l")
    )
    return (
        left.join(cdf.alias("c"), F.col("l._lo") == F.col("c._rn"))
        .select(
            *[F.col(f"l.{c}") for c in id_cols],
            F.col("l.grp").alias(group_col),
            qround(F.col("l.v"), digits).alias(value_col),
            qround(interp, digits).alias("normalized"),
        )
    )


def weather_normalize(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keys: Sequence[str],
    x_ref: float,
    digits: int = 4,
) -> DataFrame:
    """Weather-normalized consumption (the benchmarking step after the
    reference's heating-vs-temperature regression, README.md:299-326): fit
    y = a + b·x per group via the OLS sufficient statistics and report the
    expected consumption AT the reference condition, ŷ(x_ref) = a + b·x_ref
    — how groups compare after removing weather variation. One aggregate;
    degenerate-variance groups yield NULL."""
    fitted = groupwise_ols(df, x_col, y_col, keys, digits=12)
    return fitted.select(
        *keys,
        "n",
        qround(F.col("slope"), digits).alias("slope"),
        qround(
            F.col("intercept") + F.col("slope") * F.lit(x_ref), digits
        ).alias("y_at_ref"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    digits: int = 6,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative quantity — the
    inequality/concentration gauge (how skewed is corpus volume across
    sources, demand across households, tokens across documents):
    G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over ascending-sorted values.
    0 = perfectly even, →1 = one member holds everything.

    One rank window + one aggregate sharing the group exchange. Ties need
    no tie-break: equal values contribute the same Σ i·x regardless of
    their relative order, so row_number over the value alone is
    deterministic. NULL and negative rows are excluded (Gini is defined on
    non-negative support); zero-total groups yield NULL."""
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & (x >= 0)).select(
        *keys, x.alias("v")
    )
    w = Window.partitionBy(*keys).orderBy("v")
    ranked = base.withColumn("_i", F.row_number().over(w))
    agged = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("v").alias("_s"),
        F.sum(F.col("_i") * F.col("v")).alias("_is"),
    )
    g = (
        2.0 * F.col("_is") / (F.col("_n") * F.col("_s"))
        - (F.col("_n") + 1) / F.col("_n")
    )
    return agged.select(
        *keys,
        F.col("_n").cast("bigint").alias("n"),
        qround(F.when(F.col("_s") > 0, g), digits).alias("gini"),
    )


def _value_cumulatives(
    counts: DataFrame,
    klist: list[str],
    prefix_buckets: int = 32,
) -> DataFrame:
    """Inclusive cumulative ``_ca``/``_cb`` by ``_v`` plus segment totals
    ``_na``/``_nb`` over a distinct-value count table — the shared ECDF
    substrate of :func:`ks_2samp` and :func:`mann_whitney_u`.

    Keyed: one window partitioned by the segment keys (segments partition
    the distinct-value table; no global sort). Keyless: a two-pass
    range-partitioned prefix sum — ``percentile_approx`` boundaries bucket
    the distinct values, each bucket cumulates under its own window, and
    the per-bucket offsets (≤ ``prefix_buckets`` rows) are broadcast back —
    so a keyless high-cardinality metric never degrades to a
    single-partition window at 100 TB. Boundary accuracy only affects
    bucket balance, never the result: offset + in-bucket prefix is the
    exact global prefix for any bucketing that preserves value order.

    EAGERNESS NOTE (keyless path only): materializing the boundaries as
    literals runs one Spark job at DataFrame-BUILD time (collecting
    ≤ ``prefix_buckets``−1 scalars), so the upstream plan executes twice
    overall (boundary pass + the caller's action) and keyless
    ks_2samp / mann_whitney_u / auc_roc are not lazily composable or
    streaming-safe. This is deliberate: the bucketed frame feeds two plan
    branches, and approx-quantile merge order is not deterministic across
    re-executions, so literal boundaries are what make offset + prefix
    provably consistent. Callers that need one-pass behavior should cache
    the input or use the keyed path.
    """
    if klist:
        wseg = Window.partitionBy(*klist)
        wcum = wseg.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
        return counts.select(
            "*",
            F.sum("_ca").over(wcum).alias("_cum_a"),
            F.sum("_cb").over(wcum).alias("_cum_b"),
            F.sum("_ca").over(wseg).alias("_na"),
            F.sum("_cb").over(wseg).alias("_nb"),
        )
    qs = [i / prefix_buckets for i in range(1, prefix_buckets)]
    # Materialize the boundaries ONCE (driver-side, ≤ prefix_buckets-1
    # scalars) and embed them as literals. The bucketed frame feeds TWO
    # plan branches (in-bucket prefixes and per-bucket offset totals);
    # exactness of offset + prefix requires both branches to see the SAME
    # bucketing, and approx-quantile merge order is not deterministic
    # across re-executions — literals make the shared bucketing provable
    # instead of relying on exchange reuse.
    bd_row = counts.agg(
        F.percentile_approx(
            "_v", F.array(*[F.lit(q) for q in qs]), 10000
        ).alias("_bd")
    ).collect()[0]["_bd"]
    if bd_row:
        bkt = F.size(
            F.filter(
                F.array(*[F.lit(b) for b in bd_row]),
                lambda e: F.col("_v") > e,
            )
        )
    else:  # empty input: single bucket, window over zero rows
        bkt = F.lit(0)
    bucketed = counts.withColumn("_bkt", bkt)
    wb = (
        Window.partitionBy("_bkt")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bucketed = bucketed.select(
        "*",
        F.sum("_ca").over(wb).alias("_pca"),
        F.sum("_cb").over(wb).alias("_pcb"),
    )
    totals = bucketed.groupBy("_bkt").agg(
        F.sum("_ca").alias("_ta"), F.sum("_cb").alias("_tb")
    )
    woff = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )  # ≤ prefix_buckets rows — dictionary-sized by construction
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_ta").over(woff), F.lit(0)).alias("_oa"),
        F.coalesce(F.sum("_tb").over(woff), F.lit(0)).alias("_ob"),
        F.sum("_ta").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_na"),
        F.sum("_tb").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_nb"),
    )
    return (
        bucketed.join(F.broadcast(offsets), "_bkt")
        .withColumn("_cum_a", F.col("_oa") + F.col("_pca"))
        .withColumn("_cum_b", F.col("_ob") + F.col("_pcb"))
        .drop("_bkt", "_pca", "_pcb", "_oa", "_ob")
    )


def ks_2samp(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    sample_a,
    sample_b,
    keys: Sequence[str] = (),
    digits: int = 6,
    prefix_buckets: int = 32,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per key segment — the
    standard nonparametric drift detector between two data windows or
    sources: D = max_x |F_a(x) - F_b(x)| over the pooled empirical CDFs.

    Data-sized work is ONE (keys, value) count aggregate (map-side
    combined); the ECDFs come from cumulative sums over that
    DISTINCT-VALUE-sized table via :func:`_value_cumulatives` — keyed
    segments each cumulate under their own window partition, and the
    keyless case uses the range-partitioned two-pass prefix sum, so no
    path ever needs a single-partition window over a high-cardinality
    metric.

    Returns (keys..., n_a, n_b, d_stat). Segments where either sample is
    empty yield NULL d_stat (drift against nothing is undefined, not 1).

    Keyless calls are EAGER at build time (one boundary-collection job;
    upstream executes twice) and not streaming-safe — see the eagerness
    note on :func:`_value_cumulatives`.
    """
    x = F.col(value_col).cast("double")
    in_a = F.col(sample_col) == sample_a
    in_b = F.col(sample_col) == sample_b
    klist = list(keys)
    counts = (
        df.filter((in_a | in_b) & x.isNotNull())
        .groupBy(*klist, x.alias("_v"))
        .agg(
            F.sum(F.when(in_a, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(in_b, 1).otherwise(0)).alias("_cb"),
        )
    )
    cum = _value_cumulatives(counts, klist, prefix_buckets)
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    gap = F.abs(F.col("_cum_a") / na - F.col("_cum_b") / nb)
    stepped = cum.select(
        *klist,
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.when((na > 0) & (nb > 0), gap).alias("_gap"),
    )
    return stepped.groupBy(*klist).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        qround(F.max("_gap"), digits).alias("d_stat"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    sample_a,
    sample_b,
    keys: Sequence[str] = (),
    digits: int = 6,
    prefix_buckets: int = 32,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) per key segment with the
    normal approximation z-score, tie-corrected — the rank-based
    complement to :func:`ks_2samp` (location shift vs shape change).

    Average pooled ranks come from the same distinct-value cumulative
    substrate (:func:`_value_cumulatives`): for a value with pooled
    multiplicity c and C values strictly below it, avg_rank = C + (c+1)/2,
    so R_a = sum ca*avg_rank needs no per-row ranking; the keyless case
    rides the range-partitioned prefix sum, never a single-partition
    window. U_a = R_a - n_a(n_a+1)/2; sigma carries the standard tie term
    sum(c^3-c).

    Returns (keys..., n_a, n_b, u_stat, z). One-observation-total or
    empty-sample segments yield NULL z instead of an ANSI divide abort.

    Keyless calls are EAGER at build time (one boundary-collection job;
    upstream executes twice) and not streaming-safe — see the eagerness
    note on :func:`_value_cumulatives`.
    """
    x = F.col(value_col).cast("double")
    in_a = F.col(sample_col) == sample_a
    in_b = F.col(sample_col) == sample_b
    klist = list(keys)
    counts = (
        df.filter((in_a | in_b) & x.isNotNull())
        .groupBy(*klist, x.alias("_v"))
        .agg(
            F.sum(F.when(in_a, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(in_b, 1).otherwise(0)).alias("_cb"),
        )
    )
    cum = _value_cumulatives(counts, klist, prefix_buckets)
    c = (F.col("_ca") + F.col("_cb")).cast("double")
    below = (F.col("_cum_a") + F.col("_cum_b")).cast("double") - c
    avg_rank = below + (c + 1.0) / 2.0
    per_val = cum.select(
        *klist,
        F.col("_ca").cast("double").alias("_ca"),
        F.col("_cb").cast("double").alias("_cb"),
        (F.col("_ca").cast("double") * avg_rank).alias("_ra"),
        (c * c * c - c).alias("_tie"),
    )
    agged = per_val.groupBy(*klist).agg(
        F.sum("_ca").alias("_na"),
        F.sum("_cb").alias("_nb"),
        F.sum("_ra").alias("_rsum"),
        F.sum("_tie").alias("_tsum"),
    )
    na, nb = F.col("_na"), F.col("_nb")
    n = na + nb
    u = F.col("_rsum") - na * (na + 1.0) / 2.0
    mu = na * nb / 2.0
    var = (
        na * nb / 12.0
        * ((n + 1.0) - F.col("_tsum") / (n * (n - 1.0)))
    )
    z = F.when(
        (na > 0) & (nb > 0) & (n > 1),
        F.when(var > 0, (u - mu) / F.sqrt(var)),
    )
    return agged.select(
        *klist,
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        qround(F.when((na > 0) & (nb > 0), u), digits).alias("u_stat"),
        qround(z, digits).alias("z"),
    )


def _null_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``keys`` with GROUP-BY NULL semantics (NULL matches
    NULL), dropping the right side's key columns. Plain ``join(on=keys)``
    silently drops NULL-keyed segments — exactly the inconsistency a
    drift operator must not have, since GROUP BY treats NULL as a real
    segment. EqualNullSafe remains a hash-join key, so broadcast/equijoin
    plans are preserved."""
    renamed = right.select(
        *[F.col(k).alias(f"_nsj_{k}") for k in keys],
        *[c for c in right.columns if c not in keys],
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_nsj_{k}"))
        cond = c if cond is None else cond & c
    return left.join(renamed, cond, how).drop(*[f"_nsj_{k}" for k in keys])


def psi_drift(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    sample_a,
    sample_b,
    keys: Sequence[str] = (),
    n_bins: int = 5,
    digits: int = 6,
) -> DataFrame:
    """Population Stability Index per key segment — the production ML
    drift monitor: bin edges are the REFERENCE sample's exact quantiles
    (sample_a), both samples are histogrammed on those edges, and
    PSI = sum (p_a - p_b) * ln(p_a / p_b). Rule of thumb: <0.1 stable,
    0.1-0.25 shifting, >0.25 drifted.

    Two dictionary-sized shuffles: one exact-percentile aggregate on the
    reference (edges per segment, broadcast back), one (keys, bin, sample)
    count. Bin assignment is an in-row array fold over the interior-edge
    list — no join per edge. Every segment present in EITHER sample
    appears in the output: segments with an empty reference get NULL psi
    and n_a = 0 (drift against nothing is undefined). Each segment's
    histogram is completed to the full 1..n_bins spine before smoothing,
    so bins empty in both samples still contribute their +0.5 Laplace
    term and the smoothed proportions sum to 1 exactly. Key joins are
    null-safe (NULL is a real segment, as in GROUP BY).

    Returns (keys..., n_a, n_b, psi).
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    x = F.col(value_col).cast("double")
    in_a = F.col(sample_col) == sample_a
    in_b = F.col(sample_col) == sample_b
    klist = list(keys)
    base = df.filter((in_a | in_b) & x.isNotNull()).select(
        *klist,
        x.alias("_v"),
        F.when(in_a, F.lit("a")).otherwise(F.lit("b")).alias("_s"),
    )
    segs = base.groupBy(*klist).agg(
        F.sum(F.when(F.col("_s") == "a", 1).otherwise(0)).alias("_na"),
        F.sum(F.when(F.col("_s") == "b", 1).otherwise(0)).alias("_nb"),
        F.count(F.lit(1)).alias("_nrows"),
    )
    if not klist:
        # a keyless global aggregate emits a row even over empty input;
        # only a real (non-empty) population defines a drift segment
        segs = segs.filter(F.col("_nrows") > 0)
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = base.filter(F.col("_s") == "a").groupBy(*klist).agg(
        F.percentile("_v", F.array(*[F.lit(q) for q in qs])).alias("_edges")
    )
    joined = (
        _null_safe_join(base, F.broadcast(edges), klist)
        if klist
        else base.crossJoin(F.broadcast(edges))
    )
    bin_idx = F.size(
        F.filter(F.col("_edges"), lambda e: F.col("_v") > e)
    ) + F.lit(1)
    cells = joined.groupBy(*klist, bin_idx.alias("_bin")).agg(
        F.sum(F.when(F.col("_s") == "a", 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(F.col("_s") == "b", 1).otherwise(0)).alias("_cb"),
    )
    spine = segs.select(
        *klist,
        "_na",
        "_nb",
        F.explode(F.sequence(F.lit(1), F.lit(n_bins))).alias("_bin"),
    )
    if klist:
        cells_r = cells.select(
            *[F.col(k).alias(f"_ck_{k}") for k in klist],
            F.col("_bin").alias("_c_bin"),
            "_ca",
            "_cb",
        )
        cond = F.col("_bin") == F.col("_c_bin")
        for k in klist:
            cond = cond & F.col(k).eqNullSafe(F.col(f"_ck_{k}"))
        full = spine.join(cells_r, cond, "left").drop(
            "_c_bin", *[f"_ck_{k}" for k in klist]
        )
    else:
        full = spine.join(cells, "_bin", "left")
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    pa = (F.coalesce(F.col("_ca"), F.lit(0)) + 0.5) / (na + 0.5 * n_bins)
    pb = (F.coalesce(F.col("_cb"), F.lit(0)) + 0.5) / (nb + 0.5 * n_bins)
    per_bin = full.select(
        *klist,
        F.col("_na").cast("bigint").alias("n_a"),
        F.col("_nb").cast("bigint").alias("n_b"),
        F.when((na > 0) & (nb > 0), (pa - pb) * F.log(pa / pb)).alias("_t"),
    )
    out = per_bin.groupBy(*klist).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        qround(F.sum("_t"), digits).alias("psi"),
    )
    if not klist:
        # same rule as segs: the keyless global aggregate over an empty
        # spine would fabricate a row; no population -> no segment
        out = out.filter(F.col("n_a").isNotNull())
    return out


def psi_time_drift(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    ref_end,
    bucket: str = "day",
    keys: Sequence[str] = (),
    n_bins: int = 5,
    digits: int = 6,
) -> DataFrame:
    """Windowed drift monitoring: PSI of each time bucket's metric
    distribution against the fixed reference window of all rows BEFORE
    ``ref_end`` — the shape a production drift dashboard actually plots
    (one PSI point per day/hour per segment).

    Scale design: the reference is histogrammed ONCE per segment
    (n_bins counts — dictionary-sized, broadcast), never replicated per
    bucket; each bucket then needs only its own (keys, bucket, bin)
    count. Data-sized work is two scans and one count aggregate each —
    no reference-×-bucket blowup at 100 TB. Buckets come from
    ``date_trunc(bucket, ts)``; segments/buckets with no reference rows
    yield NULL psi with n_ref = 0, mirroring :func:`psi_drift`.

    Returns (keys..., bucket_ts, n_ref, n_cur, psi).
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    x = F.col(value_col).cast("double")
    ts = F.col(ts_col)
    klist = list(keys)
    pop = df.filter(x.isNotNull() & ts.isNotNull())
    ref = pop.filter(ts < F.lit(ref_end)).select(*klist, x.alias("_v"))
    cur = pop.filter(ts >= F.lit(ref_end)).select(
        *klist, x.alias("_v"), F.date_trunc(bucket, ts).alias("bucket_ts")
    )
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = ref.groupBy(*klist).agg(
        F.percentile("_v", F.array(*[F.lit(q) for q in qs])).alias("_edges")
    )
    bin_idx = F.size(
        F.filter(F.col("_edges"), lambda e: F.col("_v") > e)
    ) + F.lit(1)
    if klist:
        ref_binned = _null_safe_join(ref, F.broadcast(edges), klist)
        cur_binned = _null_safe_join(cur, F.broadcast(edges), klist)
    else:
        ref_binned = ref.crossJoin(F.broadcast(edges))
        cur_binned = cur.crossJoin(F.broadcast(edges))
    # cell tables carry uniquely-prefixed key copies: Spark resolves
    # same-named columns ambiguously across chained left joins, and a
    # wrong-side drop silently NULLs the group key
    ref_cells = ref_binned.groupBy(*klist, bin_idx.alias("_bin")).agg(
        F.count(F.lit(1)).alias("_ca")
    ).select(
        *[F.col(k).alias(f"_rk_{k}") for k in klist],
        F.col("_bin").alias("_r_bin"),
        "_ca",
    )
    cur_cells = cur_binned.groupBy(
        *klist, "bucket_ts", bin_idx.alias("_bin")
    ).agg(F.count(F.lit(1)).alias("_cb")).select(
        *[F.col(k).alias(f"_ck_{k}") for k in klist],
        F.col("bucket_ts").alias("_c_bts"),
        F.col("_bin").alias("_c_bin"),
        "_cb",
    )
    # output spine: every (segment, bucket) seen in the CURRENT stream ×
    # the full bin range, with that segment's reference total attached
    seg_buckets = cur.groupBy(*klist, "bucket_ts").agg(
        F.count(F.lit(1)).alias("_nb")
    )
    ref_totals = ref.groupBy(*klist).agg(F.count(F.lit(1)).alias("_na"))
    # keyless ref_totals is a global aggregate: always exactly one row
    # (count 0 over an empty reference), so the crossJoin is total
    seg_buckets = (
        _null_safe_join(seg_buckets, F.broadcast(ref_totals), klist, "left")
        if klist
        else seg_buckets.crossJoin(F.broadcast(ref_totals))
    )
    spine = seg_buckets.select(
        *klist,
        "bucket_ts",
        F.coalesce(F.col("_na"), F.lit(0)).alias("_na"),
        "_nb",
        F.explode(F.sequence(F.lit(1), F.lit(n_bins))).alias("_bin"),
    )
    rcond = F.col("_bin") == F.col("_r_bin")
    for k in klist:
        rcond = rcond & F.col(k).eqNullSafe(F.col(f"_rk_{k}"))
    withref = spine.join(F.broadcast(ref_cells), rcond, "left").drop(
        "_r_bin", *[f"_rk_{k}" for k in klist]
    )
    ccond = (F.col("_bin") == F.col("_c_bin")) & (
        F.col("bucket_ts") == F.col("_c_bts")
    )
    for k in klist:
        ccond = ccond & F.col(k).eqNullSafe(F.col(f"_ck_{k}"))
    full = withref.join(cur_cells, ccond, "left").drop(
        "_c_bin", "_c_bts", *[f"_ck_{k}" for k in klist]
    )
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    pa = (F.coalesce(F.col("_ca"), F.lit(0)) + 0.5) / (na + 0.5 * n_bins)
    pb = (F.coalesce(F.col("_cb"), F.lit(0)) + 0.5) / (nb + 0.5 * n_bins)
    per_bin = full.select(
        *klist,
        "bucket_ts",
        F.col("_na").cast("bigint").alias("n_ref"),
        F.col("_nb").cast("bigint").alias("n_cur"),
        F.when((na > 0) & (nb > 0), (pa - pb) * F.log(pa / pb)).alias("_t"),
    )
    return per_bin.groupBy(*klist, "bucket_ts").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        qround(F.sum("_t"), digits).alias("psi"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    digits: int = 6,
    prefix_buckets: int = 32,
) -> DataFrame:
    """Spearman rank correlation with average ranks for ties — the
    standard agreement statistic between two SCORE columns (two reward
    models, a judge vs a heuristic, old-vs-new quality scorer), where
    Pearson on raw values over-weights scale and outliers. Returns ONE
    row (n, rho); rho is NULL when either column is constant (zero rank
    variance ranks nothing) or n = 0. NULL/NaN rows excluded pairwise
    (complete cases).

    Distributed shape: per column, a distinct-value count aggregate +
    the shared keyless cumulative (:func:`_value_cumulatives` with a
    zero second count — the range-partitioned prefix sum, never a
    single-partition window) yields the distinct-value-sized avg-rank
    table; rows join back to the two rank tables on value (the two
    data-sized shuffles this statistic genuinely requires — each row
    needs BOTH its ranks), then ONE hash aggregate carries six partials
    and Pearson-on-ranks is evaluated on the 1-row result. The partials
    accumulate DOUBLED ranks (2·rank is an exact integer even at ties'
    half-rank averages) in DECIMAL(38,0) — EXACT and fold-order
    invariant up to sums of 10³⁸, i.e. n up to ~3·10¹² complete cases
    (4n³ ≤ 10³⁸), past any realistic score-pair count; rho is invariant
    under the ×2 rank scaling, and the final 1-row expression is a
    fixed op sequence on the exact partials, so the statistic is
    bit-reproducible across runs AND engines at any supported n (the
    pre-r10 double-sum path lost exactness past ~190k cases). Keyless
    and therefore EAGER at build time (two boundary collections — the
    ``_value_cumulatives`` note).
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(
        x.isNotNull() & y.isNotNull() & ~F.isnan(x) & ~F.isnan(y)
    ).select(x.alias("_x"), y.alias("_y"))

    def rank_table(col_name: str, out: str) -> DataFrame:
        counts = base.groupBy(F.col(col_name).alias("_v")).agg(
            F.count(F.lit(1)).alias("_ca"), F.lit(0).alias("_cb")
        )
        cum = _value_cumulatives(counts, [], prefix_buckets)
        # DOUBLED average rank 2r = 2·below + c + 1: an exact bigint
        # even when ties average to a half-rank — the integer substrate
        # for the exact DECIMAL partial sums below
        return cum.select(
            F.col("_v").alias(f"{out}_v"),
            (
                F.lit(2) * (F.col("_cum_a") - F.col("_ca"))
                + F.col("_ca")
                + F.lit(1)
            ).cast("bigint").alias(out),
        )

    rx = rank_table("_x", "_rx")
    ry = rank_table("_y", "_ry")
    # name-based join conditions: rx/ry derive from base (shared
    # lineage), and DataFrame-ref conditions on shared-lineage frames
    # trip Spark's ambiguous-self-join detection; the prefixed rank
    # columns are unique by construction
    j = base.join(rx, F.col("_x") == F.col("_rx_v")).join(
        ry, F.col("_y") == F.col("_ry_v")
    )
    # exact integer accumulation: doubled ranks fit DECIMAL(18,0)
    # (n < 5·10¹⁷), products fit (37,0), and Spark widens decimal sums
    # to (38,0) — no double rounding inside any partial; ANSI overflow
    # past 10³⁸ throws rather than corrupting
    dx = F.col("_rx").cast("decimal(18,0)")
    dy = F.col("_ry").cast("decimal(18,0)")
    agg = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dx).alias("_sx"),
        F.sum(dy).alias("_sy"),
        F.sum(dx * dx).alias("_sxx"),
        F.sum(dy * dy).alias("_syy"),
        F.sum(dx * dy).alias("_sxy"),
    )
    # rho is invariant under the ×2 rank scaling (numerator and
    # denominator both scale by 4); the casts below are the only
    # decimal→double roundings and they are correctly-rounded single
    # conversions of EXACT integers — the same values any engine sees
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    vx = n * F.col("_sxx").cast("double") - sx * sx
    vy = n * F.col("_syy").cast("double") - sy * sy
    rho = F.when(
        (F.col("n") > 0) & (vx > 0) & (vy > 0),
        (n * F.col("_sxy").cast("double") - sx * sy)
        / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return agg.select("n", qround(rho, digits).alias("rho"))


def qq_table(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    sample_a,
    sample_b,
    n_q: int = 20,
    digits: int = 6,
) -> DataFrame:
    """Quantile-quantile drift table between two samples: the exact
    quantiles of both distributions on a common mid-point level grid
    ((i−0.5)/n_q) plus their gap — the table behind a QQ plot, and the
    WHERE of a drift alarm (:func:`ks_2samp` says "they differ",
    this says "in the upper tail, by this much").

    One aggregate: both sides' quantile ARRAYS come from a single
    filtered-percentile pass (Spark ``percentile(x, array(levels))`` ≡
    DuckDB ``quantile_cont(x, [levels])``, both type-7 interpolation),
    then a posexplode of the two model-sized arrays. At 100 TB swap the
    exact percentile for ``percentile_approx`` — same shape, documented
    trade as winsorize. Empty sides yield NULL quantiles (drift against
    nothing is undefined). Returns (i, level, q_a, q_b, gap).
    """
    if n_q < 1:
        raise ValueError(f"n_q must be >= 1, got {n_q}")
    levels = [(i - 0.5) / n_q for i in range(1, n_q + 1)]
    x = F.col(value_col).cast("double")
    in_a = F.col(sample_col) == sample_a
    in_b = F.col(sample_col) == sample_b
    base = df.filter((in_a | in_b) & x.isNotNull() & ~F.isnan(x))
    arr = base.agg(
        F.percentile(
            F.when(in_a, x), F.array(*[F.lit(p) for p in levels])
        ).alias("_qa"),
        F.percentile(
            F.when(in_b, x), F.array(*[F.lit(p) for p in levels])
        ).alias("_qb"),
    )
    lv = F.array(*[F.lit(p) for p in levels])
    grid = arr.select(
        F.posexplode(lv).alias("_i", "level"),
        F.col("_qa"),
        F.col("_qb"),
    )
    qa = F.element_at(F.col("_qa"), F.col("_i") + 1)
    qb = F.element_at(F.col("_qb"), F.col("_i") + 1)
    return grid.select(
        (F.col("_i") + 1).cast("bigint").alias("i"),
        qround(F.col("level"), digits).alias("level"),
        qround(qa, digits).alias("q_a"),
        qround(qb, digits).alias("q_b"),
        qround(qb - qa, digits).alias("gap"),
    )


def lorenz_curve(
    df: DataFrame,
    value_col: str,
    n_points: int = 20,
    digits: int = 6,
) -> DataFrame:
    """Lorenz curve table — the curve behind :func:`gini_coefficient`:
    cumulative share of the total quantity vs cumulative population
    share, thinned to ≈ ``n_points`` grid-crossing rows (the exact
    rank-grid trick from the ROC thinning: keep a row iff it crosses a
    population-share grid cell, so the result is an exact SUBSET of the
    full curve with bounded size at any data volume).

    Shape: one (value) count aggregate (map-side combined), one window
    over the DISTINCT-VALUE table (ascending values), then the
    grid-crossing filter. NULL/negative values are excluded (same
    support rule as gini); an all-zero total yields no rows. Returns
    (pop_share, value_share, value) ascending.
    """
    if n_points < 1:
        raise ValueError(f"n_points must be >= 1, got {n_points}")
    x = F.col(value_col).cast("double")
    # NaN would pass x >= 0 in BOTH engines (largest-value comparison
    # semantics) and poison every cumulative — no measurement evidence
    counts = (
        df.filter(x.isNotNull() & ~F.isnan(x) & (x >= 0))
        .groupBy(x.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "_v",
        "_c",
        F.sum("_c").over(w).alias("_cn"),
        F.sum(F.col("_v") * F.col("_c")).over(w).alias("_cs"),
        F.sum("_c").over(w_all).alias("_n"),
        F.sum(F.col("_v") * F.col("_c")).over(w_all).alias("_s"),
    )
    # keep rows whose cumulative population count crosses a grid cell
    # (pure BIGINT div — the _thin_curve discipline), always keep the
    # last row so the curve ends at (1, 1)
    m = n_points
    crosses = F.expr(f"(_cn * {m}) div _n") > F.expr(
        f"((_cn - _c) * {m}) div _n"
    )
    kept = cum.filter(
        (F.col("_s") > 0) & (crosses | (F.col("_cn") == F.col("_n")))
    )
    return kept.select(
        qround(
            F.col("_cn").cast("double") / F.col("_n").cast("double"), digits
        ).alias("pop_share"),
        qround(F.col("_cs") / F.col("_s"), digits).alias("value_share"),
        qround(F.col("_v"), digits).alias("value"),
    )


def delta_method_ratio(
    df: DataFrame,
    num_col: str,
    den_col: str,
    arm_col: str,
    arm_a,
    arm_b,
    digits: int = 6,
) -> DataFrame:
    """Delta-method inference for a RATIO metric between two arms —
    revenue per session, clicks per view, tokens per document: the
    readout ordinary t-tests get wrong because both numerator and
    denominator are random and correlated within a unit.

    Per arm, with x the numerator and y the denominator over n units,
    R = x̄ / ȳ and the first-order (delta-method) variance of R is

        Var(R) ≈ (s_xx + R² s_yy − 2 R s_xy) / (n ȳ²)

    (s_* the sample (co)variances). The two-arm difference d = R_a −
    R_b gets se = sqrt(Var_a + Var_b), a z statistic, and a 95 % CI
    (z* = 1.959963984540054, the driver-side Normal quantile).

    ONE conditional-moment aggregate (n, Σx, Σy, Σx², Σy², Σxy per
    arm, map-side combined) — the same sufficient-statistics shape as
    welch_ttest, re-runnable at any data size. Fail-closed: an arm
    with n < 2 or ȳ = 0 yields NULL ratio/variance; se/z/CI are NULL
    unless both arms are valid and se > 0. Complete-case on
    numerator, denominator and arm (NaN treated as NULL).

    Returns ONE row: (n_a, n_b, ratio_a, ratio_b, diff, se, z,
    ci_lo, ci_hi).
    """
    x = F.col(num_col).cast("double")
    y = F.col(den_col).cast("double")
    in_a = F.col(arm_col) == arm_a
    in_b = F.col(arm_col) == arm_b
    base = df.filter(
        (in_a | in_b)
        & x.isNotNull() & ~F.isnan(x)
        & y.isNotNull() & ~F.isnan(y)
    )
    g = base.agg(
        *[
            e
            for tag, cond in (("a", in_a), ("b", in_b))
            for e in (
                # coalesce: SUM over the EMPTY corpus is NULL, but the
                # repo convention is n=0 with NULL statistics
                # (cramers_v / srm_check — ADVICE r10 #5 family)
                F.coalesce(
                    F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
                ).alias(f"_n{tag}"),
                F.sum(F.when(cond, x).otherwise(0.0)).alias(f"_sx{tag}"),
                F.sum(F.when(cond, y).otherwise(0.0)).alias(f"_sy{tag}"),
                F.sum(F.when(cond, x * x).otherwise(0.0)).alias(f"_xx{tag}"),
                F.sum(F.when(cond, y * y).otherwise(0.0)).alias(f"_yy{tag}"),
                F.sum(F.when(cond, x * y).otherwise(0.0)).alias(f"_xy{tag}"),
            )
        ]
    )

    def arm(tag: str):
        n = F.col(f"_n{tag}").cast("double")
        mx = F.col(f"_sx{tag}") / n
        my = F.col(f"_sy{tag}") / n
        sxx = (F.col(f"_xx{tag}") - F.col(f"_sx{tag}") * mx) / (n - 1)
        syy = (F.col(f"_yy{tag}") - F.col(f"_sy{tag}") * my) / (n - 1)
        sxy = (F.col(f"_xy{tag}") - F.col(f"_sx{tag}") * my) / (n - 1)
        valid = (n > 1) & (my != 0)
        r = mx / my
        var = (sxx + r * r * syy - 2.0 * r * sxy) / (n * my * my)
        return valid, F.when(valid, r), F.when(valid, var)

    ok_a, r_a, v_a = arm("a")
    ok_b, r_b, v_b = arm("b")
    both = ok_a & ok_b
    se = F.when(both, F.sqrt(F.greatest(v_a + v_b, F.lit(0.0))))
    d = r_a - r_b
    zq = F.lit(1.959963984540054)
    return g.select(
        F.col("_na").cast("bigint").alias("n_a"),
        F.col("_nb").cast("bigint").alias("n_b"),
        qround(r_a, digits).alias("ratio_a"),
        qround(r_b, digits).alias("ratio_b"),
        qround(F.when(both, d), digits).alias("diff"),
        qround(se, digits).alias("se"),
        qround(F.when(both & (se > 0), d / se), digits).alias("z"),
        qround(F.when(both, d - zq * se), digits).alias("ci_lo"),
        qround(F.when(both, d + zq * se), digits).alias("ci_hi"),
    )


def post_stratified_mean(
    df: DataFrame,
    value_col: str,
    stratum_col: str,
    population_shares: dict,
    digits: int = 6,
) -> DataFrame:
    """Post-stratification estimator: the population mean of
    ``value_col`` re-weighted to DECLARED stratum shares — the standard
    correction when the observed sample's stratum mix drifts from the
    population (a skewed logging pipeline, a non-proportional panel):

        μ̂_ps = Σ_s W_s · x̄_s        (W_s the declared share)
        Var(μ̂_ps) ≈ Σ_s W_s² · s_s² / n_s

    Strata observed in the data but ABSENT from ``population_shares``
    are dropped (they carry no declared weight — reported via
    n_unknown_strata); declared strata absent from the data make the
    estimate NULL (a share with no sample mean cannot be imputed —
    fail closed, reported via n_empty_strata). Shares must sum to ~1.

    ONE stratum-keyed moment aggregate (map-side combined) + a
    broadcast join against the |strata|-row declared-share table + one
    rollup. Returns ONE row: (n, n_strata, n_empty_strata,
    n_unknown_strata, mean_raw, mean_post_stratified, se_post_stratified).
    """
    total = sum(population_shares.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"population shares must sum to 1, got {total}")
    x = F.col(value_col).cast("double")
    base = df.filter(
        F.col(stratum_col).isNotNull() & x.isNotNull() & ~F.isnan(x)
    )
    per_s = base.groupBy(F.col(stratum_col).alias("_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sxx"),
    )
    shares = F.broadcast(
        base.sparkSession.createDataFrame(
            [(k, float(v)) for k, v in sorted(population_shares.items())],
            f"_s {dict(df.dtypes).get(stratum_col, 'string')}, _w double",
        )
    )
    j = per_s.join(shares, "_s", "full")
    n = F.col("_n").cast("double")
    mean_s = F.col("_sx") / n
    var_s = F.when(
        F.col("_n") > 1,
        (F.col("_sxx") - F.col("_sx") * mean_s) / (n - 1.0),
    )
    agg = j.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("n"),
        F.count(F.when(F.col("_w").isNotNull() & F.col("_n").isNotNull(), 1))
        .cast("bigint")
        .alias("n_strata"),
        F.count(F.when(F.col("_w").isNotNull() & F.col("_n").isNull(), 1))
        .cast("bigint")
        .alias("n_empty_strata"),
        F.count(F.when(F.col("_w").isNull(), 1))
        .cast("bigint")
        .alias("n_unknown_strata"),
        F.sum(F.when(F.col("_w").isNotNull(), F.col("_sx"))).alias("_wsx"),
        F.sum(F.when(F.col("_w").isNotNull(), F.col("_n"))).alias("_wn"),
        F.sum(F.col("_w") * mean_s).alias("_ps"),
        F.sum(F.col("_w") * F.col("_w") * var_s / n).alias("_psv"),
        F.max(F.col("_w").isNotNull() & F.col("_n").isNull())
        .alias("_any_empty"),
        # a declared stratum observed with n_s == 1 has NO sample
        # variance: F.sum would silently skip its NULL var_s term and
        # report an se that UNDERESTIMATES (missing that stratum's
        # W²s²/n). Fail closed on the se (the point estimate is still
        # valid — a 1-obs mean exists; its variance doesn't).
        F.max(F.col("_w").isNotNull() & (F.col("_n") == 1))
        .alias("_any_singleton"),
    )
    ok = ~F.coalesce(F.col("_any_empty"), F.lit(False))
    se_ok = ok & ~F.coalesce(F.col("_any_singleton"), F.lit(False))
    return agg.select(
        "n",
        "n_strata",
        "n_empty_strata",
        "n_unknown_strata",
        qround(
            F.when(F.col("_wn") > 0, F.col("_wsx") / F.col("_wn")), digits
        ).alias("mean_raw"),
        qround(F.when(ok, F.col("_ps")), digits).alias(
            "mean_post_stratified"
        ),
        qround(
            F.when(se_ok & (F.col("_psv") >= 0), F.sqrt(F.col("_psv"))),
            digits,
        ).alias("se_post_stratified"),
    )


def diff_in_diff(
    df: DataFrame,
    value_col: str,
    treated_col: str,
    post_col: str,
    digits: int = 6,
) -> DataFrame:
    """Two-by-two difference-in-differences estimator — the workhorse
    quasi-experimental readout when a feature launches for one cohort
    while another stays on the old path:

        DID = (ȳ_treated,post − ȳ_treated,pre)
            − (ȳ_control,post − ȳ_control,pre)
        se  = sqrt(Σ_cell s²_cell / n_cell)     (unpooled, Welch-style)

    ``treated_col`` / ``post_col`` are coerced to int (0/1); rows where
    either indicator or the value is NULL/NaN are excluded. The estimate
    is NULL unless all FOUR cells are observed; the se additionally
    requires every cell to carry n ≥ 2 (a singleton cell has no sample
    variance — fail closed, the post_stratified_mean convention).

    ONE (treated, post) sufficient-statistics aggregate (map-side
    combined) + a 4-row pivot in a second dictionary-sized aggregate.
    Returns ONE row: (n, n_cells, mean_t_post, mean_t_pre, mean_c_post,
    mean_c_pre, did, se_did).
    """
    x = F.col(value_col).cast("double")
    t = F.col(treated_col).cast("int")
    p = F.col(post_col).cast("int")
    base = df.filter(
        x.isNotNull() & ~F.isnan(x) & t.isNotNull() & p.isNotNull()
    ).select(t.alias("_t"), p.alias("_p"), x.alias("_x"))
    cells = base.groupBy("_t", "_p").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    nn = F.col("_n").cast("double")
    mean_c = F.col("_sx") / nn
    var_c = F.when(
        F.col("_n") > 1,
        (F.col("_sxx") - F.col("_sx") * mean_c) / (nn - 1.0),
    )

    def _cell(tv: int, pv: int, expr):
        return F.max(
            F.when((F.col("_t") == tv) & (F.col("_p") == pv), expr)
        )

    agg = cells.agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        _cell(1, 1, mean_c).alias("_m11"),
        _cell(1, 0, mean_c).alias("_m10"),
        _cell(0, 1, mean_c).alias("_m01"),
        _cell(0, 0, mean_c).alias("_m00"),
        _cell(1, 1, var_c / nn).alias("_v11"),
        _cell(1, 0, var_c / nn).alias("_v10"),
        _cell(0, 1, var_c / nn).alias("_v01"),
        _cell(0, 0, var_c / nn).alias("_v00"),
    )
    did = (
        (F.col("_m11") - F.col("_m10"))
        - (F.col("_m01") - F.col("_m00"))
    )
    vsum = (
        F.col("_v11") + F.col("_v10") + F.col("_v01") + F.col("_v00")
    )
    return agg.select(
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        "n_cells",
        qround(F.col("_m11"), digits).alias("mean_t_post"),
        qround(F.col("_m10"), digits).alias("mean_t_pre"),
        qround(F.col("_m01"), digits).alias("mean_c_post"),
        qround(F.col("_m00"), digits).alias("mean_c_pre"),
        qround(F.when(F.col("n_cells") == 4, did), digits).alias("did"),
        qround(
            F.when(
                (F.col("n_cells") == 4) & (vsum >= 0), F.sqrt(vsum)
            ),
            digits,
        ).alias("se_did"),
    )


def event_study(
    df: DataFrame,
    value_col: str,
    treated_col: str,
    period_col: str,
    event_period: int,
    base_offset: int = -1,
    digits: int = 6,
) -> DataFrame:
    """Event-study generalization of :func:`diff_in_diff` — one DID
    coefficient per period relative to a single adoption time, the standard
    pre-trend/dynamic-effect readout (Angrist & Pischke 2009 §5.2; the
    2×T two-group event-study estimator):

        β_k = (ȳ_treated,k − ȳ_control,k)
            − (ȳ_treated,base − ȳ_control,base)        base: k = -1
        se_k = sqrt(Σ over the 4 cells of s²/n)         (unpooled Welch)

    With a single adoption time and two groups this closed form IS the
    two-way-fixed-effects event-study coefficient, so no design matrix is
    needed. Pre-period β_k (k < 0, k ≠ base) are the pre-trend check: they
    should be ≈ 0 under parallel trends. The base period is pinned to
    β = 0 with NULL se (the normalization, as event-study plots draw it).

    Conventions shared with :func:`diff_in_diff`: indicators coerced to
    0/1 int, NULL/NaN rows excluded, β fail-closed (NULL) unless all four
    cells of the contrast are observed, se additionally fail-closed unless
    every cell has n ≥ 2. ONE (relative-period, treated) sufficient-
    statistics aggregate + a broadcast 1-row base-cell frame — nothing
    data-sized leaves the executors. Returns one row per observed relative
    period: (rel_period, is_pre, n_treated, n_control, mean_treated,
    mean_control, beta, se_beta).
    """
    x = F.col(value_col).cast("double")
    t = F.col(treated_col).cast("int")
    p = F.col(period_col).cast("bigint")
    base = df.filter(
        x.isNotNull() & ~F.isnan(x) & t.isNotNull() & p.isNotNull()
    ).select(
        (p - F.lit(int(event_period))).alias("_rel"),
        t.alias("_t"),
        x.alias("_x"),
    )
    cells = base.groupBy("_rel", "_t").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    nn = F.col("_n").cast("double")
    mean_c = F.col("_sx") / nn
    var_over_n = (
        F.when(
            F.col("_n") > 1,
            (F.col("_sxx") - F.col("_sx") * mean_c) / (nn - 1.0),
        )
        / nn
    )

    def _side(tv: int, expr):
        return F.max(F.when(F.col("_t") == tv, expr))

    per_rel = cells.groupBy("_rel").agg(
        _side(1, F.col("_n")).cast("bigint").alias("_n1"),
        _side(0, F.col("_n")).cast("bigint").alias("_n0"),
        _side(1, mean_c).alias("_m1"),
        _side(0, mean_c).alias("_m0"),
        _side(1, var_over_n).alias("_v1"),
        _side(0, var_over_n).alias("_v0"),
    )
    b = F.lit(int(base_offset))
    base_row = per_rel.filter(F.col("_rel") == b).select(
        F.max("_m1").alias("_mb1"),
        F.max("_m0").alias("_mb0"),
        F.max("_v1").alias("_vb1"),
        F.max("_v0").alias("_vb0"),
    )
    # agg over the filtered frame still yields ONE row (of NULLs) when the
    # base period is unobserved, so the crossJoin keeps every relative
    # period with a fail-closed NULL beta instead of emptying the output
    joined = per_rel.crossJoin(F.broadcast(base_row))
    beta = (F.col("_m1") - F.col("_m0")) - (F.col("_mb1") - F.col("_mb0"))
    vsum = F.col("_v1") + F.col("_v0") + F.col("_vb1") + F.col("_vb0")
    is_base = F.col("_rel") == b
    return joined.select(
        F.col("_rel").alias("rel_period"),
        (F.col("_rel") < 0).cast("int").alias("is_pre"),
        F.coalesce("_n1", F.lit(0)).cast("bigint").alias("n_treated"),
        F.coalesce("_n0", F.lit(0)).cast("bigint").alias("n_control"),
        qround(F.col("_m1"), digits).alias("mean_treated"),
        qround(F.col("_m0"), digits).alias("mean_control"),
        qround(
            F.when(is_base, F.lit(0.0)).otherwise(beta), digits
        ).alias("beta"),
        qround(F.when(~is_base & (vsum >= 0), F.sqrt(vsum)), digits).alias(
            "se_beta"
        ),
    )


def cusum_drift(
    df: DataFrame,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
    keys: Sequence[str] = (),
    order_cols: Sequence[str] = ("ts",),
    digits: int = 6,
) -> DataFrame:
    """Tabular (Page) CUSUM change detector per key segment — the
    sequential mean-shift alarm for metric streams, where PSI/KS windows
    are too slow to localize WHEN the shift started:

        C⁺_t = max(0, C⁺_{t−1} + (x_t − target − slack))
        C⁻_t = max(0, C⁻_{t−1} − (x_t − target + slack))

    The recursion is NOT expressible as a window function directly, but
    the classic prefix identity is: C⁺_t = S_t − min_{j≤t} S_j with
    S the running sum of (x − target − slack) — two cumulative windows,
    no iteration (and the mirrored form for C⁻). This keeps the operator
    a pure two-window plan over each key's timeline, the same exchange
    every ordered operator here shares.

    NULL/NaN values are excluded (a missing reading is not evidence of
    drift). Returns one row per key: (keys…, n, max_cusum_pos,
    max_cusum_neg[, alarm, first_alarm_idx]) — the alarm columns appear
    when ``threshold`` is given; first_alarm_idx is the 1-based position
    IN THE ORDERED SERIES of the first crossing (NULL when none).
    """
    klist = list(keys)
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & ~F.isnan(x)).select(
        *klist, *[c for c in order_cols if c not in klist], x.alias("_x")
    )
    w = (
        Window.partitionBy(*klist)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s_pos = F.sum(F.col("_x") - F.lit(target) - F.lit(slack)).over(w)
    s_neg = F.sum(F.col("_x") - F.lit(target) + F.lit(slack)).over(w)
    cur = base.select(
        *klist,
        (s_pos - F.least(F.min(s_pos).over(w), F.lit(0.0))).alias("_cp"),
        (F.greatest(F.max(s_neg).over(w), F.lit(0.0)) - s_neg).alias("_cn"),
        F.row_number().over(
            Window.partitionBy(*klist).orderBy(
                *[F.col(c) for c in order_cols]
            )
        ).alias("_idx"),
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        qround(F.max("_cp"), digits).alias("max_cusum_pos"),
        qround(F.max("_cn"), digits).alias("max_cusum_neg"),
    ]
    if threshold is not None:
        crossed = (F.col("_cp") > threshold) | (F.col("_cn") > threshold)
        aggs.append(
            F.max(crossed).cast("int").alias("alarm")
        )
        aggs.append(
            F.min(F.when(crossed, F.col("_idx")))
            .cast("bigint")
            .alias("first_alarm_idx")
        )
    if klist:
        return cur.groupBy(*klist).agg(*aggs)
    return cur.agg(*aggs)


def theil_atkinson(
    df: DataFrame,
    value_col: str,
    epsilon: float = 1.0,
    digits: int = 6,
) -> DataFrame:
    """Theil-T index and Atkinson index — the entropy-based inequality
    companions of :func:`gini_coefficient` (Theil decomposes additively
    across subgroups; Atkinson makes the inequality-aversion parameter
    explicit), the concentration numbers a corpus-mixture or usage
    audit reads next to the Lorenz curve:

        Theil T  = (1/N) Σ (x/μ) · ln(x/μ)
        Atkinson = 1 − exp((1/N) Σ ln(x/μ))          (ε = 1)
                 = 1 − ((1/N) Σ (x/μ)^(1−ε))^(1/(1−ε))   (ε ≠ 1)

    Support is STRICTLY positive values (both indices are undefined at
    x ≤ 0 — ln/negative powers; rows outside the support are excluded
    and counted). ONE sufficient-statistics aggregate — no sort, no
    window, unlike gini's rank pass — so it is the cheapest of the
    inequality family at 100 TB. Indices are NULL when no positive
    values remain. Returns ONE row:
    (n, n_nonpositive, mean, theil_t, atkinson).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    x = F.col(value_col).cast("double")
    all_rows = df.filter(x.isNotNull() & ~F.isnan(x))
    base = all_rows.select(
        x.alias("_x"), (x <= 0).cast("bigint").alias("_np")
    )
    # two passes folded into one aggregate: μ must be known before the
    # ratio terms, so compute sums first and derive the entropy terms
    # from a second dictionary-sized pass? No — both engines fold it in
    # ONE pass using sum(x·ln x) and N·μ algebra:
    #   Σ (x/μ)ln(x/μ) / N = (Σ x·ln x)/(N·μ) − ln μ
    #   (1/N) Σ ln(x/μ)    = (Σ ln x)/N − ln μ
    #   (1/N) Σ (x/μ)^p    = (Σ x^p)/(N·μ^p)
    pos = F.when(F.col("_np") == 0, F.col("_x"))
    p = 1.0 - float(epsilon)
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        # coalesce: sum over an EMPTY input is NULL, which lands float64
        # in pandas and hash-mismatches the oracle's int64
        F.coalesce(F.sum("_np"), F.lit(0)).cast("bigint").alias("n_nonpositive"),
        F.count(pos).cast("bigint").alias("_np_n"),
        F.sum(pos).alias("_sx"),
        F.sum(pos * F.log(pos)).alias("_sxlx"),
        F.sum(F.log(pos)).alias("_slx"),
        F.sum(F.pow(pos, F.lit(p))).alias("_sxp"),
    )
    nn = F.col("_np_n").cast("double")
    mu = F.col("_sx") / nn
    theil = F.col("_sxlx") / (nn * mu) - F.log(mu)
    if abs(p) < 1e-12:  # ε = 1: geometric-mean form
        atk = 1.0 - F.exp(F.col("_slx") / nn - F.log(mu))
    else:
        atk = 1.0 - F.pow(
            F.col("_sxp") / (nn * F.pow(mu, F.lit(p))), F.lit(1.0 / p)
        )
    ok = F.col("_np_n") > 0
    return agg.select(
        "n",
        "n_nonpositive",
        qround(F.when(ok, mu), digits).alias("mean"),
        qround(F.when(ok, theil), digits).alias("theil_t"),
        qround(F.when(ok, atk), digits).alias("atkinson"),
    )


def _logistic_beta(base: DataFrame, steps: int) -> DataFrame:
    """``steps`` Newton-IRLS iterations over a (_y, _x) frame from
    β = (0, 0); returns the broadcast 1-row (_b0, _b1) model frame.
    Shared by :func:`logistic_irls` (the reporting wrapper) and
    :func:`ipw_ate` (which scores propensities with the fitted β).
    NULL β propagates from a degenerate design (det ≤ 0)."""
    spark = base.sparkSession
    beta = F.broadcast(
        spark.createDataFrame([(0.0, 0.0)], "_b0 double, _b1 double")
    )
    for _ in range(steps):
        z = F.col("_b0") + F.col("_b1") * F.col("_x")
        p = 1.0 / (1.0 + F.exp(-z))
        w = p * (1.0 - p)
        r = F.col("_y") - p
        g = base.crossJoin(beta).agg(
            F.max("_b0").alias("_ob0"),
            F.max("_b1").alias("_ob1"),
            F.sum(w).alias("_s0"),
            F.sum(w * F.col("_x")).alias("_s1"),
            F.sum(w * F.col("_x") * F.col("_x")).alias("_s2"),
            F.sum(r).alias("_g0"),
            F.sum(r * F.col("_x")).alias("_g1"),
        )
        det = F.col("_s0") * F.col("_s2") - F.col("_s1") * F.col("_s1")
        beta = F.broadcast(
            g.select(
                F.when(
                    det > 0,
                    F.col("_ob0")
                    + (F.col("_s2") * F.col("_g0") - F.col("_s1") * F.col("_g1"))
                    / det,
                ).alias("_b0"),
                F.when(
                    det > 0,
                    F.col("_ob1")
                    + (F.col("_s0") * F.col("_g1") - F.col("_s1") * F.col("_g0"))
                    / det,
                ).alias("_b1"),
            )
        )
    return beta


def logistic_irls(
    df: DataFrame,
    y_col: str,
    x_col: str,
    steps: int = 3,
    digits: int = 6,
) -> DataFrame:
    """Univariate logistic regression (intercept + one feature) fit with
    ``steps`` unrolled Newton-IRLS iterations from β = (0, 0) — the
    propensity/quality-score fit a sampling or calibration pipeline
    needs without an ML library:

        p = σ(b0 + b1·x);  each step solves the 2×2 normal equations
        [Σw, Σwx; Σwx, Σwx²] Δβ = [Σ(y−p), Σ(y−p)x],  w = p(1−p)

    Every iteration is ONE sufficient-statistics aggregate over the
    data crossJoined with the broadcast 1-row β frame — the model state
    never touches the driver (the kmeans/bradley_terry discipline), so
    the whole fit is a lazy chain of ``steps`` aggregates. The update is
    NULL (and propagates) when the design is degenerate (constant x →
    det = 0 — no slope is identifiable; fail closed). Rows with NULL/NaN
    x or NULL y are excluded; y is coerced to 0/1 by ``y != 0``.

    A final pass reports the mean log-loss at the fitted β. Fixed small
    ``steps`` is deliberate: β is data-dictionary-sized state and IRLS
    gains a digit per step near the optimum; callers needing exact
    convergence iterate externally. Returns ONE row:
    (n, n_pos, b0, b1, log_loss).
    """
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    x = F.col(x_col).cast("double")
    yc = F.col(y_col)
    base = df.filter(
        x.isNotNull() & ~F.isnan(x) & yc.isNotNull()
    ).select(
        (yc.cast("double") != 0).cast("double").alias("_y"),
        x.alias("_x"),
    )
    beta = _logistic_beta(base, steps)
    z = F.col("_b0") + F.col("_b1") * F.col("_x")
    p = 1.0 / (1.0 + F.exp(-z))
    ll = F.col("_y") * F.log(p) + (1.0 - F.col("_y")) * F.log(1.0 - p)
    return base.crossJoin(beta).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(F.col("_y")), F.lit(0.0))
        .cast("bigint")
        .alias("n_pos"),
        qround(F.max("_b0"), digits).alias("b0"),
        qround(F.max("_b1"), digits).alias("b1"),
        qround(-F.avg(ll), digits).alias("log_loss"),
    )


def ipw_ate(
    df: DataFrame,
    y_col: str,
    treat_col: str,
    x_col: str,
    steps: int = 3,
    clip: float = 0.01,
    digits: int = 6,
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect — the
    observational-data companion of :func:`diff_in_diff` when there is
    no pre-period, and the first consumer of :func:`_logistic_beta`:

        e(x)   = σ(b0 + b1·x)          (propensity fit, Newton-IRLS,
                                        clipped to [clip, 1−clip])
        ATE    = Σ(t·y/e)/Σ(t/e) − Σ((1−t)·y/(1−e))/Σ((1−t)/(1−e))

    The self-normalizing (Hajek) form — stable under weight scale,
    unlike the Horvitz-Thompson mean. Clipping enforces overlap the
    standard way; the naive (unadjusted) difference of means is
    reported alongside so the adjustment itself is visible. Rows with
    NULL/NaN in any of the three columns are excluded; a degenerate
    propensity design (constant x) propagates NULL β → NULL ATE (fail
    closed); an arm with zero weight yields NULL for that arm's mean.

    Shape: ``steps`` sufficient-statistics aggregates for the fit (the
    broadcast 1-row model-state chain) + ONE weighted aggregate for the
    effect. Returns ONE row: (n, n_treated, b0, b1, mean_treated_ipw,
    mean_control_ipw, ate_ipw, ate_naive).
    """
    if not 0.0 < clip < 0.5:
        raise ValueError(f"clip must be in (0, 0.5), got {clip}")
    y = F.col(y_col).cast("double")
    t = F.col(treat_col).cast("double")
    x = F.col(x_col).cast("double")
    base = df.filter(
        y.isNotNull() & ~F.isnan(y)
        & t.isNotNull()
        & x.isNotNull() & ~F.isnan(x)
    ).select(
        y.alias("_yv"),
        (t != 0).cast("double").alias("_t"),
        x.alias("_x"),
    )
    beta = _logistic_beta(
        base.select(F.col("_t").alias("_y"), "_x"), steps
    )
    z = F.col("_b0") + F.col("_b1") * F.col("_x")
    e_raw = 1.0 / (1.0 + F.exp(-z))
    # greatest/least SKIP NULLs, so a NULL propensity (degenerate fit)
    # would silently clip to the floor instead of failing closed —
    # guard the clip on the raw value's presence
    e = F.when(
        e_raw.isNotNull(),
        F.least(F.greatest(e_raw, F.lit(clip)), F.lit(1.0 - clip)),
    )
    tt = F.col("_t")
    yy = F.col("_yv")
    agg = base.crossJoin(beta).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(tt), F.lit(0.0)).cast("bigint").alias("n_treated"),
        F.max("_b0").alias("_fb0"),
        F.max("_b1").alias("_fb1"),
        F.sum(tt / e).alias("_w1"),
        F.sum(tt * yy / e).alias("_wy1"),
        F.sum((1.0 - tt) / (1.0 - e)).alias("_w0"),
        F.sum((1.0 - tt) * yy / (1.0 - e)).alias("_wy0"),
        F.sum(tt * yy).alias("_ty"),
        F.sum((1.0 - tt) * yy).alias("_cy"),
        F.sum(1.0 - tt).alias("_nc"),
    )
    m1 = F.when(F.col("_w1") > 0, F.col("_wy1") / F.col("_w1"))
    m0 = F.when(F.col("_w0") > 0, F.col("_wy0") / F.col("_w0"))
    naive = F.when(
        (F.col("n_treated") > 0) & (F.col("_nc") > 0),
        F.col("_ty") / F.col("n_treated").cast("double")
        - F.col("_cy") / F.col("_nc"),
    )
    return agg.select(
        "n",
        "n_treated",
        qround(F.col("_fb0"), digits).alias("b0"),
        qround(F.col("_fb1"), digits).alias("b1"),
        qround(m1, digits).alias("mean_treated_ipw"),
        qround(m0, digits).alias("mean_control_ipw"),
        qround(m1 - m0, digits).alias("ate_ipw"),
        qround(naive, digits).alias("ate_naive"),
    )

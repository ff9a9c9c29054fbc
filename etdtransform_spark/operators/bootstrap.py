"""Resampling-based uncertainty estimation at shuffle scale.

A pipeline that reports a metric (mean quality score, dedup rate, CTR)
needs an error bar before anyone acts on a week-over-week delta. The
classical bootstrap (resample n rows with replacement, B times) is
driver-hostile: it needs global row indexing per replicate. The
**Poisson bootstrap** (Chamandy et al., "Estimating Uncertainty for
Massive Data Streams", Google 2012) replaces multinomial resampling
with an independent Poisson(1) weight per (row, replicate) — each row
decides its own replicate multiplicities locally, so the whole thing is
ONE map-side-combined aggregate regardless of data size.

Determinism: the Poisson draw is inverse-CDF over a uniform derived
from the row's portable md5 base hash pushed through the per-replicate
affine universal-hash family — identical in Spark and DuckDB, stable
across reruns, partitionings, and task retries (``rand()`` would
violate all three; same discipline as ``sessions.weighted_hash_sample``
and the MinHash permutations).

Scale shape: explode ×B happens map-side (projection, no shuffle of the
expanded rows); partial aggregation means the shuffle carries at most
(|keys| × B) partial sums per map task. B=200 replicates over 100 TB
shuffles 200 rows per task — the data is read once.

No reference counterpart (the reference is an energy ETL); part of the
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..functions.scalars import qround

# Poisson(1) CDF prefix, k = 0..7; draws are capped at 8 (P ≈ 1e-5 of
# truncation, bias ≪ any CI width at B ≤ 10^4). The literals are
# formatted to full precision into BOTH engines' CASE chains, so the
# inverse-CDF step function is bit-identical cross-engine.
_POISSON1_CDF: list[float] = []
_acc = 0.0
for _k in range(8):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POISSON1_CDF.append(_acc)

from ..functions.hashing import _UNIFORM_BUCKETS as _HASH_BUCKETS


def bootstrap_family_values_sql(n_boot: int) -> str:
    """DuckDB ``(VALUES …) AS t(r, a, b)`` literal of the replicate hash
    family — the SQL twin of the (r, a, b) struct array the operator
    explodes. Same family as :func:`~..functions.hashing._hash_family`,
    so the per-replicate affine hashes are bit-identical cross-engine."""
    from ..functions.hashing import _hash_family

    rows = ", ".join(
        f"({r}, {a}, {b})" for r, (a, b) in enumerate(_hash_family(n_boot))
    )
    return f"(VALUES {rows}) AS t(r, a, b)"


def _poisson1_weight(u: Column) -> Column:
    """Inverse-CDF Poisson(1) draw from a uniform, capped at 8."""
    expr = F.lit(8)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        expr = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(expr)
    return expr


def poisson1_weight_sql(u_expr: str) -> str:
    """DuckDB fragment computing the same capped Poisson(1) draw."""
    branches = "".join(
        f"WHEN ({u_expr}) < {c!r} THEN {k}"
        for k, c in enumerate(_POISSON1_CDF)
    )
    return f"(CASE {branches} ELSE 8 END)"


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    keys: Sequence[str] = (),
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: str = "boot",
    digits: int = 6,
    fast: bool = False,
) -> DataFrame:
    """Percentile bootstrap CI for the mean of ``value_col``, optionally
    per key segment, via the Poisson bootstrap.

    Each replicate r ∈ [0, n_boot) reweights every row by an independent
    Poisson(1) draw. The per-(row, replicate) uniform costs ONE md5 per
    ROW, not per (row, replicate): the row's 61-bit base hash feeds the
    affine universal-hash family (a_r·base + b_r mod 2⁶¹−1 — the MinHash
    permutation machinery from functions/hashing.py), so the ×B explode
    adds only a multiply+mod per replicate. (The first build hashed the
    concatenated (id, r) string — 200 md5s/row made bootstrap_ci the
    single most expensive contract in the bench at 33 s; this form
    measures ~6× cheaper with identical statistical behavior.) The
    replicate statistic is the weighted mean Σwx/Σw (a replicate whose
    weights all land 0 — possible only on tiny segments — yields NULL
    and is excluded). The CI is the
    empirical [α/2, 1−α/2] percentile band over the replicate means,
    linearly interpolated (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
    both Hyndman-Fan type 7). Replicate means are rounded to ``digits``
    BEFORE the percentile so accumulation-order jitter cannot move the
    interpolation inputs.

    Rows with NULL/NaN value or NULL id carry no evidence and are
    excluded. Keyed: an empty segment produces no output row. Keyless:
    an empty input yields the single global row with n_rows=0 and NULL
    statistics — the repo's fail-closed convention (same shape as
    expected_calibration_error on an empty batch).

    Returns (keys…, n_rows, point_mean, ci_lo, ci_hi, n_boot_effective).

    Scale: the ×n_boot explode is a map-side projection consumed
    immediately by a partially-aggregated groupBy — the shuffle carries
    ≤ |keys|·n_boot partial-sum rows per map task, and the percentile
    runs over n_boot-row groups. The data is scanned twice (point
    estimate + replicates); fusing the point pass as a "replicate −1
    with w=1" would save the scan at the cost of a conditional in the
    hot weight expression — measured a wash at local scale, kept
    separate for plan clarity.
    """
    if n_boot < 2:
        raise ValueError(f"n_boot must be >= 2, got {n_boot}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    klist = list(keys)
    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & ~F.isnan(x) & F.col(id_col).isNotNull()
    ).select(
        *klist,
        x.alias("_x"),
        F.col(id_col).cast("string").alias("_id"),
    )

    point = base.groupBy(*klist).agg(
        F.count(F.lit(1)).alias("n_rows"),
        qround(F.avg("_x"), digits).alias("point_mean"),
    )

    from ..functions.hashing import _BASE_MOD, _MERSENNE_61, _hash_family

    # the replicate family rides as a 200-row BROADCAST frame, not an
    # exploded literal array: a CreateArray(CreateStruct…) literal is an
    # expression tree Catalyst re-evaluates per input row (200 struct
    # allocations/row, measured), while the broadcast nested-loop cross
    # join materializes the family once per executor
    fam = _hash_family(n_boot)
    fam_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(r, a, b) for r, (a, b) in enumerate(fam)],
            "_r int, _a bigint, _b bigint",
        )
    )
    base_h = portable_hash64(F.col("_id"), seed=seed, fast=fast) % F.lit(
        _BASE_MOD
    )
    rep = base.select(*klist, "_x", base_h.alias("_bh")).crossJoin(fam_df)
    m = _HASH_BUCKETS
    h = (F.col("_a") * F.col("_bh") + F.col("_b")) % F.lit(_MERSENNE_61)
    u = (h % m + F.lit(0.5)) / F.lit(float(m))
    w = _poisson1_weight(u).cast("double")
    rep_means = (
        rep.select(*klist, "_r", w.alias("_w"), (w * F.col("_x")).alias("_wx"))
        .groupBy(*klist, "_r")
        .agg(F.sum("_wx").alias("_swx"), F.sum("_w").alias("_sw"))
        .select(
            *klist,
            F.when(
                F.col("_sw") > 0, qround(F.col("_swx") / F.col("_sw"), digits)
            ).alias("_rm"),
        )
    )
    lo_p, hi_p = alpha / 2.0, 1.0 - alpha / 2.0
    cis = rep_means.groupBy(*klist).agg(
        qround(F.percentile(F.col("_rm"), F.lit(lo_p)), digits).alias("ci_lo"),
        qround(F.percentile(F.col("_rm"), F.lit(hi_p)), digits).alias("ci_hi"),
        F.count("_rm").alias("n_boot_effective"),
    )
    if klist:
        # null-safe key join: a NULL-key segment is a legitimate group
        # on both sides (base keeps NULL keys), and EqualTo would
        # silently discard its CI (seasonal_decompose convention)
        cond = None
        for kcol in klist:
            c = point[kcol].eqNullSafe(cis[kcol])
            cond = c if cond is None else (cond & c)
        return point.join(cis, cond, "left").select(
            *[point[kcol] for kcol in klist],
            "n_rows",
            "point_mean",
            "ci_lo",
            "ci_hi",
            "n_boot_effective",
        )
    return point.crossJoin(F.broadcast(cis))  # both 1-row frames

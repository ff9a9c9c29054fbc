from etdtransform_spark import config as C


def test_naming_rules():
    assert C.diff_col("Zon-opwekTotaal") == "Zon-opwekTotaalDiff"
    assert C.avg_col("X") == "XDiff_avg"
    assert C.is_imputed_col("X") == "XDiff_is_imputed"
    assert C.impute_type_col("X") == "XDiff_impute_type"
    assert C.old_diff_col("X") == "XOldDiff"
    assert C.original_col("X") == "XOriginal"
    assert C.check_col("X") == "XCheck"


def test_get_diff_columns_default_covers_all_cumulative():
    diffs = C.get_diff_columns()
    assert len(diffs) == len(C.CUMULATIVE_COLUMNS)
    assert all(d.endswith("Diff") for d in diffs)


def test_interval_min_counts():
    # reference aggregate.py:830-841
    assert C.INTERVAL_MIN_COUNT == {
        "5min": 1, "15min": 3, "60min": 12, "6h": 72, "24h": 288
    }


def test_switch_multiplier():
    # reference calculated_columns.py:530-556
    assert C.SWITCH_MULTIPLIER["5min"] == 12.0
    assert C.SWITCH_MULTIPLIER["15min"] == 4.0
    assert C.SWITCH_MULTIPLIER["60min"] == 1.0
    assert C.SWITCH_MULTIPLIER["6h"] == 1.0 / 6.0
    assert C.SWITCH_MULTIPLIER["24h"] == 1.0 / 24.0


def test_thresholds_keyed_by_diff_col():
    assert all(k.endswith("Diff") for k in C.THRESHOLDS)
    assert all("Min" in v and "Max" in v for v in C.THRESHOLDS.values())

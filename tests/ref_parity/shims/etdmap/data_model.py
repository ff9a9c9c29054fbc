"""``etdmap.data_model`` shim: the canonical cumulative-column list.

The 10 imputation columns are confirmed by the reference's own golden
test (tests/test_total_imputation_workflow.py:40-51); the golden data
additionally carries Gasgebruik / WarmteproductieWarmtepomp /
WatergebruikWarmTapwater diffs (tests/data/
metadata_household_aggregated_diff.json, 15 columns = 2 keys + 13
diffs), so the full etdmap list has 13 entries. Mirrors
``etdtransform_spark.config.CUMULATIVE_COLUMNS`` — both engines must
see the identical registry for the diff to be meaningful.
"""

from etdtransform_spark.config import CUMULATIVE_COLUMNS

cumulative_columns = list(CUMULATIVE_COLUMNS)

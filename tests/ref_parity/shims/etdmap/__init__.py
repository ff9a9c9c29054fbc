"""Minimal ``etdmap`` shim for the reference-differential parity harness.

The reference snapshot at /root/reference depends on the external
``etdmap`` package (not vendored there) for exactly five symbols —
``Options`` (_config.py:3), ``cumulative_columns`` (aggregate.py:9),
``read_index`` / ``update_meenemen`` (aggregate.py:10), and
``thresholds_dict`` (vectorized_impute.py:6). This shim provides those
five surfaces, reconstructed from usage in the reference and from
SURVEY.md §1, so the ACTUAL reference pipeline can execute against a
synthetic fixture and be diffed table-for-table against
``etdtransform_spark.plans.pipeline.run_pipeline``.

It is a test harness component only — nothing in ``etdtransform_spark``
imports it.
"""

from . import _config, data_model, index_helpers, record_validators  # noqa: F401
from ._config import Option, Options

# The real etdmap exposes a module-level options instance configured by the
# caller (reference tests/conftest.py:23-25 sets mapped_folder_path and
# bsv_metadata_file on it).
options = Options(
    {
        "mapped_folder_path": Option(
            key="mapped_folder_path",
            default_value=None,
            doc="folder containing household_*_table.parquet + index.parquet",
            validator=None,
            callback=None,
        ),
        "bsv_metadata_file": Option(
            key="bsv_metadata_file",
            default_value=None,
            doc="BSV metadata workbook (unused by the shim)",
            validator=None,
            callback=None,
        ),
    }
)

__all__ = [
    "Option",
    "Options",
    "options",
    "_config",
    "data_model",
    "index_helpers",
    "record_validators",
]

"""``etdmap.index_helpers`` shim: household index access.

Reconstructed from usage:
- ``read_index()`` -> ``(index_df, index_path)`` (reference
  aggregate.py:74, load_data.py:92-99): the index parquet lives in the
  mapped folder and is keyed (HuisIdBSV, ProjectIdBSV).
- ``update_meenemen()`` -> index_df with a non-null boolean ``Meenemen``
  column (reference aggregate.py:95-99 filters on it;
  tests/test_total_imputation_workflow.py:27-36 asserts the post-update
  invariants). The real etdmap merges manual decisions from the BSV
  metadata workbook; the parity fixture writes the final Meenemen values
  straight into index.parquet, so the shim just reads and returns them —
  the invariants the reference asserts still hold.
"""

from __future__ import annotations

import os

import pandas as pd

import etdmap


def read_index() -> tuple[pd.DataFrame, str]:
    index_path = os.path.join(
        str(etdmap.options.mapped_folder_path), "index.parquet"
    )
    index_df = pd.read_parquet(index_path)
    return index_df, index_path


def update_meenemen() -> pd.DataFrame:
    index_df, _ = read_index()
    if "Meenemen" not in index_df.columns:
        raise ValueError("fixture index.parquet must carry Meenemen")
    return index_df

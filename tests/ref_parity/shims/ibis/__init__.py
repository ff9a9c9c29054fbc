"""Import-time ``ibis`` stub for the parity harness.

The reference's pandas pipeline modules import ibis at module top
(aggregate.py:5, calculated_columns.py:4, load_data.py:5-8) and use it in
type annotations evaluated at def time (load_data.py:23 ``ibis.Expr``),
but the golden workflow path (tests/test_total_imputation_workflow.py)
never CALLS an ibis API. ibis is not installed in this container, so this
stub satisfies the imports and annotations; any actual call raises
immediately, guaranteeing the parity run exercises only the pandas path.
"""

from __future__ import annotations

from . import expr, selectors  # noqa: F401
from .expr.types import Expr, Table, TableExpr  # noqa: F401


def _unavailable(name: str):
    def _fn(*args, **kwargs):
        raise RuntimeError(
            f"ibis.{name} called inside the parity harness; the ibis stub "
            "supports import only (the golden workflow is pandas-only)"
        )

    _fn.__name__ = name
    return _fn


literal = _unavailable("literal")
interval = _unavailable("interval")
memtable = _unavailable("memtable")
read_parquet = _unavailable("read_parquet")
row_number = _unavailable("row_number")
window = _unavailable("window")


class _Underscore:
    """Stand-in for ibis's deferred-expression builder ``_``."""

    def __getattr__(self, name):
        raise RuntimeError(
            "ibis deferred expression used inside the parity harness"
        )


_ = _Underscore()
